"""Multimodal-tier named queries (mm_*) — split from ``plans/beyond.py`` in round 8.

Pure mechanical move (VERDICT r7 ask #8): registry names, oracles, and
driver history are unchanged; ``plans.beyond`` still imports and
re-exports every entry, so existing import paths keep working. Shared
DuckDB fragments/helpers stay in ``plans.beyond`` and are imported from
there (it is mid-initialization at that point, but the shared block is
defined before the tier imports at its bottom run).
"""

from __future__ import annotations

from ..operators import multimodal as M
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .queries import _t, query




# ===========================================================================
# Multimodal + streaming (rows-only entries)
# ===========================================================================


@query(
    "mm_blob_meta",
    """
    SELECT doc_id,
           (54 + ((3 * w + 3) // 4) * 4 * h)::BIGINT AS n_bytes,
           w AS width, h AS height, 'bmp' AS format
    FROM (SELECT doc_id,
                 (doc_id % 64 + 1)::BIGINT AS w,
                 (doc_id * 7 % 64 + 1)::BIGINT AS h
          FROM documents)
    ORDER BY doc_id
    """,
    # Promoted r5 into the driver surface: the decode stage now parses a
    # REAL format (BMP header round-trip) instead of the md5 stand-in,
    # which mm_features_resize still pins driver-side.
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
)
def mm_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline over a REAL format: per document a
    genuine 24-bit BMP payload is synthesized (dims derived from doc_id)
    and decoded back by parsing actual BMP header bytes (struct unpack at
    the format's fixed offsets — operators.multimodal.bmp_roundtrip_meta).
    The oracle recomputes width/height/file size from doc_id arithmetic
    (54-byte header + 4-byte-aligned scanline math), independent of the
    encoder/decoder code."""
    return M.bmp_roundtrip_meta(_t(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )




@query(
    "mm_features_resize",
    f"""
    SELECT doc_id,
           array_to_string(
             [(('0x' || substr(md5(text || '_' || i), 1, 8))::BIGINT % 1000)
              for i in range(0, {M.FEATURE_DIM})], ',') AS features_csv,
           CASE WHEN w >= h THEN 256 ELSE (w * 256) // h END AS out_w,
           CASE WHEN w >= h THEN (h * 256) // w ELSE 256 END AS out_h,
           strlen(text)::BIGINT AS n_bytes,
           w AS width, h AS height, 'fake' AS format
    FROM (SELECT doc_id, text,
                 ('0x' || substr(md5(text), 1, 8))::BIGINT % 1024 + 1 AS w,
                 ('0x' || substr(md5(text), 9, 8))::BIGINT % 1024 + 1 AS h
          FROM documents)
    ORDER BY doc_id
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def mm_features_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + feature-extraction + resize-planning in one
    driver row: BOTH Arrow mapInPandas stages run — blob_metadata (the
    decode stage the demoted mm_blob_meta entry pins individually) and
    extract_features — joined on doc_id. The oracle recomputes the
    md5-derived metadata, embedding, and integer resize geometry over
    the same bytes.

    The operator's API output is ``array<double>`` (the schema the
    similarity operators consume); the checked registry projection
    serializes it to canonical integer milli-values (features are exactly
    k/1000, k in 0..999) because the driver's comparator hashes scalar
    columns only — arrays are unhashable in its pandas canonicalizer.
    """
    docs = M.attach_blob(_t(spark, sf_dir, "documents"))
    feats = M.extract_features(docs)
    meta = M.blob_metadata(docs)
    return (
        feats.select(
            "doc_id",
            F.concat_ws(
                ",",
                F.transform(
                    "features",
                    lambda x: F.round(x * 1000).cast("int").cast("string"),
                ),
            ).alias("features_csv"),
            "out_w",
            "out_h",
        )
        .join(meta, "doc_id")
        .orderBy("doc_id")
    )




@query(
    "mm_frame_sample",
    """
    SELECT doc_id, j AS frame_idx,
           md5(substr(text, j * 64 + 1, 64)) AS frame_md5
    FROM (SELECT doc_id, text,
                 unnest(range(0, CAST(ceil(strlen(text) / 64.0) AS BIGINT), 2))
                   AS j
          FROM documents)
    ORDER BY doc_id, frame_idx
    """,
    # Demoted r4 to fund sk_salted_hot_join under the 50-row driver cap:
    # sibling of mm_features_resize (same Arrow mapInPandas multimodal
    # plumbing, driver-green r3); locally oracle-pinned.
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (every 2nd 64-byte frame) —
    mapInPandas row fan-out; the oracle slices the same bytes with
    substr (fixture text is ASCII, so char and byte offsets coincide)."""
    docs = M.attach_blob(_t(spark, sf_dir, "documents"))
    return M.frame_sample(docs, frame_bytes=64, every=2).orderBy(
        "doc_id", "frame_idx"
    )




@query(
    "mm_wav_features",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 100 + 50 AS n,
             8000 + (doc_id % 4) * 4000 AS rate
      FROM documents),
    s AS (
      SELECT doc_id, n, rate, i,
             ((doc_id * 37 + i * 17) % 2048) - 1024 AS v
      FROM d, range(0, 150) r(i) WHERE i < n),
    x AS (
      SELECT doc_id, n, rate, i, v,
             CASE WHEN v >= 0 THEN 1 ELSE -1 END AS sg,
             lag(CASE WHEN v >= 0 THEN 1 ELSE -1 END)
               OVER (PARTITION BY doc_id ORDER BY i) AS psg
      FROM s)
    SELECT doc_id,
           min(n) AS n_samples,
           min(rate) AS sample_rate,
           CAST((min(n) * 1000000) // min(rate) AS BIGINT) AS duration_us,
           CAST(max(abs(v)) AS BIGINT) AS peak,
           round(sqrt(sum(v * v) / min(n)), 6) AS rms,
           CAST(sum(CASE WHEN psg IS NOT NULL AND sg <> psg
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM x GROUP BY doc_id ORDER BY doc_id
    """,
    # Promoted r6 (rotation: first driver row for the decoder tier).
    driver=False,  # demoted r15 (rotation; driver-green, plans/rotation.py)
)
def mm_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio feature extraction end-to-end (operators.multimodal.
    wav_pcm_features): per-doc PCM16 WAV bytes are synthesized, RIFF
    chunk-walked, numpy-decoded, and reduced to peak / RMS / zero-
    crossings / duration — the first-pass audio QC features a training
    pipeline computes before any model touches the waveform. The oracle
    recomputes every feature from doc_id arithmetic WITHOUT the bytes,
    so the whole encode -> chunk walk -> int16 decode -> feature path
    must be byte-exact. Integer features stay integer end-to-end; RMS is
    the one double (sqrt of an exact integer ratio, rounded 6dp).
    Reference analogue: none."""
    docs = _t(spark, sf_dir, "documents")
    return M.wav_pcm_features(docs).orderBy("doc_id")




@query(
    "mm_bmp_pixels",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 64 + 1 AS w, (doc_id * 7) % 64 + 1 AS h
      FROM documents),
    p AS (
      SELECT doc_id, w, h, (doc_id + 3 * x + 5 * y) % 256 AS v
      FROM d, range(0, 64) rx(x), range(0, 64) ry(y)
      WHERE x < w AND y < h)
    SELECT doc_id, min(w) AS width, min(h) AS height,
           round(sum(v) / (min(w) * min(h)), 6) AS mean_brightness,
           CAST(min(v) AS BIGINT) AS min_brightness,
           CAST(max(v) AS BIGINT) AS max_brightness,
           CAST(min(doc_id) % 256 AS BIGINT) AS top_left
    FROM p GROUP BY doc_id ORDER BY doc_id
    """,
    # New r5 (locally pinned; r6 rotation candidate for the mm family).
    driver=False,  # demoted r16 (rotation; driver-green, plans/rotation.py)
)
def mm_bmp_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image payload decode end-to-end (operators.multimodal.
    bmp_pixel_features): per-doc 24-bit BMPs with an arithmetic pixel
    gradient are synthesized, then the PIXEL BUFFER is decoded — header
    data offset, 4-byte scanline padding, and bottom-up row order all
    load-bearing — into brightness statistics. The oracle recomputes the
    features from doc_id arithmetic without the bytes; top_left in
    particular is image coordinate (0,0), which lives in the LAST stored
    scanline, so a decoder that skips the vertical flip fails on every
    doc with height > 1. Completes the modality pair with
    mm_wav_features (audio). Reference analogue: none."""
    docs = _t(spark, sf_dir, "documents")
    return M.bmp_pixel_features(docs).orderBy("doc_id")




@query(
    "mm_avi_frames",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 12 + 4 AS nf, doc_id % 16 + 1 AS w,
             (doc_id * 3) % 16 + 1 AS h
      FROM documents),
    fr AS (
      SELECT doc_id, nf, w, h, f
      FROM d, range(0, 16) rf(f) WHERE f < nf AND f % 3 = 0),
    p AS (
      SELECT doc_id, f, nf, w, h,
             (doc_id + 7 * f + 3 * x + 5 * y) % 256 AS v
      FROM fr, range(0, 16) rx(x), range(0, 16) ry(y)
      WHERE x < w AND y < h)
    SELECT doc_id, f AS frame_idx, min(nf) AS n_frames,
           min(w) AS width, min(h) AS height,
           round(sum(v) / (min(w) * min(h)), 6) AS mean_brightness,
           CAST((min(doc_id) + 7 * f) % 256 AS BIGINT) AS top_left
    FROM p GROUP BY doc_id, f ORDER BY doc_id, frame_idx
    """,
    # New r5 (locally pinned; r6 rotation candidate for the mm family).
    driver=False,  # demoted r16 (rotation; driver-green, plans/rotation.py)
)
def mm_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video container parsing end-to-end (operators.multimodal.
    avi_frame_features): per-doc AVI files — nested RIFF LISTs, an avih
    main header, one uncompressed DIB chunk per frame — are synthesized
    and walked back out, sampling every third frame into brightness
    features. The avih frame count is cross-checked against the counted
    movi chunks inside the task (container-walk drift fails loudly), and
    the oracle recomputes every sampled frame's features from doc_id
    arithmetic without the bytes. Completes the image/audio/video
    modality triple with REAL payload decoding in each.
    Reference analogue: none."""
    docs = _t(spark, sf_dir, "documents")
    return M.avi_frame_features(docs).orderBy("doc_id", "frame_idx")


@query(
    "mm_ahash_clusters",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 64 + 1 AS w, (doc_id * 7) % 64 + 1 AS h
      FROM documents),
    p AS (
      SELECT doc_id, w, h, x, y, (doc_id + 3 * x + 5 * y) % 256 AS v
      FROM d, range(0, 64) rx(x), range(0, 64) ry(y)
      WHERE x < w AND y < h),
    bs AS (
      SELECT doc_id, (y * 8 // h) * 8 + (x * 8 // w) AS blk,
             sum(v) AS bsum, count(*) AS bcnt
      FROM p GROUP BY 1, 2),
    ts AS (SELECT doc_id, sum(bsum) AS tsum, sum(bcnt) AS tcnt
           FROM bs GROUP BY 1),
    hash AS (
      SELECT bs.doc_id,
             CAST(sum(CASE WHEN bsum * tcnt > tsum * bcnt AND blk >= 32
                           THEN (1::BIGINT << (blk - 32)) ELSE 0 END)
                  AS BIGINT) AS ahash_hi,
             CAST(sum(CASE WHEN bsum * tcnt > tsum * bcnt AND blk < 32
                           THEN (1::BIGINT << blk) ELSE 0 END)
                  AS BIGINT) AS ahash_lo
      FROM bs JOIN ts USING (doc_id) GROUP BY 1)
    SELECT ahash_hi, ahash_lo, count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM hash GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY ahash_hi, ahash_lo
    """,
    # New r9 (image near-dup, completing the multimodal triple's dedup
    # story); promoted from NEXT_QUEUE in the r10 rotation after
    # all-scale pre-validation.
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def mm_ahash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-duplicate detection by perceptual average hash
    (operators.multimodal.bmp_ahash): every document's BMP payload is
    REALLY decoded (offset, padding, bottom-up flip), aHash'd with
    integer-exact block-vs-global mean bits, and duplicate clusters are
    the hash groups with >= 2 members — the exact-dedup plan shape
    (ONE shuffle on the 64-bit key) applied to pixels instead of text,
    so the output is cluster-bounded rather than pairwise-quadratic
    (the 100 TB posture: a degenerate class of N constant images emits
    ONE row, not N^2 pairs).

    The fixture's gradient arithmetic makes the claim real: doc_id and
    doc_id+256 render byte-identical images (same size mod 64, same
    gray offset mod 256) and must cluster; all-uniform 1x1 images
    collapse into the all-zero-hash class. The oracle replays decode
    arithmetic, blocking, bit comparisons, and clustering without
    touching a byte. Reference analogue: none."""
    docs = _t(spark, sf_dir, "documents")
    return (
        M.bmp_ahash(docs)
        .groupBy("ahash_hi", "ahash_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("ahash_hi", "ahash_lo")
    )


# ---------------------------------------------------------------------------
# mm_ahash_neardups: Hamming-ball image near-dup (VERDICT r9 ask #4)
# ---------------------------------------------------------------------------

#: Shared aHash replay (the mm_ahash_clusters decode-free arithmetic).
_SQL_AHASH_CTES = """
    d AS (
      SELECT doc_id, doc_id % 64 + 1 AS w, (doc_id * 7) % 64 + 1 AS h
      FROM documents),
    p AS (
      SELECT doc_id, w, h, x, y, (doc_id + 3 * x + 5 * y) % 256 AS v
      FROM d, range(0, 64) rx(x), range(0, 64) ry(y)
      WHERE x < w AND y < h),
    bs AS (
      SELECT doc_id, (y * 8 // h) * 8 + (x * 8 // w) AS blk,
             sum(v) AS bsum, count(*) AS bcnt
      FROM p GROUP BY 1, 2),
    ts AS (SELECT doc_id, sum(bsum) AS tsum, sum(bcnt) AS tcnt
           FROM bs GROUP BY 1),
    hash AS (
      SELECT bs.doc_id,
             CAST(sum(CASE WHEN bsum * tcnt > tsum * bcnt AND blk >= 32
                           THEN (1::BIGINT << (blk - 32)) ELSE 0 END)
                  AS BIGINT) AS ahash_hi,
             CAST(sum(CASE WHEN bsum * tcnt > tsum * bcnt AND blk < 32
                           THEN (1::BIGINT << blk) ELSE 0 END)
                  AS BIGINT) AS ahash_lo
      FROM bs JOIN ts USING (doc_id) GROUP BY 1)
"""

#: Planted-control ids: every 100th document gets a twin whose hash is
#: flipped in exactly one bit, the bit index rotating through all four
#: bands across the control set.
_AHASH_TWIN_OFFSET = 1_000_000


@query(
    "mm_ahash_neardups",
    f"""
    WITH {_SQL_AHASH_CTES},
    planted AS (
      SELECT doc_id + {_AHASH_TWIN_OFFSET} AS doc_id,
             CASE WHEN (doc_id * 7) % 64 >= 32
                  THEN CAST(xor(ahash_hi,
                                1::BIGINT << ((doc_id * 7) % 64 - 32))
                            AS BIGINT)
                  ELSE ahash_hi END AS ahash_hi,
             CASE WHEN (doc_id * 7) % 64 < 32
                  THEN CAST(xor(ahash_lo,
                                1::BIGINT << ((doc_id * 7) % 64))
                            AS BIGINT)
                  ELSE ahash_lo END AS ahash_lo
      FROM hash WHERE doc_id % 100 = 0),
    allh AS (SELECT * FROM hash UNION ALL SELECT * FROM planted),
    bands AS (
      SELECT doc_id, ahash_hi, ahash_lo, b.range AS band,
             CASE WHEN b.range < 2
                  THEN (ahash_lo >> (b.range * 16)) % 65536
                  ELSE (ahash_hi >> ((b.range - 2) * 16)) % 65536
             END AS key
      FROM allh, range(0, 4) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.ahash_hi, b.ahash_hi))
               + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS hamming
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    pairs AS (SELECT * FROM cand WHERE hamming BETWEEN 1 AND 3),
    sides AS (
      SELECT id_a AS doc_id, id_b AS neighbor, hamming FROM pairs
      UNION ALL
      SELECT id_b AS doc_id, id_a AS neighbor, hamming FROM pairs)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_neardups,
           CAST(min(neighbor) AS BIGINT) AS min_neighbor,
           CAST(min(hamming) AS INTEGER) AS min_hamming
    FROM sides GROUP BY 1 ORDER BY doc_id
    """,
    # New r10 (VERDICT r9 ask #4); first-timer on the r10 surface after
    # all-three-scale pre-validation (plans/rotation.py).
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def mm_ahash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-dup detection by Hamming ball over the perceptual
    aHash (operators.multimodal.ahash_neardup_stats) — mm_ahash_clusters
    extended from exact-hash equality to the 1-8-bit perturbations real
    re-encodes produce: the 64-bit hash is banded 4 x 16 bits (the
    operators.dedup.simhash_pairs pigeonhole: hamming <= 3 guarantees a
    shared band, so banding is a LOSSLESS candidate generator, never
    all-pairs), candidates verified by exact XOR popcount, and the
    output aggregated per document (linear) rather than per pair
    (quadratic in the fixture's dense gradient balls).

    A PLANTED CONTROL rides the corpus: every 100th document is
    twinned (doc_id + 1e6) with exactly one hash bit flipped, the bit
    index (doc_id * 7) % 64 rotating through all four bands across the
    control set — every planted twin must surface with min_hamming = 1,
    so banding recall on the minimal perturbation is re-proved inside
    the driver hash each round (the spike-in discipline). The oracle
    replays decode arithmetic, the flip, banding, verification, and the
    per-doc aggregate without touching a byte. Reference analogue:
    none (beyond-reference LLM-pipeline tier)."""
    docs = _t(spark, sf_dir, "documents")
    # Materialize the hash frame once (r17): both union branches (the
    # corpus side and the planted-twin derivation) reference it, and
    # without truncation each branch re-runs the WHOLE Arrow image
    # decode (the expensive stage). The frame is three longs per doc —
    # exactly the materialize-small-frames policy shape.
    hashes = (
        M.bmp_ahash(docs)
        .select("doc_id", "ahash_hi", "ahash_lo")
        .localCheckpoint(eager=True)
    )
    planted = hashes.filter(F.col("doc_id") % 100 == 0).selectExpr(
        f"doc_id + {_AHASH_TWIN_OFFSET} AS doc_id",
        "CASE WHEN (doc_id * 7) % 64 >= 32"
        " THEN ahash_hi ^ shiftleft(1L,"
        " CAST((doc_id * 7) % 64 - 32 AS INT))"
        " ELSE ahash_hi END AS ahash_hi",
        "CASE WHEN (doc_id * 7) % 64 < 32"
        " THEN ahash_lo ^ shiftleft(1L, CAST((doc_id * 7) % 64 AS INT))"
        " ELSE ahash_lo END AS ahash_lo",
    )
    return M.ahash_neardup_stats(hashes.unionAll(planted)).orderBy(
        "doc_id"
    )
