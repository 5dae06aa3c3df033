"""Deduplication operators for a large-scale training-data pipeline.

The reference has no dedup (its only set-difference is the missing-symbol
anti-join, etl.ipynb:16-29); these are the engine's beyond-reference
extensions over the ``documents`` / ``embeddings`` fixtures, designed for
the 100 TB path:

- exact dedup: hash-groupBy — one shuffle on a 60-bit content hash, not on
  the full text (shuffle bytes ~= 8B/row + key, not document bytes).
- n-gram Jaccard: shared-shingle blocking (inverted index self-join), the
  exhaustive baseline. Quadratic only within a shingle bucket.
- MinHash + LSH: banded signatures -> candidates only for pairs sharing a
  band bucket -> exact-Jaccard verify. The linear-scale path: cost is
  O(docs x hashes) + O(candidate pairs), never all-pairs.
- SimHash: 32-bit token-histogram fingerprint; near-dup = small Hamming
  distance; 8-bit chunk blocking (pigeonhole: distance <= 6 over 4 chunks
  guarantees >= 1 exact-matching chunk).
- embedding cosine: label-blocked near-dup pairs over array<float>.

Every hash is the portable md5-based one (functions.portable) so each
operator has a bit-identical DuckDB oracle (plans.beyond)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

# LSH design point: 16 salted hashes, 8 bands x 2 rows. Candidate
# probability 1-(1-j^2)^8: j=0.3 -> 0.53, j=0.5 -> 0.90, j=0.8 -> 0.9998.
MINHASH_N = 16
LSH_ROWS = 2
LSH_BANDS = MINHASH_N // LSH_ROWS


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact-content group.

    Scale: groupBy on the 60-bit hash shuffles ~16 bytes/row. A 100 TB
    corpus dedups with one shuffle sized by row COUNT, not corpus bytes.
    (Collision risk at 60 bits: ~n^2/2^61 — negligible below ~1e8 docs;
    widen to two hash columns beyond that.)
    """
    return (
        docs.select(F.col(id_col), P.md5_long(text_col).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "n_copies")
    )


def shingle_docs(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id + distinct word-n-gram shingle set."""
    return docs.select("doc_id", P.shingles("text", n).alias("sh"))


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.3
) -> DataFrame:
    """Exhaustive near-dup pairs by word-n-gram Jaccard, blocked on shared
    shingles (classic inverted-index join — a pair is compared only if it
    shares >= 1 shingle, and the exact Jaccard is computed from the
    co-occurrence count alone, no second pass over the arrays).

    Scale: explode is linear; the self-join groups by shingle, so skewed
    (very common) shingles are the hazard — AQE skew-join splits them, and
    stop-shingle filtering (drop shingles with document frequency > T)
    is the standard mitigation to bolt on here.
    """
    sh = shingle_docs(docs, n)
    sizes = sh.select("doc_id", F.size("sh").alias("sz"))
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    co = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("common"))
    )
    return (
        co.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id + minhash signature (MINHASH_N salted-md5 min-hashes).

    h_j(doc) = min over shingles s of md5_long(j || '_' || s). Salted md5
    instead of the textbook (a*x+b) mod p family because it is portable to
    the DuckDB oracle verbatim; min-stability properties are equivalent.
    Entirely JVM-side higher-order expressions — no UDF, no shuffle.
    """
    salted = P.expr_md5_long("concat(cast(j as string), '_', s)")
    sig = F.expr(
        f"transform(sequence(0, {MINHASH_N - 1}), j -> "
        f" array_min(transform(sh, s -> {salted})))"
    )
    return shingle_docs(docs, n).select("doc_id", "sh", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.3
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band signatures -> bucket join ->
    exact-Jaccard verification of candidates only.

    Scale: the expensive all-pairs comparison collapses to
    O(sum over buckets of bucket^2); signatures are 16 longs/doc. The
    verify join rejoins the shingle arrays only for candidate pairs.
    """
    sigs = minhash_signatures(docs, n)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {LSH_BANDS - 1}), b -> "
                f" struct(b as band, "
                f"  concat_ws(',', slice(sig, b * {LSH_ROWS} + 1, {LSH_ROWS})) as key))"
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sh = shingle_docs(docs, n)
    return (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", F.round(P.jaccard("sh_a", "sh_b"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(docs: DataFrame) -> DataFrame:
    """32-bit SimHash over the token multiset (repetition = weight).

    Per doc: one pass over tokens folding a 32-wide +/-1 bit histogram
    (higher-order aggregate, no explode, no shuffle); bit i of the hash is
    the sign of histogram[i]. Near-identical token distributions land at
    small Hamming distance.
    """
    hist = F.expr(
        "aggregate("
        f" transform(split(text, ' '), t -> {P.expr_md5_long('t', 8)}),"
        " array_repeat(0L, 32),"
        " (acc, h) -> zip_with(acc,"
        "   transform(sequence(0, 31),"
        "     i -> case when (shiftright(h, i) % 2) = 1 then 1L else -1L end),"
        "   (x, y) -> x + y))"
    )
    pack = F.expr(
        "aggregate(sequence(0, 31), 0L,"
        " (acc, i) -> acc + case when element_at(hist, i + 1) > 0"
        "   then shiftleft(1L, i) else 0L end)"
    )
    return (
        docs.select("doc_id", hist.alias("hist"))
        .select("doc_id", pack.alias("simhash"))
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, 8-bit-chunk blocked.

    Pigeonhole: with 4 chunks and hamming <= 3, at least one chunk is
    bit-identical, so chunk blocking is LOSSLESS here (recall 1.0) while
    cutting the pair space to same-chunk buckets. Raising max_hamming past
    3 would turn blocking into a recall trade — keep <= chunks-1 to stay
    exact.
    """
    sh = simhash(docs)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c ->"
                " struct(c as chunk, (shiftright(simhash, c * 8) % 256) as ck))"
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.ck")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup(
    emb: DataFrame, threshold: float = 0.4, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked on ``block_col``.

    Scale: blocking bounds the pair space (all-pairs within a block); for
    unlabeled corpora substitute a sign-LSH bucket (operators.similarity)
    as the block key. Cosine is JVM-side zip_with/aggregate — no UDF.
    """
    e = emb.select(
        F.col("vec_id"), F.col(block_col).alias("blk"), F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(P.cosine("a.v", "b.v"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
