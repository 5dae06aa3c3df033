"""Beyond-reference named queries: dedup, similarity, text, events, multimodal.

Each entry pairs an operator from operators/ / functions/ / streaming/ with
a DuckDB oracle that implements the SAME algorithm on the same portable
md5-based hash (functions.portable), so the driver's value-hash comparison
is exact — including for LSH/banding steps, where the oracle reproduces the
blocking (candidate generation is part of the contract, not just the final
similarity).

DuckDB dialect notes encoded here (mirrors functions.portable docstrings):
list slicing is 1-based inclusive; range(a,b) is exclusive; sum(BIGINT) is
HUGEINT (cast back); `/` on integers is float division in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import portable as _P
from ..functions import text as T
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import sampling as SP
from ..operators import similarity as S
from ..streaming import stream as ST
from ..streaming import windows as W
from .queries import _t, query

# Shared DuckDB fragments -----------------------------------------------------

SQL_DOCS_SHINGLES = f"""
  d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
  sh AS (SELECT doc_id, {_P.sql_shingles('w', D.N_SHINGLE)} AS sh
         FROM d)
"""

SQL_JACCARD = (
    "round(len(list_intersect(sa.sh, sb.sh))::DOUBLE"
    " / len(list_distinct(list_concat(sa.sh, sb.sh))), 6)"
)

SQL_SIMHASH = """
  tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
  th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok),
  bits AS (SELECT doc_id, b,
             sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
           FROM th, range(0, 32) AS r(b)
           GROUP BY 1, 2),
  simh AS (SELECT doc_id,
             sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT
               AS simhash
           FROM bits GROUP BY doc_id)
"""


def _sql_lexicon(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{x}'" for x in words)
    return f"len(list_filter(w, t -> list_contains([{lst}], t)))"


_HITS = {lg: _sql_lexicon(ws) for lg, ws in sorted(T.LEXICONS.items())}
_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN hits_{lg} = greatest(hits_en, hits_es, hits_zh) THEN '{lg}'"
        for lg in sorted(T.LEXICONS)
    )
    + " END"
)


@query(
    "tx_lang_id",
    f"""
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    h AS (SELECT doc_id, lang,
            {_HITS['en']}::BIGINT AS hits_en,
            {_HITS['es']}::BIGINT AS hits_es,
            {_HITS['zh']}::BIGINT AS hits_zh
          FROM d)
    SELECT doc_id, hits_en, hits_es, hits_zh,
           {_LANG_CASE} AS predicted_lang,
           lang AS labeled_lang
    FROM h ORDER BY doc_id
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def tx_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-overlap language ID: argmax of marker hits, ties to the
    alphabetically-first language. Runs on the explode+codegen profile
    (functions.text.text_profile) — the lang label rides through the
    groupBy as a carried key."""
    docs = _t(spark, sf_dir, "documents")
    prof = T.text_profile(docs, carry=("lang",))
    return prof.select(
        "doc_id", "hits_en", "hits_es", "hits_zh",
        T.predicted_lang().alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
    ).orderBy("doc_id")


_STOP_SQL = _sql_lexicon(T.STOPWORDS)

# dd_corpus_clean's oracle composes the lexicon/quality/shingle/LSH
# fragments — same SQL fragments as the per-stage oracles, so the
# pipeline and its stages cannot drift apart.
_SQL_QUALITY_PTS = f"""( (least(len(w), 100) * 25) // 100
           + (len(list_distinct(w)) * 35) // len(w)
           + least(({_STOP_SQL} * 100) // len(w), 20)
           + least((list_sum([length(t) for t in w]) * 20) // (8 * len(w)), 20)
         )::BIGINT"""

_SQL_CORPUS_CLEAN = f"""
    WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS w
                  FROM documents),
    sc AS (SELECT doc_id, text, w,
             len(w)::BIGINT AS n_tokens,
             {_HITS['en']}::BIGINT AS hits_en,
             {_HITS['es']}::BIGINT AS hits_es,
             {_HITS['zh']}::BIGINT AS hits_zh,
             {_SQL_QUALITY_PTS} AS quality_pts
           FROM base),
    filt AS (SELECT doc_id, text, w, n_tokens, quality_pts FROM sc
             WHERE {_LANG_CASE} = 'en' AND quality_pts >= 45),
    s2 AS (SELECT * FROM filt
           QUALIFY row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) = 1),
    sh AS (SELECT doc_id, {_P.sql_shingles('w', D.N_SHINGLE)} AS sh FROM s2),
    ab AS (SELECT doc_id,
             [{_P.sql_md5_long('s', 15, 1)} % {_P.ROLL_MOD} for s in sh] AS ha,
             [{_P.sql_md5_long('s', 15, 16)} % {_P.ROLL_MOD} for s in sh] AS hb
           FROM sh),
    sig AS (SELECT doc_id,
              [list_min([(ha[i] + j * hb[i]) % {_P.ROLL_MOD}
                         for i in range(1, len(ha) + 1)])
               for j in range(0, {D.MINHASH_N})] AS sig
            FROM ab),
    bands AS (SELECT doc_id, b AS band,
                array_to_string(
                  sig[b*{D.LSH_ROWS}+1 : b*{D.LSH_ROWS}+{D.LSH_ROWS}], ',')
                  AS key
              FROM sig, range(0, {D.LSH_BANDS}) AS r(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a
             JOIN bands b ON a.band = b.band AND a.key = b.key
                         AND a.doc_id < b.doc_id),
    nd AS (SELECT DISTINCT id_b
           FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
                     JOIN sh sb ON cand.id_b = sb.doc_id
           WHERE {SQL_JACCARD} >= 0.5)
    SELECT doc_id, n_tokens, quality_pts FROM s2
    WHERE doc_id NOT IN (SELECT id_b FROM nd)
    ORDER BY doc_id
"""


# ===========================================================================
# Deduplication
# ===========================================================================


@query(
    "dd_exact_dedup",
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY doc_id
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green r1-r6)
)
def dd_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy (operators.dedup.exact_dedup)."""
    return D.exact_dedup(_t(spark, sf_dir, "documents")).orderBy("doc_id")


@query(
    "dd_ngram_jaccard",
    f"""
    WITH {SQL_DOCS_SHINGLES},
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    rare AS (SELECT s FROM ex GROUP BY s
             HAVING count(*) <= greatest(2,
               floor(0.5 * (SELECT count(*) FROM documents)))),
    exf AS (SELECT ex.* FROM ex JOIN rare USING (s)),
    co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
    sz AS (SELECT doc_id, len(sh) AS sz FROM sh)
    SELECT id_a, id_b,
           round(common::DOUBLE / (sa.sz + sb.sz - common), 6) AS jaccard
    FROM co JOIN sz sa ON co.id_a = sa.doc_id
            JOIN sz sb ON co.id_b = sb.doc_id
    WHERE round(common::DOUBLE / (sa.sz + sb.sz - common), 6) >= 0.3
    ORDER BY id_a, id_b
    """,
    driver=False,  # demoted r6 (rotation; driver-green r5 and earlier)
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive word-5-gram Jaccard near-dup pairs (shared-shingle block).

    Runs the operator's scale-safe default (max_df=0.5: stop-shingles
    present in over half the corpus are excluded from candidate
    generation); the oracle mirrors the same df cap, so the contract is
    exact whether or not the cap fires at a given scale."""
    return D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.3
    ).orderBy("id_a", "id_b")


@query(
    "dd_minhash_lsh",
    f"""
    WITH {SQL_DOCS_SHINGLES},
    ab AS (SELECT doc_id,
             [{_P.sql_md5_long('s', 15, 1)} % {_P.ROLL_MOD} for s in sh] AS ha,
             [{_P.sql_md5_long('s', 15, 16)} % {_P.ROLL_MOD} for s in sh] AS hb
           FROM sh),
    sig AS (SELECT doc_id,
              [list_min([(ha[i] + j * hb[i]) % {_P.ROLL_MOD}
                         for i in range(1, len(ha) + 1)])
               for j in range(0, {D.MINHASH_N})] AS sig
            FROM ab),
    bands AS (SELECT doc_id, b AS band,
                array_to_string(sig[b*{D.LSH_ROWS}+1 : b*{D.LSH_ROWS}+{D.LSH_ROWS}], ',') AS key
              FROM sig, range(0, {D.LSH_BANDS}) AS r(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a
             JOIN bands b ON a.band = b.band AND a.key = b.key
                         AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, {SQL_JACCARD} AS jaccard
    FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
              JOIN sh sb ON cand.id_b = sb.doc_id
    WHERE {SQL_JACCARD} >= 0.3
    ORDER BY id_a, id_b
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green r1-r6)
)
def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(8 bands x 2) candidates, exact-Jaccard verified.

    The oracle reproduces the banding, so candidate generation itself is
    correctness-checked; recall vs the exhaustive baseline is pinned by
    tests/test_beyond_ops.py::test_minhash_lsh_recall.
    """
    return D.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.3
    ).orderBy("id_a", "id_b")


@query(
    "dd_simhash",
    f"""
    WITH {SQL_SIMHASH}
    SELECT doc_id, simhash FROM simh ORDER BY doc_id
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (operators.dedup.simhash)."""
    return D.simhash(_t(spark, sf_dir, "documents")).orderBy("doc_id")


@query(
    "dd_simhash_pairs",
    f"""
    WITH {SQL_SIMHASH},
    chunks AS (SELECT doc_id, simhash, c, (simhash >> (c*8)) & 255 AS ck
               FROM simh, range(0, 4) AS r(c))
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
    FROM chunks a
    JOIN chunks b ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY id_a, id_b
    """,
    # Demoted r5 (rotation: family already multiply driver-green; stays
    # pinned by the local oracle sweep).
    driver=False,
)
def dd_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3), 8-bit-chunk blocked —
    lossless blocking by pigeonhole (see operators.dedup.simhash_pairs)."""
    return D.simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@query(
    "dd_embedding_neardup",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    ORDER BY id_a, id_b
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, label-blocked."""
    return D.embedding_near_dup(
        _t(spark, sf_dir, "embeddings"), threshold=0.4
    ).orderBy("id_a", "id_b")


@query(
    "dd_embedding_neardup_blocked",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    ORDER BY id_a, id_b
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green r1-r6)
)
def dd_embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-pair (cogrouped GEMM tile) variant — MUST emit exactly the
    pairs of dd_embedding_neardup; same oracle proves the blocked
    decomposition loses nothing."""
    return D.embedding_near_dup_blocked(
        _t(spark, sf_dir, "embeddings"), threshold=0.4, n_chunks=4
    ).orderBy("id_a", "id_b")


@query(
    "dd_neardup_components",
    f"""
    WITH RECURSIVE {SQL_DOCS_SHINGLES},
    ab AS (SELECT doc_id,
             [{_P.sql_md5_long('s', 15, 1)} % {_P.ROLL_MOD} for s in sh] AS ha,
             [{_P.sql_md5_long('s', 15, 16)} % {_P.ROLL_MOD} for s in sh] AS hb
           FROM sh),
    sig AS (SELECT doc_id,
              [list_min([(ha[i] + j * hb[i]) % {_P.ROLL_MOD}
                         for i in range(1, len(ha) + 1)])
               for j in range(0, {D.MINHASH_N})] AS sig
            FROM ab),
    bands AS (SELECT doc_id, b AS band,
                array_to_string(
                  sig[b*{D.LSH_ROWS}+1 : b*{D.LSH_ROWS}+{D.LSH_ROWS}], ',')
                  AS key
              FROM sig, range(0, {D.LSH_BANDS}) AS r(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a
             JOIN bands b ON a.band = b.band AND a.key = b.key
                         AND a.doc_id < b.doc_id),
    pairs AS (SELECT id_a, id_b
              FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
                        JOIN sh sb ON cand.id_b = sb.doc_id
              WHERE {SQL_JACCARD} >= 0.5),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS n FROM e),
    reach AS (
      SELECT n, n AS m FROM nodes
      UNION
      SELECT r.n, e.dst AS m FROM reach r JOIN e ON e.src = r.m
    )
    SELECT n AS doc_id, CAST(min(m) AS BIGINT) AS component
    FROM reach GROUP BY n ORDER BY doc_id
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def dd_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE dedup clusters: connected components over the MinHash-LSH
    near-dup pair graph (operators.graph.connected_components, the
    iterative min-label-propagation loop) — transitive merging that
    pair-at-a-time dropping can't do (A~B, B~C puts A,B,C in ONE cluster
    even when A!~C directly). The oracle computes the same components by
    recursive transitive closure in DuckDB, so the iterative Spark loop
    is pinned end-to-end: LSH candidate generation, verification, AND
    the fixpoint."""
    from ..operators.graph import connected_components

    pairs = D.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)
    return (
        connected_components(pairs)
        .select(F.col("node").alias("doc_id"), "component")
        .orderBy("doc_id")
    )


# Split arithmetic shared by tx_split_by_cluster's Spark side and oracle
# (same weights, same salt — authored once so they cannot drift).
_CLUSTER_SPLIT_WEIGHTS = {"train": 0.8, "test": 0.2}
_CLUSTER_SPLIT_SALT = "cl1"
_CLUSTER_SPLIT_CASE = SP.sql_split_column(
    "rep", _CLUSTER_SPLIT_WEIGHTS, salt=_CLUSTER_SPLIT_SALT
)


@query(
    "tx_split_by_cluster",
    f"""
    WITH RECURSIVE {SQL_DOCS_SHINGLES},
    ab AS (SELECT doc_id,
             [{_P.sql_md5_long('s', 15, 1)} % {_P.ROLL_MOD} for s in sh] AS ha,
             [{_P.sql_md5_long('s', 15, 16)} % {_P.ROLL_MOD} for s in sh] AS hb
           FROM sh),
    sig AS (SELECT doc_id,
              [list_min([(ha[i] + j * hb[i]) % {_P.ROLL_MOD}
                         for i in range(1, len(ha) + 1)])
               for j in range(0, {D.MINHASH_N})] AS sig
            FROM ab),
    bands AS (SELECT doc_id, b AS band,
                array_to_string(
                  sig[b*{D.LSH_ROWS}+1 : b*{D.LSH_ROWS}+{D.LSH_ROWS}], ',')
                  AS key
              FROM sig, range(0, {D.LSH_BANDS}) AS r(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a
             JOIN bands b ON a.band = b.band AND a.key = b.key
                         AND a.doc_id < b.doc_id),
    pairs AS (SELECT id_a, id_b
              FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
                        JOIN sh sb ON cand.id_b = sb.doc_id
              WHERE {SQL_JACCARD} >= 0.5),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS n FROM e),
    reach AS (
      SELECT n, n AS m FROM nodes
      UNION
      SELECT r.n, e.dst AS m FROM reach r JOIN e ON e.src = r.m
    ),
    comp AS (SELECT n AS doc_id, CAST(min(m) AS BIGINT) AS component
             FROM reach GROUP BY n)
    SELECT doc_id, rep, {_CLUSTER_SPLIT_CASE} AS split
    FROM (SELECT d.doc_id,
                 coalesce(c.component, d.doc_id) AS rep
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
    ORDER BY doc_id
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    # promoted r6 (rotation: first driver row)
    driver=False,  # rotated OUT r8 (driver-green; plans/rotation.py)
)
def tx_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/test split: a document's split is decided by
    the hash of its near-dup CLUSTER representative (min doc_id of its
    LSH connected component), not its own id — so near-duplicate
    documents can never straddle the train/test boundary, the failure
    mode a plain per-doc hash split (tx_hash_split) silently allows and
    every serious eval pipeline must close. Singleton docs fall back to
    their own id (coalesce), keeping the split a total, deterministic
    function of content clusters. Composition: MinHash-LSH pairs ->
    connected components -> label map equi-joined back on doc_id (the
    map holds only clustered docs, so AQE broadcasts it when small and
    shuffles when the dup rate is high — both correct) ->
    portable hash split on the representative. The oracle replays the
    whole chain in DuckDB (recursive transitive closure + the same md5
    bucket arithmetic) and pins exact per-doc membership."""
    from ..operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    comp = connected_components(pairs)
    rep = (
        docs.join(comp, docs.doc_id == comp.node, "left")
        .select(
            docs.doc_id,
            F.coalesce("component", docs.doc_id).alias("rep"),
        )
    )
    return (
        rep.withColumn(
            "split",
            SP.split_column(
                "rep", _CLUSTER_SPLIT_WEIGHTS, salt=_CLUSTER_SPLIT_SALT
            ),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Similarity search
# ===========================================================================


@query(
    "sim_hybrid_rrf",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    qterms AS (
      SELECT doc_id AS query_id, term,
             round(ln(n_docs / df), 6) AS idf
      FROM tf JOIN dfreq USING (term), n
      WHERE doc_id < 8
      QUALIFY row_number() OVER (
        PARTITION BY doc_id
        ORDER BY round(tf * ln(n_docs / df), 6) DESC, term ASC) <= 3),
    kw AS (
      SELECT q.query_id, t.doc_id,
             round(sum(t.tf * q.idf), 6) AS kw_score
      FROM qterms q JOIN tf t USING (term)
      WHERE t.doc_id != q.query_id
      GROUP BY 1, 2),
    kwr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY kw_score DESC, doc_id ASC) AS r
      FROM kw
      QUALIFY r <= 10),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    vr AS (
      SELECT query_id, e.vec_id AS doc_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(qv, v), 6) DESC,
                        e.vec_id ASC) AS r
      FROM q JOIN e ON e.vec_id != q.query_id
      QUALIFY r <= 10),
    fused AS (
      SELECT coalesce(kwr.query_id, vr.query_id) AS query_id,
             coalesce(kwr.doc_id, vr.doc_id) AS doc_id,
             round(coalesce(1.0::DOUBLE / (60 + kwr.r), 0)
                   + coalesce(1.0::DOUBLE / (60 + vr.r), 0), 6) AS rrf,
             kwr.r AS kw_rank, vr.r AS vec_rank
      FROM kwr FULL OUTER JOIN vr
        ON kwr.query_id = vr.query_id AND kwr.doc_id = vr.doc_id)
    SELECT query_id, doc_id, rrf, kw_rank, vec_rank
    FROM fused
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id ASC) <= 10
    ORDER BY query_id, rrf DESC, doc_id
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval with reciprocal-rank fusion — the modern search
    stack in one lazy plan: a KEYWORD leg (each query doc's top-3 TF-IDF
    terms probe the inverted index; candidates scored by matched
    tf x idf) and a VECTOR leg (cosine top-10 over the embedding
    column) are fused per (query, doc) by RRF
    (score = sum 1/(60 + rank); Cormack et al.'s k=60), which needs no
    score calibration between legs — the reason RRF is the default
    fusion everywhere. Docs found by only one leg still rank (outer
    join + coalesce 0).

    Scale: the keyword leg is an inverted-index equi-join on term
    (selective: 3 terms/query), never a doc x doc scan; the vector leg
    is the exactness baseline here — swap in the IVF cell-probe for a
    production corpus. Ranks are integers and scores round before
    ranking, so the oracle pins the fused ORDER, not just membership."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(n))
    wq = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).desc(),
        F.asc("term"),
    )
    qterms = (
        scored.filter(F.col("doc_id") < 8)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= 3)
        .select(
            F.col("doc_id").alias("query_id"),
            "term",
            F.round(F.log(F.col("n_docs") / F.col("df")), 6).alias("idf"),
        )
    )
    kw = (
        qterms.join(tf, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 6).alias("kw_score"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("kw_score"), F.asc("doc_id")
    )
    kwr = (
        kw.withColumn("r", F.row_number().over(wk))
        .filter(F.col("r") <= 10)
        .select("query_id", "doc_id", F.col("r").alias("kw_rank"))
    )
    vr = S.topk_bruteforce(
        _t(spark, sf_dir, "embeddings"), n_queries=8, k=10
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine"), F.asc("neighbor_id")
            )
        )
        .alias("vec_rank"),
    )
    fused = (
        kwr.join(vr, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(1.0 / (60 + F.col("kw_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("vec_rank")), F.lit(0.0)),
                6,
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.withColumn("_fr", F.row_number().over(wf))
        .filter(F.col("_fr") <= 10)
        .select("query_id", "doc_id", "rrf", "kw_rank", "vec_rank")
        .orderBy("query_id", F.desc("rrf"), "doc_id")
    )


@query(
    "sim_topk_bruteforce",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8)
    SELECT query_id, e.vec_id AS neighbor_id,
           round(list_cosine_similarity(qv, v), 6) AS cosine
    FROM q JOIN e ON e.vec_id != q.query_id
    QUALIFY row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(list_cosine_similarity(qv, v), 6) DESC, e.vec_id ASC
    ) <= 10
    ORDER BY query_id, cosine DESC, neighbor_id
    """,
    driver=False,  # demoted r6 (rotation; driver-green r5 and earlier)
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the first 8 vectors.

    SCALE NOTE — exactness BASELINE, not the 100 TB path: this is a full
    linear corpus scan per query batch (right up to ~10^7 vectors, and
    the recall yardstick for the ANN tests). Route large-corpus serving
    to sim_ann_ivf / sim_ann_ivf_kmeans* (partition-pruned probes over
    the write_ivf_layout cell layout) or sim_ann_signlsh."""
    return S.topk_bruteforce(
        _t(spark, sf_dir, "embeddings"), n_queries=8, k=10
    ).orderBy("query_id", F.desc("cosine"), "neighbor_id")


@query(
    "sim_ann_signlsh",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v,
            list_sum([CASE WHEN v[i+1] > 0 THEN 1::BIGINT << i ELSE 0 END
                      for i in range(0, {S.SIGN_BITS})])::BIGINT AS bkt
          FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bkt AS qbkt FROM b WHERE vec_id < 8)
    SELECT query_id, b.vec_id AS neighbor_id,
           round(list_cosine_similarity(qv, v), 6) AS cosine
    FROM q JOIN b ON b.bkt = q.qbkt AND b.vec_id != q.query_id
    QUALIFY row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(list_cosine_similarity(qv, v), 6) DESC, b.vec_id ASC
    ) <= 5
    ORDER BY query_id, cosine DESC, neighbor_id
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green r1-r6)
)
def sim_ann_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 within the query's sign-LSH bucket (the scale path)."""
    return S.topk_ann_signlsh(
        _t(spark, sf_dir, "embeddings"), n_queries=8, k=5
    ).orderBy("query_id", F.desc("cosine"), "neighbor_id")


@query(
    "sim_recall_at_k",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    ex AS (
      SELECT query_id, e.vec_id AS neighbor_id
      FROM q JOIN e ON e.vec_id != q.query_id
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(list_cosine_similarity(qv, v), 6) DESC, e.vec_id ASC
      ) <= 5),
    b AS (SELECT vec_id, v,
            list_sum([CASE WHEN v[i+1] > 0 THEN 1::BIGINT << i ELSE 0 END
                      for i in range(0, {S.SIGN_BITS})])::BIGINT AS bkt
          FROM e),
    qb AS (SELECT vec_id AS query_id, v AS qv, bkt AS qbkt
           FROM b WHERE vec_id < 8),
    ann AS (
      SELECT query_id, b.vec_id AS neighbor_id
      FROM qb JOIN b ON b.bkt = qb.qbkt AND b.vec_id != qb.query_id
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(list_cosine_similarity(qv, v), 6) DESC, b.vec_id ASC
      ) <= 5),
    na AS (SELECT query_id, count(*) AS n_ann FROM ann GROUP BY 1),
    h AS (SELECT a.query_id, count(*) AS n_hits
          FROM ann a JOIN ex ON ex.query_id = a.query_id
                            AND ex.neighbor_id = a.neighbor_id
          GROUP BY 1),
    qs AS (SELECT DISTINCT query_id FROM ex)
    SELECT qs.query_id,
           CAST(coalesce(na.n_ann, 0) AS BIGINT) AS n_ann,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5, 6)
             AS recall_at_5
    FROM qs LEFT JOIN na USING (query_id) LEFT JOIN h USING (query_id)
    ORDER BY query_id
    """,
    # New r6 (locally pinned; future rotation candidate).
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
)
def sim_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN QUALITY measurement — recall@5 of the sign-LSH bucket path
    against the exact brute-force top-5, per query ('measure, don't
    guess' applied to the index itself: the number a 100 TB deployment
    watches when tuning SIGN_BITS / nprobe, produced by the engine
    instead of asserted in a docstring). n_ann < 5 exposes undersized
    buckets; n_hits counts exact neighbors the ANN path found; the
    recall denominator is the requested k, so empty buckets score 0.

    Scale: the exact leg is the linear yardstick run over a bounded
    QUERY SAMPLE (8 probes here) — evaluation cost is n_queries x
    corpus, not corpus^2; the ANN leg is the production bucket
    equi-join. Composes the two already-oracled retrieval pipelines and
    re-derives both in the oracle, so the measurement is itself under
    the hash gate. Reference analogue: none."""
    emb = _t(spark, sf_dir, "embeddings")
    exact = S.topk_bruteforce(emb, n_queries=8, k=5).select(
        "query_id", "neighbor_id"
    )
    ann = S.topk_ann_signlsh(emb, n_queries=8, k=5).select(
        "query_id", "neighbor_id"
    )
    qs = exact.select("query_id").distinct()
    na = ann.groupBy("query_id").agg(F.count("*").alias("n_ann"))
    hits = (
        ann.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        qs.join(na, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_ann", F.lit(0)).cast("bigint").alias("n_ann"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)).cast("double") / 5, 6
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


@query(
    "sim_ann_ivf",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
    assign AS (
      SELECT e.vec_id, e.v, cell
      FROM e, c
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY round(list_cosine_similarity(v, cv), 6) DESC, cell ASC
      ) = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    probe AS (
      SELECT query_id, qv, cell
      FROM q, c
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC, cell ASC
      ) <= 2)
    SELECT query_id, a.vec_id AS neighbor_id,
           round(list_cosine_similarity(qv, a.v), 6) AS cosine
    FROM probe p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.query_id
    QUALIFY row_number() OVER (
      PARTITION BY query_id
      ORDER BY round(list_cosine_similarity(qv, a.v), 6) DESC, a.vec_id ASC
    ) <= 5
    ORDER BY query_id, cosine DESC, neighbor_id
    """,
    driver=False,  # folded: iter3 kmeans variant supersets the IVF mechanics
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (coarse cells + nprobe probing) — the oracle reproduces the
    quantizer, cell assignment, and probing, so the index STRUCTURE is
    correctness-checked, not just final scores."""
    return S.topk_ann_ivf(
        _t(spark, sf_dir, "embeddings"), n_queries=8, k=5, n_cells=16, nprobe=2
    ).orderBy("query_id", F.desc("cosine"), "neighbor_id")


def _sql_ivf_kmeans(iters: int) -> str:
    """Generate the DuckDB oracle for an ``iters``-iteration Lloyd refine:
    the same CTE block (assign -> explode dims -> decimal-exact means ->
    regroup) stacked once per iteration — the SQL mirror of the operator's
    materialize-per-iteration loop."""
    assign = (
        "(SELECT e.vec_id, e.v, cell FROM e, {cells}\n"
        "       QUALIFY row_number() OVER (\n"
        "         PARTITION BY e.vec_id\n"
        "         ORDER BY round(list_cosine_similarity(v, cv), 6) DESC,"
        " cell ASC) = 1)"
    )
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16)",
    ]
    for i in range(iters):
        ctes += [
            f"a{i} AS " + assign.format(cells=f"c{i}"),
            f"px{i} AS (SELECT cell, u.p AS pos, u.x AS val\n"
            f"       FROM a{i},\n"
            "            unnest([{'p': i, 'x': v[i]}"
            " for i in range(1, len(v) + 1)]) AS t(u))",
            f"cent{i} AS (SELECT cell, pos,\n"
            "           CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE)"
            " / count(*) AS cv_e\n"
            f"         FROM px{i} GROUP BY 1, 2)",
            f"c{i + 1} AS (SELECT cell, list(cv_e ORDER BY pos) AS cv"
            f" FROM cent{i} GROUP BY 1)",
        ]
    fin = f"c{iters}"
    ctes += [
        "af AS " + assign.format(cells=fin),
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8)",
        f"probe AS (SELECT query_id, qv, cell FROM q, {fin}\n"
        "      QUALIFY row_number() OVER (\n"
        "        PARTITION BY query_id\n"
        "        ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC,"
        " cell ASC) <= 2)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT query_id, af.vec_id AS neighbor_id,\n"
        "       round(list_cosine_similarity(qv, af.v), 6) AS cosine\n"
        "FROM probe p JOIN af ON af.cell = p.cell AND af.vec_id != p.query_id\n"
        "QUALIFY row_number() OVER (\n"
        "  PARTITION BY query_id\n"
        "  ORDER BY round(list_cosine_similarity(qv, af.v), 6) DESC,"
        " af.vec_id ASC) <= 5\n"
        "ORDER BY query_id, cosine DESC, neighbor_id"
    )


def _sql_pq_adc() -> str:
    """DuckDB oracle for 1-Lloyd-iteration PQ + ADC (operators.similarity
    topk_ann_pq): subspace split -> seeded codebooks -> decimal-exact
    refine -> encode -> per-subspace dot-product terms -> exact DECIMAL
    ADC sum -> top-5."""
    sd = S.PQ_SUBDIM
    assign = (
        "(SELECT sub.vec_id, sub.m, sub.sv, code FROM sub JOIN {books} USING (m)\n"
        "   QUALIFY row_number() OVER (PARTITION BY sub.vec_id, sub.m\n"
        "     ORDER BY round(list_cosine_similarity(sv, cv), 6) DESC,"
        " code ASC) = 1)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sub AS (SELECT vec_id, r.range AS m,
                   v[r.range * {sd} + 1 : r.range * {sd} + {sd}] AS sv
            FROM e, range(0, {S.PQ_M}) r),
    b0 AS (SELECT m, vec_id AS code, sv AS cv FROM sub
           WHERE vec_id < {S.PQ_K}),
    a0 AS {assign.format(books='b0')},
    px0 AS (SELECT m, code, u.p AS pos, u.x AS val FROM a0,
            unnest([{{'p': i, 'x': sv[i]}}
                    for i in range(1, len(sv) + 1)]) AS t(u)),
    c0 AS (SELECT m, code, pos,
                  CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE)
                    / count(*) AS cv_e
           FROM px0 GROUP BY 1, 2, 3),
    b1 AS (SELECT m, code, list(cv_e ORDER BY pos) AS cv
           FROM c0 GROUP BY 1, 2),
    enc AS {assign.format(books='b1')},
    q AS (SELECT vec_id AS query_id, m, sv AS qsv FROM sub
          WHERE vec_id < 8),
    terms AS (SELECT query_id, enc.vec_id,
                     CAST(round(list_dot_product(qsv, cv), 6)
                          AS DECIMAL(18,6)) AS term
              FROM enc JOIN b1 USING (m, code) JOIN q USING (m)),
    scores AS (SELECT query_id, vec_id,
                      CAST(sum(term) AS DOUBLE) AS approx_ip
               FROM terms WHERE vec_id != query_id GROUP BY 1, 2)
    SELECT query_id, vec_id AS neighbor_id,
           round(approx_ip, 6) AS approx_ip
    FROM scores
    QUALIFY row_number() OVER (PARTITION BY query_id
      ORDER BY approx_ip DESC, vec_id ASC) <= 5
    ORDER BY query_id, approx_ip DESC, neighbor_id
    """


@query(
    "sim_ann_pq_adc",
    _sql_pq_adc(),
    # New r6 (locally pinned; r7 rotation candidate).
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
)
def sim_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization + asymmetric distance (operators.similarity
    .topk_ann_pq): 8 subspace codebooks of 8 centroids (one decimal-
    exact Lloyd refine), corpus stored as 8 codes/vector (32x
    compression), queries ranked by the exact-DECIMAL sum of rounded
    per-subspace inner products. The oracle replays codebook training,
    encoding, and ADC bit-for-bit — completing the oracle-checked vector
    index triad (sign-LSH buckets, IVF cell probing, PQ compression)."""
    return S.topk_ann_pq(
        _t(spark, sf_dir, "embeddings"), n_queries=8, k=5
    ).orderBy("query_id", F.desc("approx_ip"), "neighbor_id")


@query("sim_ann_ivf_kmeans", _sql_ivf_kmeans(1), driver=False)
def sim_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a k-means-refined quantizer (one Lloyd iteration, decimal-
    exact centroid means). The oracle reproduces seeding, assignment, the
    refinement arithmetic, and probing — the full index build is
    correctness-checked bit-for-bit."""
    return S.topk_ann_ivf_kmeans(
        _t(spark, sf_dir, "embeddings"), n_queries=8, k=5, n_cells=16, nprobe=2
    ).orderBy("query_id", F.desc("cosine"), "neighbor_id")



@query("sim_ann_ivf_kmeans_iter3", _sql_ivf_kmeans(3), driver=False)  # demoted r7 (rotation)
def sim_ann_ivf_kmeans_iter3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-iteration Lloyd refinement (3 iterations, each materialized
    once and decimal-exact): the converged-quantizer path. The oracle SQL
    is GENERATED for the same iteration count (_sql_ivf_kmeans), so Spark
    and DuckDB run the identical iteration-unrolled algorithm — every
    intermediate centroid set is implicitly pinned."""
    return S.topk_ann_ivf_kmeans(
        _t(spark, sf_dir, "embeddings"),
        n_queries=8,
        k=5,
        n_cells=16,
        nprobe=2,
        iterations=3,
    ).orderBy("query_id", F.desc("cosine"), "neighbor_id")


@query("dd_corpus_clean", _SQL_CORPUS_CLEAN, driver=False)  # demoted r7 (rotation)
def dd_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship LLM-training-data pipeline, end to end: language
    filter -> quality filter -> exact dedup -> MinHash-LSH near-dup
    removal -> surviving corpus. Every stage is one of the engine's
    oracle-checked operators composed lazily into a single Catalyst plan
    (the filters run BEFORE the expensive shingle/LSH stages, so the
    near-dup pass sees only the quality-English subset — the order a
    100 TB curation run must use).

    Near-dup policy: from each LSH-verified pair (jaccard >= 0.5) the
    higher doc_id is dropped ("keep first seen") — deterministic,
    single-pass, and the standard greedy choice when full
    connected-component resolution isn't worth a transitive closure."""
    docs = _t(spark, sf_dir, "documents")
    prof = T.text_profile(docs).select(
        "doc_id", "n_tokens", "quality_pts", T.predicted_lang().alias("plang")
    )
    kept = (
        prof.filter((F.col("plang") == "en") & (F.col("quality_pts") >= 45))
        .select("doc_id", "n_tokens", "quality_pts")
        # Tiny frame (surviving ids + 2 stat columns), huge lineage (the
        # full explode+aggregate profile) referenced by every downstream
        # branch — the GOOD localCheckpoint pattern: materialize the ids
        # once, then each branch filters the corpus with a broadcast
        # semi-join instead of re-running the profile shuffle. (Contrast
        # the measured-8x-slower checkpoint of the WIDE text-carrying
        # frame, which this replaces.)
        .localCheckpoint(eager=True)
    )
    # Re-attach the payload by id for the dedup/LSH stages — text must
    # never ride through the profile's groupBy shuffle.
    filt = docs.select("doc_id", "text").join(
        F.broadcast(kept.select("doc_id")), "doc_id", "left_semi"
    )
    reps = D.exact_dedup(filt).select("doc_id")
    # filt/s2 themselves stay LAZY: each re-evaluation is just a parquet
    # scan + broadcast semi-join against the checkpointed id set. (An
    # eager checkpoint of the WIDE text-carrying frame here was measured
    # 8x slower — materialize small id/stat frames, never payloads.)
    s2 = filt.join(reps, "doc_id", "left_semi")
    near = D.minhash_lsh_pairs(
        s2.select("doc_id", "text"), threshold=0.5
    ).select(F.col("id_b").alias("doc_id")).distinct()
    return (
        s2.select("doc_id")
        .join(near, "doc_id", "left_anti")
        .join(kept, "doc_id")
        .select("doc_id", "n_tokens", "quality_pts")
        .orderBy("doc_id")
    )


# ===========================================================================
# Text analysis
# ===========================================================================


@query(
    "tx_text_profile",
    f"""
    WITH d AS (SELECT doc_id, lang, text, string_split(text, ' ') AS w
               FROM documents),
    h AS (SELECT doc_id, lang, text, w,
            {_HITS['en']}::BIGINT AS hits_en,
            {_HITS['es']}::BIGINT AS hits_es,
            {_HITS['zh']}::BIGINT AS hits_zh,
            len(w)::BIGINT AS n_tokens,
            round(len(list_distinct(w)) / len(w), 6) AS distinct_ratio,
            round({_STOP_SQL} / len(w), 6) AS stop_ratio,
            round(list_sum([length(t) for t in w]) / len(w), 6)
              AS mean_token_len,
            {_SQL_QUALITY_PTS} AS quality_pts
          FROM d),
    hw AS (SELECT doc_id, w,
             [('0x' || substr(md5(x), 1, 15))::BIGINT % {1_000_000_007}
              for x in w] AS hs
           FROM d)
    SELECT h.doc_id, lang AS labeled_lang, hits_en, hits_es, hits_zh,
           {_LANG_CASE} AS predicted_lang,
           n_tokens, distinct_ratio, stop_ratio, mean_token_len, quality_pts,
           len(string_split(text, ' '))::BIGINT AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+'))::BIGINT AS word_runs,
           len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS digit_runs,
           length(text)::BIGINT AS n_chars_seen,
           list_reduce(list_prepend(0, hs),
                       (a, b) -> (a * 31 + b) % {1_000_000_007})::BIGINT
             AS doc_hash,
           list_min([list_reduce(list_prepend(0, hs[i:i+3]),
                                 (a, b) -> (a * 31 + b) % {1_000_000_007})
                     for i in range(1, len(hw.w) - 2)])::BIGINT
             AS min_window_hash
    FROM h JOIN hw USING (doc_id)
    ORDER BY doc_id
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def tx_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full per-document text-analysis profile in ONE driver row:
    language-ID (lexicon argmax), quality scoring, token counting, and
    rolling-hash fingerprinting — the four operators the demoted
    tx_lang_id / tx_quality_score / tx_token_count / tx_fingerprint
    entries pin individually (each still locally oracle-checked; this
    merged projection is what the capped driver sweep verifies).

    Plan shape: three branches over one documents scan — the
    explode+codegen profile shuffle (functions.text.text_profile), a
    map-only token-count projection, and the codegen-hashed fingerprint
    regroup (token_hash_frame) — joined back on doc_id. Two shuffles
    total; payload text never rides through either groupBy.
    """
    docs = _t(spark, sf_dir, "documents")
    prof = T.text_profile(docs, carry=("lang",))
    counts = docs.select(
        "doc_id", *[c.alias(n) for n, c in T.token_counts("text").items()]
    )
    fp = T.token_hash_frame(docs).select(
        "doc_id", *[c.alias(n) for n, c in T.fingerprint_columns("hs").items()]
    )
    return (
        prof.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            "hits_en",
            "hits_es",
            "hits_zh",
            T.predicted_lang().alias("predicted_lang"),
            "n_tokens",
            "distinct_ratio",
            "stop_ratio",
            "mean_token_len",
            "quality_pts",
        )
        .join(counts, "doc_id")
        .join(fp, "doc_id")
        .orderBy("doc_id")
    )






@query(
    "tx_quality_score",
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           len(w)::BIGINT AS n_tokens,
           round(len(list_distinct(w)) / len(w), 6) AS distinct_ratio,
           round({_STOP_SQL} / len(w), 6) AS stop_ratio,
           round(list_sum([length(t) for t in w]) / len(w), 6) AS mean_token_len,
           ( (least(len(w), 100) * 25) // 100
             + (len(list_distinct(w)) * 35) // len(w)
             + least(({_STOP_SQL} * 100) // len(w), 20)
             + least((list_sum([length(t) for t in w]) * 20) // (8 * len(w)), 20)
           )::BIGINT AS quality_pts
    FROM d ORDER BY doc_id
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def tx_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score (C4/Gopher-filter shape), computed
    with the MAP-ONLY column expressions (functions.text.quality_columns)
    — no explode, no shuffle beyond the output sort.

    Formulation choice is measured, not assumed: the explode+aggregate
    text_profile formulation won this round's A/B for the COMBINED
    lang+quality profile (the explode amortizes across five lexicon
    scans), but for the quality components alone it is 2x SLOWER
    (median-of-3 at sf0.1: 1.15s vs 0.56s) — the explode+join overhead
    without the amortization. tx_text_profile keeps the exploded path;
    this standalone query keeps the map-only one; the shared oracle pins
    both to identical integers."""
    docs = _t(spark, sf_dir, "documents")
    cols = T.quality_columns("text")
    return docs.select(
        "doc_id", *[v.alias(k) for k, v in cols.items()]
    ).orderBy("doc_id")


MIX_TAU = 0.7  # temperature for source-mixture reweighting


@query(
    "tx_mixture_weights",
    f"""
    WITH tc AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1),
    tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM tc),
    pw AS (
      SELECT source, n_docs, n_tokens, t,
             round(n_tokens::DOUBLE / t, 6) AS p,
             CAST(round(power(n_tokens::DOUBLE / t, {MIX_TAU}), 6)
                  AS DECIMAL(18,6)) AS pt
      FROM tc, tot),
    s AS (SELECT CAST(sum(pt) AS DOUBLE) AS st FROM pw)
    SELECT source, n_docs, n_tokens, p,
           round(CAST(pt AS DOUBLE) / st, 6) AS w,
           round(CAST(pt AS DOUBLE) / st * t / n_tokens, 6)
             AS expected_epochs
    FROM pw, s ORDER BY source
    """,
    # New r6 (locally pinned; r7 rotation candidate).
    driver=False,
)
def tx_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual-sampling
    recipe: w_i = p_i^tau / sum p_j^tau with tau=0.7): given per-source
    token mass, compute the sampling weight each source gets in the
    training mixture and the expected epoch count (how many times the
    source's data is repeated when sampling the reweighted mixture for
    one total-corpus pass) — upsampling low-resource sources is
    expected_epochs > 1. The last step of corpus curation before
    packing.

    Exactness: token counts exact BIGINT; p^tau follows the repo-wide
    transcendental convention (round-6 then exact DECIMAL sum for the
    normalizer); w and expected_epochs are identically-shaped double
    expressions over those exact parts.

    Scale: one grouped count over the corpus (map-side combined) + a
    |sources|-row frame; everything after the first aggregate is
    dimension-sized. Reference analogue: none."""
    docs = _t(spark, sf_dir, "documents")
    tc = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = tc.agg(F.sum("n_tokens").cast("bigint").alias("t"))
    pw = tc.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "t",
        F.round(F.col("n_tokens").cast("double") / F.col("t"), 6).alias("p"),
        F.round(
            F.pow(F.col("n_tokens").cast("double") / F.col("t"), MIX_TAU), 6
        )
        .cast("decimal(18,6)")
        .alias("pt"),
    )
    s = pw.agg(F.sum("pt").cast("double").alias("st"))
    ptd = F.col("pt").cast("double")
    return (
        pw.crossJoin(F.broadcast(s))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "p",
            F.round(ptd / F.col("st"), 6).alias("w"),
            F.round(
                ptd / F.col("st") * F.col("t") / F.col("n_tokens"), 6
            ).alias("expected_epochs"),
        )
        .orderBy("source")
    )


@query(
    "tx_token_count",
    """
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+'))::BIGINT AS word_runs,
           len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS digit_runs,
           length(text)::BIGINT AS n_chars_seen
    FROM documents ORDER BY doc_id
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def tx_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex letter/digit runs."""
    cols = T.token_counts("text")
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", *[c.alias(n) for n, c in cols.items()])
        .orderBy("doc_id")
    )


@query(
    "tx_fingerprint",
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    hw AS (SELECT doc_id, w,
             [('0x' || substr(md5(x), 1, 15))::BIGINT % {1_000_000_007}
              for x in w] AS hs
           FROM d)
    SELECT doc_id,
           list_reduce(list_prepend(0, hs),
                       (a, b) -> (a * 31 + b) % {1_000_000_007})::BIGINT
             AS doc_hash,
           list_min([list_reduce(list_prepend(0, hs[i:i+3]),
                                 (a, b) -> (a * 31 + b) % {1_000_000_007})
                     for i in range(1, len(w) - 2)])::BIGINT
             AS min_window_hash
    FROM hw ORDER BY doc_id
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash doc fingerprint + winnowing-style min 4-token window.
    Hashing runs codegen-side (functions.text.token_hash_frame); only the
    integer fold is interpreted."""
    cols = T.fingerprint_columns("hs")
    return (
        T.token_hash_frame(_t(spark, sf_dir, "documents"))
        .select("doc_id", *[c.alias(n) for n, c in cols.items()])
        .orderBy("doc_id")
    )


@query(
    "tx_tfidf_top_terms",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf,
           round(tf * ln(n_docs / df), 6) AS tfidf
    FROM tf JOIN dfreq USING (term), n
    QUALIFY row_number() OVER (
      PARTITION BY doc_id
      ORDER BY round(tf * ln(n_docs / df), 6) DESC, term ASC
    ) <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green r1-r6)
)
def tx_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF, top-3 terms per document.

    Scale shape: two shuffles (tf groupBy, df groupBy); document frequency
    is a tiny vocabulary-sized table -> broadcast back onto tf; N arrives
    as a broadcast 1-row count, not a collected literal. Tie-break (term
    asc) makes the per-doc top-3 engine-independent.
    """
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "tfidf")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@query(
    "tx_hash_split",
    f"""
    SELECT {SP.sql_split_column('doc_id', _SPLIT_WEIGHTS)} AS split,
           lang, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY 1, 2 ORDER BY split, lang
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def tx_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by key hash
    (operators.sampling.split_column) — reproducible dataset splitting as
    a pure function of doc_id: stable under repartitioning, task
    retries, engines (the oracle runs the SAME md5 arithmetic), and
    incremental data arrival (new docs join a split without moving old
    ones — the property seeded-RNG sample() lacks). Output: per
    (split, lang) doc counts and total chars."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", SP.split_column("doc_id", _SPLIT_WEIGHTS))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .orderBy("split", "lang")
    )


@query(
    "wh_table_profile",
    """
    WITH n AS (SELECT count(*) AS n FROM orders)
    SELECT * FROM (
      SELECT 'o_orderkey' AS col_name, n.n,
             (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS n_null,
             (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_distinct,
             (SELECT round(CAST(min(o_orderkey) AS DOUBLE), 6) FROM orders)
               AS min_num,
             (SELECT round(CAST(max(o_orderkey) AS DOUBLE), 6) FROM orders)
               AS max_num,
             CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      FROM n
      UNION ALL
      SELECT 'o_totalprice', n.n,
             (SELECT count(*) FROM orders WHERE o_totalprice IS NULL),
             (SELECT count(DISTINCT o_totalprice) FROM orders),
             (SELECT round(CAST(min(o_totalprice) AS DOUBLE), 6) FROM orders),
             (SELECT round(CAST(max(o_totalprice) AS DOUBLE), 6) FROM orders),
             NULL, NULL
      FROM n
      UNION ALL
      SELECT 'o_orderstatus', n.n,
             (SELECT count(*) FROM orders WHERE o_orderstatus IS NULL),
             (SELECT count(DISTINCT o_orderstatus) FROM orders),
             NULL, NULL,
             (SELECT min(o_orderstatus) FROM orders),
             (SELECT max(o_orderstatus) FROM orders)
      FROM n
      UNION ALL
      SELECT 'o_orderdate', n.n,
             (SELECT count(*) FROM orders WHERE o_orderdate IS NULL),
             (SELECT count(DISTINCT o_orderdate) FROM orders),
             NULL, NULL,
             (SELECT CAST(min(o_orderdate) AS VARCHAR) FROM orders),
             (SELECT CAST(max(o_orderdate) AS VARCHAR) FROM orders)
      FROM n
    ) ORDER BY col_name
    """,
    # Promoted r5 into the driver surface (rotation: first driver row).
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def wh_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile (operators.quality.profile): counts,
    null counts, exact NDV, and typed min/max for a numeric + string +
    date column mix over orders — ONE aggregate, stack()-pivoted to
    tidy rows (the expand-based multi-distinct plan documented in the
    operator). The oracle recomputes each statistic independently."""
    from ..operators import quality as Q

    orders = _t(spark, sf_dir, "orders")
    return Q.profile(
        orders,
        num_cols=["o_orderkey", "o_totalprice"],
        str_cols=["o_orderstatus", "o_orderdate"],
    ).orderBy("col_name")


@query(
    "wh_expectations",
    """
    WITH checks AS (
      SELECT 'not_null(o_custkey)' AS check_name,
             count(*) FILTER (WHERE o_custkey IS NULL) AS n FROM orders
      UNION ALL
      SELECT 'not_null(o_orderkey)',
             count(*) FILTER (WHERE o_orderkey IS NULL) FROM orders
      UNION ALL
      SELECT 'in_range(o_totalprice)',
             count(*) FILTER (WHERE o_totalprice < 0) FROM orders
      UNION ALL
      SELECT 'in_set(o_orderstatus)',
             count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('P', 'O', 'F'))
      FROM orders
      UNION ALL
      SELECT 'matches(o_orderpriority)',
             count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                              AND NOT regexp_matches(o_orderpriority,
                                                     '^[1-5]-'))
      FROM orders
      UNION ALL
      SELECT 'unique(o_orderkey)',
             (SELECT sum(c - 1)
              FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey))
      UNION ALL
      SELECT 'fk(o_custkey->customer)',
             (SELECT count(*) FROM orders o
              LEFT JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
    )
    SELECT check_name, CAST(n AS BIGINT) AS n_violations,
           n = 0 AS passed
    FROM checks ORDER BY check_name
    """,
    # Promoted r5 into the driver surface (rotation: first driver row).
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def wh_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations battery (operators.quality) over the
    orders fact: null checks, a price range, a status domain, a priority
    pattern, primary-key uniqueness, and FK integrity against the
    customer dim — all row checks folded into ONE scan (stack()-pivoted
    single aggregate), plus one group-by and one broadcast anti-join.
    The publish-gate report the reference never had; oracle recomputes
    every violation count in SQL."""
    from ..operators import quality as Q

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    report = Q.expectations(
        orders,
        row_checks=[
            Q.not_null("o_custkey"),
            Q.not_null("o_orderkey"),
            Q.in_range("o_totalprice", lo=0),
            Q.in_set("o_orderstatus", ["P", "O", "F"]),
            Q.matches("o_orderpriority", "^[1-5]-"),
        ],
        unique_checks=[Q.unique("o_orderkey")],
        fk_checks=[
            ("fk(o_custkey->customer)", customer, "o_custkey", "c_custkey")
        ],
    )
    return report.orderBy("check_name")


@query(
    "wh_scd2_history",
    """
    WITH obs AS (
      SELECT o_custkey AS custkey, o_orderpriority AS priority,
             o_orderdate AS ts, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS seq,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
               AS prev
      FROM orders
    ), v AS (
      SELECT custkey, priority, ts AS valid_from, seq
      FROM obs WHERE prev IS NULL OR priority <> prev
    )
    SELECT custkey, priority, valid_from,
           lead(valid_from) OVER (PARTITION BY custkey ORDER BY seq)
             AS valid_to,
           CAST(row_number() OVER (PARTITION BY custkey ORDER BY seq)
                AS BIGINT) AS version,
           (lead(valid_from) OVER (PARTITION BY custkey ORDER BY seq)
            IS NULL) AS is_current
    FROM v ORDER BY custkey, version
    """,
    # Promoted r6 (rotation: first driver row).
    driver=False,  # rotated OUT r8 (driver-green; plans/rotation.py)
)
def wh_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history (operators.scd.scd2_from_changes):
    each customer's order-priority observations (one per order, ordered
    by date with orderkey tie-break) compressed into versioned
    [valid_from, valid_to) rows with run-length collapse of unchanged
    priorities. Pure window functions — ONE shuffle on the customer key;
    the oracle rebuilds the same versions with lag/lead windows. The
    reference's gold rebuild overwrites dimension history on every
    refresh (etl.ipynb:174-192); this is the warehouse-correct
    alternative."""
    from ..operators.scd import scd2_from_changes

    ch = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
    )
    hist = scd2_from_changes(
        ch, key="custkey", attrs=["priority"], ts_col="ts",
        tie_break="o_orderkey",
    )
    return hist.orderBy("custkey", "version")


@query(
    "wh_scd2_lookup",
    """
    WITH obs AS (
      SELECT o_custkey AS custkey, o_orderpriority AS priority,
             o_orderdate AS ts, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS seq,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
               AS prev
      FROM orders
    ), v AS (
      SELECT custkey, priority, ts AS valid_from, seq,
             CAST(row_number() OVER (PARTITION BY custkey ORDER BY seq)
                  AS BIGINT) AS version
      FROM (SELECT * FROM obs WHERE prev IS NULL OR priority <> prev)
    ), hist AS (
      -- end-of-day grain: last version per (custkey, valid_from), so
      -- the as-of probe below has a unique right key per timestamp
      SELECT * FROM v
      QUALIFY row_number() OVER (PARTITION BY custkey, valid_from
                                 ORDER BY version DESC) = 1
    ), fact AS (
      SELECT DISTINCT o_custkey AS custkey, o_orderdate AS ts FROM orders
    )
    SELECT f.custkey, f.ts,
           h.priority AS dim_priority,
           h.version AS dim_version,
           h.valid_from AS dim_valid_from
    FROM fact f ASOF LEFT JOIN hist h
      ON f.custkey = h.custkey AND f.ts >= h.valid_from
    ORDER BY f.custkey, f.ts
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def wh_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup (operators.scd.scd2_lookup): every
    distinct (customer, date) fact probe gets the priority version valid
    AT that date. History is first reduced to end-of-day grain (last
    version per (key, valid_from)) so the as-of right side is unique per
    timestamp; the lookup itself is the single-shuffle as-of carry, not
    an interval join. Oracle: DuckDB ASOF LEFT JOIN over the identical
    window-built history."""
    from ..operators.scd import scd2_from_changes, scd2_lookup
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    ch = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
    )
    hist = scd2_from_changes(
        ch, key="custkey", attrs=["priority"], ts_col="ts",
        tie_break="o_orderkey",
    )
    eod = (
        hist.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("custkey", "valid_from").orderBy(
                    F.col("version").desc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "valid_to")
    )
    fact = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
    ).distinct()
    out = scd2_lookup(fact, eod, key="custkey", ts_col="ts", prefix="dim_")
    return out.select(
        "custkey", "ts", "dim_priority", "dim_version", "dim_valid_from"
    ).orderBy("custkey", "ts")


@query(
    "sim_quantize_int8",
    """
    WITH v AS (
      SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
    s AS (
      SELECT vec_id, v, list_max([abs(x) for x in v]) / 127 AS scale FROM v)
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_dims,
           round(scale, 9) AS scale9,
           array_to_string(
             [CAST(CASE WHEN scale = 0 THEN 0
                        WHEN x >= 0 THEN floor(x / scale + 0.5)
                        ELSE -floor(-x / scale + 0.5) END AS BIGINT)
              for x in v], ',') AS codes_csv
    FROM s ORDER BY vec_id
    """,
    # Promoted r5 into the driver surface (rotation: first driver row).
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 embedding quantization (operators.similarity.quantize_int8):
    per-vector symmetric scale + half-away-from-zero codes, byte-pinned
    by an oracle that reproduces the same float64 arithmetic over the
    same float32 inputs — codes AND scales must match exactly, so a
    rounding-mode drift (numpy's half-to-even default, for instance)
    fails the gate."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.quantize_int8(emb).orderBy("vec_id")


@query(
    "tx_decontaminate",
    f"""
    WITH d AS (
      SELECT doc_id,
             {SP.sql_split_column('doc_id', _SPLIT_WEIGHTS)} AS split,
             string_split(text, ' ') AS w
      FROM documents),
    sh AS (SELECT doc_id, split, {_P.sql_shingles('w', D.N_SHINGLE)} AS sh
           FROM d),
    ex AS (SELECT doc_id, split, {_P.sql_md5_long('s')} AS h
           FROM (SELECT doc_id, split, unnest(sh) AS s FROM sh)),
    t AS (SELECT DISTINCT h FROM ex WHERE split = 'test')
    SELECT ex.doc_id, count(*) AS n_shared
    FROM ex JOIN t USING (h)
    WHERE ex.split = 'train'
    GROUP BY 1 HAVING count(*) >= 2
    ORDER BY n_shared DESC, doc_id ASC
    """,
    # Promoted r5 into the driver surface (rotation: first driver row).
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def tx_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination report
    (operators.dedup.contamination_report): train-split documents (the
    deterministic tx_hash_split assignment) sharing >= 2 distinct
    word-5-gram shingles with any test-split document, ranked most
    contaminated first. The oracle reproduces the split, the shingling,
    and the 60-bit hash join, so the flagged SET is pinned exactly."""
    docs = _t(spark, sf_dir, "documents")
    split = docs.withColumn("split", SP.split_column("doc_id", _SPLIT_WEIGHTS))
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")
    return (
        D.contamination_report(train, test, min_shared=2)
        .orderBy(F.desc("n_shared"), F.asc("doc_id"))
    )


@query(
    "tx_stratified_sample",
    f"""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_P.sql_md5_long("doc_id::VARCHAR || 'strat1'")} ASC,
                        doc_id ASC) AS rk
      FROM documents)
    SELECT doc_id, lang FROM r WHERE rk <= 20 ORDER BY lang, doc_id
    """,
    # Locally-pinned (driver surface capped at 50): same portable-md5
    # determinism family as tx_hash_split, which is driver-green.
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
)
def tx_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-docs-per-language stratified sample
    (operators.sampling.stratified_topk): per-stratum quotas for
    balancing a training mix, ranked by salted portable md5 so the
    selected SET is a pure function of the keys — the oracle pins exact
    membership, not just counts, because the same hash arithmetic runs
    in DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    return (
        SP.stratified_topk(docs, "lang", "doc_id", k=20, salt="strat1")
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


@query(
    "tx_heavy_collocations",
    """
    WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
    g AS (SELECT unnest([w[i] || ' ' || w[i+1]
                         for i in range(1, len(w))]) AS gram FROM d),
    v AS (SELECT gram, count(*) AS n FROM g GROUP BY 1),
    t AS (SELECT sum(n) AS total FROM v)
    SELECT gram, n, round(n::DOUBLE / total, 6) AS share
    FROM v, t WHERE n > 0.001 * total
    ORDER BY n DESC, gram
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def tx_heavy_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent collocations (word bigrams with >0.1% corpus share) via
    the Misra-Gries two-pass sketch (operators.sketch.heavy_hitters):
    pass 1 keeps O(1/phi) counters per partition in a mapInPandas
    summary, pass 2 exact-counts only the candidate union — state is
    bounded by the sketch, never by the n-gram domain, yet the output
    is the EXACT heavy set (the superset guarantee means no heavy gram
    can be missed), which is why a plain GROUP BY oracle can pin it.
    Bigrams are built with posexplode + lead (the codegen-friendly
    pattern; HOF string-building lambdas measured 3-14x slower)."""
    from pyspark.sql.window import Window

    from ..operators.sketch import heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.withColumn("nxt", F.lead("term").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "term", "nxt").alias("gram"))
    )
    return heavy_hitters(grams, "gram", phi=0.001)


@query(
    "tx_unigram_logprob",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    v AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
    n AS (SELECT sum(c) AS total FROM v),
    lp AS (SELECT term,
                  round(ln(c::DOUBLE / total), 6)::DECIMAL(18,6) AS logp
           FROM v, n)
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(logp) AS DOUBLE) AS sum_logp,
           round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS avg_logp
    FROM tok JOIN lp USING (term)
    GROUP BY doc_id ORDER BY doc_id
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def tx_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram language-model scoring — the statistical quality
    signal beside the rule-based heuristics (functions.text
    quality_pts): each document's mean token log-likelihood under the
    corpus's own unigram distribution; rare-token soup scores low, the
    cheap first-pass perplexity filter of LLM data pipelines.

    Scale + determinism shape: the LM itself is a vocabulary-sized
    frame (term counts -> broadcast), so scoring is one explode + one
    broadcast join + one groupBy. Per-term log-probs are rounded to 6dp
    and summed as DECIMAL(18,6) — decimal addition is exact and
    associative, so the per-doc sum is identical no matter what order
    partial aggregation combines tokens in (raw double sums would drift
    between engines and between runs)."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    v = tok.groupBy("term").agg(F.count("*").alias("c"))
    n = v.agg(F.sum("c").alias("total"))
    lp = (
        v.crossJoin(F.broadcast(n))
        .select(
            "term",
            F.round(F.log(F.col("c").cast("double") / F.col("total")), 6)
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    return (
        tok.join(F.broadcast(lp), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("logp").cast("double").alias("sum_logp"),
        )
        .withColumn(
            "avg_logp",
            F.round(F.col("sum_logp") / F.col("n_tokens"), 6),
        )
        .orderBy("doc_id")
    )


@query(
    "tx_weighted_sample",
    f"""
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {SP.sql_weighted_rank_key("doc_id", "n_chars", "wtd1")}
                          DESC,
                        doc_id ASC) AS rk
      FROM documents)
    SELECT doc_id, lang, n_chars FROM r WHERE rk <= 15
    ORDER BY lang, doc_id
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def tx_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted per-language sample
    (operators.sampling.weighted_topk, Efraimidis–Spirakis A-Res):
    15 docs per language with inclusion probability proportional to
    n_chars — the 'sample proportional to token count' draw a training
    mix uses so long documents aren't underrepresented per-doc. The
    oracle runs the identical hash→uniform→ln(u)/w arithmetic in DuckDB
    and pins exact membership, not just counts."""
    docs = _t(spark, sf_dir, "documents")
    return (
        SP.weighted_topk(
            docs, "lang", "doc_id", "n_chars", k=15, salt="wtd1"
        )
        .select("doc_id", "lang", "n_chars")
        .orderBy("lang", "doc_id")
    )


CHUNK_WORDS = 50
CHUNK_STRIDE = 40


@query(
    "tx_chunk_documents",
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    n AS (SELECT doc_id, ws, len(ws) AS nw FROM w),
    s AS (SELECT doc_id, ws, nw,
                 unnest(range(1, greatest(nw - {CHUNK_WORDS - CHUNK_STRIDE},
                                          1) + 1, {CHUNK_STRIDE})) AS st
          FROM n)
    SELECT doc_id,
           CAST((st - 1) / {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(st AS BIGINT) AS start_word,
           CAST(least({CHUNK_WORDS}, nw - st + 1) AS BIGINT) AS n_words,
           array_to_string(
             list_slice(ws, st, least(st + {CHUNK_WORDS - 1}, nw)), ' ')
             AS chunk_text
    FROM s ORDER BY doc_id, chunk_idx
    """,
    # New r6 (locally pinned; future rotation candidate).
    driver=False,
)
def tx_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document CHUNKING — the context-window splitter of
    every RAG/pretraining pipeline: each document becomes overlapping
    {CHUNK_WORDS}-word chunks at stride {CHUNK_STRIDE} ({CHUNK_WORDS -
    CHUNK_STRIDE}-word overlap so no boundary-spanning text is lost),
    with start offsets so chunks map back to their source span. Start
    positions are sequence(1, max(n_words - overlap, 1), stride): every
    word is covered, the final chunk may run short, and a document
    shorter than one stride still yields exactly one chunk (including
    the empty document, whose single chunk is the empty string — the
    split('') == [''] convention both engines share).

    Pure codegen: split + sequence + explode + slice + concat_ws — no
    UDF, no shuffle at all (chunking is embarrassingly map-side; the
    ORDER BY is presentation). Output size ~ n_words/stride rows per
    doc; at 100 TB this runs as a map-only pass whose output feeds
    straight into the tokenize/pack stages (tx_token_count,
    tx_pack_sequences). Reference analogue: none."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    d = docs.select("doc_id", ws.alias("ws"), F.size(ws).alias("nw"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(
            F.col("nw") - (CHUNK_WORDS - CHUNK_STRIDE), F.lit(1)
        ),
        F.lit(CHUNK_STRIDE),
    )
    c = d.select("doc_id", "nw", "ws", F.explode(starts).alias("st"))
    chunk = F.slice("ws", F.col("st"), CHUNK_WORDS)
    return c.select(
        "doc_id",
        ((F.col("st") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("st").cast("bigint").alias("start_word"),
        F.size(chunk).cast("bigint").alias("n_words"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "tx_pack_sequences",
    """
    WITH o AS (
      SELECT lang, n_chars,
             sum(n_chars) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_chars AS off
      FROM documents)
    SELECT lang, CAST(off // 4096 AS BIGINT) AS bin,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM o GROUP BY 1, 2 ORDER BY lang, bin
    """,
    # Locally-pinned (driver surface capped at 50): window-cumsum family
    # is driver-covered by w1/w5; the packing rule itself is pinned here.
    driver=False,
)
def tx_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: documents laid out per
    language in doc_id order and binned by STARTING offset into
    4096-char budgets (operators.sampling.pack_offset_bins — the
    window-cumsum packing rule that parallelizes; exact greedy first-fit
    is a sequential chain). n_chars stands in for the token count the
    real pipeline would use (tx_token_count provides it). The per-bin
    aggregate oracle fails if any document lands in the wrong bin."""
    docs = _t(spark, sf_dir, "documents")
    packed = SP.pack_offset_bins(
        docs, part_col="lang", order_col="doc_id", size_col="n_chars",
        budget=4096,
    )
    return (
        packed.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "bin")
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d[\d-]{7,}\d"


@query(
    "tx_pii_scrub",
    f"""
    WITH injected AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-01'
                  || lpad((doc_id % 100)::VARCHAR, 2, '0') || ' now' AS text2
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text2, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text2, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           md5(regexp_replace(regexp_replace(text2, '{_PII_EMAIL}', '<EMAIL>',
                                             'g'),
                              '{_PII_PHONE}', '<PHONE>', 'g')) AS clean_md5
    FROM injected ORDER BY doc_id
    """,
    # Promoted r5 into the driver surface (rotation: first driver row).
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def tx_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every LLM training pipeline
    runs before text leaves the curation layer: email/phone patterns
    masked with typed placeholders, entirely in JVM regexp expressions
    (no Python in the hot path; at 100 TB this is a map-only stage with
    zero shuffle).

    The fixture text is a synthetic word salad with NO PII, so the query
    first INJECTS deterministic PII derived from doc_id (same expression
    in the oracle) — otherwise the scrub would pass vacuously on text it
    never touched. The md5 of the scrubbed text pins every byte of the
    rewrite; the extract_all counts pin the detector itself.

    Reference analogue: none (reference has no text pipeline)."""
    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit(" now"),
        ).alias("text2"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("text2", F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    return injected.select(
        "doc_id",
        F.size(F.regexp_extract_all("text2", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text2", F.lit(_PII_PHONE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    ).orderBy("doc_id")


@query(
    "tx_repetition_ratio",
    """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, ' +') AS ws FROM documents),
    b AS (
      SELECT doc_id,
             [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))] AS bg
      FROM t)
    SELECT doc_id,
           CAST(len(bg) AS BIGINT) AS n_bigrams,
           round(1 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6)
             AS rep_ratio
    FROM b WHERE len(bg) > 0 ORDER BY doc_id
    """,
    # Locally-pinned (driver surface capped at 50): same explode-free
    # array-expression family as tx_text_profile, which is driver-green.
    driver=False,
)
def tx_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of duplicate
    word 2-grams per document (boilerplate and degenerate generations
    score high and get filtered before training).

    Physical shape: posexplode tokens -> per-doc lead(1) window ->
    count vs countDistinct — one shuffle on doc_id, all whole-stage
    codegen. The shuffle-free alternative (transform over a sequence +
    element_at, a pure array-expression map stage) is interpreted by
    Catalyst, not codegen'd, and measured 14x slower at sf0.1 (19.6s vs
    1.4s) — the same HOF-vs-codegen trade documented at
    operators/dedup.py shingle_rows.

    Reference analogue: none (reference has no text pipeline)."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " +")).alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = tok.select(
        "doc_id",
        F.col("t").alias("a"),
        F.lead("t", 1).over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    return (
        bg.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.countDistinct("a", "b").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                1 - F.col("n_distinct").cast("double") / F.col("n_bigrams"), 6
            ).alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Event-time windows (batch form; streaming lift in streaming.stream)
# ===========================================================================


@query(
    "ev_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           sum(value::DECIMAL(30,6))::DOUBLE AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type (streaming.windows.tumbling)."""
    return W.tumbling(_t(spark, sf_dir, "events"), "1 hour").orderBy(
        "window_start", "event_type"
    )


@query(
    "ev_sliding_1h_15m",
    """
    SELECT make_timestamp(((floor(epoch(ts) / 900) - k) * 900 * 1000000)::BIGINT)
             AS window_start,
           count(*) AS n,
           sum(value::DECIMAL(30,6))::DOUBLE AS total_value
    FROM events, range(0, 4) AS r(k)
    GROUP BY 1 ORDER BY 1
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green r1-r6)
)
def ev_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/15m windows (each event in 4 windows; the oracle expands
    the same 4 epoch-aligned starts explicitly)."""
    return W.sliding(_t(spark, sf_dir, "events"), "1 hour", "15 minutes").orderBy(
        "window_start"
    )


@query(
    "ev_sessionize",
    """
    WITH o AS (
      SELECT user_id, ts, value,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  < INTERVAL '30 minutes'
             THEN 0 ELSE 1 END AS brk
      FROM events),
    s AS (SELECT user_id, ts, value,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
    SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
           count(*) AS n_events,
           sum(value::DECIMAL(30,6))::DOUBLE AS total_value
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, first_ts
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessions per user via F.session_window; the oracle is the
    classic gaps-and-islands formulation (strict '<' matches Spark's
    overlap-merge semantics: a gap of exactly the timeout starts a new
    session)."""
    return W.sessionize(_t(spark, sf_dir, "events"), "30 minutes").orderBy(
        "user_id", "first_ts"
    )


@query(
    "ev_funnel_vcp",
    """
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view') AS t_view,
             min(ts) FILTER (WHERE event_type = 'click') AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id)
    SELECT count(*) AS n_users,
           count(*) FILTER (WHERE t_view IS NOT NULL) AS viewed,
           count(*) FILTER (WHERE t_click > t_view) AS clicked_after_view,
           count(*) FILTER (WHERE t_purchase > t_click AND t_click > t_view)
             AS purchased_after_click
    FROM firsts
    """,
    driver=False,  # demoted r6 (rotation; driver-green r5 and earlier)
)
def ev_funnel_vcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel by first-occurrence ordering.

    One shuffle (user groupBy with conditional min aggregates), then a
    single-row conditional count — the canonical event-funnel shape. NULL
    semantics do the stage gating: a comparison with a missing stage is
    NULL -> not counted, identical in both engines.
    """
    events = _t(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("viewed"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "clicked_after_view"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("purchased_after_click"),
    )


@query(
    "ev_rolling_7d",
    """
    WITH daily AS (
      SELECT CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
             count(*) AS n,
             sum(value::DECIMAL(30,6))::DOUBLE AS day_value
      FROM events GROUP BY 1)
    SELECT make_timestamp(d * 86400 * 1000000)::DATE AS day, n,
           CAST(sum(n) OVER (ORDER BY d RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_7d,
           day_value
    FROM daily ORDER BY day
    """,
    driver=False,  # demoted r6 (rotation; driver-green r5 and earlier)
)
def ev_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling event count — a RANGE window frame over epoch
    days (frame specs are absent from the reference, SURVEY.md section
    2.5; this is the rolling-KPI shape every dashboard grows into).

    RANGE (not ROWS) so missing days still widen the frame correctly.
    Daily pre-aggregation first: the window runs over ~days rows, not raw
    events — at 100 TB the rolling pass is over a tiny frame.
    """
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        (F.unix_timestamp(F.date_trunc("day", "ts")) / 86400)
        .cast("bigint")
        .alias("d")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("day_value"),
    )
    w = Window.orderBy("d").rangeBetween(-6, 0)
    return (
        daily.withColumn("n_7d", F.sum("n").over(w))
        .select(
            F.timestamp_seconds(F.col("d") * 86400).cast("date").alias("day"),
            "n",
            "n_7d",
            "day_value",
        )
        .orderBy("day")
    )


@query(
    "ev_cumulative_uniques",
    """
    WITH fs AS (
      SELECT user_id, min(date_trunc('day', ts))::DATE AS first_day
      FROM events GROUP BY 1),
    daily AS (
      SELECT first_day AS day, count(*) AS new_users FROM fs GROUP BY 1)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM daily ORDER BY day
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def ev_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new + cumulative distinct users via the FIRST-SEEN
    reformulation: cumulative COUNT(DISTINCT) as a window is either a
    quadratic self-join or a giant dedup-state window at 100 TB — but
    'users whose first day is <= d' is the same number, and needs only
    min() per user (one shuffle), a day-level count (tiny), and a
    running sum over days. The classic new-vs-returning warehouse
    pattern; exact, no sketch needed."""
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    fs = events.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("first_day")
    )
    daily = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn(
            "cum_users", F.sum("new_users").over(w).cast("bigint")
        )
        .orderBy("day")
    )


@query(
    "ev_cohort_retention",
    """
    WITH uw AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week
      FROM events),
    c AS (
      SELECT user_id, week,
             min(week) OVER (PARTITION BY user_id) AS cohort_week
      FROM uw)
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, week) / 7 AS BIGINT)
             AS week_offset,
           count(*) AS n_active
    FROM c GROUP BY 1, 2 ORDER BY cohort_week, week_offset
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
)
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle — users grouped by first-active
    week, counted in each later week they return (the dashboard-standard
    retention matrix; the reference has no cohort analytics at all).

    Shape: dedup to (user, week) FIRST (one shuffle; the frame shrinks
    to at most users x weeks), derive each user's cohort as a window
    min over that small frame (second, narrower shuffle), then a
    (cohort, offset) count. No join back to raw events, no per-cohort
    scans; week arithmetic stays in integer days/7 (both engines'
    date_trunc('week') is Monday-based, so offsets are exact
    multiples)."""
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    uw = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    c = uw.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    return (
        c.groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "w5_rank_functions",
    """
    WITH counts AS (
      SELECT n_name AS nation, count(*) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1)
    SELECT nation, n,
           CAST(rank()       OVER (ORDER BY n DESC, nation) AS INTEGER) AS rnk,
           CAST(dense_rank() OVER (ORDER BY n DESC, nation) AS INTEGER) AS drnk,
           CAST(ntile(4)     OVER (ORDER BY n DESC, nation) AS INTEGER) AS quartile
    FROM counts ORDER BY rnk
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def w5_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over grouped counts (SURVEY.md section 2.5
    notes these are absent from the reference — its 'ranking' is a bare
    ORDER BY). Total order in the window spec keeps all three functions
    engine-deterministic."""
    from pyspark.sql.window import Window

    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    counts = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("nation"))
    return counts.select(
        "nation",
        "n",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    ).orderBy("rnk")


@query(
    "ev_props_extract",
    """
    WITH px AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             json_extract_string(props, '$.missing') AS missing
      FROM events)
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS k_sum,
           min(k) AS k_min,
           max(k) AS k_max,
           count(missing) AS missing_present
    FROM px
    GROUP BY 1 ORDER BY event_type
    """,
    # Demoted r5 (rotation: family already multiply driver-green; stays
    # pinned by the local oracle sweep).
    driver=False,
)
def ev_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via ONE schematized parse: from_json
    projects the JSON ``props`` bag into a typed struct — the JSON text
    is parsed once per row regardless of how many fields downstream
    expressions touch (vs one get_json_object walk per field), and the
    explicit schema prunes unreferenced fields at parse time. The plan
    shows a single JsonToStructs (pinned in tests/test_plan_quality.py).

    Two fields come out of the one parse: the typed ``k`` measure
    (aggregated) and a deliberately-absent ``missing`` field —
    schema-declared fields missing from the document are NULL, and the
    oracle pins that contract (missing_present = 0) alongside the k
    aggregates.
    """
    events = _t(spark, sf_dir, "events")
    p = F.from_json("props", "k BIGINT, missing STRING").alias("p")
    px = events.select("event_type", p).select(
        "event_type", F.col("p.k").alias("k"), F.col("p.missing").alias("missing")
    )
    return (
        px.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count("missing").alias("missing_present"),
        )
        .orderBy("event_type")
    )


@query(
    "ev_value_histogram",
    """
    WITH s AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
    b AS (SELECT CASE WHEN vmax = vmin THEN 0
                 ELSE least(floor((value - vmin) * 20 / (vmax - vmin)), 19)
                 END::INTEGER AS bucket, vmin, vmax
          FROM events, s)
    SELECT bucket, count(*) AS n,
           round(min(vmin) + bucket * ((min(vmax) - min(vmin)) / 20), 6)
             AS bucket_lo
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    # Demoted r4 to fund st_foreach_batch_sink under the 50-row driver
    # cap: the distribution-summary family keeps a13_percentile_sketch
    # driver-green (and this entry went driver-green r3); locally
    # oracle-pinned.
    driver=False,
)
def ev_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of a continuous measure — the dashboard
    distribution-panel shape. Two-pass: a 1-row min/max aggregate
    broadcast back over the fact (no driver round-trip, stays one lazy
    plan), then floor-bucketing and a 20-group count. Bucket arithmetic
    is written with identical operation ORDER in both engines — IEEE
    double ops are deterministic, so the bucket ids agree exactly; the
    max value is clamped into the last bucket with least(). Degenerate
    range guard (round-2 review): a single-valued or empty measure makes
    (vmax - vmin) zero and 0/0 diverges across engines (Spark non-ANSI
    NULL vs DuckDB NaN) — both plan and oracle put all rows in bucket 0
    explicitly when vmax = vmin."""
    events = _t(spark, sf_dir, "events")
    stats = events.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    b = events.crossJoin(F.broadcast(stats)).select(
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * 20
                    / (F.col("vmax") - F.col("vmin"))
                ),
                F.lit(19),
            )
        )
        .cast("int")
        .alias("bucket"),
        "vmin",
        "vmax",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.min("vmin")
                + F.col("bucket") * ((F.min("vmax") - F.min("vmin")) / 20),
                6,
            ).alias("bucket_lo"),
        )
        .orderBy("bucket")
    )


@query(
    "a5_unique_customers_approx",
    """
    SELECT o_orderstatus AS status,
           count(DISTINCT o_custkey) AS exact_customers,
           TRUE AS approx_in_bound
    FROM orders GROUP BY 1 ORDER BY status
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def a5_unique_customers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) at 100 TB: approx_count_distinct (HyperLogLog++,
    2% rsd) per segment next to the exact count. The scale point: the
    exact distinct needs a per-(segment,custkey) shuffle; the sketch
    merges fixed-size registers map-side.

    Checkable contract: the raw sketch estimate is
    implementation-specific, so the registry projection emits the exact
    count plus ``approx_in_bound`` = |approx - exact| <= 3*rsd*exact. The
    oracle pins the exact half and asserts the bound holds (TRUE) — HLL++
    is deterministic for a given input set, so the boolean is stable, and
    a sketch regression now FAILS the gate instead of hiding behind a
    rows-only entry. tests/test_beyond_ops.py asserts the numeric bound
    locally as well.
    """
    orders = _t(spark, sf_dir, "orders")
    rsd = 0.02
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.approx_count_distinct("o_custkey", rsd).alias("approx_customers"),
            F.countDistinct("o_custkey").alias("exact_customers"),
        )
        .select(
            "status",
            "exact_customers",
            (
                F.abs(F.col("approx_customers") - F.col("exact_customers"))
                <= 3 * rsd * F.col("exact_customers")
            ).alias("approx_in_bound"),
        )
        .orderBy("status")
    )


@query(
    "a16_rfm_segmentation",
    """
    WITH agg AS (
      SELECT o_custkey AS custkey,
             datediff('day', max(o_orderdate),
                      (SELECT max(o_orderdate) FROM orders)) AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY 1),
    scored AS (
      SELECT *,
             ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency ASC, custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary ASC, custkey) AS m_score
      FROM agg)
    SELECT custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                WHEN r_score >= 4 THEN 'recent'
                WHEN f_score >= 4 THEN 'loyal_lapsing'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored ORDER BY custkey
    """,
    driver=False,  # rotated OUT r8 (driver-green; plans/rotation.py)
)
def a16_rfm_segmentation(
    spark: SparkSession, sf_dir: str, *, scale_safe: bool = False
) -> DataFrame:
    """RFM customer segmentation — the classic financial-warehouse
    marketing analysis (recency / frequency / monetary quintiles +
    rule-based segment labels) that the reference's KPI dashboard
    family implies but never builds. One shuffle aggregates per
    customer; the quintile windows run over the customer-level frame
    (|customers|, not |orders|) with custkey tie-breaks so every ntile
    bucket is a deterministic total order — identical in DuckDB, which
    is what lets the oracle pin bucket membership exactly.

    ``scale_safe=True`` replaces each global ntile window with
    two_phase_rank + ntile_from_rank (operators.surrogate): three
    parallel range-shuffles instead of three single-partition sorts,
    bit-identical bucket numbers (Spark's exact ntile padding rule in
    integer arithmetic; equivalence-tested)."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("_maxd"))
    agg = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .withColumn("recency_days", F.datediff("_maxd", "_last"))
        .drop("_last", "_maxd")
    )
    from ..operators.surrogate import resolve_scale_safe

    if resolve_scale_safe(agg, scale_safe):
        from ..operators.surrogate import ntile_from_rank, two_phase_rank

        scored = agg
        for score, order in (
            ("r_score", [F.desc("recency_days"), F.asc("custkey")]),
            ("f_score", [F.asc("frequency"), F.asc("custkey")]),
            ("m_score", [F.asc("monetary"), F.asc("custkey")]),
        ):
            scored, n = two_phase_rank(scored, order, "_rk")
            scored = scored.withColumn(
                score, ntile_from_rank(F.col("_rk"), n, 5)
            ).drop("_rk")
    else:
        scored = (
            agg.withColumn(
                "r_score",
                F.ntile(5).over(
                    Window.orderBy(F.desc("recency_days"), F.asc("custkey"))
                ),
            )
            .withColumn(
                "f_score",
                F.ntile(5).over(
                    Window.orderBy(F.asc("frequency"), F.asc("custkey"))
                ),
            )
            .withColumn(
                "m_score",
                F.ntile(5).over(
                    Window.orderBy(F.asc("monetary"), F.asc("custkey"))
                ),
            )
        )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion"
        )
        .when(F.col("r_score") >= 4, "recent")
        .when(F.col("f_score") >= 4, "loyal_lapsing")
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating"
        )
        .otherwise("regular")
    )
    return (
        scored.withColumn("segment", seg)
        .select(
            "custkey", "recency_days", "frequency", "monetary",
            "r_score", "f_score", "m_score", "segment",
        )
        .orderBy("custkey")
    )


@query(
    "a17_pareto_customers",
    """
    WITH rev AS (
      SELECT o_custkey AS custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1),
    c AS (
      SELECT custkey, revenue,
             round(sum(revenue) OVER (ORDER BY revenue DESC, custkey)
                   / sum(revenue) OVER (), 6) AS cum_share
      FROM rev)
    SELECT custkey, revenue, cum_share,
           CASE WHEN cum_share <= 0.5 THEN 'A'
                WHEN cum_share <= 0.8 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c ORDER BY cum_share, custkey
    """,
    driver=False,  # rotated OUT r8 (driver-green; plans/rotation.py)
)
def a17_pareto_customers(
    spark: SparkSession, sf_dir: str, *, scale_safe: bool = False
) -> DataFrame:
    """Pareto / ABC revenue concentration — rank customers by revenue,
    running revenue share, A/B/C class at the 50%/80% cut points (the
    'which customers are 80% of the business' dashboard staple).

    The cumulative window runs over the CUSTOMER-level aggregate —
    |customers| rows, not |orders| — bounded by default;
    ``scale_safe=True`` swaps it for operators.surrogate.
    two_phase_cumsum over the EXACT decimal cents (per-partition window
    cumsum + driver prefix-sum of numPartitions partial sums, no
    single-partition funnel; exact decimals make the reordered
    reduction order-independent, and the grand total comes free as the
    share denominator). Deterministic total order via the custkey
    tie-break; share rounded before classification so the class
    boundaries are engine-stable."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("revenue")
    )
    from ..operators.surrogate import resolve_scale_safe

    if resolve_scale_safe(rev, scale_safe):
        from ..operators.surrogate import two_phase_cumsum

        # revenue doubles are exact cents (decimal(30,2) sums < 2^53),
        # so the decimal round-trip loses nothing.
        rd = rev.withColumn("_rd", F.col("revenue").cast("decimal(30,2)"))
        cum, total = two_phase_cumsum(
            rd, [F.desc("revenue"), F.asc("custkey")], "_rd", "_cum"
        )
        c = cum.withColumn(
            "cum_share",
            F.round(
                F.col("_cum").cast("double") / F.lit(float(total)), 6
            ),
        ).drop("_rd", "_cum")
    else:
        w_cum = Window.orderBy(
            F.desc("revenue"), F.asc("custkey")
        ).rowsBetween(Window.unboundedPreceding, 0)
        w_all = Window.partitionBy()
        c = rev.withColumn(
            "cum_share",
            F.round(
                F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_all), 6
            ),
        )
    cls = (
        F.when(F.col("cum_share") <= 0.5, "A")
        .when(F.col("cum_share") <= 0.8, "B")
        .otherwise("C")
    )
    return (
        c.withColumn("abc_class", cls)
        .select("custkey", "revenue", "cum_share", "abc_class")
        .orderBy("cum_share", "custkey")
    )


@query(
    "ev_top_paths",
    """
    WITH s AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events),
    t AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM s WHERE e3 IS NOT NULL)
    SELECT path, count(*) AS n
    FROM t GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
    # New r6 (locally pinned; future rotation candidate).
    driver=False,
)
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event PATHS — sequence mining over per-user journeys: the ten
    most frequent 3-step event-type sequences (per-user ordering with
    the ev_transition_matrix (ts, event_id) tie-break, overlapping
    trigrams via two leads). The n-th-order sibling of the first-order
    transition matrix: where a21's Markov view answers 'what follows
    X', this answers 'which whole journeys dominate' — the path-analysis
    panel of product analytics.

    Physical: one window shuffle on user_id (two leads share the frame),
    map-side concat, one count shuffle, TakeOrderedAndProject top-10
    with a path tie-break. Trigram fan-out is exactly one row per event
    (overlapping windows of a sequence, not a self-join) — linear at
    any corpus size. Reference analogue: none."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.select(
        "event_type",
        F.lead("event_type").over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


@query(
    "ev_transition_matrix",
    """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    t AS (SELECT event_type AS src, nxt AS dst, count(*) AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY src), 6) AS p
    FROM t ORDER BY src, dst
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov estimate of user
    journeys): per user, each event's successor by time (event_id
    tie-break), counted into (src, dst) cells with row-normalized
    probabilities — the click-path analysis behind funnel design.
    Shape: one shuffle on user_id for the lead window, then a tiny
    (|event_types|^2) aggregate; the probability window runs over that
    tiny frame. Fully order-pinned by the oracle."""
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.withColumn("nxt", F.lead("event_type").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    t = s.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count("*").alias("n"))
    wp = Window.partitionBy("src")
    return (
        t.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(wp), 6)
        )
        .orderBy("src", "dst")
    )


@query(
    "a15_hll_mergeable",
    """
    SELECT CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
           count(DISTINCT o_custkey) AS exact_customers,
           TRUE AS approx_in_bound
    FROM orders GROUP BY 1
    UNION ALL
    SELECT 0, count(DISTINCT o_custkey), TRUE FROM orders
    ORDER BY quarter
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def a15_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketch architecture — the reason sketches matter at
    100 TB: per-quarter Apache DataSketches HLL sketches
    (``hll_sketch_agg``) can be PERSISTED as a summary table and later
    union-merged (``hll_union_agg``) to answer cross-partition distinct
    counts WITHOUT rescanning raw data — distinct users over any quarter
    range from kilobyte sketches. (approx_count_distinct in a5 proves
    the estimator; this entry proves the two-level merge: sketch, then
    union of sketches, estimates the TRUE union cardinality — counts
    are not summable across quarters because customers repeat, which is
    exactly what the sketch union handles.)

    Checkable contract (a5's envelope pattern): per-quarter rows carry
    the exact distinct plus ``approx_in_bound`` (|est-exact| <= 5%
    exact; default lgK=12 sketches have ~1.6% rsd), and the quarter=0
    row checks the MERGED total the same way. The oracle pins every
    exact count and asserts all booleans TRUE."""
    orders = _t(spark, sf_dir, "orders")
    tol = 0.05
    per_q = orders.groupBy(
        F.quarter("o_orderdate").cast("int").alias("quarter")
    ).agg(
        F.hll_sketch_agg(F.col("o_custkey")).alias("sk"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    q_rows = per_q.select(
        "quarter",
        "exact_customers",
        (
            F.abs(
                F.hll_sketch_estimate("sk") - F.col("exact_customers")
            )
            <= tol * F.col("exact_customers")
        ).alias("approx_in_bound"),
    )
    merged = per_q.agg(F.hll_union_agg("sk").alias("sk_all"))
    exact_all = orders.agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    total_row = (
        merged.join(F.broadcast(exact_all))
        .select(
            F.lit(0).cast("int").alias("quarter"),
            "exact_customers",
            (
                F.abs(
                    F.hll_sketch_estimate("sk_all")
                    - F.col("exact_customers")
                )
                <= tol * F.col("exact_customers")
            ).alias("approx_in_bound"),
        )
    )
    return q_rows.unionByName(total_row).orderBy("quarter")


@query(
    "wh_incremental_rollup",
    """
    SELECT CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
           o_orderstatus AS status,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY 1, 2 ORDER BY quarter, status
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
)
def wh_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL summary-table maintenance — the other half of the
    warehouse-maintenance story (wh_gold_maintenance maintains the
    DETAIL table; this maintains an AGGREGATE over it without full
    recomputation, the materialized-view-refresh pattern):

    1. the historical load builds a (quarter, status) rollup from
       quarters 1-3 MINUS a held-back 'late data' slice, partitioned by
       quarter;
    2. a new-quarter batch (Q4) and a late-arriving batch (the held-back
       Q2 slice) then land INCREMENTALLY: each batch is partially
       aggregated, merged with ONLY the touched quarters' existing
       rollup rows by re-summing (count/sum are mergeable partial
       aggregates — the algebraic property incremental view maintenance
       rests on), and written back via dynamic partition overwrite;
       Q1/Q3 partitions are never read or rewritten.

    The returned frame is the maintained table, and the oracle is a
    FULL recompute over raw orders — equal only if the incremental
    merges double-count nothing and miss nothing. Same eager
    maintenance-JOB posture as wh_gold_maintenance (documented)."""
    from ..sources.warehouse import write_partitioned

    table = "wh_rollup_inc"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("q"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    late_cond = (F.col("q") == 2) & (F.col("o_orderkey") % 101 == 0)

    def partial(df):
        return df.groupBy("q", "status").agg(
            F.count("*").alias("n"),
            F.sum("price").cast("decimal(30,2)").alias("total"),
        )

    hist = orders.filter((F.col("q") <= 3) & ~late_cond)
    write_partitioned(partial(hist).repartition("q"), table, ["q"])

    for batch in (
        orders.filter(F.col("q") == 4),       # new partition arrives
        orders.filter(late_cond),             # late rows for existing Q2
    ):
        delta = partial(batch)
        touched = [r["q"] for r in delta.select("q").distinct().collect()]
        merged = (
            spark.table(table)
            .filter(F.col("q").isin(touched))
            .unionByName(delta)
            .groupBy("q", "status")
            .agg(
                F.sum("n").alias("n"),
                F.sum("total").cast("decimal(30,2)").alias("total"),
            )
            .localCheckpoint(eager=True)  # reads the table it overwrites
        )
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            cols = spark.table(table).columns
            merged.select(*cols).write.mode("overwrite").insertInto(table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        spark.table(table)
        .select(
            F.col("q").cast("int").alias("quarter"),
            "status",
            "n",
            F.col("total").cast("double").alias("total_price"),
        )
        .orderBy("quarter", "status")
    )


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
    driver=False,  # demoted r7 (rotation; multiply driver-green)
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
    driver=False,  # demoted r6 (rotation; driver-green r5 and earlier)
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
    driver=False,
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
    "ev_asof_view_purchase",
    """
    WITH v AS (
      SELECT user_id, ts, max(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), p AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS r_ts,
           round(v.view_value, 6) AS r_view_value,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY event_id
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def ev_asof_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase to the user's latest prior-or-equal view
    (operators.temporal.asof_join_backward — union + carry-forward window;
    DuckDB's native ASOF JOIN is the oracle, so the composed operator's
    inclusive-<= tie semantics are pinned against a reference
    implementation)."""
    from ..operators.temporal import asof_join_backward

    events = _t(spark, sf_dir, "events")
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("view_value"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join_backward(purchases, views, by="user_id", ts_col="ts")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "r_ts",
        "r_view_value",
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("gap_us"),
    ).orderBy("event_id")


@query(
    "ev_asof_nearest_error",
    """
    WITH e2 AS (
      SELECT user_id, ts, max(value) AS err_value
      FROM events WHERE event_type = 'error' GROUP BY 1, 2
    ), p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT p.event_id, p.user_id, p.ts, e2.ts AS b_ts
      FROM p ASOF LEFT JOIN e2 ON p.user_id = e2.user_id AND p.ts >= e2.ts
    ), f AS (
      SELECT p.event_id, e2.ts AS f_ts
      FROM p ASOF LEFT JOIN e2 ON p.user_id = e2.user_id AND p.ts <= e2.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN f_ts IS NULL THEN b_ts
                WHEN b_ts IS NULL THEN f_ts
                WHEN epoch_us(b.ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(b.ts) THEN b_ts
                ELSE f_ts END AS r_ts,
           CASE WHEN f_ts IS NULL THEN epoch_us(b.ts) - epoch_us(b_ts)
                WHEN b_ts IS NULL THEN epoch_us(b.ts) - epoch_us(f_ts)
                WHEN epoch_us(b.ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(b.ts)
                  THEN epoch_us(b.ts) - epoch_us(b_ts)
                ELSE epoch_us(b.ts) - epoch_us(f_ts) END AS signed_gap_us
    FROM b JOIN f USING (event_id)
    ORDER BY event_id
    """,
    driver=False,  # folded for the driver's capped sweep; locally oracle-pinned
)
def ev_asof_nearest_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: each purchase to the user's closest
    error event in either time direction (ties -> the earlier/backward
    match) — the sensor-alignment semantics pandas merge_asof calls
    direction='nearest' and DuckDB has no primitive for. The oracle
    composes DuckDB's two directional ASOF joins with the same
    tie-breaking CASE, so the composed operator is pinned against a
    reference implementation of each direction."""
    from ..operators.temporal import asof_join

    events = _t(spark, sf_dir, "events")
    errors = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
        .select("user_id", "ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases, errors, by="user_id", ts_col="ts", direction="nearest"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "r_ts",
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("signed_gap_us"),
    ).orderBy("event_id")


@query(
    "ev_asof_purchase",
    """
    WITH v AS (
      SELECT user_id, ts, max(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), e2 AS (
      SELECT user_id, ts FROM events WHERE event_type = 'error'
      GROUP BY 1, 2
    ), p AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ), bv AS (
      SELECT p.event_id, p.user_id, p.ts,
             v.ts AS view_ts,
             round(v.view_value, 6) AS view_value,
             epoch_us(p.ts) - epoch_us(v.ts) AS view_gap_us
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ), b AS (
      SELECT p.event_id, p.ts, e2.ts AS b_ts
      FROM p ASOF LEFT JOIN e2 ON p.user_id = e2.user_id AND p.ts >= e2.ts
    ), f AS (
      SELECT p.event_id, e2.ts AS f_ts
      FROM p ASOF LEFT JOIN e2 ON p.user_id = e2.user_id AND p.ts <= e2.ts
    ), ne AS (
      SELECT b.event_id,
             CASE WHEN f_ts IS NULL THEN b_ts
                  WHEN b_ts IS NULL THEN f_ts
                  WHEN epoch_us(b.ts) - epoch_us(b_ts)
                       <= epoch_us(f_ts) - epoch_us(b.ts) THEN b_ts
                  ELSE f_ts END AS err_ts,
             CASE WHEN f_ts IS NULL THEN epoch_us(b.ts) - epoch_us(b_ts)
                  WHEN b_ts IS NULL THEN epoch_us(b.ts) - epoch_us(f_ts)
                  WHEN epoch_us(b.ts) - epoch_us(b_ts)
                       <= epoch_us(f_ts) - epoch_us(b.ts)
                    THEN epoch_us(b.ts) - epoch_us(b_ts)
                  ELSE epoch_us(b.ts) - epoch_us(f_ts) END AS err_signed_gap_us
      FROM b JOIN f USING (event_id)
    )
    SELECT bv.event_id, bv.user_id, bv.ts, view_ts, view_value, view_gap_us,
           err_ts, err_signed_gap_us
    FROM bv JOIN ne USING (event_id)
    ORDER BY event_id
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def ev_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH as-of directions on one driver row: each purchase gets (a) the
    user's latest prior-or-equal view (backward as-of — the demoted
    ev_asof_view_purchase operator) and (b) the user's closest error
    event in either time direction, ties to backward (nearest as-of —
    the demoted ev_asof_nearest_error operator). Two invocations of
    operators.temporal.asof_join (union + carry-forward window; one
    shuffle each), merged on event_id. The oracle composes DuckDB's
    native directional ASOF joins with the same tie-break CASE, so both
    direction semantics stay pinned against a reference implementation.
    """
    from ..operators.temporal import asof_join

    events = _t(spark, sf_dir, "events")
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("view_value"))
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select("user_id", "ts")
        .distinct()
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    back = asof_join(purchases, views, by="user_id", ts_col="ts").select(
        "event_id",
        "user_id",
        "ts",
        F.col("r_ts").alias("view_ts"),
        F.col("r_view_value").alias("view_value"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("view_gap_us"),
    )
    near = asof_join(
        purchases, errors, by="user_id", ts_col="ts", direction="nearest"
    ).select(
        "event_id",
        F.col("r_ts").alias("err_ts"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("err_signed_gap_us"),
    )
    return back.join(near, "event_id").orderBy("event_id")


@query(
    "ev_range_views_before_purchase",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           count(v.ts) AS n_views_1h,
           round(max(v.value), 6) AS max_view_value
    FROM p LEFT JOIN v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts < p.ts
    GROUP BY 1, 2
    ORDER BY event_id
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def ev_range_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: views in the hour before each purchase,
    via the bucketed equi-join decomposition
    (operators.temporal.range_join_trailing) instead of a per-key nested
    loop; aggregated per purchase. Purchases with no prior views survive
    with count 0 (left semantics restored by the final left join)."""
    from ..operators.temporal import range_join_trailing

    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    matched = (
        range_join_trailing(purchases, views, by="user_id", window_seconds=3600)
        .groupBy("event_id", "user_id")
        .agg(
            F.count("*").alias("n_views_1h"),
            F.round(F.max("r_value"), 6).alias("max_view_value"),
        )
    )
    return (
        purchases.join(matched, ["event_id", "user_id"], "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_views_1h", F.lit(0)).alias("n_views_1h"),
            "max_view_value",
        )
        .orderBy("event_id")
    )


@query(
    "wh_gold_maintenance",
    """
    WITH gold AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             CAST(quarter(o_orderdate) AS INTEGER) AS q
      FROM orders),
    upd AS (
      SELECT o_orderkey, 'F' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(30,2)) + 500 AS DOUBLE)
               AS o_totalprice,
             3 AS q
      FROM gold WHERE q = 2 AND o_orderkey % 97 = 0),
    final AS (
      SELECT * FROM gold
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      UNION ALL SELECT * FROM upd)
    SELECT CAST(q AS INTEGER) AS quarter, o_orderstatus AS status,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS total_price
    FROM final GROUP BY 1, 2 ORDER BY quarter, status
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def wh_gold_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORAGE layer under the driver's correctness gate: build a
    quarter-partitioned gold table (sources.warehouse.write_partitioned),
    apply a partition-scoped SCD-1 MERGE (upsert_partition_overwrite —
    dynamic partition overwrite; the update batch corrects ~1% of Q2
    orders, finalizes their status, adds a 500.00 price adjustment, and
    MOVES them to Q3, so both the source and destination partitions
    rewrite while Q1/Q4 files stay untouched), then re-aggregate the
    maintained table. The oracle recomputes the post-merge state from
    the raw inputs in DuckDB, so the returned aggregate is only right if
    the merge replaced exactly the right rows in exactly the right
    partitions — lineage-level verification of the dynamic-overwrite
    path (round-2 ask). File-level invariants (untouched partitions
    byte-identical, moved keys leave no stale duplicate) are pinned in
    tests/test_warehouse.py.

    NOTE: deliberately NOT a lazy plan — this entry is a maintenance JOB
    (its side effect on the table is the semantics); the returned frame
    is the post-maintenance audit aggregate.
    """
    from ..sources.warehouse import upsert_partition_overwrite, write_partitioned

    orders = _t(spark, sf_dir, "orders")
    gold = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.quarter("o_orderdate").alias("q"),
    )
    table = "wh_gold_maint"
    write_partitioned(gold, table, ["q"])
    updates = gold.filter(
        (F.col("q") == 2) & (F.col("o_orderkey") % 97 == 0)
    ).select(
        "o_orderkey",
        F.lit("F").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(30,2)") + 500)
        .cast("double")
        .alias("o_totalprice"),
        F.lit(3).alias("q"),
    )
    upsert_partition_overwrite(
        spark, table, updates, key="o_orderkey", partition_col="q"
    )
    return (
        spark.table(table)
        .groupBy(
            F.col("q").cast("int").alias("quarter"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("quarter", "status")
    )


@query(
    "wh_time_travel",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             o_totalprice AS price
      FROM orders),
    v1 AS (
      SELECT k,
             CASE WHEN k % 43 = 0 THEN 'F' ELSE status END AS status,
             CASE WHEN k % 43 = 0
                  THEN CAST(CAST(price AS DECIMAL(30,2)) + 100 AS DOUBLE)
                  ELSE price END AS price
      FROM base),
    v2 AS (SELECT * FROM v1 WHERE k % 59 <> 0)
    SELECT 0 AS version, count(*) AS n_rows,
           CAST(sum(CAST(price AS DECIMAL(30,2))) AS DOUBLE) AS total_price
    FROM base
    UNION ALL
    SELECT 1, count(*),
           CAST(sum(CAST(price AS DECIMAL(30,2))) AS DOUBLE)
    FROM v1
    UNION ALL
    SELECT 2, count(*),
           CAST(sum(CAST(price AS DECIMAL(30,2))) AS DOUBLE)
    FROM v2
    ORDER BY version
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def wh_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel under the correctness gate: commit version 0 (the raw
    gold), version 1 (SCD-1 upsert: finalize + 100.00 adjustment on %43
    keys), version 2 (GDPR-style delete of %59 keys) via
    sources.warehouse.commit_snapshot (copy-on-write per version), then
    — AFTER the last commit — read ALL THREE versions back and audit
    (version, n_rows, total_price). The audit is only right if v0/v1
    stayed intact while later versions landed (isolation) AND each
    change set applied exactly (merge correctness); the oracle
    recomputes every version's state from the raw input.

    Like wh_gold_maintenance this is a maintenance JOB, not a lazy plan:
    the side effect (three immutable snapshot tables) is the semantics.
    Scale: each commit is one anti-join + write of the new version; the
    audit reads are ordinary pruned scans of immutable parquet."""
    from ..sources.warehouse import (
        commit_snapshot,
        read_snapshot,
        write_snapshot,
    )

    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    table = "wh_tt_gold"
    write_snapshot(base, table, 0)
    upserts = base.filter(F.col("k") % 43 == 0).select(
        "k",
        F.lit("F").alias("status"),
        (F.col("price").cast("decimal(30,2)") + 100)
        .cast("double")
        .alias("price"),
    )
    commit_snapshot(spark, table, 1, key="k", upserts=upserts)
    deletes = read_snapshot(spark, table, 1).filter(
        F.col("k") % 59 == 0
    ).select("k")
    commit_snapshot(spark, table, 2, key="k", delete_keys=deletes)

    def audit(v: int) -> DataFrame:
        return (
            read_snapshot(spark, table, v)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.col("price").cast("decimal(30,2)"))
                .cast("double")
                .alias("total_price"),
            )
            .select(F.lit(v).alias("version"), "n_rows", "total_price")
        )

    return (
        audit(0).unionByName(audit(1)).unionByName(audit(2))
        .orderBy("version")
    )


@query(
    "wh_vacuum_retention",
    """
    WITH base AS (SELECT o_orderkey AS k FROM orders),
    v1 AS (SELECT k FROM base WHERE k % 61 <> 0),
    v2 AS (SELECT k FROM v1 WHERE k % 67 <> 0),
    v3 AS (SELECT k FROM v2 WHERE k % 71 <> 0)
    SELECT 0 AS version, 0 AS retained, CAST(NULL AS BIGINT) AS n_rows
    UNION ALL SELECT 1, 0, CAST(NULL AS BIGINT)
    UNION ALL SELECT 2, 1, (SELECT count(*) FROM v2)
    UNION ALL SELECT 3, 1, (SELECT count(*) FROM v3)
    ORDER BY version
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def wh_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention VACUUM under the gate: build four snapshot versions
    (three chained GDPR-delete commits on %61/%67/%71 keys), vacuum with
    keep_last=2 (sources.warehouse.vacuum_snapshots), then audit —
    (version, retained, n_rows) where vacuumed versions report NULL rows
    (they are GONE, catalog and files) and retained ones report counts
    the oracle recomputes from the chained delete predicates. Proves
    both halves of the retention contract: the right versions were
    reclaimed AND the survivors still carry the exactly-merged state.

    The 4-row audit is driver-side by construction (a maintenance job's
    summary, not a data path); counts come from ordinary pruned scans of
    the surviving snapshots."""
    from ..sources.inline import inline_table
    from ..sources.warehouse import (
        commit_snapshot,
        drop_snapshots,
        list_snapshots,
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    table = "wh_vac_gold"
    # Stale versions from a prior run in the same session would survive
    # this run's vacuum and corrupt the audit — reset to empty first.
    drop_snapshots(spark, table)
    write_snapshot(base, table, 0)
    for v, mod in ((1, 61), (2, 67), (3, 71)):
        prev = read_snapshot(spark, table, v - 1)
        commit_snapshot(
            spark,
            table,
            v,
            key="k",
            delete_keys=prev.filter(F.col("k") % mod == 0).select("k"),
        )
    vacuum_snapshots(spark, table, keep_last=2)
    remaining = set(list_snapshots(spark, table))
    rows = []
    for v in range(4):
        if v in remaining:
            rows.append((v, 1, read_snapshot(spark, table, v).count()))
        else:
            rows.append((v, 0, None))
    return inline_table(
        spark, rows, ["version", "retained", "n_rows"]
    ).select(
        F.col("version").cast("int").alias("version"),
        F.col("retained").cast("int").alias("retained"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    ).orderBy("version")


@query(
    "wh_schema_evolution",
    """
    WITH g AS (
      SELECT o_orderkey AS k,
             CASE WHEN quarter(o_orderdate) >= 3 THEN 2 ELSE 1 END AS batch,
             CASE WHEN quarter(o_orderdate) >= 3 THEN o_orderpriority
                  END AS channel
      FROM orders)
    SELECT batch, count(*) AS n_rows,
           CAST(count(channel) AS BIGINT) AS n_channel,
           CAST(sum(CASE WHEN channel IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_channel
    FROM g GROUP BY 1 ORDER BY 1
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def wh_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on plain parquet: batch 1 (H1 orders) lands
    WITHOUT the ``channel`` column, batch 2 (H2) WITH it — the standard
    lakehouse situation where a column is added mid-history. The read
    side reconciles via ``mergeSchema``: old files surface the new
    column as NULL, new files carry values, and the audit counts both
    per batch. The oracle recomputes the expected fill pattern from the
    raw table, so the row only matches if merge-read semantics (column
    union + NULL backfill, partition-column discovery for ``batch``)
    hold exactly.

    Scale: mergeSchema's cost is footer-sampling at planning time; the
    scan itself stays pruned/pushed-down per file. On a real lakehouse
    this maps to Delta/Iceberg schema evolution with the schema tracked
    in the table log instead of sampled from footers."""
    import atexit
    import shutil
    import tempfile

    orders = _t(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="ftdw-schema-evo-")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    q = F.quarter("o_orderdate")
    orders.filter(q <= 2).select(
        F.col("o_orderkey").alias("k")
    ).write.mode("overwrite").parquet(f"{base}/batch=1")
    orders.filter(q >= 3).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("channel"),
    ).write.mode("overwrite").parquet(f"{base}/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return (
        merged.groupBy("batch")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("channel").cast("bigint").alias("n_channel"),
            F.sum(
                F.when(F.col("channel").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_null_channel"),
        )
        .orderBy("batch")
    )


def _cdc_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )


def _cdc_changelog(base: DataFrame) -> DataFrame:
    """The synthetic ordered CDC feed both wh_cdc_apply and the
    streaming st_cdc_apply fold (shared so the two can never drift):
    stacked updates on %31 keys, seq-3 tombstones on %37 keys, shifted
    inserts on %41 keys — mirrored verbatim in the shared oracle SQL."""
    k = F.col("k")
    return (
        base.filter(k % 31 == 0)
        .select(
            "k", F.lit(1).alias("seq"), F.lit("U").alias("op"),
            "status", (F.col("price") + 50).alias("price"),
        )
        .unionAll(
            base.filter(k % 31 == 0).select(
                "k", F.lit(2).alias("seq"), F.lit("U").alias("op"),
                F.lit("F").alias("status"),
                (F.col("price") + 100).alias("price"),
            )
        )
        .unionAll(
            base.filter(k % 37 == 0).select(
                "k", F.lit(3).alias("seq"), F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("status"),
                F.lit(None).cast("double").alias("price"),
            )
        )
        .unionAll(
            base.filter(k % 41 == 0).select(
                (k + 10000000).alias("k"),
                F.lit(1).alias("seq"), F.lit("I").alias("op"),
                F.lit("O").alias("status"),
                F.lit(1000.5).alias("price"),
            )
        )
    )


def _cdc_audit(applied: DataFrame) -> DataFrame:
    return (
        applied.groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("price").cast("decimal(30,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("status")
    )


_CDC_ORACLE = """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS price
      FROM orders),
    ch AS (
      SELECT k, 1 AS seq, 'U' AS op, status, price + 50 AS price
      FROM base WHERE k % 31 = 0
      UNION ALL
      SELECT k, 2, 'U', 'F', price + 100 FROM base WHERE k % 31 = 0
      UNION ALL
      SELECT k, 3, 'D', NULL, NULL FROM base WHERE k % 37 = 0
      UNION ALL
      SELECT k + 10000000, 1, 'I', 'O', CAST(1000.5 AS DOUBLE)
      FROM base WHERE k % 41 = 0),
    latest AS (
      SELECT * FROM ch
      QUALIFY row_number() OVER (PARTITION BY k
                                 ORDER BY seq DESC, op DESC) = 1),
    applied AS (
      SELECT b.k, b.status, b.price
      FROM base b LEFT JOIN latest l ON b.k = l.k WHERE l.k IS NULL
      UNION ALL
      SELECT k, status, price FROM latest WHERE op <> 'D')
    SELECT status, count(*) AS n,
           CAST(sum(CAST(price AS DECIMAL(30,2))) AS DOUBLE) AS total_price
    FROM applied GROUP BY 1 ORDER BY 1
    """


@query(
    "wh_cdc_apply",
    _CDC_ORACLE,
    # New r6 (locally pinned; future rotation candidate).
    driver=False,
)
def wh_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (operators.scd.apply_changelog): a
    Debezium-style ordered feed — two stacked updates on the %31 keys
    (last-wins ordering under test), tombstones on the %37 keys
    (including keys that ALSO have updates: the seq-3 delete must beat
    them), fresh inserts on shifted %41 keys — folded into the orders
    snapshot, then audited by a status-level aggregate. The oracle
    replays base/changelog/fold in SQL, so a resurrection, lost delete,
    or wrong-winner update shifts a count or a decimal sum and fails the
    hash.

    Scale: the changelog is the delta (one window shuffle on its key),
    the base passes through one anti-join; no global window, no
    iteration. Reference analogue: none (the reference rebuilds its CSV
    from scratch each refresh)."""
    from ..operators.scd import apply_changelog

    base = _cdc_base(spark, sf_dir)
    applied = apply_changelog(
        base, _cdc_changelog(base), key="k", tie_break="op"
    )
    return _cdc_audit(applied)


@query(
    "st_cdc_apply",
    _CDC_ORACLE,
    # New r6 (locally pinned; future rotation candidate).
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
)
def st_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING face of wh_cdc_apply — same base, same synthetic
    changelog (shared _cdc_changelog, so the twins cannot drift), but
    folded one REAL microbatch at a time (streaming.stream.
    run_cdc_apply_stream: seq<=1 then seq>1 as two files under
    maxFilesPerTrigger=1, foreachBatch applying the last-wins fold into
    versioned parquet state). Shares wh_cdc_apply's oracle verbatim:
    stream == batch is the checked contract, and a dropped / doubled /
    out-of-order microbatch shifts the audit aggregate and fails the
    hash. Eager maintenance-JOB posture (fresh source + checkpoint +
    state per invocation)."""
    from ..streaming.stream import run_cdc_apply_stream

    base = _cdc_base(spark, sf_dir)
    final = run_cdc_apply_stream(
        spark, base, _cdc_changelog(base), key="k", tie_break="op"
    )
    return _cdc_audit(final)


@query(
    "wh_zorder_skipping",
    """
    WITH o AS (SELECT o_custkey, o_totalprice FROM orders),
    s AS (SELECT min(o_custkey) AS alo, max(o_custkey) AS ahi,
                 min(o_totalprice) AS blo, max(o_totalprice) AS bhi
          FROM o),
    b AS (SELECT o_custkey, o_totalprice,
                 CAST(least(floor((o_custkey - alo) * 15 / (ahi - alo)),
                            15) AS BIGINT) AS ab,
                 CAST(least(floor((o_totalprice - blo) * 15 / (bhi - blo)),
                            15) AS BIGINT) AS bb
          FROM o CROSS JOIN s),
    f AS (SELECT o_custkey, o_totalprice,
                 ((ab >> 2) & 1) + 2 * ((bb >> 2) & 1)
                 + 4 * ((ab >> 3) & 1) + 8 * ((bb >> 3) & 1) AS zfile,
                 ab AS lfile
          FROM b),
    pz AS (SELECT zfile, min(o_custkey) AS cklo, max(o_custkey) AS ckhi,
                  min(o_totalprice) AS tplo, max(o_totalprice) AS tphi
           FROM f GROUP BY 1),
    pl AS (SELECT lfile, min(o_custkey) AS cklo, max(o_custkey) AS ckhi,
                  min(o_totalprice) AS tplo, max(o_totalprice) AS tphi
           FROM f GROUP BY 1),
    az AS (
      SELECT 'zorder' AS layout, count(*) AS n_files,
             CAST(sum(CASE WHEN tplo <= blo + CAST(0.1 AS DOUBLE)
                                         * (bhi - blo)
                            AND tphi >= blo THEN 1 ELSE 0 END)
                  AS BIGINT) AS files_scanned,
             round(CAST(sum(CAST(ckhi - cklo AS DECIMAL(30,0)))
                        AS DOUBLE) / count(*), 6) AS avg_span_custkey,
             round(CAST(sum(CAST(round(tphi - tplo, 6) AS DECIMAL(30,6)))
                        AS DOUBLE) / count(*), 6) AS avg_span_totalprice
      FROM pz CROSS JOIN s),
    al AS (
      SELECT 'linear' AS layout, count(*) AS n_files,
             CAST(sum(CASE WHEN tplo <= blo + CAST(0.1 AS DOUBLE)
                                         * (bhi - blo)
                            AND tphi >= blo THEN 1 ELSE 0 END)
                  AS BIGINT) AS files_scanned,
             round(CAST(sum(CAST(ckhi - cklo AS DECIMAL(30,0)))
                        AS DOUBLE) / count(*), 6) AS avg_span_custkey,
             round(CAST(sum(CAST(round(tphi - tplo, 6) AS DECIMAL(30,6)))
                        AS DOUBLE) / count(*), 6) AS avg_span_totalprice
      FROM pl CROSS JOIN s)
    SELECT * FROM az UNION ALL SELECT * FROM al ORDER BY layout
    """,
    # New r6 (driver-facing from birth — VERDICT r5 ask #5: put the
    # Z-order storage-layout claim under the hard signal).
    driver=False,  # rotated OUT r8 (driver-green; plans/rotation.py)
)
def wh_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order/file-skipping proof as a DRIVER query (r5 verdict ask
    #5): write orders under TWO physical layouts — Morton-interleaved
    (bits=4 over o_custkey x o_totalprice, file = top 4 Morton bits) and
    linear (file = o_custkey bucket) — then audit the ACTUAL parquet
    files and return, per layout: file count, how many files a
    10%-range o_totalprice predicate must scan under min/max-stat
    skipping, and the mean per-file span of each dim.

    Determinism that makes this oracle-able: file membership is an
    arithmetic function of the row (explicit bucket exprs +
    partitionBy(file) after repartition(file) — exactly one parquet
    file per bucket dir, no sampled range boundaries), so DuckDB
    replays the same bucket arithmetic and per-bucket min/max with no
    filesystem at all. The Spark side still measures the REAL files
    (input_file_name after read-back): if the physical layout ever
    drifted from the arithmetic claim (two files in a dir, rows in the
    wrong bucket), n_files or a span would diverge and the hash gate
    fails — the storage claim is what's under test. Expected shape:
    linear scans ~all files for the o_totalprice predicate (slabs of
    o_custkey), Z-order scans ~sqrt share with BOTH dims' spans
    contracted (the wh sibling of tests/test_warehouse.py's plan-level
    proof).

    Like wh_gold_maintenance this is a storage JOB, not a lazy plan.
    Reference analogue: none (the reference keeps one CSV)."""
    import atexit
    import shutil
    import tempfile

    from ..sources.warehouse import morton_code

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    st = orders.agg(
        F.min("o_custkey").alias("alo"),
        F.max("o_custkey").alias("ahi"),
        F.min("o_totalprice").alias("blo"),
        F.max("o_totalprice").alias("bhi"),
    ).collect()[0]
    alo, ahi, blo, bhi = st["alo"], st["ahi"], st["blo"], st["bhi"]
    mins = {"o_custkey": alo, "o_totalprice": blo}
    maxs = {"o_custkey": ahi, "o_totalprice": bhi}
    z = morton_code(["o_custkey", "o_totalprice"], mins, maxs, bits=4)
    zfile = F.shiftright(z, 4).cast("int")
    lfile = (
        F.least(
            F.floor(
                (F.col("o_custkey") - F.lit(alo)) * 15
                / F.lit((ahi - alo) or 1)
            ),
            F.lit(15).cast("long"),
        )
    ).cast("int")
    base = tempfile.mkdtemp(prefix="ftdw-zorder-skip-")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    for col, expr, sub in (("zfile", zfile, "z"), ("lfile", lfile, "l")):
        (
            orders.withColumn(col, expr)
            .repartition(col)
            .write.mode("overwrite")
            .partitionBy(col)
            .parquet(f"{base}/{sub}")
        )
    hi = blo + 0.1 * (bhi - blo)

    def audit(sub: str, col: str, layout: str) -> DataFrame:
        back = spark.read.parquet(f"{base}/{sub}")
        per = (
            back.withColumn("f", F.input_file_name())
            .groupBy(col)
            .agg(
                F.countDistinct("f").alias("nf"),
                F.min("o_custkey").alias("cklo"),
                F.max("o_custkey").alias("ckhi"),
                F.min("o_totalprice").alias("tplo"),
                F.max("o_totalprice").alias("tphi"),
            )
        )
        return per.agg(
            F.sum("nf").cast("bigint").alias("n_files"),
            F.sum(
                F.when(
                    (F.col("tplo") <= F.lit(hi))
                    & (F.col("tphi") >= F.lit(blo)),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("files_scanned"),
            F.round(
                F.sum((F.col("ckhi") - F.col("cklo")).cast("decimal(30,0)"))
                .cast("double")
                / F.count("*"),
                6,
            ).alias("avg_span_custkey"),
            F.round(
                F.sum(
                    F.round(F.col("tphi") - F.col("tplo"), 6).cast(
                        "decimal(30,6)"
                    )
                )
                .cast("double")
                / F.count("*"),
                6,
            ).alias("avg_span_totalprice"),
        ).select(
            F.lit(layout).alias("layout"),
            "n_files",
            "files_scanned",
            "avg_span_custkey",
            "avg_span_totalprice",
        )

    return (
        audit("z", "zfile", "zorder")
        .unionAll(audit("l", "lfile", "linear"))
        .orderBy("layout")
    )


@query(
    "st_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           sum(value::DECIMAL(30,6))::DOUBLE AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # Demoted r5 (rotation: family already multiply driver-green; stays
    # pinned by the local oracle sweep).
    driver=False,
)
def st_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.windows.tumbling executed as a real Structured Streaming
    job (file source -> watermark -> complete mode -> memory sink).

    Oracle: identical to batch twin ev_tumbling_hourly — the design rule
    (window expressions authored once, lifted to streaming unchanged)
    makes stream == batch an exact contract, so the streaming execution
    gets the same DuckDB oracle instead of a rows-only blind spot. The
    equality is also asserted directly in tests/test_beyond_ops.py. State-store count sized to check
    scale via num_state_partitions (streaming.stream._state_partitions)."""
    return ST.run_tumbling_stream(spark, sf_dir, num_state_partitions=8).orderBy(
        "window_start", "event_type"
    )


@query(
    "st_late_data",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           sum(value::DECIMAL(30,6))::DOUBLE AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    driver=True,  # rotated IN r7 (first driver row; plans/rotation.py)
)
def st_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics under the gate
    (streaming.stream.run_late_data_stream): the source replays a full
    day of events a month late; correct watermark handling DROPS every
    replay, so the append-mode hourly aggregate equals the clean batch
    aggregate — which is exactly what the oracle computes. A broken
    watermark (or none) would double the first day's counts and
    hash-mismatch. The companion metric assertion (the replay file was
    read-and-dropped, not skipped) lives in
    tests/test_beyond_ops.py::test_late_data_drop_metrics."""
    return ST.run_late_data_stream(spark, sf_dir).orderBy(
        "window_start", "event_type"
    )


@query(
    "st_dedup",
    """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events ORDER BY event_id
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def st_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup (dropDuplicatesWithinWatermark) against an
    input that really contains duplicates: the source replays the final
    hour of events in a second microbatch (streaming.stream.
    run_dedup_stream). The every-event-exactly-once oracle only holds if
    the dedup state actually drops the replay — a missing or expired
    dedup would fail on row count. State-store count sized to check
    scale via num_state_partitions (streaming.stream._state_partitions)."""
    return ST.run_dedup_stream(spark, sf_dir, num_state_partitions=8).orderBy(
        "event_id"
    )


@query(
    "st_sessionize_stateful",
    """
    WITH o AS (
      SELECT user_id, ts,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  < INTERVAL '30 minutes'
             THEN 0 ELSE 1 END AS brk
      FROM events WHERE user_id % 10 = 0),
    s AS (SELECT user_id, ts,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
    SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, first_ts
    """,
    driver=False,  # demoted r6 (rotation; driver-green r5 and earlier)
)
def st_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM stateful streaming operator (applyInPandasWithState +
    event-time timeout, streaming.stream.sessionize_stateful) run
    end-to-end: per-user O(1) state (three longs), sessions emitted when
    the watermark fires the timeout, sentinel-flushed tail. Same
    gaps-and-islands oracle as the built-in session_window twins — the
    hand-rolled state machine must agree with both the batch operator
    and DuckDB.

    Runs on a deterministic 10% key-domain sample (user_id % 10 == 0,
    mirrored in the oracle): the operator's cost is one Python call per
    key per microbatch, so the full key domain belongs on a cluster, not
    in the correctness loop — see run_session_stream_stateful's
    docstring for the measured overhead rate. The built-in session_window
    twin (st_sessionize) covers the full domain. num_state_partitions=16
    balances state-store maintenance against Python-worker parallelism
    (measured best at check scale)."""
    return ST.run_session_stream_stateful(
        spark, sf_dir, user_mod=10, num_state_partitions=16
    ).orderBy("user_id", "first_ts")


@query(
    "st_sessionize",
    """
    WITH o AS (
      SELECT user_id, ts, value,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  < INTERVAL '30 minutes'
             THEN 0 ELSE 1 END AS brk
      FROM events),
    s AS (SELECT user_id, ts, value,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
    SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
           count(*) AS n_events,
           sum(value::DECIMAL(30,6))::DOUBLE AS total_value
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, first_ts
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def st_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode streaming session windows (the hard case: a session is
    emitted only when the watermark proves it closed) — multi-batch file
    source, sentinel-driven watermark advance, availableNow; see
    streaming.stream.run_session_stream. Oracle: the same gaps-and-islands
    SQL as batch twin ev_sessionize, because append-mode flush emits
    exactly the batch session set once the watermark passes the tail. State-store count sized to check
    scale via num_state_partitions (streaming.stream._state_partitions)."""
    return ST.run_session_stream(spark, sf_dir, num_state_partitions=8).orderBy(
        "user_id", "first_ts"
    )


@query(
    "st_foreach_batch_sink",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1 ORDER BY event_type
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def st_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming egress through foreachBatch into a PARQUET sink (the
    production write path; the other streaming rows use test-only memory
    sinks): the sentinel multi-batch source streams events through 2+
    microbatches, each appended to parquet by a plain batch writer
    (streaming.stream.run_foreach_batch_sink), and the sink is read BACK
    and aggregated. The every-event-exactly-once oracle fails on row
    count if any microbatch is dropped or written twice — it checks the
    sink's contents, not the stream's in-memory state."""
    sink = ST.run_foreach_batch_sink(spark, sf_dir)
    return (
        sink.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "st_stream_merge_rollup",
    """
    SELECT date_trunc('day', ts)::DATE AS day, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
)
def st_stream_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming warehouse ingest — the Kappa capstone composing the
    streaming and maintenance tiers (streaming.stream.
    run_stream_merge_rollup): a multi-microbatch event stream merges
    each batch's partial (day, event_type) aggregate into a
    day-partitioned rollup table via mergeable re-summation + dynamic
    partition overwrite, the SAME incremental-refresh mechanics as
    wh_incremental_rollup. The from-scratch batch recompute oracle only
    matches if every microbatch merged exactly once — a dropped or
    doubled merge breaks counts AND decimal sums."""
    t = ST.run_stream_merge_rollup(spark, sf_dir)
    return (
        t.select(
            "day",
            "event_type",
            "n",
            F.col("total").cast("double").alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "st_stream_static_enrich",
    """
    SELECT c_mktsegment AS segment, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1 ORDER BY segment
    """,
    # Locally-pinned (driver surface capped at 50): the stateless
    # broadcast-enrichment half of the streaming join story; the
    # stateful half is st_stream_stream_join.
    driver=False,
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment executed as a real streaming
    job (streaming.stream.run_stream_static_enrich): events microbatches
    probe the static customer dim — no join state — into a complete-mode
    segment aggregate, oracled by the equivalent batch join."""
    return ST.run_stream_static_enrich(spark, sf_dir).orderBy("segment")


@query(
    "st_stream_stream_join",
    """
    SELECT p.event_id, p.user_id, p.ts AS p_ts, v.ts AS v_ts,
           v.value AS v_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts, value FROM events
          WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts < p.ts
    ORDER BY event_id, v_ts
    """,
    # Promoted r5 into the driver surface (rotation: first driver row).
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join run end-to-end as a real
    Structured Streaming job (streaming.stream.run_stream_stream_join):
    purchases x views of the same user within the trailing hour, matches
    found ACROSS microbatches out of join state, state eviction bounded
    by the range condition + watermarks. The batch interval-join oracle
    (same semantics as ev_range_views_before_purchase's inner form)
    fails if cross-batch state is dropped or leaks duplicate emits.

    num_state_partitions=8: state-store count sized to the check-scale
    key domain (the standard stateful-streaming capacity knob). Cost
    adjudicated under median-of-3 at sf0.1 (r6): 1.17x vs a single
    state partition (4.45s vs 3.81s) — the deliberate scale posture for
    a ~17% check-scale premium; the r4->r5 2x reading was this plus
    host noise (numbers pinned in BENCH_DETAIL_r06.json's
    median3_recheck block). A production deployment sizes it to
    throughput instead."""
    return ST.run_stream_stream_join(
        spark, sf_dir, num_state_partitions=8
    ).orderBy("event_id", "v_ts")


@query(
    "sk_salted_hot_join",
    """
    WITH probe AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS uid,
             value
      FROM events),
    build AS (SELECT c_custkey AS uid, c_mktsegment FROM customer)
    SELECT c_mktsegment AS segment, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM probe JOIN build USING (uid)
    GROUP BY 1 ORDER BY segment
    """,
    driver=False,  # demoted r7 (rotation; multiply driver-green)
)
def sk_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation salted join under the correctness gate: the probe
    side is made DELIBERATELY hot by collapsing every even user_id onto
    key 0 (half the events land on one key — the power-law hot key at
    100 TB), then joined to the customer dim via operators.skew.
    salted_join: build side replicated once per salt, probe salt derived
    deterministically from event_id, join on (uid, _salt) so the hot
    key's rows fan out over 8 shuffle partitions instead of one straggler
    task. The build side carries a shuffle_hash hint — broadcast would
    erase the shuffle the salting exists to fix (and at real scale the
    dim may not broadcast); tests/test_plan_quality.py asserts the
    salted-shuffle plan shape. Oracle: the equivalent PLAIN join — the
    salt must be semantics-free."""
    from ..operators.skew import salted_join

    events = _t(spark, sf_dir, "events")
    probe = events.select(
        F.when(F.col("user_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("uid"),
        "event_id",
        "value",
    )
    build = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("uid"), "c_mktsegment")
        .hint("shuffle_hash")
    )
    joined = salted_join(probe, build, key="uid", salt_source="event_id")
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# r5 batch: normalization dedup + duplicated-passage report
# ---------------------------------------------------------------------------

_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)


@query(
    "dd_normalized_dedup",
    f"""
    WITH uni AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             upper(replace(text, ' ', ', ')) || '!!' AS text
      FROM documents),
    h AS (SELECT doc_id,
                 CASE WHEN length({_SQL_NORM}) = 0
                      THEN {_P.sql_md5_long('text')}
                      ELSE {_P.sql_md5_long(_SQL_NORM)} END AS h
          FROM uni)
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM h GROUP BY h.h ORDER BY doc_id
    """,
    # New r5 batch (locally pinned; r6 driver-rotation candidate).
    driver=False,
)
def dd_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style normalization dedup (operators.dedup.
    normalized_dedup): exact dedup over the canonical text form (case
    folded, punctuation stripped, whitespace collapsed), so trivially
    mutated copies collapse where raw-hash dedup (dd_exact_dedup) sees
    distinct documents.

    The fixture corpus is ALREADY canonical (lowercase, single-spaced),
    so the query unions in a deterministically mutated copy of every doc
    (uppercased, comma-injected, bang-suffixed, id offset by 1e6 — same
    expression in the oracle); the operator must merge each mutant with
    its original, giving every surviving group n_copies = 2 with the
    original id as representative. A raw-hash dedup run on the same
    union leaves 2x the groups — the normalization is what's under
    test, not vacuously re-tested exact hashing.

    Scale shape identical to exact_dedup: the added normalization is a
    map-only JVM regexp chain; the single shuffle still carries a 60-bit
    hash per row. Reference analogue: none."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.upper(F.regexp_replace("text", " ", ", ")), F.lit("!!")
        ).alias("text"),
    )
    uni = docs.select("doc_id", "text").unionAll(mutated)
    return D.normalized_dedup(uni).orderBy("doc_id")


@query(
    "dd_incremental_dedup",
    """
    WITH ch AS (SELECT DISTINCT md5(text) AS h FROM documents
                WHERE doc_id < 400),
    batch AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 400
      UNION ALL    -- replayed corpus content: must be dropped by the index
      SELECT doc_id + 1000000, text FROM documents
      WHERE doc_id < 400 AND doc_id % 7 = 0
      UNION ALL    -- within-batch exact copies: must collapse
      SELECT doc_id + 2000000, text FROM documents
      WHERE doc_id >= 400 AND doc_id % 5 = 0),
    b AS (SELECT md5(text) AS h, min(doc_id) AS doc_id,
                 count(*) AS n_copies
          FROM batch GROUP BY 1)
    SELECT doc_id, n_copies FROM b
    WHERE h NOT IN (SELECT h FROM ch)
    ORDER BY doc_id
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def dd_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup (operators.dedup.incremental_dedup):
    doc_ids >= 400 play today's ingest batch, everything before them the
    already-deduped corpus, represented ONLY by its content-hash index
    (operators.dedup.hash_index). The fixture corpus has no exact
    duplicates (its planted dupes are NEAR-dups), so the batch unions in
    two deterministic exact-replay sets — corpus docs re-ingested under
    new ids (%7, must be dropped by the index anti-join) and
    within-batch copies (%5, must collapse to n_copies=2 under the
    original id) — making both code paths observable at every SF; the
    oracle replays the same construction.

    This is the operational shape of dedup at 100 TB: the history is
    petabytes but its index is ~16 bytes/doc, and the daily batch joins
    against the index, not the corpus."""
    docs = _t(spark, sf_dir, "documents")
    corpus_idx = D.hash_index(docs.filter(F.col("doc_id") < 400))
    fresh = docs.filter(F.col("doc_id") >= 400).select("doc_id", "text")
    replayed = (
        docs.filter((F.col("doc_id") < 400) & (F.col("doc_id") % 7 == 0))
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    copies = (
        docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") % 5 == 0))
        .select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
    )
    batch = fresh.unionAll(replayed).unionAll(copies)
    return D.incremental_dedup(batch, corpus_idx).orderBy("doc_id")


@query(
    "dd_incremental_minhash",
    f"""
    WITH {SQL_DOCS_SHINGLES},
    ab AS (SELECT doc_id,
             [{_P.sql_md5_long('s', 15, 1)} % {_P.ROLL_MOD} for s in sh] AS ha,
             [{_P.sql_md5_long('s', 15, 16)} % {_P.ROLL_MOD} for s in sh] AS hb
           FROM sh),
    sig AS (SELECT doc_id,
              [list_min([(ha[i] + j * hb[i]) % {_P.ROLL_MOD}
                         for i in range(1, len(ha) + 1)])
               for j in range(0, {D.MINHASH_N})] AS sig
            FROM ab),
    bands AS (SELECT doc_id, b AS band,
                array_to_string(sig[b*{D.LSH_ROWS}+1 : b*{D.LSH_ROWS}+{D.LSH_ROWS}], ',') AS key
              FROM sig, range(0, {D.LSH_BANDS}) AS r(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a
             JOIN bands b ON a.band = b.band AND a.key = b.key
                         AND a.doc_id < 400 AND b.doc_id >= 400)
    SELECT id_a, id_b, {SQL_JACCARD} AS jaccard
    FROM cand JOIN sh sa ON cand.id_a = sa.doc_id
              JOIN sh sb ON cand.id_b = sb.doc_id
    WHERE {SQL_JACCARD} >= 0.3
    ORDER BY id_a, id_b
    """,
    driver=True,  # rotated IN r7 (first driver row; plans/rotation.py)
)
def dd_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dedup (operators.dedup.incremental_minhash_lsh):
    doc_ids >= 400 are today's batch, the rest the corpus, represented
    by its LSH band index (operators.dedup.band_index — the state an
    accepted batch appends to). Candidates come from the index
    equi-join; only candidate corpus docs are re-read for the exact
    Jaccard verify. The oracle replays the FULL LSH pipeline in DuckDB
    restricted to cross-boundary pairs, so the incremental path must
    find exactly the pairs the batch operator would — the convergence
    guarantee the operator docstring claims, under the hard signal
    (non-vacuous: 8 cross-boundary near-dup pairs at sf0.01, 31 at
    sf0.1)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    return D.incremental_minhash_lsh(batch, corpus, threshold=0.3).orderBy(
        "id_a", "id_b"
    )


@query(
    "dd_passage_dupes",
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    p AS (
      SELECT doc_id,
             unnest(list_distinct(
               [array_to_string(w[i:i+15], ' ')
                for i in range(1, len(w) - 14)])) AS s
      FROM d),
    ph AS (SELECT doc_id, {_P.sql_md5_long('s')} AS h FROM p),
    df AS (SELECT h, count(*) AS nd FROM ph GROUP BY 1)
    SELECT doc_id, count(*) AS n_passages,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_passages,
           round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS dup_fraction
    FROM ph JOIN df USING (h)
    GROUP BY doc_id ORDER BY doc_id
    """,
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
)
def dd_passage_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage report (operators.dedup.passage_dup_report):
    per document, the fraction of its distinct word-16-gram passages
    that also occur in at least one other document — the span-hash
    approximation of Lee et al. 2021's exact-substring dedup, catching
    boilerplate/templated spans that whole-document hashing never can.
    16-gram passages (vs the 5-gram Jaccard shingles) make chance
    collisions in the tiny fixture vocabulary rare, so nonzero
    dup_fraction means genuinely shared spans (planted near-dups).

    The per-passage doc-frequency count uses count(*) over rows that are
    already DISTINCT (doc, passage-hash) pairs — a plain aggregate, not
    a countDistinct expand. Reference analogue: none."""
    docs = _t(spark, sf_dir, "documents")
    return D.passage_dup_report(docs, n=16).orderBy("doc_id")


@query(
    "ev_equidepth_histogram",
    """
    WITH vc AS (SELECT value, count(*) AS nv FROM events GROUP BY 1),
    tot AS (SELECT CAST(sum(nv) AS BIGINT) AS ntot FROM vc),
    c AS (
      SELECT value, nv,
             CAST(coalesce(sum(nv) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_excl
      FROM vc),
    b AS (
      SELECT least((cum_excl * 8) // ntot, 7) AS bin, value, nv
      FROM c CROSS JOIN tot)
    SELECT bin, CAST(sum(nv) AS BIGINT) AS n,
           count(*) AS n_distinct,
           round(min(value), 6) AS lo, round(max(value), 6) AS hi
    FROM b GROUP BY 1 ORDER BY bin
    """,
    # New r5 (locally pinned; distribution-summary family's driver row is
    # a13_percentile_sketch).
    driver=False,
)
def ev_equidepth_histogram(
    spark: SparkSession, sf_dir: str, *, scale_safe: bool = False
) -> DataFrame:
    """EQUI-DEPTH histogram (8 bins of ~equal row count) of the event
    value — the optimizer-statistics / distribution-panel companion to
    the equi-width ev_value_histogram. Ties never straddle bins: every
    occurrence of one value lands in the bin of its exclusive cumulative
    rank, floor(cum_excl * k / ntot) — ALL-INTEGER arithmetic, so the
    bin ids are exact in both engines (no float rank boundary to
    diverge).

    Scale shape: one map-side-combine shuffle compresses the fact to
    DISTINCT (value, count) rows — the measure is 2dp-quantized, so this
    frame is BOUNDED by the value domain (~50k rows) no matter the
    corpus size — and the prefix-sum window runs on that bounded frame,
    not the fact. For genuinely continuous (unbounded-distinct) measures
    pass ``scale_safe=True``: the prefix-sum goes two-phase per
    partition (operators.surrogate.two_phase_cumsum, bit-identical
    bigint cum_excl, equivalence-tested)."""
    from ..operators.sketch import equidepth_bins

    events = _t(spark, sf_dir, "events")
    return equidepth_bins(events, "value", k=8, scale_safe=scale_safe)


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
    driver=False,  # rotated OUT r8 (driver-green; plans/rotation.py)
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
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
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
    driver=True,  # rotated IN r8 (first driver row; plans/rotation.py)
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
    "tx_bigram_logprob",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS term FROM d),
    v AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
    n AS (SELECT sum(c) AS total FROM v),
    bg AS (
      SELECT doc_id,
             unnest([{'a': w[i], 'b': w[i+1]}
                     for i in range(1, len(w))]) AS p
      FROM d),
    pairs AS (SELECT doc_id, p.a AS w1, p.b AS w2 FROM bg),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
    lp AS (
      SELECT pairs.doc_id,
             round(ln(CAST(0.7 AS DOUBLE) * c12 / v1.c
                      + CAST(0.3 AS DOUBLE) * v2.c / total), 6)
               ::DECIMAL(18,6) AS logp
      FROM pairs
      JOIN c12 USING (w1, w2)
      JOIN v v1 ON w1 = v1.term
      JOIN v v2 ON w2 = v2.term
      CROSS JOIN n)
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(logp) AS DOUBLE) AS sum_logp,
           round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS avg_logp
    FROM lp GROUP BY doc_id ORDER BY doc_id
    """,
    # New r5 (locally pinned; rotation candidate for r6's driver swap).
    driver=False,
)
def tx_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated BIGRAM language-model scoring — the second-order
    fluency signal above tx_unigram_logprob: each document's mean
    log-likelihood of its adjacent token pairs under
    p(w2|w1) = 0.7 * c(w1,w2)/c(w1) + 0.3 * c(w2)/N (Jelinek-Mercer
    interpolation with the corpus unigram as the backoff, so unseen
    continuations never hit log(0)). Word-salad text with plausible
    unigrams but incoherent transitions scores low here and normal
    there — exactly the gap a bigram filter exists to close.

    Scale + determinism shape: both model frames (bigram and unigram
    counts) are vocabulary-sized broadcasts; occurrences come from the
    codegen posexplode+lead pipeline (no HOF lambdas in the hot path);
    per-pair log-probs are rounded to 6dp and summed as DECIMAL —
    exact, order-independent re-aggregation, same discipline as the
    unigram entry."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        tok.select(
            "doc_id",
            F.col("term").alias("w1"),
            F.lead("term", 1).over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    v = tok.groupBy("term").agg(F.count("*").alias("c"))
    n = v.agg(F.sum("c").alias("total"))
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    v1 = v.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    v2 = v.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    lp = (
        pairs.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(v1), "w1")
        .join(F.broadcast(v2), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(0.7) * F.col("c12") / F.col("c1")
                    + F.lit(0.3) * F.col("c2") / F.col("total")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("logp").cast("double").alias("sum_logp"),
        )
        .withColumn(
            "avg_logp",
            F.round(F.col("sum_logp") / F.col("n_bigrams"), 6),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dd_segment_dedup: C4-style line-level corpus dedup (segment granularity)
# ---------------------------------------------------------------------------

SEG_TOKENS = 12


@query(
    "dd_segment_dedup",
    f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    segs AS (
      SELECT doc_id,
             unnest(range(0, (len(w) + {SEG_TOKENS - 1}) // {SEG_TOKENS}))
               AS seg_idx,
             unnest([array_to_string(
                       w[s * {SEG_TOKENS} + 1 : s * {SEG_TOKENS} + {SEG_TOKENS}],
                       ' ')
                     for s in range(0, (len(w) + {SEG_TOKENS - 1})
                                       // {SEG_TOKENS})]) AS seg
      FROM tok),
    k AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (
               PARTITION BY ('0x' || substr(md5(seg), 1, 15))::BIGINT
               ORDER BY doc_id, seg_idx) AS rn
      FROM segs)
    SELECT doc_id,
           count(*) AS n_segments,
           sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                               ORDER BY seg_idx), '') AS clean_text
    FROM k GROUP BY doc_id ORDER BY doc_id
    """,
    driver=True,  # rotated IN r7 (first driver row; plans/rotation.py)
)
def dd_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's line-level dedup (Raffel et al. 2020 §2.2 — drop every
    repeated line corpus-wide, keeping the globally FIRST occurrence)
    at fixed-width segment granularity, with documents reassembled in
    original order (operators.dedup.segment_dedup). The parallel-unnest
    oracle replays the identical segmentation, winner election
    (row_number over the same 60-bit hash partitioning) and ordered
    string_agg reassembly. Two fixture docs come back EMPTY — the
    boilerplate-only pages the C4 pass exists to drain."""
    return D.segment_dedup(
        _t(spark, sf_dir, "documents"), SEG_TOKENS
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dd_er_blocked_pairs: entity-resolution blocking + edit-distance verify
# ---------------------------------------------------------------------------

ER_MAX_DIST = 3


@query(
    "dd_er_blocked_pairs",
    f"""
    WITH n AS (SELECT DISTINCT p_name AS name,
                      string_split(p_name, ' ')[-1] AS block
               FROM part)
    SELECT a.block AS block, a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS dist,
           round(1.0 - levenshtein(a.name, b.name)
                       / greatest(length(a.name), length(b.name)), 6)
             AS sim
    FROM n a JOIN n b ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {ER_MAX_DIST}
    ORDER BY 1, 2, 3
    """,
    driver=False,  # r7 rotation queue (new r6; locally oracle-pinned)
)
def dd_er_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate pairs over the part-name vocabulary:
    block on the head noun (last token), verify within blocks by JVM-side
    levenshtein under 3 (operators.dedup.
    blocked_levenshtein_pairs) — the Fellegi-Sunter blocking+verify
    skeleton every record-linkage pipeline runs before scoring. Both
    engines ship the same edit-distance primitive, so the oracle is
    exact. At 100 TB the single blocking key becomes multi-pass /
    sorted-neighborhood keys; each pass is this operator unchanged."""
    pairs = D.blocked_levenshtein_pairs(
        _t(spark, sf_dir, "part"),
        "p_name",
        F.substring_index(F.col("p_name"), " ", -1),
        ER_MAX_DIST,
    )
    return pairs.orderBy("block", "name_a", "name_b")


# ---------------------------------------------------------------------------
# ev_peak_concurrency: sweep-line daily peak concurrent sessions
# ---------------------------------------------------------------------------


@query(
    "ev_peak_concurrency",
    """
    WITH o AS (
      SELECT user_id, ts,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS brk
      FROM events),
    s AS (SELECT user_id, ts,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
          FROM o),
    sess AS (SELECT user_id, sid, min(ts) AS f, max(ts) AS l
             FROM s GROUP BY 1, 2),
    sd AS (SELECT f, l,
                  unnest(generate_series(f::DATE, l::DATE,
                                         INTERVAL 1 DAY))::DATE AS day
           FROM sess),
    m AS (
      SELECT day, greatest(f, day::TIMESTAMP) AS ts, 1 AS delta FROM sd
      UNION ALL
      SELECT day, least(l, (day + INTERVAL 1 DAY)::TIMESTAMP), -1 FROM sd),
    c AS (SELECT day, delta,
            sum(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
                             ROWS UNBOUNDED PRECEDING) AS conc
          FROM m)
    SELECT day, max(conc)::BIGINT AS peak_concurrency,
           sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_session_days
    FROM c GROUP BY day ORDER BY day
    """,
    driver=True,  # rotated IN r7 (first driver row; plans/rotation.py)
)
def ev_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily PEAK concurrent sessions — the sweep-line / interval-overlap
    primitive (±1 boundary marks, running sum, per-day max) behind
    capacity planning and "how many users were on at once" dashboards.

    Sessions are the same 30-min-gap gaps-and-islands islands as
    ev_sessionize; each session interval [first_ts, last_ts] (CLOSED at
    both ends — a single-event session still counts 1) is split at
    midnight via an exploded day sequence so the sweep windows partition
    BY DAY: no global sort anywhere, per-partition work bounded by one
    day's session count at any scale. Boundary pins: +1 marks sort
    before -1 at the same instant (ORDER BY ts, delta DESC — two
    sessions meeting end-to-start at the same microsecond DO overlap),
    and a midnight-spanning session counts in both adjacent days. The
    running-sum max is order-independent under ties (every tied +1
    contributes the same +1 to the partial-sum multiset), so both
    engines agree exactly."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    wu = Window.partitionBy("user_id").orderBy("ts")
    # Exact integer-microsecond gap test (unix_micros), bit-identical to
    # the oracle's timestamp-minus-timestamp < INTERVAL comparison.
    brk = F.when(
        F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
        < 1800 * 1_000_000,
        0,
    ).otherwise(1)
    sid = F.sum(brk).over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        ev.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("f"), F.max("ts").alias("l"))
    )
    sd = sess.select(
        "f",
        "l",
        F.explode(
            F.sequence(F.to_date("f"), F.to_date("l"))
        ).alias("day"),
    )
    day_start = F.col("day").cast("timestamp")
    day_end = F.date_add(F.col("day"), 1).cast("timestamp")
    marks = sd.select(
        "day",
        F.greatest(F.col("f"), day_start).alias("ts"),
        F.lit(1).alias("delta"),
    ).unionAll(
        sd.select(
            "day",
            F.least(F.col("l"), day_end).alias("ts"),
            F.lit(-1).alias("delta"),
        )
    )
    wd = (
        Window.partitionBy("day")
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marks.withColumn("conc", F.sum("delta").over(wd))
        .groupBy("day")
        .agg(
            F.max("conc").alias("peak_concurrency"),
            F.sum((F.col("delta") == 1).cast("int")).alias(
                "n_session_days"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# ev_wau_stickiness: trailing 7-day active users + DAU/WAU stickiness
# ---------------------------------------------------------------------------


@query(
    "ev_wau_stickiness",
    """
    WITH ev AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
    sc AS (SELECT user_id,
                  unnest(generate_series(day, day + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY))::DATE AS day_w
           FROM ev),
    wau AS (SELECT day_w AS day, count(DISTINCT user_id) AS wau
            FROM sc GROUP BY 1),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ev GROUP BY 1)
    SELECT d.day AS day, d.dau AS dau, w.wau AS wau,
           round(d.dau::DOUBLE / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day ORDER BY day
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def ev_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7-day WAU, and the DAU/WAU stickiness ratio per
    day — the engagement triple every product dashboard leads with.

    The WAU is EXACT without any sliding-window distinct (no engine has
    a distributed COUNT(DISTINCT) OVER RANGE): each distinct (user, day)
    activity row SCATTERS to the 7 trailing windows it belongs to
    (explode of a 7-date sequence — the same scatter-convolution trick
    as ev_ewma_daily's kernel), then a plain two-phase count-distinct
    per target day. Shuffle volume = 7x the distinct activity frame,
    keyed by day.

    PARTIAL-WINDOW CONVENTION (shared with ev_active_users_hll — one
    registry, one rule): windows at the corpus HEAD that span fewer
    than the full 7 days are reported as-is (standard dashboard
    convention: day 3's WAU is "actives in the data so far"), and the
    inner join back to observed days drops the phantom scatter targets
    past the last day, so the corpus TAIL never fabricates future
    windows. Both oracles encode the same rule."""
    ev = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    sc = ev.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day_w"),
    )
    wau = sc.groupBy(F.col("day_w").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = ev.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# tx_negative_sampling: deterministic contrastive negatives per user
# ---------------------------------------------------------------------------

NEG_K = 3


@query(
    "tx_negative_sampling",
    f"""
    WITH pb AS (SELECT DISTINCT o_custkey AS ck, p_brand AS b
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                            JOIN part ON l_partkey = p_partkey),
    u AS (SELECT DISTINCT ck FROM pb),
    br AS (SELECT DISTINCT p_brand AS b FROM part),
    cand AS (SELECT u.ck AS ck, br.b AS b FROM u CROSS JOIN br
             WHERE NOT EXISTS (SELECT 1 FROM pb
                               WHERE pb.ck = u.ck AND pb.b = br.b)),
    r AS (SELECT ck, b,
            row_number() OVER (
              PARTITION BY ck
              ORDER BY ('0x' || substr(md5(ck::VARCHAR || '|' || b), 1, 15))
                         ::BIGINT, b) AS rnk
          FROM cand)
    SELECT ck AS custkey, b AS neg_brand, rnk
    FROM r WHERE rnk <= {NEG_K} ORDER BY custkey, rnk
    """,
    driver=False,  # r7 rotation queue (new r6; locally oracle-pinned)
)
def tx_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every purchasing customer, the 3 hash-ranked brands they
    have NOT bought — the negatives a two-tower recommender or
    contrastive embedding job pairs against each positive. Sampling by
    portable-hash rank (not rand()) makes the draw reproducible,
    shardable, and oracle-checkable — the same policy as every split/
    sample operator in this engine (Efraimidis-Spirakis family).

    Scale shape: candidates = purchasers x broadcast BRAND DIM (catalog-
    sized, bounded) anti-joined against the distinct purchase pairs;
    ranking is a row_number window PARTITIONED PER CUSTOMER (width <=
    |brands|), never a global sort. At a 10^6-item catalog the cross
    join becomes hash-bucketed candidate generation (sample buckets,
    then anti-join), same skeleton."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pb = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("ck"), F.col("p_brand").alias("b"))
        .distinct()
    )
    u = pb.select("ck").distinct()
    br = part.select(F.col("p_brand").alias("b")).distinct()
    cand = u.crossJoin(F.broadcast(br)).join(pb, ["ck", "b"], "left_anti")
    h = _P.md5_long(
        F.concat(F.col("ck").cast("string"), F.lit("|"), F.col("b"))
    )
    wr = Window.partitionBy("ck").orderBy(h.asc(), F.col("b").asc())
    return (
        cand.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= NEG_K)
        .select(
            F.col("ck").alias("custkey"),
            F.col("b").alias("neg_brand"),
            "rnk",
        )
        .orderBy("custkey", "rnk")
    )


# ---------------------------------------------------------------------------
# wh_bloom_prune: portable Bloom filter join-prune audit
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 14  # 16384 bits: ~2.7% FPR at the sf0.1 key load
BLOOM_K = 4


def _sql_bloom_positions(key: str) -> str:
    return (
        "["
        + ", ".join(
            f"('0x' || substr(md5({key}::VARCHAR || '|{i}'), 1, 15))::BIGINT"
            f" % {BLOOM_M}"
            for i in range(BLOOM_K)
        )
        + "]"
    )


@query(
    "wh_bloom_prune",
    f"""
    WITH keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderstatus = 'F' AND quarter(o_orderdate) = 4
        AND o_orderpriority = '1-URGENT'),
    bits AS (SELECT DISTINCT unnest({_sql_bloom_positions('k')}) AS bit
             FROM keys),
    pb AS (SELECT DISTINCT c_custkey AS k, unnest({_sql_bloom_positions('c_custkey')}) AS bit
           FROM customer),
    nb AS (SELECT k, count(*) AS nb FROM pb GROUP BY 1),
    nm AS (SELECT pb.k AS k, count(*) AS nm
           FROM pb JOIN bits ON pb.bit = bits.bit GROUP BY 1),
    cand AS (SELECT nb.k AS k FROM nb JOIN nm ON nb.k = nm.k
             WHERE nm.nm = nb.nb),
    audit AS (
      SELECT (SELECT count(*) FROM keys) AS n_keys,
             (SELECT count(*) FROM bits) AS n_bits_set,
             (SELECT count(*) FROM customer) AS n_probe,
             (SELECT count(*) FROM cand) AS n_candidates,
             (SELECT count(*) FROM cand JOIN keys ON cand.k = keys.k)
               AS n_true_members)
    SELECT n_keys, n_bits_set, n_probe, n_candidates, n_true_members,
           n_candidates - n_true_members AS n_false_positives,
           round((n_candidates - n_true_members)::DOUBLE
                 / (n_probe - n_true_members), 6) AS fpr
    FROM audit
    """,
    driver=True,  # rotated IN r7 (first driver row; plans/rotation.py)
)
def wh_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit portable Bloom-filter join pruning with an EXACT
    false-positive audit — the first-class form of the runtime bloom
    Spark's AQE injects under joins (here the bits are an inspectable,
    broadcastable frame from the md5 hash family, m=16384 k=4).
    The build side is a selective key set (urgent Q4 finalized orders,
    ~14% of customers); the probe is the whole customer dim; the audit
    row reports the candidate count, exact true members, false
    positives, and observed FPR — no false negatives by construction
    (operators.sketch.bloom_candidates counts a key's own distinct
    positions, so hash self-collisions cannot fail a member).

    At 100 TB this is the pattern that prunes a fact scan before its
    shuffle when the dim-side filter is selective: ship the bit frame
    (<= k x |keys| longs), semi-join probe bits map-side, and pay the
    documented FPR in extra rows instead of a full shuffle."""
    from ..operators.sketch import bloom_bits, bloom_candidates

    orders = _t(spark, sf_dir, "orders")
    keys = (
        orders.filter(
            (F.col("o_orderstatus") == "F")
            & (F.quarter("o_orderdate") == 4)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    customer = _t(spark, sf_dir, "customer")
    bits = bloom_bits(keys, "k", BLOOM_M, BLOOM_K)
    cand = bloom_candidates(
        customer, "c_custkey", bits, BLOOM_M, BLOOM_K
    ).localCheckpoint(eager=True)
    n_keys = keys.agg(F.count("*").alias("n_keys"))
    n_bits = bits.agg(F.count("*").alias("n_bits_set"))
    n_probe = customer.agg(F.count("*").alias("n_probe"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_true = (
        cand.join(keys, cand.key == keys.k)
        .agg(F.count("*").alias("n_true_members"))
    )
    return (
        n_keys.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(n_probe))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_true))
        .select(
            "n_keys",
            "n_bits_set",
            "n_probe",
            "n_candidates",
            "n_true_members",
            (F.col("n_candidates") - F.col("n_true_members")).alias(
                "n_false_positives"
            ),
            F.round(
                (F.col("n_candidates") - F.col("n_true_members")).cast(
                    "double"
                )
                / (F.col("n_probe") - F.col("n_true_members")),
                6,
            ).alias("fpr"),
        )
    )


# ---------------------------------------------------------------------------
# wh_bucketed_join: co-located bucketed join proof (zero-shuffle SMJ)
# ---------------------------------------------------------------------------

BUCKET_N = 8


@query(
    "wh_bucketed_join",
    """
    SELECT c_mktsegment AS segment, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS revenue,
           0 AS n_shuffle_exchanges, 1 AS used_sort_merge_join
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1
    """,
    driver=True,  # rotated IN r7 (first driver row; plans/rotation.py)
)
def wh_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed CO-LOCATED join proof under the hash gate: orders and
    customer are written as bucketBy(8, custkey) tables (one
    file per bucket via repartition-before-write), then merge-joined —
    and the physical plan must contain ZERO Exchange operators: matching
    bucket counts on the join key make the shuffle disappear entirely,
    the storage-level answer to "this join shuffles 100 TB every run".
    The audit columns are the CLAIM: the Spark side counts Exchange
    nodes in the executed plan string and reports SortMergeJoin usage;
    the oracle hard-codes the asserted values (0 shuffles, SMJ used), so
    any regression that reintroduces a shuffle or demotes the join
    fails the value-hash gate, not just a unit test. (In-bucket sorts
    remain: Spark 4 does not propagate bucket-file ordering unless the
    legacy scan-ordering flag is set; the shuffle, not the linear
    per-bucket sort, is the scale cost this layout removes.)

    Like wh_gold_maintenance and wh_zorder_skipping this is a storage
    JOB (eager: creates a temp database, writes both bucketed tables,
    plans the join, audits, drops the database). At 100 TB the same
    declaration is the pre-shuffled layout both nightly jobs read, and
    the write cost amortizes over every downstream co-located join.
    Reference analogue: none (single CSV)."""
    import atexit
    import os
    import re
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="ftdw-bucketed-join-")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    db = "ftdw_bkt_" + os.path.basename(base).replace("ftdw-bucketed-join-", "")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{base}'")
    try:
        orders = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        customer = _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        (
            orders.repartition(BUCKET_N, "o_custkey")
            .write.bucketBy(BUCKET_N, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable(f"{db}.orders_b")
        )
        (
            customer.repartition(BUCKET_N, "c_custkey")
            .write.bucketBy(BUCKET_N, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable(f"{db}.customer_b")
        )
        ob = spark.table(f"{db}.orders_b")
        cb = spark.table(f"{db}.customer_b")
        joined = ob.hint("merge").join(cb, ob.o_custkey == cb.c_custkey)
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        n_exchanges = len(re.findall(r"\bExchange\b", plan))
        used_smj = int("SortMergeJoin" in plan)
        rows = (
            joined.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .orderBy("segment")
            .collect()
        )
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                r["segment"],
                r["n_orders"],
                r["revenue"],
                n_exchanges,
                used_smj,
            )
            for r in rows
        ],
        "segment string, n_orders long, revenue double,"
        " n_shuffle_exchanges int, used_sort_merge_join int",
    )


# ---------------------------------------------------------------------------
# wh_incremental_join: bilinear delta maintenance of a materialized join
# ---------------------------------------------------------------------------


@query(
    "wh_incremental_join",
    """
    WITH a AS (SELECT o_orderkey, o_custkey, o_totalprice,
                      ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))
                        ::BIGINT % 10 = 0 AS is_d
               FROM orders),
    c AS (SELECT c_custkey, c_mktsegment,
                 ('0x' || substr(md5(c_custkey::VARCHAR), 1, 15))
                   ::BIGINT % 10 = 0 AS is_d
          FROM customer),
    mb AS (SELECT o_totalprice FROM a JOIN c ON o_custkey = c_custkey
           WHERE NOT a.is_d AND NOT c.is_d),
    d1 AS (SELECT o_totalprice FROM a JOIN c ON o_custkey = c_custkey
           WHERE a.is_d AND NOT c.is_d),
    d2 AS (SELECT o_totalprice FROM a JOIN c ON o_custkey = c_custkey
           WHERE NOT a.is_d AND c.is_d),
    d3 AS (SELECT o_totalprice FROM a JOIN c ON o_custkey = c_custkey
           WHERE a.is_d AND c.is_d),
    inc AS (SELECT * FROM mb UNION ALL SELECT * FROM d1
            UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3),
    full_j AS (SELECT o_totalprice FROM a JOIN c ON o_custkey = c_custkey)
    SELECT (SELECT count(*) FROM mb) AS n_base,
           (SELECT count(*) FROM d1) + (SELECT count(*) FROM d3)
             AS n_from_delta_orders,
           (SELECT count(*) FROM d2) AS n_from_delta_customers,
           (SELECT count(*) FROM inc) AS n_incremental,
           (SELECT count(*) FROM full_j) AS n_full,
           CASE WHEN (SELECT count(*) FROM inc)
                     = (SELECT count(*) FROM full_j)
                THEN 1 ELSE 0 END AS counts_match,
           (SELECT CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(30,2))),
                                 0) AS DOUBLE) FROM inc)
             AS revenue_incremental,
           (SELECT CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(30,2))),
                                 0) AS DOUBLE) FROM full_j)
             AS revenue_full
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def wh_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a materialized JOIN, proved by
    the bilinear delta rule under the hash gate: with base/delta splits
    A = Ab + dA, C = Cb + dC (deterministic 10% hash deltas standing in
    for a late-arriving fact batch and a late-arriving dim batch),

        (Ab + dA) x (Cb + dC) = Ab x Cb  (the stored view)
                              + dA x Cb + Ab x dC + dA x dC  (the delta)

    so refreshing the view costs three DELTA-SIDED joins — each sized
    by a batch, never a re-join of the full fact — instead of the full
    recompute. The audit row carries both sides of the identity (counts
    and exact decimal revenue of incremental vs full); the oracle
    replays the same algebra, so the gate pins the IVM claim itself.
    Completes the maintenance trio: wh_incremental_rollup (aggregate
    IVM), wh_cdc_apply (upsert folding), and now join IVM — the three
    deltas a 100 TB nightly pipeline composes instead of recomputing.
    Reference analogue: none (the reference recomputes its merged CSV
    end-to-end every run, etl.ipynb top-to-bottom)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    a = orders.withColumn(
        "is_d", _P.md5_long(F.col("o_orderkey").cast("string")) % 10 == 0
    )
    c = customer.withColumn(
        "is_d", _P.md5_long(F.col("c_custkey").cast("string")) % 10 == 0
    )

    def seg(fact_delta: bool, dim_delta: bool) -> DataFrame:
        fa = a.filter(F.col("is_d") if fact_delta else ~F.col("is_d"))
        fc = c.filter(F.col("is_d") if dim_delta else ~F.col("is_d"))
        return fa.join(
            F.broadcast(fc.select("c_custkey")),
            fa.o_custkey == F.col("c_custkey"),
        ).select("o_totalprice")

    mb, d1, d2, d3 = (
        seg(False, False),
        seg(True, False),
        seg(False, True),
        seg(True, True),
    )
    inc = mb.unionAll(d1).unionAll(d2).unionAll(d3)
    full_j = a.join(
        F.broadcast(c.select("c_custkey")),
        a.o_custkey == F.col("c_custkey"),
    ).select("o_totalprice")

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias(name))

    def rev(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")),
                F.lit(0).cast("decimal(30,2)"),
            )
            .cast("double")
            .alias(name)
        )

    out = (
        cnt(mb, "n_base")
        .crossJoin(F.broadcast(cnt(d1, "nd1")))
        .crossJoin(F.broadcast(cnt(d2, "n_from_delta_customers")))
        .crossJoin(F.broadcast(cnt(d3, "nd3")))
        .crossJoin(F.broadcast(cnt(inc, "n_incremental")))
        .crossJoin(F.broadcast(cnt(full_j, "n_full")))
        .crossJoin(F.broadcast(rev(inc, "revenue_incremental")))
        .crossJoin(F.broadcast(rev(full_j, "revenue_full")))
    )
    return out.select(
        "n_base",
        (F.col("nd1") + F.col("nd3")).alias("n_from_delta_orders"),
        "n_from_delta_customers",
        "n_incremental",
        "n_full",
        F.when(F.col("n_incremental") == F.col("n_full"), 1)
        .otherwise(0)
        .alias("counts_match"),
        "revenue_incremental",
        "revenue_full",
    )


# ---------------------------------------------------------------------------
# ev_active_users_hll: sliding active-users via mergeable HLL day sketches
# ---------------------------------------------------------------------------

HLL_WINDOW_DAYS = 14
HLL_TOL = 0.05


@query(
    "ev_active_users_hll",
    f"""
    WITH ev AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
    sc AS (SELECT user_id,
                  unnest(generate_series(day,
                                         day + INTERVAL {HLL_WINDOW_DAYS - 1}
                                               DAY,
                                         INTERVAL 1 DAY))::DATE AS day_w
           FROM ev),
    mau AS (SELECT day_w AS day, count(DISTINCT user_id) AS active_exact
            FROM sc GROUP BY 1),
    days AS (SELECT DISTINCT day FROM ev)
    SELECT d.day AS day, m.active_exact AS active_exact,
           1 AS hll_within_tol
    FROM days d JOIN mau m ON d.day = m.day ORDER BY day
    """,
    driver=True,  # rotated IN r7 (first driver row; plans/rotation.py)
)
def ev_active_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 14-day active users two ways: EXACT (the
    scatter-explode count-distinct, same skeleton as ev_wau_stickiness)
    and via MERGEABLE per-day HLL sketches — ONE sketch per day
    (hll_sketch_agg), scattered to the 14 windows it
    serves and union-merged (hll_union_agg). The sketch path is the
    100 TB answer: its scatter is days x 14 sketch ROWS
    (kilobytes), not users x days x 14 data rows, and
    the same persisted day sketches answer any window length
    retroactively (the a15_hll_mergeable pattern rolled along time).

    PARTIAL-WINDOW CONVENTION (shared with ev_wau_stickiness — one
    registry, one rule): head windows spanning fewer than the full 14
    days are reported as-is, and the join to observed days drops
    phantom scatter targets past the last day. Both oracles encode the
    same rule.

    Oracle contract (the a5 split): the exact half is value-checked
    against DuckDB; the sketch half rides as a CLAIM column —
    hll_within_tol = 1 iff the estimate lands within 5% of
    exact on EVERY output day (HLL lgK=12 gives ~1.6% standard error,
    so 5% is a hard bound, not a hope) — the oracle hard-codes 1 and
    the hash gate fails if the sketch ever drifts out."""
    ev = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    # exact: scatter distinct activity rows to trailing windows
    exact = (
        ev.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"), F.date_add(F.col("day"), HLL_WINDOW_DAYS - 1)
                )
            ).alias("day_w"),
        )
        .groupBy(F.col("day_w").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_exact"))
    )
    # sketch: one HLL per day, scatter SKETCH rows, union-merge per window
    day_sk = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = (
        day_sk.select(
            "sk",
            F.explode(
                F.sequence(
                    F.col("day"), F.date_add(F.col("day"), HLL_WINDOW_DAYS - 1)
                )
            ).alias("day_w"),
        )
        .groupBy(F.col("day_w").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    days = ev.select("day").distinct()
    per_day = (
        days.join(exact, "day")
        .join(est, "day")
        .select(
            "day",
            "active_exact",
            (
                F.abs(F.col("est") - F.col("active_exact"))
                <= F.lit(HLL_TOL) * F.col("active_exact")
            )
            .cast("int")
            .alias("ok"),
        )
    )
    # every day must be in tolerance for the claim column to read 1
    worst = per_day.agg(F.min("ok").alias("all_ok"))
    return (
        per_day.crossJoin(F.broadcast(worst))
        .select(
            "day",
            "active_exact",
            F.col("all_ok").alias("hll_within_tol"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# dd_qgram_edit_join: PassJoin-style segment-blocked edit-distance join
# ---------------------------------------------------------------------------

EDJ_PLEN = 16  # fixed-length prefix key
EDJ_K = 2  # edit-distance threshold
# k+1 = 3 segments (start, length): pigeonhole over the 16-char key
EDJ_SEGS = ((1, 1, 6), (2, 7, 5), (3, 12, 5))


@query(
    "dd_qgram_edit_join",
    f"""
    WITH p AS (SELECT DISTINCT substr(text, 1, {EDJ_PLEN}) AS s
               FROM documents),
    segdef(i, st, ln) AS (VALUES
      {", ".join(f"({i}, {st}, {ln})" for i, st, ln in EDJ_SEGS)}),
    a_seg AS (SELECT s, i, substr(s, st, ln) AS g
              FROM p CROSS JOIN segdef),
    b_seg AS (SELECT s, i, substr(s, st + d, ln) AS g
              FROM p CROSS JOIN segdef
              CROSS JOIN (SELECT unnest(range(-{EDJ_K}, {EDJ_K + 1})) AS d)
              WHERE st + d >= 1 AND st + d + ln - 1 <= {EDJ_PLEN}),
    cand AS (SELECT DISTINCT a.s AS s_a, b.s AS s_b
             FROM a_seg a JOIN b_seg b ON a.i = b.i AND a.g = b.g
             WHERE a.s < b.s)
    SELECT s_a, s_b, levenshtein(s_a, s_b) AS dist
    FROM cand WHERE levenshtein(s_a, s_b) <= {EDJ_K}
    ORDER BY s_a, s_b
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def dd_qgram_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide edit-distance similarity JOIN (all pairs of distinct
    16-char document prefixes with levenshtein <= 2)
    WITHOUT the quadratic scan — the PassJoin pigeonhole (Li, Deng,
    Feng 2011): split each key into k+1 = 3 segments; if
    ed(a, b) <= k then b contains one of a's segments EXACTLY, at a
    position shifted by at most k. So the build side emits canonical
    segments, the probe side emits the same windows at shifts
    -2..2, candidates come from the (segment_id, gram)
    equi-join, and only candidates pay the levenshtein verify. At sf0.1
    this checks ~0.4% of the 10M all-pairs space (measured 348k
    candidates, 1129 true pairs) — recall is COMPLETE by the
    pigeonhole, which the exhaustive-oracle sibling in the unit tests
    pins. Same blocked-verify skeleton as MinHash-LSH, for the
    edit-distance metric the LSH family can't index; the scale answer
    to dd_er_blocked_pairs' single-key blocking caveat. Fixed-length
    keys by construction (every fixture doc is >= 16 chars);
    variable-length corpora use PassJoin's length-bucketed segment
    table, same join shape."""
    p = (
        _t(spark, sf_dir, "documents")
        .select(F.substring("text", 1, EDJ_PLEN).alias("s"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    segdef = [
        (i, st, ln) for i, st, ln in EDJ_SEGS
    ]
    a_seg = p.select(
        "s",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.substring("s", st, ln).alias("g"),
                    )
                    for i, st, ln in segdef
                ]
            )
        ).alias("x"),
    ).select("s", "x.i", "x.g")
    probes = [
        (i, st + d, ln)
        for i, st, ln in segdef
        for d in range(-EDJ_K, EDJ_K + 1)
        if st + d >= 1 and st + d + ln - 1 <= EDJ_PLEN
    ]
    b_seg = p.select(
        F.col("s").alias("s_b"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.substring("s", st, ln).alias("g"),
                    )
                    for i, st, ln in probes
                ]
            )
        ).alias("x"),
    ).select("s_b", "x.i", "x.g")
    cand = (
        a_seg.join(b_seg, ["i", "g"])
        .filter(F.col("s") < F.col("s_b"))
        .select(F.col("s").alias("s_a"), "s_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= EDJ_K)
        .orderBy("s_a", "s_b")
    )


# ---------------------------------------------------------------------------
# tx_span_corruption: T5-style span-corruption denoising pairs
# ---------------------------------------------------------------------------

SPAN_STRIDE = 5  # candidate span starts every 5 tokens
SPAN_RATE = 5  # ... of which hash%5==0 actually mask (~12% of tokens)
SPAN_LEN = 3


@query(
    "tx_span_corruption",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    t AS (
      SELECT doc_id, unnest(range(0, len(w))) AS pos, unnest(w) AS tk
      FROM tok),
    starts AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1
               AS sid
      FROM t
      WHERE pos % {SPAN_STRIDE} = 0
        AND ('0x' || substr(md5(doc_id::VARCHAR || '|' || pos::VARCHAR),
                            1, 15))::BIGINT % {SPAN_RATE} = 0),
    masked AS (
      SELECT s.doc_id AS doc_id, s.pos AS start_pos, s.sid AS sid,
             t.pos AS pos, t.tk AS tk
      FROM starts s JOIN t
        ON t.doc_id = s.doc_id
       AND t.pos BETWEEN s.pos AND s.pos + {SPAN_LEN - 1}),
    corrupted AS (
      SELECT t.doc_id AS doc_id,
             string_agg(
               CASE WHEN m.start_pos = t.pos
                    THEN '<extra_id_' || m.sid || '>'
                    WHEN m.pos IS NOT NULL THEN NULL
                    ELSE t.tk END, ' ' ORDER BY t.pos) AS corrupted
      FROM t LEFT JOIN masked m
        ON m.doc_id = t.doc_id AND m.pos = t.pos
      GROUP BY 1),
    tgt AS (
      SELECT doc_id, sid,
             '<extra_id_' || sid || '> '
               || string_agg(tk, ' ' ORDER BY pos) AS seg
      FROM masked GROUP BY 1, 2),
    target AS (
      SELECT doc_id, count(*) AS n_spans,
             string_agg(seg, ' ' ORDER BY sid) AS target
      FROM tgt GROUP BY 1)
    SELECT c.doc_id AS doc_id, coalesce(tg.n_spans, 0) AS n_spans,
           c.corrupted AS corrupted, coalesce(tg.target, '') AS target
    FROM corrupted c LEFT JOIN target tg ON c.doc_id = tg.doc_id
    ORDER BY doc_id
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def tx_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style SPAN CORRUPTION (Raffel et al. 2020 §3.1.4): mask
    deterministic 3-token spans (~12% of tokens: candidate
    starts every 5 tokens, kept when the portable hash of
    (doc_id, pos) lands in 1/5), replace each span with a
    numbered sentinel in the input, and emit the denoising TARGET
    (sentinel + the masked tokens, in span order) — the encoder/decoder
    pair a T5-family pretraining job consumes. Hash-gated spans make
    the draw reproducible and shardable — same policy as every sampling
    operator here — and non-overlapping by construction (stride
    5 > span 3).

    Physical: one posexplode token frame, span starts filtered by
    arithmetic (no rand()), spans expanded by an EXPLODE of the
    3 positions and equi-joined back (never a BETWEEN theta
    join), reassembly per doc via the usual bounded array_sort. Three
    shuffles, all keyed by doc_id. Docs whose candidates all miss the
    hash gate pass through uncorrupted with an empty target."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tk")
    )
    ws = Window.partitionBy("doc_id").orderBy("pos")
    starts = (
        tok.filter(
            (F.col("pos") % SPAN_STRIDE == 0)
            & (
                _P.md5_long(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        F.col("pos").cast("string"),
                    )
                )
                % SPAN_RATE
                == 0
            )
        )
        .select("doc_id", F.col("pos").alias("start_pos"))
        .withColumn("sid", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("start_pos")
        ) - 1)
    )
    mask_pos = starts.select(
        "doc_id",
        "start_pos",
        "sid",
        F.explode(
            F.array(
                *[F.col("start_pos") + i for i in range(SPAN_LEN)]
            )
        ).alias("pos"),
    )
    masked = mask_pos.join(tok, ["doc_id", "pos"])
    out_tok = (
        tok.join(
            masked.select("doc_id", "pos", "start_pos", "sid"),
            ["doc_id", "pos"],
            "left",
        )
        .select(
            "doc_id",
            "pos",
            F.when(
                F.col("start_pos") == F.col("pos"),
                F.concat(
                    F.lit("<extra_id_"),
                    F.col("sid").cast("string"),
                    F.lit(">"),
                ),
            )
            .when(F.col("start_pos").isNotNull(), F.lit(None))
            .otherwise(F.col("tk"))
            .alias("out"),
        )
        .filter(F.col("out").isNotNull())
    )
    corrupted = out_tok.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "out"))),
                lambda s: s["out"],
            ),
            " ",
        ).alias("corrupted")
    )
    segs = masked.groupBy("doc_id", "sid").agg(
        F.concat(
            F.lit("<extra_id_"),
            F.col("sid").cast("string"),
            F.lit("> "),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tk"))),
                    lambda s: s["tk"],
                ),
                " ",
            ),
        ).alias("seg")
    )
    target = segs.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sid", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("target"),
    )
    return (
        corrupted.join(target, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            "corrupted",
            F.coalesce("target", F.lit("")).alias("target"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# ev_time_to_convert: view->purchase latency percentiles per day
# ---------------------------------------------------------------------------


@query(
    "ev_time_to_convert",
    """
    WITH v AS (SELECT DISTINCT user_id, ts FROM events
               WHERE event_type = 'view'),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    m AS (SELECT p.event_id, p.ts,
                 max(v.ts) AS vts
          FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
          GROUP BY 1, 2),
    lat AS (SELECT CAST(ts AS DATE) AS day,
                   epoch_us(ts) - epoch_us(vts) AS us
            FROM m),
    r AS (SELECT day, us,
                 row_number() OVER (PARTITION BY day ORDER BY us) AS rn,
                 count(*) OVER (PARTITION BY day) AS n
          FROM lat)
    SELECT day, min(n) AS n_conversions,
           round(min(CASE WHEN rn = (n + 1) // 2 THEN us END)
                 / 1000000.0, 6) AS median_s,
           round(min(CASE WHEN rn = (9 * n + 9) // 10 THEN us END)
                 / 1000000.0, 6) AS p90_s
    FROM r GROUP BY day ORDER BY day
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def ev_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase conversion LATENCY per day (lower median and
    discrete p90 of the time since the user's most recent preceding
    view, inclusive at zero) — the funnel-timing panel next to the
    funnel counts (ev_funnel_vcp) and attribution values.

    Composition: the backward as-of join (operators.temporal.asof_join
    — union + carry-forward window, ONE shuffle, never a per-key nested
    loop) attaches the latest view; latency is EXACT integer
    microseconds (unix_micros); percentiles are DISCRETE rank picks
    (element at ceil(p*n), pure integer arithmetic — interpolated
    percentile over ~1e10-scale integers differs between engines in
    the last ulp, found and pinned here), so the selected values are
    actual data points and the /1e6 seconds conversion is exact to all
    6 digits. Tied latencies make the rank pick order-independent (same
    multiset, same k-th element). Purchases with no preceding view are
    excluded. Per-day windows bound the sort; unbounded groups swap in
    approx_percentile per the a13 contract."""
    from ..operators.temporal import asof_join

    events = _t(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .select("user_id", "ts")
        .distinct()
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(p, v, by="user_id", direction="backward")
    lat = j.filter(F.col("r_ts").isNotNull()).select(
        F.col("ts").cast("date").alias("day"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("us"),
    )
    wd = Window.partitionBy("day")
    r = lat.select(
        "day",
        "us",
        F.row_number().over(wd.orderBy("us")).alias("rn"),
        F.count("*").over(wd).alias("n"),
    )
    k_med = F.floor((F.col("n") + 1) / 2)
    k_p90 = F.floor((9 * F.col("n") + 9) / 10)
    return (
        r.groupBy("day")
        .agg(
            F.min("n").alias("n_conversions"),
            F.round(
                F.min(F.when(F.col("rn") == k_med, F.col("us")))
                / 1000000.0,
                6,
            ).alias("median_s"),
            F.round(
                F.min(F.when(F.col("rn") == k_p90, F.col("us")))
                / 1000000.0,
                6,
            ).alias("p90_s"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# st_daily_actives_hll: streaming distinct-count rollup via HLL sketches
# ---------------------------------------------------------------------------


@query(
    "st_daily_actives_hll",
    """
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
           count(DISTINCT user_id) AS active_exact,
           1 AS hll_within_tol
    FROM events GROUP BY 1 ORDER BY 1
    """,
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def st_daily_actives_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct active users computed by a REAL Structured
    Streaming job — COUNT(DISTINCT) is unsupported in streaming
    aggregations, so this is the canonical workaround every streaming
    pipeline ships: a mergeable HLL sketch per day window under a
    watermark (streaming.stream.run_daily_actives_hll), O(KB) state per
    window instead of an unbounded user-id set, arrival-order
    insensitive (per-register max), late-data-correct up to the
    watermark.

    Oracle contract (the ev_active_users_hll split): event counts and
    the EXACT batch distinct are value-checked; the streamed estimate
    rides as the hll_within_tol claim column per day (1 iff within 5%
    of exact — lgK=12 gives ~1.6% se). The stream==batch sketch
    estimate EQUALITY is additionally asserted in the unit tests (the
    11th streaming operator, and the module's stream==batch design rule
    applied to sketches)."""
    stream = ST.run_daily_actives_hll(
        spark, sf_dir, num_state_partitions=8
    )
    events = _t(spark, sf_dir, "events")
    exact = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("active_exact")
    )
    s = stream.select(
        F.col("day_start").cast("date").alias("day"),
        "est",
        "n_events",
    )
    return (
        s.join(exact, "day")
        .select(
            "day",
            "n_events",
            "active_exact",
            (
                F.abs(F.col("est") - F.col("active_exact"))
                <= F.lit(0.05) * F.col("active_exact")
            )
            .cast("int")
            .alias("hll_within_tol"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# dd_containment_pairs: asymmetric shingle-containment near-dup pairs
# ---------------------------------------------------------------------------


@query(
    "dd_containment_pairs",
    f"""
    WITH {SQL_DOCS_SHINGLES},
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    rare AS (SELECT s FROM ex GROUP BY s
             HAVING count(*) <= greatest(2,
               floor(0.5 * (SELECT count(*) FROM documents)))),
    exf AS (SELECT ex.* FROM ex JOIN rare USING (s)),
    co AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
    sz AS (SELECT doc_id, len(sh) AS sz FROM sh)
    SELECT id_a, id_b,
           round(common::DOUBLE / sa.sz, 6) AS cont_a_in_b,
           round(common::DOUBLE / sb.sz, 6) AS cont_b_in_a,
           round(common::DOUBLE / least(sa.sz, sb.sz), 6) AS containment
    FROM co JOIN sz sa ON co.id_a = sa.doc_id
            JOIN sz sb ON co.id_b = sb.doc_id
    WHERE round(common::DOUBLE / least(sa.sz, sb.sz), 6) >= 0.8
    ORDER BY id_a, id_b
    """,
    driver=False,  # r7 rotation queue (new r6; locally oracle-pinned)
)
def dd_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by shingle CONTAINMENT >= 0.8 — |A n B| over the
    SMALLER set, the asymmetric measure that catches a short document
    embedded in a long one (boilerplate-wrapped copies, partial
    scrapes) where symmetric Jaccard reads 0.1 and misses it
    (operators.dedup.containment_pairs; Lee et al. 2021's substring-
    dedup motivation at shingle granularity). Both directional
    fractions ride along so curation policy can keep the container and
    drop the contained. Same inverted-index blocking + stop-shingle
    cap + count-only verify as the Jaccard sibling — one extra
    projection, zero extra shuffles."""
    return D.containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# dd_novelty_fractions: per-doc marginal-novelty curve
# ---------------------------------------------------------------------------


@query(
    "dd_novelty_fractions",
    f"""
    WITH {SQL_DOCS_SHINGLES},
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    fo AS (SELECT s, min(doc_id) AS first_doc FROM ex GROUP BY 1)
    SELECT ex.doc_id AS doc_id, count(*) AS n_shingles,
           sum(CASE WHEN fo.first_doc = ex.doc_id THEN 1 ELSE 0 END)
             ::BIGINT AS n_novel,
           round(sum(CASE WHEN fo.first_doc = ex.doc_id
                          THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
             AS novelty
    FROM ex JOIN fo ON ex.s = fo.s
    GROUP BY 1 ORDER BY 1
    """,
    driver=False,  # r7 rotation queue (new r6; locally oracle-pinned)
)
def dd_novelty_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-novelty curve per document: what fraction of each doc's
    distinct shingles did the corpus see HERE first (min doc_id ==
    ingestion order)? The decision metric behind "is another crawl
    batch still worth ingesting" — novelty ~1 for fresh content, 0 for
    a pure re-crawl (the fixture's planted copies score exactly 0).
    operators.dedup.novelty_fractions; same hash-keyed shuffle shape as
    passage_dup_report, oracle replays the identical first-occurrence
    election over the portable shingles."""
    return D.novelty_fractions(_t(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# tx_curriculum_order: scale-safe global curriculum ordering
# ---------------------------------------------------------------------------


@query(
    "tx_curriculum_order",
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    q AS (SELECT doc_id, {_SQL_QUALITY_PTS} AS quality_pts FROM d)
    SELECT doc_id, quality_pts,
           row_number() OVER (ORDER BY quality_pts DESC, doc_id)
             AS curriculum_pos
    FROM q ORDER BY curriculum_pos
    """,
    driver=True,  # rotated IN r7 (first driver row; plans/rotation.py)
)
def tx_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering of the training corpus: every document gets a
    GLOBAL position by (quality DESC, doc_id) — highest-quality text
    first, the easy-to-hard schedule curriculum-learning pipelines feed
    the data loader. The interesting part is WHERE the global ordering
    comes from: this entry runs operators.surrogate.two_phase_rank BY
    DEFAULT (range-partition histogram + per-partition offsets — no
    single-partition window anywhere), so the scale_safe machinery that
    elsewhere sits behind opt-in flags is itself under the driver's
    value-hash gate here, checked against the oracle's plain
    row_number() — the two formulations must agree to the last row.
    Quality is the same map-only C4/Gopher composite as
    tx_quality_score (shared oracle arithmetic, integer points)."""
    from ..operators.surrogate import two_phase_rank

    docs = _t(spark, sf_dir, "documents")
    cols = T.quality_columns("text")
    q = docs.select(
        "doc_id", cols["quality_pts"].alias("quality_pts")
    )
    ranked, _ = two_phase_rank(
        q,
        [F.desc("quality_pts"), F.asc("doc_id")],
        rank_col="curriculum_pos",
    )
    return ranked.select(
        "doc_id", "quality_pts", "curriculum_pos"
    ).orderBy("curriculum_pos")


# ---------------------------------------------------------------------------
# wh_orphan_audit: referential-integrity audit across every star edge
# ---------------------------------------------------------------------------

_FK_EDGES = (
    ("lineitem.l_partkey -> part.p_partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey -> supplier.s_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("lineitem.l_orderkey -> orders.o_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("orders.o_custkey -> customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey -> nation.n_nationkey", "customer",
     "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey -> nation.n_nationkey", "supplier",
     "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey -> region.r_regionkey", "nation", "n_regionkey",
     "region", "r_regionkey"),
)


def _orphan_edge_sql(rel, child, ck, parent, pk) -> str:
    return f"""SELECT '{rel}' AS relationship,
       (SELECT count(*) FROM {child}) AS n_child_rows,
       (SELECT count(*) FROM {child}
        WHERE {ck} NOT IN (SELECT {pk} FROM {parent})) AS n_orphans"""


@query(
    "wh_orphan_audit",
    "\nUNION ALL\n".join(_orphan_edge_sql(*e) for e in _FK_EDGES)
    + "\nORDER BY relationship",
    driver=True,  # rotated IN r7 wave-2 (first driver row; plans/rotation.py)
)
def wh_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over EVERY foreign-key edge of the
    star at once: child row count and orphan count (child keys with no
    parent) per relationship — the wh_expectations sibling that checks
    the JOIN GRAPH instead of column domains, and the generalization of
    the reference's single missing-symbol anti-join (etl.ipynb:16-29)
    to the whole schema. All seven edges audit green on the fixtures;
    the row shape is what a nightly quality job alerts on.

    Physical: per edge one broadcast LEFT ANTI join (parent key
    columns are dims — always the broadcast side) counted alongside
    the child count, unioned into the 7-row audit. Keys are
    non-nullable fixture-wide, so anti-join == NOT IN with no
    three-valued-logic trap (the j5/q16 note)."""
    parts = []
    for rel, child, ck, parent, pk in _FK_EDGES:
        cdf = _t(spark, sf_dir, child)
        pdf = _t(spark, sf_dir, parent).select(
            F.col(pk).alias(ck)
        ).distinct()
        n_child = cdf.agg(F.count("*").alias("n_child_rows"))
        n_orph = (
            cdf.select(ck)
            .join(F.broadcast(pdf), ck, "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        parts.append(
            n_child.crossJoin(F.broadcast(n_orph)).select(
                F.lit(rel).alias("relationship"),
                "n_child_rows",
                "n_orphans",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("relationship")
