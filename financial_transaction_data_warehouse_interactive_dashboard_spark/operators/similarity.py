"""Similarity search over an embedding column (array<float>).

Beyond-reference scope (the reference has no vector data; its closest
analogue is the LIDA NL page, streamlit.py:473-542, which is retrieval by
LLM, not by geometry). Two tiers:

- brute-force cosine top-k: the exactness baseline. Query side is tiny and
  broadcast; the corpus is scanned once; per-query top-k via a window over
  the (queries x corpus) score frame. Linear in corpus size — the right
  answer up to ~10^7 vectors per query batch.
- sign-LSH bucketed ANN: random-hyperplane-style LSH degenerated to
  coordinate signs (deterministic, portable to the DuckDB oracle). Buckets
  partition the corpus 2^SIGN_BITS ways; each query probes exactly its own
  bucket. The scale path: probe cost ~ corpus/2^bits, recall traded
  explicitly. Swap the bucket fn for true random hyperplanes (seeded
  broadcast matrix) on a real cluster without changing the plan shape.

Cosine is computed JVM-side (zip_with/aggregate — functions.portable); no
Python in the hot path. Scores are rounded to 6 dp before ranking so the
top-k frontier is reproducible across engines (last-ulp hygiene)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import portable as P

SIGN_BITS = 8


def _vecs(emb: DataFrame) -> DataFrame:
    return emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))


def topk_bruteforce(
    emb: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Exact cosine top-k neighbors for each of the first ``n_queries``
    vectors (deterministic query set: vec_id < n_queries), self excluded.

    Rank key: (rounded cosine desc, neighbor id asc) — total order, so the
    selected k rows are engine-independent.
    """
    vecs = _vecs(emb)
    q = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(P.cosine("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def sign_bucket(vec_col: str, bits: int = SIGN_BITS) -> F.Column:
    """LSH bucket id: sign bits of the first ``bits`` coordinates."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f" acc + case when element_at({vec_col}, i + 1) > 0"
        f"  then shiftleft(1L, i) else 0L end)"
    )


def topk_ann_ivf(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: coarse quantizer -> inverted cells -> probe the
    query's ``nprobe`` nearest cells only.

    Quantizer: the first ``n_cells`` corpus vectors serve as deterministic
    seed centroids (an IVF-flat layout; swapping in k-means-refined
    centroids changes only the `cells` frame, not the plan shape). Every
    vector is assigned to its max-cosine centroid (ties -> lowest cell
    id); a query scores n_cells centroids, probes nprobe cells, ranks
    candidates there. Probe cost ~ corpus * nprobe / n_cells.

    Scale: the assignment column is the storage partitioning key (write
    the corpus partitioned/bucketed by cell); probing is then partition
    pruning, and each query touches nprobe partitions of a 10^9-vector
    corpus. All ranking keys are rounded -> engine-deterministic (the
    dd/sim oracle convention).
    """
    vecs = _vecs(emb)
    cells = vecs.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    assign = _assign_cells(vecs, cells)
    q = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("probe_cos"), F.asc("cell")
    )
    probe = (
        q.crossJoin(F.broadcast(cells))
        .withColumn("probe_cos", F.round(P.cosine("qv", "cv"), 6))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(P.cosine("qv", "v"), 6).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _assign_cells(vecs: DataFrame, cells: DataFrame) -> DataFrame:
    """Nearest-centroid assignment by rounded cosine (ties -> lowest cell)."""
    w = Window.partitionBy("vec_id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    return (
        vecs.crossJoin(F.broadcast(cells))
        .withColumn("cell_cos", F.round(P.cosine("v", "cv"), 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cell")
    )


def refine_centroids(vecs: DataFrame, cells: DataFrame) -> DataFrame:
    """One Lloyd iteration: assign, then per-cell per-dimension mean.

    Means are DECIMAL-exact (sum cast to decimal(38,12), divide after the
    deterministic cast back to double) so the refined centroids are
    bit-identical across engines and partitionings — float means would
    differ in final ulps by summation order and flip boundary
    assignments downstream. Cells that capture no vectors disappear
    (consistent everywhere, since assignment itself is deterministic).
    """
    assign = _assign_cells(vecs, cells)
    pos = assign.select("cell", F.posexplode("v").alias("pos", "val"))
    cent = pos.groupBy("cell", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
            / F.count("*")
        ).alias("cv_e")
    )
    return (
        cent.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv_e"))).alias("pc"))
        .select("cell", F.expr("transform(pc, x -> x.cv_e)").alias("cv"))
    )


def topk_ann_ivf_kmeans(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    iterations: int = 1,
) -> DataFrame:
    """IVF with a k-means-refined quantizer: seed centroids (first
    n_cells vectors) -> ``iterations`` Lloyd iterations (refine_centroids)
    -> assign / probe / rank against the refined cells. Better-balanced
    cells than the raw-seed quantizer at identical plan shape.

    Each iteration is one shuffle over exploded dimensions and is
    materialized (localCheckpoint) before the next: the alternative is a
    lineage that stacks a full corpus pass per iteration and gets
    re-executed by both the assignment and the probe branch — at 10^9
    vectors that's iterations x 2 redundant corpus scans. Decimal-exact
    means keep every iteration bit-reproducible across engines and
    partitionings, so the whole index build is oracle-checkable at any
    iteration count."""
    vecs = _vecs(emb)
    seeds = vecs.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    cells = seeds
    for _ in range(iterations):
        # n_cells rows, but the lineage is a whole Lloyd pass over the
        # corpus; the next iteration, assignment, and probing all
        # reference it — materialize once per iteration.
        cells = refine_centroids(vecs, cells).localCheckpoint(eager=True)
    assign = _assign_cells(vecs, cells)
    q = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("probe_cos"), F.asc("cell")
    )
    probe = (
        q.crossJoin(F.broadcast(cells))
        .withColumn("probe_cos", F.round(P.cosine("qv", "cv"), 6))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        assign.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(P.cosine("qv", "v"), 6).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def topk_ann_signlsh(
    emb: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Approximate top-k: rank only within the query's sign-LSH bucket.

    The bucket equi-join replaces the cross join — at 10^9 vectors the
    probe set shrinks ~2^bits-fold; the bucket column is also the natural
    partitioning/bucketing key for the stored corpus, making the probe a
    co-located (shuffle-free) join after one `repartition(bucket)` write.
    """
    vecs = _vecs(emb).withColumn("bkt", sign_bucket("v"))
    q = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bkt").alias("qbkt"),
    )
    scored = (
        vecs.join(
            F.broadcast(q),
            (F.col("bkt") == F.col("qbkt")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(P.cosine("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


QUANT_SCHEMA = "vec_id bigint, n_dims bigint, scale9 double, codes_csv string"


def quantize_int8(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the storage
    path for vector corpora at scale: fp32 -> int8 codes + one fp scale
    per vector cuts embedding bytes 4x (the difference between a
    memory-resident and a disk-bound ANN index at 10^9+ vectors), with
    approximate distances computed on the codes and the scale folded in
    afterwards.

    scale = max|x| / 127; code = round_half_away_from_zero(x / scale)
    (explicit half-away rounding — numpy's default round is half-to-EVEN
    and silently diverges from SQL round on exact halves). Zero vectors
    quantize to all-zero codes. Runs in Arrow-batched mapInPandas on a
    2-column projection — map-only, no shuffle; codes serialize to CSV
    for the driver comparator (same convention as mm_features_resize).
    """
    from collections.abc import Iterator

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for vid, v in zip(pdf["vec_id"], pdf[vec_col]):
                a = np.asarray(v, dtype=np.float64)
                m = float(np.abs(a).max()) if a.size else 0.0
                scale = m / 127.0
                if scale == 0.0:
                    codes = np.zeros(a.size, dtype=np.int64)
                else:
                    codes = (
                        np.sign(a) * np.floor(np.abs(a) / scale + 0.5)
                    ).astype(np.int64)
                out.append(
                    (
                        int(vid),
                        int(a.size),
                        round(scale, 9),
                        ",".join(str(c) for c in codes),
                    )
                )
            yield pd.DataFrame(
                out, columns=["vec_id", "n_dims", "scale9", "codes_csv"]
            )

    return emb.select("vec_id", vec_col).mapInPandas(fn, QUANT_SCHEMA)
