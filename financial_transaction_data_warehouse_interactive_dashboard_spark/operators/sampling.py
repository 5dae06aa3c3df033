"""Deterministic sampling / dataset splitting for training pipelines.

Beyond-reference scope (the reference has no sampling at all). The core
principle: at 100 TB, reproducible sampling must be a PURE FUNCTION of
the row key, not of an RNG seed + partitioning — `df.sample` /
`sampleBy` draw per-partition random streams, so the selected set
changes with partition count, task retries, and engine version, which
silently breaks train/test hygiene (and can't be oracle-checked).
Hash-based assignment is stable under repartitioning, retries, engines,
and incremental arrival of new rows (a new row lands in a split without
moving any old row — the property random splits lack).

Built on the portable md5 hash (functions.portable), so every split is
bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

# Bucket space for split thresholds: fractions resolve to 1/10000ths.
SPLIT_BUCKETS = 10_000


def split_column(
    key_col: str, weights: dict[str, float], salt: str = ""
) -> Column:
    """Split label as a pure function of the key: md5-bucket the key into
    SPLIT_BUCKETS, carve the bucket space by cumulative weights (order =
    dict insertion order). ``salt`` derives independent splits from the
    same keys (e.g. per-epoch holdouts) — change the salt, get a fresh
    split, still deterministic.

    Weights must sum to 1.0 (validated); each boundary is an integer
    bucket count, so the realized fractions are exact multiples of
    1/SPLIT_BUCKETS.
    """
    _validate_weights(weights)
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    bucket = P.md5_long(key) % SPLIT_BUCKETS
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        bound = round(acc * SPLIT_BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def _validate_weights(weights: dict[str, float]) -> None:
    for name, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"split weight {name!r} must be in [0, 1], got {w}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")


def _sql_str(s: str) -> str:
    """SQL single-quoted string literal with quote doubling — Python
    repr() switches to double quotes when the value contains a single
    quote, which SQL parses as an identifier."""
    return "'" + s.replace("'", "''") + "'"


def sql_split_column(
    key_expr: str, weights: dict[str, float], salt: str = ""
) -> str:
    """DuckDB twin of :func:`split_column` (same md5 arithmetic, same
    cumulative integer bounds, same validation)."""
    _validate_weights(weights)
    bucket = (
        f"({P.sql_md5_long(f'{key_expr}::VARCHAR || {_sql_str(salt)}')}"
        f" % {SPLIT_BUCKETS})"
    )
    acc = 0.0
    arms = []
    for name, w in weights.items():
        acc += w
        arms.append(
            f"WHEN {bucket} < {round(acc * SPLIT_BUCKETS)}"
            f" THEN {_sql_str(name)}"
        )
    return "CASE " + " ".join(arms) + " END"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash — the
    repartition/retry/engine-stable replacement for ``df.sample``. The
    kept set is a fixed subset of the key space: running twice, on any
    cluster layout, keeps exactly the same rows."""
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    bound = round(fraction * SPLIT_BUCKETS)
    return df.filter(P.md5_long(key) % SPLIT_BUCKETS < bound)


def stratified_topk(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows inside each
    stratum by their key hash (salted; ties broken by the key itself so
    the rank is total) and keep the first ``k``. The per-stratum QUOTA is
    what fraction-based sampling can't give you — per-language caps when
    balancing a training mix — and hash-rank keeps it a pure function of
    the keys: stable under repartitioning, retries, and data arrival
    (a new row only enters the sample by out-hashing the current rank-k
    row, never by reshuffling the RNG).

    One shuffle on ``strata_col``; per-stratum state is the running rank.
    Skewed strata degrade to sort cost (same class as any top-k)."""
    from pyspark.sql.window import Window

    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    w = Window.partitionBy(strata_col).orderBy(
        P.md5_long(key).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_topk(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly-k-per-stratum WEIGHTED sample without replacement —
    Efraimidis–Spirakis A-Res, the distributed-standard algorithm: each
    row draws a deterministic uniform u from its salted key hash and
    ranks by ln(u)/weight (equivalent to the classic u^(1/w) order);
    the top k per stratum are the sample. Inclusion probability is
    proportional to weight (k=1 reduces exactly to p_i = w_i / Σw), and
    selection stays a pure function of (key, salt): stable under
    repartitioning, retries, engines — `sampleBy` can't weight by a
    column at all, and RNG-based weighted sampling isn't reproducible.

    The rank key is rounded to 9 dp before ordering (ties then broken
    by the key column) so the order — and therefore the selected SET —
    is reproducible across engines' last-ulp ln() differences; the
    DuckDB twin (sql fragment in plans.beyond's tx_weighted_sample
    oracle) runs the identical arithmetic.

    Weights must be > 0 (ln(u)/w flips sign at w<0 and divides by zero
    at w=0; filter or clamp upstream). One shuffle on ``strata_col``,
    O(1) state per row — same cost class as stratified_topk."""
    from pyspark.sql.window import Window

    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    # u in (0, 1]: md5_long is 60-bit uniform in [0, 2^60).
    u = (P.md5_long(key).cast("double") + F.lit(1.0)) / F.lit(float(2**60))
    rank_key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    w = Window.partitionBy(strata_col).orderBy(
        rank_key.desc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def sql_weighted_rank_key(key_expr: str, weight_expr: str, salt: str = "") -> str:
    """DuckDB twin of weighted_topk's rank key (same hash, same u
    construction, same 9 dp rounding)."""
    h = P.sql_md5_long(f"{key_expr}::VARCHAR || {_sql_str(salt)}")
    return (
        f"round(ln(({h} + 1)::DOUBLE / {float(2**60):.0f}.0)"
        f" / ({weight_expr})::DOUBLE, 9)"
    )


def pack_offset_bins(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Sequence packing, offset-bin form: within each ``part_col`` group,
    lay the rows out in ``order_col`` order and assign each row the bin
    its STARTING offset falls in (bin = floor(preceding_total / budget)).
    This is the distributed-friendly packing rule: it needs only a window
    cumulative sum (one shuffle, O(1) state/row), whereas exact greedy
    first-fit ("close the bin when the next item would overflow") is a
    sequential decision chain with no parallel formulation. Offset bins
    can straddle a boundary by at most one row — the standard trade a
    training-data packer makes to stay scalable; rows larger than
    ``budget`` get a bin (their own offset's) rather than an error.

    Adds ``bin`` (0-based per group) and ``offset`` (preceding total)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(F.col(size_col).cast("bigint")).over(w)
    return df.withColumn("offset", total - F.col(size_col)).withColumn(
        "bin", F.floor(F.col("offset") / budget).cast("bigint")
    )
