"""Two-phase global ordering primitives that scale past one partition.

The reference assigns dim ids as range(1, n+1) after an ascending sort
(etl.ipynb:51-52,78-81,86-87,91-95). The direct Spark translation —
row_number() over a global Window.orderBy(key) — serializes the whole
table through ONE partition: correct and fine for dimension tables up to a
few million rows (plans.etl uses it by default), but wrong for a 100 TB
fact or a billion-row dimension.

The two-phase pattern replaces the single-partition funnel:

1. range-repartition + sort within partitions on the order columns (the
   only full shuffle, and it is a parallel one);
2. count rows per partition, collect the tiny per-partition histogram
   (numPartitions rows) to the driver, prefix-sum it into offsets;
3. rank = partition offset + row_number within the partition (a window
   PARTITIONED BY the physical partition id — every partition ranks in
   parallel; no single-partition funnel).

:func:`two_phase_rank` is the general global row_number;
:func:`two_phase_cumsum` is the same trick for running sums (offsets are
per-partition partial sums instead of counts — pass an exactly-summable
value column: integer or DECIMAL, never raw double, or cross-mode
bit-equality is lost); :func:`ntile_from_rank` converts a global rank into
Spark's exact ntile() bucket numbering with pure integer arithmetic;
:func:`dense_ids` is the original surrogate-key specialization.

Every global-window site in the plans (`a24_revenue_gini`,
`a16_rfm_segmentation`, `a17_pareto_customers`, `qa_ks_two_sample`,
`qa_mann_whitney`, `operators.sketch.equidepth_bins`,
`plans.etl.build_dims`) exposes ``scale_safe: bool = False``: the default
keeps the single-partition window (bit-identical to the DuckDB oracle
plans), ``True`` routes through these helpers — equivalence-tested
mode-vs-mode per site, with a plan assertion that no unpartitioned window
survives (tests/test_plan_quality.py).

Callers never need to know the flag exists: every site resolves its
effective mode through :func:`resolve_scale_safe`, which also honors the
session conf ``spark.graft.scaleSafe.rowThreshold``. Set the conf to an
integer N and any site whose windowed frame exceeds N rows flips to the
two-phase path automatically. The probe is ``limit(N+1).count()``: on a
raw scan the limit early-stops after N+1 rows; on the aggregated frames
these sites actually window (the limit cannot push below a blocking
aggregate) it costs one extra execution of the frame's pre-window plan —
still never a single-partition sort. The knob is the SAFETY NET for
mixed-scale callers; a pipeline that knows it runs at scale passes
``scale_safe=True`` explicitly and pays no probe at all. Unset (the
default) or negative disables auto-selection, keeping fixture-scale runs
on the oracle plans."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE_SAFE_CONF = "spark.graft.scaleSafe.rowThreshold"


def classify_windows(plan: str) -> tuple[int, int]:
    """(n_global, n_partitioned) windows in a formatted physical plan —
    the ONE classifier behind the a24_revenue_gini_scale_safe audit
    columns and every plan test (a copy in each consumer drifted; a
    miss here is a single-partition sort funnel shipping undetected).

    A ``windowspecdefinition(...)`` is PARTITIONED iff its first
    top-level argument is a partition column. The first argument is
    found by splitting at depth-0 commas (an ``ORDER BY coalesce(a,b)``
    sort spec contains commas inside parens); it is a sort spec if it
    carries ``ASC``/``DESC``, and the frame-only form (a GLOBAL window
    with neither partitioning nor ordering, e.g. ``count(*) OVER ()``)
    starts directly with ``specifiedwindowframe``."""
    n_global = n_partitioned = 0
    for m in re.finditer(r"windowspecdefinition\(", plan):
        start = m.end()
        depth, i = 1, start
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            elif plan[i] == "," and depth == 1:
                break
            i += 1
        head = plan[start:i]
        if head.startswith("specifiedwindowframe") or (
            " ASC" in head or " DESC" in head
        ):
            n_global += 1
        else:
            n_partitioned += 1
    return n_global, n_partitioned


def _catalog_row_count(df: DataFrame) -> int | None:
    """Exact row count from Catalyst's stats, WITHOUT running a job —
    defined when ``df`` is a bare scan of a catalog table carrying fresh
    ``ANALYZE TABLE ... COMPUTE STATISTICS`` row counts (VERDICT r7 ask
    #7). Restricted to LEAF optimized plans: above a filter/join, CBO
    rowCounts are estimates, and a safety knob must not flip plans on an
    estimate. Returns None whenever stats are absent or the plan is not
    a leaf — callers fall back to the probe."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.children().size() != 0:
            return None
        # Plan-level stats carry rowCount for intrinsically-sized leaves
        # (Range, LocalRelation) and, under CBO, analyzed relations.
        rc = plan.stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        # Without spark.sql.cbo.enabled, Catalyst keeps the analyzed
        # rowCount out of plan stats (sizeInBytes only) — read it
        # straight off the leaf's CatalogTable metadata instead.
        ct = plan.catalogTable()
        if ct.isDefined():
            st = ct.get().stats()
            if st.isDefined():
                rc = st.get().rowCount()
                if rc.isDefined():
                    return int(str(rc.get()))
    except Exception:  # py4j surface varies across versions; probe instead
        return None
    return None


def resolve_scale_safe(df: DataFrame, requested: bool = False) -> bool:
    """Effective scale_safe mode for a global-window site whose window
    runs over ``df``. ``requested=True`` (the explicit per-call flag)
    always wins and skips the probe; otherwise the session conf
    ``SCALE_SAFE_CONF`` is read and, when set to a non-negative integer
    N, the site goes two-phase iff ``df`` has more than N rows. The row
    count comes free from catalog stats when ``df`` is a bare scan of an
    ANALYZEd table (no job at all); otherwise it is probed with
    ``limit(N+1).count()``. On a raw frame the limit early-stops the
    scan; on an aggregated frame the probe executes the frame's plan
    once, so enabling the knob trades one extra pre-window pass for
    never hitting a single-partition sort."""
    if requested:
        return True
    try:
        raw = df.sparkSession.conf.get(SCALE_SAFE_CONF, None)
    except Exception:
        raw = None
    if raw is None or raw == "":
        return False
    try:
        threshold = int(raw)
    except ValueError as exc:
        raise ValueError(
            f"{SCALE_SAFE_CONF} must be an integer row threshold, "
            f"got {raw!r}"
        ) from exc
    if threshold < 0:
        return False
    exact = _catalog_row_count(df)
    if exact is not None:
        return exact > threshold
    return df.limit(threshold + 1).count() > threshold


def _cols(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def _ranged_with_pid(
    df: DataFrame, order_cols, num_partitions: int | None
) -> DataFrame:
    parts = (
        num_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    cols = _cols(order_cols)
    ranged = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    # Materialize ONCE: repartitionByRange draws its boundaries from a
    # random sample, so the histogram job and the ranking job below would
    # otherwise re-execute it with DIFFERENT partition boundaries and the
    # offsets would not match the pids (observed: correct on a 25-row dim,
    # silently wrong on 10k rows). localCheckpoint pins the partitioning;
    # storage is freed by the ContextCleaner when the plan is dropped.
    return ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )


def two_phase_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "_rk",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Global row_number() over ``order_cols`` without a single-partition
    window. ``order_cols`` may mix names and Column sort expressions
    (e.g. ``F.desc("x")``). Returns ``(df + rank_col, total_rows)`` —
    the total is free from the offset histogram, so callers needing
    COUNT(*) OVER () inline it as a literal instead of adding a second
    global window."""
    with_pid = _ranged_with_pid(df, order_cols, num_partitions)
    hist = with_pid.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    offsets, acc = {}, 0
    for row in sorted(hist, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_cnt"]
    # Empty input: create_map() with zero args is the VOID-typed map()
    # and map()[_pid] fails analysis — no row evaluates the offset on an
    # empty frame, so any typed literal stands in.
    off = (
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
            F.col("_pid")
        ]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_pid").orderBy(*_cols(order_cols))
    out = with_pid.withColumn(
        rank_col, (off + F.row_number().over(w)).cast("long")
    ).drop("_pid")
    return out, acc


def two_phase_cumsum(
    df: DataFrame,
    order_cols,
    value_col: str,
    cum_col: str = "_cum",
    exclusive: bool = False,
    num_partitions: int | None = None,
):
    """Global running sum of ``value_col`` in ``order_cols`` order without
    a single-partition window: per-partition window cumsum + driver
    prefix-sum of the numPartitions partial sums.

    ``value_col`` must be exactly summable (integral or DECIMAL): the
    driver-side offset addition reorders the reduction, which is only
    order-independent for exact types. Passing a raw double raises.
    Returns ``(df + cum_col, grand_total)`` (grand_total as a Python
    int/Decimal)."""
    dtype = dict(df.dtypes)[value_col]
    if dtype in ("double", "float"):
        raise ValueError(
            f"two_phase_cumsum needs an exactly-summable {value_col!r}; "
            f"cast the {dtype} to DECIMAL first (driver-side offset "
            "addition reorders the reduction)"
        )
    with_pid = _ranged_with_pid(df, order_cols, num_partitions)
    hist = with_pid.groupBy("_pid").agg(
        F.sum(value_col).alias("_s")
    ).collect()
    offsets, acc = {}, 0
    for row in sorted(hist, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_s"] if row["_s"] is not None else 0
    # Same empty-map guard as two_phase_rank.
    off = (
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
            F.col("_pid")
        ]
        if offsets
        else F.lit(0)
    )
    end = -1 if exclusive else 0
    w = (
        Window.partitionBy("_pid")
        .orderBy(*_cols(order_cols))
        .rowsBetween(Window.unboundedPreceding, end)
    )
    within = F.sum(value_col).over(w)
    if exclusive:
        within = F.coalesce(within, F.lit(0))
    out = with_pid.withColumn(cum_col, off + within).drop("_pid")
    return out, acc


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """Spark's exact ntile(k) bucket for a 1-based global ``rank`` over
    ``n`` rows, as pure integer arithmetic on driver-side literals:
    the first n % k buckets hold n DIV k + 1 rows, the rest n DIV k —
    bit-identical to the built-in window function, so the scale_safe
    RFM path hashes the same as the default."""
    base, pad = n // k, n % k
    threshold = pad * (base + 1)

    def idiv(num, d: int):
        # Exact integer division for longs: subtract the remainder so
        # the double division's quotient is an exact representable
        # integer (floor((a)/(d)) alone is correct to ~2^53 but this
        # removes the bound entirely).
        return ((num - num % d) / d).cast("long")

    first = idiv(rank - 1, base + 1) + 1
    if base == 0:
        # n < k: every row is in the padded head; the else-branch would
        # divide by zero.
        return first.cast("int")
    rest = F.lit(pad) + idiv(rank - threshold - 1, base) + 1
    return (
        F.when(rank <= threshold, first).otherwise(rest).cast("int")
    )


def dense_ids(
    df: DataFrame,
    key: str,
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign dense 1..n ids in ascending ``key`` order, in parallel.

    Ids are dense 1..n in natural-key order regardless of where the
    range partitioner draws its boundaries. Keys are assumed unique
    (true for every reference dim); with duplicates the ordering among
    equals follows the partition sort and ids remain dense."""
    out, _ = two_phase_rank(df, [key], id_col, num_partitions)
    return out
