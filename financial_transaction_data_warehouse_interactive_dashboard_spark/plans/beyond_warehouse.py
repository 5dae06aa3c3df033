"""Warehouse-lifecycle-tier named queries (wh_*) — split from ``plans/beyond.py`` in round 8.

Pure mechanical move (VERDICT r7 ask #8): registry names, oracles, and
driver history are unchanged; ``plans.beyond`` still imports and
re-exports every entry, so existing import paths keep working. Shared
DuckDB fragments/helpers stay in ``plans.beyond`` and are imported from
there (it is mid-initialization at that point, but the shared block is
defined before the tier imports at its bottom run).
"""

from __future__ import annotations

from ..functions import portable as _P
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .beyond import (  # shared fragments/helpers
    BLOOM_K,
    BLOOM_M,
    BUCKET_N,
    _CDC_ORACLE,
    _FK_EDGES,
    _cdc_audit,
    _cdc_base,
    _cdc_changelog,
    _orphan_edge_sql,
    _sql_bloom_positions,
)
from .queries import _t, query




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
    driver=False,  # demoted r15 (rotation; driver-green, plans/rotation.py)
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
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
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
    driver=False,  # demoted r15 (rotation; driver-green, plans/rotation.py)
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
    driver=True,  # rotated IN r9 (first driver row; plans/rotation.py)
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
    driver=False,  # demoted r14 (rotation; driver-green, plans/rotation.py)
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




@query(
    "wh_cdc_apply",
    _CDC_ORACLE,
    # New r6 (locally pinned; future rotation candidate).
    driver=True,  # rotated IN r9 (first driver row; plans/rotation.py)
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
    driver=False,  # demoted r15 (rotation; driver-green, plans/rotation.py)
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


# ---------------------------------------------------------------------------
# wh_compaction: small-files compaction audit (file-level claims hashed)
# ---------------------------------------------------------------------------


@query(
    "wh_compaction",
    """
    WITH g AS (
      SELECT CAST(quarter(o_orderdate) AS INTEGER) AS q,
             count(*) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
               AS total_price
      FROM orders GROUP BY 1)
    SELECT q,
           CASE WHEN q IN (1, 2) THEN 8 ELSE 1 END AS files_before,
           1 AS files_after,
           CASE WHEN q IN (1, 2) THEN 1 ELSE 0 END AS compacted,
           CASE WHEN q IN (1, 2) THEN 0 ELSE 1 END AS files_untouched,
           n_rows, total_price
    FROM g ORDER BY q
    """,
    # New r8 (locally pinned; backlog — rotation candidate once the r9
    # queue clears).
    driver=True,  # rotated IN r9 (first driver row; plans/rotation.py)
)
def wh_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files COMPACTION under the oracle gate — the standing
    maintenance job of every incrementally-fed partitioned table
    (sources.warehouse.compact_partitions; operator-level invariants in
    tests/test_warehouse.py). Q1/Q2 of a quarter-partitioned gold are
    deliberately fragmented to exactly 8 files each (round-robin
    repartition(8) of the interleaved rows — deterministic for a fixed
    dataset), Q3/Q4 appended healthy as 1 file each; the compactor must
    then (a) pick EXACTLY the fragmented quarters from a file listing,
    (b) rewrite each victim to one file via dynamic partition overwrite,
    and (c) leave the healthy quarters' files untouched ON DISK.

    Every claim sits inside the driver-hashed output: files_before /
    files_after are measured physical file counts (the oracle hard-codes
    the contract 8/8/1/1 -> 1/1/1/1, the a24-style plan-shape-in-the-
    hash pattern), files_untouched compares the exact pre/post file path
    sets (a rewrite changes part-file names, so 1 proves the healthy
    partitions were not rewritten), and n_rows / total_price are
    re-aggregated FROM THE COMPACTED TABLE while the oracle computes
    them from raw orders — bit-equality proves the rewrite preserved
    every row and every cent. Beyond the reference's surface (its pandas
    layer has no storage tier); the operator itself is the 100 TB story:
    victims from a pure LISTING, reads pruned to victim partitions only,
    one output file per victim via hash repartition on the partition
    key."""
    import glob as _glob
    import os as _os

    from ..sources.inline import inline_table
    from ..sources.warehouse import compact_partitions, write_partitioned

    orders = _t(spark, sf_dir, "orders")
    gold = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.quarter("o_orderdate").alias("q"),
    )
    table = "wh_compact_gold"
    # Fragment Q1/Q2: round-robin repartition(8) interleaves both
    # quarters across all 8 tasks, so each quarter directory lands 8
    # part files. Healthy Q3/Q4 append as a single task -> 1 file each.
    write_partitioned(
        gold.filter(F.col("q").isin(1, 2)).repartition(8), table, ["q"]
    )
    (gold.filter(F.col("q").isin(3, 4)).coalesce(1)
     .write.mode("append").format("parquet").insertInto(table))

    wh_dir = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    def _files() -> dict[int, tuple[str, ...]]:
        out = {}
        for d in _glob.glob(f"{wh_dir}/{table}/q=*"):
            qv = int(_os.path.basename(d).split("=", 1)[1])
            out[qv] = tuple(
                sorted(_os.path.basename(f)
                       for f in _glob.glob(_os.path.join(d, "*.parquet")))
            )
        return out

    before = _files()
    victims = set(compact_partitions(spark, table, "q", min_files=2))
    after = _files()

    claims = inline_table(
        spark,
        [
            (
                qv,
                len(before[qv]),
                len(after[qv]),
                int(str(qv) in victims),
                int(before[qv] == after[qv]),
            )
            for qv in sorted(before)
        ],
        ["q", "files_before", "files_after", "compacted",
         "files_untouched"],
    )
    agg = (
        spark.table(table)
        .groupBy("q")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
    return (
        claims.join(agg, "q")
        .select("q", "files_before", "files_after", "compacted",
                "files_untouched", "n_rows", "total_price")
        .orderBy("q")
    )
