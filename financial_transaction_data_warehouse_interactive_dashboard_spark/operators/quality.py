"""Declarative data-quality expectations — the constraint layer a
warehouse runs before publishing a table (dbt tests / AWS Deequ shape).

Beyond-reference scope (the reference validates nothing; its ETL drops
NA rows and trusts the rest — etl.ipynb:7-210). Design:

- each expectation compiles to ONE aggregate expression over the table
  (count of violating rows), so an arbitrary battery of checks runs as a
  SINGLE full scan with map-side partial aggregation — no per-check
  passes, no driver loop; at 100 TB the scan is the cost and it is paid
  once.
- referential checks (foreign key ⊆ dimension) are the exception: each
  needs an anti-join against its dimension — broadcast when the dim is
  small (always, for star schemas), one extra stage per referenced dim,
  not per check.
- output is a tidy report frame (check_name, n_violations, passed) — the
  shape a publish gate consumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _qcol(name: str) -> Column:
    """Column reference by EXACT name: backtick-quoted with embedded
    backticks doubled, so dots/quotes/backticks in a column name can't be
    misparsed as multi-part paths or break the attribute grammar."""
    return F.col("`" + name.replace("`", "``") + "`")


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def unique(col: str) -> tuple[str, str]:
    """Primary-key uniqueness; counted via a group-by (see expectations)."""
    return f"unique({col})", col


def in_range(col: str, lo=None, hi=None) -> tuple[str, Column]:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return f"in_range({col})", cond


def in_set(col: str, values: list) -> tuple[str, Column]:
    return f"in_set({col})", ~F.col(col).isin(values) & F.col(col).isNotNull()


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return (
        f"matches({col})",
        ~F.col(col).rlike(pattern) & F.col(col).isNotNull(),
    )


def profile(
    df: DataFrame,
    num_cols: list[str] = (),
    str_cols: list[str] = (),
    exact_ndv: bool = True,
) -> DataFrame:
    """Per-column table profile — (col_name, n, n_null, n_distinct,
    min_num, max_num, min_str, max_str), numeric and string/date columns
    typed into separate min/max slots (no lossy cross-type casts; dates
    profile as ISO strings, numeric bounds round to 6dp).

    Physical shape: ONE aggregate computes every per-column statistic,
    then an array-of-structs explode pivots the single row to tidy rows
    (typed Columns throughout — column names are never interpolated into
    SQL text, so quotes/backticks in names can't break the plan;
    intermediate slots are index-named). With ``exact_ndv=True`` the
    COUNT(DISTINCT) battery makes Catalyst plan an expand (one input row
    fans out once per distinct aggregate) — a single shuffle whose width
    scales with the column count, the standard price of exact
    multi-column NDV. ``exact_ndv=False`` swaps in
    ``approx_count_distinct`` (HLL++, ~2% relative error, default rsd):
    NO expand, plain one-pass partial aggregation — the 100 TB switch.
    """
    ndv = F.countDistinct if exact_ndv else F.approx_count_distinct
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    structs: list[Column] = []
    d_null = F.lit(None).cast("double")
    s_null = F.lit(None).cast("string")
    for i, c in enumerate(num_cols):
        aggs += [
            F.sum(_qcol(c).isNull().cast("int")).cast("bigint").alias(f"_nn_{i}"),
            ndv(_qcol(c)).alias(f"_nd_{i}"),
            F.round(F.min(_qcol(c)).cast("double"), 6).alias(f"_mn_{i}"),
            F.round(F.max(_qcol(c)).cast("double"), 6).alias(f"_mx_{i}"),
        ]
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n"),
                F.col(f"_nn_{i}").alias("n_null"),
                F.col(f"_nd_{i}").alias("n_distinct"),
                F.col(f"_mn_{i}").alias("min_num"),
                F.col(f"_mx_{i}").alias("max_num"),
                s_null.alias("min_str"),
                s_null.alias("max_str"),
            )
        )
    off = len(num_cols)
    for i, c in enumerate(str_cols):
        j = off + i
        aggs += [
            F.sum(_qcol(c).isNull().cast("int")).cast("bigint").alias(f"_nn_{j}"),
            ndv(_qcol(c)).alias(f"_nd_{j}"),
            F.min(_qcol(c).cast("string")).alias(f"_mn_{j}"),
            F.max(_qcol(c).cast("string")).alias(f"_mx_{j}"),
        ]
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n"),
                F.col(f"_nn_{j}").alias("n_null"),
                F.col(f"_nd_{j}").alias("n_distinct"),
                d_null.alias("min_num"),
                d_null.alias("max_num"),
                F.col(f"_mn_{j}").alias("min_str"),
                F.col(f"_mx_{j}").alias("max_str"),
            )
        )
    if not structs:
        raise ValueError("no columns given")
    return (
        df.agg(*aggs)
        .select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
    )


def expectations(
    df: DataFrame,
    row_checks: list[tuple[str, Column]] = (),
    unique_checks: list[tuple[str, str]] = (),
    fk_checks: list[tuple[str, DataFrame, str, str]] = (),
) -> DataFrame:
    """Run a battery of checks; returns (check_name, n_violations, passed).

    ``row_checks``: (name, violation_condition) pairs — folded into one
    aggregate over one scan. ``unique_checks``: (name, key_col) — one
    group-by each counting rows beyond the first per key.
    ``fk_checks``: (name, dim_df, fk_col, pk_col) — broadcast anti-join
    each, counting orphans (NULL FKs are not orphans; add not_null
    separately if required).
    """
    legs = []
    if row_checks:
        # Index-named slots + typed struct/explode pivot: check names are
        # only ever F.lit() literals, never interpolated into SQL text —
        # a quote or backtick in a check name cannot break the plan.
        aggs = [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"_chk_{i}")
            for i, (_, cond) in enumerate(row_checks)
        ]
        one = df.agg(*aggs)
        kvs = F.array(
            *[
                F.struct(
                    F.lit(name).alias("check_name"),
                    F.col(f"_chk_{i}").alias("n_violations"),
                )
                for i, (name, _) in enumerate(row_checks)
            ]
        )
        legs.append(one.select(F.explode(kvs).alias("kv")).select("kv.*"))
    for name, key in unique_checks:
        legs.append(
            df.groupBy(_qcol(key))
            .count()
            .agg(
                F.lit(name).alias("check_name"),
                F.sum(F.col("count") - 1).cast("bigint").alias("n_violations"),
            )
        )
    for name, dim, fk, pk in fk_checks:
        orphans = df.select(F.col(fk)).filter(F.col(fk).isNotNull()).join(
            F.broadcast(dim.select(F.col(pk).alias(fk))), fk, "left_anti"
        )
        legs.append(
            orphans.agg(
                F.lit(name).alias("check_name"),
                F.count("*").cast("bigint").alias("n_violations"),
            )
        )
    if not legs:
        raise ValueError("no checks given")
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "check_name",
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )


def observed_write(
    df: DataFrame,
    path: str,
    metrics: list[tuple[str, Column]],
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` while collecting quality metrics IN THE SAME PASS via
    Spark's ``observe`` API — the zero-extra-scan complement to
    :func:`expectations` (which spends a dedicated aggregate scan).
    ``metrics`` are (name, aggregate_expression) pairs evaluated by the
    executors as rows stream into the sink; the returned dict holds the
    observed values once the write action completes.

    At 100 TB this is the difference between auditing a load and paying
    for it twice: the ingest job itself emits row counts, null counts,
    and domain violations with no second read of the data. The test pins
    the contract — observed metrics equal an independent post-hoc audit
    of the written files."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[m.alias(n) for n, m in metrics])
    observed.write.mode("overwrite").format(fmt).save(path)
    return dict(obs.get)
