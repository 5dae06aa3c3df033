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
) -> DataFrame:
    """Per-column table profile — (col_name, n, n_null, n_distinct,
    min_num, max_num, min_str, max_str), numeric and string/date columns
    typed into separate min/max slots (no lossy cross-type casts; dates
    profile as ISO strings, numeric bounds round to 6dp).

    Physical shape: ONE aggregate computes every per-column statistic,
    then stack() pivots to tidy rows. The COUNT(DISTINCT) battery makes
    Catalyst plan an expand (one input row fans out once per distinct
    aggregate) — a single shuffle whose width scales with the column
    count, which is the standard price of exact multi-column NDV; swap
    in approx_count_distinct when 2% error is acceptable at 100 TB.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    rows = []
    for c in num_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.round(F.min(c).cast("double"), 6).alias(f"_mn_{c}"),
            F.round(F.max(c).cast("double"), 6).alias(f"_mx_{c}"),
        ]
        rows.append(
            f"'{c}', _n, `_nn_{c}`, `_nd_{c}`, `_mn_{c}`, `_mx_{c}`, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in str_cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"_mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"_mx_{c}"),
        ]
        rows.append(
            f"'{c}', _n, `_nn_{c}`, `_nd_{c}`, "
            "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
            f"`_mn_{c}`, `_mx_{c}`"
        )
    if not rows:
        raise ValueError("no columns given")
    stacked = df.agg(*aggs).selectExpr(
        f"stack({len(rows)}, {', '.join(rows)}) as "
        "(col_name, n, n_null, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return stacked


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
        aggs = [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)
            for name, cond in row_checks
        ]
        one = df.agg(*aggs)
        stack = ", ".join(
            f"'{name}', `{name}`" for name, _ in row_checks
        )
        legs.append(
            one.selectExpr(
                f"stack({len(row_checks)}, {stack}) as (check_name, n_violations)"
            )
        )
    for name, key in unique_checks:
        legs.append(
            df.groupBy(key)
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
