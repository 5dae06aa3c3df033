"""Parquet table registry over /root/testdata/sf*/ (TESTDATA.md).

Loads each driver-provided table with its verified schema and exposes both
DataFrame handles and SQL temp views, keeping the DataFrame and spark.sql
surfaces equivalent (SURVEY.md section 7.1 principle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import schemas


def ensure_nanos_conf(spark: SparkSession) -> None:
    """events.parquet stores TIMESTAMP(NANOS), which Spark rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is on. Our session factory
    sets it, but the driver contract runs under an EXTERNAL session — set
    the (runtime-settable) conf defensively before any events read."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table.

    Parquet carries its own schema; we do NOT force-cast here (that would
    defeat predicate pushdown on mismatched types). The declared schema in
    ``schemas.TESTDATA`` is the contract we assert in tests.
    """
    if name not in schemas.TESTDATA:
        raise KeyError(f"unknown testdata table {name!r}")
    if name == "events":
        ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as nanos-since-epoch long (legacy
        # nanosAsLong). Truncate to micros with integer division — the
        # same floor DuckDB applies when narrowing ns -> its us TIMESTAMP.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in schemas.TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (SQL surface) and return handles."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
