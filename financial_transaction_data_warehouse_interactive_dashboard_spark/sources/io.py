"""Format-generic table IO — the S2/S4 surface beyond CSV/parquet.

The reference reads CSV and writes CSV (etl.ipynb:7-210, streamlit.py:40);
this engine's sinks speak every columnar/row format Spark ships built-in,
through one helper pair so plans never hard-code a format. Format notes
that matter at 100 TB:

- parquet/orc: columnar, predicate pushdown + column pruning at the scan,
  splittable — the warehouse formats. orc carries the same pushdown
  machinery as parquet in Spark's DSv1 readers.
- json (lines): row format, schema-on-read REQUIRED for type fidelity
  (timestamps/doubles re-infer lossily otherwise); no pushdown. The
  interchange format, not the storage format.
- csv: header + explicit schema; see sources.csv for the dialect-aware
  ingest (BOM, `;` separators, trailing columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

# Spark's json/csv writers default to millisecond timestamp precision
# ([.SSS]) and silently truncate micros on write — full micro precision
# must be declared on BOTH sides of the round trip.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` at ``path`` in ``fmt``; partitioned when asked (hive
    layout — partition values prune at read time for parquet/orc)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; choose from {FORMATS}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt in ("json", "csv"):
        w = w.option("timestampFormat", _TS_FMT)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    """Read a table written by :func:`write_table`. For the self-describing
    columnar formats the schema comes from the footer; for json/csv pass
    the schema back in (type fidelity — and a declared schema also skips
    Spark's whole-file inference scan, which is an extra full read of the
    data at 100 TB)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; choose from {FORMATS}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"{fmt} read requires an explicit schema")
    if fmt in ("json", "csv"):
        r = r.option("timestampFormat", _TS_FMT)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(path)
