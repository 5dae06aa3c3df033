"""In-memory table constructor (SURVEY.md S3).

Reference: etl.ipynb:92-95 builds a 3-row dim from Python lists.

``spark.createDataFrame`` routes tiny literal tables through a Python-RDD
with ``defaultParallelism`` partitions — on local[32] that is 32 Python
worker launches to produce 2 rows (measured: ~10 s). The JVM-side form is a
SQL ``VALUES`` relation: zero Python workers, constant-folded by Catalyst,
trivially broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def inline_table(
    spark: SparkSession, rows: list[tuple], columns: list[str]
) -> DataFrame:
    """Build a small literal DataFrame as a JVM-side VALUES relation."""
    if not rows:
        raise ValueError("inline_table needs at least one row")
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    cols = ", ".join(columns)
    return spark.sql(f"SELECT * FROM VALUES {values} AS t({cols})")
