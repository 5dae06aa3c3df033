"""BOM-safe CSV ingest (SURVEY.md S1/S2; FIXTURES.md section A).

The reference's raw files are messy on purpose:

- account + symbols CSVs carry a UTF-8 BOM (EF BB BF) before the header and
  use ';' as the separator (etl.ipynb:7,13). pandas silently strips the BOM;
  Spark's CSV reader does not, so an inferred header would yield a corrupt
  first column name ('\\ufeffIDTransaction').
- every account row ends with a trailing ';', which materializes as an extra
  all-null column (pandas calls it 'Unnamed: 5'; the dead-code guard at
  etl.ipynb:10-11 never fires).

Strategy: declare explicit schemas, skip the header line entirely
(header=False + a positive filter against the header row is avoided by using
Spark's header option — the BOM only corrupts header *names*, which explicit
schemas ignore), and drop the trailing junk column on ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_semicolon_csv(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """S1: ';'-separated, headered, possibly BOM'd CSV with explicit schema.

    With an explicit schema Spark ignores the header *names* (it only skips
    the line), so the BOM never reaches a column name.
    """
    return (
        spark.read.schema(schema)
        .options(sep=";", header=True, encoding="UTF-8")
        .csv(path)
    )


def read_account_csv(spark: SparkSession, path: str) -> DataFrame:
    """The account-statement fact source: S1 + drop of the trailing-';'
    junk column (reference equivalent: survives until etl.ipynb:151)."""
    from .. import schemas

    return read_semicolon_csv(spark, path, schemas.ACCOUNT_STATEMENT).drop("_trailing")


def read_plain_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S2: ','-separated headered CSV with explicit schema."""
    return spark.read.schema(schema).options(header=True, encoding="UTF-8").csv(path)
