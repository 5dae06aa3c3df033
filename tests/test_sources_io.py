"""Format-generic IO round-trips (sources.io): every built-in format must
preserve the events table — schema and values — through write + read.
Parquet/orc are self-describing; json/csv re-read with the declared
schema (type fidelity is the point of the schema parameter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_transaction_data_warehouse_interactive_dashboard_spark.sources import io as IO
from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (
    load_table,
)

from conftest import SF_SMOKE


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_events_roundtrip(spark, tmp_path, fmt):
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / f"events_{fmt}")
    IO.write_table(ev, path, fmt=fmt)
    back = IO.read_table(spark, path, fmt=fmt, schema=ev.schema)
    assert back.schema == ev.schema
    key = lambda r: r["event_id"]  # noqa: E731
    assert sorted(map(tuple, back.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, ev.collect()), key=lambda t: t[0]
    )


def test_csv_roundtrip_scalar_columns(spark, tmp_path):
    """CSV cannot carry the JSON props column faithfully (embedded commas
    and quotes survive, but null-vs-empty-string does not round-trip in
    Spark's csv writer) — round-trip the scalar projection, which is the
    shape a CSV export actually uses."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "events_csv")
    IO.write_table(ev, path, fmt="csv")
    back = IO.read_table(spark, path, fmt="csv", schema=ev.schema)
    assert back.schema == ev.schema
    assert sorted(map(tuple, back.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, ev.collect()), key=lambda t: t[0]
    )


def test_partitioned_write_prunes(spark, tmp_path):
    """Partitioned orc write + a partition-value filter must read only the
    matching partition directories (file-level pruning proof, same method
    as the warehouse tests)."""
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_part")
    IO.write_table(ev, path, fmt="orc", partition_by=["event_type"])
    one = IO.read_table(spark, path, fmt="orc").filter(
        F.col("event_type") == "purchase"
    )
    files = [
        f.filePath
        for f in one.select(F.input_file_name().alias("filePath"))
        .distinct()
        .collect()
        for f in [f]
    ]
    assert files and all("event_type=purchase" in p for p in files)
    n_all = IO.read_table(spark, path, fmt="orc").count()
    assert n_all == ev.count()


def test_unknown_format_rejected(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError):
        IO.write_table(ev, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError):
        IO.read_table(spark, str(tmp_path / "x"), fmt="json")  # no schema
