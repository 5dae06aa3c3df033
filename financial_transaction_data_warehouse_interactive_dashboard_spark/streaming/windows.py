"""Event-time window aggregations over the ``events`` table (batch form).

The reference has no time-series operators at all (SURVEY.md section 2.9 —
time is a quarter attribute, not an axis). These are the beyond-reference
event analytics, built batch-first on F.window/F.session_window (which
work on static DataFrames), then lifted unchanged to Structured Streaming
in streaming.stream (same expressions + withWatermark).

Money-safe sums: ``value`` is a double; sums cross the oracle boundary as
decimal-exact aggregates cast back to double (plans.queries.dsum logic)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dsum(col: str):
    return F.sum(F.col(col).cast("decimal(30,6)")).cast("double")


def tumbling(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Scale: one shuffle on (window, event_type); partial aggregation is
    map-side, so 100 TB of events reduces before the exchange. The window
    expression is a pure projection — no explode.
    """
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), _dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide
    windows; Spark expands via the window generator — row amplification
    x4 here, then map-side partial agg before the single shuffle)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), _dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. F.session_window merges adjacent events server-side —
    the shuffle key is user_id, state is per-user, skew handled by AQE.

    Output keeps (first_ts, last_ts) rather than the session_window end
    (which is last_ts + gap by definition — an implementation detail we
    don't want in the contract)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            _dsum("value").alias("total_value"),
        )
        .select("user_id", "first_ts", "last_ts", "n_events", "total_value")
    )
