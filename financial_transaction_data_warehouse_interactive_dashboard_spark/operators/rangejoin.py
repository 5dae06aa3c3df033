"""Bucketed interval-overlap join — the RANGE JOIN Spark lacks natively.

A join whose ON clause is pure inequalities (``a.start <= b.end AND
b.start <= a.end``) gives Catalyst no equi-key, so it plans
BroadcastNestedLoopJoin — quadratic, a scale-killer the moment neither
side broadcasts. Engines with native range joins (the classic IEJoin /
Databricks' range-join hint) solve this with value binning; this module
is that bin-and-conquer plan composed from DataFrame ops:

1. quantize time into fixed-width buckets and EXPLODE each interval to
   every bucket it covers (amplification = ceil(span / bucket) + 1,
   bounded by interval length — never by the other side's cardinality);
2. hash-join the two sides on the bucket (plus any extra equi-keys) —
   an ordinary shuffle equi-join, CartesianProduct-free by construction;
3. keep each qualifying pair EXACTLY ONCE: only where the joined bucket
   equals the first bucket BOTH intervals cover
   (``max(first_bucket_l, first_bucket_r)`` — overlapping closed
   intervals both cover the bucket containing ``max(start_l, start_r)``,
   so the rule is total and unambiguous);
4. apply the exact overlap predicate as a residual on the join output.

Bucket width is the one tuning knob: it trades explode amplification
(long intervals over narrow buckets) against per-bucket pair density
(many intervals per wide bucket). Pick it near the median interval
span. Skewed buckets (the global rush hour) split under AQE's skew
join; per-key range joins pass the key as an extra equi-key, which
shards the buckets per key before density matters.

Relation to operators/temporal.py: that module holds the POINT-probe
temporal joins (as-of backward/forward/nearest, and range_join_trailing
— a point probing its own fixed trailing window, where a right row
lives in exactly ONE bucket and a left row probes two). This module is
the INTERVAL x INTERVAL generalization those shapes cannot express:
both sides are variable-length intervals, either may span many buckets,
and a pair can meet in several — hence the explode on BOTH sides and
the exactly-once retention rule, which the fixed-window decomposition
never needs.

Reference analogue: none (beyond-reference operator; the task brief's
named custom-operator list — as-of join, range join — this closes the
interval-overlap slot; as-of lives in operators/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_buckets(
    df: DataFrame, start: str, end: str, bucket_seconds: int, pfx: str
) -> DataFrame:
    """Explode ``df`` to one row per covered time bucket.

    Bucket ids derive from floor(unix_seconds / width) of the CLOSED
    interval [start, end]. unix_timestamp truncates to whole seconds;
    with bucket widths >> 1s that can only widen coverage by one
    bucket at the start edge, which the exactly-once rule and the
    residual predicate both absorb (coverage may be a superset of the
    minimal one, correctness never depends on it being minimal).
    """
    b0 = F.floor(
        F.unix_timestamp(F.col(start)).cast("bigint") / bucket_seconds
    ).cast("bigint")
    b1 = F.floor(
        F.unix_timestamp(F.col(end)).cast("bigint") / bucket_seconds
    ).cast("bigint")
    return df.withColumn(f"_{pfx}b0", b0).withColumn(
        f"_{pfx}bk", F.explode(F.sequence(b0, b1))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 900,
    extra_on: Column | None = None,
) -> DataFrame:
    """All (left, right) pairs whose CLOSED intervals overlap
    (``l_start <= r_end AND r_start <= l_end``), each pair exactly once,
    via the bucketed plan above. Column names across the two frames must
    be disjoint (alias/rename before calling — the session self-join in
    plans/beyond_events.py shows the pattern). ``extra_on`` adds a
    predicate into the join condition so Catalyst can prune pairs before
    the residual (an equality lands in the hash key; an inequality rides
    as a join residual)."""
    lb = _with_buckets(left, l_start, l_end, bucket_seconds, "l")
    rb = _with_buckets(right, r_start, r_end, bucket_seconds, "r")
    cond = lb["_lbk"] == rb["_rbk"]
    if extra_on is not None:
        cond = cond & extra_on
    return (
        lb.join(rb, cond)
        # exactly-once: the first bucket both cover
        .filter(
            F.col("_lbk") == F.greatest(F.col("_lb0"), F.col("_rb0"))
        )
        # exact overlap residual (closed intervals)
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
        )
        .drop("_lb0", "_lbk", "_rb0", "_rbk")
    )
