"""Misra-Gries heavy hitters — the two-pass frequent-items pattern for
100 TB streams of keys.

Beyond-reference scope. Exact top-frequency mining (`GROUP BY key`)
carries state proportional to the KEY DOMAIN — at 10^11 distinct
n-grams that shuffle is the job. The Misra-Gries summary carries k
counters per partition (k ~ 1/phi), and its union across partitions is
a GUARANTEED superset of every key with global share > 1/(k+1)
(pigeonhole: a key light in every partition sums to <= n/(k+1)
globally). So the scalable plan is:

  pass 1  mapInPandas Misra-Gries per partition  ->  <= k rows each
  pass 2  exact count of ONLY the candidate keys  ->  state bounded by
          |candidates| <= k x partitions, not by the key domain

and the final output is EXACTLY the true heavy-hitter set with exact
counts — the sketch bounds the state, not the accuracy. That exactness
is what makes the operator fully oracle-checkable (plans.beyond's
tx_heavy_collocations): DuckDB recomputes the same set from a plain
GROUP BY.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partial(keys: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``k`` (key, est)
    rows per partition, est <= true partition count. The generator
    closure holds the counter dict across that partition's Arrow
    batches — O(k) memory regardless of partition size. Batched
    decrement: after absorbing a batch, uniformly subtract the minimum
    counter until <= k survive (the standard batch generalization of
    one-at-a-time MG; it only ever UNDER-counts, preserving the
    guarantee)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            while len(counters) > k:
                m = min(counters.values())
                counters = {
                    key: c - m for key, c in counters.items() if c > m
                }
        if counters:
            yield pd.DataFrame(
                {key_col: list(counters), "est": list(counters.values())}
            )

    return keys.select(key_col).mapInPandas(run, schema=f"{key_col} string, est bigint")


def heavy_hitters(
    keys: DataFrame, key_col: str, phi: float, k: int | None = None
) -> DataFrame:
    """Keys with global share > ``phi``, with EXACT counts, via the
    two-pass sketch plan (module docstring). ``k`` defaults to
    ceil(1/phi) so the candidate union provably covers the answer set.

    Returns (key, n, share) — share rounded to 6dp — descending by n
    with the key as tie-break (total order)."""
    if not 0 < phi < 1:
        raise ValueError(f"phi must be in (0,1), got {phi}")
    k = k if k is not None else math.ceil(1.0 / phi)
    cand = mg_partial(keys, key_col, k).select(key_col).distinct()
    total = keys.agg(F.count("*").alias("_total"))
    return (
        keys.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") > phi * F.col("_total"))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("share"),
        )
        .orderBy(F.desc("n"), key_col)
    )


def equidepth_bins(
    df: DataFrame, col: str, k: int = 8, scale_safe: bool = False
) -> DataFrame:
    """Equi-depth histogram: (bin, n, n_distinct, lo, hi) over ``k`` bins
    of ~equal row count. Bin ids are floor(cum_excl * k / n) in
    ALL-INTEGER arithmetic (no float rank boundary), computed on the
    DISTINCT (value, count) frame so the prefix-sum window is bounded by
    the value domain, not the row count; ties never straddle bins. The
    single authoritative implementation behind ev_equidepth_histogram
    and the binning property test.

    ``scale_safe=True`` swaps the global prefix-sum window for
    operators.surrogate.two_phase_cumsum (per-partition cumsum + driver
    offset prefix-sum over exact bigints — bit-identical cum_excl,
    equivalence-tested) for value domains too large for one sort task."""
    from pyspark.sql.window import Window

    from .surrogate import resolve_scale_safe

    vc = df.groupBy(col).agg(F.count("*").alias("nv"))
    tot = vc.agg(F.sum("nv").cast("bigint").alias("ntot"))
    if resolve_scale_safe(vc, scale_safe):
        from .surrogate import two_phase_cumsum

        cum, _ = two_phase_cumsum(
            vc, [col], "nv", "cum_excl", exclusive=True
        )
        c = cum.select(
            F.col(col).alias("value"),
            "nv",
            F.col("cum_excl").cast("bigint").alias("cum_excl"),
        )
    else:
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        c = vc.select(
            F.col(col).alias("value"),
            "nv",
            F.coalesce(F.sum("nv").over(w), F.lit(0))
            .cast("bigint")
            .alias("cum_excl"),
        )
    b = c.crossJoin(F.broadcast(tot)).select(
        F.least(
            F.expr(f"(cum_excl * {k}) DIV ntot"),
            F.lit(k - 1).cast("bigint"),
        ).alias("bin"),
        "value",
        "nv",
    )
    return (
        b.groupBy("bin")
        .agg(
            F.sum("nv").cast("bigint").alias("n"),
            F.count("*").alias("n_distinct"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter — broadcastable join-prune sketch with an exact
# false-positive audit (the explicit form of the runtime bloom pruning
# Spark's AQE injects; here the bits are a first-class, oracle-checkable
# frame built from the portable md5 hash family).
# ---------------------------------------------------------------------------

from ..functions import portable as P  # noqa: E402  (module tail import)


def _bloom_positions(key_col: str, m: int, k: int) -> F.Column:
    """Array of the k bit positions for a key: md5_long(key || '|' || i)
    mod m — the same double-hash-free salted family the LSH minhashes
    use, bit-identical in DuckDB."""
    return F.array(
        *[
            P.md5_long(
                F.concat(F.col(key_col).cast("string"), F.lit(f"|{i}"))
            )
            % m
            for i in range(k)
        ]
    )


def bloom_bits(keys: DataFrame, key_col: str, m: int, k: int) -> DataFrame:
    """The filter itself: the DISTINCT set-bit positions (one-column
    ``bit`` frame, <= min(k*|keys|, m) rows) for the build-side key set.
    At scale this is the frame you broadcast to prune a probe side
    before its shuffle — k*|keys| longs, independent of build-row
    payload width."""
    return (
        keys.select(
            F.explode(_bloom_positions(key_col, m, k)).alias("bit")
        )
        .distinct()
    )


def bloom_candidates(
    probe: DataFrame, key_col: str, bits: DataFrame, m: int, k: int
) -> DataFrame:
    """Probe-side membership: keys whose EVERY bit position is set in
    ``bits`` (matched distinct positions == the key's own distinct
    position count — self-collisions of the k hashes are counted once
    on both sides, so a key colliding into 3 bits needs 3 matches, not
    4). Guarantees no false negatives; false positives are bounded by
    the (1 - e^(-k n / m))^k load curve and audited exactly by the
    wh_bloom_prune query."""
    # The probe-side explode + distinct (k md5s per key — the operator's
    # dominant cost) feeds BOTH the per-key position count and the bits
    # join; materialize it once (the module-wide
    # materialize-multi-branch-frames policy) instead of recomputing the
    # shuffle per branch.
    pb = (
        probe.select(
            F.col(key_col).alias("key"),
            F.explode(_bloom_positions(key_col, m, k)).alias("bit"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nb = pb.groupBy("key").agg(F.count("*").alias("nb"))
    matched = (
        pb.join(F.broadcast(bits), "bit")
        .groupBy("key")
        .agg(F.count("*").alias("nm"))
    )
    return (
        nb.join(matched, "key")
        .filter(F.col("nm") == F.col("nb"))
        .select("key")
    )
