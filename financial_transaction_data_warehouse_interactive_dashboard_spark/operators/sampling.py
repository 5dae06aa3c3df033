"""Deterministic sampling / dataset splitting for training pipelines.

Beyond-reference scope (the reference has no sampling at all). The core
principle: at 100 TB, reproducible sampling must be a PURE FUNCTION of
the row key, not of an RNG seed + partitioning — `df.sample` /
`sampleBy` draw per-partition random streams, so the selected set
changes with partition count, task retries, and engine version, which
silently breaks train/test hygiene (and can't be oracle-checked).
Hash-based assignment is stable under repartitioning, retries, engines,
and incremental arrival of new rows (a new row lands in a split without
moving any old row — the property random splits lack).

Built on the portable md5 hash (functions.portable), so every split is
bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

# Bucket space for split thresholds: fractions resolve to 1/10000ths.
SPLIT_BUCKETS = 10_000


def split_column(
    key_col: str, weights: dict[str, float], salt: str = ""
) -> Column:
    """Split label as a pure function of the key: md5-bucket the key into
    SPLIT_BUCKETS, carve the bucket space by cumulative weights (order =
    dict insertion order). ``salt`` derives independent splits from the
    same keys (e.g. per-epoch holdouts) — change the salt, get a fresh
    split, still deterministic.

    Weights must sum to 1.0 (validated); each boundary is an integer
    bucket count, so the realized fractions are exact multiples of
    1/SPLIT_BUCKETS.
    """
    _validate_weights(weights)
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    bucket = P.md5_long(key) % SPLIT_BUCKETS
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        bound = round(acc * SPLIT_BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def _validate_weights(weights: dict[str, float]) -> None:
    for name, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"split weight {name!r} must be in [0, 1], got {w}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")


def _sql_str(s: str) -> str:
    """SQL single-quoted string literal with quote doubling — Python
    repr() switches to double quotes when the value contains a single
    quote, which SQL parses as an identifier."""
    return "'" + s.replace("'", "''") + "'"


def sql_split_column(
    key_expr: str, weights: dict[str, float], salt: str = ""
) -> str:
    """DuckDB twin of :func:`split_column` (same md5 arithmetic, same
    cumulative integer bounds, same validation)."""
    _validate_weights(weights)
    bucket = (
        f"({P.sql_md5_long(f'{key_expr}::VARCHAR || {_sql_str(salt)}')}"
        f" % {SPLIT_BUCKETS})"
    )
    acc = 0.0
    arms = []
    for name, w in weights.items():
        acc += w
        arms.append(
            f"WHEN {bucket} < {round(acc * SPLIT_BUCKETS)}"
            f" THEN {_sql_str(name)}"
        )
    return "CASE " + " ".join(arms) + " END"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash — the
    repartition/retry/engine-stable replacement for ``df.sample``. The
    kept set is a fixed subset of the key space: running twice, on any
    cluster layout, keeps exactly the same rows."""
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    bound = round(fraction * SPLIT_BUCKETS)
    return df.filter(P.md5_long(key) % SPLIT_BUCKETS < bound)
