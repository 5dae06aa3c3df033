"""Skew-mitigation join: explicit key salting.

AQE's skew-join split (enabled in session.py) handles most skew by
splitting oversized shuffle partitions, but it only triggers on
sort-merge joins and after-the-fact partition sizes. Explicit salting is
the planned-ahead alternative when one hot key dominates (the classic
power-law user/product key at 100 TB):

- the BUILD side (small-ish, broadcast-able or not) is replicated S times,
  one copy per salt value;
- the PROBE side derives a deterministic salt from a high-entropy sibling
  column (NOT rand(): retries/speculative tasks must re-derive the same
  salt), spreading each hot key over S shuffle partitions;
- join on (key, salt) — same rows match, the hot key's work fans out S-way.

Equivalence to the plain join is pinned by tests/test_plan_quality.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_source: Column | str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe`` to ``build`` on ``key`` with an S-way salt.

    ``salt_source`` must be a probe-side column (or expression) with
    per-row entropy — an id, a timestamp — so the hot key's rows spread
    evenly. Deterministic: salt = pmod(xxhash64(salt_source), S).
    """
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(src), F.lit(num_salts)).cast("int")
    )
    salted_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted_probe.join(salted_build, [key, "_salt"], how).drop("_salt")
