"""Slowly-changing-dimension (SCD type 2) versioning + point-in-time
lookup.

Beyond-reference scope, but squarely in the reference's identity: a
financial-transaction WAREHOUSE keeps dimension history (a customer's
segment/priority AS OF each transaction), while the reference pre-joins
only the current attribute values into its gold CSV (etl.ipynb:174-192),
silently rewriting history every refresh. SCD-2 is the canonical fix:
each attribute change closes the previous version row and opens a new
one with a [valid_from, valid_to) interval.

Scale design:
- ``scd2_from_changes``: pure window functions over (key, ts) — ONE
  shuffle on the dimension key, no joins, no iteration. Consecutive
  rows with unchanged attributes are collapsed before versioning so the
  history holds versions, not events.
- ``scd2_lookup``: reuses operators.temporal.asof_join (single-shuffle
  union + carry-forward window): the version valid at fact.ts is
  exactly the latest version with valid_from <= fact.ts, because
  version intervals partition each key's timeline. No interval
  (range) join, no nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .temporal import asof_join


def scd2_from_changes(
    changes: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    tie_break: str | None = None,
) -> DataFrame:
    """Compress a change log (one row per observation of a key's
    attributes) into SCD-2 version rows.

    Output: ``key, *attrs, valid_from, valid_to, version, is_current``
    with ``valid_to`` NULL on the open (current) version and ``version``
    numbered 1..n per key in time order. An observation whose attributes
    equal the previous observation's extends the current version instead
    of opening a new one (run-length collapse).

    ``tie_break``: secondary ordering column for observations sharing a
    timestamp (recommended whenever ts can tie — without it the kept
    row among ties is sort-order dependent).
    """
    order = [F.col(ts_col)] + (
        [F.col(tie_break)] if tie_break is not None else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    attr_struct: Column = F.struct(*[F.col(a) for a in attrs])
    changed = (
        # _seq: per-key observation order, unique given a tie_break —
        # the versioning windows below order by it rather than by
        # valid_from alone, so same-timestamp version openings stay
        # deterministic instead of tying in lead()/row_number().
        changes.withColumn("_seq", F.row_number().over(w))
        .withColumn("_prev", F.lag(attr_struct).over(w))
        # First observation (_prev NULL) always opens a version; NULL-safe
        # compare so NULL attribute values don't fake a change per row.
        .filter(~attr_struct.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    wv = Window.partitionBy(key).orderBy("_seq")
    return (
        changed.select(key, *attrs, F.col(ts_col).alias("valid_from"), "_seq")
        .withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn("version", F.row_number().over(wv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_seq")
    )


def scd2_lookup(
    fact: DataFrame,
    history: DataFrame,
    key: str,
    ts_col: str = "ts",
    prefix: str = "dim_",
) -> DataFrame:
    """Point-in-time enrichment: attach to each fact row the dimension
    version valid at its timestamp (NULL columns when the fact predates
    the key's first version).

    The history's ``valid_from`` plays the as-of timestamp; versions
    partition the timeline per key, so the backward as-of match IS the
    containing interval — the valid_to bound needs no second check by
    construction (and scd2_from_changes guarantees that construction).
    One shuffle, carried by the as-of union window."""
    h = history.select(
        F.col(key),
        F.col("valid_from").alias(ts_col),
        *[
            F.col(c)
            for c in history.columns
            if c not in (key, "valid_from", "is_current")
        ],
    )
    out = asof_join(fact, h, by=key, ts_col=ts_col, right_prefix=prefix)
    # The matched version's own valid_from comes back as `{prefix}{ts_col}`
    # (asof_join aliases the right ts); rename to its real meaning.
    return out.withColumnRenamed(f"{prefix}{ts_col}", f"{prefix}valid_from")


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
    tie_break: str | None = None,
) -> DataFrame:
    """CDC APPLY: fold an ordered changelog (op in {'I','U','D'}) into a
    base snapshot — the ingestion primitive between single-batch MERGE
    (sources.warehouse.upsert_*) and SCD-2 history (scd2_from_changes):
    Debezium/binlog-style feeds land as (key, seq, op, values) rows, and
    the warehouse applies the LATEST change per key, treating I and U
    uniformly as upserts and D as a tombstone.

    Output columns = base columns. ``changes`` must carry every base
    column plus ``seq_col``/``op_col`` (value columns may be NULL on
    'D' rows). Per key, the winning change is the max (seq, tie_break)
    row; pass ``tie_break`` whenever seq can tie within a key (without
    it the winner among equal seqs is sort-order dependent).

    Scale: one window shuffle on the changelog's key (the changelog is
    the DELTA — orders of magnitude under the base), one anti-join +
    union against the base keyed the same way; no iteration, no global
    window. Deletes never resurrect: a key whose latest op is 'D'
    drops even if earlier ops inserted it."""
    order = [F.col(seq_col).desc()] + (
        [F.col(tie_break).desc()] if tie_break is not None else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cols = base.columns
    kept = base.join(latest.select(key), key, "left_anti").select(*cols)
    upserted = latest.filter(F.col(op_col) != "D").select(*cols)
    return kept.unionAll(upserted)
