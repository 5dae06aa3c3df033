"""Semantic tests for the round-5 finance/curation batch (plans.finance +
the normalized/passage dedup operators) — cross-checks against independent
in-Python recomputation, beyond the DuckDB oracle sweep."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (
    REGISTRY,
)

from conftest import SF_SMOKE


def test_zscore_matches_bruteforce(spark, duck_smoke):
    """Flagged set and z values agree with a direct recomputation from the
    raw parquet (independent arithmetic path: python floats over exact
    per-customer sums)."""
    rows = duck_smoke.execute(
        """
        SELECT c_custkey, c_mktsegment,
               coalesce(s, 0)::DOUBLE
        FROM customer LEFT JOIN (
          SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
          FROM orders GROUP BY 1) ON c_custkey = o_custkey
        """
    ).fetchall()
    by_seg = defaultdict(list)
    for _, seg, s in rows:
        by_seg[seg].append(s)
    expect = {}
    for ck, seg, s in rows:
        xs = by_seg[seg]
        n = len(xs)
        mean = sum(xs) / n
        var = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        z = (s - mean) / math.sqrt(var)
        if abs(z) >= 2.5:
            expect[ck] = z
    got = {
        r["c_custkey"]: r["z"]
        for r in REGISTRY["a18_zscore_outliers"].spark(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for ck, z in expect.items():
        assert abs(got[ck] - z) < 1e-4, (ck, got[ck], z)


def test_benford_frequencies_sum(spark):
    out = REGISTRY["a19_benford_first_digit"].spark(spark, SF_SMOKE).collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    assert abs(sum(r["obs_freq"] for r in out) - 1.0) < 1e-5
    # Expected Benford column must itself be a distribution.
    assert abs(sum(r["exp_freq"] for r in out) - 1.0) < 1e-4
    for r in out:
        assert abs(r["abs_dev"] - abs(r["obs_freq"] - r["exp_freq"])) < 2e-6


def test_basket_pairs_shape(spark):
    out = REGISTRY["a20_basket_pair_lift"].spark(spark, SF_SMOKE).collect()
    assert 0 < len(out) <= 50
    lifts = [r["lift"] for r in out]
    assert lifts == sorted(lifts, reverse=True)
    for r in out:
        assert r["brand_a"] < r["brand_b"]
        assert r["pair_n"] >= 5
        assert 0 < r["support"] <= 1
        assert r["lift"] > 0


def test_gapfill_contiguous_and_carry(spark):
    out = (
        REGISTRY["w6_user_day_gapfill"].spark(spark, SF_SMOKE).collect()
    )
    assert out, "spine is empty"
    by_user = defaultdict(list)
    for r in out:
        by_user[r["user_id"]].append(r)
    saw_gap = False
    for rows in by_user.values():
        # Contiguous daily spine, cumulative count telescopes, LOCF holds
        # the last active day's total across zero days.
        carry = None
        cum = 0
        for i, r in enumerate(rows):
            if i:
                assert r["day"] == rows[i - 1]["day"] + timedelta(days=1)
            if r["n_events"] == 0:
                saw_gap = True
                assert r["day_total"] == 0.0
                assert r["carry_total"] == carry
            else:
                carry = r["carry_total"]
                assert abs(r["carry_total"] - r["day_total"]) < 1e-9
            cum += r["n_events"]
            assert r["cum_events"] == cum
        # First/last day of each user's spine is active by construction.
        assert rows[0]["n_events"] > 0 and rows[-1]["n_events"] > 0
    assert saw_gap, "fixture produced no gap days; spine untested"


def test_normalized_dedup_merges_planted_mutants(spark, duck_smoke):
    n_docs = duck_smoke.execute("SELECT count(*) FROM documents").fetchone()[0]
    out = REGISTRY["dd_normalized_dedup"].spark(spark, SF_SMOKE).collect()
    # Every group = {original, mutant}: the mutation (case, punctuation,
    # spacing) must vanish under normalization, and no two originals
    # collide (fixture corpus is exact-duplicate-free).
    assert len(out) == n_docs
    for r in out:
        assert r["doc_id"] < 1_000_000  # representative is the original
        assert r["n_copies"] == 2


def test_passage_dupes_matches_bruteforce(spark, duck_smoke):
    texts = dict(
        duck_smoke.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    pass_docs = defaultdict(set)
    per_doc = {}
    for did, text in texts.items():
        w = text.split(" ")
        ps = {" ".join(w[i : i + 16]) for i in range(len(w) - 15)}
        if ps:
            per_doc[did] = ps
            for p in ps:
                pass_docs[p].add(did)
    out = REGISTRY["dd_passage_dupes"].spark(spark, SF_SMOKE).collect()
    assert {r["doc_id"] for r in out} == set(per_doc)
    some_dup = False
    for r in out:
        ps = per_doc[r["doc_id"]]
        ndup = sum(1 for p in ps if len(pass_docs[p]) > 1)
        assert r["n_passages"] == len(ps)
        assert r["n_dup_passages"] == ndup
        some_dup = some_dup or ndup > 0
    assert some_dup, "no duplicated passages in fixture; operator untested"
