"""Semantic invariants for the statistical QA / drift tier (plans.drift).

Cross-engine value parity is pinned by tests/test_oracle_parity.py (the
auto-parameterized registry sweep); these tests pin the STATISTICS —
range bounds, internal consistency, and convexity properties that hold
for any input, so a future refactor that stays parity-consistent but
breaks the math (e.g. an un-normalized kernel) still fails loudly.
"""

from __future__ import annotations

from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (
    REGISTRY,
)

from conftest import SF_ORACLE, SF_SMOKE


def _one(spark, name, **kw):
    rows = REGISTRY[name].spark(spark, SF_SMOKE, **kw).collect()
    return rows


def test_chi_square_bounds(spark):
    (r,) = _one(spark, "qa_chi_square_segment_status")
    assert r["chi2"] >= 0.0
    assert 0.0 <= r["cramers_v"] <= 1.0
    # dof = (|segments| - 1) * (|statuses| - 1); the fixture has 5
    # segments and 3 statuses at every SF.
    assert r["dof"] == (5 - 1) * (3 - 1)
    assert r["n"] > 0


def test_psi_internal_consistency(spark):
    rows = _one(spark, "qa_psi_price_drift")
    # The literal bin grid emits all bins, even empty ones.
    assert [r["bin"] for r in rows] == list(range(10))
    totals = {r["psi_total"] for r in rows}
    assert len(totals) == 1
    (total,) = totals
    assert total >= 0.0  # PSI is a sum of (p-q)ln(p/q) >= 0 terms
    assert abs(sum(r["psi_term"] for r in rows) - total) < 1e-6
    # Every per-bin term of the smoothed PSI is individually >= 0.
    assert all(r["psi_term"] >= 0.0 for r in rows)


def test_ks_bounds(spark):
    (r,) = _one(spark, "qa_ks_two_sample")
    assert 0.0 <= r["ks_d"] <= 1.0
    assert r["n1"] > 0 and r["n2"] > 0


def test_autocorr_bounds(spark):
    (r,) = _one(spark, "ev_autocorr_daily")
    assert -1.0 <= r["autocorr_lag1"] <= 1.0
    assert r["n"] > 0


def test_ewma_is_convex_combination(spark):
    """Renormalized-kernel EWMA is a convex combination of the daily
    sums it covers, so every smoothed value lies inside the global
    [min, max] of the raw daily series."""
    from pyspark.sql import functions as F

    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (
        load_table,
    )

    rows = _one(spark, "ev_ewma_daily")
    assert rows, "expected at least one smoothed day"
    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round("value", 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("s")
        )
        .collect()
    )
    lo = min(r["s"] for r in daily) - 1e-6
    hi = max(r["s"] for r in daily) + 1e-6
    assert all(lo <= r["ewma"] <= hi for r in rows)
    # One smoothed row per observed day (inner join to present days).
    assert len(rows) == len(daily)


def test_trend_regression_bounds(spark):
    (r,) = _one(spark, "ev_trend_regression")
    assert r["n_days"] > 2
    assert 0.0 <= r["r2"] <= 1.0
    # The fitted line at the series' mean x passes through the mean y:
    # intercept + slope * mean_x == mean_y (OLS normal-equation identity).
    from pyspark.sql import functions as F

    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (
        load_table,
    )

    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double").alias("s"))
        .collect()
    )
    d0 = min(x["d"] for x in daily)
    mean_x = sum((x["d"] - d0).days for x in daily) / len(daily)
    mean_y = sum(x["s"] for x in daily) / len(daily)
    assert abs(r["intercept"] + r["slope"] * mean_x - mean_y) < 1e-2


def test_welch_t_matches_numpy(spark, duck_smoke):
    """t statistic and Welch df agree with a direct numpy recomputation
    from the raw parquet."""
    import numpy as np

    (r,) = _one(spark, "qa_welch_t")
    rows = duck_smoke.execute(
        """
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 2 END,
               o_totalprice
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        """
    ).fetchall()
    a = np.array([v for g, v in rows if g == 1])
    b = np.array([v for g, v in rows if g == 2])
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert r["n1"] == len(a) and r["n2"] == len(b)
    assert abs(r["t_stat"] - t) < 1e-4
    assert abs(r["welch_df"] - df) < 1e-2


def test_mann_whitney_invariants(spark):
    (r,) = _one(spark, "qa_mann_whitney")
    # U1 + U2 == n1 * n2 exactly (midranks preserve the identity).
    assert abs(r["u1"] + r["u2"] - r["n1"] * r["n2"]) < 1e-6
    assert 0 <= r["u1"] <= r["n1"] * r["n2"]


def test_cusum_closed_form_matches_recursion(spark):
    """The windowed closed form must equal the textbook recursion
    S_t = max(0, S_{t-1} + (x_t - mean)) replayed in python."""
    rows = _one(spark, "ev_cusum_daily")
    assert rows
    from pyspark.sql import functions as F

    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (
        load_table,
    )

    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double").alias("s"))
        .orderBy("d")
        .collect()
    )
    mean = sum(x["s"] for x in daily) / len(daily)
    s_t = 0.0
    for row, x in zip(rows, daily):
        assert row["day"] == x["d"]
        s_t = max(0.0, s_t + (x["s"] - mean))
        assert abs(row["cusum_pos"] - s_t) < 1e-3
        assert row["cusum_pos"] >= -1e-9
        assert row["cusum_pos"] >= row["cum_dev"] - 1e-9


def test_anova_matches_numpy(spark, duck_smoke):
    import numpy as np

    (r,) = _one(spark, "qa_anova_segments")
    rows = duck_smoke.execute(
        """
        SELECT c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    xs = [np.array(v) for v in groups.values()]
    allv = np.concatenate(xs)
    ssb = sum(len(x) * (x.mean() - allv.mean()) ** 2 for x in xs)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in xs)
    k, n = len(xs), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k"] == k and r["n"] == n
    assert r["df1"] == k - 1 and r["df2"] == n - k
    assert abs(r["f_stat"] - f) < 1e-3
    assert abs(r["eta_squared"] - ssb / (ssb + ssw)) < 1e-6
    assert 0.0 <= r["eta_squared"] <= 1.0


def test_seasonal_decompose_identity(spark):
    """observed == trend + seasonal + residual on every row, the
    seasonal component sums to ~0 over the 7 weekdays, and the trend is
    smoother (lower variance) than the observed series."""
    rows = _one(spark, "ev_seasonal_decompose")
    assert rows
    for r in rows:
        assert (
            abs(r["observed"] - (r["trend"] + r["seasonal"] + r["residual"]))
            < 1e-5
        ), r
    by_dow = {}
    for r in rows:
        by_dow[r["dow"]] = r["seasonal"]
    assert len(by_dow) == 7
    assert abs(sum(by_dow.values())) < 1e-4
    obs = [r["observed"] for r in rows]
    tr = [r["trend"] for r in rows]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    assert var(tr) < var(obs)


def test_wilson_ci_bounds_and_ordering(spark):
    rows = _one(spark, "qa_wilson_ci")
    assert rows
    for r in rows:
        assert 0.0 <= r["ci_lo"] <= r["p_hat"] <= r["ci_hi"] <= 1.0
        assert r["n_success"] <= r["n"]
        # Wilson never collapses to a point for 0 < p < 1
        if 0 < r["n_success"] < r["n"]:
            assert r["ci_lo"] < r["ci_hi"]


def test_forecast_backtest_metric_ranges(spark):
    rows = {r["model"]: r for r in _one(spark, "ev_forecast_backtest")}
    assert set(rows) == {"naive_1", "seasonal_7"}
    for r in rows.values():
        assert r["n_days"] > 0
        assert r["mae"] >= 0.0
        assert r["mape"] >= 0.0
        # sMAPE is bounded by 2 for positive series
        assert 0.0 <= r["smape"] <= 2.0
    # seasonal-naive pairs 6 fewer days than naive on a contiguous series
    assert rows["naive_1"]["n_days"] >= rows["seasonal_7"]["n_days"]


def test_higher_moments_hand_distribution(spark):
    """Moments on the fixture must satisfy the invariants: std > 0, and
    the exponential-shaped value distribution is right-skewed and
    leptokurtic for every event type."""
    rows = _one(spark, "qa_higher_moments")
    assert rows
    for r in rows:
        assert r["std_pop"] > 0
        assert r["skewness"] > 0  # right tail
        assert r["kurtosis_excess"] > 0  # heavier than normal


def test_phi_tail_matches_erfc(spark):
    """The Abramowitz-Stegun 26.2.17 polynomial behind qa_fdr_bh_segments
    must track the true normal tail 0.5*erfc(x/sqrt(2)) within its
    documented 7.5e-8 bound across the z range the entry can produce."""
    import math

    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.drift import (
        _phi_tail,
    )
    from pyspark.sql import functions as F

    xs = [0.0, 0.01, 0.5, 1.0, 1.96, 2.58, 4.0, 6.0]
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    got = {
        r["x"]: r["t"]
        for r in df.select("x", F.expr(_phi_tail("x")).alias("t")).collect()
    }
    for x in xs:
        want = 0.5 * math.erfc(x / math.sqrt(2))
        assert abs(got[x] - want) < 7.5e-8, (x, got[x], want)


def test_fdr_bh_step_up_is_self_consistent(spark):
    """The BH output must satisfy the step-up definition on its own
    columns: ranks are a permutation of 1..m ordered by p, thresholds
    are rank*q/m, and the rejected set is exactly ranks 1..k for
    k = max rank with p <= threshold (never a gap)."""
    rows = sorted(
        REGISTRY["qa_fdr_bh_segments"].spark(spark, SF_SMOKE).collect(),
        key=lambda r: r["bh_rank"],
    )
    m = len(rows)
    assert [r["bh_rank"] for r in rows] == list(range(1, m + 1))
    ps = [r["p6"] for r in rows]
    assert ps == sorted(ps)
    for r in rows:
        assert abs(r["bh_thr6"] - round(r["bh_rank"] * 0.1 / m, 6)) < 1e-9
        assert 0.0 <= r["p6"] <= 1.0
    passing = [r["bh_rank"] for r in rows if r["p6"] <= r["bh_thr6"]]
    k = max(passing, default=0)
    assert [r["bh_rank"] for r in rows if r["rejected"]] == list(
        range(1, k + 1)
    )


def test_fdr_bh_spike_in_separates_planted_tiers(spark):
    """The spike-in family's whole point (VERDICT r9 ask #6): the BH
    step-up must genuinely SEPARATE at the driver's correctness scale —
    every planted 48-cent shift rejected, every true-null (delta=0)
    hypothesis retained, and 0 < rejected < m so both branches of the
    threshold are exercised. Plus the same self-consistency contract as
    qa_fdr_bh_segments: the rejected set is exactly ranks 1..k."""
    rows = sorted(
        REGISTRY["qa_fdr_bh_spike_in"].spark(spark, SF_ORACLE).collect(),
        key=lambda r: r["bh_rank"],
    )
    m = len(rows)
    assert m == 20  # 5 event types x 4 planted deltas
    assert [r["bh_rank"] for r in rows] == list(range(1, m + 1))
    rejected = [r for r in rows if r["rejected"]]
    assert 0 < len(rejected) < m
    by_delta = {}
    for r in rows:
        by_delta.setdefault(r["delta_cents"], []).append(r["rejected"])
    assert all(by_delta[4800])  # every big spike caught
    assert not any(by_delta[0])  # no true null rejected at sf0.01
    passing = [r["bh_rank"] for r in rows if r["p6"] <= r["bh_thr6"]]
    k = max(passing, default=0)
    assert [r["bh_rank"] for r in rows if r["rejected"]] == list(
        range(1, k + 1)
    )
