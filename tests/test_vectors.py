"""Semantic checks for the embedding linear-algebra tier (plans.vectors).

Cross-engine parity lives in the auto-swept oracle test; these pin the
MATH against an independent numpy implementation at sf0.001 — the
scaled-integer plumbing must reproduce textbook covariance and the
exact signed-sum projection, not just agree with a same-shaped oracle.
"""

from __future__ import annotations

import numpy as np

from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (
    REGISTRY,
)
from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.vectors import (
    COV_DIMS,
    EMB_DIM,
    RP_K,
    rademacher_sign,
)
from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (
    load_table,
)

from conftest import SF_SMOKE


def _matrix(spark) -> tuple[np.ndarray, list[int]]:
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    # Mirror the queries' quantization: round each float32 component to
    # 6dp before any arithmetic.
    m = np.round(
        np.array([r["embedding"] for r in rows], dtype=np.float64), 6
    )
    return m, [r["vec_id"] for r in rows]


def test_covariance_matches_numpy(spark):
    m, _ = _matrix(spark)
    got = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in REGISTRY["sim_embedding_covariance"].spark(
            spark, SF_SMOKE
        ).collect()
    }
    assert len(got) == COV_DIMS * (COV_DIMS + 1) // 2
    ref = np.cov(m[:, :COV_DIMS], rowvar=False, bias=True)  # population
    for (i, j), cov in got.items():
        assert i <= j
        assert abs(cov - ref[i, j]) < 1e-5, (i, j, cov, ref[i, j])
    # Diagonal entries are variances: non-negative by construction.
    assert all(got[(i, i)] >= 0.0 for i in range(COV_DIMS))


def test_random_projection_matches_numpy(spark):
    m, ids = _matrix(spark)
    signs = np.array(
        [
            [rademacher_sign(i, j) for j in range(RP_K)]
            for i in range(EMB_DIM)
        ],
        dtype=np.float64,
    )
    ref = m @ signs  # (n, RP_K)
    rows = REGISTRY["sim_random_projection"].spark(spark, SF_SMOKE).collect()
    assert [r["vec_id"] for r in rows] == ids
    for r, want in zip(rows, ref):
        for j in range(RP_K):
            assert abs(r[f"p{j}"] - want[j]) < 1e-5


def test_rademacher_matrix_is_balanced():
    """md5-derived signs should be ~unbiased — a degenerate all-ones
    column would silently turn the projection into a plain sum."""
    for j in range(RP_K):
        col = sum(rademacher_sign(i, j) for i in range(EMB_DIM))
        assert abs(col) < EMB_DIM // 2
