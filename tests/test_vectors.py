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


def test_dot_dec12_overflow_envelope(spark):
    """_dot_dec12_sql accumulates in DECIMAL(32,12) (widened r17 per
    ADVICE r16). Pin the envelope: magnitudes far beyond any centered
    unit-scale embedding still fold exactly (no silent NULL), and the
    documented overflow-to-NULL boundary sits past 10^20 — so a future
    narrowing that re-introduces the (26,12) 10^14 cliff fails here."""
    from pyspark.sql import functions as F

    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.similarity import (
        _dot_dec12_sql,
    )

    def fold(vals):
        df = spark.range(1).select(
            F.array(*[F.lit(float(v)) for v in vals]).alias("a"),
            F.array(*[F.lit(float(v)) for v in vals]).alias("b"),
        )
        return df.select(F.expr(_dot_dec12_sql("a", "b")).alias("s")).first()["s"]

    # 1e6-per-coordinate vectors (1e12 per term, 6.4e13 total): 12 dp
    # exact, far beyond the |sum| < 1e6 envelope, well inside (32,12).
    assert fold([1e6] * 64) == 64 * 1e12
    # The old (26,12) accumulator overflowed here (sum 5.76e14 > 1e14).
    assert fold([3e6] * 64) == 64 * 9e12
    # Past the (32,12) boundary (terms 1e20 exceed 20 integer digits)
    # the fold fails LOUDLY (ArithmeticException from the decimal
    # overflow) or degrades to NULL depending on the cast path — either
    # way never a silently wrong number; pinned so the boundary moves
    # only deliberately.
    try:
        assert fold([1e10] * 64) is None
    except Exception as exc:  # noqa: BLE001 — loud overflow accepted
        assert "Arithmetic" in type(exc).__name__ or "DECIMAL" in str(exc)
