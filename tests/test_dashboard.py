"""Dashboard facade: cached gold, parameterized widget queries, results
consistent with the registry's star-join queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.dashboard import (
    Dashboard,
)
from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (
    REGISTRY,
)

from conftest import SF_SMOKE


def test_dashboard_widget_queries(spark):
    d = Dashboard(spark, SF_SMOKE)
    try:
        # Gold is cached: the plan of a second query must hit the
        # InMemoryRelation, not re-scan parquet.
        plan = d.kpis()._jdf.queryExecution().toString()
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan

        # Unfiltered top-segments == the registry's a1 ordering by count.
        top = {r["segment"]: r["n"] for r in d.top_groups("segment", k=10).collect()}
        a1 = {
            r["segment"]: r["n"]
            for r in REGISTRY["a1_count_by_segment"].spark(spark, SF_SMOKE).collect()
        }
        assert top == a1

        # Widget filters compose: Q1-only matrix has only Q1 rows.
        q1 = d.quarter_matrix(quarters=(1, 1)).collect()
        assert q1 and all(r["quarter"] == "Q1" for r in q1)

        # Status filter: finished-only KPI equals a direct count.
        kpi = d.kpis(statuses=["F"]).collect()[0]
        direct = d.gold.filter(F.col("status") == "F").count()
        assert kpi["total"] == kpi["finished_tx"] == direct
    finally:
        d.close()
