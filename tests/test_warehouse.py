"""Storage-layout proofs: bucketed co-located joins plan with no Exchange;
partitioned tables prune partitions at the scan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from financial_transaction_data_warehouse_interactive_dashboard_spark.sources import (
    warehouse as WH,
)
from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (
    load_table,
)

from conftest import SF_SMOKE
from test_plan_quality import plan_of


def test_bucketed_join_is_exchange_free(spark):
    """orders and customer bucketed on the join key: the join must plan
    WITHOUT any shuffle Exchange — the 'pay the shuffle once at write
    time' contract that makes repeated star joins cheap at 100 TB."""
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    WH.write_bucketed(orders, "wh_orders", "o_custkey", 8, sort_col="o_custkey")
    WH.write_bucketed(customer, "wh_customer", "c_custkey", 8, sort_col="c_custkey")
    WH.analyze(spark, "wh_orders", ["o_custkey"])

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("wh_orders").join(
            spark.table("wh_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        # Cross-check the result is still correct.
        n_bucketed = joined.count()
        n_plain = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert n_bucketed == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partition_pruning(spark):
    """events partitioned by event_type: an equality filter must prune to
    one partition in the scan (PartitionFilters), not post-filter rows."""
    events = load_table(spark, SF_SMOKE, "events")
    WH.write_partitioned(events, "wh_events", ["event_type"])
    df = spark.table("wh_events").filter(F.col("event_type") == "click")
    plan = plan_of(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1)
    assert df.count() == events.filter(F.col("event_type") == "click").count()
