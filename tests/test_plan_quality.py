"""Physical-plan regression tests: the scale posture is part of the
contract. A refactor that silently turns a broadcast star join into a
sort-merge join, or un-pushes a scan filter, would still pass value
checks — these tests pin the plan shape itself."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
    dense_ids,
)
from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (
    REGISTRY,
)
from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (
    load_table,
)

from conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


STAR_QUERIES = [
    "q1_top_segments",
    "j1_fact_build",
    "j3_gold_denorm",
    "o2_top5_types",
    "a12_star_measures",
]


@pytest.mark.parametrize("name", STAR_QUERIES)
def test_star_joins_broadcast(spark, name):
    """Every dim join must be a broadcast hash join — a sort-merge join
    here means a full fact shuffle per dimension at 100 TB."""
    plan = plan_of(REGISTRY[name].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark):
    """q1's status equality must land in the parquet scan's PushedFilters
    (row-group skipping), not a post-scan Filter only."""
    plan = plan_of(REGISTRY["q1_top_segments"].spark(spark, SF_SMOKE))
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "EqualTo(o_orderstatus,F)" in pushed


def test_column_pruning_reaches_scan(spark):
    """q1 touches 4 of orders' 9 columns; the scan schema must not read the
    rest (wide reads are the classic 100 TB scan mistake)."""
    plan = plan_of(REGISTRY["q1_top_segments"].spark(spark, SF_SMOKE))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    orders_schema = next(s for s in schemas if "o_orderstatus" in s)
    assert "o_totalprice" not in orders_schema
    assert "o_comment" not in orders_schema


def test_topk_uses_take_ordered(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    top-k + merge), never a global sort."""
    plan = plan_of(REGISTRY["q1_top_segments"].spark(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_salted_join_equals_plain_join(spark):
    """Salting must be a pure physical rewrite: same rows out, hot key's
    rows spread across multiple salt values."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.skew import (
        salted_join,
    )

    # 90%-skewed probe side: key 1 dominates.
    probe = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("row_id"),
    )
    build = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("attr")
    )
    plain = probe.join(build, "k").select("row_id", "attr")
    salted = salted_join(probe, build, "k", "row_id").select("row_id", "attr")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    spread = (
        probe.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("row_id"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert spread == 8, "hot key should spread across all salt values"


def test_salted_registry_query_plan_is_salted_shuffle(spark):
    """sk_salted_hot_join's physical plan must actually BE the skew
    mitigation it claims: a shuffled (non-broadcast) hash join whose join
    key includes the salt — broadcast would erase the shuffle, and a join
    on uid alone would put the hot key back on one task."""
    plan = plan_of(REGISTRY["sk_salted_hot_join"].spark(spark, SF_SMOKE))
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # The equi-join keys carry the salt column alongside the hot key.
    join_keys = re.search(r"Left keys \[2\]: \[([^\]]*)\]", plan)
    assert join_keys is not None
    assert "uid" in join_keys.group(1) and "_salt" in join_keys.group(1)


# Entries whose builder EXECUTES a job as its semantics (streaming
# runners, maintenance JOBs) — their final frame is a table read, so a
# plan audit of the returned frame would be vacuous; their plans are
# audited via their operators' own tests instead.
EAGER_ENTRIES = {
    "wh_gold_maintenance",
    "wh_incremental_rollup",
    "wh_time_travel",
    "wh_vacuum_retention",
    "wh_schema_evolution",
    "wh_compaction",  # r8: small-files compaction JOB; audit frame only
    "wh_ivfpq_publish",  # r9: publish-then-serve JOB; stored-read plan pinned below
}


def _is_eager(name: str) -> bool:
    return name.startswith("st_") or name in EAGER_ENTRIES


_PLAN_CACHE: dict[str, str] = {}


def _registry_plans(spark) -> dict[str, str]:
    """Formatted physical plan for every lazy registry entry, built once
    per test session (the registry-wide audits below share the pass)."""
    if not _PLAN_CACHE:
        for name, q in sorted(REGISTRY.items()):
            if _is_eager(name):
                continue
            _PLAN_CACHE[name] = plan_of(q.spark(spark, SF_SMOKE))
    return _PLAN_CACHE


def test_no_cartesian_product_in_registry(spark):
    """No registry query — driver-facing OR locally-pinned — may plan an
    unpartitioned CartesianProduct, the one join shape that cannot scale
    (every deliberate small-side cross join in the codebase is broadcast,
    which plans as BroadcastNestedLoopJoin with a 1-row/centroid side,
    never CartesianProduct). Widened from driver-only in r5: local
    entries are rotation candidates for the driver surface, so they meet
    the same bar."""
    offenders = [
        name
        for name, plan in _registry_plans(spark).items()
        if "CartesianProduct" in plan
    ]
    assert not offenders, offenders


def test_no_sort_merge_join_against_fixed_dims(spark):
    """region (5 rows) and nation (25 rows) are FIXED-SIZE at every
    scale factor — a SortMergeJoin touching either shuffles the big
    side across the cluster to meet a table that fits in a closure.
    Registry-wide invariant (audited clean in r7: the 12 entries that
    do plan SMJ are all fact-fact or self-join shapes, where SMJ is the
    right call at 100 TB): no entry's plan may contain a SortMergeJoin
    while also scanning region or nation. If a legitimate future entry
    trips the co-occurrence (an SMJ between facts beside a broadcast
    nation join in the same plan), split the check for it here with a
    comment — same classify-don't-ignore rule as the other closed
    inventories."""
    # Classified co-occurrences (the rule's own escape hatch): entries
    # whose SMJ is between DERIVED FACT-GRAIN frames while the fixed dim
    # rides a broadcast in the same plan — the SMJ never touches the dim.
    smj_is_fact_fact = {
        # grain (order x supplier) SMJ per_order counts — both sides are
        # lineitem-derived order-grain aggregates (the decorrelated
        # double-EXISTS), nation joins via broadcast; pinned separately
        # in test_tpch_q21_no_fact_self_join_and_reuse.
        "tpch_q21_waiting_suppliers",
    }
    offenders = [
        name
        for name, plan in _registry_plans(spark).items()
        if "SortMergeJoin" in plan
        and ("region.parquet" in plan or "nation.parquet" in plan)
        and name not in smj_is_fact_fact
    ]
    assert not offenders, offenders
    # The classified entries must still broadcast their dim joins.
    for name in smj_is_fact_fact:
        plan = _registry_plans(spark)[name]
        assert "BroadcastHashJoin" in plan, name


# The CLOSED inventory of registry entries whose default plan contains an
# unpartitioned (global) window, each with why that is acceptable at
# scale: either the windowed frame is PROVABLY BOUNDED (calendar days,
# quarters, a dim, or a LIMIT k head — growing the corpus does not grow
# the frame), or the site has a scale_safe two-phase escape (explicit
# flag + the spark.graft.scaleSafe.rowThreshold auto-knob). Any NEW entry
# that plans a global window must be added here with a justification or
# this audit fails — no single-partition sort funnel sneaks in unnoticed.
GLOBAL_WINDOW_ALLOWED: dict[str, str] = {
    # scale_safe-switched sites (two-phase path + conf auto-knob)
    "a16_rfm_segmentation": "scale_safe switch (three quintile windows)",
    "a17_pareto_customers": "scale_safe switch (cumulative share)",
    "a24_revenue_gini": "scale_safe switch (rank window)",
    "ev_equidepth_histogram": "scale_safe switch (prefix sum)",
    "qa_ks_two_sample": "scale_safe switch (two running counts)",
    "qa_mann_whitney": "scale_safe switch (running rank counts)",
    "w4_surrogate_keys": "W4 parity shape; dense_ids is the scale path",
    # provably bounded frames
    "ev_rolling_7d": "daily series (bounded by calendar days)",
    "ev_cumulative_uniques": "daily series",
    "ev_cusum_daily": "daily series",
    "ev_seasonal_decompose": "daily series",
    "w1_quarter_trend": "4-quarter series",
    "w5_rank_functions": "25-row nation dim",
    "a28_customer_kmeans": "LIMIT k seed head (k rows)",
    "a35_survival_km": "distinct churn-day steps",
    "qa_fdr_bh_segments": "5-row hypothesis frame (one per segment)",
    "qa_fdr_bh_spike_in": "20-row hypothesis frame (event_type x delta)",
    "qa_fdr_storey_spike_in": "same 20-row spike-in frame (_spike_in_r2)",
}


def test_global_window_inventory_is_closed(spark):
    """Every registry entry whose plan contains an unpartitioned window
    — ordered or order-less (count(*) OVER ()) — is in
    GLOBAL_WINDOW_ALLOWED (with a boundedness/scale_safe reason), and
    the allowlist carries no stale rows."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
        classify_windows,
    )

    found = {
        name
        for name, plan in _registry_plans(spark).items()
        if classify_windows(plan)[0] > 0
    }
    unexplained = found - set(GLOBAL_WINDOW_ALLOWED)
    stale = set(GLOBAL_WINDOW_ALLOWED) - found
    assert not unexplained, f"new global-window entries: {unexplained}"
    assert not stale, f"stale allowlist rows: {stale}"


def test_classify_windows_catches_orderless_global(spark):
    """The classifier's order-less blind spot is closed: count(*) OVER ()
    (no partition, no order — pure frame) counts as GLOBAL, a
    partitioned order-less window does not, and a comma-bearing sort
    expression (ORDER BY coalesce(a,b)) is still classified global."""
    from pyspark.sql.window import Window

    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
        classify_windows,
    )

    df = spark.range(0, 10).select(
        F.col("id"), (F.col("id") % 2).alias("k"), (F.col("id") % 3).alias("j")
    )
    orderless_global = df.select(
        F.count("*").over(Window.partitionBy()).alias("n")
    )
    assert classify_windows(plan_of(orderless_global)) == (1, 0)
    orderless_part = df.select(
        F.count("*").over(Window.partitionBy("k")).alias("n")
    )
    assert classify_windows(plan_of(orderless_part)) == (0, 1)
    comma_sort = df.select(
        F.row_number()
        .over(Window.orderBy(F.coalesce(F.col("k"), F.col("j"))))
        .alias("rn")
    )
    assert classify_windows(plan_of(comma_sort)) == (1, 0)
    part_and_sort = df.select(
        F.row_number().over(Window.partitionBy("k").orderBy("id")).alias("rn")
    )
    assert classify_windows(plan_of(part_and_sort)) == (0, 1)


def test_dense_ids_matches_global_row_number(spark):
    """Two-phase parallel id assignment == the single-partition row_number
    the reference semantics define (SURVEY.md W4), on a dim and on a
    larger shuffled range."""
    nation = load_table(spark, SF_SMOKE, "nation")
    got = {
        r["n_name"]: r["id"]
        for r in dense_ids(nation, "n_name", num_partitions=4).collect()
    }
    want = {
        r["n_name"]: i + 1
        for i, r in enumerate(nation.orderBy("n_name").collect())
    }
    assert got == want

    big = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 99991).alias("k")
    ).distinct()
    rows = dense_ids(big, "k", num_partitions=16).collect()
    ordered = sorted(r["k"] for r in rows)
    by_key = {r["k"]: r["id"] for r in rows}
    assert [by_key[k] for k in ordered] == list(range(1, len(ordered) + 1))


def test_ivf_cell_layout_prunes_partitions(spark):
    """The similarity.py IVF docstring promise, made real: with the corpus
    written cell-partitioned (sources.warehouse.write_ivf_layout), probing
    a cell subset must (a) carry the predicate as a PartitionFilter, and
    (b) actually read only the probed cells' files — nprobe/n_cells of
    the corpus."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.warehouse import (
        write_ivf_layout,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    write_ivf_layout(emb, "ivf_corpus_planq", n_cells=16)
    t = spark.table("ivf_corpus_planq")

    occupied = sorted(r["cell"] for r in t.select("cell").distinct().collect())
    assert len(occupied) >= 4, "quantizer should occupy several cells"
    probe_cells = occupied[:2]

    total_files = t.select(F.input_file_name()).distinct().count()
    probed = t.filter(F.col("cell").isin(*probe_cells))
    probed_files = probed.select(F.input_file_name()).distinct().count()

    plan = plan_of(probed)
    assert "PartitionFilters" in plan and "cell" in plan
    # One file per occupied cell (repartition-by-cell write): the probe
    # reads exactly the probed cells' files.
    assert total_files == len(occupied)
    assert probed_files == len(probe_cells)


def test_gold_quarter_partitioning_prunes(spark):
    """The warehouse gold path gets the same pruning proof as the IVF
    layout (r4 verdict ask #6): gold written partitioned by quarter (the
    reference dashboard's primary access pattern — streamlit.py:44-49
    filters the merged CSV by quarter in pandas, re-reading everything),
    then a quarter-filtered dashboard aggregate must (a) carry the
    quarter predicate as a PartitionFilter and (b) read only that
    quarter's files."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.warehouse import (
        write_partitioned,
    )

    gold = REGISTRY["j3_gold_denorm"].spark(spark, SF_SMOKE)
    # Repartition by the partition column first: one file per quarter,
    # not one per (write task x quarter) — same small-files posture as
    # write_ivf_layout.
    write_partitioned(gold.repartition("quarter"), "gold_quarter_planq", ["quarter"])
    t = spark.table("gold_quarter_planq")

    quarters = sorted(r["quarter"] for r in t.select("quarter").distinct().collect())
    assert len(quarters) == 4
    total_files = t.select(F.input_file_name()).distinct().count()
    assert total_files == len(quarters)

    dash = (
        t.filter(F.col("quarter") == quarters[0])
        .groupBy("segment")
        .agg(F.count("*").alias("n"))
    )
    plan = plan_of(dash)
    assert "PartitionFilters" in plan and "quarter" in plan
    files_read = (
        t.filter(F.col("quarter") == quarters[0])
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert files_read == 1


def test_ivf_dynamic_partition_pruning(spark):
    """When the probe set comes from a JOIN (centroid scoring) rather than
    a literal IN-list, Spark must insert dynamic partition pruning: the
    corpus scan's partition filter is fed at runtime from the broadcast
    probe side."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.warehouse import (
        write_ivf_layout,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    write_ivf_layout(emb, "ivf_corpus_dpp", n_cells=16)
    t = spark.table("ivf_corpus_dpp")

    # Probe side with a selective predicate (DPP's insertion condition) —
    # stands in for the centroid-scoring top-nprobe frame.
    probe = (
        spark.range(0, 16)
        .filter(F.col("id") % 8 == 3)
        .select(F.col("id").cast("bigint").alias("cell"))
    )
    joined = t.join(F.broadcast(probe), "cell")
    plan = plan_of(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_ivfpq_stored_probe_plans_dynamic_pruning(spark):
    """wh_ivfpq_publish's serve path: probing the PUBLISHED code table
    must plan dynamic partition pruning on cell (the probe set is a
    centroid-scoring join output, not a literal), and the layout must
    hold one file per occupied cell (the write_ivf_layout small-files
    discipline applied to the inverted file)."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (
        similarity as S,
    )
    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.warehouse import (
        publish_ivfpq_layout,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    publish_ivfpq_layout(emb, "ivfpq_planq")
    codes = spark.table("ivfpq_planq_codes")
    cells = spark.table("ivfpq_planq_centroids")

    # ADVICE r9: the stored partition column must read back with the
    # in-memory frames' exact dtype (bigint) — the stored==in-memory
    # claim must not ride implicit casts or inference config.
    _, _, inv_mem = S.build_ivfpq_index(emb)
    assert codes.schema["cell"].dataType == inv_mem.schema["cell"].dataType

    occupied = codes.select("cell").distinct().count()
    files = codes.select(F.input_file_name()).distinct().count()
    assert files == occupied, (files, occupied)

    # Mirror wh_ivfpq_publish's serve path exactly (defensive bigint
    # cast included): the cast must be a Catalyst no-op that leaves
    # dynamic partition pruning intact.
    served = S.ivfpq_query(
        emb,
        cells,
        spark.table("ivfpq_planq_codebooks"),
        codes.withColumn("cell", F.col("cell").cast("bigint")),
    )
    plan = plan_of(served)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "SortMergeJoin" not in plan


def test_ivfpq256_stored_probe_plans_dynamic_pruning(spark):
    """wh_ivfpq256_publish's serve path — the same three pins as the
    8-code layout, at the production codebook size: the stored
    partition column keeps the in-memory dtype, the layout holds one
    file per occupied cell, and probing the published 256-code table
    plans dynamic partition pruning (no SortMergeJoin on the serve)."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (
        similarity as S,
    )
    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.warehouse import (
        publish_ivfpq256_layout,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    publish_ivfpq256_layout(emb, "ivfpq256_planq")
    codes = spark.table("ivfpq256_planq_codes")
    cells = spark.table("ivfpq256_planq_centroids")

    inv_mem = S.build_ivfpq256_inv(emb, cells)
    assert codes.schema["cell"].dataType == inv_mem.schema["cell"].dataType

    occupied = codes.select("cell").distinct().count()
    files = codes.select(F.input_file_name()).distinct().count()
    assert files == occupied, (files, occupied)

    served = S.ivfpq256_query(
        emb,
        cells,
        spark.table("ivfpq256_planq_books"),
        codes.withColumn("cell", F.col("cell").cast("bigint")),
    )
    plan = plan_of(served)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "SortMergeJoin" not in plan


def test_aqe_splits_skewed_join(spark):
    """The OTHER skew defense (operators/skew.py salts deterministically
    at plan time; this pins the runtime one): with AQE skew-join
    thresholds scaled to fixture size, a sort-merge join against a
    hot-key side must come out of adaptive execution with its skewed
    partition SPLIT — the executed plan's SortMergeJoin is marked
    skew=true. Guards the conf posture: session AQE on + skewJoin on."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("pad_" * 8), F.col("id").cast("string")).alias("pl"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"),
            F.col("id").cast("string").alias("pr"),
        )
        joined = left.join(right, "k")
        # Execute THIS DataFrame's own query execution (a sink like the
        # noop writer builds a separate QE and the frame's own plan
        # would never finalize adaptively). 54,200 = 54,000 hot-key rows
        # + the 200 tail ids (9, 19, ..., 1999) under the right side's
        # key range.
        assert len(joined.collect()) == 54_200
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def plan_simple(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_scd2_history_single_key_shuffle(spark):
    """scd2_from_changes' docstring claim pinned: ONE hash exchange (the
    dimension key) — every window (collapse lag, version lead,
    row_number) must reuse that partitioning, never re-shuffle; the only
    other exchange is the entry's final presentation sort."""
    plan = plan_simple(REGISTRY["wh_scd2_history"].spark(spark, SF_SMOKE))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"Exchange rangepartitioning", plan)) == 1


def test_hybrid_rrf_broadcasts_small_sides(spark):
    """sim_hybrid_rrf: vocabulary-sized frames (document frequency, the
    1-row corpus count, the per-query term lists) must ride broadcast
    joins; a sort-merge join against the token stream would shuffle the
    whole inverted index per query batch. The ONE allowed SMJ is the
    full-outer rank-fusion join (both sides query-sample-bounded;
    Spark's BroadcastHashJoin cannot build full outer)."""
    plan = plan_of(REGISTRY["sim_hybrid_rrf"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 2  # tree + detail header once
    assert "CartesianProduct" not in plan


def test_retrieval_eval_family_has_no_smj(spark):
    """The retrieval-eval compositions (recall@k, NDCG@k, the IVFPQ
    capstone) join only query-sample-bounded frames (per-query
    aggregates, exact top-k frontiers) — every such join must broadcast
    (r9 audit: these were silently SortMergeJoining 8-to-40-row frames,
    paying 2-4 shuffles per entry)."""
    for name in ("sim_recall_at_k", "sim_ndcg_at_k", "sim_ann_ivf_pq"):
        plan = plan_of(REGISTRY[name].spark(spark, SF_SMOKE))
        assert "SortMergeJoin" not in plan, name


def test_ivf_pq_plan_broadcasts_index_sides(spark):
    """sim_ann_ivf_pq (the IVFPQ capstone): the centroid table, the PQ
    codebooks, the per-query ADC LUT, and the probe map are all tiny —
    every join in the query path must be a BroadcastHashJoin. A
    SortMergeJoin anywhere means an index-sized structure is being
    shuffled with the corpus-sized code table; at 10^9 vectors that is
    the difference between an ADC gather and a full re-shuffle."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (
        similarity as S,
    )

    plan = plan_of(
        S.topk_ann_ivf_pq(load_table(spark, SF_SMOKE, "embeddings"))
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_apply_is_map_only(spark):
    """tx_bpe_apply must stay a zero-shuffle codegen stage over the
    documents scan (the tx_pii_scrub discipline): no Exchange in the
    plan below the final sort, and the scan pruned to the two columns
    the tokenizer touches."""
    df = REGISTRY["tx_bpe_apply"].spark(spark, SF_SMOKE)
    plan = plan_of(df)
    # the ONLY exchange is the presentation orderBy's range partitioning
    # (formatted explain lists each operator once in the tree and once
    # in the details — count the detail headers)
    import re as _re

    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:800]
    assert "rangepartitioning" in plan
    assert "ReadSchema" in plan
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "text" in read and "doc_id" in read
    assert "lang" not in read and "source" not in read


def test_runtime_bloom_filter_injection(spark):
    """Runtime filtering, third leg of the skew/pruning story: when a
    selectively-filtered dim joins a big fact WITHOUT broadcast (the
    100 TB shuffle-join regime), Spark must inject a bloom filter —
    built from the dim's join keys, applied at the fact side BEFORE the
    shuffle — so non-matching fact rows die at the scan, not after the
    exchange. Thresholds are scaled to fixture size (application-side
    floor to 1 byte, creation-side ceiling up to 1GB); session posture
    must have the feature on."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        j = orders.join(cust, orders.o_custkey == cust.c_custkey)
        plan = plan_of(j)
        assert "bloom_filter_agg" in plan  # built over dim join keys
        assert "might_contain" in plan     # probed on the fact side
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# scale_safe two-phase rank wiring (VERDICT r5 ask #2): each former
# global-window site must produce IDENTICAL output in both modes, and the
# scale_safe plan must contain no unpartitioned window.
# ---------------------------------------------------------------------------

def _assert_no_global_window(df):
    """Every window in the executed plan must be partitioned: a global
    window (ordered OR order-less, e.g. count(*) OVER ()) plans an
    Exchange SinglePartition funnel. Classification is shared with the
    production audit entry via operators.surrogate.classify_windows."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
        classify_windows,
    )

    n_global, n_partitioned = classify_windows(plan_of(df))
    assert n_global + n_partitioned, (
        "expected at least one window in the scale_safe plan"
    )
    assert n_global == 0, f"{n_global} unpartitioned window(s) in plan"


def _rows_key(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize(
    "name",
    ["a24_revenue_gini", "a16_rfm_segmentation", "a17_pareto_customers",
     "ev_equidepth_histogram", "qa_ks_two_sample", "qa_mann_whitney"],
)
def test_scale_safe_mode_equivalence(spark, name):
    """scale_safe=True (two-phase partition-offset rank/cumsum) returns
    exactly the rows of the default single-partition-window mode."""
    q = REGISTRY[name]
    base = _rows_key(q.spark(spark, SF_SMOKE).collect())
    safe = _rows_key(q.spark(spark, SF_SMOKE, scale_safe=True).collect())
    assert safe == base


@pytest.mark.parametrize(
    "name",
    ["a24_revenue_gini", "a16_rfm_segmentation", "a17_pareto_customers",
     "ev_equidepth_histogram", "qa_ks_two_sample", "qa_mann_whitney"],
)
def test_scale_safe_plans_have_no_global_window(spark, name):
    _assert_no_global_window(REGISTRY[name].spark(spark, SF_SMOKE, scale_safe=True))


def test_scale_safe_conf_knob_flips_all_sites(spark):
    """VERDICT r6 ask #3: with spark.graft.scaleSafe.rowThreshold set,
    every former global-window site flips to the two-phase path
    AUTOMATICALLY — no caller flag — and none of their plans contain an
    unpartitioned window. Threshold 0 forces the flip for any non-empty
    windowed frame."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
        SCALE_SAFE_CONF,
    )

    names = [
        "a24_revenue_gini", "a16_rfm_segmentation", "a17_pareto_customers",
        "ev_equidepth_histogram", "qa_ks_two_sample", "qa_mann_whitney",
    ]
    spark.conf.set(SCALE_SAFE_CONF, "0")
    try:
        for name in names:
            _assert_no_global_window(REGISTRY[name].spark(spark, SF_SMOKE))
    finally:
        spark.conf.unset(SCALE_SAFE_CONF)
    # The ETL surrogate-key site honors the same knob: every dim built
    # with the conf set plans its ids through dense_ids (no global
    # window anywhere).
    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans import (
        etl as E,
    )

    from test_etl_golden import ACCOUNT, COUNTRY, SYMBOLS

    spark.conf.set(SCALE_SAFE_CONF, "0")
    try:
        account, symbols, _ = E.read_raw(spark, ACCOUNT, SYMBOLS, COUNTRY)
        acc = E.clean_account(account, symbols)
        sym = E.remap_country(symbols, spark)
        for dim in E.build_dims(acc, sym, spark):
            _assert_no_global_window(dim)
    finally:
        spark.conf.unset(SCALE_SAFE_CONF)
    # Unset (the default) keeps the oracle plan: the default-mode Gini
    # still has its global window.
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
        classify_windows,
    )

    plan = plan_of(REGISTRY["a24_revenue_gini"].spark(spark, SF_SMOKE))
    n_global, _ = classify_windows(plan)
    assert n_global, "expected the oracle-plan global window with the knob unset"


def test_scale_safe_threshold_semantics(spark):
    """The knob is a row-count threshold, probed with limit(N+1).count():
    frames at or under N rows stay on the default plan; above N flips."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
        SCALE_SAFE_CONF,
        resolve_scale_safe,
    )

    df = spark.range(0, 100)
    assert resolve_scale_safe(df, True) is True  # explicit flag always wins
    assert resolve_scale_safe(df, False) is False  # conf unset -> default
    spark.conf.set(SCALE_SAFE_CONF, "1000")
    try:
        assert resolve_scale_safe(df, False) is False  # 100 <= 1000
        spark.conf.set(SCALE_SAFE_CONF, "99")
        assert resolve_scale_safe(df, False) is True  # 100 > 99
        spark.conf.set(SCALE_SAFE_CONF, "-1")
        assert resolve_scale_safe(df, False) is False  # negative disables
        spark.conf.set(SCALE_SAFE_CONF, "not-a-number")
        with pytest.raises(ValueError, match=SCALE_SAFE_CONF):
            resolve_scale_safe(df, False)
    finally:
        spark.conf.unset(SCALE_SAFE_CONF)


def test_scale_safe_catalog_stats_fast_path(spark, monkeypatch, tmp_path):
    """VERDICT r7 ask #7: on a bare scan of an ANALYZEd catalog table,
    the knob reads the exact row count from Catalyst's stats and runs NO
    probe job at all — proven by poisoning DataFrame.limit, the probe's
    first call. Non-leaf frames (a filter on top) still fall back to the
    probe, because CBO rowCounts above a leaf are estimates."""
    from pyspark.sql import DataFrame as SparkDataFrame

    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
        SCALE_SAFE_CONF,
        _catalog_row_count,
        resolve_scale_safe,
    )

    spark.sql("DROP TABLE IF EXISTS scale_safe_stats_t")
    spark.range(0, 500).write.saveAsTable("scale_safe_stats_t")
    try:
        spark.sql("ANALYZE TABLE scale_safe_stats_t COMPUTE STATISTICS")
        df = spark.table("scale_safe_stats_t")
        assert _catalog_row_count(df) == 500
        # leaf + stats -> decided without the probe
        monkeypatch.setattr(
            SparkDataFrame,
            "limit",
            lambda self, n: (_ for _ in ()).throw(
                AssertionError("probe job ran despite catalog stats")
            ),
        )
        spark.conf.set(SCALE_SAFE_CONF, "499")
        try:
            assert resolve_scale_safe(df, False) is True  # 500 > 499
            spark.conf.set(SCALE_SAFE_CONF, "500")
            assert resolve_scale_safe(df, False) is False  # 500 <= 500
        finally:
            spark.conf.unset(SCALE_SAFE_CONF)
        monkeypatch.undo()
        # a filter on top is not a leaf: estimate refused, probe used
        filtered = df.where("id < 10")
        assert _catalog_row_count(filtered) is None
        spark.conf.set(SCALE_SAFE_CONF, "5")
        try:
            assert resolve_scale_safe(filtered, False) is True  # 10 > 5
        finally:
            spark.conf.unset(SCALE_SAFE_CONF)
    finally:
        spark.sql("DROP TABLE IF EXISTS scale_safe_stats_t")


def test_gini_scale_safe_driver_entry_audit(spark):
    """a24_revenue_gini_scale_safe's audit columns under local collect:
    zero unpartitioned windows, the two-phase rank window present, and
    the three value columns identical to the default-mode a24."""
    safe = REGISTRY["a24_revenue_gini_scale_safe"].spark(spark, SF_SMOKE)
    base = REGISTRY["a24_revenue_gini"].spark(spark, SF_SMOKE)
    [r] = safe.collect()
    assert r["n_global_windows"] == 0
    assert r["used_two_phase_rank"] == 1
    [b] = base.collect()
    for c in ("n_customers", "total_revenue", "gini"):
        assert r[c] == b[c]


def test_build_dims_scale_safe_equivalence(spark):
    """plans.etl.build_dims both modes: identical surrogate ids on every
    dim, and no unpartitioned window in the scale_safe dim plans."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans import (
        etl as E,
    )

    from test_etl_golden import ACCOUNT, COUNTRY, SYMBOLS

    account, symbols, _ = E.read_raw(spark, ACCOUNT, SYMBOLS, COUNTRY)
    acc = E.clean_account(account, symbols)
    sym = E.remap_country(symbols, spark)
    dims = E.build_dims(acc, sym, spark)
    dims_safe = E.build_dims(acc, sym, spark, scale_safe=True)
    for d, s in zip(dims, dims_safe):
        assert sorted(d.columns) == sorted(s.columns)
        cols = d.columns
        assert _rows_key(d.select(*cols).collect()) == _rows_key(
            s.select(*cols).collect()
        )
        _assert_no_global_window(s)


def test_chunking_is_map_only(spark):
    """tx_chunk_documents' map-only claim: the physical plan contains NO
    hash-partitioning exchange and no join — chunking a 100 TB corpus
    must be a single codegen pass (the only exchange allowed is the
    presentation orderBy's range partitioning)."""
    plan = plan_of(REGISTRY["tx_chunk_documents"].spark(spark, SF_SMOKE))
    assert "hashpartitioning" not in plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_new_r6_entries_no_cartesian(spark):
    """The r6 additions must plan without cartesian products or
    nested-loop joins (the range-join decomposition and broadcast-stat
    patterns, not theta joins)."""
    for name in (
        "ev_attribution_linear",
        "ev_winsorized_stats",
        "wh_cdc_apply",
        "a26_brand_communities",
        "a25_spearman_avg_rank",
    ):
        plan = plan_of(REGISTRY[name].spark(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_winsorized_stats_broadcasts_group_stats(spark):
    """The per-type percentile frame joins back to the fact via
    broadcast — the clip must not shuffle the event table."""
    plan = plan_of(REGISTRY["ev_winsorized_stats"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_two_phase_rank_edges(spark):
    """Edge cases of the two-phase machinery: empty input (offset map is
    empty — must not throw), duplicate order keys (ranks stay dense and
    total count right), and ntile with n < k (all rows in the padded
    head, no zero-size-bucket division)."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators.surrogate import (
        ntile_from_rank,
        two_phase_cumsum,
        two_phase_rank,
    )

    empty = spark.createDataFrame([], "k int, v long")
    out, total = two_phase_rank(empty, ["k"], "rk")
    assert total == 0 and out.count() == 0
    cout, ctotal = two_phase_cumsum(empty, ["k"], "v", "cum")
    assert ctotal == 0 and cout.count() == 0

    dup = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (1, 13), (2, 14)], ["k", "v"]
    )
    ranked, n = two_phase_rank(dup, ["k", "v"], "rk", num_partitions=3)
    rows = sorted((r["k"], r["v"], r["rk"]) for r in ranked.collect())
    assert n == 5
    assert [r[2] for r in rows] == [1, 2, 3, 4, 5]  # dense despite dups

    tiny = spark.range(1, 4).select(F.col("id").alias("rk"))  # n=3 < k=5
    got = sorted(
        r["b"] for r in tiny.select(
            ntile_from_rank(F.col("rk"), 3, 5).alias("b")
        ).collect()
    )
    want = sorted(
        r["nt"] for r in spark.range(1, 4).select(
            F.ntile(5).over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.orderBy("id")
            ).alias("nt")
        ).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# r6 statistical/vector tier: plan-shape pins
# ---------------------------------------------------------------------------


def test_chi_square_broadcasts_all_dimension_sides(spark):
    """Contingency chi-square: the customer dim and every tiny side frame
    (row/col totals, grand total, cardinalities) must broadcast — the
    only shuffle is the grouped count over the fact join."""
    plan = plan_of(
        REGISTRY["qa_chi_square_segment_status"].spark(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_random_projection_is_map_only(spark):
    """JL projection must fuse into the scan: no join anywhere, and the
    only Exchange is the final presentation orderBy."""
    plan = plan_of(REGISTRY["sim_random_projection"].spark(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # rangepartitioning for orderBy


def test_covariance_is_single_reduction(spark):
    """The 8x8 covariance block computes all 44 moments in ONE scalar
    aggregate over one scan — no join, no window."""
    plan = plan_of(
        REGISTRY["sim_embedding_covariance"].spark(spark, SF_SMOKE)
    )
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan


@pytest.mark.parametrize(
    "name", ["ev_autocorr_daily", "ev_ewma_daily", "ev_trend_regression"]
)
def test_time_series_queries_avoid_windows(spark, name):
    """The lag/kernel/regression series queries re-express their ordered
    semantics as equi-joins + grouped reductions: zero window functions,
    so nothing funnels through one partition at any series length."""
    plan = plan_of(REGISTRY[name].spark(spark, SF_SMOKE))
    assert "windowspecdefinition" not in plan
    assert "CartesianProduct" not in plan


def test_cohort_ltv_window_is_partitioned(spark):
    """The LTV running sum must be partitioned by cohort — a global
    cumsum over (cohort, age) would serialize all cohorts through one
    task."""
    df = REGISTRY["a29_cohort_ltv"].spark(spark, SF_SMOKE)
    plan = plan_of(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for spec in specs:
        head = spec.split(",")[0]
        assert " ASC" not in head and " DESC" not in head, spec


# ---------------------------------------------------------------------------
# TPC-H classic shapes: plan pins
# ---------------------------------------------------------------------------


def test_tpch_q1_pushes_shipdate_and_combines_mapside(spark):
    plan = plan_of(REGISTRY["tpch_q1_pricing_summary"].spark(spark, SF_SMOKE))
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "l_shipdate" in pushed
    # partial_ aggregates before the exchange = map-side combine.
    assert "partial_sum" in plan or "partial_count" in plan
    assert "Join" not in plan


def test_tpch_q3_broadcasts_dim_and_takes_ordered(spark):
    plan = plan_of(
        REGISTRY["tpch_q3_shipping_priority"].spark(spark, SF_SMOKE)
    )
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q5_broadcasts_entire_dimension_chain(spark):
    """Q5's only non-broadcast join may be orders-lineitem: customer,
    supplier, nation, region all ride broadcasts, so the plan carries at
    most one shuffle join."""
    plan = plan_of(
        REGISTRY["tpch_q5_local_supplier_volume"].spark(spark, SF_SMOKE)
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_new_r6_late_entries_plan_shapes(spark):
    """The late-r6 additions must plan without cartesian products, and
    the pair-finding/aggregation entries without nested-loop joins
    (everything is equi-join/blocked/broadcast by design). Entries
    whose deliberate broadcast cross joins of 1-row aggregates plan as
    BroadcastNestedLoopJoin (the sanctioned scalar-stat pattern) are
    checked for no-cartesian only."""
    equi_only = [
        "dd_segment_dedup",
        "dd_er_blocked_pairs",
        "dd_qgram_edit_join",
        "ev_peak_concurrency",
        "ev_wau_stickiness",
        "ev_forecast_backtest",
        "qa_wilson_ci",
        "a33_segment_skyline",
        "tx_span_corruption",
        "ev_time_to_convert",
    ]
    for name in equi_only:
        plan = plan_of(REGISTRY[name].spark(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    scalar_stat = ["ev_active_users_hll", "wh_incremental_join",
                   "tx_negative_sampling"]
    for name in scalar_stat:
        plan = plan_of(REGISTRY[name].spark(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name


def test_tpch_q4_semi_join_is_hashed_with_residual(spark):
    """Q4's EXISTS must plan as a LEFT SEMI **hash** join: the equi key
    (l_orderkey = o_orderkey) carries the join and the cross-table date
    comparison rides as a residual condition — never a nested-loop or
    cartesian evaluation of the mixed predicate, which would be
    quadratic at scale."""
    plan = plan_of(REGISTRY["tpch_q4_late_orders"].spark(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q16_anti_and_dim_joins_broadcast(spark):
    """Q16's NOT-IN exclusion must plan as a broadcast LEFT ANTI join
    (the blacklist is a filtered dim) and the part attachment as a
    broadcast hash join — lineitem, the only corpus-scaled input, must
    shuffle ONLY for the grouped COUNT(DISTINCT), not for either join."""
    plan = plan_of(REGISTRY["tpch_q16_supplier_cnt"].spark(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_cdc_stream_equals_batch(spark):
    """st_cdc_apply shares wh_cdc_apply's oracle because stream == batch
    is the checked contract (same base, same shared changelog, same
    last-wins fold). Assert the equality DIRECTLY: the streaming
    microbatch fold's audit rows must be identical to the batch twin's —
    a dropped, doubled, or out-of-order microbatch breaks this before it
    ever reaches the driver."""
    st_rows = sorted(
        map(tuple, REGISTRY["st_cdc_apply"].spark(spark, SF_SMOKE).collect())
    )
    wh_rows = sorted(
        map(tuple, REGISTRY["wh_cdc_apply"].spark(spark, SF_SMOKE).collect())
    )
    assert st_rows == wh_rows
    assert len(st_rows) == 3


def test_no_full_width_fact_scans_in_registry(spark):
    """Registry-wide column-pruning invariant (r8): no lazy entry's plan
    may scan EVERY column of a wide (>3-col) input table — a full-width
    read of orders/lineitem/events/documents at 100 TB pays IO for
    columns the query provably never touches. Audited clean across all
    166 lazy entries at introduction; any new entry tripping this either
    needs a .select() before its first shuffle or a justified allowlist
    entry here (none exist yet)."""
    import os

    import pyarrow.parquet as pq

    full = {}
    for t in ("orders", "lineitem", "events", "documents", "embeddings",
              "customer", "supplier", "part"):
        p = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(p):
            full[t] = len(pq.read_schema(p).names)
    # Justified full-width reads (the rule's own escape hatch): entries
    # whose OUTPUT CONTRACT covers the whole (broadcast-sized) dim row.
    fullwidth_allowed = {
        # Q2 emits s_acctbal/s_name and joins on s_suppkey/s_nationkey —
        # all four supplier columns are genuinely consumed, and supplier
        # is a broadcast dim (|suppliers|, never fact-sized IO).
        ("tpch_q2_min_cost_supplier", "supplier"),
    }
    offenders = {}
    for name, plan in _registry_plans(spark).items():
        hits = []
        for block in re.split(r"\(\d+\) Scan parquet", plan)[1:]:
            loc = re.search(r"/(\w+)\.parquet", block)
            rs = re.search(r"ReadSchema: struct<([^>]*)>", block)
            if not (loc and rs) or loc.group(1) not in full:
                continue
            tbl = loc.group(1)
            ncols = rs.group(1).count(":") if rs.group(1).strip() else 0
            if ncols >= full[tbl] > 3 and (name, tbl) not in fullwidth_allowed:
                hits.append((tbl, ncols, full[tbl]))
        if hits:
            offenders[name] = hits
    assert not offenders, (
        f"full-width scans of wide tables (entry -> (table, read, "
        f"total)): {offenders}"
    )


def test_bpe_arrow_path_plan_shape(spark):
    """tx_bpe_apply_arrow must keep the expression twin's distributed
    shape: one ArrowEvalPython-free mapInPandas stage over the pruned
    documents scan, NO shuffle except the presentation orderBy, and the
    scan pruned to (doc_id, text) exactly like the codegen path — the
    Arrow hop must not cost a repartition or widen the read."""
    import re as _re

    for name in ("tx_bpe_apply_arrow", "tx_bpe_apply64"):
        df = REGISTRY[name].spark(spark, SF_SMOKE)
        plan = plan_of(df)
        assert "MapInPandas" in plan, (name, plan[:800])
        assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1, (
            name, plan[:800],
        )
        assert "rangepartitioning" in plan
        read = plan[plan.index("ReadSchema"):].splitlines()[0]
        assert "text" in read and "doc_id" in read
        assert "lang" not in read and "source" not in read


# ---------------------------------------------------------------------------
# TPC-H suite completion (r16): plan pins for the remaining eleven
# ---------------------------------------------------------------------------


def _li_scans(plan: str) -> int:
    return len(re.findall(r"Location: InMemoryFileIndex[^\n]*lineitem", plan))


def test_tpch_q6_pure_scan_pushes_everything(spark):
    """Q6 is the pushdown query: the date window, the discount band
    (raw-double comparison — a DECIMAL cast here would block it), and
    the quantity cap must ALL reach the parquet scan, the sum must
    combine map-side, and no join may appear anywhere."""
    plan = plan_of(REGISTRY["tpch_q6_forecast_revenue"].spark(spark, SF_SMOKE))
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed and "GreaterThanOrEqual(l_discount" in pushed
    assert "LessThan(l_quantity" in pushed
    assert "partial_sum" in plan
    assert "Join" not in plan


def test_tpch_q10_top20_takes_ordered_with_pruned_orders(spark):
    """Q10's order-date window must prune orders BEFORE the lineitem
    join (pushed to the orders scan), the returnflag filter must reach
    the fact scan, dims must broadcast, and the page must come from
    TakeOrderedAndProject — never a global sort of the aggregate."""
    plan = plan_of(REGISTRY["tpch_q10_returned_items"].spark(spark, SF_SMOKE))
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "o_orderdate" in pushed and "EqualTo(l_returnflag,R)" in pushed
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_tpch_q12_residual_rides_hash_join(spark):
    """Q12's cross-table lateness predicate cannot push to either scan;
    it must evaluate on the equi-join's output (hash join + residual/
    post-filter), while the two-year shipdate window DOES push, and the
    CASE pivot combines map-side into 3 groups."""
    plan = plan_of(
        REGISTRY["tpch_q12_shipmode_priority"].spark(spark, SF_SMOKE)
    )
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "l_shipdate" in pushed
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_tpch_q13_keeps_outer_join_and_pushes_on_predicate(spark):
    """Q13's defining trap: the priority filter lives in the LEFT
    join's ON clause — the join must stay LeftOuter (zero-order
    customers land in the 0 bucket; a WHERE placement would plan
    Inner and drop them), while the filter itself still pushes to the
    orders scan."""
    plan = plan_of(
        REGISTRY["tpch_q13_customer_distribution"].spark(spark, SF_SMOKE)
    )
    assert "LeftOuter" in plan
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "o_orderpriority" in pushed and "Not(EqualTo" in pushed
    assert "CartesianProduct" not in plan


def test_tpch_q14_single_scan_conditional_share(spark):
    """Q14's two sums (promo CASE + unconditional) must come from ONE
    month-pruned lineitem scan in one grouped pass — the naive
    two-query formulation scans twice — with part broadcast."""
    plan = plan_of(REGISTRY["tpch_q14_promo_revenue"].spark(spark, SF_SMOKE))
    assert _li_scans(plan) == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "l_shipdate" in pushed


def test_tpch_q15_reuses_revenue_exchange_at_runtime(spark):
    """Q15 consumes the per-supplier revenue frame TWICE (join input +
    its own broadcast max). The grouped exchange must be computed once
    and REUSED — pinned on the EXECUTED AQE plan because static
    explain hides reuse under AdaptiveSparkPlan. The explicit
    isnotnull(l_suppkey) in the source filter is what keeps the two
    consumers' subtrees canonically identical (without it the join
    side's inferred null filter forks the scan — measured r16)."""
    df = REGISTRY["tpch_q15_top_supplier"].spark(spark, SF_SMOKE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 1
    plan = plan_of(df)
    assert "CartesianProduct" not in plan


def test_tpch_q19_derived_pushdown_and_single_join(spark):
    """Q19's three OR-brackets must evaluate in ONE scan+join: the
    implied brand-IN reaches the part scan as a pushed In(), the
    quantity-band disjunction pushes to the lineitem scan, and no
    union-of-three-scans or cartesian appears."""
    plan = plan_of(REGISTRY["tpch_q19_bracket_revenue"].spark(spark, SF_SMOKE))
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "In(p_brand" in pushed
    assert "l_quantity" in pushed and "Or(" in pushed
    assert _li_scans(plan) == 1
    assert "Union" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q2_decorrelated_min_all_broadcast(spark):
    """Q2's correlated MIN must decorrelate to aggregate-then-rejoin
    with every dimension and the per-part min frame riding broadcasts
    — the only shuffle is the offers groupBy; no cartesian, no
    sort-merge join at fixture scale."""
    plan = plan_of(
        REGISTRY["tpch_q2_min_cost_supplier"].spark(spark, SF_SMOKE)
    )
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_tpch_q11_reuses_value_frame_at_runtime(spark):
    """Q11 consumes the per-part value frame twice (grouped rows + its
    own 1-row total). Like Q15 the exchange must be REUSED at runtime,
    and the scalar total may arrive as the sanctioned 1-row
    BroadcastNestedLoopJoin — but never a CartesianProduct."""
    df = REGISTRY["tpch_q11_important_stock"].spark(spark, SF_SMOKE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 1
    assert "CartesianProduct" not in plan_of(df)


def test_tpch_q20_nested_in_semi_join_single_fact_pass(spark):
    """Q20's nested-IN chain must collapse to: one (partkey, suppkey)
    grouped pass over the fact with the conditional year sum computed
    IN the same aggregate (single lineitem scan), the part name class
    pushed as StringEndsWith, and the final membership as a LEFT SEMI
    join."""
    plan = plan_of(
        REGISTRY["tpch_q20_excess_stock_suppliers"].spark(spark, SF_SMOKE)
    )
    assert _li_scans(plan) == 1
    assert "LeftSemi" in plan
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "StringEndsWith(p_name,widget)" in pushed
    assert "CartesianProduct" not in plan


def test_tpch_q21_no_fact_self_join_and_reuse(spark):
    """Q21's double EXISTS/NOT-EXISTS must leave NO fact-fact
    self-join: the (order, supplier) grain is aggregated once and its
    exchange REUSED for the per-order counts (runtime pin), with the
    F-status filter pushed to the orders scan and no nested-loop
    anywhere."""
    df = REGISTRY["tpch_q21_waiting_suppliers"].spark(spark, SF_SMOKE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("ReusedExchange") >= 1
    plan = plan_of(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "EqualTo(o_orderstatus,F)" in pushed
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pin_barrier_survives_in_assign_cells(spark):
    """The `_pin` one-element explode (similarity.py) defeats
    CollapseProject by plan shape: the norm fold must reach the argmax
    transform as a plain ATTRIBUTE below a Generate barrier. A Catalyst
    change that collapses through single-element Generates would inline
    the fold into the lambda and re-evaluate it once per centroid
    (measured r16: sim_pca_deflate 17s) with no value check failing —
    this test fails loudly instead (VERDICT r16 ask #7 / ADVICE r16)."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (
        similarity as S,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    vecs = S._vecs(emb)
    cells = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    plan = plan_of(S._assign_cells(vecs, cells))
    # the barrier itself (formatted plans print the node name and its
    # explode argument on separate lines)
    assert re.search(r"\(\d+\) Generate", plan), (
        "pin Generate barrier collapsed away"
    )
    assert "explode(array(" in plan, "pin explode argument missing"
    # the argmax lambda must consume the pinned attribute, not an
    # inlined per-element copy of the norm fold
    argmax = [
        ln for ln in plan.splitlines() if "array_max(transform(" in ln
    ]
    assert argmax, "argmax projection missing from plan"
    for ln in argmax:
        assert "sqrt(" not in ln, (
            "norm fold inlined into the HOF lambda (re-evaluated per "
            "centroid): " + ln[:200]
        )


def test_pin_barrier_survives_in_nearest_cell_scored(spark):
    """Same guard for the monitor-shape helper (drift/retrain paths)."""
    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (
        similarity as S,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    vecs = S._vecs(emb)
    cells = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    plan = plan_of(S.nearest_cell_scored(vecs, cells, ["vec_id"]))
    assert re.search(r"\(\d+\) Generate", plan)
    assert "explode(array(" in plan
    argmax = [
        ln for ln in plan.splitlines() if "array_max(transform(" in ln
    ]
    assert argmax, "argmax projection missing from plan"
    for ln in argmax:
        assert "sqrt(" not in ln, (
            "norm fold inlined into the HOF lambda: " + ln[:200]
        )
