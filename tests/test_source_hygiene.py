"""Source-level scale-hygiene audits — codifying as tests what previous
rounds' reviews verified by hand (VERDICT r6 'LLM-data-pipeline
operators' preamble):

1. ZERO row-at-a-time Python in the engine: no `F.udf`/`@udf` and no
   `.rdd` escape hatch anywhere; Python crosses the JVM boundary only
   through Arrow-batched mapInPandas / applyInPandas /
   applyInPandasWithState.
2. `.collect()` appears only at the AUDITED bounded-frame sites (the
   per-partition offset histograms, dim/distinct-partition lists, and
   microbatch partition lists). A collect on a corpus-scaled frame is a
   driver OOM at 100 TB; any new site must be reviewed and added to the
   allowlist here.
"""

from __future__ import annotations

import os
import re

PKG = "financial_transaction_data_warehouse_interactive_dashboard_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _source_files():
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def test_no_row_at_a_time_python():
    """No F.udf / @udf / @F.udf / .rdd in engine source (Arrow-batched
    pandas interop only)."""
    pat = re.compile(r"F\.udf\(|@udf\b|@F\.udf\b|\.rdd\b")
    offenders = []
    for path in _source_files():
        for i, line in enumerate(open(path), 1):
            if pat.search(line):
                offenders.append(f"{os.path.relpath(path, REPO)}:{i}")
    assert not offenders, offenders


# Audited .collect() sites: file -> expected count of bounded-frame
# collects. surrogate.py: the two per-partition offset histograms
# (numPartitions rows). beyond.py: partition-histogram / dim /
# distinct-partition frames. warehouse.py: snapshot manifests /
# partition lists. stream.py: microbatch partition lists. Counts (not
# line numbers) so refactors within a file don't churn the test while a
# NEW collect anywhere still fails it.
COLLECT_ALLOWED: dict[str, int] = {
    f"{PKG}/operators/surrogate.py": 2,
    # the three audited beyond-tier sites (snapshot manifests /
    # partition lists) all live in the warehouse tier, so the r8 split
    # moved them wholesale from beyond.py to beyond_warehouse.py
    f"{PKG}/plans/beyond_warehouse.py": 3,
    f"{PKG}/sources/warehouse.py": 3,
    # r11: run_stream_tokenize_learned collects the LEARNED merge table
    # (8 rows, Heaps-law bounded) once before the stream starts.
    f"{PKG}/streaming/stream.py": 4,
    # r10: tx_bpe_train_apply collects the LEARNED merge table (8 rows;
    # a production 50k-merge vocab is still MBs — bounded by Heaps'
    # law, never by corpus size) to feed the Arrow tokenizer.
    f"{PKG}/plans/beyond_text.py": 1,
    # r16 (ADVICE r15): ivfpq256_query's shortlist=None sizing collects
    # ONE row — the max per-query probed-cell occupancy (probe joined
    # to broadcast per-cell counts, aggregated to a single max). Only
    # the scaled-default branch pays it; registry entries pass the
    # pinned constant and never hit this site.
    # r16 optimization round adds the two power-iteration sites: the
    # d-row (pos, mu, n) seed collect (_mu_and_n) and the 1-row
    # (x_arr, vx_arr, nrm) iterate collect per power step
    # (_power_step_lit) — both bounded by the embedding DIMENSION
    # (d doubles), never by corpus size; this is the classic
    # iterative-algorithm driver loop (graph.py's convergence count is
    # the same shape) and it replaced a per-iteration corpus-wide
    # window Exchange + eager checkpoint + broadcast build.
    f"{PKG}/operators/similarity.py": 3,
}


def test_collect_sites_are_closed():
    found: dict[str, int] = {}
    for path in _source_files():
        n = open(path).read().count(".collect()")
        if n:
            found[os.path.relpath(path, REPO)] = n
    assert found == COLLECT_ALLOWED, (
        f"collect() site drift: found {found}, allowed {COLLECT_ALLOWED} — "
        "audit the new site's frame boundedness before allowlisting"
    )


def test_no_toPandas_in_engine():
    """toPandas() materializes the whole frame on the driver — the same
    100 TB hazard as collect(); the engine never uses it (bench/tests
    may)."""
    offenders = []
    for path in _source_files():
        for i, line in enumerate(open(path), 1):
            if ".toPandas()" in line:
                offenders.append(f"{os.path.relpath(path, REPO)}:{i}")
    assert not offenders, offenders


def test_beyond_tier_first_import_order():
    """The r8 beyond.py split re-exports tier entries via star-imports
    plus a PEP 562 ``__getattr__`` fallback. The fallback exists for ONE
    scenario: a tier module imported before ``plans.beyond`` leaves
    beyond's star-import looking at the tier mid-init (binding nothing),
    so attribute access must resolve lazily. Pin that order in a fresh
    interpreter — the in-process suite can't, its conftest already
    imported the package in the normal order."""
    import subprocess
    import sys as _sys

    # EVERY tier module must be importable first (ADVICE r11: only
    # beyond_text was pinned, so a beyond_streaming -> beyond_similarity
    # module-level import silently broke the invariant for
    # beyond_similarity-first while CI stayed green).
    tiers = [
        "beyond_dedup", "beyond_events", "beyond_multimodal",
        "beyond_pipeline", "beyond_similarity", "beyond_streaming",
        "beyond_text", "beyond_warehouse",
    ]
    pkg = "financial_transaction_data_warehouse_interactive_dashboard_spark"
    # The expected count is the NORMAL-order registry size, read from
    # the already-imported module — never a hardcoded literal (r5 and
    # r12 both went red chasing a stale pin; VERDICT r12 ask #1).
    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (  # noqa: E501
        REGISTRY as _NORMAL_ORDER_REGISTRY,
    )

    expected = len(_NORMAL_ORDER_REGISTRY)
    for tier in tiers:
        code = (
            f"import {pkg}.plans.{tier}\n"
            f"from {pkg}.plans import beyond\n"
            "assert beyond.tx_text_profile.__name__ == 'tx_text_profile'\n"
            "assert beyond.wh_bucketed_join.__name__ == 'wh_bucketed_join'\n"
            f"from {pkg}.plans.queries import REGISTRY\n"
            f"assert len(REGISTRY) == {expected}, len(REGISTRY)\n"
            "print('OK')\n"
        )
        res = subprocess.run(
            [_sys.executable, "-c", code], capture_output=True, text=True,
            cwd=REPO, timeout=120,
        )
        assert res.returncode == 0 and "OK" in res.stdout, (
            tier, res.stderr[-2000:]
        )


def test_bench_canary_contract(spark):
    """The calibration canary (VERDICT r7 ask #3; informational-only
    since r10 — VERDICT r9 ask #2 moved the vs_prev normalizer to the
    median shared-entry ratio) must always produce its four keys with
    positive sub-minute timings — a canary that errors or returns zeros
    would break the cross-round continuity record."""
    from bench import run_canary
    from financial_transaction_data_warehouse_interactive_dashboard_spark.sources.registry import (
        load_tables,
    )

    from conftest import SF_SMOKE

    out = run_canary(spark, load_tables(spark, SF_SMOKE))
    assert set(out) == {"scan_agg", "bcast_join", "window_1k", "total_s"}
    for k, v in out.items():
        assert 0 < v < 60, (k, v)
    assert abs(out["total_s"]
               - (out["scan_agg"] + out["bcast_join"] + out["window_1k"])
               ) < 0.01


def test_bench_large_result_names_are_registered():
    """A typo in bench.LARGE_RESULT silently demotes that entry back to
    collect-timing; pin membership against the registry. (conftest.py
    already puts the repo root on sys.path — no mutation here.)"""
    from bench import LARGE_RESULT
    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (
        REGISTRY,
    )

    unknown = LARGE_RESULT - set(REGISTRY)
    assert not unknown, unknown
