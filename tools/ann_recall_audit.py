"""ANN recall audit at sf0.1 (VERDICT r10 ask #7): index-quality claims
should rest on more than the fixture-scale 8-query / 16-cell / nprobe-2
setting every oracle entry uses. This script measures recall@5 for the
whole index family — IVF-flat, k-means IVF, IVF+PQ, and IVFADC-residual
— at sf0.1 with 64 cells, nprobe 4, and 32 queries, against the exact
brute-force frontier, and writes the table to
``ANN_RECALL_AUDIT_r{N}.json`` at the repo root (committed once per
audit round; not part of bench.py so the per-round suite cost stays
flat).

Run from the repo root:  python tools/ann_recall_audit.py

Methodology notes:
- recall@5 = |ANN top-5 ∩ exact top-5| / (5 * n_queries), micro-averaged
  over the 32 queries (vec_id < 32 — the deterministic query convention
  every sim_* entry uses, widened 4x).
- candidate_frac = the fraction of the corpus the index actually scored
  (probed-cell occupancy / corpus), the honest companion number: recall
  without its scan budget rewards an index that probes everything.
- The PQ variants keep the registry defaults (m=8, 8 codes/subspace,
  pq_iterations: 1 for IVF+PQ as published, 3 for the residual variant
  per IVFADC_PQ_ITERATIONS) so the audit measures the SHIPPED
  configurations, just at a bigger quantizer and query load.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_QUERIES = 32
K = 5
N_CELLS = 64
NPROBE = 4


def _interpret(
    results: dict,
    scaling: list | None = None,
    aniso: dict | None = None,
) -> str:
    """Narrative derived strictly from the measured ``results`` values
    (ADVICE r11) so a rerun at any scale/config stays self-consistent.
    The fixed analysis ('256-code books are the production config')
    lives in the round notes / VERDICT, not in this committed JSON."""

    def r(name: str) -> float:
        return results[name]["recall_at_5"] if name in results else None

    coarse = [v for v in (r("ivf_flat"), r("ivf_kmeans")) if v is not None]
    frac = results.get("ivf_kmeans", results.get("ivf_flat", {})).get(
        "candidate_frac"
    )
    parts = []
    if coarse:
        parts.append(
            "Coarse quantization: IVF recall@5 "
            f"{min(coarse):.2f}-{max(coarse):.2f} scanning "
            f"~{frac * 100:.0f}% of the corpus."
        )
    if r("ivf_pq") is not None:
        parts.append(
            f"The shipped oracle-sized PQ (8 codes/subspace) measures "
            f"{r('ivf_pq'):.2f}"
            + (
                f"; 32 codes {r('ivf_pq_k32'):.2f}"
                if r("ivf_pq_k32") is not None
                else ""
            )
            + (
                f"; residual/3-iter {r('ivfadc_residual'):.2f}"
                if r("ivfadc_residual") is not None
                else ""
            )
            + "."
        )
    for name, label in (
        ("ivf_pq256", "256-code books"),
        ("ivf_pq256_rerank", "256-code + exact re-rank"),
        ("ivf_pq256_rotated", "256-code on PCA-rotated corpus"),
        ("ivf_pq256_rotated_trained",
         "true OPQ: rotated corpus + rotated-TRAINED books"),
        ("ivfpq256_probed_rerank",
         "IVF-probed 256-code + exact re-rank (full production stack)"),
    ):
        if r(name) is not None:
            parts.append(f"{label}: {r(name):.2f}.")
    if (
        r("ivf_pq256_rotated") is not None
        and r("ivf_pq256_rotated_trained") is not None
        and r("ivf_pq256_rerank") is not None
    ):
        delta = r("ivf_pq256_rotated_trained") - r("ivf_pq256_rotated")
        parts.append(
            f"Retraining the books in the rotated frame moves recall "
            f"{delta:+.2f} vs rotation-with-unrotated-books, landing "
            f"{r('ivf_pq256_rotated_trained') - r('ivf_pq256_rerank'):+.2f}"
            " relative to the unrotated baseline — on an isotropic "
            "corpus the rotation itself cannot add recall, so parity "
            "with the baseline is the expected OPQ ceiling here."
        )
    if scaling:
        pts = ", ".join(
            f"(cells={p['n_cells']}, nprobe={p['nprobe']}"
            + (
                f", shortlist={p['shortlist']}"
                + (
                    " [scaled default]"
                    if p.get("scaled_default")
                    else ""
                )
                if p.get("shortlist", 50) != 50
                else ""
            )
            + f": recall {p['recall_at_5']:.2f} @ "
            f"{p['candidate_frac'] * 100:.1f}% scan)"
            for p in scaling
        )
        parts.append(f"Scaling law on the ~10x seeded corpus: {pts}.")
        by = {
            (p["n_cells"], p["nprobe"], p.get("shortlist", 50)): p
            for p in scaling
            if not p.get("scaled_default")
        }
        lo, hi = by.get((64, 2, 50)), by.get((64, 8, 50))
        if lo and hi and hi["recall_at_5"] < lo["recall_at_5"]:
            parts.append(
                "Recall FALLS as nprobe rises at fixed n_cells "
                f"({lo['recall_at_5']:.2f} @ nprobe 2 -> "
                f"{hi['recall_at_5']:.2f} @ nprobe 8 at 64 cells): the "
                "ADC shortlist is fixed at 50, so probing more cells "
                "admits more quantization-noise distractors that crowd "
                "true neighbors out of the shortlist before the exact "
                "re-rank — the known IVFPQ coupling; a deployment "
                "scales the shortlist with the scanned candidate "
                "count."
            )
            ctrl = by.get((64, 8, 200))
            if ctrl:
                parts.append(
                    "The dilution mechanism is confirmed by the "
                    "control: the SAME nprobe-8 scan with the "
                    "shortlist scaled 50 -> 200 moves recall "
                    f"{hi['recall_at_5']:.2f} -> "
                    f"{ctrl['recall_at_5']:.2f}"
                    + (
                        " — above the nprobe-2 level, so the scan was "
                        "never the problem, the fixed shortlist was."
                        if ctrl["recall_at_5"] >= lo["recall_at_5"]
                        else "."
                    )
                )
        a, b = by.get((64, 4, 50)), by.get((256, 4, 50))
        if a and b:
            parts.append(
                "At fixed nprobe=4, going 64 -> 256 cells moves the "
                f"scan {a['candidate_frac'] * 100:.1f}% -> "
                f"{b['candidate_frac'] * 100:.1f}% and recall "
                f"{a['recall_at_5']:.2f} -> {b['recall_at_5']:.2f} — "
                "the scan/recall exchange rate a larger deployment "
                "tunes with these two knobs."
            )
        sc = next((p for p in scaling if p.get("scaled_default")), None)
        if sc:
            parts.append(
                "The SCALED shortlist default (VERDICT r14 ask #3; "
                "sizing upgraded per ADVICE r15: "
                "ivfpq256_query(shortlist=None) -> max(50, ceil(0.08 x "
                "max-per-query probed-cell occupancy)) = "
                f"{sc['shortlist']} at this point) executes the r14 "
                "recommendation as default behavior: recall "
                f"{sc['recall_at_5']:.2f} at the same "
                f"{sc['candidate_frac'] * 100:.1f}% scan — raising "
                "nprobe no longer silently dilutes the re-rank pool, "
                "and the pool now tracks the ACTUAL scan even on "
                "skewed cell occupancies."
            )
    if aniso:
        base = aniso["results"]["pq256_rerank"]["recall_at_5"]
        opq = aniso["results"]["opq256_rerank"]["recall_at_5"]
        base_adc = aniso["results"]["pq256_adc_only"]["recall_at_5"]
        opq_adc = aniso["results"]["opq256_adc_only"]["recall_at_5"]
        verdict = (
            "the rotation DELIVERS on the corpus OPQ was designed for "
            "(Ge et al.'s motivating case)"
            if opq > base and opq_adc > base_adc
            else (
                "the rotation pays only before the re-rank here — the "
                "50-deep exact tail absorbs the remaining distortion"
                if opq_adc > base_adc
                else "an honest negative: the rotation does not pay "
                "even on this anisotropic corpus — mechanism to be "
                "named"
            )
        )
        parts.append(
            "Anisotropic OPQ audit (seeded corpus, eigenspectrum "
            "lambda_i ~ 1/i with the principal axes spread across all "
            "8 subspace boundaries by a random orthonormal basis — "
            "correlated subspaces, the configuration where rotation "
            "can matter): books trained in the RAW frame measure "
            f"ADC-only {base_adc:.2f} / +re-rank {base:.2f}; the "
            "PCA + snake-interleave OPQ rotation with books retrained "
            f"in the rotated frame measures {opq_adc:.2f} / {opq:.2f} "
            f"({opq_adc - base_adc:+.2f} ADC, {opq - base:+.2f} "
            f"end-to-end) — {verdict}."
        )
        if "pca_blocks_rerank" in aniso["results"]:
            blk = aniso["results"]["pca_blocks_rerank"]["recall_at_5"]
            blk_adc = aniso["results"]["pca_blocks_adc_only"][
                "recall_at_5"
            ]
            parts.append(
                "The concentrating control isolates WHERE the win "
                "comes from: plain-PCA-order blocks (identical "
                "decorrelation, variance CONCENTRATED per subspace) "
                f"measure {blk_adc:.2f} / {blk:.2f} — "
                f"{blk - base:+.2f} vs raw end-to-end — so "
                "decorrelation alone is actively harmful here and the "
                "rotation's entire payoff is the variance BALANCING "
                "across subspaces. (This control is also a measured "
                "dead end from this round: a greedy min-log-load "
                "bucket balancer degenerates into exactly these "
                "blocks on unit-normalized data, because every log "
                "is negative and the minimum-load bucket is the one "
                "holding the smallest eigenvalue until it fills.)"
            )
    parts.append(
        "The oracle-pinned entries verify MECHANICS bit-exactly; this "
        "audit calibrates the quality knobs."
    )
    return " ".join(parts)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (
        similarity as S,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ftdw-ann-recall-audit")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # The r14 scaling-law sweep runs a ~10x synthetic corpus in
        # the same session; the 1g local-mode default heap OOMs on its
        # checkpointed fan-outs. Audit-tool-only — registry entries
        # stay within the driver's default session.
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.cache().count()
    n_corpus = emb.count()

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_bruteforce(emb, n_queries=N_QUERIES, k=K).collect()
    }

    def recall(ann_df) -> float:
        rows = ann_df.collect()
        hits = sum((r["query_id"], r["neighbor_id"]) in exact for r in rows)
        return round(hits / len(exact), 4)

    def candidate_frac(cells_df) -> float:
        """Fraction of the corpus inside the NPROBE probed cells,
        averaged over queries (the scan budget recall is bought with)."""
        vecs = S._vecs(emb)
        assign = S._assign_cells(vecs, cells_df).groupBy("cell").count()
        occ = {r["cell"]: r["count"] for r in assign.collect()}
        q = vecs.filter(F.col("vec_id") < N_QUERIES).collect()
        cents = cells_df.collect()
        import math

        tot = 0.0
        for row in q:
            sims = sorted(
                (
                    (
                        -round(
                            sum(a * b for a, b in zip(row["v"], c["cv"]))
                            / math.sqrt(
                                sum(a * a for a in row["v"])
                                * sum(b * b for b in c["cv"])
                            ),
                            6,
                        ),
                        c["cell"],
                    )
                    for c in cents
                )
            )[:NPROBE]
            tot += sum(occ.get(cell, 0) for _, cell in sims) / n_corpus
        return round(tot / len(q), 4)

    vecs = S._vecs(emb)
    seeds = vecs.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    kcells = S.refine_centroids(vecs, seeds).localCheckpoint(eager=True)

    results: dict[str, dict] = {}

    t0 = time.perf_counter()
    results["ivf_flat"] = {
        "recall_at_5": recall(
            S.topk_ann_ivf(emb, N_QUERIES, K, n_cells=N_CELLS, nprobe=NPROBE)
        ),
        "candidate_frac": candidate_frac(seeds),
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    t0 = time.perf_counter()
    results["ivf_kmeans"] = {
        "recall_at_5": recall(
            S.topk_ann_ivf_kmeans(
                emb, N_QUERIES, K, n_cells=N_CELLS, nprobe=NPROBE
            )
        ),
        "candidate_frac": candidate_frac(kcells),
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    t0 = time.perf_counter()
    results["ivf_pq"] = {
        "recall_at_5": recall(
            S.topk_ann_ivf_pq(
                emb, N_QUERIES, K, n_cells=N_CELLS, nprobe=NPROBE
            )
        ),
        "candidate_frac": results["ivf_kmeans"]["candidate_frac"],
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    t0 = time.perf_counter()
    res_ann = S.topk_ann_ivfadc_residual(
        emb, N_QUERIES, K, n_cells=N_CELLS, nprobe=NPROBE
    )
    results["ivfadc_residual"] = {
        "recall_at_5": recall(res_ann),
        "candidate_frac": results["ivf_kmeans"]["candidate_frac"],
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    # The resolution knob: the registry's PQ config (8 codes/subspace =
    # 24-bit codes) is sized for bounded unrolled oracles, not for
    # recall at 64 dims; 32 codes/subspace (40-bit codes, still 6.4x
    # compression) shows where the quality actually comes back.
    t0 = time.perf_counter()
    results["ivf_pq_k32"] = {
        "recall_at_5": recall(
            S.topk_ann_ivf_pq(
                emb, N_QUERIES, K, n_cells=N_CELLS, nprobe=NPROBE,
                n_codes=32,
            )
        ),
        "candidate_frac": results["ivf_kmeans"]["candidate_frac"],
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    # --- The production 256-code PQ family (VERDICT r11 ask #2 / r12
    # ask #3: the sim_ann_pq256 docstring's recall claims must rest on
    # a COMMITTED audit row). These are full-corpus compressed ADC
    # scans — no IVF cell pruning — so candidate_frac is honestly 1.0:
    # the scan budget here is the 32x code compression, not cell
    # selectivity.
    t0 = time.perf_counter()
    # shortlist == k: the exact re-rank can only permute the ADC top-k,
    # so the returned SET (and set-based recall@5) is the ADC scan's own.
    results["ivf_pq256"] = {
        "recall_at_5": recall(
            S.topk_ann_pq256(emb, N_QUERIES, K, shortlist=K)
        ),
        "candidate_frac": 1.0,
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    t0 = time.perf_counter()
    # The shipped two-stage config: 50-deep ADC shortlist + exact
    # cosine re-rank (full-precision I/O only for n_queries x 50 rows).
    results["ivf_pq256_rerank"] = {
        "recall_at_5": recall(S.topk_ann_pq256(emb, N_QUERIES, K)),
        "candidate_frac": 1.0,
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    # Rotated variant (the sim_pca_deflate consumption claim): apply
    # the FROZEN orthonormal rotation the repo ships
    # (operators.rot64 — sim_pca_deflate's principal components
    # Gram-Schmidt-completed offline by tools/train_rotation.py; the
    # OPQ-lite alignment of leading variance directions with subspace
    # boundaries), then re-encode with the SAME frozen books — exactly
    # the sim_ann_pq256_rotated registry entry's pipeline, so the
    # audit row measures the shipped operator, not a tool-side
    # re-derivation. An orthonormal map preserves cosine (to the
    # matrix's ~1e-6 quantization), so the exact frontier is unchanged
    # and recall is comparable row-for-row with the unrotated entries.
    t0 = time.perf_counter()
    rot_emb = S.rotate_corpus(emb, S.rot64_frame(spark)).localCheckpoint(
        eager=True
    )
    results["ivf_pq256_rotated"] = {
        "recall_at_5": recall(S.topk_ann_pq256(rot_emb, N_QUERIES, K)),
        "candidate_frac": 1.0,
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    # TRUE OPQ (VERDICT r13 ask #2): the same frozen rotation, but the
    # books RETRAINED on the rotated corpus (operators.pq256r_book —
    # tools/train_pq256.py --rotated). The r13 audit's rotated row
    # measured rotation with UNROTATED-trained books — a training/serve
    # frame mismatch; this row removes it. Exactly the sim_ann_opq256
    # registry entry's pipeline.
    t0 = time.perf_counter()
    results["ivf_pq256_rotated_trained"] = {
        "recall_at_5": recall(
            S.topk_ann_pq256(
                rot_emb, N_QUERIES, K, books=S.pq256r_books(spark)
            )
        ),
        "candidate_frac": 1.0,
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    # The complete production stack (sim_ann_ivfpq256, r13): IVF probe
    # restricts the 256-code ADC to the probed cells, then exact
    # re-rank — production codebook size AND production scan budget.
    t0 = time.perf_counter()
    results["ivfpq256_probed_rerank"] = {
        "recall_at_5": recall(
            S.topk_ann_ivfpq256(
                emb, N_QUERIES, K, n_cells=N_CELLS, nprobe=NPROBE
            )
        ),
        "candidate_frac": results["ivf_kmeans"]["candidate_frac"],
        "build_plus_query_s": round(time.perf_counter() - t0, 2),
    }

    # --- Scaling-law sweep (VERDICT r13 ask #6): the 100 TB
    # recall/scan-fraction claim should rest on a CURVE, not the one
    # (64-cell, nprobe-4) point above. A seeded ~10x synthetic corpus
    # (iid unit-normalized 64-dim gaussians — the fixture's own
    # distribution, so the frozen books remain the right quantizer)
    # is swept over nprobe x n_cells for the full production stack
    # (IVF probe + frozen 256-code ADC + exact re-rank =
    # sim_ann_ivfpq256's operator), recording recall@5 AND the scan
    # fraction each point buys it with.
    import numpy as np

    SCALE_N = 20_000
    SWEEP_QUERIES = 32
    rng = np.random.RandomState(20260816)
    m10 = rng.standard_normal((SCALE_N, 64))
    m10 /= np.linalg.norm(m10, axis=1, keepdims=True)
    big = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(m10)],
        "vec_id bigint, embedding array<double>",
    )
    big.cache().count()
    exact_big = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_bruteforce(
            big, n_queries=SWEEP_QUERIES, k=K
        ).collect()
    }
    bvecs = S._vecs(big)
    qrows = bvecs.filter(F.col("vec_id") < SWEEP_QUERIES).collect()
    scaling: list[dict] = []
    for sweep_cells in (64, 256):
        seeds_b = bvecs.filter(F.col("vec_id") < sweep_cells).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("cv")
        )
        cells_b = S.refine_centroids(bvecs, seeds_b).localCheckpoint(
            eager=True
        )
        inv_b = S.build_ivfpq256_inv(big, cells_b).localCheckpoint(
            eager=True
        )
        occ = {
            r["cell"]: r["count"]
            for r in inv_b.groupBy("cell")
            .agg((F.countDistinct("vec_id")).alias("count"))
            .collect()
        }
        cents = cells_b.collect()
        import math

        # The (nprobe=8, shortlist=200) control at 64 cells tests the
        # dilution mechanism directly: if recall falls with nprobe
        # because the FIXED 50-deep shortlist drowns in ADC noise,
        # scaling the shortlist with the scanned candidate count must
        # recover it.
        configs = [(p, None) for p in (2, 4, 8)]
        if sweep_cells == 64:
            configs.append((8, 200))
            # The scaled DEFAULT (VERDICT r14 ask #3): shortlist=None
            # lets ivfpq256_query size the shortlist from the scanned
            # candidate count itself — the curve point proving the
            # r14 recommendation is now executable default behavior.
            configs.append((8, "scaled"))
        for sweep_nprobe, sweep_shortlist in configs:
            t0 = time.perf_counter()
            ann = S.ivfpq256_query(
                big,
                cells_b,
                S.pq256_books(spark),
                inv_b,
                SWEEP_QUERIES,
                K,
                sweep_nprobe,
                shortlist=(
                    None
                    if sweep_shortlist == "scaled"
                    else sweep_shortlist or S.PQ256_SHORTLIST
                ),
            )
            rows = ann.collect()
            hits = sum(
                (r["query_id"], r["neighbor_id"]) in exact_big
                for r in rows
            )
            tot = 0.0
            max_scanned = 0
            for row in qrows:
                sims = sorted(
                    (
                        (
                            -round(
                                sum(
                                    a * b
                                    for a, b in zip(row["v"], c["cv"])
                                )
                                / math.sqrt(
                                    sum(a * a for a in row["v"])
                                    * sum(b * b for b in c["cv"])
                                ),
                                6,
                            ),
                            c["cell"],
                        )
                        for c in cents
                    )
                )[:sweep_nprobe]
                scanned_q = sum(occ.get(cell, 0) for _, cell in sims)
                tot += scanned_q / SCALE_N
                max_scanned = max(max_scanned, scanned_q)
            if sweep_shortlist == "scaled":
                # Mirror of the shipped sizing (ADVICE r15): rho x the
                # ACTUAL probed-cell occupancy of the heaviest query,
                # not the uniform nprobe/n_cells proxy.
                realized = max(
                    S.PQ256_SHORTLIST,
                    math.ceil(
                        S.PQ256_SHORTLIST_PER_SCANNED * max_scanned
                    ),
                )
            else:
                realized = sweep_shortlist or S.PQ256_SHORTLIST
            point = {
                "n_cells": sweep_cells,
                "nprobe": sweep_nprobe,
                "shortlist": realized,
                "recall_at_5": round(hits / len(exact_big), 4),
                "candidate_frac": round(tot / len(qrows), 4),
                "query_s": round(time.perf_counter() - t0, 2),
            }
            if sweep_shortlist == "scaled":
                point["scaled_default"] = True
            scaling.append(point)
            print(f"scaling {point}")

    # --- Anisotropic OPQ audit (VERDICT r14 ask #4): on the isotropic
    # fixture the rotation CANNOT add systematic recall — parity is
    # the ceiling (the r14 interpretation). The configuration where
    # OPQ pays — Ge et al.'s motivating case — is an anisotropic
    # corpus: a skewed eigenspectrum (lambda_i ~ 1/i) whose principal
    # axes are spread across the m=8 subspace boundaries by a seeded
    # random orthonormal basis, so raw-frame subspaces are correlated
    # and variance-imbalanced. Books are trained OFFLINE both ways
    # with the repo's own trainer (tools.train_pq256.train_subspace,
    # thousandths-quantized like the shipped frozen books), the
    # rotation is learned FROM the corpus (PCA + balanced eigenvalue
    # bucketing — the non-parametric OPQ initialization), and both
    # variants are measured through the SHIPPED operator
    # (topk_ann_pq256 / rotate_corpus), not a tool-side re-derivation.
    from tools.train_pq256 import SCALE as BOOK_SCALE
    from tools.train_pq256 import train_subspace

    ANISO_N = 20_000
    rng2 = np.random.RandomState(20260817)
    basis, _ = np.linalg.qr(rng2.standard_normal((64, 64)))
    spectrum = 1.0 / np.sqrt(np.arange(1, 65))  # lambda_i ~ 1/i
    xa = (rng2.standard_normal((ANISO_N, 64)) * spectrum) @ basis.T
    xa /= np.linalg.norm(xa, axis=1, keepdims=True)

    # OPQ rotation learned from the corpus: PCA decorrelates; the
    # eigen-dimensions are then INTERLEAVED into the 8 subspaces in
    # snake order (0..7, 7..0, ...) so every subspace gets one dim
    # from each variance octile — the variance-balancing half of Ge et
    # al.'s non-parametric init. NOTE a measured dead end (kept as the
    # pca_blocks control below): a greedy min-load balancer over
    # log-eigenvalue sums DEGENERATES here — with unit-normalized data
    # every log is negative, so the bucket that just received a dim
    # has the HIGHEST load and the minimum sits at the bucket holding
    # the smallest eigenvalue, which therefore keeps receiving until
    # FULL — producing contiguous eigen-blocks, i.e. plain PCA order,
    # which CONCENTRATES variance per subspace instead of balancing it
    # (first numpy repro: distortion 0.262 vs raw 0.252 vs snake
    # 0.178; recall@5 0.51 vs 0.78 vs 0.86).
    cov = xa.T @ xa / ANISO_N
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    buckets: list[list[int]] = [[] for _ in range(S.PQ_M)]
    for r in range(64 // S.PQ_M):  # variance octiles, descending
        for j in range(S.PQ_M):
            b = j if r % 2 == 0 else S.PQ_M - 1 - j
            buckets[b].append(r * S.PQ_M + j)
    perm = [i for b in buckets for i in b]
    # rows of rq are the new axes (the rot64 convention), quantized to
    # integer millionths exactly like the shipped rotation artifact
    rq = np.rint(evecs[:, perm].T * 1_000_000) / 1_000_000
    # The concentrating CONTROL: plain PCA order (contiguous
    # eigen-blocks per subspace) — decorrelates identically but
    # anti-balances variance; its delta vs snake isolates WHERE the
    # OPQ win comes from (balancing, not decorrelation alone).
    rq_blocks = np.rint(evecs.T * 1_000_000) / 1_000_000

    def _books_frame(mat: "np.ndarray"):
        rows = []
        for mi in range(S.PQ_M):
            cent = train_subspace(mat[:, mi * 8 : (mi + 1) * 8])
            q = np.rint(cent * BOOK_SCALE) / BOOK_SCALE
            for c in range(q.shape[0]):
                rows.append((mi, c, [float(v) for v in q[c]]))
        return spark.createDataFrame(
            rows, "m int, code int, cv array<double>"
        )

    aniso = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(xa)],
        "vec_id bigint, embedding array<double>",
    )
    aniso.cache().count()
    exact_a = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_bruteforce(
            aniso, n_queries=SWEEP_QUERIES, k=K
        ).collect()
    }

    def recall_a(ann_df) -> float:
        rows = ann_df.collect()
        hits = sum(
            (r["query_id"], r["neighbor_id"]) in exact_a for r in rows
        )
        return round(hits / len(exact_a), 4)

    print("training anisotropic raw-frame books...")
    books_raw = _books_frame(xa)
    print("training anisotropic rotated-frame (snake) books...")
    books_rot = _books_frame(xa @ rq.T)
    print("training anisotropic pca-blocks control books...")
    books_blocks = _books_frame(xa @ rq_blocks.T)

    def _rot_df(mat):
        return spark.createDataFrame(
            [(p, [float(v) for v in mat[p]]) for p in range(64)],
            "pos int, rv array<double>",
        )

    rot_aniso = S.rotate_corpus(aniso, _rot_df(rq)).localCheckpoint(
        eager=True
    )
    rot_blocks = S.rotate_corpus(
        aniso, _rot_df(rq_blocks)
    ).localCheckpoint(eager=True)
    aniso_results: dict[str, dict] = {}
    for label, corpus_df, books_df in (
        ("pq256", aniso, books_raw),
        ("opq256", rot_aniso, books_rot),
        ("pca_blocks", rot_blocks, books_blocks),
    ):
        # ADC-only (shortlist == k: the re-rank can only permute the
        # ADC top-k, so the returned SET is the compressed scan's own)
        # — where quantization distortion shows undamped.
        t0 = time.perf_counter()
        aniso_results[f"{label}_adc_only"] = {
            "recall_at_5": recall_a(
                S.topk_ann_pq256(
                    corpus_df, SWEEP_QUERIES, K, shortlist=K,
                    books=books_df,
                )
            ),
            "build_plus_query_s": round(time.perf_counter() - t0, 2),
        }
        # The shipped two-stage config (50-deep shortlist + exact
        # re-rank). An orthonormal rotation preserves cosine (to the
        # 1e-6 artifact quantization), so the raw exact frontier is
        # the shared truth for both variants.
        t0 = time.perf_counter()
        aniso_results[f"{label}_rerank"] = {
            "recall_at_5": recall_a(
                S.topk_ann_pq256(
                    corpus_df, SWEEP_QUERIES, K, books=books_df
                )
            ),
            "build_plus_query_s": round(time.perf_counter() - t0, 2),
        }
        print(f"aniso {label}: {aniso_results[f'{label}_adc_only']} "
              f"{aniso_results[f'{label}_rerank']}")
    aniso_block = {
        "corpus": "seeded synthetic anisotropic 64-dim corpus, "
        f"n={ANISO_N}, eigenspectrum lambda_i ~ 1/i, principal axes "
        "spread across subspace boundaries by a seeded random "
        "orthonormal basis (QR of N(0,1), seed 20260817), rows "
        "unit-normalized",
        "rotation": "PCA of the corpus covariance + snake-order "
        "interleave of eigen-dimensions into the 8 subspaces (one dim "
        "per variance octile per subspace — the variance-balancing "
        "half of the non-parametric OPQ init), quantized to integer "
        "millionths (the rot64 artifact convention); pca_blocks is "
        "the concentrating control (plain PCA order, contiguous "
        "eigen-blocks)",
        "books": "tools.train_pq256.train_subspace (the shipped "
        "trainer) per variant frame, thousandths-quantized",
        "operator": "topk_ann_pq256 / rotate_corpus (the shipped "
        "operators; sim_ann_opq256's pipeline shape)",
        "results": aniso_results,
    }

    out = {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_queries": N_QUERIES,
        "k": K,
        "n_cells": N_CELLS,
        "nprobe": NPROBE,
        "pq": {"m": S.PQ_M, "codes": S.PQ_K,
               "residual_iters": S.IVFADC_PQ_ITERATIONS},
        "results": results,
        "scaling_law": {
            "corpus": "seeded synthetic iid unit-normalized 64-dim "
            f"gaussians, n={SCALE_N} (~10x sf0.1), seed 20260816",
            "operator": "ivfpq256_query (IVF probe + frozen 256-code "
            "ADC + exact re-rank; sim_ann_ivfpq256's stack)",
            "points": scaling,
        },
        "anisotropic": aniso_block,
        # Generated from the measured numbers above (ADVICE r11: a
        # hard-coded narrative contradicts its own results block the
        # moment the audit reruns at a different scale/config).
        "interpretation": _interpret(results, scaling, aniso_block),
    }
    spark.stop()
    line = json.dumps(out, indent=2)
    print(line)
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "11")
    with open(os.path.join(HERE, f"ANN_RECALL_AUDIT_r{rnd}.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
