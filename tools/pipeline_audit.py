"""Pipeline-fusion tier audits — quantify what the pl_* claims are
worth ON MEASURED DATA, the ANN_RECALL_AUDIT discipline applied to the
fused pipeline. Writes ``PIPELINE_AUDIT_r{N}.json`` at the repo root
(committed once per audit round; not part of bench.py so the per-round
suite cost stays flat).

Run from the repo root:  python tools/pipeline_audit.py

Section 1 — dedup_before_index (r15): the tier docstring says
duplicates waste index storage and poison shortlists; measured on the
sf0.1 fixture:
- drop_frac: fraction of the corpus the MinHash-LSH component pass
  identifies as non-canonical (index rows / code storage saved 1:1 —
  the codes table stores m=8 codes per surviving vector);
- contamination: dropped-duplicate neighbors appearing in the RAW
  (undeduplicated) index's top-5 results, for the ANN serve path AND
  the exact brute-force frontier (index-independent ground truth) over
  a widened 32-query set. The canonical index's contamination is
  measured too and must be 0 BY CONSTRUCTION (a dropped id was never
  encoded) — asserting the measured zero keeps the tool honest.

Section 2 — hybrid_rerank (r16; VERDICT r15 ask #3): what does the
0.2-weight lexical signal BUY over dense-only on a corpus where
lexical overlap carries information? The fixture's docs are synthetic
(no planted tie structure), so — exactly like the r15 anisotropic OPQ
audit — the case where the second stage pays is PLANTED and measured
through the SHIPPED stage (plans.beyond_pipeline.hybrid_rerank_stage,
the same code path pl_hybrid_rerank runs after its shortlist):
- regime "lexical_separable" (the planted win): for each query, six
  distractors sit ABOVE the true neighbor on dense cosine by a small
  planted gap (+0.010..0.035 — the quantization-noise scale a
  compressed ANN stage cannot resolve), but only the true neighbor
  shares the query's rare tokens. Dense-only must miss (true neighbor
  at rank 7, outside top-5); the 0.8/0.2 blend must recover it.
- regime "dense_clear" (no-harm control): the true neighbor leads on
  dense by a wide margin (~0.2) and lexical overlap is uninformative
  (every candidate shares only common tokens). The blend must not
  disturb a correct dense ranking.
- regime "lexical_misleading" (robustness control): distractors share
  MORE tokens with the query than the true neighbor does, while dense
  is clearly right. With weights 0.8/0.2 a lexical flip needs a
  jaccard advantage > 0.8·dense_gap/0.2 = 4x the dense gap — at the
  planted 0.2 gap that is an impossible jaccard delta of 0.8, so the
  blend must hold; the measured margin quantifies the 0.8/0.2 design
  headroom.
Metrics per regime: recall@1/recall@5/NDCG@5 of the PLANTED true
neighbor, dense-only vs hybrid, on the SAME shortlist — plus the mean
blend margin (blend(true) − max blend(distractor)) naming the
mechanism. Ground truth is the planted pair, so the comparison is
exact, not frontier-relative.
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


def dedup_audit(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (  # noqa: E501
        similarity as S,
    )
    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans import (  # noqa: E501
        beyond_pipeline as PL,
    )

    t0 = time.perf_counter()
    drop = {
        r["vec_id"] for r in PL._shared_dedup_drop(spark, sf_dir).collect()
    }
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_corpus = emb.count()

    def contamination(rows) -> list[tuple[int, int]]:
        return sorted(
            (r["query_id"], r["neighbor_id"])
            for r in rows
            if r["neighbor_id"] in drop
        )

    # RAW (undeduplicated) index at the registry configuration.
    vecs = S._vecs(emb)
    seeds = vecs.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    cells = S.refine_centroids(vecs, seeds).localCheckpoint(eager=True)
    inv = S.build_ivfpq256_inv(emb, cells).localCheckpoint(eager=True)
    raw_rows = S.ivfpq256_query(
        emb, cells, S.pq256_books(spark), inv, n_queries=N_QUERIES, k=K
    ).collect()
    raw_contam = contamination(raw_rows)

    # Index-independent ground truth: the exact frontier is contaminated
    # too — dedup is a data problem, not an index artifact.
    exact_rows = S.topk_bruteforce(
        emb, n_queries=N_QUERIES, k=K
    ).collect()
    exact_contam = contamination(exact_rows)

    # CANONICAL index (the pl tier's shared artifact); queries drawn
    # from the canonical pool per the fused oracle's convention.
    kept, kcells, kinv = PL._shared_canonical_index(spark, sf_dir)
    canon_rows = S.ivfpq256_query(
        kept, kcells, S.pq256_books(spark), kinv,
        n_queries=N_QUERIES, k=K,
    ).collect()
    canon_contam = contamination(canon_rows)
    assert not canon_contam, canon_contam  # zero BY CONSTRUCTION

    return {
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "n_queries": N_QUERIES,
        "k": K,
        "n_dropped": len(drop),
        "drop_frac": round(len(drop) / n_corpus, 4),
        "stored_code_rows_saved": len(drop) * S.PQ_M,
        "raw_index_result_rows": len(raw_rows),
        "raw_index_dup_neighbors": len(raw_contam),
        "raw_index_dup_pairs": raw_contam,
        "exact_frontier_dup_neighbors": len(exact_contam),
        "exact_frontier_dup_pairs": exact_contam,
        "canonical_index_dup_neighbors": len(canon_contam),
        "wall_s": round(time.perf_counter() - t0, 2),
        "interpretation": (
            f"MinHash-LSH components mark {len(drop)}/{n_corpus} "
            f"({len(drop) / n_corpus:.1%}) of the corpus non-canonical "
            "— dedup-before-index keeps that fraction of vectors (and "
            f"{len(drop) * S.PQ_M} stored code rows) out of the "
            "published index permanently. Served-result contamination "
            f"over {N_QUERIES} queries x top-{K}: the raw index "
            f"returns {len(raw_contam)} dropped-duplicate neighbors "
            f"(exact frontier: {len(exact_contam)} — the contamination "
            "is in the DATA, not an index artifact), the canonical "
            "index returns 0 by construction. Each contaminated slot "
            "is a top-k position a distinct true neighbor should have "
            "held — the redundancy twin of the shortlist-dilution "
            "mechanism ANN_RECALL_AUDIT_r14 measured for quantization "
            "noise."
        ),
    }


# --- planted-lexical corpus construction (hybrid_rerank audit) -------

DIM = 64
N_DISTRACTORS = 9
N_ABOVE = 6  # distractors planted ABOVE the true neighbor (lexical regime)
COMMON = [f"common{i}" for i in range(5)]
REGIMES = (
    "lexical_separable",
    "dense_clear",
    "lexical_misleading",
    "common_noise",
)


def _build_planted(rng):
    """Return (doc_rows, emb_rows, truth) for the three planted
    regimes: 32 queries x (1 true neighbor + 9 distractors), unit
    64-dim embeddings with planted cosines, token sets with planted
    rare-token overlap. truth maps query_id -> (true_id, regime)."""
    import numpy as np

    def unit(v):
        return v / np.linalg.norm(v)

    def at_cos(q, c):
        """A unit vector at rounded cosine ~c from unit q (seeded
        random orthogonal component)."""
        w = rng.standard_normal(DIM)
        w = unit(w - np.dot(w, q) * q)
        return unit(c * q + np.sqrt(max(0.0, 1 - c * c)) * w)

    doc_rows, emb_rows, truth = [], [], {}
    next_id = N_QUERIES
    for qi in range(N_QUERIES):
        regime = REGIMES[qi % len(REGIMES)]
        q = unit(rng.standard_normal(DIM))
        rare_q = [f"q{qi}rare{j}" for j in range(6)]
        if regime == "common_noise":
            # the query carries the global common tokens + 3 rares;
            # its TRUE neighbor shares 2 rares but NO commons, while
            # distractors share all 5 commons — unweighted jaccard
            # therefore scores distractors ABOVE the true neighbor.
            doc_rows.append((qi, " ".join(COMMON + rare_q[:3])))
        else:
            doc_rows.append((qi, " ".join(COMMON + rare_q)))
        emb_rows.append((qi, [float(x) for x in q]))

        true_id = next_id
        next_id += 1
        if regime in ("lexical_separable", "common_noise"):
            true_cos, dist_above = 0.880, [
                0.880 + 0.010 + 0.005 * j for j in range(N_ABOVE)
            ]
        elif regime == "dense_clear":
            true_cos, dist_above = 0.950, []
        else:  # lexical_misleading
            true_cos, dist_above = 0.950, []
        dist_cos = dist_above + [
            0.700 + 0.005 * j
            for j in range(N_DISTRACTORS - len(dist_above))
        ]
        # true neighbor: shares 4 of the query's 6 rare tokens except
        # in the misleading regime (no shared rares there — the
        # distractors get them instead) and the common_noise regime
        # (2 shared rares, no commons).
        if regime == "lexical_misleading":
            true_toks = COMMON + [f"t{true_id}own{j}" for j in range(6)]
        elif regime == "common_noise":
            true_toks = rare_q[:2] + [
                f"t{true_id}own{j}" for j in range(6)
            ]
        else:
            true_toks = COMMON + rare_q[:4] + [
                f"t{true_id}own{j}" for j in range(2)
            ]
        doc_rows.append((true_id, " ".join(true_toks)))
        emb_rows.append(
            (true_id, [float(x) for x in at_cos(q, true_cos)])
        )
        truth[qi] = (true_id, regime)
        for di, c in enumerate(dist_cos):
            d_id = next_id
            next_id += 1
            if regime == "lexical_misleading":
                # distractors share 5 of 6 query rares — the planted
                # lexical trap dense must survive.
                d_toks = COMMON + rare_q[:5] + [f"d{d_id}own0"]
            else:
                d_toks = COMMON + [f"d{d_id}own{j}" for j in range(6)]
            doc_rows.append((d_id, " ".join(d_toks)))
            emb_rows.append((d_id, [float(x) for x in at_cos(q, c)]))
    return doc_rows, emb_rows, truth


def hybrid_audit(spark) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (  # noqa: E501
        similarity as S,
    )
    from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.beyond_pipeline import (  # noqa: E501
        corpus_idf,
        hybrid_rerank_stage,
        weighted_rerank_stage,
    )

    t0 = time.perf_counter()
    rng = np.random.RandomState(20260816)
    doc_rows, emb_rows, truth = _build_planted(rng)
    docs = spark.createDataFrame(doc_rows, "doc_id bigint, text string")
    emb = spark.createDataFrame(
        emb_rows, "vec_id bigint, embedding array<double>"
    )
    emb.cache().count()

    # The SAME shortlist for both systems: exact dense top-50 (the
    # canonical-index entries' re-rank depth) per planted query.
    short = S.topk_bruteforce(
        emb, n_queries=N_QUERIES, k=S.PQ256_SHORTLIST
    ).select(
        "query_id", "neighbor_id", F.col("cosine").alias("cos6")
    ).localCheckpoint(eager=True)

    docw = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("w")
    )
    hybrid_rows = hybrid_rerank_stage(docw, short, k=K).collect()
    learned_rows = weighted_rerank_stage(
        docw, short, corpus_idf(docw), k=K
    ).collect()

    from pyspark.sql import Window

    wd = Window.partitionBy("query_id").orderBy(
        F.desc("cos6"), F.asc("neighbor_id")
    )
    dense_rows = (
        short.withColumn("rnk", F.row_number().over(wd))
        .filter(F.col("rnk") <= K)
        .collect()
    )

    def ranks(rows):
        out = {}
        for r in rows:
            if r["neighbor_id"] == truth[r["query_id"]][0]:
                out[r["query_id"]] = r["rnk"]
        return out

    dense_rank, hybrid_rank = ranks(dense_rows), ranks(hybrid_rows)
    learned_rank = ranks(learned_rows)

    # blend margin per lexical_separable query: blend(true) − best
    # distractor blend — the mechanism number.
    blend = {
        (r["query_id"], r["neighbor_id"]): r["blend6"]
        for r in hybrid_rows
    }
    margins = []
    for qi, (tid, regime) in truth.items():
        if regime != "lexical_separable" or (qi, tid) not in blend:
            continue
        best_other = max(
            (v for (q, n), v in blend.items() if q == qi and n != tid),
            default=None,
        )
        if best_other is not None:
            margins.append(round(blend[(qi, tid)] - best_other, 6))

    def metrics(rank_map, regime):
        qs = [q for q, (_, r) in truth.items() if r == regime]
        r1 = sum(rank_map.get(q) == 1 for q in qs) / len(qs)
        r5 = sum(rank_map.get(q, 99) <= K for q in qs) / len(qs)
        ndcg = sum(
            1.0 / np.log2(1 + rank_map[q])
            for q in qs
            if q in rank_map
        ) / len(qs)
        return {
            "recall_at_1": round(r1, 4),
            "recall_at_5": round(r5, 4),
            "ndcg_at_5": round(float(ndcg), 4),
        }

    per_regime = {
        regime: {
            "n_queries": sum(1 for _, (_, r) in truth.items() if r == regime),
            "dense_only": metrics(dense_rank, regime),
            "hybrid_0.8_0.2": metrics(hybrid_rank, regime),
            "learned_idf_0.8_0.2": metrics(learned_rank, regime),
        }
        for regime in REGIMES
    }
    lex = per_regime["lexical_separable"]
    delta5 = round(
        lex["hybrid_0.8_0.2"]["recall_at_5"]
        - lex["dense_only"]["recall_at_5"],
        4,
    )
    noise = per_regime["common_noise"]
    learned_delta5 = round(
        noise["learned_idf_0.8_0.2"]["recall_at_5"]
        - noise["hybrid_0.8_0.2"]["recall_at_5"],
        4,
    )
    return {
        "n_queries": N_QUERIES,
        "k": K,
        "n_docs": len(doc_rows),
        "planted": {
            "distractors_above_true": N_ABOVE,
            "dense_gap_range": [0.010, 0.035],
            "regimes": list(REGIMES),
        },
        "per_regime": per_regime,
        "recall_at_5_delta_lexical_separable": delta5,
        "recall_at_5_delta_learned_vs_plain_common_noise": learned_delta5,
        "blend_margin_mean_lexical_separable": round(
            float(np.mean(margins)), 6
        )
        if margins
        else None,
        "wall_s": round(time.perf_counter() - t0, 2),
        "interpretation": (
            "On the planted lexical-separable regime (six distractors "
            "+0.010..0.035 above the true neighbor on dense cosine — "
            "gaps a compressed ANN stage cannot resolve — with rare-"
            "token overlap only on the true pair), the 0.8/0.2 hybrid "
            f"moves recall@5 by {delta5:+.2f} over dense-only on the "
            "same shortlist "
            f"({lex['dense_only']['recall_at_5']:.2f} -> "
            f"{lex['hybrid_0.8_0.2']['recall_at_5']:.2f}); the "
            "dense_clear control shows no harm where lexical overlap "
            "is uninformative, and the lexical_misleading control "
            "shows the 0.2 weight cannot flip a clearly-right dense "
            "ranking (a flip needs a jaccard advantage 4x the dense "
            "gap). Mechanism: the positive mean blend margin on the "
            "separable regime is exactly the 0.2-weighted jaccard "
            "delta clearing the 0.8-weighted dense gap. The "
            "common_noise regime then separates the LEARNED scorer "
            "from the plain one: when distractors share only "
            "ubiquitous tokens (and the true pair only rare ones), "
            "unweighted jaccard actively promotes the distractors "
            f"(plain hybrid recall@5 "
            f"{noise['hybrid_0.8_0.2']['recall_at_5']:.2f} vs dense "
            f"{noise['dense_only']['recall_at_5']:.2f}) while the "
            "IDF-weighted stage recovers the true neighbor "
            f"(learned recall@5 "
            f"{noise['learned_idf_0.8_0.2']['recall_at_5']:.2f}, "
            f"delta {learned_delta5:+.2f} over plain) — rare shared "
            "tokens carry the signal, ubiquitous ones carry none, and "
            "only the learned table knows the difference."
        ),
    }


def main() -> None:
    from financial_transaction_data_warehouse_interactive_dashboard_spark.session import (  # noqa: E501
        get_spark,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ftdw-pipeline-audit")
    spark.sparkContext.setLogLevel("ERROR")

    out = {
        "dedup_before_index": dedup_audit(spark, sf_dir),
        "hybrid_rerank": hybrid_audit(spark),
    }
    spark.stop()
    line = json.dumps(out, indent=2)
    print(line)
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "16")
    with open(
        os.path.join(HERE, f"PIPELINE_AUDIT_r{rnd}.json"), "w"
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
