"""Offline trainer for the FROZEN production-sized PQ codebooks
(VERDICT r11 ask #2): m=8 subspaces x 256 codes/subspace, trained once
on the sf0.1 embedding corpus by seeded numpy Lloyd (L2), quantized to
integer thousandths, and emitted as
``financial_transaction_data_warehouse_interactive_dashboard_spark/operators/pq256_book.py``
— the ``tx_bpe_apply64`` frozen-constant pattern (train once offline,
freeze as a public constant, oracle replays encode/ADC statically)
applied to the quantizer the ANN recall audit showed the oracle-sized
8-code books cannot approach (recall@5 0.24 vs the 0.93-0.96 coarse
frontier at sf0.1).

Deterministic end to end: stride-seeded init over vec_id-ordered
subvectors, 25 Lloyd iterations, empty clusters re-seeded to the
farthest point of the largest cluster (ties by lowest vec_id). Rerun
``python tools/train_pq256.py`` only to REGENERATE the frozen module —
committed output is the artifact of record, like BPE_MERGES64.
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

M = 8
SUBDIM = 8
N_CODES = 256
ITERS = 25
SCALE = 1000  # centroids frozen as integer thousandths


def train_subspace(x: np.ndarray) -> np.ndarray:
    """Seeded Lloyd on one subspace's subvectors (n x SUBDIM)."""
    n = x.shape[0]
    stride = max(n // N_CODES, 1)
    cent = x[np.arange(N_CODES) * stride % n].copy()
    for _ in range(ITERS):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        counts = np.bincount(assign, minlength=N_CODES)
        for c in range(N_CODES):
            if counts[c] > 0:
                cent[c] = x[assign == c].mean(axis=0)
        # deterministic empty-cluster repair: farthest member of the
        # largest cluster (ties -> lowest row index)
        for c in np.where(counts == 0)[0]:
            big = int(counts.argmax())
            members = np.where(assign == big)[0]
            far = members[
                ((x[members] - cent[big]) ** 2).sum(axis=1).argmax()
            ]
            cent[c] = x[far]
            assign[far] = c
            counts = np.bincount(assign, minlength=N_CODES)
    return cent


def main() -> None:
    import duckdb

    # --rotated (VERDICT r13 ask #2): train the SAME seeded Lloyd on
    # the rot64-ROTATED corpus and emit the sibling module
    # pq256r_book.py — the true-OPQ second half. The committed audit
    # showed rotation alone LOSES recall (0.8375 vs 0.9125) because
    # the original books were trained unrotated; books retrained in
    # the rotated frame are what an OPQ deployment actually serves.
    rotated = "--rotated" in sys.argv[1:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows = duckdb.sql(
        "SELECT embedding::DOUBLE[] FROM "
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}' ORDER BY vec_id"
    ).fetchall()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    print(f"corpus {mat.shape} from {sf_dir}")

    if rotated:
        from financial_transaction_data_warehouse_interactive_dashboard_spark.operators import (  # noqa: E501
            rot64 as RT,
        )

        r = np.array(
            [
                [int(x) for x in s.split("|")]
                for s in RT.ROT64_PACKED
            ],
            dtype=np.float64,
        ) / float(RT.SCALE)
        mat = mat @ r.T  # v_rot[i] = <ROW_i, v>, rows are the new axes
        print(f"rotated by frozen rot64 (ortho err {np.abs(r @ r.T - np.eye(len(r))).max():.2e})")

    packed: list[str] = []
    for m in range(M):
        sub = mat[:, m * SUBDIM : (m + 1) * SUBDIM]
        cent = train_subspace(sub)
        q = np.rint(cent * SCALE).astype(int)
        # quantization-induced distortion sanity
        d = ((sub[:, None, :] - (q / SCALE)[None, :, :]) ** 2).sum(axis=2)
        print(
            f"m={m} mean sq dist to nearest code: {d.min(axis=1).mean():.5f}"
        )
        packed.append("|".join(str(v) for v in q.reshape(-1)))

    mod = "pq256r_book.py" if rotated else "pq256_book.py"
    out = os.path.join(
        HERE,
        "financial_transaction_data_warehouse_interactive_dashboard_spark",
        "operators",
        mod,
    )
    corpus_word = (
        "rot64-ROTATED sf0.1 embedding corpus (true-OPQ books:\n"
        "tools/train_pq256.py --rotated; serve ONLY on rotate_corpus\n"
        "output)"
        if rotated
        else "sf0.1 embedding corpus"
    )
    entry = "sim_ann_opq256" if rotated else "sim_ann_pq256"
    with open(out, "w") as f:
        f.write(
            '"""FROZEN production-sized PQ codebooks (m=8 subspaces x 256\n'
            "codes/subspace x 8 dims), trained once by tools/train_pq256.py\n"
            f"(seeded numpy Lloyd on the {corpus_word}) and frozen as\n"
            "integer thousandths — the tx_bpe_apply64 frozen-constant pattern:\n"
            f"the {entry} entry and its DuckDB oracle both replay THIS\n"
            "table statically (value = int / 1000.0, an exact-parity division\n"
            "in both engines), so the oracle never pays unrolled training.\n"
            "Regenerate only via the trainer; the committed table is the\n"
            'artifact of record (like functions.text.BPE_MERGES64)."""\n\n'
            "M = 8\n"
            "SUBDIM = 8\n"
            "N_CODES = 256\n"
            "SCALE = 1000\n\n"
            "#: per-subspace packed centroid table: 256 codes x 8 dims =\n"
            "#: 2048 '|'-separated integer thousandths, row-major by\n"
            "#: (code, dim). Index = subspace m.\n"
            "PQ256_PACKED = (\n"
        )
        for s in packed:
            f.write(f'    "{s}",\n')
        f.write(
            ")\n\n\n"
            "def book_rows():\n"
            '    """(m, code, [8 float centroids]) rows decoded from the\n'
            "    packed table — value = int / 1000.0 (exact IEEE parity with\n"
            "    the oracle's CAST(x AS DOUBLE) / 1000.0).\"\"\"\n"
            "    rows = []\n"
            "    for m, s in enumerate(PQ256_PACKED):\n"
            "        vals = s.split(\"|\")\n"
            "        assert len(vals) == N_CODES * SUBDIM\n"
            "        for code in range(N_CODES):\n"
            "            cv = [\n"
            "                int(vals[code * SUBDIM + j]) / 1000.0\n"
            "                for j in range(SUBDIM)\n"
            "            ]\n"
            "            rows.append((m, code, cv))\n"
            "    return rows\n"
        )
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
