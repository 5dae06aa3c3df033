"""Leaf-module DuckDB oracle builder for the IVF+PQ256 replay
(split out of plans/beyond_similarity.py in r15 so the pipeline-fusion
tier can compose it WITHOUT importing beyond_similarity at module
import time — any beyond-tier module may be imported first, and a
tier-to-tier module-level import breaks exactly that order; see
tests/test_source_hygiene.py::test_beyond_tier_first_import_order).
Imports only operators (leaf), so it is safe from every tier."""

from __future__ import annotations

from ..operators import similarity as S

def _sql_ivfpq256(
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    shortlist: int | None = None,
    train_base: int | None = None,
) -> str:
    """DuckDB oracle for sim_ann_ivfpq256: _sql_ivf_pq's IVF replay
    (seeds < n_cells, one decimal-exact Lloyd refine, rounded-cosine
    assignment) composed with _sql_pq256's frozen-book replay (static
    2048-row books, MIPS-identity encode, DECIMAL ADC), with the ADC
    restricted to the nprobe probed cells per query, then the 50-deep
    shortlist and the exact cosine re-rank. Training cost to the
    oracle: ONE Lloyd unroll (the books are frozen constants).

    ``train_base`` (wh_ivfpq256_append): the coarse quantizer — the
    ONLY corpus-trained structure at this codebook size — sees just
    vec_id < train_base; assignment/encode/probe still run over the
    whole corpus against the frozen result, the publish-on-base +
    append-new contract."""
    from ..operators import pq256_book as B

    if shortlist is None:
        shortlist = S.PQ256_SHORTLIST
    vals = ",\n      ".join(
        f"({m}, '{s}')" for m, s in enumerate(B.PQ256_PACKED)
    )
    sd = B.SUBDIM
    train = "eb" if train_base is not None else "e"
    eb_cte = (
        f"eb AS (SELECT * FROM e WHERE vec_id < {train_base}),\n    "
        if train_base is not None
        else ""
    )
    return f"""
    WITH braw AS (SELECT * FROM (VALUES {vals}) b(m, s)),
    bsplit AS (SELECT m, string_split(s, '|') AS cs FROM braw),
    bk AS (SELECT m, (u.p - 1) // {sd} AS code, (u.p - 1) % {sd} AS pos,
                  CAST(u.c AS DOUBLE) / 1000.0 AS bv
           FROM bsplit, unnest([{{'p': i, 'c': cs[i]}}
                                for i in range(1, len(cs) + 1)]) AS t(u)),
    books AS (SELECT CAST(m AS INTEGER) AS m, CAST(code AS INTEGER) AS code,
                     list(bv ORDER BY pos) AS cv
              FROM bk GROUP BY 1, 2),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {eb_cte}c0 AS (SELECT vec_id AS cell, v AS cv FROM {train}
          WHERE vec_id < {n_cells}),
    ia0 AS (SELECT {train}.vec_id, {train}.v, cell FROM {train}, c0
            QUALIFY row_number() OVER (PARTITION BY {train}.vec_id
              ORDER BY round(list_cosine_similarity(v, cv), 6) DESC,
              cell ASC) = 1),
    ipx0 AS (SELECT cell, u.p AS pos, u.x AS val FROM ia0,
             unnest([{{'p': i, 'x': v[i]}}
                     for i in range(1, len(v) + 1)]) AS t(u)),
    icent0 AS (SELECT cell, pos,
                 CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE)
                   / count(*) AS cv_e
               FROM ipx0 GROUP BY 1, 2),
    c1 AS (SELECT cell, list(cv_e ORDER BY pos) AS cv
           FROM icent0 GROUP BY 1),
    af AS (SELECT e.vec_id, cell FROM e, c1
           QUALIFY row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(v, cv), 6) DESC,
             cell ASC) = 1),
    sub AS (SELECT vec_id, r.range AS m,
                   v[r.range * {sd} + 1 : r.range * {sd} + {sd}] AS sv
            FROM e, range(0, {B.M}) r),
    enc AS (SELECT sub.vec_id, sub.m, code FROM sub JOIN books USING (m)
            QUALIFY row_number() OVER (PARTITION BY sub.vec_id, sub.m
              ORDER BY round(list_dot_product(sv, cv)
                             - CAST('0.5' AS DOUBLE)
                               * list_dot_product(cv, cv),
                             6) DESC, code ASC) = 1),
    qv AS (SELECT vec_id AS query_id, v AS qv FROM e
           WHERE vec_id < {n_queries}),
    probe AS (SELECT query_id, cell FROM qv, c1
              QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC,
                cell ASC) <= {nprobe}),
    q AS (SELECT vec_id AS query_id, m, sv AS qsv FROM sub
          WHERE vec_id < {n_queries}),
    cand AS (SELECT probe.query_id, enc.vec_id, enc.m, enc.code
             FROM enc JOIN af USING (vec_id) JOIN probe USING (cell)
             WHERE enc.vec_id != probe.query_id),
    terms AS (SELECT cand.query_id, cand.vec_id,
                     CAST(round(list_dot_product(qsv, cv), 6)
                          AS DECIMAL(18,6)) AS term
              FROM cand JOIN books USING (m, code)
              JOIN q USING (query_id, m)),
    scores AS (SELECT query_id, vec_id,
                      CAST(sum(term) AS DOUBLE) AS approx_ip
               FROM terms GROUP BY 1, 2),
    short AS (SELECT query_id, vec_id, approx_ip FROM scores
              QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY approx_ip DESC, vec_id ASC) <= {shortlist}),
    rer AS (SELECT query_id, short.vec_id AS neighbor_id,
                   round(approx_ip, 6) + CAST('0' AS DOUBLE) AS adc_ip6,
                   round(list_cosine_similarity(qv, v), 6)
                     + CAST('0' AS DOUBLE) AS cos6
            FROM short JOIN e ON short.vec_id = e.vec_id
            JOIN qv USING (query_id))
    SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cos6 DESC, neighbor_id ASC) AS INTEGER) AS rnk,
           neighbor_id, adc_ip6, cos6
    FROM rer
    QUALIFY rnk <= {k}
    ORDER BY query_id, rnk
    """
