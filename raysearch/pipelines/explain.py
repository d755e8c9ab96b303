"""Ranking introspection: per-term score explanation for top-k hits
(the Lucene Explanation API shape) and cross-scorer ranking agreement
(the evaluation primitive behind scorer A/B comparisons).

Both are k-bounded BY CONSTRUCTION: they start from the ranked top-k
tables and only ever touch the query terms' postings restricted to
those <= k x |queries| candidate docs — never the corpus. Reference
anchor: the reference returns bare (doc, score) pairs with no
explanation surface (/root/reference/src/lib.rs:401-410); this is the
debuggability layer its scoring path implies.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def explain_topk(sf_dir: str) -> pa.Table:
    """Score explanation: for every (query, doc) in the BM25 top-10,
    one row per matching query term with its tf and its exact BM25
    contribution — round6(w * idf * tfnorm), the very addends whose
    sum is the hit's score (same float expression tree as the scorer,
    so the breakdown is the truth, not an approximation).

    Plan: the ranked top-10 doc ids (k-bounded) ride the task closure
    into the segment fan-out; each part intersects its decoded
    query-term postings with the candidates (searchsorted) and emits
    (query, doc, term, tf, contrib) rows — work bounded by the query
    terms' df, output bounded by k x |terms|."""
    import ray.data

    from raysearch.numutil import round6
    from raysearch.pipelines.search_queries import (DOC_QUERIES,
                                                    _concat_ds,
                                                    bm25_topk,
                                                    cached_index)
    from raysearch.query import lexicon_df
    from raysearch.score import (bm25_contrib, bm25_idf,
                                 query_term_weights)
    from raysearch.segments import (SCORER_COLUMNS, decode_posting_row,
                                    part_dirname, read_postings)
    from raysearch.stats import load_stats

    idx = cached_index(sf_dir)
    st = load_stats(idx)
    parts = st["parts"]
    n_docs, avgdl = st["n_docs"], st["avgdl"]
    k1, b = st["config"]["k1"], st["config"]["b"]

    base = bm25_topk(sf_dir)
    cand: dict[int, np.ndarray] = {
        int(qid): np.sort(g["doc_id"].to_numpy(np.int64))
        for qid, g in base.to_pandas().groupby("query_id")}

    qweights = [query_term_weights(q) for q in DOC_QUERIES]
    all_terms = sorted({t for qw in qweights for t, _ in qw})
    df = lexicon_df(idx, all_terms)
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "term": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64()),
                      "contrib": pa.array([], pa.float64())})

    def kern(batch: pa.Table) -> pa.Table:
        out_q, out_d, out_t, out_f, out_c = [], [], [], [], []
        for part in batch["part"].to_pylist():
            part_dir = part_dirname(idx, int(part))
            if not os.path.isdir(part_dir):
                continue
            tbl = read_postings(part_dir, all_terms,
                                columns=SCORER_COLUMNS)
            post = {tbl["term"][i].as_py(): decode_posting_row(tbl, i)
                    for i in range(tbl.num_rows)}
            for qid, qw in enumerate(qweights):
                elig = cand.get(qid)
                if elig is None or not len(elig):
                    continue
                for t, w in qw:
                    if t not in post:
                        continue
                    docs, tfs, dls = post[t]
                    pos = np.searchsorted(docs, elig)
                    pos_c = np.clip(pos, 0, max(0, len(docs) - 1))
                    hit = (docs[pos_c] == elig) if len(docs) else \
                        np.zeros(len(elig), bool)
                    if not hit.any():
                        continue
                    sel = pos_c[hit]
                    contrib = bm25_contrib(
                        tfs[sel], dls[sel],
                        bm25_idf(df.get(t, 0), n_docs), w, k1, b,
                        avgdl)
                    n = int(hit.sum())
                    out_q.extend([qid] * n)
                    out_d.extend(elig[hit].tolist())
                    out_t.extend([t] * n)
                    out_f.extend(tfs[sel].tolist())
                    out_c.extend(round6(contrib).tolist())
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(np.asarray(out_d, np.int64), pa.int64()),
            "term": pa.array(out_t, pa.string()),
            "tf": pa.array(np.asarray(out_f, np.int64), pa.int64()),
            "contrib": pa.array(np.asarray(out_c, np.float64),
                                pa.float64())})

    parts_ds = ray.data.from_items([{"part": p} for p in parts])
    out = _concat_ds(parts_ds.map_batches(
        kern, batch_format="pyarrow",
        batch_size=max(1, len(parts) // 16)), empty).to_pandas()
    out = out.sort_values(["query_id", "doc_id", "term"],
                          ignore_index=True)
    return pa.table({
        "query_id": pa.array(out.query_id.to_numpy(np.int64),
                             pa.int64()),
        "doc_id": pa.array(out.doc_id.to_numpy(np.int64), pa.int64()),
        "term": pa.array(out.term.tolist(), pa.string()),
        "tf": pa.array(out.tf.to_numpy(np.int64), pa.int64()),
        "contrib": pa.array(out.contrib.to_numpy(np.float64),
                            pa.float64()),
    })


def sql_explain_topk() -> str:
    from raysearch.pipelines.search_queries import (_TOK_CTES, B, K1,
                                                    _qterms_values,
                                                    sql_bm25_topk)

    return f"""
WITH base AS ({sql_bm25_topk()}),
{_TOK_CTES},
dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
         (SELECT sum(dl) FROM dl)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
),
q(query_id, term, w) AS (VALUES {_qterms_values(True)})
SELECT base.query_id, base.doc_id, q.term, tf.tf,
       round(q.w * ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
             * (tf.tf * ({K1} + 1))
             / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)), 6)
         AS contrib
FROM base
JOIN q ON q.query_id = base.query_id
JOIN tf ON tf.term = q.term AND tf.doc_id = base.doc_id
JOIN dfq ON dfq.term = q.term
JOIN dl ON dl.doc_id = base.doc_id
CROSS JOIN stats s
"""


def scorer_agreement(sf_dir: str) -> pa.Table:
    """Cross-scorer ranking agreement: per query, how many of the
    BM25 top-10 docs also appear in the Dirichlet top-10 (n_common)
    and the Jaccard overlap of the two hit sets — the zero-label
    ranking-drift metric used to gate scorer changes. Driver-side
    set math over two k-bounded ranked tables (each already a
    distributed pipeline)."""
    from raysearch.numutil import round6
    from raysearch.pipelines.search_queries import (bm25_topk,
                                                    dirichlet_topk)

    bm = bm25_topk(sf_dir).to_pandas()
    di = dirichlet_topk(sf_dir).to_pandas()
    rows = []
    qids = sorted(set(bm.query_id) | set(di.query_id))
    for qid in qids:
        a = set(bm[bm.query_id == qid].doc_id)
        b = set(di[di.query_id == qid].doc_id)
        inter, union = len(a & b), len(a | b)
        rows.append((int(qid), inter,
                     float(round6(np.float64(inter) / union))
                     if union else 0.0))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_common": pa.array([r[1] for r in rows], pa.int64()),
        "jaccard": pa.array([r[2] for r in rows], pa.float64()),
    })


def sql_scorer_agreement() -> str:
    from raysearch.pipelines.search_queries import (sql_bm25_topk,
                                                    sql_dirichlet_topk)

    return f"""
WITH bm AS ({sql_bm25_topk()}),
di AS ({sql_dirichlet_topk()}),
qs AS (SELECT DISTINCT query_id FROM bm
       UNION SELECT DISTINCT query_id FROM di),
inter AS (
  SELECT bm.query_id, count(*)::BIGINT AS n
  FROM bm JOIN di ON di.query_id = bm.query_id
                 AND di.doc_id = bm.doc_id
  GROUP BY bm.query_id
),
sizes AS (
  SELECT qs.query_id,
         (SELECT count(*) FROM bm WHERE bm.query_id = qs.query_id)
           AS na,
         (SELECT count(*) FROM di WHERE di.query_id = qs.query_id)
           AS nb,
         coalesce(inter.n, 0) AS n_common
  FROM qs LEFT JOIN inter USING (query_id)
)
SELECT query_id::BIGINT AS query_id, n_common::BIGINT AS n_common,
       CASE WHEN na + nb - n_common = 0 THEN 0.0
            ELSE round(n_common::DOUBLE / (na + nb - n_common), 6)
       END AS jaccard
FROM sizes
"""


QUERIES = {
    "explain_topk": explain_topk,
    "scorer_agreement": scorer_agreement,
}

ORACLE_SQL = {
    "explain_topk": sql_explain_topk(),
    "scorer_agreement": sql_scorer_agreement(),
}
