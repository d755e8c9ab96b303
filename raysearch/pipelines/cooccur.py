"""Term co-occurrence mining: top PMI (pointwise mutual information)
term pairs over the documents table — the collocation/association
primitive behind query suggestion, synonym mining and topic seeding.

PMI(a, b) = ln(N * c_ab / (df_a * df_b)) over DOCUMENT-LEVEL presence
(distinct terms per doc), restricted to terms with
MIN_DF <= df <= MAX_DF_FRAC * N (the floor kills rare-coincidence
noise sources, the stopword ceiling is what bounds per-doc pair
fan-out at scale: a doc with m eligible terms emits m*(m-1)/2 pairs,
and it is exactly the in-every-doc terms that blow m up) and pairs
with c_ab >= MIN_CO (kills the log-of-rare-coincidence noise PMI is
notorious for).

Scale shape: the eligible vocabulary comes from ONE df-filtered
pushdown read of the index lexicon (no corpus pass) and broadcasts
once per actor; pair emission is map-side with per-batch partial
counts (a batch emits each pair ONCE with its count, not per doc);
the only exchange is a pair-hash bucketed groupby of those narrow
partials; scoring + top-k runs per bucket and the driver merges
buckets x k candidate rows. Nothing data-sized is materialized.
Reference anchor: the reference computes df/tf only
(/root/reference/src/lib.rs:341-399); association mining is part of
the analysis family layered on the same tokenize contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MIN_DF = 5          # term eligibility: document frequency floor
MAX_DF_FRAC = 0.9   # eligibility ceiling: drop terms present in >90%
#                     of docs (stopword guard — glue words dominate
#                     every doc's pair fan-out yet carry ~zero
#                     association signal; at web scale this is what
#                     keeps per-doc m² sane). 0.9 keeps the synthetic
#                     fixtures' full 31-term vocabulary (max df there
#                     is 0.83) while excluding real the/a/of-grade
#                     terms on natural corpora.
MIN_CO = 3          # pair support floor
TOP_PAIRS = 50      # result size


def pmi_pairs(sf_dir: str) -> pa.Table:
    """Top-{k} co-occurring term pairs by PMI (ties: term_a, term_b),
    with their document co-occurrence count. See module docstring for
    the plan; correctness contract: round6(pmi), selection by
    (-pmi, term_a, term_b), bit-identical to the SQL oracle because
    both sides compute ln((N * c) / (df_a * df_b)) in float64 on the
    same integer counts."""
    import ray
    import ray.data

    from raysearch.numutil import round6
    from raysearch.pipelines.textops import md5_prefix_ints
    from raysearch.pipelines.search_queries import (_concat_ds,
                                                    _docs_path,
                                                    cached_index)
    from raysearch.stats import load_stats
    from raysearch.tokenize import tokenize_plain

    idx = cached_index(sf_dir)
    n_docs = float(load_stats(idx)["n_docs"])

    import pyarrow.dataset as pads
    lex = pads.dataset(f"{idx}/lexicon").to_table(
        columns=["term", "df"],
        filter=(pads.field("df") >= MIN_DF)
        & (pads.field("df") <= int(MAX_DF_FRAC * n_docs)))
    elig_terms = np.asarray(lex["term"].to_pylist(), dtype=object)
    order = np.argsort(elig_terms)
    elig_terms = elig_terms[order]
    elig_df = lex["df"].to_numpy().astype(np.float64)[order]
    elig_ref = ray.put((elig_terms, elig_df))
    nb = 64  # pair-hash buckets: fixed small fan-in for the one exchange

    empty = pa.table({"bucket": pa.array([], pa.int64()),
                      "term_a": pa.array([], pa.string()),
                      "term_b": pa.array([], pa.string()),
                      "n_co": pa.array([], pa.int64())})

    def emit_pairs(batch: pa.Table) -> pa.Table:
        terms, _ = ray.get(elig_ref)
        pa_l, pb_l = [], []
        for txt in batch["text"].to_pylist():
            toks = np.unique(np.asarray(tokenize_plain(txt),
                                        dtype=object))
            if len(toks) < 2:
                continue
            pos = np.searchsorted(terms, toks)
            pos_c = np.minimum(pos, len(terms) - 1) if len(terms) else pos
            present = np.flatnonzero(
                (terms[pos_c] == toks) if len(terms) else
                np.zeros(len(toks), bool))
            m = len(present)
            if m < 2:
                continue
            sel = toks[present]          # sorted unique eligible terms
            ia, ib = np.triu_indices(m, k=1)
            pa_l.append(sel[ia])
            pb_l.append(sel[ib])
        if not pa_l:
            return empty
        g = pd.DataFrame({"term_a": np.concatenate(pa_l),
                          "term_b": np.concatenate(pb_l)})
        part = (g.groupby(["term_a", "term_b"], as_index=False)
                .size().rename(columns={"size": "n_co"}))
        # bucket key must be deterministic ACROSS WORKERS (a pair's
        # partials from different batches must meet in one group) —
        # never Python's per-process-salted hash()
        joined = (part.term_a + "\x1f" + part.term_b).to_numpy(object)
        h = md5_prefix_ints(joined, 8)
        return pa.table({
            "bucket": pa.array((h % np.uint64(nb)).astype(np.int64),
                               pa.int64()),
            "term_a": pa.array(part.term_a.tolist(), pa.string()),
            "term_b": pa.array(part.term_b.tolist(), pa.string()),
            "n_co": pa.array(part.n_co.to_numpy(np.int64), pa.int64()),
        })

    out_schema = pa.table({"term_a": pa.array([], pa.string()),
                           "term_b": pa.array([], pa.string()),
                           "n_co": pa.array([], pa.int64()),
                           "pmi": pa.array([], pa.float64())})

    def score_bucket(g: pd.DataFrame) -> pa.Table:
        # arrow out (even when empty): typed empties keep Ray's block
        # size estimator off the size-0 object-dtype path
        terms, dfs = ray.get(elig_ref)
        tot = (g.groupby(["term_a", "term_b"], as_index=False)
               ["n_co"].sum())
        tot = tot[tot.n_co >= MIN_CO]
        if not len(tot):
            return out_schema
        dfa = dfs[np.searchsorted(terms, tot.term_a.to_numpy(object))]
        dfb = dfs[np.searchsorted(terms, tot.term_b.to_numpy(object))]
        c = tot.n_co.to_numpy(np.float64)
        tot["pmi"] = round6(np.log((n_docs * c) / (dfa * dfb)))
        tot = tot.sort_values(["pmi", "term_a", "term_b"],
                              ascending=[False, True, True])
        tot = tot.head(TOP_PAIRS)
        return pa.table({
            "term_a": pa.array(tot.term_a.tolist(), pa.string()),
            "term_b": pa.array(tot.term_b.tolist(), pa.string()),
            "n_co": pa.array(tot.n_co.to_numpy(np.int64), pa.int64()),
            "pmi": pa.array(tot.pmi.to_numpy(np.float64),
                            pa.float64())})

    ds = ray.data.read_parquet(_docs_path(sf_dir),
                               columns=["doc_id", "text"])
    cand = _concat_ds(
        ds.map_batches(emit_pairs, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("bucket").map_groups(score_bucket,
                                      batch_format="pandas"),
        pa.table({"term_a": pa.array([], pa.string()),
                  "term_b": pa.array([], pa.string()),
                  "n_co": pa.array([], pa.int64()),
                  "pmi": pa.array([], pa.float64())})).to_pandas()
    cand = cand.sort_values(["pmi", "term_a", "term_b"],
                            ascending=[False, True, True]
                            ).head(TOP_PAIRS)
    return pa.table({
        "term_a": pa.array(cand.term_a.tolist(), pa.string()),
        "term_b": pa.array(cand.term_b.tolist(), pa.string()),
        "n_co": pa.array(cand.n_co.to_numpy(np.int64), pa.int64()),
        "pmi": pa.array(cand.pmi.to_numpy(np.float64), pa.float64()),
    })


def sql_pmi_pairs() -> str:
    from raysearch.pipelines.search_queries import _TOK_CTES

    return f"""
WITH {_TOK_CTES},
pres AS (SELECT DISTINCT doc_id, term FROM tf),
dfc AS (SELECT term, count(*)::DOUBLE AS df FROM pres GROUP BY term),
elig AS (SELECT term, df FROM dfc
         WHERE df >= {MIN_DF}
           AND df <= floor({MAX_DF_FRAC}
                           * (SELECT count(*) FROM documents))),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS n_co
  FROM pres a
  JOIN pres b ON a.doc_id = b.doc_id AND a.term < b.term
  JOIN elig ea ON ea.term = a.term
  JOIN elig eb ON eb.term = b.term
  GROUP BY a.term, b.term
),
scored AS (
  SELECT p.term_a, p.term_b, p.n_co,
         round(ln(((SELECT count(*) FROM documents)::DOUBLE
                   * p.n_co::DOUBLE) / (ea.df * eb.df)), 6) AS pmi
  FROM pairs p
  JOIN elig ea ON ea.term = p.term_a
  JOIN elig eb ON eb.term = p.term_b
  WHERE p.n_co >= {MIN_CO}
)
SELECT term_a, term_b, n_co, pmi
FROM scored
ORDER BY pmi DESC, term_a, term_b
LIMIT {TOP_PAIRS}
"""


QUERIES = {"pmi_pairs": pmi_pairs}
ORACLE_SQL = {"pmi_pairs": sql_pmi_pairs()}
