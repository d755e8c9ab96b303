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


# window collocation variant: co-occurrence EVENTS within a ±W-token
# sliding window (Church & Hanks 1990), not document-level presence —
# the granularity between pmi_top_bigrams (adjacent, W=1) and
# pmi_pairs (whole-document)
WINDOW_W = 5
MIN_CO_W = 3


def pmi_window_pairs(sf_dir: str) -> pa.Table:
    """Top-{k} collocations by windowed PMI: an event is an ordered
    token-position pair (i < j, j - i <= {W}) inside one document
    whose two terms differ and are both df-eligible; pairs are
    counted unordered. PMI = ln(T * c_ab / (cf_a * cf_b)) with T =
    total corpus tokens and cf = collection frequency (both from the
    index stats/lexicon — no extra corpus pass).

    Scale shape mirrors pmi_pairs: eligible (term, cf) broadcast once
    (df floor + stopword ceiling bound the per-token fan-out, which
    here is <= W per position regardless of doc length — windowing is
    what makes collocation mining linear in corpus size), per-batch
    pair partials collapse map-side via integer code keys (one
    np.unique factorization per batch, the d-shift trick instead of a
    per-doc loop), ONE pair-hash bucketed exchange, per-bucket
    score+top-k, driver merges buckets x k rows."""
    import ray
    import ray.data

    import pyarrow.dataset as pads

    from raysearch.numutil import round6
    from raysearch.pipelines.search_queries import (_concat_ds,
                                                    _docs_path,
                                                    cached_index)
    from raysearch.pipelines.textops import _tokens, md5_prefix_ints
    from raysearch.stats import load_stats

    idx = cached_index(sf_dir)
    st = load_stats(idx)
    n_docs = float(st["n_docs"])
    total_tokens = float(st["total_tokens"])

    lex = pads.dataset(f"{idx}/lexicon").to_table(
        columns=["term", "df", "cf"],
        filter=(pads.field("df") >= MIN_DF)
        & (pads.field("df") <= int(MAX_DF_FRAC * n_docs)))
    elig_terms = np.asarray(lex["term"].to_pylist(), dtype=object)
    order = np.argsort(elig_terms)
    elig_terms = elig_terms[order]
    elig_cf = lex["cf"].to_numpy().astype(np.float64)[order]
    elig_ref = ray.put((elig_terms, elig_cf))
    nb = 64

    empty = pa.table({"bucket": pa.array([], pa.int64()),
                      "term_a": pa.array([], pa.string()),
                      "term_b": pa.array([], pa.string()),
                      "n_co": pa.array([], pa.int64())})

    def emit_pairs(batch: pa.Table) -> pa.Table:
        terms, _ = ray.get(elig_ref)
        toks = _tokens(batch)
        offs = np.asarray(toks.offsets)
        flat = np.asarray(toks.values.to_pandas(), dtype=object)
        if not len(flat) or not len(terms):
            return empty
        n = np.diff(offs)
        doc_rep = np.repeat(np.arange(len(n)), n)
        uniq, codes = np.unique(flat, return_inverse=True)
        pos = np.searchsorted(terms, uniq)
        pos_c = np.minimum(pos, len(terms) - 1)
        elig_u = terms[pos_c] == uniq
        elig_tok = elig_u[codes]
        lo_l, hi_l = [], []
        for d in range(1, WINDOW_W + 1):
            if len(codes) <= d:
                break
            a, b = codes[:-d], codes[d:]
            m = ((doc_rep[:-d] == doc_rep[d:]) & (a != b)
                 & elig_tok[:-d] & elig_tok[d:])
            if m.any():
                # np.unique sorts, so code order == lexicographic
                # term order — min/max on codes IS the unordered key
                lo_l.append(np.minimum(a[m], b[m]))
                hi_l.append(np.maximum(a[m], b[m]))
        if not lo_l:
            return empty
        lo = np.concatenate(lo_l).astype(np.int64)
        hi = np.concatenate(hi_l).astype(np.int64)
        key, cnt = np.unique(lo * len(uniq) + hi, return_counts=True)
        ta = uniq[key // len(uniq)]
        tb = uniq[key % len(uniq)]
        joined = np.char.add(np.char.add(ta.astype(str), "\x1f"),
                             tb.astype(str)).astype(object)
        h = md5_prefix_ints(joined, 8)
        return pa.table({
            "bucket": pa.array((h % np.uint64(nb)).astype(np.int64),
                               pa.int64()),
            "term_a": pa.array(ta.tolist(), pa.string()),
            "term_b": pa.array(tb.tolist(), pa.string()),
            "n_co": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    out_schema = pa.table({"term_a": pa.array([], pa.string()),
                           "term_b": pa.array([], pa.string()),
                           "n_co": pa.array([], pa.int64()),
                           "pmi": pa.array([], pa.float64())})

    def score_bucket(g: pd.DataFrame) -> pa.Table:
        terms, cfs = ray.get(elig_ref)
        tot = (g.groupby(["term_a", "term_b"], as_index=False)
               ["n_co"].sum())
        tot = tot[tot.n_co >= MIN_CO_W]
        if not len(tot):
            return out_schema
        cfa = cfs[np.searchsorted(terms, tot.term_a.to_numpy(object))]
        cfb = cfs[np.searchsorted(terms, tot.term_b.to_numpy(object))]
        c = tot.n_co.to_numpy(np.float64)
        tot["pmi"] = round6(np.log((total_tokens * c) / (cfa * cfb)))
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
        out_schema).to_pandas()
    cand = cand.sort_values(["pmi", "term_a", "term_b"],
                            ascending=[False, True, True]
                            ).head(TOP_PAIRS)
    return pa.table({
        "term_a": pa.array(cand.term_a.tolist(), pa.string()),
        "term_b": pa.array(cand.term_b.tolist(), pa.string()),
        "n_co": pa.array(cand.n_co.to_numpy(np.int64), pa.int64()),
        "pmi": pa.array(cand.pmi.to_numpy(np.float64), pa.float64()),
    })


def sql_pmi_window_pairs() -> str:
    from raysearch.pipelines.search_queries import _TOK_CTES

    return rf"""
WITH {_TOK_CTES},
dfc AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tf
        GROUP BY term),
elig AS (SELECT term, df FROM dfc
         WHERE df >= {MIN_DF}
           AND df <= floor({MAX_DF_FRAC}
                           * (SELECT count(*) FROM documents))),
cfc AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
tot AS (SELECT sum(dl)::DOUBLE AS t FROM dl),
t2 AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
       FROM documents),
ptok AS (
  SELECT doc_id, unnest(toks) AS tok,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM t2
),
pairs AS (
  SELECT least(a.tok, b.tok) AS term_a,
         greatest(a.tok, b.tok) AS term_b,
         count(*)::BIGINT AS n_co
  FROM ptok a
  JOIN ptok b ON a.doc_id = b.doc_id
             AND b.pos - a.pos BETWEEN 1 AND {WINDOW_W}
             AND a.tok <> b.tok
  JOIN elig ea ON ea.term = a.tok
  JOIN elig eb ON eb.term = b.tok
  GROUP BY 1, 2
),
scored AS (
  SELECT p.term_a, p.term_b, p.n_co,
         round(ln((tot.t * p.n_co::DOUBLE) / (ca.cf * cb.cf)), 6)
           AS pmi
  FROM pairs p
  CROSS JOIN tot
  JOIN cfc ca ON ca.term = p.term_a
  JOIN cfc cb ON cb.term = p.term_b
  WHERE p.n_co >= {MIN_CO_W}
)
SELECT term_a, term_b, n_co, pmi
FROM scored
ORDER BY pmi DESC, term_a, term_b
LIMIT {TOP_PAIRS}
"""


QUERIES = {"pmi_pairs": pmi_pairs,
           "pmi_window_pairs": pmi_window_pairs}
ORACLE_SQL = {"pmi_pairs": sql_pmi_pairs(),
              "pmi_window_pairs": sql_pmi_window_pairs()}
