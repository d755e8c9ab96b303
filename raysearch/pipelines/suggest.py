"""Phrase suggestion ("did you mean") — the Elasticsearch phrase
suggester shape, completing the suggester family: term_suggest is
context-free popularity, spellfix_topk is per-term best correction,
and THIS op picks corrections by BIGRAM CONTEXT, so the same typo can
correct differently in different phrases ('strem' -> 'stream' after
'sort the', but a lone 'quer' -> 'query').

Contract (ES phrase suggester with max_errors = 1, laplace
smoothing alpha = 0.5): for each query, candidate phrases are the
original plus every single-position replacement by a lexicon term
within 1 Levenshtein edit (DuckDB byte-metric, the contract
rankex.levenshtein matches); each candidate is scored by the bigram
language model sum over adjacent pairs of
ln((c(w1, w2) + 0.5) / (cf(w1) + 0.5 * V)), with c the corpus
adjacent-pair count, cf the lexicon term frequency, V the vocabulary
size; the suggestion is the (round6 score DESC, text ASC) argmax.

Scale shape: candidate generation scans the LEXICON with a
byte-length prefilter (never the corpus; at 10^9-term vocabularies
this is the fuzzy_topk distributed-lexicon-fragment scan). The one
corpus pass counts ONLY pairs over the ~|positions x expansions|
relevant tokens: tokens integer-code against the broadcast relevant
list (searchsorted), pair keys bincount per batch, and the exchange
carries <= K^2 (key, n) partial rows per batch — corpus text never
leaves its block, and the driver merge is a tiny groupby-sum.
The reference engine has no suggester at all (its query path stops at
the ranked list, /root/reference/src/lib.rs:374-411).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

ALPHA = 0.5
MAX_EDITS = 1

# multi-word queries with one deliberate <=1-edit typo each, over the
# documents-table vocabulary; neighbors are ambiguous on purpose
# ('quer' -> query; 'strem' -> stream; 'roww' -> row — note plain
# Levenshtein: a transposition like 'rwo' is 2 edits and would NOT
# expand) so the bigram context does real work
SUGGEST_QUERIES = [
    "fast hach join",
    "merge sort strem",
    "windw batch data",
    "dup roww line",
    "slow quer plan",
]


def _expansions(tok: str, vocab: list[str]) -> list[str]:
    """Lexicon terms within MAX_EDITS of ``tok`` (byte-length
    prefilter; byte-metric levenshtein shared with the oracle)."""
    from raysearch.pipelines.rankex import levenshtein

    tb = len(tok.encode("utf-8"))
    out = []
    for v in vocab:
        if abs(len(v.encode("utf-8")) - tb) > MAX_EDITS:
            continue
        if levenshtein(tok, v) <= MAX_EDITS:
            out.append(v)
    return out


def _candidates(qtoks: list[str], vocab: list[str]
                ) -> list[tuple[int, str | None]]:
    """(rpos, rterm) candidate list: the identity phrase (-1, None)
    plus one entry per (position, <=1-edit lexicon term)."""
    cands: list[tuple[int, str | None]] = [(-1, None)]
    for i, t in enumerate(qtoks):
        for v in _expansions(t, vocab):
            cands.append((i, v))
    return cands


def _pair_counts(sf_dir: str, rel: np.ndarray) -> dict:
    """Corpus adjacent-pair counts restricted to rel x rel (sorted
    unique token array, broadcast into the kernel closure). One
    streaming pass; per batch the emitted rows are the OBSERVED
    relevant pairs only."""
    import ray.data

    from raysearch.pipelines.textops import _tokens

    relix = pd.Index(rel)
    k = len(rel)
    empty = pa.table({"key": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})

    def kern(batch: pa.Table) -> pa.Table:
        toks = _tokens(batch)
        offs = np.asarray(toks.offsets)
        total = int(offs[-1])
        if total < 2:
            return empty
        flat = toks.values.to_pandas()
        code = relix.get_indexer(flat)
        valid = np.ones(total - 1, bool)
        starts = offs[1:-1] - 1  # pair indexes that straddle docs
        starts = starts[(starts >= 0) & (starts < total - 1)]
        valid[starts] = False
        c1, c2 = code[:-1], code[1:]
        m = valid & (c1 >= 0) & (c2 >= 0)
        if not m.any():
            return empty
        key = c1[m] * k + c2[m]
        cnt = np.bincount(key)
        nz = np.nonzero(cnt)[0]
        return pa.table({"key": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])
    parts = [b.to_pandas() for b in
             ds.map_batches(kern, batch_format="pyarrow",
                            zero_copy_batch=True)
             .iter_batches(batch_format="pyarrow")]
    if not parts:
        return {}
    agg = (pd.concat(parts).groupby("key", as_index=False)["n"].sum())
    return {(rel[kk // k], rel[kk % k]): int(n)
            for kk, n in zip(agg.key, agg.n)}


def phrase_suggest(sf_dir: str) -> pa.Table:
    """Best context-aware correction per query (see module
    docstring). Output: (query_id, suggestion, score)."""
    import pyarrow.dataset as pads

    from raysearch.numutil import round6
    from raysearch.pipelines.search_queries import cached_index
    from raysearch.stats import load_stats
    from raysearch.tokenize import tokenize_query

    idx = cached_index(sf_dir)
    lex = pads.dataset(os.path.join(idx, "lexicon")).to_table(
        columns=["term", "cf"])
    vocab = lex["term"].to_pylist()
    cf = dict(zip(vocab, lex["cf"].to_pylist()))
    v_sz = float(load_stats(idx)["vocab_size"])

    qtoks = [tokenize_query(q) for q in SUGGEST_QUERIES]
    cands = [_candidates(ts, vocab) for ts in qtoks]
    rel = sorted({t for ts in qtoks for t in ts}
                 | {rt for cs in cands for _, rt in cs if rt is not None})
    pair_c = _pair_counts(sf_dir, np.array(rel, dtype=object))

    def lm(words: list[str]) -> float:
        s = 0.0
        for w1, w2 in zip(words, words[1:]):
            c = pair_c.get((w1, w2), 0)
            s += float(np.log((c + ALPHA)
                              / (cf.get(w1, 0) + ALPHA * v_sz)))
        return s

    out_q, out_t, out_s = [], [], []
    for qid, ts in enumerate(qtoks):
        if len(ts) < 2:
            continue  # no bigram evidence — the ES suggester's gate
        best = None
        for rpos, rterm in cands[qid]:
            words = [rterm if j == rpos else t for j, t in enumerate(ts)]
            text = " ".join(words)
            sc = round6(lm(words))
            # total order (score DESC, text ASC) — ties deterministic
            key = (-sc, text)
            if best is None or key < best[0]:
                best = (key, text, sc)
        out_q.append(qid)
        out_t.append(best[1])
        out_s.append(best[2])
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "suggestion": pa.array(out_t, pa.string()),
        "score": pa.array(out_s, pa.float64()),
    })


def _qt_values() -> str:
    from raysearch.tokenize import tokenize_query

    rows = []
    for qid, q in enumerate(SUGGEST_QUERIES):
        for p, t in enumerate(tokenize_query(q)):
            rows.append(f"({qid}, {p}, '{t}')")
    return ", ".join(rows)


def sql_phrase_suggest() -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(t) AS tok, unnest(range(len(t)))::BIGINT AS p
  FROM toks
),
uni AS (SELECT tok, count(*)::DOUBLE AS cf FROM pos GROUP BY tok),
vv AS (SELECT count(*)::DOUBLE AS v FROM uni),
big AS (
  SELECT a.tok AS w1, b.tok AS w2, count(*)::DOUBLE AS c
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  GROUP BY a.tok, b.tok
),
qt(query_id, p, term) AS (VALUES {_qt_values()}),
cand AS (
  SELECT q.query_id, q.p AS rpos, u.tok AS rterm
  FROM qt q JOIN uni u ON levenshtein(q.term, u.tok) <= {MAX_EDITS}
  UNION ALL
  SELECT DISTINCT query_id, -1, NULL FROM qt
),
ptok AS (
  SELECT c.query_id, c.rpos, c.rterm, q.p,
         CASE WHEN q.p = c.rpos THEN c.rterm ELSE q.term END AS tok
  FROM cand c JOIN qt q ON q.query_id = c.query_id
),
pairs AS (
  SELECT a.query_id, a.rpos, coalesce(a.rterm, '') AS rkey,
         a.tok AS w1, b.tok AS w2
  FROM ptok a
  JOIN ptok b ON a.query_id = b.query_id AND a.rpos = b.rpos
    AND coalesce(a.rterm, '') = coalesce(b.rterm, '')
    AND b.p = a.p + 1
),
scored AS (
  SELECT p.query_id, p.rpos, p.rkey,
         sum(ln((coalesce(big.c, 0) + {ALPHA})
                / (coalesce(u.cf, 0) + {ALPHA} * vv.v))) AS score
  FROM pairs p
  LEFT JOIN big ON big.w1 = p.w1 AND big.w2 = p.w2
  LEFT JOIN uni u ON u.tok = p.w1
  CROSS JOIN vv
  GROUP BY p.query_id, p.rpos, p.rkey
),
sug AS (
  SELECT s.query_id, s.rpos, s.rkey, s.score,
         string_agg(CASE WHEN q.p = s.rpos THEN s.rkey ELSE q.term END,
                    ' ' ORDER BY q.p) AS suggestion
  FROM scored s JOIN qt q ON q.query_id = s.query_id
  GROUP BY s.query_id, s.rpos, s.rkey, s.score
),
ranked AS (
  SELECT query_id, suggestion, round(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, suggestion)
           AS rn
  FROM sug
)
SELECT query_id::BIGINT AS query_id, suggestion, score
FROM ranked WHERE rn = 1
"""


# ---- completion suggester (autocomplete) ----

# prefixes over the documents-table vocabulary: high-fanout ('s'),
# mid ('ha', 'wi'), an exact-term prefix that is itself a term
# ('sort'), and a no-match probe ('zz') which must yield zero rows
COMPLETION_PREFIXES: list[str] = ["s", "ha", "wi", "qu", "sort", "zz"]
COMPLETION_K = 3


def completion_suggest(sf_dir: str) -> pa.Table:
    """The Elasticsearch completion suggester (autocomplete): for each
    prefix, the top-{k} lexicon terms extending it, weighted by
    collection frequency (cf DESC, term ASC ties) — the suggester
    family's fourth member (term_suggest = popularity did-you-mean,
    spellfix_topk = per-term correction, phrase_suggest = contextual
    phrase correction, THIS = prefix completion).

    Plan: a RANGE SCAN of the sorted global lexicon per prefix
    (searchsorted [prefix, next-sibling) bounds — prefix_topk's
    expansion scan), weights read from the lexicon's cf column that
    the build's tree-merge already produced; no corpus pass, no
    posting reads. At 10^9-term vocabularies the probe touches only
    the lexicon fragments overlapping each prefix interval, and an ES
    -grade deployment would serve it from an FST materialized off the
    same lexicon stream. The reference has no suggester at all
    (/root/reference/src/lib.rs:374-411).
    """
    from raysearch.pipelines.search_queries import cached_index

    return completion_for_index(cached_index(sf_dir),
                                COMPLETION_PREFIXES, COMPLETION_K)


def completion_for_index(idx: str, prefixes: list[str],
                         k: int) -> pa.Table:
    """Completion scan over an arbitrary built index (shared by the
    registry entry and `cli suggest`)."""
    import pyarrow.dataset as pads

    lex = pads.dataset(os.path.join(idx, "lexicon")).to_table(
        columns=["term", "cf"])
    order = np.argsort(np.asarray(lex["term"].to_pylist(), dtype=object),
                       kind="stable")
    terms = np.asarray(lex["term"].to_pylist(), dtype=object)[order]
    cf = lex["cf"].to_numpy(zero_copy_only=False)[order]
    out_p, out_t, out_r, out_w = [], [], [], []
    for p in prefixes:
        lo = np.searchsorted(terms, p)
        hi = np.searchsorted(terms, p[:-1] + chr(ord(p[-1]) + 1))
        cand_t, cand_w = terms[lo:hi], cf[lo:hi]
        # top-k by (cf DESC, term ASC): lexsort on (term, -cf)
        pick = np.lexsort((cand_t, -cand_w))[:k]
        for r, i in enumerate(pick, 1):
            out_p.append(p)
            out_t.append(str(cand_t[i]))
            out_r.append(r)
            out_w.append(int(cand_w[i]))
    return pa.table({
        "prefix": pa.array(out_p, pa.string()),
        "term": pa.array(out_t, pa.string()),
        "rank": pa.array(out_r, pa.int64()),
        "weight": pa.array(out_w, pa.int64()),
    })


def sql_completion_suggest() -> str:
    from raysearch.pipelines.search_queries import _TOK_CTES

    pvals = ", ".join(f"('{p}')" for p in COMPLETION_PREFIXES)
    return f"""
WITH {_TOK_CTES},
cf AS (SELECT term, sum(tf)::BIGINT AS weight FROM tf GROUP BY term),
p(prefix) AS (VALUES {pvals}),
m AS (
  SELECT p.prefix, cf.term, cf.weight,
         row_number() OVER (PARTITION BY p.prefix
                            ORDER BY cf.weight DESC, cf.term) AS rank
  FROM p JOIN cf ON starts_with(cf.term, p.prefix)
)
SELECT prefix, term, rank::BIGINT AS rank, weight
FROM m WHERE rank <= {COMPLETION_K}
"""


QUERIES = {
    "phrase_suggest": phrase_suggest,
    "completion_suggest": completion_suggest,
}

ORACLE_SQL = {
    "phrase_suggest": sql_phrase_suggest(),
    "completion_suggest": sql_completion_suggest(),
}
