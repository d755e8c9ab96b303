"""Corpus-trained language-model quality signal — the classic
perplexity-style pre-training filter, two streaming passes:

1. TRAIN: global bigram counts c2(w1 w2) and first-position unigram
   counts c1(w1), map-side partial-counted (one row per distinct gram
   per batch — the combiner pattern) then summed by one groupby; the
   resulting model is vocabulary-bounded and broadcast once via
   ray.put.
2. SCORE: per document, mean log P(w2|w1) = mean ln(c2/c1) over its
   bigrams, fully vectorized (factorized lookups + np.add.at per-doc
   sums). Documents with no bigrams (< 2 tokens) are excluded on both
   sides.

Counts come from the corpus being scored, so every observed bigram
has c2 >= 1 — no smoothing needed and the oracle is exact SQL.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raysearch.numutil import round6
from raysearch.pipelines.textops import _tokens

_DOCS = "documents.parquet"


def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, _DOCS),
                                 columns=["doc_id", "text"])


def _doc_bigrams(batch: pa.Table):
    """(doc_idx, w1, bigram) arrays for one batch (cross-doc joins
    masked)."""
    toks = _tokens(batch)
    dl = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = np.asarray(toks.flatten().to_pylist(), dtype=object)
    if len(flat) < 2:
        e = np.zeros(0, dtype=np.int64)
        return e, np.zeros(0, object), np.zeros(0, object)
    doc_idx = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
    same = doc_idx[:-1] == doc_idx[1:]
    w1 = flat[:-1][same]
    bg = (flat[:-1] + " " + flat[1:])[same]
    return doc_idx[:-1][same], w1, bg


def _train(sf_dir: str):
    """Global (c1_first, c2) count Series via map-side partials + one
    groupby; returns a ray.put ref to the broadcast model."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, w1, bg = _doc_bigrams(batch)
        u1, n1 = np.unique(w1, return_counts=True)
        u2, n2 = np.unique(bg, return_counts=True)
        return pa.table({
            "gram": pa.array(np.concatenate([u1, u2]).tolist(),
                             pa.string()),
            "kind": pa.array([1] * len(u1) + [2] * len(u2), pa.int64()),
            "n": pa.array(np.concatenate([n1, n2]), pa.int64()),
        })

    counts = (_read_docs(sf_dir)
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["kind", "gram"])
              .aggregate(Sum("n", alias_name="n"))).to_pandas()
    c1 = counts[counts.kind == 1].set_index("gram")["n"]
    c2 = counts[counts.kind == 2].set_index("gram")["n"]
    return ray.put((c1, c2))


def bigram_logprob(sf_dir: str) -> pa.Table:
    """(doc_id, n_bigrams, logprob): mean ln c2(w1w2)/c1(w1) per doc."""
    import ray

    model_ref = _train(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        c1, c2 = ray.get(model_ref)
        doc_idx, w1, bg = _doc_bigrams(batch)
        n_docs = batch.num_rows
        if len(bg) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "logprob": pa.array([], pa.float64())})
        lp = np.log(c2.reindex(bg).to_numpy(np.float64)
                    / c1.reindex(w1).to_numpy(np.float64))
        sums = np.zeros(n_docs)
        np.add.at(sums, doc_idx, lp)
        cnt = np.zeros(n_docs, dtype=np.int64)
        np.add.at(cnt, doc_idx, 1)
        keep = cnt > 0
        doc_ids = batch["doc_id"].to_numpy()[keep]
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_bigrams": pa.array(cnt[keep], pa.int64()),
            "logprob": pa.array(round6(sums[keep] / cnt[keep]),
                                pa.float64()),
        })

    out = _read_docs(sf_dir).map_batches(score, batch_format="pyarrow",
                                         zero_copy_batch=True)
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow"))


def sql_bigram_logprob() -> str:
    return r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
           FROM documents),
b AS (
  SELECT doc_id,
    unnest(list_transform(range(1, greatest(len(toks), 1)),
           i -> toks[i])) AS w1,
    unnest(list_transform(range(1, greatest(len(toks), 1)),
           i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM t
),
c2 AS (SELECT bg, count(*) AS c FROM b GROUP BY bg),
c1 AS (SELECT w1 AS w, count(*) AS c FROM b GROUP BY w1),
s AS (
  SELECT b.doc_id, count(*) AS n,
         sum(ln(c2.c::DOUBLE / c1.c)) AS lp
  FROM b JOIN c2 USING (bg) JOIN c1 ON c1.w = b.w1
  GROUP BY b.doc_id
)
SELECT doc_id, n::BIGINT AS n_bigrams, round(lp / n, 6) AS logprob
FROM s
"""


QUERIES = {"bigram_logprob": bigram_logprob}
ORACLE_SQL = {"bigram_logprob": sql_bigram_logprob()}
