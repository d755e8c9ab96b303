"""Structural properties for the term-significance ops (oracle value
parity is covered by test_entry_parity / test_randomized_parity)."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_sig_terms_structure(ray_session):
    from raysearch.pipelines.search_queries import TOPK, bm25_topk
    from raysearch.pipelines.significance import SIG_K, sig_terms_topk

    sig = sig_terms_topk(SF).to_pandas()
    hits = bm25_topk(SF).to_pandas()
    k_per_q = hits.groupby("query_id").size().to_dict()
    assert set(sig.query_id) == set(hits.query_id)
    for q, grp in sig.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= SIG_K
    # fg_df bounded by the query's hit count; bg df can never be
    # smaller than fg_df; JLH > 0 requires fg% > bg%
    assert (sig.fg_df >= 1).all()
    assert all(f <= k_per_q[q] for q, f in zip(sig.query_id, sig.fg_df))
    assert (sig.df >= sig.fg_df).all()
    assert (sig.fg_df <= TOPK).all()
    n_docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                           columns=["doc_id"]).num_rows
    fgp = sig.fg_df.to_numpy(float) / np.array(
        [k_per_q[q] for q in sig.query_id], float)
    bgp = sig.df.to_numpy(float) / n_docs
    assert ((sig.score > 0) == (fgp > bgp)).all()


def test_sig_terms_foreground_brute_force(ray_session):
    # fg_df recomputed from raw text must match the pipeline's
    from raysearch.pipelines.search_queries import bm25_topk
    from raysearch.pipelines.significance import sig_terms_topk

    sig = sig_terms_topk(SF).to_pandas()
    hits = bm25_topk(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    toks = {int(r.doc_id): set(r.text.lower().split())
            for r in docs.itertuples()}
    fg_docs = hits.groupby("query_id").doc_id.apply(list).to_dict()
    for q, t, f in zip(sig.query_id, sig.term, sig.fg_df):
        assert f == sum(t in toks[d] for d in fg_docs[q]), (q, t)


def test_source_term_kl_brute_force(ray_session):
    # independent recomputation: direct sum p*ln(p/q) per source (a
    # DIFFERENT expression tree than the pipeline's mergeable
    # decomposition — agreement to 1e-9 proves the algebra, round6
    # proves the contract); KL >= 0 by Gibbs' inequality
    from collections import Counter

    from raysearch.numutil import round6
    from raysearch.pipelines.significance import source_term_kl

    got = source_term_kl(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["text", "source"]).to_pandas()
    counts: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for r in docs.itertuples():
        toks = r.text.lower().split()
        counts.setdefault(r.source, Counter()).update(toks)
        corpus.update(toks)
    total = sum(corpus.values())
    assert list(got.source) == sorted(counts)
    assert (got.kl >= 0).all()
    for r in got.itertuples():
        c = counts[r.source]
        t_s = sum(c.values())
        assert r.n_tokens == t_s and r.vocab == len(c)
        kl = sum((k / t_s) * np.log((k / t_s) / (corpus[t] / total))
                 for t, k in c.items())
        # r.kl is round6-quantized; the brute-force sum is not
        assert abs(r.kl - kl) < 1e-6
        assert r.kl == float(round6(np.float64(r.kl)))


def test_source_overlap_brute_force(ray_session):
    # full independent recomputation in pandas (a second oracle)
    from raysearch.numutil import round6
    from raysearch.pipelines.significance import source_vocab_overlap

    got = source_vocab_overlap(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["text", "source"]).to_pandas()
    vocab: dict[str, set] = {}
    for r in docs.itertuples():
        vocab.setdefault(r.source, set()).update(r.text.lower().split())
    rows = []
    for a in sorted(vocab):
        for b in sorted(vocab):
            if a >= b:
                continue
            sh = len(vocab[a] & vocab[b])
            if sh:
                rows.append((a, b, sh, len(vocab[a]), len(vocab[b]),
                             float(round6(np.float64(
                                 sh / (len(vocab[a]) + len(vocab[b])
                                       - sh))))))
    want = pd.DataFrame(rows, columns=["source_a", "source_b", "shared",
                                       "n_a", "n_b", "jaccard"])
    got2 = got.astype({"shared": np.int64, "n_a": np.int64,
                       "n_b": np.int64})
    pd.testing.assert_frame_equal(
        got2.reset_index(drop=True),
        want.astype({"shared": np.int64, "n_a": np.int64,
                     "n_b": np.int64}).reset_index(drop=True))
