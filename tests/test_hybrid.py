"""Hybrid retrieval (RRF fusion): the fused ranking must be exactly
reconstructible from its two component rankings, self-retrieval must
benefit from the vector side, and the tie order is deterministic."""

import numpy as np
import pandas as pd

from raysearch.numutil import round6
from raysearch.pipelines import search_queries as Q
from raysearch.pipelines.similarity import N_QUERY_VECS, ann_topk

SF = "/root/testdata/sf0.001"


def test_hybrid_reconstructs_from_components(ray_session):
    bm = Q.bm25_topk(SF).to_pandas()
    an = ann_topk(SF).to_pandas()
    hy = Q.hybrid_topk(SF).to_pandas()
    assert set(hy.query_id) == set(range(N_QUERY_VECS))
    for qid in range(N_QUERY_VECS):
        scores: dict[int, float] = {}
        for _, r in bm[bm.query_id == qid].iterrows():
            scores[int(r.doc_id)] = scores.get(int(r.doc_id), 0.0) \
                + 1.0 / (Q.RRF_K + int(r["rank"]))
        for _, r in an[an.query_vec_id == qid].iterrows():
            scores[int(r.vec_id)] = scores.get(int(r.vec_id), 0.0) \
                + 1.0 / (Q.RRF_K + int(r["rank"]))
        want = sorted(((round6(np.array([s]))[0], d)
                       for d, s in scores.items()),
                      key=lambda t: (-t[0], t[1]))[:Q.TOPK]
        got = hy[hy.query_id == qid].sort_values("rank")
        assert got.doc_id.tolist() == [d for _, d in want]
        assert got.rrf_score.tolist() == [s for s, _ in want]
        # ranks are 1..10 with no gaps
        assert got["rank"].tolist() == list(range(1, Q.TOPK + 1))


def test_hybrid_vector_side_lifts_self_doc(ray_session):
    """vec_id == query id has cosine 1.0 (rank 1 on the vector side),
    so the query's own document must appear in the fused top-10 even
    when BM25 alone would not rank it first."""
    hy = Q.hybrid_topk(SF).to_pandas()
    for qid in range(N_QUERY_VECS):
        assert qid in set(hy[hy.query_id == qid].doc_id), qid


def test_bool_and_docs_properties(ray_session):
    """Conjunctive retrieval: every returned doc contains every
    distinct query term under the index tokenizer; queries whose term
    set includes a token absent from the corpus return nothing."""
    import pyarrow.parquet as pq

    from raysearch.score import query_term_weights

    got = Q.bool_and_docs(SF).to_pandas()
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    toksets = {int(r.doc_id): set(str(r.text).lower().split())
               for r in docs.itertuples()}
    corpus_vocab = set().union(*toksets.values())
    for qid, qtext in enumerate(Q.DOC_QUERIES):
        terms = {t for t, _ in query_term_weights(qtext)}
        hits = set(got[got.query_id == qid].doc_id)
        if not terms <= corpus_vocab:
            assert not hits, (qid, terms - corpus_vocab)
            continue
        for d in hits:
            assert terms <= toksets[d], (qid, d)
        # completeness: any doc containing all terms IS returned
        want = {d for d, ts in toksets.items() if terms <= ts}
        assert hits == want, qid


def test_more_like_this_properties(ray_session):
    """Related-docs retrieval: the source doc never appears in its own
    result list, ranks are gapless 1..10, and scores are positive and
    non-increasing."""
    mlt = Q.more_like_this(SF).to_pandas()
    for src in Q.MLT_DOCS:
        sub = mlt[mlt.src_doc_id == src].sort_values("rank")
        assert src not in set(sub.doc_id)
        assert sub["rank"].tolist() == list(range(1, Q.TOPK + 1))
        s = sub.score.to_numpy()
        assert (s > 0).all() and (np.diff(s) <= 0).all()


def test_segment_stats_invariants(ray_session):
    """Per-segment manifest stats must reconcile with the corpus and
    the files on disk: doc and token totals match doc_lengths, byte
    sizes match the actual segment files."""
    import os

    from raysearch.pipelines.search_queries import (cached_index,
                                                    segment_stats)
    from raysearch.segments import part_dirname

    st = segment_stats(SF).to_pandas()
    dl = Q.doc_lengths(SF).to_pandas()
    assert st.n_docs.sum() == len(dl)
    assert st.sum_dl.sum() == dl.dl.sum()
    assert (st.n_postings >= st.n_terms).all()
    idx = cached_index(SF)
    for r in st.itertuples():
        pd_ = part_dirname(idx, int(r.part))
        assert os.path.getsize(
            os.path.join(pd_, "postings.parquet")) == r.postings_bytes
        assert os.path.getsize(
            os.path.join(pd_, "doclens.parquet")) == r.doclens_bytes
