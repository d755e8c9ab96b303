"""Property tests for the round-5 retrieval extensions: allowlist
(filter-query) scoring, RM3 pseudo-relevance feedback, and cascade
rescoring. Oracle value parity is covered by test_entry_parity; these
pin the structural contracts the oracles can't see."""

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_keep_postings_masks():
    from raysearch.query import keep_postings

    docs = np.array([2, 5, 9, 12], np.int64)
    tfs = np.array([1, 2, 3, 4], np.int64)
    dls = np.array([10, 20, 30, 40], np.int64)
    # empty allowlist matches nothing (None means "no filter")
    d, t, l = keep_postings((docs, tfs, dls), np.array([], np.int64))
    assert len(d) == len(t) == len(l) == 0
    # full allowlist is the identity (and returns the same arrays)
    d, t, l = keep_postings((docs, tfs, dls), docs)
    assert d is docs and t is tfs and l is dls
    # partial: keeps exactly the members, rows stay aligned
    d, t, l = keep_postings((docs, tfs, dls),
                            np.array([5, 12, 99], np.int64))
    assert d.tolist() == [5, 12] and t.tolist() == [2, 4]
    assert l.tolist() == [20, 40]


def test_filtered_topk_respects_filter(ray_session):
    from raysearch.pipelines.search_queries import (FILTER_LANG,
                                                    filtered_topk)

    res = filtered_topk(SF).to_pandas()
    meta = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "lang"]).to_pandas()
    lang = dict(zip(meta.doc_id, meta.lang))
    assert len(res) > 0
    assert all(lang[d] == FILTER_LANG for d in res.doc_id)


def test_filtered_topk_subset_of_unfiltered_candidates(ray_session):
    # with whole-corpus stats, a filtered doc's score equals its
    # unfiltered score: every (query, doc) hit in the filtered result
    # must appear in a deep unfiltered run with the SAME score
    from raysearch.pipelines.search_queries import (cached_index,
                                                    filtered_topk,
                                                    topk_rounded_for_index)

    res = filtered_topk(SF).to_pandas()
    deep = topk_rounded_for_index(cached_index(SF), "bm25",
                                  rank_hi=400, buffer=500).to_pandas()
    full = {(q, d): s for q, d, s in zip(deep.query_id, deep.doc_id,
                                         deep.score)}
    for q, d, s in zip(res.query_id, res.doc_id, res.score):
        assert full[(q, d)] == pytest.approx(s, abs=1e-9)


def test_rescore_candidates_come_from_first_pass(ray_session):
    from raysearch.pipelines.search_queries import (DOC_QUERIES,
                                                    RESCORE_R,
                                                    cached_index,
                                                    rescore_topk)
    from raysearch.query import query_index

    res = rescore_topk(SF).to_pandas()
    first = query_index(cached_index(SF), DOC_QUERIES, k=RESCORE_R,
                        mode="overlap").to_pandas()
    allowed = set(zip(first.query_id, first.doc_id))
    assert len(res) > 0
    assert all((q, d) in allowed for q, d in zip(res.query_id,
                                                 res.doc_id))


def test_rm3_adds_terms_and_keeps_query(ray_session):
    # the expanded second-pass retrieval must still be able to return
    # docs for every query (expansion never drops the original terms)
    from raysearch.pipelines.search_queries import (DOC_QUERIES,
                                                    rm3_topk)

    res = rm3_topk(SF).to_pandas()
    assert set(res.query_id) == set(range(len(DOC_QUERIES)))
    # ranks are 1..k dense per query
    for _, g in res.groupby("query_id"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
