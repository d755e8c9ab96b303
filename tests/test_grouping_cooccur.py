"""Structural contracts for result grouping (collapse/hit counts) and
PMI co-occurrence mining. Oracle value parity is covered by
test_entry_parity; these pin the properties the oracles can't see."""

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_collapse_one_doc_per_group(ray_session):
    from raysearch.pipelines.grouping import COLLAPSE_FIELD, collapse_topk

    res = collapse_topk(SF).to_pandas()
    assert len(res) > 0
    # at most one doc per (query, group value)
    assert not res.duplicated(["query_id", COLLAPSE_FIELD]).any()
    # ranks dense 1..n per query, ordered by (-score, doc_id)
    for _, g in res.groupby("query_id"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        key = list(zip(-g["score"], g["doc_id"]))
        assert key == sorted(key)


def test_collapse_champion_beats_groupmates(ray_session):
    # every collapsed hit must outrank (rounded score desc, doc_id asc)
    # any same-group doc in a deep uncollapsed run of the same query
    from raysearch.pipelines.grouping import COLLAPSE_FIELD, collapse_topk
    from raysearch.pipelines.search_queries import (cached_index,
                                                    topk_rounded_for_index)

    res = collapse_topk(SF).to_pandas()
    deep = topk_rounded_for_index(cached_index(SF), "bm25",
                                  rank_hi=400, buffer=500).to_pandas()
    meta = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", COLLAPSE_FIELD]).to_pandas()
    deep = deep.merge(meta, on="doc_id")
    champ = {(q, s): (-sc, d) for q, s, d, sc in zip(
        res.query_id, res[COLLAPSE_FIELD], res.doc_id, res.score)}
    for q, s, d, sc in zip(deep.query_id, deep[COLLAPSE_FIELD],
                           deep.doc_id, deep.score):
        if (q, s) in champ:
            assert champ[(q, s)] <= (-sc, d)


def test_hit_counts_match_candidate_semantics(ray_session):
    # n_hits == number of docs a deep BM25 run can ever return (docs
    # matching >= 1 term), checked per query via an exhaustive run
    from raysearch.pipelines.grouping import query_hit_counts
    from raysearch.pipelines.search_queries import (cached_index,
                                                    topk_rounded_for_index)

    res = query_hit_counts(SF).to_pandas()
    deep = topk_rounded_for_index(cached_index(SF), "bm25",
                                  rank_hi=10_000,
                                  buffer=10_000).to_pandas()
    got = deep.groupby("query_id").size()
    for qid, n in zip(res.query_id, res.n_hits):
        assert n == got.get(qid, 0)


def test_pmi_respects_floors_and_order(ray_session):
    from raysearch.pipelines.cooccur import (MAX_DF_FRAC, MIN_CO,
                                             MIN_DF, TOP_PAIRS,
                                             pmi_pairs)

    res = pmi_pairs(SF).to_pandas()
    assert 0 < len(res) <= TOP_PAIRS
    assert (res.n_co >= MIN_CO).all()
    assert (res.term_a < res.term_b).all()
    key = list(zip(-res.pmi, res.term_a, res.term_b))
    assert key == sorted(key)
    # df floor: every reported term is actually eligible
    from raysearch.pipelines.search_queries import cached_index
    import pyarrow.dataset as pads
    lex = pads.dataset(os.path.join(cached_index(SF), "lexicon"))
    dfs = lex.to_table(columns=["term", "df"]).to_pandas()
    dfm = dict(zip(dfs.term, dfs.df))
    import pyarrow.parquet as pq_
    n_docs = pq_.read_metadata(
        os.path.join(SF, "documents.parquet")).num_rows
    for t in np.concatenate([res.term_a.to_numpy(object),
                             res.term_b.to_numpy(object)]):
        assert MIN_DF <= dfm[t] <= int(MAX_DF_FRAC * n_docs)
