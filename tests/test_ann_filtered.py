"""Filtered vector search: predicate respected, scores consistent
with the unfiltered exact path (oracle parity in test_entry_parity)."""

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_filter_respected_and_scores_match_unfiltered(ray_session):
    from raysearch.pipelines.similarity import (FILTER_LABELS,
                                                ann_filtered_topk,
                                                ann_topk)

    res = ann_filtered_topk(SF).to_pandas()
    lab = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                        columns=["vec_id", "label"]).to_pandas()
    label = dict(zip(lab.vec_id, lab.label))
    assert len(res) > 0
    assert all(label[v] in FILTER_LABELS for v in res.vec_id)
    # pre-filtering never changes a surviving pair's cosine: any
    # (query, vec) also present in the unfiltered top-k has the same
    # rounded score
    full = ann_topk(SF).to_pandas()
    fmap = {(q, v): c for q, v, c in zip(full.query_vec_id,
                                         full.vec_id, full.cos)}
    shared = 0
    for q, v, c in zip(res.query_vec_id, res.vec_id, res.cos):
        if (q, v) in fmap:
            assert fmap[(q, v)] == c
            shared += 1
    assert shared > 0
