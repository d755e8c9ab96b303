"""Incremental merge: two disjoint-slice builds merged must be
BYTE-IDENTICAL to a from-scratch build over the union corpus (same
sorted triples per part -> same segment bytes), and queries must agree
exactly. Overlapping doc_ids must be rejected."""

import os

import pytest

from raysearch.build import build_index
from raysearch.config import IndexConfig
from raysearch.corpus import QUERIES
from raysearch.merge import merge_indexes
from raysearch.query import query_index
from raysearch.segments import part_dirname


def _segment_bytes(idx, parts):
    out = {}
    for p in parts:
        d = part_dirname(idx, p)
        for name in ("postings.parquet", "doclens.parquet"):
            with open(os.path.join(d, name), "rb") as f:
                out[(p, name)] = f.read()
    return out


def test_merge_equals_full_build(ray_session, medium_corpus, tmp_path):
    import ray.data

    cfg = IndexConfig(num_parts=6)
    half_a = medium_corpus.slice(0, 1000)
    half_b = medium_corpus.slice(1000)

    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    idx_m, idx_full = str(tmp_path / "m"), str(tmp_path / "full")
    build_index(ray.data.from_arrow(half_a), idx_a, cfg, input_id="ha")
    build_index(ray.data.from_arrow(half_b), idx_b, cfg, input_id="hb")
    build_index(ray.data.from_arrow(medium_corpus), idx_full, cfg,
                input_id="full")

    stats = merge_indexes([idx_a, idx_b], idx_m)
    from raysearch.stats import load_stats

    full_stats = load_stats(idx_full)
    assert stats["n_docs"] == full_stats["n_docs"] == 2000
    assert stats["total_tokens"] == full_stats["total_tokens"]
    assert stats["vocab_size"] == full_stats["vocab_size"]
    assert stats["parts"] == full_stats["parts"]

    assert _segment_bytes(idx_m, stats["parts"]) == \
        _segment_bytes(idx_full, full_stats["parts"])

    r_m = query_index(idx_m, QUERIES, k=10)
    r_f = query_index(idx_full, QUERIES, k=10)
    assert r_m.equals(r_f)


def test_merge_rejects_overlap(ray_session, small_corpus, tmp_path):
    import ray.data

    cfg = IndexConfig(num_parts=4)
    idx_a, idx_b = str(tmp_path / "oa"), str(tmp_path / "ob")
    build_index(ray.data.from_arrow(small_corpus), idx_a, cfg,
                input_id="a")
    build_index(ray.data.from_arrow(small_corpus), idx_b, cfg,
                input_id="b")
    with pytest.raises(Exception, match="disjoint|share doc_ids"):
        merge_indexes([idx_a, idx_b], str(tmp_path / "om"))


def test_merge_rejects_config_mismatch(ray_session, small_corpus,
                                       tmp_path):
    import ray.data

    idx_a, idx_b = str(tmp_path / "ca"), str(tmp_path / "cb")
    build_index(ray.data.from_arrow(small_corpus), idx_a,
                IndexConfig(num_parts=4), input_id="a")
    build_index(ray.data.from_arrow(small_corpus), idx_b,
                IndexConfig(num_parts=8), input_id="b")
    with pytest.raises(ValueError, match="different configs"):
        merge_indexes([idx_a, idx_b], str(tmp_path / "cm"))
