"""Ingest options: lang whitelist (M6) and exact input dedup (§2.6)."""

import pyarrow as pa
import pytest

from raysearch.build import build_index
from raysearch.config import IndexConfig
from raysearch.corpus import QUERIES
from raysearch.query import query_index, read_queries


def test_supported_langs_filter(ray_session, small_corpus, tmp_path):
    import ray.data

    langs = set(small_corpus["lang"].to_pylist())
    assert "json" in langs and "py" in langs
    keep = frozenset({"py", "rs", "txt"})
    n_keep = sum(1 for l in small_corpus["lang"].to_pylist() if l in keep)
    idx = str(tmp_path / "fidx")
    res = build_index(ray.data.from_arrow(small_corpus), idx,
                      IndexConfig(num_parts=4), input_id="t1",
                      supported_langs=keep)
    assert res.stats["n_docs"] == n_keep


def test_dedup_input_first_wins(ray_session, tmp_path):
    import ray.data

    base = pa.table({
        "doc_id": pa.array([5, 3, 9, 1], pa.int64()),
        "lang": pa.array(["txt"] * 4, pa.string()),
        "content": pa.array(["same text here", "same text here",
                             "unique one", "same text here"], pa.string()),
    })
    idx = str(tmp_path / "didx")
    res = build_index(ray.data.from_arrow(base), idx,
                      IndexConfig(num_parts=2), input_id="dup",
                      dedup_input=True)
    assert res.stats["n_docs"] == 2  # one survivor per distinct content
    out = query_index(idx, ["unique one"], k=5, mode="overlap")
    assert 9 in out["doc_id"].to_pylist()
    out2 = query_index(idx, ["same text here"], k=5, mode="overlap")
    assert out2["doc_id"].to_pylist() == [1]  # smallest doc_id won


def test_empty_and_whitespace_docs(ray_session, tmp_path):
    """Empty / all-whitespace docs must count toward N and avgdl but
    produce no postings (dl = 0) — matching the DuckDB oracle's
    count(*)/sum semantics."""
    import ray.data

    base = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": pa.array(["txt"] * 4, pa.string()),
        "content": pa.array(["two tokens", "", "   \n\t ", "one"],
                            pa.string()),
    })
    idx = str(tmp_path / "eidx")
    res = build_index(ray.data.from_arrow(base), idx,
                      IndexConfig(num_parts=2), input_id="empty")
    assert res.stats["n_docs"] == 4
    assert res.stats["total_tokens"] == 3
    assert res.stats["avgdl"] == 3 / 4
    out = query_index(idx, ["tokens one"], k=5, mode="overlap")
    assert set(out["doc_id"].to_pylist()) == {0, 3}


def test_unknown_term_queries(ray_session, small_corpus, tmp_path):
    """Queries with no indexed terms return zero rows (no crash, no
    placeholder rows) in both modes and with pruning."""
    import ray.data

    idx = str(tmp_path / "uidx")
    build_index(ray.data.from_arrow(small_corpus), idx,
                IndexConfig(num_parts=4), input_id="t1")
    for mode in ("bm25", "overlap"):
        out = query_index(idx, ["zzzqxj nonexistent!"], k=10, mode=mode)
        assert out.num_rows == 0
    out = query_index(idx, ["zzzqxj", QUERIES[0]], k=5, prune=True)
    assert set(out["query_id"].to_pylist()) == {1}


def test_read_queries(tmp_path):
    p = tmp_path / "queries.txt"
    p.write_text("Fast hash join?\n\n  Sort it!  \n")
    assert read_queries(str(p)) == ["Fast hash join?", "Sort it!"]
