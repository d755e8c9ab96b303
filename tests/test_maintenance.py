"""Index lifecycle (maintenance.py): tombstone deletes, compaction,
incremental append — exact-equivalence contracts against one-shot
builds, plus resume/orphan-pruning behavior."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from raysearch.build import build_index, _prune_orphan_segments
from raysearch.config import IndexConfig
from raysearch.corpus import QUERIES
from raysearch.maintenance import (
    append_index,
    clear_deletes,
    compact_index,
    delete_docs,
    filter_postings,
    load_deletes,
    tombstone_mask,
)
from raysearch.query import query_index
from raysearch.segments import list_segment_parts, part_dirname

MODES = ("bm25", "overlap", "dirichlet")


def _write(tbl: pa.Table, path) -> str:
    pq.write_table(tbl, str(path))
    return str(path)


@pytest.fixture(scope="module")
def corpus(small_corpus):
    return small_corpus.select(["doc_id", "lang", "content"])


def _query_all(idx, k=10):
    return {m: query_index(idx, QUERIES, k=k, mode=m).to_pandas()
            for m in MODES}


# ---- unit: tombstones ----

def test_tombstone_mask_and_filter():
    deleted = np.array([3, 7, 11], np.int64)
    docs = np.array([1, 3, 5, 7, 9, 11, 13], np.int64)
    assert tombstone_mask(docs, deleted).tolist() == [
        True, False, True, False, True, False, True]
    assert tombstone_mask(docs, np.zeros(0, np.int64)).all()
    tfs = np.arange(7) + 1
    d, t, l = filter_postings((docs, tfs, tfs * 2), deleted)
    assert d.tolist() == [1, 5, 9, 13]
    assert t.tolist() == [1, 3, 5, 7]
    assert l.tolist() == [2, 6, 10, 14]


def test_delete_files_union(tmp_path):
    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    delete_docs(idx, [5, 3, 5])
    n = delete_docs(idx, [3, 9])
    assert n == 3
    assert load_deletes(idx).tolist() == [3, 5, 9]
    clear_deletes(idx)
    assert len(load_deletes(idx)) == 0


# ---- lifecycle equivalences ----

def test_append_equals_one_shot(ray_session, corpus, tmp_path):
    cfg = IndexConfig(num_parts=5)
    even = corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"], 1), 0))
    odd = corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"], 1), 1))
    full_p = _write(corpus, tmp_path / "full.parquet")
    even_p = _write(even, tmp_path / "even.parquet")
    odd_p = _write(odd, tmp_path / "odd.parquet")

    idx_full = str(tmp_path / "idx_full")
    build_index(full_p, idx_full, cfg)
    idx_app = str(tmp_path / "idx_app")
    build_index(even_p, idx_app, cfg)
    st = append_index(odd_p, idx_app, num_parts=4)

    # appended segments live past the base parts
    assert max(st["parts"]) >= 5
    # global stats equal the one-shot build's
    st_full = json.load(open(os.path.join(idx_full, "stats.json")))
    for key in ("n_docs", "total_tokens", "avgdl", "vocab_size",
                "n_postings"):
        assert st[key] == st_full[key], key
    # every mode's top-k identical
    r_full, r_app = _query_all(idx_full), _query_all(idx_app)
    for m in MODES:
        assert r_full[m].equals(r_app[m]), m


def test_append_is_resumable(ray_session, corpus, tmp_path):
    cfg = IndexConfig(num_parts=4)
    even = corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"], 1), 0))
    odd = corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"], 1), 1))
    idx = str(tmp_path / "idx")
    build_index(_write(even, tmp_path / "e.parquet"), idx, cfg)
    odd_p = _write(odd, tmp_path / "o.parquet")
    st1 = append_index(odd_p, idx, num_parts=3)
    mtimes = {p: os.path.getmtime(
        os.path.join(part_dirname(idx, p), "postings.parquet"))
        for p in st1["parts"]}
    # re-running the SAME append is a no-op (lineage-recorded)
    st2 = append_index(odd_p, idx, num_parts=3)
    assert st2 == st1
    for p in st1["parts"]:
        assert os.path.getmtime(os.path.join(
            part_dirname(idx, p), "postings.parquet")) == mtimes[p], \
            f"part {p} was rewritten on append re-run"
    # crash-resume: stats.json rolled back to the pre-append state but
    # the appended segments exist -> the rerun recomputes the same
    # offset, validates the manifests, and skips the segment writes
    pre = json.load(open(os.path.join(idx, "stats.json")))
    pre["parts"] = [p for p in pre["parts"] if p < 4]
    pre["lineage"]["input_id"] = pre["lineage"]["input_id"].split("+")[0]
    with open(os.path.join(idx, "stats.json"), "w") as f:
        json.dump(pre, f)
    st3 = append_index(odd_p, idx, num_parts=3)
    assert st3["parts"] == st1["parts"]
    assert st3["n_docs"] == st1["n_docs"]
    for p in st1["parts"]:
        assert os.path.getmtime(os.path.join(
            part_dirname(idx, p), "postings.parquet")) == mtimes[p], \
            f"part {p} was rewritten on append crash-resume"


def test_delete_then_compact_equals_fresh_build(ray_session, corpus,
                                                tmp_path):
    cfg = IndexConfig(num_parts=5)
    dead = [d for d in corpus["doc_id"].to_pylist() if d % 7 == 3]
    live = corpus.filter(pc.invert(pc.is_in(
        corpus["doc_id"], value_set=pa.array(dead, pa.int64()))))
    idx = str(tmp_path / "idx")
    build_index(_write(corpus, tmp_path / "c.parquet"), idx, cfg)
    st_before = json.load(open(os.path.join(idx, "stats.json")))

    delete_docs(idx, dead)
    # tombstoned docs never appear; stats stay stale; k back-fills
    r_del = query_index(idx, QUERIES, k=10, mode="bm25").to_pandas()
    assert not set(r_del.doc_id) & set(dead)
    st_mid = json.load(open(os.path.join(idx, "stats.json")))
    assert st_mid["n_docs"] == st_before["n_docs"]  # stale until compact

    compact_index(idx)
    assert len(load_deletes(idx)) == 0
    idx_live = str(tmp_path / "idx_live")
    build_index(_write(live, tmp_path / "l.parquet"), idx_live, cfg)
    r_cmp, r_fresh = _query_all(idx), _query_all(idx_live)
    for m in MODES:
        assert r_cmp[m].equals(r_fresh[m]), m
    st_a = json.load(open(os.path.join(idx, "stats.json")))
    st_b = json.load(open(os.path.join(idx_live, "stats.json")))
    for key in ("n_docs", "total_tokens", "avgdl", "vocab_size",
                "n_postings"):
        assert st_a[key] == st_b[key], key


def test_compact_without_deletes_is_noop(ray_session, corpus, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(_write(corpus, tmp_path / "c.parquet"), idx,
                IndexConfig(num_parts=3))
    st0 = json.load(open(os.path.join(idx, "stats.json")))
    st1 = compact_index(idx)
    assert st1 == st0


def test_resident_session_honors_deletes(ray_session, corpus, tmp_path):
    from raysearch.serve import QuerySession

    idx = str(tmp_path / "idx")
    build_index(_write(corpus, tmp_path / "c.parquet"), idx,
                IndexConfig(num_parts=3))
    one_shot = query_index(idx, QUERIES[:3], k=10, mode="bm25").to_pandas()
    dead = one_shot.doc_id.unique()[:5].tolist()
    delete_docs(idx, dead)
    s = QuerySession(idx, num_actors=1)
    try:
        res = s.query_batch(QUERIES[:3], k=10).to_pandas()
    finally:
        s.close()
    assert not set(res.doc_id) & set(dead)
    # resident results match the one-shot path under the same deletes
    expect = query_index(idx, QUERIES[:3], k=10, mode="bm25").to_pandas()
    assert res.equals(expect)


def test_orphan_segments_pruned_on_rebuild(ray_session, corpus, tmp_path):
    """A rebuild with fewer parts removes stale part dirs so the
    lexicon rebuild can't double-count df/cf."""
    p = _write(corpus, tmp_path / "c.parquet")
    idx = str(tmp_path / "idx")
    build_index(p, idx, IndexConfig(num_parts=6))
    assert len(list_segment_parts(idx)) == 6
    build_index(p, idx, IndexConfig(num_parts=2))
    assert len(list_segment_parts(idx)) == 2
    st = json.load(open(os.path.join(idx, "stats.json")))
    assert st["parts"] == [0, 1]


def test_prune_orphans_unit(tmp_path):
    idx = str(tmp_path / "idx")
    for p in range(4):
        os.makedirs(part_dirname(idx, p))
    removed = _prune_orphan_segments(idx, keep={0, 2})
    assert removed == 2
    assert list_segment_parts(idx) == [0, 2]
