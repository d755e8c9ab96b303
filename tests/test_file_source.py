"""File-tree corpus source (reference S1 ingestion shape): extension
dispatch, unsupported-type drop, stable doc_ids, end-to-end build +
query over a directory of raw files."""

import os

import pytest

from raysearch.build import build_index
from raysearch.config import IndexConfig
from raysearch.corpus import corpus_from_files
from raysearch.query import query_index

FILES = {
    "a.txt": "hash join hash join fast merge",
    "sub/b.txt": "window stream slow query merge",
    "c.html": "<html><body>sort the big table</body></html>",
    "d.json": '{"key": "vector scan order"}',
    "skip.bin": "binary payload must be dropped",
    "noext": "no extension either",
}


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("doctree")
    for rel, content in FILES.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    return str(root)


def test_extension_dispatch_and_filter(ray_session, tree):
    tbl = corpus_from_files(tree).to_pandas()
    assert sorted(tbl.path.tolist()) == ["a.txt", "c.html", "d.json",
                                         os.path.join("sub", "b.txt")]
    langs = dict(zip(tbl.path, tbl.lang))
    assert langs["a.txt"] == "text" and langs["c.html"] == "html"
    assert langs["d.json"] == "json"
    assert tbl.doc_id.is_unique and (tbl.doc_id >= 0).all()


def test_doc_ids_stable_across_runs(ray_session, tree):
    a = corpus_from_files(tree).to_pandas().set_index("path").doc_id
    b = corpus_from_files(tree).to_pandas().set_index("path").doc_id
    assert a.sort_index().tolist() == b.sort_index().tolist()


def test_build_and_query_over_file_tree(ray_session, tree, tmp_path):
    idx = str(tmp_path / "idx")
    res = build_index(corpus_from_files(tree), idx,
                      IndexConfig(num_parts=2), input_id="tree")
    assert res.stats["n_docs"] == 4
    out = query_index(idx, ["hash join"], k=3).to_pandas()
    assert len(out) >= 1
    # a.txt has 2x 'hash join' — must rank first
    tbl = corpus_from_files(tree).to_pandas()
    a_id = int(tbl[tbl.path == "a.txt"].doc_id.iloc[0])
    # column-wise access: row-wise iloc upcasts the mixed int/float row
    # to float64 and corrupts 62-bit doc_ids
    assert int(out.doc_id.iloc[0]) == a_id
