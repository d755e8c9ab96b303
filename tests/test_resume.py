"""Resume semantics (FIXTURES.md §4.4): interrupt after some partitions
are checkpointed, re-run, get byte-identical segments; valid partitions
are skipped, invalidated ones rebuilt."""

import json
import os
import shutil

import pytest

from raysearch.build import build_index
from raysearch.checkpoint import load_manifest, validate_manifest
from raysearch.config import IndexConfig
from raysearch.corpus import QUERIES
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


def test_resume_skips_and_is_byte_identical(ray_session, small_corpus,
                                            tmp_path):
    import ray.data

    cfg = IndexConfig(num_parts=4)
    ds = ray.data.from_arrow(small_corpus)

    idx_a = str(tmp_path / "a")
    res_a = build_index(ds, idx_a, cfg, input_id="t1")
    assert res_a.parts_built == len(res_a.stats["parts"])
    bytes_a = _segment_bytes(idx_a, res_a.stats["parts"])

    # simulate interruption: copy only 2 completed partitions (+ their
    # manifests), drop stats.json and the rest
    idx_b = str(tmp_path / "b")
    os.makedirs(os.path.join(idx_b, "segments"))
    kept = res_a.stats["parts"][:2]
    for p in kept:
        shutil.copytree(part_dirname(idx_a, p), part_dirname(idx_b, p))

    res_b = build_index(ds, idx_b, cfg, input_id="t1")
    assert res_b.parts_skipped == len(kept)
    assert res_b.parts_built == len(res_a.stats["parts"]) - len(kept)
    assert _segment_bytes(idx_b, res_b.stats["parts"]) == bytes_a
    assert res_b.stats["n_docs"] == res_a.stats["n_docs"]

    # full re-run: everything valid -> no Ray work, nothing rewritten
    mtimes = {p: os.path.getmtime(os.path.join(part_dirname(idx_b, p),
                                               "postings.parquet"))
              for p in res_b.stats["parts"]}
    res_c = build_index(ds, idx_b, cfg, input_id="t1")
    assert res_c.parts_built == 0
    for p in res_c.stats["parts"]:
        assert os.path.getmtime(os.path.join(
            part_dirname(idx_b, p), "postings.parquet")) == mtimes[p]
    # and queries still work after resume
    out = query_index(idx_b, QUERIES[:2], k=5)
    assert out.num_rows == 10


def test_corrupted_partition_is_rebuilt(ray_session, small_corpus, tmp_path):
    import ray.data

    cfg = IndexConfig(num_parts=4)
    ds = ray.data.from_arrow(small_corpus)
    idx = str(tmp_path / "c")
    res = build_index(ds, idx, cfg, input_id="t1")
    part = res.stats["parts"][0]
    pfile = os.path.join(part_dirname(idx, part), "postings.parquet")
    good = open(pfile, "rb").read()
    with open(pfile, "wb") as f:  # corrupt it
        f.write(b"garbage")
    os.remove(os.path.join(idx, "stats.json"))
    assert validate_manifest(part_dirname(idx, part),
                             cfg.config_hash(), "") is None
    res2 = build_index(ds, idx, cfg, input_id="t1")
    assert res2.parts_built >= 1
    assert open(pfile, "rb").read() == good


def test_manifest_lineage_fields(ray_session, small_corpus, tmp_path):
    import ray.data

    cfg = IndexConfig(num_parts=4)
    idx = str(tmp_path / "d")
    res = build_index(ray.data.from_arrow(small_corpus), idx, cfg,
                      input_id="t1")
    for p in res.stats["parts"]:
        m = load_manifest(part_dirname(idx, p))
        assert m["config_hash"] == cfg.config_hash()
        # Dataset sources with an explicit config skip the row pre-count
        # (counting would execute the whole upstream pipeline once);
        # the caller-supplied input_id is used verbatim
        assert m["lineage"]["input_id"] == "t1"
        assert set(m["files"]) == {"postings.parquet", "doclens.parquet"}
        assert m["skew"]["top_terms"]  # hot-term metrics logged
        assert m["stats"]["n_docs"] > 0
