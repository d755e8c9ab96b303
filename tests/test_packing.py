"""pack_offsets: distributed ordered prefix sum — oracle parity on
adversarial inputs (sparse non-dense doc_ids, empty docs, a doc
longer than one block), range-bucket-count invariance, and the
block-accounting identity."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_docs(path, rows):
    """rows: (doc_id, text)."""
    ids, texts = zip(*rows)
    tbl = pa.table({
        "doc_id": pa.array(list(ids), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["t"] * len(rows)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return str(path)


def _parity(sf_dir):
    # sql_pack_offsets() reads PACK_L at call time, so a monkeypatched
    # block length applies to BOTH sides
    from raysearch.pipelines.packing import pack_offsets, sql_pack_offsets

    eng = pack_offsets(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    ora = con.execute(sql_pack_offsets()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    return eng


def test_pack_offsets_adversarial(ray_session, tmp_path, monkeypatch):
    from raysearch.pipelines import packing

    monkeypatch.setattr(packing, "PACK_L", 8)
    # sparse, shuffled-on-disk ids; an empty doc; a 20-token doc that
    # must span >= 3 eight-token blocks; a whitespace-only doc
    rows = [
        (1_000_000, "spans blocks " + "tok " * 18),
        (5, "a b c"),
        (900, ""),
        (17, "   "),
        (40_000, "d e f g h i j"),
    ]
    eng = _parity(_write_docs(tmp_path, rows))
    eng = eng.set_index("doc_id")
    assert eng.loc[5, "start_tok"] == 0              # smallest id first
    assert eng.loc[900, "n_blocks"] == 0             # empty doc
    assert eng.loc[17, "n_blocks"] == 0              # whitespace-only
    assert eng.loc[1_000_000, "n_blocks"] >= 3       # 20 tokens / L=8
    # concatenation identity: each start is the previous end
    srt = eng.sort_values("start_tok")
    ends = (srt.start_tok + srt.dl).to_numpy()
    assert (srt.start_tok.to_numpy()[1:] >= ends[:-1] - srt.dl.max()).all()
    assert (srt.start_tok.to_numpy()[1:]
            == np.maximum.accumulate(ends[:-1])).all()


def test_pack_offsets_bucket_invariance(ray_session, monkeypatch):
    import raysearch.pipelines.packing as packing

    results = {}
    for nb in (1, 16):
        monkeypatch.setattr("raysearch.pipelines.packing.auto_buckets",
                            lambda *a, nb=nb, **k: nb, raising=False)
        monkeypatch.setattr(
            "raysearch.hashing.auto_buckets",
            lambda *a, nb=nb, **k: nb)
        results[nb] = packing.pack_offsets(
            "/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(results[1], results[16])


def test_pack_offsets_empty_input(ray_session, tmp_path):
    # an EMPTY documents table returns the documented empty schema
    # (not a crash in the footer-stats scan)
    from raysearch.pipelines.packing import pack_offsets

    tbl = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    out = pack_offsets(str(tmp_path)).to_pandas()
    assert list(out.columns) == ["doc_id", "dl", "start_tok", "n_blocks"]
    assert len(out) == 0


def test_shuffle_positions_properties(ray_session, tmp_path):
    # sparse, disk-shuffled ids: positions are an exact permutation
    # 0..n-1 and match the SQL md5-order window
    from raysearch.pipelines.packing import (shuffle_positions,
                                             sql_shuffle_positions)

    rows = [(1_000_000, "x"), (5, "y"), (900, ""), (17, "z"),
            (40_000, "w"), (0, "v")]
    sf = _write_docs(tmp_path, rows)
    eng = shuffle_positions(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(sql_shuffle_positions()).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=True)
    assert sorted(eng.pos.tolist()) == list(range(len(rows)))


def test_shuffle_positions_bucket_invariance(ray_session, monkeypatch):
    from raysearch.pipelines import packing

    results = {}
    for nb in (1, 16):
        monkeypatch.setattr("raysearch.hashing.auto_buckets",
                            lambda *a, nb=nb, **k: nb)
        results[nb] = packing.shuffle_positions(
            "/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(results[1], results[16])
