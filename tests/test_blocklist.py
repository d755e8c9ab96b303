"""blocklist_docs: index-backed term blocklist filtering — oracle
parity plus the no-corpus-scan contract's semantic edges (absent
blocklist term, doc with several blocked terms, repeat occurrences
counted once)."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_docs(path, texts):
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return str(path)


def test_blocklist_adversarial(ray_session, tmp_path, monkeypatch):
    from raysearch.pipelines import search_queries as sq

    monkeypatch.setattr(sq, "BLOCK_TERMS",
                        ("bad", "worse", "neverappears"))
    d = _write_docs(tmp_path, [
        "good clean text here",           # 0: no hit
        "bad bad bad repeated",           # 1: one DISTINCT hit
        "bad and worse together",         # 2: two hits
        "WORSE uppercase form",           # 3: case-folded hit
        "",                               # 4: empty
        "badx prefix is not a hit",       # 5: token boundary
    ])
    eng = sq.blocklist_docs(d).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.execute(sq.sql_blocklist_docs()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    by_id = eng.set_index("doc_id").n_blocked
    assert set(eng.doc_id) == {1, 2, 3}
    assert by_id.loc[1] == 1 and by_id.loc[2] == 2 and by_id.loc[3] == 1


def test_blocklist_sf001_parity(ray_session):
    from raysearch.pipelines import search_queries as sq

    d = "/root/testdata/sf0.001"
    eng = sq.blocklist_docs(d).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.execute(sq.sql_blocklist_docs()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    assert len(eng) > 0
