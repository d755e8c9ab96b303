"""slop_topk (ordered proximity, "a b"~W): adversarial parity vs the
DuckDB ordered-position-join oracle — order sensitivity (reversed
terms must NOT match), exact window boundary, ordered-pair counting,
doc-boundary straddling, HAVING-style hit filtering, truncation."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import search_queries as SQ


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


def _docs(tmp_path, texts):
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["t"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _parity(sf):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    eng = _norm(SQ.slop_topk(sf).to_pandas())
    ora = _norm(con.execute(SQ.sql_slop_topk()).df())
    assert [str(t) for t in eng.dtypes] == [str(t) for t in ora.dtypes]
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    return eng


def test_slop_adversarial(ray_session, tmp_path):
    w = SQ.SLOP_W
    sf = _docs(tmp_path, [
        "query join",                          # gap 1: hit
        "join query",                          # REVERSED: must NOT hit
        "query " + " ".join(["x"] * (w - 1)) + " join",
        # ^ ordered gap exactly W: boundary counted
        "query " + " ".join(["x"] * w) + " join",
        # ^ ordered gap W+1: candidate but NO pair within W -> no hit
        "query join join",                     # 2 ordered pairs <= W
        "query query join",                    # 2 ordered pairs, min 1
        "join",                                # doc-boundary probe:
        "query",                               # globally adjacent flat
        # positions across two docs must never pair
        "hash merge",                          # query 1 hit
        "merge hash",                          # query 1 reversed: miss
    ])
    eng = _parity(sf)
    q0 = eng[eng.query_id == 0].set_index("doc_id")
    assert set(q0.index) == {0, 2, 4, 5}
    assert q0.loc[0, "min_gap"] == 1 and q0.loc[0, "pair_count"] == 1
    assert q0.loc[2, "min_gap"] == w and q0.loc[2, "pair_count"] == 1
    assert q0.loc[4, "min_gap"] == 1 and q0.loc[4, "pair_count"] == 2
    assert q0.loc[5, "min_gap"] == 1 and q0.loc[5, "pair_count"] == 2
    assert 1 not in q0.index and 3 not in q0.index
    assert 6 not in q0.index and 7 not in q0.index
    # rank: pair_count DESC, min_gap ASC, doc_id
    assert (eng[eng.query_id == 0].sort_values("rank")
            .doc_id.tolist() == [4, 5, 0, 2])
    q1 = eng[eng.query_id == 1].set_index("doc_id")
    assert set(q1.index) == {8}                # reversed doc 9 missed
    assert len(eng[eng.query_id == 3]) == 0    # absent term


def test_slop_truncation(ray_session, tmp_path):
    sf = _docs(tmp_path, ["query join"] * 15)
    eng = _parity(sf)
    q0 = eng[eng.query_id == 0]
    assert len(q0) == SQ.TOPK
    assert q0.sort_values("rank").doc_id.tolist() == list(range(10))
