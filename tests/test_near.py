"""near_topk (NEAR/W proximity operator): adversarial parity vs the
DuckDB position-join oracle — doc-boundary straddling, exact window
boundary, tie-breaks, one-sided docs, absent terms."""

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
    eng = _norm(SQ.near_topk(sf).to_pandas())
    ora = _norm(con.execute(SQ.sql_near_topk()).df())
    assert [str(t) for t in eng.dtypes] == [str(t) for t in ora.dtypes]
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    return eng


def test_near_adversarial(ray_session, tmp_path):
    pad = " ".join(["x"] * SQ.NEAR_W)        # W filler tokens
    sf = _docs(tmp_path, [
        "query join",                         # gap 1, 1 window pair
        f"query {pad} join",                  # gap W+1: outside window
        "query " + " ".join(["x"] * (SQ.NEAR_W - 1)) + " join",
        # ^ gap W: exactly on the boundary -> counted
        "query query join join",              # 4 pairs, min gap 1
        "query only here",                     # one-sided: no hit
        "join",                                # doc boundary probe: the
        "query",                               # previous doc ends in
        # 'join' and this one starts with 'query' - globally adjacent
        # flat positions, different docs, must NOT pair (both are
        # one-sided docs)
        "hash merge hash",                     # query 1: two pairs
    ])
    eng = _parity(sf)
    q0 = eng[eng.query_id == 0].set_index("doc_id")
    assert 4 not in q0.index or True  # doc 4 one-sided
    assert set(q0.index) == {0, 1, 2, 3}
    assert q0.loc[0, "min_dist"] == 1 and q0.loc[0, "win_count"] == 1
    assert q0.loc[1, "min_dist"] == SQ.NEAR_W + 1
    assert q0.loc[1, "win_count"] == 0     # outside the window
    assert q0.loc[2, "min_dist"] == SQ.NEAR_W
    assert q0.loc[2, "win_count"] == 1     # boundary inclusive
    assert q0.loc[3, "min_dist"] == 1 and q0.loc[3, "win_count"] == 4
    assert 5 not in q0.index and 6 not in q0.index
    # rank order: min_dist ASC, then win_count DESC, then doc_id
    ranked = eng[eng.query_id == 0].sort_values("rank")
    assert ranked.doc_id.tolist() == [3, 0, 2, 1]
    q1 = eng[eng.query_id == 1].set_index("doc_id")
    assert q1.loc[7, "min_dist"] == 1 and q1.loc[7, "win_count"] == 2
    # absent-term query returns nothing
    assert len(eng[eng.query_id == 3]) == 0


def test_near_topk_truncation(ray_session, tmp_path):
    # 15 identical hit docs: only top-10 survive, deterministic by
    # doc_id on the full tie
    sf = _docs(tmp_path, ["query join"] * 15)
    eng = _parity(sf)
    q0 = eng[eng.query_id == 0]
    assert len(q0) == SQ.TOPK
    assert q0.sort_values("rank").doc_id.tolist() == list(range(10))
