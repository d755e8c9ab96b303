"""time_travel_topk (snapshot query over the append-only index) and
qpp_stats (pre-retrieval query-performance predictors): oracle parity
on an adversarial corpus, proof the snapshot neither sees appended
docs nor leaks their df/N/avgdl into scores, bit-equality with a
fresh build over the base half alone, and the asof guards."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.pipelines import lifecycle as LC
from raysearch.pipelines import rankex as RX
from raysearch.pipelines import search_queries as SQ


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


def _docs(tmp_path, texts, name="documents.parquet"):
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["t"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(tmp_path, name))
    return str(tmp_path)


# even doc_ids = base generation; odd = appended. The odd docs are
# saturated with the query terms so the append SHIFTS df/N/avgdl —
# a snapshot that consulted the post-append lexicon would misscore.
TEXTS = [
    "hash join fast",                     # 0 (base)
    "hash hash hash join join merge",     # 1 (appended)
    "merge sort the stream",              # 2 (base)
    "hash join hash join hash join",      # 3 (appended)
    "window aggregation slow query",      # 4 (base)
    "join hash merge sort window " * 5,   # 5 (appended)
    "  dup\tdup  row ",                   # 6 (base, edge whitespace)
    "hash",                               # 7 (appended)
    "naïve café 日本語 join",              # 8 (base, unicode)
    "",                                   # 9 (appended, empty)
]


def test_time_travel_parity_and_isolation(ray_session, tmp_path):
    sf = _docs(tmp_path, TEXTS)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    tt = _norm(LC.time_travel_topk(sf).to_pandas())
    ora = _norm(con.execute(
        LC.ORACLE_SQL["time_travel_topk"]).df())
    assert [str(t) for t in tt.dtypes] == [str(t) for t in ora.dtypes]
    pd.testing.assert_frame_equal(tt, ora, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)
    # no appended (odd) doc in the snapshot results
    assert (tt.doc_id.to_numpy() % 2 == 0).all()
    # the full (post-append) ranking must DIFFER in scores — the
    # appended docs shifted df/N/avgdl, so identical values would
    # mean the snapshot leaked the current lexicon
    full = LC.appended_topk(sf).to_pandas()
    joint = tt.merge(full, on=["query_id", "doc_id"],
                     suffixes=("_tt", "_full"))
    assert len(joint) and not np.allclose(joint.score_tt, joint.score_full)


def test_time_travel_equals_fresh_base_build(ray_session, tmp_path):
    sf = _docs(tmp_path, TEXTS)
    base_dir = tmp_path / "base_only"
    base_dir.mkdir()
    tbl = pq.read_table(os.path.join(sf, "documents.parquet"))
    even = tbl.filter(pa.compute.equal(
        pa.compute.bit_wise_and(tbl["doc_id"], 1), 0))
    pq.write_table(even, os.path.join(str(base_dir), "documents.parquet"))
    tt = _norm(LC.time_travel_topk(sf).to_pandas())
    fresh = _norm(SQ.bm25_topk(str(base_dir)).to_pandas())
    pd.testing.assert_frame_equal(tt, fresh)


def test_asof_guards(ray_session, tmp_path):
    sf = _docs(tmp_path, TEXTS)
    idx = LC.appended_index(sf)
    from raysearch.query import query_index

    with pytest.raises(ValueError, match="asof"):
        query_index(idx, ["hash join"], mode="dirichlet",
                    asof={"parts": [0], "n_docs": 1, "avgdl": 1.0})
    with pytest.raises(ValueError, match="asof"):
        query_index(idx, ["hash join"], mode="bm25",
                    asof={"parts": [999], "n_docs": 1, "avgdl": 1.0})


def test_qpp_adversarial_parity(ray_session, tmp_path):
    # a corpus missing several query terms entirely (n_present <
    # n_terms) and containing one query's terms not at all is the
    # QPP edge: queries with zero present terms must emit NO row
    texts = ["hash join", "hash hash merge", "dup row line",
             "the a of", ""]
    sf = _docs(tmp_path, texts)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    eng = _norm(RX.qpp_stats(sf).to_pandas())
    ora = _norm(con.execute(RX.sql_qpp_stats()).df())
    assert [str(t) for t in eng.dtypes] == [str(t) for t in ora.dtypes]
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)
    assert (eng.n_present <= eng.n_terms).all()
    assert (eng.max_idf >= eng.avg_idf).all()
    # query 6 ('Vector column scan order.') has no term in this corpus
    assert 6 not in set(eng.query_id)
