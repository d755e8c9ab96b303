"""aggx ops: hand-enumerable semantics pins for the ES terms-agg
error-bound contract and the range-facet bucket math, plus oracle
parity on each probe corpus."""

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


def _oracle(d: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    return con.execute(sql).df()


def _assert_parity(eng: pa.Table, ora: pd.DataFrame):
    eng = eng.to_pandas()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)


def test_terms_agg_error_bound_semantics(ray_session, tmp_path,
                                         monkeypatch):
    from raysearch.pipelines import aggx as ax

    # 2 shards (doc_id % 2), shard_size 1 — fully enumerable:
    #   shard0 = docs {0, 2}: a:2 b:2 -> reports a(2), last_cnt 2
    #   shard1 = docs {1, 3}: b:2     -> reports b(2), last_cnt 0
    #                                    (whole vocab fit: no error)
    # merged: a reported 2 (err 0: shard1's last is 0)
    #         b reported 2 (err 2: missed shard0, whose last is 2)
    # true df: a=2, b=4 — b's bound is TIGHT (2 <= 4 <= 2+2)
    monkeypatch.setattr(ax, "TA_SHARDS", 2)
    monkeypatch.setattr(ax, "TA_SHARD_SIZE", 1)
    d = _write_docs(tmp_path, ["a b", "b", "a b", "b"])

    out = ax.terms_agg_topk(d).to_pandas().set_index("term")
    assert out.loc["a"].to_dict() == {
        "rank": 1, "reported_df": 2, "err_bound": 0, "true_df": 2}
    assert out.loc["b"].to_dict() == {
        "rank": 2, "reported_df": 2, "err_bound": 2, "true_df": 4}
    _assert_parity(ax.terms_agg_topk(d),
                   _oracle(d, ax.sql_terms_agg_topk()))


def test_terms_agg_invariants_sf(ray_session):
    from raysearch.pipelines import aggx as ax

    t = ax.terms_agg_topk("/root/testdata/sf0.001").to_pandas()
    assert len(t) == ax.TA_K
    assert (t.reported_df <= t.true_df).all()
    assert (t.true_df <= t.reported_df + t.err_bound).all()
    # shard_size 3 over a ~31-term vocabulary: truncation must bite
    assert (t.err_bound > 0).all()
    assert (t.reported_df < t.true_df).any()


def test_range_facet_parity_and_sums(ray_session, tmp_path):
    from raysearch.pipelines import aggx as ax
    from raysearch.pipelines.search_queries import bm25_topk

    # dl values straddle every bucket edge (29/30, 49/50, 69/70)
    texts = [" ".join(["join"] + ["x"] * (n - 1))
             for n in (10, 29, 30, 49, 50, 69, 70, 99)]
    d = _write_docs(tmp_path, texts)
    eng = ax.range_facet_counts(d)
    _assert_parity(eng, _oracle(d, ax.sql_range_facet_counts()))

    f = eng.to_pandas()
    b = bm25_topk(d).to_pandas()
    assert (f.groupby("query_id").n_docs.sum().to_dict()
            == b.groupby("query_id").size().to_dict())
    assert set(f.bucket) <= set(ax.FACET_LABELS)
