"""Round-4 second-wave operators: doc_entropy, zipf_slope,
sole_late_supplier — adversarial-edge parity against their DuckDB
oracles (empty/unicode/boundary inputs) plus hand-computed anchors."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import relational_ext as RX
from raysearch.pipelines import stats as ST
from raysearch.pipelines import textops as TX


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
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


def _parity(fn, sql, sf, tables=("documents",)):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    eng = _norm(fn(sf).to_pandas())
    ora = _norm(con.execute(sql).df())
    assert [str(t) for t in eng.dtypes] == [str(t) for t in ora.dtypes]
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)
    return eng


def test_doc_entropy_adversarial(ray_session, tmp_path):
    sf = _docs(tmp_path, ["", "a", "aaaa", "ab€é́中中",
                          " \n\t", "x" * 5000])
    eng = _parity(TX.doc_entropy, TX.sql_doc_entropy(), sf)
    by_id = eng.set_index("doc_id")
    # empty and single-symbol docs have zero entropy
    assert by_id.loc[0, "entropy"] == 0.0 and by_id.loc[0, "n_cp"] == 0
    assert by_id.loc[2, "entropy"] == 0.0        # 'aaaa'
    assert by_id.loc[5, "entropy"] == 0.0        # 'xxxx...'
    # 7 codepoints, 6 distinct (combining mark counted separately),
    # one symbol twice: H = log2(7) - (2*log2(2) + 5*0)/7
    assert by_id.loc[3, "n_cp"] == 7
    assert by_id.loc[3, "n_distinct_cp"] == 6
    want = round(math.log2(7) - 2 * math.log2(2) / 7, 6)
    assert abs(by_id.loc[3, "entropy"] - want) <= 1e-6


def test_doc_entropy_uniform_max(ray_session, tmp_path):
    # k distinct symbols once each -> H = log2(k) exactly
    sf = _docs(tmp_path, ["abcdefgh"])
    eng = _parity(TX.doc_entropy, TX.sql_doc_entropy(), sf)
    assert abs(eng.loc[0, "entropy"] - 3.0) <= 1e-6


def test_zipf_edges(ray_session, tmp_path):
    # empty corpus -> NULL fit
    os.makedirs(os.path.join(tmp_path, "e"))
    sf = _docs(os.path.join(tmp_path, "e"), [])
    eng = _parity(ST.zipf_slope, ST.sql_zipf_slope(), sf)
    assert eng.loc[0, "n_terms"] == 0 and eng.loc[0, "total_tokens"] == 0
    assert pd.isna(eng.loc[0, "slope"]) and pd.isna(eng.loc[0, "r2"])
    # single distinct term -> one fit point -> NULL slope (DuckDB
    # regr_* semantics), counts still exact
    os.makedirs(os.path.join(tmp_path, "s"))
    sf = _docs(os.path.join(tmp_path, "s"), ["zzz zzz", "zzz"])
    eng = _parity(ST.zipf_slope, ST.sql_zipf_slope(), sf)
    assert eng.loc[0, "n_terms"] == 1 and eng.loc[0, "total_tokens"] == 3
    assert pd.isna(eng.loc[0, "slope"])
    # constant counts -> slope 0, r2 = 1.0 (DuckDB's constant-y rule)
    os.makedirs(os.path.join(tmp_path, "c"))
    sf = _docs(os.path.join(tmp_path, "c"), ["aa bb", "cc dd"])
    eng = _parity(ST.zipf_slope, ST.sql_zipf_slope(), sf)
    assert eng.loc[0, "slope"] == 0.0 and eng.loc[0, "r2"] == 1.0


def test_zipf_planted_powerlaw(ray_session, tmp_path):
    # counts k_r = round(64 / r): a clean power law -> slope near -1
    texts = []
    for r, term in enumerate(
            ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"], 1):
        texts.append(" ".join([term] * round(64 / r)))
    sf = _docs(tmp_path, texts)
    eng = _parity(ST.zipf_slope, ST.sql_zipf_slope(), sf)
    assert eng.loc[0, "n_terms"] == 6
    assert -1.1 <= eng.loc[0, "slope"] <= -0.9
    assert eng.loc[0, "r2"] >= 0.99


def _q21_tables(tmp_path, orders_rows, li_rows, supp_keys):
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    no, nl = len(orders_rows), len(li_rows)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in orders_rows], pa.int64()),
        "o_custkey": pa.array(np.ones(no, np.int64)),
        "o_orderstatus": pa.array(["O"] * no, pa.string()),
        "o_totalprice": pa.array(np.ones(no), pa.float64()),
        "o_orderdate": pa.array([ts(r[1]) for r in orders_rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * no, pa.string()),
    }), os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_partkey": pa.array(np.ones(nl, np.int64)),
        "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
        "l_linenumber": pa.array(np.arange(nl, dtype=np.int32),
                                 pa.int32()),
        "l_quantity": pa.array(np.ones(nl), pa.float64()),
        "l_extendedprice": pa.array(np.ones(nl), pa.float64()),
        "l_discount": pa.array(np.zeros(nl), pa.float64()),
        "l_tax": pa.array(np.zeros(nl), pa.float64()),
        "l_returnflag": pa.array(["N"] * nl, pa.string()),
        "l_linestatus": pa.array(["O"] * nl, pa.string()),
        "l_shipdate": pa.array([ts(r[2]) for r in li_rows],
                               pa.timestamp("us")),
    }), os.path.join(tmp_path, "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(supp_keys, pa.int64()),
        "s_name": pa.array([f"Supplier#{k}" for k in supp_keys],
                           pa.string()),
        "s_nationkey": pa.array(np.zeros(len(supp_keys), np.int32),
                                pa.int32()),
        "s_acctbal": pa.array(np.zeros(len(supp_keys)), pa.float64()),
    }), os.path.join(tmp_path, "supplier.parquet"))
    return str(tmp_path)


def test_sole_late_supplier_adversarial(ray_session, tmp_path):
    d0 = "2020-01-01"
    sf = _q21_tables(
        tmp_path,
        orders_rows=[(1, d0), (2, d0), (3, d0), (4, d0), (5, d0)],
        li_rows=[
            (1, 10, "2020-05-01"), (1, 11, "2020-01-15"),  # sole late
            (2, 10, "2020-05-01"), (2, 12, "2020-06-01"),  # two late
            (3, 13, "2020-09-01"),                         # single supp
            (4, 99, "2020-05-01"), (4, 10, "2020-01-10"),  # 99 dangling
            (5, 11, "2020-03-01"), (5, 12, "2020-01-05"),  # +60d exact
        ],
        supp_keys=[10, 11, 12, 13])
    eng = _parity(RX.sole_late_supplier, RX.sql_sole_late_supplier(),
                  sf, tables=("orders", "lineitem", "supplier"))
    # only order 1 credits: supplier 10, once. Order 4's real supplier
    # count is 1 after the dangling filter; order 5's last ship lands
    # exactly on the +60d boundary (NOT late under strict >).
    assert len(eng) == 1
    assert eng.loc[0, "s_suppkey"] == 10 and eng.loc[0, "numwait"] == 1


def test_sole_late_supplier_multi_line_collapse(ray_session, tmp_path):
    # the per-(order, supplier) max-ship collapse: an early line must
    # not shield a late line, and two late LINES of one supplier are
    # still ONE late supplier
    d0 = "2020-01-01"
    sf = _q21_tables(
        tmp_path,
        orders_rows=[(1, d0)],
        li_rows=[(1, 10, "2020-01-02"), (1, 10, "2020-07-01"),
                 (1, 10, "2020-08-01"), (1, 11, "2020-01-03")],
        supp_keys=[10, 11])
    eng = _parity(RX.sole_late_supplier, RX.sql_sole_late_supplier(),
                  sf, tables=("orders", "lineitem", "supplier"))
    assert len(eng) == 1
    assert eng.loc[0, "s_suppkey"] == 10 and eng.loc[0, "numwait"] == 1
