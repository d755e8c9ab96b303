"""qty_price_corr: exact-moment Pearson correlation vs the DuckDB
HUGEINT oracle on planted-correlation tables — perfect positive /
negative correlation, zero variance on either axis, and a single-row
group (den = 0 on both axes)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import stats as ST


def _write_li(tmp_path, rows):
    """rows: (returnflag, qty, extprice)"""
    n = len(rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "l_partkey": pa.array(np.zeros(n, np.int64)),
        "l_suppkey": pa.array(np.zeros(n, np.int64)),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int32),
                                 pa.int32()),
        "l_quantity": pa.array([float(r[1]) for r in rows],
                               pa.float64()),
        "l_extendedprice": pa.array([float(r[2]) for r in rows],
                                    pa.float64()),
        "l_discount": pa.array(np.zeros(n), pa.float64()),
        "l_tax": pa.array(np.zeros(n), pa.float64()),
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array(np.zeros(n, np.int64),
                               pa.timestamp("us")),
    }), os.path.join(tmp_path, "lineitem.parquet"))
    return str(tmp_path)


def _parity(sf):
    eng = ST.qty_price_corr(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    ora = con.execute(ST.sql_qty_price_corr()).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=True)
    return eng.set_index("l_returnflag")


def test_planted_correlations(ray_session, tmp_path):
    rows = (
        # flag A: price = qty -> r = +1 exactly
        [("A", q, float(q)) for q in (1, 5, 9, 20, 33)]
        # flag N: price = 100 - qty -> r = -1 exactly
        + [("N", q, float(100 - q)) for q in (2, 7, 11, 40)]
        # flag R: qty constant -> zero variance -> r = 0 by contract
        + [("R", 5, p) for p in (1.0, 2.0, 9.0)]
        # flag Z: single row -> both denominators 0 -> r = 0
        + [("Z", 3, 4.5)]
    )
    sf = _write_li(tmp_path, rows)
    byflag = _parity(sf)
    assert byflag.loc["A", "corr_qty_price"] == 1.0
    assert byflag.loc["N", "corr_qty_price"] == -1.0
    assert byflag.loc["R", "corr_qty_price"] == 0.0
    assert byflag.loc["Z", "corr_qty_price"] == 0.0
    assert byflag.loc["A", "n_rows"] == 5


def test_noisy_correlation_matches_numpy(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    q = rng.integers(1, 50, size=300)
    price = (q * 7 + rng.integers(0, 40, size=300)) / 1.0
    rows = [("A", int(qi), float(pi)) for qi, pi in zip(q, price)]
    sf = _write_li(tmp_path, rows)
    byflag = _parity(sf)
    want = np.corrcoef(q.astype(float), price)[0, 1]
    assert abs(byflag.loc["A", "corr_qty_price"] - want) < 1e-4


def test_sum_of_squares_beyond_int64(ray_session, tmp_path):
    """The Σcents² moment exceeds int64 by 14x here (1.2M max-price
    rows): footer-stat-capped batches + Python-int reduction must
    still match the HUGEINT oracle exactly (a naive int64 Sum wraps
    silently — it sat at 80% of range at sf0.1)."""
    rng = np.random.default_rng(1)
    n = 1_200_000
    qty = rng.integers(1, 50, n)
    tbl = pa.table({
        "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "l_partkey": pa.array(np.zeros(n, np.int64)),
        "l_suppkey": pa.array(np.zeros(n, np.int64)),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int32),
                                 pa.int32()),
        "l_quantity": pa.array(qty.astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.full(n, 104999.99),
                                    pa.float64()),
        "l_discount": pa.array(np.zeros(n), pa.float64()),
        "l_tax": pa.array(np.zeros(n), pa.float64()),
        "l_returnflag": pa.array(["A"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array(np.zeros(n, np.int64),
                               pa.timestamp("us")),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "lineitem.parquet"))
    byflag = _parity(str(tmp_path))
    # price is constant -> zero variance on y -> r = 0 by contract,
    # and the exact integer sums survive the hash compare
    assert byflag.loc["A", "corr_qty_price"] == 0.0
    assert byflag.loc["A", "n_rows"] == n
