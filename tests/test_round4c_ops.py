"""Round-4 third-wave relational ops: forecast_revenue (Q6 shape),
min_cost_supplier (Q2 shape), important_parts (Q11 shape) —
adversarial-edge parity against their DuckDB oracles (boundary
discounts/dates/quantities, argmin tie-breaks, dangling FKs, the
exact fraction-threshold boundary)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import relational_ext as RX


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


def _parity(fn, sql, sf, tables):
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


def _tables(tmp_path, li_rows, part_rows=None, supp_keys=(1,)):
    """li_rows: (partkey, suppkey, qty, extprice, discount, shipdate);
    part_rows: (partkey, brand)."""
    ts = lambda s: np.datetime64(s, "us")  # noqa: E731
    nl = len(li_rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.arange(nl, dtype=np.int64)),
        "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
        "l_linenumber": pa.array(np.zeros(nl, np.int32), pa.int32()),
        "l_quantity": pa.array([float(r[2]) for r in li_rows],
                               pa.float64()),
        "l_extendedprice": pa.array([float(r[3]) for r in li_rows],
                                    pa.float64()),
        "l_discount": pa.array([float(r[4]) for r in li_rows],
                               pa.float64()),
        "l_tax": pa.array(np.zeros(nl), pa.float64()),
        "l_returnflag": pa.array(["N"] * nl, pa.string()),
        "l_linestatus": pa.array(["O"] * nl, pa.string()),
        "l_shipdate": pa.array([ts(r[5]) for r in li_rows],
                               pa.timestamp("us")),
    }), os.path.join(tmp_path, "lineitem.parquet"))
    part_rows = part_rows or [(1, "Brand#4")]
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in part_rows], pa.int64()),
        "p_name": pa.array([f"part {r[0]}" for r in part_rows],
                           pa.string()),
        "p_brand": pa.array([r[1] for r in part_rows], pa.string()),
        "p_type": pa.array(["T"] * len(part_rows), pa.string()),
        "p_size": pa.array(np.ones(len(part_rows), np.int32),
                           pa.int32()),
        "p_retailprice": pa.array(np.ones(len(part_rows)),
                                  pa.float64()),
    }), os.path.join(tmp_path, "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(list(supp_keys), pa.int64()),
        "s_name": pa.array([f"Supplier#{k}" for k in supp_keys],
                           pa.string()),
        "s_nationkey": pa.array(np.zeros(len(supp_keys), np.int32),
                                pa.int32()),
        "s_acctbal": pa.array(np.zeros(len(supp_keys)), pa.float64()),
    }), os.path.join(tmp_path, "supplier.parquet"))
    return str(tmp_path)


def test_forecast_revenue_boundaries(ray_session, tmp_path):
    d_in, d_lo = "1996-06-01", "1996-01-01"
    sf = _tables(tmp_path, [
        (1, 1, 10, 100.00, 0.05, d_in),    # lo edge: IN
        (1, 1, 10, 100.00, 0.07, d_in),    # hi edge: IN
        (1, 1, 10, 100.00, 0.04, d_in),    # below band: OUT
        (1, 1, 10, 100.00, 0.08, d_in),    # above band: OUT
        (1, 1, 24, 100.00, 0.06, d_in),    # qty == 24: OUT (strict <)
        (1, 1, 23, 100.00, 0.06, d_in),    # qty 23: IN
        (1, 1, 10, 100.00, 0.06, d_lo),    # date lo edge: IN
        (1, 1, 10, 100.00, 0.06, "1997-01-01"),  # date hi edge: OUT
        (1, 1, 10, 100.00, 0.06, "1995-12-31"),  # before: OUT
    ])
    eng = _parity(RX.forecast_revenue, RX.sql_forecast_revenue(), sf,
                  ("lineitem",))
    assert eng.loc[0, "n_lines"] == 4
    # 10000 cents x (5 + 7 + 6 + 6) = 240000 c3 = 24.0 dollars
    assert eng.loc[0, "revenue_c3"] == 240_000
    assert abs(eng.loc[0, "revenue"] - 24.0) <= 1e-9


def test_forecast_revenue_empty_slice(ray_session, tmp_path):
    sf = _tables(tmp_path, [(1, 1, 50, 100.00, 0.0, "1996-06-01")])
    eng = _parity(RX.forecast_revenue, RX.sql_forecast_revenue(), sf,
                  ("lineitem",))
    assert eng.loc[0, "n_lines"] == 0
    assert eng.loc[0, "revenue_c3"] == 0
    assert eng.loc[0, "revenue"] == 0.0


def test_min_cost_supplier_ties_and_dangling(ray_session, tmp_path):
    d = "1996-06-01"
    sf = _tables(tmp_path, [
        # part 1: dangling supplier 99 has the strictly cheapest
        # shipment -> filtered BEFORE argmin; then 10 vs 20 tie at
        # 50.00 -> smallest suppkey (10) wins
        (1, 99, 1, 10.00, 0.0, d),
        (1, 20, 1, 50.00, 0.0, d),
        (1, 10, 1, 50.00, 0.0, d),
        (1, 30, 1, 60.00, 0.0, d),
        # part 2: wrong brand -> absent
        (2, 10, 1, 5.00, 0.0, d),
        # part 3: right brand but only-dangling lines -> absent
        (3, 99, 1, 1.00, 0.0, d),
        # part 4: never shipped -> absent
    ], part_rows=[(1, "Brand#4"), (2, "Brand#1"), (3, "Brand#4"),
                  (4, "Brand#4")],
        supp_keys=(10, 20, 30))
    eng = _parity(RX.min_cost_supplier, RX.sql_min_cost_supplier(), sf,
                  ("lineitem", "part", "supplier"))
    assert len(eng) == 1
    assert eng.loc[0, "p_partkey"] == 1
    assert eng.loc[0, "s_suppkey"] == 10
    assert eng.loc[0, "min_price_cents"] == 5000


def test_min_cost_supplier_multi_line_min(ray_session, tmp_path):
    # per-(part, supp) map-side min: a supplier's later cheap line
    # must beat another supplier's single mid line
    d = "1996-06-01"
    sf = _tables(tmp_path, [
        (1, 10, 1, 90.00, 0.0, d), (1, 10, 1, 20.00, 0.0, d),
        (1, 20, 1, 30.00, 0.0, d),
    ], part_rows=[(1, "Brand#4")], supp_keys=(10, 20))
    eng = _parity(RX.min_cost_supplier, RX.sql_min_cost_supplier(), sf,
                  ("lineitem", "part", "supplier"))
    assert eng.loc[0, "s_suppkey"] == 10
    assert eng.loc[0, "min_price_cents"] == 2000


def test_important_parts_exact_threshold(ray_session, tmp_path):
    # part 1 earns EXACTLY 11/10 of the mean (a=11.00, b=9.00:
    # a * n * 10 = 110000*20 = total * 11 = 200000*11... both sides
    # 2_200_000) -> strict > excludes it; part 2 is below mean ->
    # EMPTY result, exercising the empty-merge guard on both engines
    d = "1996-06-01"
    sf = _tables(tmp_path, [
        (1, 1, 1, 11.00, 0.0, d),     # c4 = 110_000
        (2, 1, 1, 9.00, 0.0, d),      # c4 =  90_000
    ], part_rows=[(1, "Brand#4"), (2, "Brand#4")])
    eng = _parity(RX.important_parts, RX.sql_important_parts(), sf,
                  ("lineitem",))
    assert len(eng) == 0
    # nudge part 1 one cent above the boundary -> included alone
    sf2 = _tables(tmp_path, [
        (1, 1, 1, 11.01, 0.0, d),     # c4 = 110_100
        (2, 1, 1, 9.00, 0.0, d),
    ], part_rows=[(1, "Brand#4"), (2, "Brand#4")])
    eng = _parity(RX.important_parts, RX.sql_important_parts(), sf2,
                  ("lineitem",))
    assert len(eng) == 1
    assert eng.loc[0, "p_partkey"] == 1
    assert eng.loc[0, "revenue_c4"] == 110_100


def test_fk_integrity_planted_violations(ray_session, tmp_path):
    ts = np.datetime64("2020-01-01", "us")
    # orders: 1 (2 children), 2 (childless), 3 (dangling custkey)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([100, 100, 999], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 3, pa.string()),
        "o_totalprice": pa.array(np.ones(3), pa.float64()),
        "o_orderdate": pa.array([ts] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 3, pa.string()),
    }), os.path.join(tmp_path, "orders.parquet"))
    # lineitem: 2 ok rows on order 1, 2 rows dangling to order 77
    # (counted per ROW), 1 row with unknown supplier on order 1
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 77, 77, 1], pa.int64()),
        "l_partkey": pa.array(np.ones(5, np.int64)),
        "l_suppkey": pa.array([10, 10, 10, 10, 55], pa.int64()),
        "l_linenumber": pa.array(np.zeros(5, np.int32), pa.int32()),
        "l_quantity": pa.array(np.ones(5), pa.float64()),
        "l_extendedprice": pa.array(np.ones(5), pa.float64()),
        "l_discount": pa.array(np.zeros(5), pa.float64()),
        "l_tax": pa.array(np.zeros(5), pa.float64()),
        "l_returnflag": pa.array(["N"] * 5, pa.string()),
        "l_linestatus": pa.array(["O"] * 5, pa.string()),
        "l_shipdate": pa.array([ts] * 5, pa.timestamp("us")),
    }), os.path.join(tmp_path, "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10], pa.int64()),
        "s_name": pa.array(["Supplier#10"], pa.string()),
        "s_nationkey": pa.array([0], pa.int32()),
        "s_acctbal": pa.array([0.0], pa.float64()),
    }), os.path.join(tmp_path, "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([100], pa.int64()),
        "c_name": pa.array(["Customer#100"], pa.string()),
        "c_nationkey": pa.array([0], pa.int32()),
        "c_acctbal": pa.array([0.0], pa.float64()),
        "c_mktsegment": pa.array(["B"], pa.string()),
    }), os.path.join(tmp_path, "customer.parquet"))
    eng = _parity(RX.fk_integrity, RX.sql_fk_integrity(),
                  str(tmp_path),
                  ("lineitem", "orders", "supplier", "customer"))
    r = eng.iloc[0]
    assert r["n_lineitem"] == 5 and r["n_orders"] == 3
    assert r["dangling_li_orders"] == 2     # per row, not per key
    assert r["childless_orders"] == 2       # orders 2 and 3
    assert r["dangling_li_supp"] == 1
    assert r["dangling_order_cust"] == 1


def test_important_parts_skewed_head(ray_session, tmp_path):
    # revenues [30, 10, 10, 10]: mean 15, only part 1 exceeds
    # 11/10 x mean; equal earners can never clear the multiple
    d = "1996-06-01"
    rows = [(1, 1, 1, 30.00, 0.0, d)] + [
        (pk, 1, 1, 10.00, 0.0, d) for pk in (2, 3, 4)]
    sf = _tables(tmp_path, rows,
                 part_rows=[(pk, "Brand#4") for pk in range(1, 5)])
    eng = _parity(RX.important_parts, RX.sql_important_parts(), sf,
                  ("lineitem",))
    assert len(eng) == 1
    assert eng.loc[0, "p_partkey"] == 1
