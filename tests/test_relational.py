"""relational.py operators: DuckDB parity on adversarial synthetic
star tables the sf fixtures lack — threshold-boundary rows (strict >),
region/nation mismatches on exactly one side of the Q5 join, top-k
ties and truncation, churn-cutoff boundary orders — plus bucket-count
invariance (the orderkey/custkey hash mask must never change results,
only group sizes)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.pipelines import relational as R

US_DAY = 86_400_000_000
T96 = int(pd.Timestamp("1996-06-01").value // 1000)   # inside Q5 window
T95 = int(pd.Timestamp("1995-06-01").value // 1000)   # outside (before)
T_MAR = int(pd.Timestamp("1996-03-10").value // 1000)  # inside Q14 month
T_FEB = int(pd.Timestamp("1996-02-10").value // 1000)  # outside
T_NEW = int(pd.Timestamp("2000-01-01").value // 1000)  # after churn cutoff
T_OLD = int(pd.Timestamp("1998-01-01").value // 1000)  # before churn cutoff
T_EDGE = int(pd.Timestamp("1999-01-01").value // 1000)  # exactly at cutoff


def _ts(us):
    return pa.array(np.asarray(us, dtype=np.int64), pa.timestamp("us"))


def _write(tmp_path, name, table):
    pq.write_table(table, os.path.join(tmp_path, name))


def _star(tmp_path, customers, suppliers, parts, orders, lineitems):
    """customers: (custkey, nationkey, acctbal); suppliers:
    (suppkey, nationkey); parts: (partkey, type); orders: (okey,
    custkey, date_us, totalprice); lineitems: (okey, partkey, suppkey,
    qty, extprice, discount, ship_us)."""
    _write(tmp_path, "region.parquet", pa.table({
        "r_regionkey": pa.array([0, 1, 2, 3, 4], pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"], pa.string())}))
    nk = list(range(10))
    _write(tmp_path, "nation.parquet", pa.table({
        "n_nationkey": pa.array(nk, pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in nk], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in nk], pa.int32())}))
    c = pd.DataFrame(customers, columns=["ck", "nk", "bal"])
    _write(tmp_path, "customer.parquet", pa.table({
        "c_custkey": pa.array(c.ck.to_numpy(np.int64), pa.int64()),
        "c_name": pa.array([f"C{int(k)}" for k in c.ck], pa.string()),
        "c_nationkey": pa.array(c.nk.to_numpy(np.int32), pa.int32()),
        "c_acctbal": pa.array(c.bal.to_numpy(np.float64), pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * len(c), pa.string())}))
    s = pd.DataFrame(suppliers, columns=["sk", "nk"])
    _write(tmp_path, "supplier.parquet", pa.table({
        "s_suppkey": pa.array(s.sk.to_numpy(np.int64), pa.int64()),
        "s_name": pa.array([f"S{int(k)}" for k in s.sk], pa.string()),
        "s_nationkey": pa.array(s.nk.to_numpy(np.int32), pa.int32()),
        "s_acctbal": pa.array(np.zeros(len(s)), pa.float64())}))
    p = pd.DataFrame(parts, columns=["pk", "type"])
    _write(tmp_path, "part.parquet", pa.table({
        "p_partkey": pa.array(p.pk.to_numpy(np.int64), pa.int64()),
        "p_name": pa.array([f"P{int(k)}" for k in p.pk], pa.string()),
        "p_brand": pa.array(["Brand#1"] * len(p), pa.string()),
        "p_type": pa.array(p.type.tolist(), pa.string()),
        "p_size": pa.array(np.ones(len(p), np.int32), pa.int32()),
        "p_retailprice": pa.array(np.ones(len(p)), pa.float64())}))
    o = pd.DataFrame(orders, columns=["ok", "ck", "dus", "tot"])
    _write(tmp_path, "orders.parquet", pa.table({
        "o_orderkey": pa.array(o.ok.to_numpy(np.int64), pa.int64()),
        "o_custkey": pa.array(o.ck.to_numpy(np.int64), pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(o), pa.string()),
        "o_totalprice": pa.array(o.tot.to_numpy(np.float64),
                                 pa.float64()),
        "o_orderdate": _ts(o.dus),
        "o_orderpriority": pa.array(["1-URGENT"] * len(o),
                                    pa.string())}))
    li = pd.DataFrame(lineitems, columns=["ok", "pk", "sk", "qty",
                                          "ext", "disc", "sus"])
    _write(tmp_path, "lineitem.parquet", pa.table({
        "l_orderkey": pa.array(li.ok.to_numpy(np.int64), pa.int64()),
        "l_partkey": pa.array(li.pk.to_numpy(np.int64), pa.int64()),
        "l_suppkey": pa.array(li.sk.to_numpy(np.int64), pa.int64()),
        "l_linenumber": pa.array(np.arange(1, len(li) + 1, dtype=np.int32),
                                 pa.int32()),
        "l_quantity": pa.array(li.qty.to_numpy(np.float64), pa.float64()),
        "l_extendedprice": pa.array(li.ext.to_numpy(np.float64),
                                    pa.float64()),
        "l_discount": pa.array(li.disc.to_numpy(np.float64),
                               pa.float64()),
        "l_tax": pa.array(np.zeros(len(li)), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(li), pa.string()),
        "l_linestatus": pa.array(["O"] * len(li), pa.string()),
        "l_shipdate": _ts(li.sus)}))
    return str(tmp_path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


def _assert_parity(eng, sf, sql):
    pd.testing.assert_frame_equal(_norm(eng.to_pandas()),
                                  _norm(_oracle(sf, sql)),
                                  check_dtype=False)


# nation 2 and 7 are ASIA (regionkey 2); nation 0/5 are AFRICA.
Q5_FIXTURE = dict(
    customers=[(1, 2, 100.0),   # ASIA customer
               (2, 7, 100.0),   # ASIA customer, other nation
               (3, 0, 100.0)],  # AFRICA customer
    suppliers=[(10, 2), (11, 7), (12, 0)],
    parts=[(100, "PROMO"), (101, "STANDARD")],
    orders=[(1000, 1, T96, 10.0),   # in window, ASIA cust (nation 2)
            (1001, 2, T96, 10.0),   # in window, ASIA cust (nation 7)
            (1002, 3, T96, 10.0),   # in window, AFRICA cust
            (1003, 1, T95, 10.0)],  # OUT of window
    lineitems=[
        # order 1000 (cust nation 2): supp nation 2 -> COUNTS
        (1000, 100, 10, 1.0, 100.0, 0.05, T96),
        # supp nation 7 (in region, wrong nation) -> does NOT count
        (1000, 100, 11, 1.0, 100.0, 0.05, T96),
        # supp nation 0 (out of region) -> does NOT count
        (1000, 100, 12, 1.0, 100.0, 0.05, T96),
        # order 1001 (cust nation 7): supp nation 7 -> COUNTS
        (1001, 101, 11, 1.0, 200.0, 0.10, T96),
        # order 1002 (AFRICA cust): same-nation supplier, but customer
        # region wrong -> does NOT count
        (1002, 101, 12, 1.0, 300.0, 0.0, T96),
        # order 1003: out of the date window -> does NOT count
        (1003, 100, 10, 1.0, 400.0, 0.0, T96),
    ])


def test_local_supplier_volume_adversarial(ray_session, tmp_path):
    sf = _star(tmp_path, **Q5_FIXTURE)
    out = R.local_supplier_volume(sf)
    _assert_parity(out, sf, R.sql_local_supplier_volume())
    df = out.to_pandas().set_index("n_name")
    # only the matched-nation, in-window, in-region lines survive
    assert set(df.index) == {"NATION_2", "NATION_7"}
    assert df.loc["NATION_2", "revenue_c4"] == 10000 * 95
    assert df.loc["NATION_7", "revenue_c4"] == 20000 * 90


def test_big_orders_threshold_and_ties(ray_session, tmp_path):
    # order 1: qty sum exactly Q18_QTY -> excluded (strict >);
    # order 2: qty Q18_QTY + 1 -> included; orders 3/4: identical
    # totalprice -> tiebreak by (date, orderkey); order 5: no lines
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0)],
        suppliers=[(10, 2)],
        parts=[(100, "STANDARD")],
        orders=[(1, 1, T96, 50.0), (2, 1, T96, 50.0),
                (3, 1, T96 + US_DAY, 70.0), (4, 1, T96, 70.0),
                (5, 1, T96, 99.0)],
        lineitems=[
            (1, 100, 10, R.Q18_QTY, 1.0, 0.0, T96),
            (2, 100, 10, R.Q18_QTY // 2, 1.0, 0.0, T96),
            (2, 100, 10, R.Q18_QTY - R.Q18_QTY // 2 + 1, 1.0, 0.0, T96),
            (3, 100, 10, R.Q18_QTY + 5, 1.0, 0.0, T96),
            (4, 100, 10, R.Q18_QTY + 5, 1.0, 0.0, T96),
        ])
    out = R.big_orders(sf)
    _assert_parity(out, sf, R.sql_big_orders())
    df = out.to_pandas()
    assert df.o_orderkey.tolist() == [4, 3, 2]  # price desc, date, key
    assert 1 not in set(df.o_orderkey) and 5 not in set(df.o_orderkey)


def test_big_orders_truncation(ray_session, tmp_path):
    n = R.Q18_K + 7
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0)],
        suppliers=[(10, 2)],
        parts=[(100, "STANDARD")],
        orders=[(k, 1, T96, float(k)) for k in range(1, n + 1)],
        lineitems=[(k, 100, 10, R.Q18_QTY + 1, 1.0, 0.0, T96)
                   for k in range(1, n + 1)])
    out = R.big_orders(sf)
    _assert_parity(out, sf, R.sql_big_orders())
    df = out.to_pandas()
    assert len(df) == R.Q18_K
    # highest prices kept
    assert df.o_orderkey.tolist() == list(range(n, n - R.Q18_K, -1))


def test_promo_revenue_month_filter(ray_session, tmp_path):
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0)],
        suppliers=[(10, 2)],
        parts=[(100, "PROMO"), (101, "STANDARD")],
        orders=[(1, 1, T96, 1.0)],
        lineitems=[
            (1, 100, 10, 1.0, 100.0, 0.10, T_MAR),  # promo, in month
            (1, 101, 10, 1.0, 300.0, 0.00, T_MAR),  # non-promo, in
            (1, 100, 10, 1.0, 999.0, 0.00, T_FEB),  # out of month
        ])
    out = R.promo_revenue(sf)
    _assert_parity(out, sf, R.sql_promo_revenue())
    row = out.to_pandas().iloc[0]
    assert row.promo_c4 == 10000 * 90
    assert row.total_c4 == 10000 * 90 + 30000 * 100


def test_churned_customers_boundaries(ray_session, tmp_path):
    # positive balances: 100, 200, 300 -> mean 200. Customer exactly
    # AT the mean is excluded (strict >). Above-mean customers: one
    # with an old order only (churned), one with an order exactly at
    # the cutoff (NOT churned — >= cutoff counts as active), one with
    # no orders at all (churned). Negative-balance customer never
    # qualifies.
    sf = _star(
        tmp_path,
        customers=[(1, 2, 100.0), (2, 2, 200.0), (3, 2, 300.0),
                   (4, 3, 250.0), (5, 3, 260.0), (6, 4, -50.0)],
        suppliers=[(10, 2)],
        parts=[(100, "STANDARD")],
        orders=[(1, 3, T_OLD, 1.0),    # cust 3: old order only -> churned
                (2, 4, T_EDGE, 1.0),   # cust 4: at cutoff -> active
                (3, 5, T_OLD, 1.0)],   # cust 5: old only -> churned
        lineitems=[(1, 100, 10, 1.0, 1.0, 0.0, T_OLD)])
    out = R.churned_customers(sf)
    _assert_parity(out, sf, R.sql_churned_customers())
    df = out.to_pandas().set_index("c_nationkey")
    # churned: cust 3 (nation 2, 300), cust 5 (nation 3, 260);
    # cust 2 at-mean excluded, cust 4 active, cust 6 negative
    assert df.loc[2, "n_cust"] == 1 and df.loc[2, "bal_cents"] == 30000
    assert df.loc[3, "n_cust"] == 1 and df.loc[3, "bal_cents"] == 26000
    assert 4 not in df.index


def test_bucket_count_invariance(ray_session, tmp_path, monkeypatch):
    sf = _star(tmp_path, **Q5_FIXTURE)
    results = {}
    for nb in (2, 64):
        monkeypatch.setattr("raysearch.hashing.auto_buckets",
                            lambda n, _nb=nb, **kw: _nb)
        results[nb] = {
            "q5": _norm(R.local_supplier_volume(sf).to_pandas()),
            "q18": _norm(R.big_orders(sf).to_pandas()),
            "q22": _norm(R.churned_customers(sf).to_pandas()),
        }
    for key in results[2]:
        pd.testing.assert_frame_equal(results[2][key], results[64][key])


def test_broadcast_cap_raises(ray_session, tmp_path, monkeypatch):
    sf = _star(tmp_path, **Q5_FIXTURE)
    monkeypatch.setattr(R, "JOIN_BROADCAST_CAP", 0)
    with pytest.raises(ValueError, match="broadcast cap"):
        R.local_supplier_volume(sf)
    with pytest.raises(ValueError, match="broadcast cap"):
        R.promo_revenue(sf)


def test_cust_order_dist_outer_semantics(ray_session, tmp_path):
    # customer 3 has NO orders (the zero bucket the LEFT join must
    # keep); order 1003's custkey 99 has NO customer row (must not
    # mint a phantom customer)
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0), (2, 2, 0.0), (3, 2, 0.0)],
        suppliers=[(10, 2)],
        parts=[(100, "STANDARD")],
        orders=[(1000, 1, T96, 1.0), (1001, 1, T96, 1.0),
                (1002, 2, T96, 1.0), (1003, 99, T96, 1.0)],
        lineitems=[(1000, 100, 10, 1.0, 1.0, 0.0, T96)])
    out = R.cust_order_dist(sf)
    _assert_parity(out, sf, R.sql_cust_order_dist())
    d = out.to_pandas().set_index("c_count").custdist
    assert d.loc[0] == 1      # customer 3
    assert d.loc[1] == 1      # customer 2
    assert d.loc[2] == 1      # customer 1
    assert d.sum() == 3       # custkey 99 minted nothing


def test_top_suppliers_ties_and_window(ray_session, tmp_path):
    # suppliers 10 and 11 tie exactly; supplier 12 leads only if the
    # out-of-window line were (wrongly) counted
    t_in = int(pd.Timestamp("1996-02-01").value // 1000)
    t_out = int(pd.Timestamp("1996-04-01").value // 1000)  # first OUT
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0)],
        suppliers=[(10, 2), (11, 2), (12, 2)],
        parts=[(100, "STANDARD")],
        orders=[(1, 1, T96, 1.0)],
        lineitems=[
            (1, 100, 10, 1.0, 500.0, 0.0, t_in),
            (1, 100, 11, 1.0, 200.0, 0.0, t_in),
            (1, 100, 11, 1.0, 300.0, 0.0, t_in),
            (1, 100, 12, 1.0, 400.0, 0.0, t_in),
            (1, 100, 12, 1.0, 900.0, 0.0, t_out),  # boundary: excluded
        ])
    out = R.top_suppliers(sf)
    _assert_parity(out, sf, R.sql_top_suppliers())
    df = out.to_pandas()
    assert df.s_suppkey.tolist() == [10, 11]       # exact tie kept
    assert (df.revenue_c4 == 50000 * 100).all()
