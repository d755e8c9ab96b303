"""relational_ext.py operators: DuckDB parity on adversarial synthetic
star tables — returnflag/window filters and k-boundary revenue ties
for the Q10 shape, same-nation pair drops and shipdate boundaries for
the Q7 shape, the strict integer 20%-of-average threshold for the Q17
shape — plus bucket-count invariance and dangling-key semantics
(a custkey with no customer row must never occupy a top-k slot)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.pipelines import relational_ext as RX

T_IN = int(pd.Timestamp("1996-02-01").value // 1000)   # Q10+Q7 windows
T_OUT = int(pd.Timestamp("1995-06-01").value // 1000)  # outside both
T_Q7_EDGE = int(pd.Timestamp("1997-01-01").value // 1000)  # at Q7 end


def _ts(us):
    return pa.array(np.asarray(us, dtype=np.int64), pa.timestamp("us"))


def _write(tmp_path, name, table):
    pq.write_table(table, os.path.join(tmp_path, name))


def _star(tmp_path, customers, suppliers, parts, orders, lineitems):
    """customers: (custkey, nationkey, acctbal); suppliers: (suppkey,
    nationkey); parts: (partkey, brand); orders: (okey, custkey,
    date_us); lineitems: (okey, partkey, suppkey, qty, extprice,
    discount, ship_us, returnflag)."""
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
    p = pd.DataFrame(parts, columns=["pk", "brand"])
    _write(tmp_path, "part.parquet", pa.table({
        "p_partkey": pa.array(p.pk.to_numpy(np.int64), pa.int64()),
        "p_name": pa.array([f"P{int(k)}" for k in p.pk], pa.string()),
        "p_brand": pa.array(p.brand.tolist(), pa.string()),
        "p_type": pa.array(["STANDARD"] * len(p), pa.string()),
        "p_size": pa.array(np.ones(len(p), np.int32), pa.int32()),
        "p_retailprice": pa.array(np.ones(len(p)), pa.float64())}))
    o = pd.DataFrame(orders, columns=["ok", "ck", "dus"])
    _write(tmp_path, "orders.parquet", pa.table({
        "o_orderkey": pa.array(o.ok.to_numpy(np.int64), pa.int64()),
        "o_custkey": pa.array(o.ck.to_numpy(np.int64), pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(o), pa.string()),
        "o_totalprice": pa.array(np.ones(len(o)), pa.float64()),
        "o_orderdate": _ts(o.dus),
        "o_orderpriority": pa.array(["1-URGENT"] * len(o),
                                    pa.string())}))
    li = pd.DataFrame(lineitems, columns=["ok", "pk", "sk", "qty",
                                          "ext", "disc", "sus", "rf"])
    _write(tmp_path, "lineitem.parquet", pa.table({
        "l_orderkey": pa.array(li.ok.to_numpy(np.int64), pa.int64()),
        "l_partkey": pa.array(li.pk.to_numpy(np.int64), pa.int64()),
        "l_suppkey": pa.array(li.sk.to_numpy(np.int64), pa.int64()),
        "l_linenumber": pa.array(
            np.arange(1, len(li) + 1, dtype=np.int32), pa.int32()),
        "l_quantity": pa.array(li.qty.to_numpy(np.float64),
                               pa.float64()),
        "l_extendedprice": pa.array(li.ext.to_numpy(np.float64),
                                    pa.float64()),
        "l_discount": pa.array(li.disc.to_numpy(np.float64),
                               pa.float64()),
        "l_tax": pa.array(np.zeros(len(li)), pa.float64()),
        "l_returnflag": pa.array(li.rf.tolist(), pa.string()),
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


def test_returned_item_customers_filters_and_ties(ray_session,
                                                  tmp_path,
                                                  monkeypatch):
    monkeypatch.setattr(RX, "Q10_K", 2)
    sf = _star(
        tmp_path,
        customers=[(1, 2, 10.5), (2, 3, -4.25), (3, 4, 0.0)],
        suppliers=[(10, 0)],
        parts=[(100, "Brand#1")],
        orders=[(1000, 1, T_IN),    # in window
                (1001, 2, T_IN),    # in window
                (1002, 3, T_IN),    # in window
                (1003, 1, T_OUT),   # OUT of window
                (1004, 99, T_IN)],  # DANGLING custkey
        lineitems=[
            # cust 1: returned revenue c4 = 10000*100 = 1,000,000
            (1000, 100, 10, 1.0, 100.0, 0.0, T_IN, "R"),
            # cust 2: same revenue -> exact tie with cust 1; the k=2
            # cut keeps BOTH (tie broken by custkey asc)
            (1001, 100, 10, 1.0, 100.0, 0.0, T_IN, "R"),
            # cust 3: higher revenue but flag N -> excluded entirely
            (1002, 100, 10, 1.0, 500.0, 0.0, T_IN, "N"),
            # cust 3: small returned line -> 3rd place, truncated
            (1002, 100, 10, 1.0, 1.0, 0.0, T_IN, "R"),
            # out-of-window order -> excluded
            (1003, 100, 10, 1.0, 900.0, 0.0, T_IN, "R"),
            # dangling custkey: must never occupy a top-k slot
            (1004, 100, 10, 1.0, 999.0, 0.0, T_IN, "R"),
        ])
    out = RX.returned_item_customers(sf)
    df = out.to_pandas()
    assert df.c_custkey.tolist() == [1, 2]  # tie kept, truncation at 2
    assert df.revenue_c4.tolist() == [1_000_000, 1_000_000]
    assert df.bal_cents.tolist() == [1050, -425]
    _assert_parity(out, sf, RX.sql_returned_item_customers())


def test_nation_trade_volume_pairs_and_window(ray_session, tmp_path):
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0), (2, 7, 0.0)],
        suppliers=[(10, 2), (11, 7)],
        parts=[(100, "Brand#1")],
        orders=[(1000, 1, T_OUT),   # order date irrelevant for Q7
                (1001, 2, T_IN)],
        lineitems=[
            # supp nation 2 == cust nation 2 -> SAME pair, dropped
            (1000, 100, 10, 1.0, 100.0, 0.05, T_IN, "N"),
            # supp 7 != cust 2 -> counts under (NATION_7, NATION_2)
            (1000, 100, 11, 1.0, 200.0, 0.10, T_IN, "N"),
            # supp 2 != cust 7 -> counts under (NATION_2, NATION_7)
            (1001, 100, 10, 1.0, 300.0, 0.0, T_IN, "N"),
            # ship date exactly AT the window end -> excluded
            (1001, 100, 10, 1.0, 400.0, 0.0, T_Q7_EDGE, "N"),
            # dangling suppkey -> dropped by the broadcast lookup
            (1001, 100, 99, 1.0, 500.0, 0.0, T_IN, "N"),
        ])
    out = RX.nation_trade_volume(sf)
    df = out.to_pandas()
    assert df.supp_nation.tolist() == ["NATION_2", "NATION_7"]
    assert df.revenue_c4.tolist() == [30000 * 100, 20000 * 90]
    _assert_parity(out, sf, RX.sql_nation_trade_volume())


def test_small_qty_revenue_integer_threshold(ray_session, tmp_path):
    # part 100 (Brand#4): quantities 1, 9, 10 -> n=3, sum=20,
    # threshold qty < 0.2*avg ⟺ 15*qty < 20 ⟺ qty <= 1: ONLY the
    # qty=1 line counts. A qty where 5*q*n == sq exactly must be
    # EXCLUDED (strict <): with n=2, sum=10 on part 101 -> qty=1
    # gives 10 == 10 -> out.
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0)],
        suppliers=[(10, 2)],
        parts=[(100, "Brand#4"), (101, "Brand#4"),
               (102, "Brand#9")],   # other brand: never counted
        orders=[(1000, 1, T_IN)],
        lineitems=[
            (1000, 100, 10, 1.0, 111.0, 0.0, T_IN, "N"),   # kept
            (1000, 100, 10, 9.0, 222.0, 0.0, T_IN, "N"),
            (1000, 100, 10, 10.0, 333.0, 0.0, T_IN, "N"),
            (1000, 101, 10, 1.0, 444.0, 0.0, T_IN, "N"),   # == edge
            (1000, 101, 10, 9.0, 555.0, 0.0, T_IN, "N"),
            (1000, 102, 10, 1.0, 666.0, 0.0, T_IN, "N"),   # brand
        ])
    out = RX.small_qty_revenue(sf)
    df = out.to_pandas()
    assert df.n_lines.tolist() == [1]
    assert df.sum_cents.tolist() == [11100]
    _assert_parity(out, sf, RX.sql_small_qty_revenue())


def test_small_qty_revenue_empty_brand(ray_session, tmp_path):
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0)],
        suppliers=[(10, 2)],
        parts=[(100, "Brand#1")],
        orders=[(1000, 1, T_IN)],
        lineitems=[(1000, 100, 10, 1.0, 100.0, 0.0, T_IN, "N")])
    out = RX.small_qty_revenue(sf)
    assert out.to_pandas().n_lines.tolist() == [0]
    _assert_parity(out, sf, RX.sql_small_qty_revenue())


def test_bucket_count_invariance(ray_session, tmp_path, monkeypatch):
    sf = _star(
        tmp_path,
        customers=[(i, i % 5, float(i)) for i in range(1, 8)],
        suppliers=[(10, 2), (11, 7)],
        parts=[(100, "Brand#4")],
        orders=[(1000 + i, 1 + (i % 7), T_IN) for i in range(12)],
        lineitems=[(1000 + i, 100, 10 + (i % 2), 1.0 + i,
                    50.0 * (1 + i), 0.05, T_IN, "RN"[i % 2])
                   for i in range(12)])
    import raysearch.hashing as H

    results = {}
    for nbuck in (2, 16):
        monkeypatch.setattr(H, "auto_buckets", lambda *a, **k: nbuck)
        results[nbuck] = (
            RX.returned_item_customers(sf).to_pandas(),
            RX.nation_trade_volume(sf).to_pandas())
    for a, b in zip(results[2], results[16]):
        pd.testing.assert_frame_equal(a, b)


def test_dangling_nationkey_matches_oracle(ray_session, tmp_path):
    """An FK-violating c_nationkey/s_nationkey must DROP its rows
    exactly like the oracles' inner JOIN nation — never crash the
    driver-side name attach or occupy a top-k slot (the review probe
    that caught the original KeyError/ArrowTypeError)."""
    sf = _star(
        tmp_path,
        customers=[(1, 99, 5.0),   # nationkey 99: NO nation row
                   (2, 3, 7.0)],
        suppliers=[(10, 98),       # nationkey 98: NO nation row
                   (11, 2)],
        parts=[(100, "Brand#1")],
        orders=[(1000, 1, T_IN), (1001, 2, T_IN)],
        lineitems=[
            # cust 1 (dangling nation) would WIN on revenue
            (1000, 100, 11, 1.0, 900.0, 0.0, T_IN, "R"),
            (1001, 100, 11, 1.0, 100.0, 0.0, T_IN, "R"),
            # supplier 10's nation dangles -> its line drops from Q7
            (1001, 100, 10, 1.0, 500.0, 0.0, T_IN, "N"),
        ])
    q10 = RX.returned_item_customers(sf)
    assert q10.to_pandas().c_custkey.tolist() == [2]
    _assert_parity(q10, sf, RX.sql_returned_item_customers())
    q7 = RX.nation_trade_volume(sf)
    df = q7.to_pandas()
    assert df.supp_nation.tolist() == ["NATION_2"]
    _assert_parity(q7, sf, RX.sql_nation_trade_volume())


def test_disjunct_revenue_term_boundaries(ray_session, tmp_path,
                                          monkeypatch):
    """Q19 disjunction: BETWEEN is inclusive at BOTH bounds, a
    quantity satisfying a DIFFERENT term's range must not count, and
    brands outside every term never match."""
    monkeypatch.setattr(RX, "Q19_TERMS",
                        (("Brand#1", 1, 11), ("Brand#4", 10, 20)))
    sf = _star(
        tmp_path,
        customers=[(1, 2, 0.0)],
        suppliers=[(10, 2)],
        parts=[(100, "Brand#1"), (101, "Brand#4"),
               (102, "Brand#7")],
        orders=[(1000, 1, T_IN)],
        lineitems=[
            (1000, 100, 10, 1.0, 100.0, 0.0, T_IN, "N"),    # at lo
            (1000, 100, 10, 11.0, 200.0, 0.05, T_IN, "N"),  # at hi
            (1000, 100, 10, 12.0, 300.0, 0.0, T_IN, "N"),   # out for
                                                            # B#1 but
                                                            # in B#4's
                                                            # range
            (1000, 101, 10, 10.0, 400.0, 0.0, T_IN, "N"),   # at lo
            (1000, 101, 10, 21.0, 500.0, 0.0, T_IN, "N"),   # out
            (1000, 102, 10, 5.0, 600.0, 0.0, T_IN, "N"),    # brand
        ])
    out = RX.disjunct_revenue(sf)
    df = out.to_pandas()
    assert df.n_lines.tolist() == [3]
    assert df.revenue_c4.tolist() == [
        10000 * 100 + 20000 * 95 + 40000 * 100]
    _assert_parity(out, sf, RX.sql_disjunct_revenue())


T_Q8_IN = int(pd.Timestamp("1996-07-01").value // 1000)
T_Q8_EDGE = int(pd.Timestamp("1998-01-01").value // 1000)  # excluded
T_Q8_97 = int(pd.Timestamp("1997-03-01").value // 1000)


def test_market_share_case_numerator(ray_session, tmp_path, monkeypatch):
    """Q8 shape: in-region/in-window gating, dangling-FK drops, and
    the CASE-numerator share per year."""
    monkeypatch.setattr(RX, "Q8_TYPE", "STANDARD")
    monkeypatch.setattr(RX, "Q8_TARGET", "NATION_2")
    sf = _star(
        tmp_path,
        customers=[(1, 3, 0.0), (2, 0, 0.0), (3, 8, 0.0)],
        # nation 3 and 8 are EUROPE (regionkey 3); nation 0 is not
        suppliers=[(1, 2), (2, 5), (3, 99)],   # s3: dangling nation
        parts=[(1, "B"), (2, "B")],
        orders=[(10, 1, T_Q8_IN),    # in region, 1996
                (11, 2, T_Q8_IN),    # out of region
                (12, 3, T_Q8_EDGE),  # boundary date: excluded
                (13, 1, T_Q8_97),    # in region, 1997
                (14, 999, T_Q8_IN)],  # dangling custkey
        lineitems=[
            (10, 1, 1, 1, 100.0, 0.0, T_IN, "N"),   # target 1996
            (10, 2, 2, 1, 300.0, 0.0, T_IN, "N"),   # non-target 1996
            (13, 1, 2, 1, 500.0, 0.0, T_IN, "N"),   # non-target 1997
            (13, 2, 3, 1, 700.0, 0.0, T_IN, "N"),   # dangling supp
            (11, 1, 1, 1, 900.0, 0.0, T_IN, "N"),   # out-of-region
            (12, 1, 1, 1, 1100.0, 0.0, T_IN, "N"),  # excluded date
            (14, 1, 1, 1, 1300.0, 0.0, T_IN, "N"),  # dangling cust
        ])
    out = RX.market_share(sf)
    _assert_parity(out, sf, RX.sql_market_share())
    df = out.to_pandas().set_index("o_year")
    assert df.loc[1996, "target_c4"] == 100 * 100 * 100
    assert df.loc[1996, "total_c4"] == (100 + 300) * 100 * 100
    assert df.loc[1996, "mkt_share"] == 0.25
    assert df.loc[1997, "target_c4"] == 0       # CASE numerator zero
    assert df.loc[1997, "mkt_share"] == 0.0
    assert set(df.index) == {1996, 1997}


def test_product_profit_substring_and_dangling(ray_session, tmp_path,
                                               monkeypatch):
    """Q9 shape: substring part-name match (P1 also matches P12) and
    dangling supplier drop; (nation, year) rollup."""
    monkeypatch.setattr(RX, "Q9_WORD", "P1")
    sf = _star(
        tmp_path,
        customers=[(1, 3, 0.0)],
        suppliers=[(1, 1), (2, 99)],            # s2: dangling nation
        parts=[(1, "B"), (2, "B"), (12, "B")],  # names P1, P2, P12
        orders=[(10, 1, T_Q8_IN), (11, 1, T_Q8_97)],
        lineitems=[
            (10, 1, 1, 1, 100.0, 0.0, T_IN, "N"),   # P1 1996
            (10, 2, 1, 1, 300.0, 0.0, T_IN, "N"),   # P2: name miss
            (11, 12, 1, 1, 500.0, 0.0, T_IN, "N"),  # P12 matches 'P1'
            (11, 1, 2, 1, 700.0, 0.0, T_IN, "N"),   # dangling supp
        ])
    out = RX.product_profit(sf)
    _assert_parity(out, sf, RX.sql_product_profit())
    df = out.to_pandas()
    assert df.nation.tolist() == ["NATION_1", "NATION_1"]
    assert df.o_year.tolist() == [1996, 1997]
    assert df.profit_c4.tolist() == [100 * 100 * 100, 500 * 100 * 100]
    assert df.n_lines.tolist() == [1, 1]


T_Q3_LATE = int(pd.Timestamp("1998-07-01").value // 1000)
T_Q3_EDGE = int(pd.Timestamp("1998-06-01").value // 1000)  # cutoff


def test_shipping_priority_window_and_ties(ray_session, tmp_path,
                                           monkeypatch):
    """Q3 shape: strict date boundaries on BOTH sides (an order placed
    AT the cutoff and a line shipped AT the cutoff are excluded),
    dangling-custkey drop, and the k-boundary revenue tie resolving by
    okey ASC."""
    monkeypatch.setattr(RX, "Q3_K", 1)
    sf = _star(
        tmp_path,
        customers=[(1, 3, 0.0), (2, 0, 0.0)],
        suppliers=[(1, 1)],
        parts=[(1, "B")],
        orders=[(10, 1, T_IN),        # in window
                (11, 1, T_Q3_EDGE),   # placed AT cutoff: excluded
                (12, 999, T_IN),      # dangling custkey
                (13, 2, T_IN)],       # in window, ties order 10
        lineitems=[
            (10, 1, 1, 1, 100.0, 0.0, T_Q3_LATE, "N"),  # counted
            (10, 1, 1, 1, 900.0, 0.0, T_IN, "N"),       # shipped early
            (10, 1, 1, 1, 900.0, 0.0, T_Q3_EDGE, "N"),  # AT cutoff
            (11, 1, 1, 1, 700.0, 0.0, T_Q3_LATE, "N"),  # order at edge
            (12, 1, 1, 1, 500.0, 0.0, T_Q3_LATE, "N"),  # dangling cust
            (13, 1, 1, 1, 100.0, 0.0, T_Q3_LATE, "N"),  # tie with 10
        ])
    out = RX.shipping_priority(sf)
    _assert_parity(out, sf, RX.sql_shipping_priority())
    df = out.to_pandas()
    # orders 10 and 13 both have revenue 100.00; okey ASC wins at k=1
    assert df.l_orderkey.tolist() == [10]
    assert df.revenue_c4.tolist() == [100 * 100 * 100]


def test_part_supplier_breadth_dedup_and_exclusion(ray_session,
                                                   tmp_path,
                                                   monkeypatch):
    """Q16 shape: (part, supplier) pair dedup across repeated lines,
    one supplier spanning two parts of the SAME group counted once,
    excluded brand and excluded (low-balance) supplier dropped, and a
    dangling suppkey (no supplier row) still counted — NOT IN
    semantics on both engines."""
    monkeypatch.setattr(RX, "Q16_EXCL_BRAND", "BX")
    monkeypatch.setattr(RX, "Q16_SIZES", (1,))
    monkeypatch.setattr(RX, "Q16_MIN_BAL", 0.0)
    sf = _star(
        tmp_path,
        customers=[(1, 3, 0.0)],
        suppliers=[(1, 1), (2, 2), (3, 3)],
        parts=[(1, "B"), (2, "B"), (3, "BX")],
        orders=[(10, 1, T_IN)],
        lineitems=[
            (10, 1, 1, 1, 1.0, 0.0, T_IN, "N"),   # s1 x p1
            (10, 1, 1, 1, 1.0, 0.0, T_IN, "N"),   # dup pair
            (10, 2, 1, 1, 1.0, 0.0, T_IN, "N"),   # s1 x p2: same group
            (10, 1, 2, 1, 1.0, 0.0, T_IN, "N"),   # s2 x p1
            (10, 1, 3, 1, 1.0, 0.0, T_IN, "N"),   # s3: excluded bal
            (10, 3, 2, 1, 1.0, 0.0, T_IN, "N"),   # brand BX: excluded
            (10, 1, 99, 1, 1.0, 0.0, T_IN, "N"),  # dangling suppkey
        ])
    # rewrite supplier with balances: s3 negative -> excluded at 0.0
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
        "s_nationkey": pa.array([1, 2, 3], pa.int32()),
        "s_acctbal": pa.array([5.0, 5.0, -5.0], pa.float64())}),
        os.path.join(sf, "supplier.parquet"))
    out = RX.part_supplier_breadth(sf)
    _assert_parity(out, sf, RX.sql_part_supplier_breadth())
    df = out.to_pandas()
    assert df.p_brand.tolist() == ["B"]
    assert df.supplier_cnt.tolist() == [3]  # s1, s2, dangling 99


def test_excess_suppliers_threshold(ray_session, tmp_path,
                                    monkeypatch):
    """Q20 shape: the strict 2*q > tot integer threshold (exactly half
    loses), per-part correlation, and a dominant supplier with a
    dangling nation dropped by the name join on both engines."""
    import datetime as _dt

    monkeypatch.setattr(RX, "Q20_WORD", "P")
    monkeypatch.setattr(RX, "Q20_D1", _dt.datetime(1995, 1, 1))
    monkeypatch.setattr(RX, "Q20_D2", _dt.datetime(1999, 1, 1))
    sf = _star(
        tmp_path,
        customers=[(1, 3, 0.0)],
        suppliers=[(1, 1), (2, 2), (3, 99)],   # s3: dangling nation
        parts=[(1, "B"), (2, "B"), (4, "B")],
        orders=[(10, 1, T_IN)],
        lineitems=[
            (10, 1, 1, 6.0, 1.0, 0.0, T_IN, "N"),   # p1: s1 6 of 10
            (10, 1, 2, 4.0, 1.0, 0.0, T_IN, "N"),   # p1: s2 4 of 10
            (10, 2, 3, 10.0, 1.0, 0.0, T_IN, "N"),  # p2: s3 dominant
                                                    # but nation 99
            (10, 4, 1, 5.0, 1.0, 0.0, T_IN, "N"),   # p4: exactly half
            (10, 4, 2, 5.0, 1.0, 0.0, T_IN, "N"),   # p4: exactly half
        ])
    out = RX.excess_suppliers(sf)
    _assert_parity(out, sf, RX.sql_excess_suppliers())
    df = out.to_pandas()
    assert df.s_suppkey.tolist() == [1]
    assert df.n_name.tolist() == ["NATION_1"]


def test_ship_delay_priority_boundaries(ray_session, tmp_path):
    """Q12 shape: delay exactly at the FAST/REGULAR boundaries is
    inclusive, a line shipped BEFORE its order (negative delay) is
    FAST, and NON-midnight timestamps classify by midnight-boundary
    count (DuckDB date_diff('day') semantics) — e.g. 23:00 to 01:00
    next day is delay 1, while 47 hours within-day-boundary is
    delay 1 too."""
    day = 86_400_000_000
    base = int(pd.Timestamp("1996-03-01").value // 1000)
    late = base + 23 * 3600 * 1_000_000          # 23:00 same day
    sf = _star(
        tmp_path,
        customers=[(1, 3, 0.0)],
        suppliers=[(1, 1)],
        parts=[(1, "B")],
        orders=[(10, 1, base),                    # 1-URGENT (fixture)
                (11, 1, late)],
        lineitems=[
            (10, 1, 1, 1, 1.0, 0.0, base + 30 * day, "N"),  # ==30 FAST
            (10, 1, 1, 1, 1.0, 0.0, base + 31 * day, "N"),  # 31 REG
            (10, 1, 1, 1, 1.0, 0.0, base + 90 * day, "N"),  # ==90 REG
            (10, 1, 1, 1, 1.0, 0.0, base + 91 * day, "N"),  # 91 SLOW
            (10, 1, 1, 1, 1.0, 0.0, base - day, "N"),       # -1 FAST
            (11, 1, 1, 1, 1.0, 0.0, late + 2 * 3600 * 1_000_000, "N"),
            # ^ 23:00 -> 01:00 next day: one midnight crossed, delay 1
        ])
    out = RX.ship_delay_priority(sf)
    _assert_parity(out, sf, RX.sql_ship_delay_priority())
    df = out.to_pandas().set_index("ship_class")
    assert df.loc["FAST", "high_line_count"] == 3   # 30d, -1d, 23->01
    assert df.loc["REGULAR", "high_line_count"] == 2
    assert df.loc["SLOW", "high_line_count"] == 1
