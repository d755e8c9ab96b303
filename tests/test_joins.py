"""joins.py operators: DuckDB parity on adversarial synthetic inputs
the sf fixtures lack (same-timestamp ties, users with no as-of match,
single-event users) plus bucket-count invariance — the coarse user
bucket must never change results, only group sizes."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.pipelines import joins


def _write_events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts_us", "user_id",
                                     "event_type"])
    tbl = pa.table({
        "event_id": pa.array(df.event_id.to_numpy(np.int64), pa.int64()),
        "ts": pa.array(df.ts_us.to_numpy(np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array(df.user_id.to_numpy(np.int64), pa.int64()),
        "event_type": pa.array(df.event_type.tolist(), pa.string()),
        "value": pa.array(np.zeros(len(df)), pa.float64()),
        "props": pa.array([""] * len(df), pa.string()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con.execute(sql).df()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


US = 1_000_000
H = 3_600_000_000

# Adversarial fixture: user 1 has a purchase and a click at the SAME
# timestamp in both event-id orders; user 2 has clicks but never a
# purchase (sentinel path); user 3 has only purchases (no left rows);
# user 7 exercises the exact RANGE_US boundary (gap == 1h included,
# 1h + 1us excluded).
ROWS = [
    (1, 10 * US, 1, "purchase"),
    (2, 10 * US, 1, "click"),      # same ts, purchase has SMALLER eid
    (3, 20 * US, 1, "click"),
    (4, 30 * US, 1, "purchase"),
    (5, 30 * US, 1, "click"),
    (6, 30 * US + 1, 1, "click"),
    (7, 5 * US, 2, "click"),       # user 2: no purchase ever
    (8, 50 * US, 2, "click"),
    (9, 40 * US, 3, "purchase"),   # user 3: no clicks
    (10, 0, 7, "click"),
    (11, H, 7, "click"),           # exactly 1h after eid 10
    (12, H + 1, 7, "click"),       # 1h + 1us after eid 10
    (13, 0, 9, "view"),            # filtered out of asof entirely
]


def test_asof_join_adversarial(ray_session, tmp_path):
    sf = _write_events(tmp_path, ROWS)
    eng = _norm(joins.asof_join(sf).to_pandas())
    ora = _norm(_oracle(sf, joins.sql_asof_join()))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # spot-check semantics: click eid=2 at the same ts as purchase
    # eid=1 (smaller eid) DOES see it as prior; eid=5 at the same ts
    # as purchase eid=4 does too; user 2 gets the -1 sentinel
    by_id = eng.set_index("event_id")
    assert by_id.loc[2, "prior_event_id"] == 1
    assert by_id.loc[2, "gap_us"] == 0
    assert by_id.loc[5, "prior_event_id"] == 4
    assert by_id.loc[7, "prior_event_id"] == -1
    assert by_id.loc[7, "gap_us"] == -1
    assert 9 not in by_id.index and 13 not in by_id.index


def test_range_join_boundary(ray_session, tmp_path):
    sf = _write_events(tmp_path, ROWS)
    eng = _norm(joins.range_join_events(sf).to_pandas())
    ora = _norm(_oracle(sf, joins.sql_range_join_events()))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    pairs = set(zip(eng.ev_a, eng.ev_b))
    assert (10, 11) in pairs       # gap == RANGE_US inclusive
    assert (10, 12) not in pairs   # RANGE_US + 1us excluded
    assert (1, 2) in pairs         # same-ts pair, eid order
    assert (7, 8) in pairs and (2, 7) not in pairs  # never cross-user


def test_joins_bucket_invariance(ray_session, tmp_path, monkeypatch):
    """auto_buckets cardinality must not change any result."""
    sf = _write_events(tmp_path, ROWS)
    results = {}
    for nb in (1, 8):
        monkeypatch.setattr("raysearch.hashing.auto_buckets",
                            lambda *a, nb=nb, **k: nb)
        results[nb] = (_norm(joins.asof_join(sf).to_pandas()),
                       _norm(joins.range_join_events(sf).to_pandas()))
    pd.testing.assert_frame_equal(results[1][0], results[8][0])
    pd.testing.assert_frame_equal(results[1][1], results[8][1])


def test_sample_split_fractions(ray_session):
    """The hash split is deterministic and roughly 75/12.5/12.5."""
    sf = "/root/testdata/sf0.1"
    df = joins.sample_split(sf).to_pandas().set_index("split")
    n = df.n_docs.sum()
    assert n == pq.read_metadata(
        os.path.join(sf, "documents.parquet")).num_rows
    assert df.n_docs.idxmax() == "train"
    assert abs(df.loc["train", "n_docs"] / n - 0.75) < 0.05
    # deterministic across runs
    again = joins.sample_split(sf).to_pandas().set_index("split")
    pd.testing.assert_frame_equal(df.sort_index(), again.sort_index())


def test_revenue_join_matches_oracle_sf001(ray_session):
    sf = "/root/testdata/sf0.001"
    eng = _norm(joins.revenue_by_nation(sf).to_pandas())
    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    ora = _norm(con.execute(joins.sql_revenue_by_nation()).df())
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_revenue_join_strategies_agree(ray_session, monkeypatch):
    """Broadcast and shuffle hash-join paths must produce identical
    results; the cap only selects the execution strategy."""
    sf = "/root/testdata/sf0.001"
    broadcast = _norm(joins.revenue_by_nation(sf).to_pandas())
    monkeypatch.setattr(joins, "JOIN_BROADCAST_CAP", 0)  # force shuffle
    shuffle = _norm(joins.revenue_by_nation(sf).to_pandas())
    pd.testing.assert_frame_equal(broadcast, shuffle)


def _write_q3_tables(tmp_path):
    """Adversarial Q3 fixture: revenue tie at the k-boundary is not
    exercised (k=10 > rows), but every filter edge is: an order with
    no post-cutoff lineitem, a non-BUILDING customer, an order after
    the cutoff, a lineitem shipped exactly AT the cutoff (excluded by
    the strict >), and two orders with IDENTICAL revenue (tie broken
    by orderdate then orderkey)."""
    cut = joins.Q3_CUTOFF
    before = np.datetime64(cut) - np.timedelta64(10, "D")
    after = np.datetime64(cut) + np.timedelta64(10, "D")
    at = np.datetime64(cut)
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
        "c_nationkey": pa.array([0, 0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0, 0.0]),
        "c_mktsegment": pa.array(["BUILDING", "BUILDING", "MACHINERY"]),
    })
    orders = pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3, 1, 2], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 6),
        "o_totalprice": pa.array([0.0] * 6),
        # 13: non-segment customer; 14: placed AFTER cutoff; others ok
        "o_orderdate": pa.array([before, before, before, before,
                                 after, before], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 6),
    })
    li_rows = [
        (10, 100.00, 0.10, after),   # c4 = 10000 * 90
        (10, 50.00, 0.00, after),    # + 5000 * 100
        (11, 14.00, 0.00, after),    # 11 and 12 tie: 1400*100 each
        (12, 14.00, 0.00, after),
        (12, 99.99, 0.05, at),       # shipped AT cutoff: excluded
        (13, 70.00, 0.00, after),    # non-segment customer
        (14, 70.00, 0.00, after),    # order after cutoff
        (15, 80.00, 0.00, before),   # only pre-cutoff shipments: 15 out
    ]
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_partkey": pa.array([0] * len(li_rows), pa.int64()),
        "l_suppkey": pa.array([0] * len(li_rows), pa.int64()),
        "l_linenumber": pa.array(range(len(li_rows)), pa.int32()),
        "l_quantity": pa.array([1.0] * len(li_rows)),
        "l_extendedprice": pa.array([r[1] for r in li_rows]),
        "l_discount": pa.array([r[2] for r in li_rows]),
        "l_tax": pa.array([0.0] * len(li_rows)),
        "l_returnflag": pa.array(["N"] * len(li_rows)),
        "l_linestatus": pa.array(["O"] * len(li_rows)),
        "l_shipdate": pa.array([r[3] for r in li_rows],
                               pa.timestamp("us")),
    })
    for name, tbl in (("customer", cust), ("orders", orders),
                      ("lineitem", li)):
        pq.write_table(tbl, os.path.join(tmp_path, f"{name}.parquet"))
    return str(tmp_path)


def test_top_unshipped_orders_adversarial(ray_session, tmp_path):
    sf = _write_q3_tables(tmp_path)
    eng = joins.top_unshipped_orders(sf).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    ora = con.execute(joins.sql_top_unshipped_orders()).df()
    pd.testing.assert_frame_equal(
        _norm(eng), _norm(ora), check_dtype=False)
    # only orders 10, 11, 12 qualify; 10 leads, the 11/12 revenue tie
    # breaks by orderkey (same orderdate)
    assert eng.o_orderkey.tolist() == [10, 11, 12]
    assert eng.revenue_c4.iloc[1] == eng.revenue_c4.iloc[2] == 140_000
    assert eng.revenue_c4.iloc[0] == 10_000 * 90 + 5_000 * 100


def test_top_unshipped_orders_sf001(ray_session):
    sf = "/root/testdata/sf0.001"
    eng = _norm(joins.top_unshipped_orders(sf).to_pandas())
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    ora = _norm(con.execute(joins.sql_top_unshipped_orders()).df())
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_session_funnel_adversarial(ray_session, tmp_path):
    """Funnel edges: purchase BEFORE any click in the session (not
    converted), purchase at the exact first-click timestamp
    (converted), purchase in a LATER session after a gap (that session
    alone converts or not), clickless session with purchases."""
    from raysearch.pipelines import events as E

    G = E.SESSION_GAP_US
    rows = [
        # user 1, session A: purchase(t=10) then click(t=20) -> NOT
        # converted; session B after the gap: click(t) then purchase
        (1, 10, 1, "purchase"),
        (2, 20, 1, "click"),
        (3, 20 + G + 1, 1, "click"),
        (4, 20 + G + 2, 1, "purchase"),       # converted
        # user 2: purchase at EXACTLY the first click's ts -> converted
        (5, 100, 2, "click"),
        (6, 100, 2, "purchase"),
        # user 3: purchases only, no click -> not converted
        (7, 50, 3, "purchase"),
        # user 4: clicks only
        (8, 60, 4, "click"),
        (9, 70, 4, "view"),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    eng = E.session_funnel(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    ora = con.execute(E.sql_session_funnel()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    by = eng.set_index(["user_id", "session_start_us"])
    assert by.loc[(1, 10), "converted"] == 0     # purchase precedes click
    assert by.loc[(1, 20 + G + 1), "converted"] == 1
    assert by.loc[(2, 100), "converted"] == 1    # same-ts purchase counts
    assert by.loc[(3, 50), "converted"] == 0     # no click
    assert by.loc[(4, 60), "converted"] == 0


def _write_q4_tables(tmp_path):
    """Adversarial Q4 fixture: a lineitem shipped EXACTLY 60 days
    after the order (strict > excludes it), one at 60 days + 1 us
    (included), an order with no lineitems at all, an order outside
    the 1996 window with a very late line, and an in-window order
    whose lines are all early."""
    d1 = np.datetime64(joins.Q4_D1)
    inside = d1 + np.timedelta64(30, "D")
    outside = d1 - np.timedelta64(300, "D")
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([0] * 5, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        "o_totalprice": pa.array([0.0] * 5),
        # 4 is outside the date window
        "o_orderdate": pa.array([inside, inside, inside, outside,
                                 inside], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "2-HIGH",
                                     "1-URGENT", "5-LOW"]),
    })
    at60 = inside + np.timedelta64(60, "D")
    li_rows = [
        (1, at60),                                   # exactly 60 d: out
        (2, np.datetime64(at60 + np.timedelta64(1, "us"), "us")),  # in
        (2, inside),                                 # early line too
        (4, at60 + np.timedelta64(100, "D")),        # late but order out
        (5, inside),                                 # all-early order
    ]   # order 3 has NO lineitems
    li = pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_partkey": pa.array([0] * len(li_rows), pa.int64()),
        "l_suppkey": pa.array([0] * len(li_rows), pa.int64()),
        "l_linenumber": pa.array(range(len(li_rows)), pa.int32()),
        "l_quantity": pa.array([1.0] * len(li_rows)),
        "l_extendedprice": pa.array([1.0] * len(li_rows)),
        "l_discount": pa.array([0.0] * len(li_rows)),
        "l_tax": pa.array([0.0] * len(li_rows)),
        "l_returnflag": pa.array(["N"] * len(li_rows)),
        "l_linestatus": pa.array(["O"] * len(li_rows)),
        "l_shipdate": pa.array(
            [np.datetime64(r[1], "us") for r in li_rows],
            pa.timestamp("us")),
    })
    for name, tbl in (("orders", orders), ("lineitem", li)):
        pq.write_table(tbl, os.path.join(tmp_path, f"{name}.parquet"))
    return str(tmp_path)


def test_order_priority_counts_adversarial(ray_session, tmp_path):
    sf = _write_q4_tables(tmp_path)
    got = joins.order_priority_counts(sf).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(joins.sql_order_priority_counts()).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)
    # only order 2 qualifies: exactly-60d excluded, no-lineitem order
    # excluded, out-of-window order excluded, all-early excluded
    assert got.o_orderpriority.tolist() == ["2-HIGH"]
    assert got.n_orders.tolist() == [1]


def test_order_priority_strategies_agree(ray_session, tmp_path,
                                         monkeypatch):
    """The broadcast/shuffle strategy choice must never change the
    Q4 result (same contract as revenue_by_nation's auto-strategy)."""
    sf = _write_q4_tables(tmp_path)
    base = joins.order_priority_counts(sf).to_pandas()
    monkeypatch.setattr(joins, "JOIN_BROADCAST_CAP", 0)
    shuf = joins.order_priority_counts(sf).to_pandas()
    pd.testing.assert_frame_equal(_norm(base), _norm(shuf))
    assert base.o_orderpriority.tolist() == ["2-HIGH"]
