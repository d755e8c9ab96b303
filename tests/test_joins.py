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
