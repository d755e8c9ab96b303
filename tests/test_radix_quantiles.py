"""event_quantiles' distributed radix rank selection: DuckDB parity
under forced bucket refinement, and the degenerate all-equal-values
corpus that must walk all 64 bits to the direct-value branch (no
bucket ever shrinks below the cap when every value is identical)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import events as E


def _write_events(tmp_path, values, types=None):
    n = len(values)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 1_000_000,
                       pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
        "event_type": pa.array(types or ["a"] * n, pa.string()),
        "value": pa.array(np.asarray(values, dtype=np.float64),
                          pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def _oracle(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return (con.execute(E.sql_event_quantiles()).df()
            .sort_values("event_type", ignore_index=True))


def _engine(sf_dir):
    return (E.event_quantiles(sf_dir).to_pandas()
            .sort_values("event_type", ignore_index=True))


def test_ordered_u64_roundtrip_and_order():
    vals = np.array([-1e300, -2.5, -0.0, 0.0, 1e-300, 2.5, 1e300])
    u = E._ordered_u64(vals)
    assert (np.diff(u.astype(np.float64)) >= 0).all()  # order kept
    for v, ui in zip(vals, u):
        assert E._u64_to_f64(int(ui)) == v or (v == 0.0 and
                                               E._u64_to_f64(int(ui)) == 0.0)


def test_forced_refinement_matches_oracle(ray_session, tmp_path,
                                          monkeypatch):
    rng = np.random.default_rng(7)
    # clustered values so single level-0 buckets exceed a tiny cap
    vals = np.concatenate([rng.normal(100.0, 1e-6, 400),
                           rng.uniform(-50, 50, 200)])
    types = ["a"] * 300 + ["b"] * 300
    sf = _write_events(tmp_path, vals, types)
    monkeypatch.setattr(E, "FETCH_CAP", 5)
    pd.testing.assert_frame_equal(_engine(sf), _oracle(sf),
                                  check_dtype=False)


def test_all_equal_values_direct_branch(ray_session, tmp_path,
                                        monkeypatch):
    sf = _write_events(tmp_path, np.full(50, 3.141592653589793))
    monkeypatch.setattr(E, "FETCH_CAP", 3)
    eng = _engine(sf)
    assert eng.p50.iloc[0] == eng.p95.iloc[0] == E.round6(
        np.float64(3.141592653589793))
    pd.testing.assert_frame_equal(eng, _oracle(sf), check_dtype=False)


def test_negative_and_zero_values(ray_session, tmp_path):
    vals = np.array([-5.0, -1.25, 0.0, 0.0, 2.5, 7.75, -0.5, 3.0])
    sf = _write_events(tmp_path, vals)
    pd.testing.assert_frame_equal(_engine(sf), _oracle(sf),
                                  check_dtype=False)
