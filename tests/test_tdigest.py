"""Mergeable quantile sketch (event_quantiles_tdigest): error bounds
vs the exact operator, and sketch-primitive properties."""

import numpy as np
import pandas as pd

from raysearch.pipelines import events as E

SF = "/root/testdata/sf0.01"


def test_sketch_primitives_exactness_small():
    # fewer values than K: the sketch IS the sorted data, quantiles
    # interpolate between singleton centroids
    vals = np.array([3.0, 1.0, 2.0, 5.0, 4.0])
    m, w = E._sketch_values(vals)
    assert np.allclose(m, [1, 2, 3, 4, 5]) and np.allclose(w, 1)
    q = E._sketch_quantiles(m, w, [0.5])
    assert np.isclose(q[0], 3.0)


def test_sketch_merge_bounded_and_mass_preserving():
    rng = np.random.default_rng(0)
    parts = [E._sketch_values(rng.lognormal(size=5000)) for _ in range(20)]
    m, w = E._merge_sketches(np.concatenate([p[0] for p in parts]),
                             np.concatenate([p[1] for p in parts]))
    assert len(m) <= E.TDIGEST_K
    assert np.isclose(w.sum(), 20 * 5000)
    assert (np.diff(m) >= 0).all()  # centroids stay ordered


def test_tdigest_matches_exact_within_rank_error(ray_session):
    exact = E.event_quantiles(SF).to_pandas().set_index("event_type")
    approx = E.event_quantiles_tdigest(SF).to_pandas().set_index(
        "event_type")
    assert sorted(approx.index) == sorted(exact.index)
    assert (approx["n"] == exact["n"]).all()
    # rank error ~1/(2K): translate to value error via the per-type
    # exact quantile neighborhood (compare against quantiles +-1% rank)
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/events.parquet",
                        columns=["event_type", "value"]).to_pandas()
    for etype, g in tbl.groupby("event_type"):
        vals = g["value"].to_numpy(np.float64)
        for col, q in (("p50", 0.5), ("p95", 0.95)):
            lo, hi = np.quantile(vals, [max(q - 0.01, 0),
                                        min(q + 0.01, 1)])
            got = approx.loc[etype, col]
            assert lo - 1e-9 <= got <= hi + 1e-9, (etype, col, got,
                                                   lo, hi)


def _write_events(tmp_path, rows):
    """rows: (event_type, value)"""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.zeros(n, np.int64), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([float(r[1]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_winsor_stats_adversarial(ray_session, tmp_path):
    """Winsorization vs oracle: planted extreme outliers clip, an
    all-equal type has lo == hi (everything in range), a two-value
    type exercises the interpolated thresholds."""
    import duckdb

    rows = ([("a", v) for v in range(1, 100)] + [("a", 100000.0)]
            + [("b", 7.25)] * 5
            + [("c", 1.0), ("c", 3.0)])
    sf = _write_events(tmp_path, rows)
    eng = E.winsor_stats(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    ora = con.execute(E.sql_winsor_stats()).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=True)
    byt = eng.set_index("event_type")
    assert byt.loc["a", "n_clip_hi"] >= 1      # the 100000 outlier
    assert byt.loc["a", "winsor_mean"] < 1000  # outlier neutralized
    assert byt.loc["b", "n_clip_lo"] == 0
    assert byt.loc["b", "n_clip_hi"] == 0
    assert byt.loc["b", "winsor_mean"] == 7.25
    assert byt.loc["b", "lo"] == byt.loc["b", "hi"] == 7.25
