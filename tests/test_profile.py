"""Histogram profiling ops: oracle parity on edge values (exact bin
boundary, negative underflow, overflow clamp)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_value_histogram_edges(ray_session, tmp_path):
    from raysearch.pipelines.profile import (HIST_B, HIST_W,
                                             sql_value_histogram,
                                             value_histogram)

    vals = [0.0, HIST_W, HIST_W - 1e-9,      # exact edge + just under
            -5.0,                            # underflow -> bin 0
            HIST_W * HIST_B * 10,            # overflow -> top bin
            HIST_W * (HIST_B - 1)]           # exact top-bin edge
    tbl = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([0] * len(vals), pa.timestamp("us")),
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "event_type": pa.array(["click"] * len(vals)),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * len(vals)),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    eng = value_histogram(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    ora = con.execute(sql_value_histogram()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    by_bin = eng.set_index("bin").n
    assert by_bin.loc[0] == 3          # 0.0, just-under-edge, clamped -5.0
    assert by_bin.loc[1] == 1          # value == HIST_W lands in bin 1
    assert by_bin.loc[HIST_B - 1] == 2  # overflow + exact top edge
    assert eng.n.sum() == len(vals)


def test_doclen_histogram_parity_sf001(ray_session):
    from raysearch.pipelines.profile import (doclen_histogram,
                                             sql_doclen_histogram)

    d = "/root/testdata/sf0.001"
    eng = doclen_histogram(d).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.execute(sql_doclen_histogram()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    assert eng.n_docs.sum() == 500


def test_event_anomalies_adversarial(ray_session, tmp_path):
    """Planted outlier flagged; constant-value and single-event types
    emit z = 0; exact parity (integer moments make the std
    order-independent)."""
    from raysearch.pipelines.profile import (event_anomalies,
                                             sql_event_anomalies)

    rows = []
    # type A: 40 values at ~10.00 plus one wild outlier
    for i in range(40):
        rows.append((i, "a", 10.0 + (i % 5) * 0.01))
    rows.append((40, "a", 500.0))
    # type B: constant values -> zero variance -> z = 0
    rows += [(41, "b", 7.77), (42, "b", 7.77), (43, "b", 7.77)]
    # type C: single event -> z = 0
    rows.append((44, "c", 123.45))
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": pa.array([""] * len(rows)),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    eng = event_anomalies(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    ora = con.execute(sql_event_anomalies()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    by = eng.set_index("event_id")
    assert by.loc[40, "is_anomaly"] == 1
    assert by.loc[[41, 42, 43], "z"].eq(0.0).all()
    assert by.loc[44, "z"] == 0.0 and by.loc[44, "is_anomaly"] == 0
    assert by.loc[range(40), "is_anomaly"].eq(0).all()


def test_doclen_ntile_adversarial(ray_session, tmp_path):
    """Global ntile vs oracle where the edges bite: n not divisible by
    k (first n%k tiles bigger), a hot duplicated length straddling a
    tile boundary (doc_id breaks the tie), n < k (one row per tile)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raysearch.pipelines import profile as P

    def write(dirname, texts):
        d = tmp_path / dirname
        d.mkdir()
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        pq.write_table(tbl, str(d / "documents.parquet"))
        return str(d)

    def check(sf):
        got = P.doclen_ntile(sf).to_pandas()
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        want = con.execute(P.sql_doclen_ntile()).df()
        pd.testing.assert_frame_equal(
            got.sort_values("doc_id", ignore_index=True),
            want.sort_values("doc_id", ignore_index=True),
            check_dtype=False)
        return got

    # 23 docs, heavy tie mass on length 2 (straddles tile edges)
    texts = ["w"] * 5 + ["a b"] * 12 + ["a b c"] * 3 + ["a b c d"] * 3
    got = check(write("ties", texts))
    assert got.tile.value_counts().max() == 3   # 23 = 3x(2+1)+7x... DuckDB split
    # n < k: one row per tile, tiles 1..n
    got2 = check(write("tiny", ["x", "x y", "x y z"]))
    assert sorted(got2.tile) == [1, 2, 3]
