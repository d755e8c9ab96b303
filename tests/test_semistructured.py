"""semistructured.props_stats: DuckDB parity on adversarial JSON
payloads the sf fixture lacks — missing field (NULL semantics),
negative values, JSON whitespace variants, other keys around ``k`` —
and the all-missing empty-aggregate shape."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import semistructured as S


def _write_events(tmp_path, types, props):
    n = len(types)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "ts": pa.array(np.arange(n, dtype=np.int64), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, np.int64), pa.int64()),
        "event_type": pa.array(list(types), pa.string()),
        "value": pa.array(np.zeros(n), pa.float64()),
        "props": pa.array(list(props), pa.string()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con.execute(sql).df()


def _parity(sf):
    eng = S.props_stats(sf).to_pandas()
    ora = _oracle(sf, S.sql_props_stats())
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    return eng


def test_props_stats_adversarial(ray_session, tmp_path):
    sf = _write_events(
        tmp_path,
        types=["a", "a", "a", "b", "b", "c"],
        props=['{"k": 5}',
               '{ "k" :  -7 }',                 # JSON whitespace, negative
               '{"other": 1}',                  # k missing -> excluded
               '{"x": 2, "k": 0}',              # k not first
               '{"k": 123456789012}',           # > 2^31
               '{}'])                           # type c fully excluded
    eng = _parity(sf).set_index("event_type")
    assert eng.loc["a", "n_with_k"] == 2
    assert eng.loc["a", "sum_k"] == -2
    assert eng.loc["a", "min_k"] == -7
    assert eng.loc["b", "max_k"] == 123456789012
    assert "c" not in eng.index


def test_props_stats_all_missing(ray_session, tmp_path):
    sf = _write_events(tmp_path, types=["a", "b"],
                       props=['{}', '{"z": 1}'])
    eng = _parity(sf)
    assert len(eng) == 0
