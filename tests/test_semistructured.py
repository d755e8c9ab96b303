"""semistructured.props_stats: DuckDB parity on adversarial JSON
payloads the sf fixture lacks — missing field (NULL semantics),
negative values, JSON whitespace variants, nested objects, float
values, invalid JSON (the regex contract is the SAME on both sides),
matched/unmatched rows interleaved so blocks mix them (the struct-
validity crash path) — plus the json.loads agreement pin on the
schema's flat payloads and the all-missing empty aggregate."""

import json
import os
import re

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
    # interleave matched and unmatched rows (x40) so ANY block split
    # mixes them — the struct child array does not inherit validity,
    # and an unfiltered cast of the '' placeholders crashes
    base_types = ["a", "a", "a", "b", "b", "c"]
    base_props = ['{"k": 5}',
                  '{ "k" :  -7 }',               # JSON whitespace, negative
                  '{"other": 1}',                # k missing -> excluded
                  '{"x": 2, "k": 0}',            # k not first
                  '{"k": 123456789012}',         # > 2^31
                  '{}']                          # type c fully excluded
    types = base_types * 40
    props = base_props * 40
    sf = _write_events(tmp_path, types, props)
    eng = _parity(sf).set_index("event_type")
    assert eng.loc["a", "n_with_k"] == 80
    assert eng.loc["a", "sum_k"] == -2 * 40
    assert eng.loc["a", "min_k"] == -7
    assert eng.loc["b", "max_k"] == 123456789012
    assert "c" not in eng.index


def test_props_stats_regex_contract_edges(ray_session, tmp_path):
    # nested objects, float values, and invalid JSON: the CONTRACT is
    # the shared RE2 pattern (first '"k": <int>' anywhere), applied
    # identically by engine and oracle
    sf = _write_events(
        tmp_path,
        types=["n", "f", "g", "h"],
        props=['{"outer": {"k": 7}}',     # nested: regex matches 7
               '{"k": 1.5}',              # float: integer prefix 1
               'garbage "k": 3 tail',     # invalid JSON: still matches
               '{"kk": 9}'])              # key mismatch: no match
    eng = _parity(sf).set_index("event_type")
    assert eng.loc["n", "sum_k"] == 7
    assert eng.loc["f", "sum_k"] == 1
    assert eng.loc["g", "sum_k"] == 3
    assert "h" not in eng.index


def test_props_regex_agrees_with_json_on_flat_payloads():
    # the schema's actual payload shape: flat single-level objects
    # with an integer k — the regex must agree with a real parser
    pat = re.compile(S._K_PATTERN)
    for payload in ['{"k": 69}', '{ "k" : -3 }', '{"a": 1, "k": 0}',
                    '{"x": "y"}', '{}', '{"k": 123456789012}']:
        parsed = json.loads(payload)
        m = pat.search(payload)
        if isinstance(parsed.get("k"), int):
            assert m is not None and int(m.group("k")) == parsed["k"]
        else:
            assert m is None


def test_props_stats_all_missing(ray_session, tmp_path):
    sf = _write_events(tmp_path, types=["a", "b"],
                       props=['{}', '{"z": 1}'])
    eng = _parity(sf)
    assert len(eng) == 0
