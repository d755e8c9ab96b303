"""round6 must match DuckDB round(x, 6) exactly — the engine/oracle
rounding contract (round-1's red cell was a single half-ulp value)."""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from raysearch.numutil import round6


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _db_round(con, x: float) -> float:
    return con.execute("SELECT round(?::DOUBLE, 6)", [x]).fetchone()[0]


def test_known_half_ulp(con):
    # the exact value that broke round 1: 105/128
    assert round6(0.8203125) == 0.820313 == _db_round(con, 0.8203125)
    assert round6(-0.8203125) == -0.820313 == _db_round(con, -0.8203125)


def test_exact_half_grid(con):
    # every representable multiple of 0.5e-6 in [0, 1): ties away
    for k in range(0, 2_000_001, 9973):  # sampled stride over the grid
        x = (2 * k + 1) / 2e6  # exactly representable? not always, but
        # the comparison is vs DuckDB on the SAME double, so any
        # representation error cancels
        assert round6(x) == _db_round(con, x), x


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6,
                 allow_nan=False, allow_infinity=False))
def test_round6_matches_duckdb(x):
    con = duckdb.connect()
    assert round6(x) == con.execute(
        "SELECT round(?::DOUBLE, 6)", [x]).fetchone()[0]


def test_array_and_scalar_agree():
    xs = np.array([0.8203125, -0.8203125, 0.0, 1.9999995, -1.9999995])
    arr = round6(xs)
    assert arr.tolist() == [round6(float(v)) for v in xs]
    # -0.0 is normalised to +0.0 (hash-compare safety)
    assert str(round6(-1e-9)) == "0.0"
