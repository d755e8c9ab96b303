"""Hypothesis property tests for the join kernels (pure pandas/numpy,
no Ray session): the vectorized group kernels must match a brute-force
O(n^2) reference on arbitrary inputs — duplicate timestamps, dense
collisions, single-event users, interleaved event ids."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from raysearch.pipelines import joins

US = 1_000_000


@st.composite
def event_frames(draw, types=("click", "purchase")):
    n = draw(st.integers(min_value=1, max_value=60))
    uids = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    # small ts range forces many within-RANGE pairs and exact ties
    tss = draw(st.lists(st.integers(0, 3 * joins.RANGE_US // US),
                        min_size=n, max_size=n))
    typs = draw(st.lists(st.sampled_from(types), min_size=n,
                         max_size=n))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(np.array(tss, dtype=np.int64) * US,
                             unit="us"),
        "user_id": np.array(uids, dtype=np.int64),
        "event_type": typs,
    })


def _brute_asof(df: pd.DataFrame) -> set:
    """(event_id, prior_event_id) per click via O(n^2) scan."""
    rows = df.assign(tus=df.ts.astype("datetime64[us]").astype("int64"))
    out = set()
    for _, r in rows[rows.event_type == joins.ASOF_LEFT].iterrows():
        cands = rows[(rows.user_id == r.user_id)
                     & (rows.event_type == joins.ASOF_RIGHT)
                     & ((rows.tus < r.tus)
                        | ((rows.tus == r.tus)
                           & (rows.event_id < r.event_id)))]
        if len(cands):
            best = cands.sort_values(["tus", "event_id"]).iloc[-1]
            out.add((int(r.event_id), int(best.event_id)))
        else:
            out.add((int(r.event_id), -1))
    return out


def _brute_range(df: pd.DataFrame) -> set:
    rows = df.assign(tus=df.ts.astype("datetime64[us]").astype("int64"))
    out = set()
    for _, a in rows.iterrows():
        for _, b in rows.iterrows():
            if (a.user_id == b.user_id
                    and (b.tus > a.tus
                         or (b.tus == a.tus and b.event_id > a.event_id))
                    and b.tus - a.tus <= joins.RANGE_US):
                out.add((int(a.event_id), int(b.event_id)))
    return out


@settings(max_examples=60, deadline=None)
@given(event_frames())
def test_asof_kernel_matches_bruteforce(df):
    kern = joins._asof_kern(df)
    got = set(zip(kern.event_id.astype(int),
                  kern.prior_event_id.astype(int)))
    assert got == _brute_asof(df)


@settings(max_examples=60, deadline=None)
@given(event_frames(types=("click",)))
def test_range_kernel_matches_bruteforce(df):
    kern = joins._range_kern(df[["event_id", "ts", "user_id"]])
    got = set(zip(kern.ev_a.astype(int), kern.ev_b.astype(int)))
    assert got == _brute_range(df)


@settings(max_examples=30, deadline=None)
@given(event_frames(types=("click",)))
def test_range_kernel_gaps_are_consistent(df):
    kern = joins._range_kern(df[["event_id", "ts", "user_id"]])
    tus = dict(zip(df.event_id.astype(int),
                   df.ts.astype("datetime64[us]").astype("int64")))
    for a, b, gap in zip(kern.ev_a.astype(int), kern.ev_b.astype(int),
                         kern.gap_us.astype(int)):
        assert gap == tus[b] - tus[a]
        assert 0 <= gap <= joins.RANGE_US
