"""Skew robustness: the scale claims under pathological inputs.

- A term appearing in EVERY document cannot blow up any reduce group
  (doc-hash partitioning bounds a term's contribution per group at
  docs_per_part) and must surface in the manifests' skew metrics.
- One user owning ~30% of all events still sessionizes (coarse
  user-hash groups are bounded by the partition, not the user).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.build import build_index
from raysearch.checkpoint import load_manifest
from raysearch.config import IndexConfig
from raysearch.segments import part_dirname
from raysearch.stats import load_stats


def test_hot_term_bounded_partitions(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n = 3000
    # 'hot' appears in EVERY doc (and twice, so it tops cf); filler
    # words come from a 10k vocabulary, so nothing else is global
    vocab = np.array([f"w{i}" for i in range(10_000)], dtype=object)
    texts = ["hot hot " + " ".join(rng.choice(vocab, size=20))
             for _ in range(n)]
    corpus = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["text"] * n, pa.string()),
        "content": pa.array(texts, pa.string()),
    })
    import ray.data

    idx = str(tmp_path / "idx")
    res = build_index(ray.data.from_arrow(corpus), idx,
                      IndexConfig(num_parts=8), input_id="skew")
    st = load_stats(idx)
    detail = {d["part"]: d for d in st["parts_detail"]}
    masses = sorted(d["n_postings"] for d in detail.values())
    # doc-hash partitioning: hot term spreads evenly; max/median mass
    # stays close to 1 even though 'hot' has df == n_docs
    assert masses[-1] / masses[len(masses) // 2] < 1.5
    # the hot term is OBSERVABLE: every manifest's skew metrics lead
    # with it
    for p in st["parts"]:
        m = load_manifest(part_dirname(idx, p))
        top = m["skew"]["top_terms"][0]
        assert top["term"] == "hot"
        assert top["df"] == detail[p]["n_docs"]


def test_hot_user_sessionizes(ray_session, tmp_path):
    from raysearch.pipelines.events import user_sessions

    rng = np.random.default_rng(6)
    n = 20_000
    # user 7 owns 30% of events; the rest spread over 200 users
    users = np.where(rng.random(n) < 0.3, 7,
                     rng.integers(0, 200, size=n)).astype(np.int64)
    base = np.datetime64("2025-06-01T00:00:00", "us")
    ts = base + (np.sort(rng.integers(0, 86_400_000_000, size=n))
                 .astype("timedelta64[us]"))
    d = str(tmp_path)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(users, pa.int64()),
    }), f"{d}/events.parquet")

    out = user_sessions(d).to_pandas()
    assert out.n_events.sum() == n
    hot = out[out.user_id == 7]
    assert hot.n_events.sum() == int((users == 7).sum())
    # sessions are disjoint and ordered per user
    for _, g in out.groupby("user_id"):
        g = g.sort_values("session_start_us")
        ends = g.session_start_us + g.duration_us
        assert (g.session_start_us.to_numpy()[1:]
                > ends.to_numpy()[:-1]).all()
