"""Data-profiling histograms — the distribution snapshots a pipeline
operator takes before committing to thresholds (quality cutoffs,
batch sizing, window widths). Histograms are the canonical mergeable
summary: fixed bin edges make per-batch counts ADDITIVE, so the
exchange carries one (key, bin, n) partial per batch and the result
is bin-cardinality — never value-cardinality.

- value_histogram: per event_type, counts of `value` in fixed-width
  bins (width HIST_W, HIST_B bins, under/overflow clamped into the
  edge bins). The bin index floor(value / HIST_W) is computed with
  the same float64 ops on both engine and oracle, so bit-equality
  holds even for values exactly on an edge.
- doclen_histogram: per language, token-length counts in width-DL_W
  bins — pure int64 arithmetic (dl // DL_W), exact everywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_EVENTS = "events.parquet"
_DOCS = "documents.parquet"

HIST_W = 16.0    # value-bin width
HIST_B = 32      # number of value bins (top bin absorbs overflow)
DL_W = 8         # token-length bin width
DL_B = 32


def value_histogram(sf_dir: str) -> pa.Table:
    """(event_type, bin, lo, hi, n): per-type value histogram."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        b = np.minimum(np.floor(v / HIST_W), HIST_B - 1).astype(np.int64)
        b = np.maximum(b, 0)
        return (pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                              "bin": b})
                .groupby(["event_type", "bin"], as_index=False)
                .agg(n=("bin", "size")))

    ds = ray.data.read_parquet(os.path.join(sf_dir, _EVENTS),
                               columns=["event_type", "value"])
    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby(["event_type", "bin"])
           .aggregate(Sum("n", alias_name="n"))).to_pandas()
    agg = agg.sort_values(["event_type", "bin"], ignore_index=True)
    b = agg["bin"].to_numpy(np.int64)
    return pa.table({
        "event_type": pa.array(agg.event_type.tolist(), pa.string()),
        "bin": pa.array(b, pa.int64()),
        "lo": pa.array(b * HIST_W, pa.float64()),
        "hi": pa.array((b + 1) * HIST_W, pa.float64()),
        "n": pa.array(agg.n.to_numpy(np.int64), pa.int64()),
    })


def doclen_histogram(sf_dir: str) -> pa.Table:
    """(lang, bin, lo_tokens, n_docs): per-language token-length
    histogram in width-DL_W bins — exact int64 binning."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from raysearch.pipelines.textops import _tokens

        dl = pc.list_value_length(_tokens(batch)).to_numpy() \
            .astype(np.int64)
        b = np.minimum(dl // DL_W, DL_B - 1)
        g = (pd.DataFrame({"lang": np.asarray(batch["lang"].to_pylist(),
                                              dtype=object),
                           "bin": b})
             .groupby(["lang", "bin"], as_index=False)
             .agg(n_docs=("bin", "size")))
        return pa.table({"lang": pa.array(g.lang.tolist(), pa.string()),
                         "bin": pa.array(g["bin"].to_numpy(np.int64),
                                         pa.int64()),
                         "n_docs": pa.array(g.n_docs.to_numpy(np.int64),
                                            pa.int64())})

    ds = ray.data.read_parquet(os.path.join(sf_dir, _DOCS),
                               columns=["lang", "text"])
    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["lang", "bin"])
           .aggregate(Sum("n_docs", alias_name="n_docs"))).to_pandas()
    agg = agg.sort_values(["lang", "bin"], ignore_index=True)
    b = agg["bin"].to_numpy(np.int64)
    return pa.table({
        "lang": pa.array(agg.lang.tolist(), pa.string()),
        "bin": pa.array(b, pa.int64()),
        "lo_tokens": pa.array(b * DL_W, pa.int64()),
        "n_docs": pa.array(agg.n_docs.to_numpy(np.int64), pa.int64()),
    })


def sql_value_histogram() -> str:
    return f"""
WITH b AS (
  SELECT event_type,
         greatest(least(floor(value / {HIST_W}), {HIST_B - 1}),
                  0)::BIGINT AS bin
  FROM events
)
SELECT event_type, bin,
       bin * {HIST_W} AS lo, (bin + 1) * {HIST_W} AS hi,
       count(*)::BIGINT AS n
FROM b GROUP BY event_type, bin
"""


def sql_doclen_histogram() -> str:
    return rf"""
WITH b AS (
  SELECT lang,
         least(len(regexp_extract_all(text, '\S+')) // {DL_W},
               {DL_B - 1})::BIGINT AS bin
  FROM documents
)
SELECT lang, bin, bin * {DL_W} AS lo_tokens, count(*)::BIGINT AS n_docs
FROM b GROUP BY lang, bin
"""


QUERIES = {
    "value_histogram": value_histogram,
    "doclen_histogram": doclen_histogram,
}
ORACLE_SQL = {
    "value_histogram": sql_value_histogram(),
    "doclen_histogram": sql_doclen_histogram(),
}
