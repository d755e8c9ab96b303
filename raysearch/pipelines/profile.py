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

from raysearch.numutil import fmt_doc, round6

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


# ---- per-type z-score anomaly flags (exact-integer moments) ----

Z_THRESHOLD = 3.0


@fmt_doc(t=Z_THRESHOLD)
def event_anomalies(sf_dir: str) -> pa.Table:
    """Per-event z-score against its type's global mean/std, flagging
    |z| > {t} — the classic streaming anomaly screen, two passes:

    1. MOMENTS: per-batch (type, n, sum, sumsq) partials in EXACT
       int64 cents (the value column is 2-decimal, so both moments
       are integers and the groupby sum is order-independent — float
       moment accumulation would drift with summation order and
       could flip a flag at the threshold).
    2. FLAG: the type-cardinality moment table broadcasts via
       ray.put; each batch computes z vectorized from the SAME
       integer-derived float64s the oracle uses.

    Types with fewer than 2 events or zero variance emit z = 0.
    """
    import ray
    from ray.data.aggregate import Sum

    from raysearch.pipelines.joins import _cents

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["value"].to_numpy(np.float64))
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": np.int64(1), "s": c, "ss": c * c})
        return g.groupby("event_type", as_index=False).sum()

    mom = (_read_events_cols(sf_dir, ["event_type", "value"])
           .map_batches(moments, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("s", alias_name="s"),
                      Sum("ss", alias_name="ss"))).to_pandas()
    mom = mom.sort_values("event_type", ignore_index=True)
    types = mom["event_type"].to_numpy(object)
    n = mom["n"].to_numpy(np.int64)
    s = mom["s"].to_numpy(np.int64)
    ss = mom["ss"].to_numpy(np.int64)
    mom_ref = ray.put((types, n, s, ss))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        ts, nn, sv, ssv = ray.get(mom_ref)
        idx = np.searchsorted(ts, df["event_type"].to_numpy(object))
        c = _cents(df["value"].to_numpy(np.float64)).astype(np.float64)
        ni = nn[idx].astype(np.float64)
        mean = sv[idx] / ni
        var = (ssv[idx] - sv[idx].astype(np.float64) ** 2 / ni) / ni
        std = np.sqrt(np.maximum(var, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where((nn[idx] >= 2) & (std > 0),
                         (c - mean) / std, 0.0)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "z": round6(z),
            "is_anomaly": (np.abs(z) > Z_THRESHOLD).astype(np.int64),
        })

    out = (_read_events_cols(sf_dir, ["event_id", "event_type", "value"])
           .map_batches(flag, batch_format="pandas")).to_pandas()
    out = out.sort_values("event_id", ignore_index=True)
    return pa.table({
        "event_id": pa.array(out.event_id.to_numpy(np.int64),
                             pa.int64()),
        "z": pa.array(out.z.to_numpy(np.float64), pa.float64()),
        "is_anomaly": pa.array(out.is_anomaly.to_numpy(np.int64),
                               pa.int64()),
    })


def _read_events_cols(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, _EVENTS),
                                 columns=columns)


def sql_event_anomalies() -> str:
    return f"""
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(cents)::BIGINT AS s,
         sum(cents * cents)::BIGINT AS ss
  FROM c GROUP BY event_type
),
z AS (
  SELECT c.event_id,
         CASE WHEN m.n >= 2
                   AND (m.ss - m.s::DOUBLE * m.s / m.n) / m.n > 0
              THEN (c.cents - m.s / (m.n::DOUBLE))
                   / sqrt((m.ss - m.s::DOUBLE * m.s / m.n)
                          / m.n)
              ELSE 0.0 END AS zv
  FROM c JOIN m USING (event_type)
)
SELECT event_id, round(zv, 6) AS z,
       (abs(zv) > {Z_THRESHOLD})::BIGINT AS is_anomaly
FROM z
"""


NTILE_K = 10


@fmt_doc(K=NTILE_K)
def doclen_ntile(sf_dir: str) -> pa.Table:
    """Exact global NTILE({K}) by token length — per doc, its decile
    under the (dl, doc_id) total order, matching SQL ntile semantics
    (first n%k tiles get the extra row). The distributed GLOBAL RANK:

    1. ONE corpus pass emits narrow (doc_id, dl, dl-hash bucket) rows
       (text never read again; the table is 24 B/doc, materialized).
    2. A groupby(dl) count gives the distinct-length histogram —
       length-cardinality-sized, never doc-sized; the driver
       exclusive-cumsums it in dl order into a BASE RANK per distinct
       length and broadcasts (sorted dls, bases) via ray.put.
    3. One groupby on the dl-hash bucket co-locates every row of each
       length; the kernel lexsorts by (dl, doc_id) and adds each
       row's position within its length segment to the broadcast base
       — global rank with NO global sort. A pathologically hot single
       length bounds one group (same caveat class as the user-bucket
       ops).

    Tile from 1-based rank r with n%k big tiles of size n//k + 1:
    r <= big*size_big -> (r-1)//size_big + 1, else
    big + (r - big*size_big - 1)//(n//k) + 1."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from raysearch.hashing import auto_buckets, parquet_rows, splitmix64
    from raysearch.pipelines.textops import _tokens

    path = os.path.join(sf_dir, _DOCS)
    n_rows = parquet_rows(path)
    empty = pa.table({c: pa.array([], pa.int64()) for c in
                      ("doc_id", "dl", "tile")})
    if n_rows == 0:
        return empty
    nb = auto_buckets(n_rows)

    def narrow(batch: pa.Table) -> pa.Table:
        dl = pc.list_value_length(_tokens(batch)).to_numpy().astype(
            np.int64)
        dlb = (splitmix64(dl.astype(np.uint64))
               % np.uint64(nb)).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "dl": pa.array(dl, pa.int64()),
                         "dlb": pa.array(dlb, pa.int64())})

    rows = ray.data.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(narrow, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()

    hist = rows.groupby("dl").aggregate(Count(alias_name="n")) \
        .to_pandas().sort_values("dl", ignore_index=True)
    dls = hist["dl"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    bases = np.concatenate(([0], np.cumsum(cnts)[:-1]))  # exclusive
    n = int(cnts.sum())
    big = n % NTILE_K
    size_small = n // NTILE_K
    size_big = size_small + 1
    side = ray.put((dls, bases))

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        sdls, sbases = ray.get(side)  # zero-copy numpy views
        dl = g["dl"].to_numpy(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        order = np.lexsort((ids, dl))
        dl, ids = dl[order], ids[order]
        m = len(dl)
        seg_start = np.maximum.accumulate(np.where(
            np.r_[True, dl[1:] != dl[:-1]], np.arange(m), -1))
        pos = np.arange(m) - seg_start
        rank = sbases[np.searchsorted(sdls, dl)] + pos + 1  # 1-based
        cut = big * size_big
        tile = np.where(
            rank <= cut,
            (rank - 1) // size_big + 1,
            big + ((rank - cut - 1) // max(size_small, 1)) + 1)
        return pd.DataFrame({"doc_id": ids, "dl": dl, "tile": tile})

    out = rows.groupby("dlb").map_groups(kern, batch_format="pandas")
    df = out.to_pandas().sort_values("doc_id", ignore_index=True)
    return pa.table({
        "doc_id": pa.array(df.doc_id.to_numpy(np.int64), pa.int64()),
        "dl": pa.array(df.dl.to_numpy(np.int64), pa.int64()),
        "tile": pa.array(df.tile.to_numpy(np.int64), pa.int64()),
    })


def sql_doclen_ntile() -> str:
    return rf"""
WITH d AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\S+'))::BIGINT AS dl
  FROM documents
)
SELECT doc_id, dl,
       ntile({NTILE_K}) OVER (ORDER BY dl, doc_id)::BIGINT AS tile
FROM d ORDER BY doc_id
"""


QUERIES = {
    "value_histogram": value_histogram,
    "doclen_ntile": doclen_ntile,
    "doclen_histogram": doclen_histogram,
    "event_anomalies": event_anomalies,
}
ORACLE_SQL = {
    "value_histogram": sql_value_histogram(),
    "doclen_ntile": sql_doclen_ntile(),
    "doclen_histogram": sql_doclen_histogram(),
    "event_anomalies": sql_event_anomalies(),
}
