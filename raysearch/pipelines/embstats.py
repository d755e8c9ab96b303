"""Embedding-table statistics: per-label centroids and norm
distributions — the monitoring ops every embedding pipeline runs
before trusting its vectors (centroid drift flags a broken encoder
rollout; norm collapse flags an un-normalized or dead model; both are
the first dashboards after SemDeDup/ANN ingestion).

Scale shape (both ops): ONE pass over the embedding table; per-batch
partials are (labels-in-batch x dim)-sized (centroids) or
label-cardinality (norms) — never row-cardinality — so the only
exchange is a label(-x-dim)-keyed aggregate over tiny partial rows.
Results are label-cardinality: driver-side by contract, a broadcast
consumer at 100 TB.

Float discipline: every float32 value is widened to float64 BEFORE
any arithmetic on BOTH engines (numpy astype / CAST AS DOUBLE inside
the SQL lambda), all reductions are plain sums whose cross-engine
association error is ~1e-13 relative, and every reported float is
round6(x) + 0.0 (the -0.0 normalizer used across the repo), so the
driver's 6-decimal value hash is stable.

The reference engine has no vector layer; these generalize its
collection-statistics pass (src/lib.rs:86-100, per-doc counts merged
into corpus stats) from token counts to vector moments.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.numutil import round6
from raysearch.pipelines.similarity import _EMB


def _read_labeled(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, _EMB),
        columns=["vec_id", "embedding", "label"])


def _label_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    lab = batch["label"].to_numpy().astype(np.int64)
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, len(lab))
    return lab, flat.reshape(len(lab), dim)


def label_centroids(sf_dir: str) -> pa.Table:
    """(label, pos, n, mean): the per-label mean embedding in long
    form — one row per (label, dimension), so the result is pure
    scalars (no list column reaches the value hash).

    Per batch: one np.add.at scatter of the (n, dim) matrix onto the
    batch's unique labels gives (labels x dim) sum partials plus a
    label count — the combiner. The label-x-dim-keyed Sum aggregate
    that follows is O(labels x dim) rows total, not O(rows)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lab, mat = _label_matrix(batch)
        if not len(lab):
            return pa.table({"label": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        ulab, inv = np.unique(lab, return_inverse=True)
        dim = mat.shape[1]
        sums = np.zeros((len(ulab), dim), np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ulab, dim), pa.int64()),
            "pos": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                    len(ulab)), pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
        })

    agg = (_read_labeled(sf_dir)
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(["label", "pos"])
           .aggregate(Sum("s", alias_name="s"),
                      Sum("n", alias_name="n"))).to_pandas()
    agg = agg.sort_values(["label", "pos"], ignore_index=True)
    n = agg["n"].to_numpy(np.int64)
    mean = round6(agg["s"].to_numpy(np.float64)
                  / np.maximum(n, 1)) + 0.0
    return pa.table({
        "label": pa.array(agg["label"].to_numpy(np.int64), pa.int64()),
        "pos": pa.array(agg["pos"].to_numpy(np.int64), pa.int64()),
        "n": pa.array(n, pa.int64()),
        "mean": pa.array(mean, pa.float64()),
    })


def sql_label_centroids() -> str:
    return """
WITH u AS (
  SELECT label::BIGINT AS label,
         unnest(range(len(embedding)))::BIGINT AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings
)
SELECT label, pos, count(*)::BIGINT AS n,
       round(sum(e) / count(*), 6) + 0.0 AS mean
FROM u GROUP BY label, pos ORDER BY label, pos
"""


def emb_norm_stats(sf_dir: str) -> pa.Table:
    """(label, n, min_norm, max_norm, mean_norm, var_norm): the
    per-label L2-norm distribution. min/max are order-independent
    (bit-exact across engines); mean/variance use the identical
    two-moment formula (s2/n - (s1/n)^2, clipped at 0 via the same
    max() on both sides) over float64 sums.

    Per batch: one einsum row-norm + one np.add.at scatter per moment
    onto the batch's labels — label-cardinality partials into a tiny
    label-keyed aggregate."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        lab, mat = _label_matrix(batch)
        if not len(lab):
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "s1": pa.array([], pa.float64()),
                             "s2": pa.array([], pa.float64())})
        nrm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        ulab, inv = np.unique(lab, return_inverse=True)
        k = len(ulab)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        s1 = np.zeros(k, np.float64)
        s2 = np.zeros(k, np.float64)
        np.add.at(s1, inv, nrm)
        np.add.at(s2, inv, nrm * nrm)
        mn = np.full(k, np.inf)
        mx = np.full(k, -np.inf)
        np.minimum.at(mn, inv, nrm)
        np.maximum.at(mx, inv, nrm)
        return pa.table({
            "label": pa.array(ulab, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "mn": pa.array(mn, pa.float64()),
            "mx": pa.array(mx, pa.float64()),
            "s1": pa.array(s1, pa.float64()),
            "s2": pa.array(s2, pa.float64()),
        })

    agg = (_read_labeled(sf_dir)
           .map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("label")
           .aggregate(Sum("n", alias_name="n"),
                      Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx"),
                      Sum("s1", alias_name="s1"),
                      Sum("s2", alias_name="s2"))).to_pandas()
    agg = agg.sort_values("label", ignore_index=True)
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    mean = agg["s1"].to_numpy(np.float64) / n
    var = np.maximum(agg["s2"].to_numpy(np.float64) / n - mean * mean,
                     0.0)
    return pa.table({
        "label": pa.array(agg["label"].to_numpy(np.int64), pa.int64()),
        "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
        "min_norm": pa.array(round6(agg["mn"].to_numpy(np.float64))
                             + 0.0, pa.float64()),
        "max_norm": pa.array(round6(agg["mx"].to_numpy(np.float64))
                             + 0.0, pa.float64()),
        "mean_norm": pa.array(round6(mean) + 0.0, pa.float64()),
        "var_norm": pa.array(round6(var) + 0.0, pa.float64()),
    })


def sql_emb_norm_stats() -> str:
    return """
WITH v AS (
  SELECT label::BIGINT AS label,
         sqrt(list_sum(list_transform(
             embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM embeddings
)
SELECT label, count(*)::BIGINT AS n,
       round(min(nrm), 6) + 0.0 AS min_norm,
       round(max(nrm), 6) + 0.0 AS max_norm,
       round(sum(nrm) / count(*), 6) + 0.0 AS mean_norm,
       round(greatest(sum(nrm * nrm) / count(*)
                      - (sum(nrm) / count(*)) * (sum(nrm) / count(*)),
                      0.0), 6) + 0.0 AS var_norm
FROM v GROUP BY label ORDER BY label
"""


QUERIES = {
    "label_centroids": label_centroids,
    "emb_norm_stats": emb_norm_stats,
}

ORACLE_SQL = {
    "label_centroids": sql_label_centroids(),
    "emb_norm_stats": sql_emb_norm_stats(),
}
