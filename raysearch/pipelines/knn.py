"""Exact k-NN graph over the ``embeddings`` table, and the classic
model-eval built on it: leave-one-out k-NN label prediction vs the
labeled ``label`` column (the first consumer of that column).

knn_graph is the all-vectors generalization of ann_topk (every vector
is a query): the same block-pair cross-join shape as
similarity.embedding_dups — B normalized blocks in the object store,
B*(B+1)/2 tasks — but each task emits K-BOUNDED per-row partials
(its local top-k for every row of both blocks), so the exchange
carries N x k x B partial rows, never the N^2 similarity matrix. ONE
coarse vec-bucketed groupby merges partials into the global top-k per
vector (the merge is correct because top-k is a mergeable aggregate:
global top-k is contained in the union of per-block top-ks).

knn_label_eval rides the identical partials with the label columns
carried alongside: the merge kernel votes over the k neighbor labels
(majority, ties -> smallest label) and emits per-(true, pred)
partial counts; the final exchange is label^2-cardinality. Both the
vote and the SQL oracle's vote share the (count DESC, label ASC)
total order, so the confusion matrix is exact.

At 100 TB the O(N^2) block-pair compute is inherent to the EXACT
contract; the sub-quadratic replacements are ann_lsh / ann_ivf (same
scoring kernel over bucketed candidates). Partitioning assumption:
one vector's <= k x B partial rows fit a reduce group trivially
(k and B-per-group are constants).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.numutil import fmt_doc, round6
from raysearch.pipelines.similarity import (
    DUP_BLOCK_ROWS,
    _emb_matrix,
    _n_emb,
)

_EMB = "embeddings.parquet"

KNN_K = 5


def _read_emb_labeled(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, _EMB),
                                 columns=["vec_id", "embedding",
                                          "label"])


def _emb_blocks(sf_dir: str) -> list:
    """Normalized (ids, labels, mat) blocks in the object store; the
    driver keeps only the refs (same shape as embedding_dups)."""
    import ray

    blocks = []
    for batch in _read_emb_labeled(sf_dir).iter_batches(
            batch_size=DUP_BLOCK_ROWS, batch_format="pyarrow"):
        ids, mat = _emb_matrix(batch)
        labels = batch["label"].to_numpy().astype(np.int64)
        bn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        blocks.append(ray.put((ids.astype(np.int64), labels, bn)))
    return blocks


def _row_topk(ids_a, lab_a, ids_b, lab_b, sims) -> pa.Table:
    """Per-row local top-k partials of one (a rows x b cols) similarity
    block: for every a-row, its k best b-columns UNDER THE TOTAL ORDER
    (cos DESC, nbr_id ASC). Self-pairs carry sims = -inf from the
    caller.

    A value-only argpartition is NOT enough: cosines are round6-
    quantized, so ties at the local k boundary are common, and keeping
    an arbitrary tied candidate here can drop the one the global order
    ranks inside the top-k. Columns are pre-sorted by nbr_id so a
    STABLE argsort of -sims resolves every tie in id order."""
    n, m = sims.shape
    kk = min(KNN_K, m)
    if n == 0 or kk == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "true_label": pa.array([], pa.int64()),
                         "nbr_id": pa.array([], pa.int64()),
                         "nbr_label": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    corder = np.argsort(ids_b, kind="stable")
    ids_b, lab_b = ids_b[corder], lab_b[corder]
    sims = sims[:, corder]
    top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
    rows = np.repeat(np.arange(n), kk)
    cols = top.ravel()
    c = sims[rows, cols]
    keep = np.isfinite(c)      # drops masked self-pairs
    rows, cols, c = rows[keep], cols[keep], c[keep]
    return pa.table({
        "vec_id": pa.array(ids_a[rows], pa.int64()),
        "true_label": pa.array(lab_a[rows], pa.int64()),
        "nbr_id": pa.array(ids_b[cols], pa.int64()),
        "nbr_label": pa.array(lab_b[cols], pa.int64()),
        "cos": pa.array(c, pa.float64()),
    })


def _knn_partials_ds(sf_dir: str):
    """The shared fan-out of both knn operators: block-pair tasks ->
    Dataset of k-bounded partials (built from the task REFS via
    from_arrow_refs — partials stream from the object store into the
    merge groupby without driver materialization), bucketed by a
    coarse vec-hash key."""
    import ray
    import ray.data

    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_emb(sf_dir))

    @ray.remote(num_cpus=1)
    def pair_task(a_ref, b_ref, diagonal):
        ids_a, lab_a, bn_a = a_ref
        ids_b, lab_b, bn_b = b_ref
        sims = round6(bn_a @ bn_b.T)
        if diagonal:
            np.fill_diagonal(sims, -np.inf)
            parts = [_row_topk(ids_a, lab_a, ids_b, lab_b, sims)]
        else:
            parts = [_row_topk(ids_a, lab_a, ids_b, lab_b, sims),
                     _row_topk(ids_b, lab_b, ids_a, lab_a, sims.T)]
        t = pa.concat_tables(parts)
        bucket = (t["vec_id"].to_numpy() & (nb - 1)).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    blocks = _emb_blocks(sf_dir)
    # bounded waves of in-flight task refs (the embedding_dups rule:
    # driver state O(wave), not O(B^2))
    from itertools import islice

    def gen_pairs():
        for i in range(len(blocks)):
            for j in range(i, len(blocks)):
                yield i, j

    wave, refs, it = 256, [], gen_pairs()
    while True:
        chunk = list(islice(it, wave))
        if not chunk:
            break
        batch_refs = [pair_task.remote(blocks[i], blocks[j], i == j)
                      for i, j in chunk]
        ray.wait(batch_refs, num_returns=len(batch_refs))
        refs.extend(batch_refs)
    return ray.data.from_arrow_refs(refs)


def _merge_topk(g: pd.DataFrame) -> pd.DataFrame:
    """One vec-bucket group of partials -> each vector's global top-k
    under the (cos DESC, nbr_id ASC) total order. Vectorized across
    vectors: one lexsort + cumcount."""
    g = g.sort_values(["vec_id", "cos", "nbr_id"],
                      ascending=[True, False, True],
                      ignore_index=True)
    rank = g.groupby("vec_id").cumcount() + 1
    g = g.assign(rank=rank)
    return g[g["rank"] <= KNN_K]


@fmt_doc(k=KNN_K)
def knn_graph(sf_dir: str) -> pa.Table:
    """Exact cosine k-NN graph: every vector's top-{k} neighbors
    (self excluded), rank under (round6(cos) DESC, nbr_id ASC)."""
    ds = _knn_partials_ds(sf_dir)
    out = ds.groupby("bucket").map_groups(_merge_topk,
                                          batch_format="pandas")
    df = out.to_pandas()
    if "vec_id" not in df.columns:  # empty table
        df = pd.DataFrame({c: np.array([], dtype=np.int64)
                           for c in ("vec_id", "nbr_id", "rank")}
                          ).assign(cos=np.array([], dtype=np.float64))
    df = df.sort_values(["vec_id", "rank"], ignore_index=True)
    return pa.table({
        "vec_id": pa.array(df.vec_id.to_numpy(np.int64), pa.int64()),
        "nbr_id": pa.array(df.nbr_id.to_numpy(np.int64), pa.int64()),
        "rank": pa.array(df["rank"].to_numpy(np.int64), pa.int64()),
        "cos": pa.array(df.cos.to_numpy(np.float64), pa.float64()),
    })


def _vote_kern(g: pd.DataFrame) -> pd.DataFrame:
    """Merge partials to top-k, then majority-vote the neighbor labels
    per vector (ties -> smallest label) and emit per-(true, pred)
    partial counts. Vectorized: one groupby-size over (vec, label),
    one (count DESC, label ASC) lexsort, first row per vec."""
    top = _merge_topk(g)
    votes = (top.groupby(["vec_id", "true_label", "nbr_label"],
                         as_index=False)
             .agg(n=("nbr_label", "size")))
    votes = votes.sort_values(["vec_id", "n", "nbr_label"],
                              ascending=[True, False, True],
                              ignore_index=True)
    first = votes.drop_duplicates("vec_id", keep="first")
    return (first.rename(columns={"nbr_label": "pred_label"})
            .groupby(["true_label", "pred_label"], as_index=False)
            .agg(n=("vec_id", "size")))


@fmt_doc(k=KNN_K)
def knn_label_eval(sf_dir: str) -> pa.Table:
    """Leave-one-out k-NN classification eval over the labeled
    embedding table: predict each vector's label by majority vote of
    its {k} exact nearest neighbors' labels (ties -> smallest label)
    and report the confusion matrix (true_label, pred_label, n) —
    the standard embedding-quality probe."""
    from ray.data.aggregate import Sum

    ds = _knn_partials_ds(sf_dir)
    agg = (ds.groupby("bucket").map_groups(_vote_kern,
                                           batch_format="pandas")
           .groupby(["true_label", "pred_label"]).aggregate(
               Sum("n", alias_name="n")))
    df = agg.to_pandas()
    if "true_label" not in df.columns:  # empty table
        df = pd.DataFrame({c: np.array([], dtype=np.int64)
                           for c in ("true_label", "pred_label", "n")})
    df = df.sort_values(["true_label", "pred_label"], ignore_index=True)
    return pa.table({
        "true_label": pa.array(df.true_label.to_numpy(np.int64),
                               pa.int64()),
        "pred_label": pa.array(df.pred_label.to_numpy(np.int64),
                               pa.int64()),
        "n": pa.array(df.n.to_numpy(np.int64), pa.int64()),
    })


def sql_knn_graph() -> str:
    return f"""
WITH sims AS (
  SELECT a.vec_id, b.vec_id AS nbr_id,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, nbr_id, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, nbr_id) AS rank
  FROM sims
)
SELECT vec_id, nbr_id, rank, cos FROM ranked WHERE rank <= {KNN_K}
ORDER BY vec_id, rank
"""


def sql_knn_label_eval() -> str:
    return f"""
WITH sims AS (
  SELECT a.vec_id, a.label AS true_label, b.label AS nbr_label,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cos,
         b.vec_id AS nbr_id
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
topk AS (
  SELECT * FROM (
    SELECT vec_id, true_label, nbr_label,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, nbr_id) AS rank
    FROM sims) WHERE rank <= {KNN_K}
),
votes AS (
  SELECT vec_id, true_label, nbr_label, count(*) AS cnt
  FROM topk GROUP BY 1, 2, 3
),
pred AS (
  SELECT vec_id, true_label, nbr_label AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cnt DESC, nbr_label) AS rn
    FROM votes) WHERE rn = 1
)
SELECT true_label::BIGINT AS true_label,
       pred_label::BIGINT AS pred_label,
       count(*)::BIGINT AS n
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "knn_graph": knn_graph,
    "knn_label_eval": knn_label_eval,
}

ORACLE_SQL = {
    "knn_graph": sql_knn_graph(),
    "knn_label_eval": sql_knn_label_eval(),
}
