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
contract — so the fan-out is a pluggable BACKBONE with two modes
behind one partial schema (round-3 VERDICT item 1):

- ``exact`` (default, the oracle mode): block-pair cross join,
  bit-exact, O(N^2) compute bounded to two blocks per task, submitted
  through a sliding in-flight window (no per-wave barrier).
- ``ivf``: the sub-quadratic scale path — vectors are assigned to
  their nearest deterministic k-means centroid (similarity._ivf_train,
  the ann_ivf trainer) and each vector PROBES its IVF_NPROBE nearest
  centroids; candidates are scored only within a probed centroid's
  member set, so compute is ~nprobe x N x (N/K) and goes sub-quadratic
  as K scales with N (at 100 TB size K ~ sqrt(N)). Approximate by
  construction (a true neighbor outside every probed cell is missed);
  1-NN edge recall vs exact is pinned >= 0.9 in pytest and the
  timing is bench-visible as ``knn_graph_ivf``.

Every consumer of the fan-out (knn_graph, knn_label_eval,
pagerank_topk, label_prop, triangle_stats, text_emb_consistency)
inherits the switch: pass ``backbone=`` explicitly or set the
RAYSEARCH_KNN_BACKBONE env var; oracles always run exact.

Partitioning assumption: one vector's <= k x B (exact) or
k x nprobe (ivf) partial rows fit a reduce group trivially.
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

    A bare top-k argpartition is NOT enough: cosines are round6-
    quantized, so ties at the local k boundary are common, and keeping
    an arbitrary tied candidate here can drop the one the global order
    ranks inside the top-k. Instead: argpartition finds each row's
    k-th largest VALUE (well-defined even under ties), the candidate
    set is every column >= that value (the top-k plus ALL boundary
    ties — a superset of the true top-k), and one lexsort over the
    candidate rows resolves (cos DESC, nbr_id ASC) exactly. This
    replaces the full-width per-row stable argsort (O(n m log m), the
    dominant cost of the exact fan-out) with O(n m) selection +
    O(c log c) over the small candidate set."""
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
    if kk < m:
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        vk = sims[np.arange(n)[:, None], part].min(axis=1)
    else:
        vk = np.full(n, -np.inf)
    rows, cols = np.nonzero(sims >= vk[:, None])
    cand = sims[rows, cols]
    # lexsort: primary rows, then cos DESC, then column (= nbr_id
    # ascending — columns were id-sorted above)
    order = np.lexsort((cols, -cand, rows))
    rows, cols, cand = rows[order], cols[order], cand[order]
    # first kk per row (runs of `rows` are contiguous after lexsort)
    starts = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
    runlen = np.diff(np.r_[starts, len(rows)])
    cum = np.arange(len(rows)) - np.repeat(starts, runlen)
    keep = (cum < kk) & np.isfinite(cand)  # also drops masked selfs
    rows, cols, c = rows[keep], cols[keep], cand[keep]
    return pa.table({
        "vec_id": pa.array(ids_a[rows], pa.int64()),
        "true_label": pa.array(lab_a[rows], pa.int64()),
        "nbr_id": pa.array(ids_b[cols], pa.int64()),
        "nbr_label": pa.array(lab_b[cols], pa.int64()),
        "cos": pa.array(c, pa.float64()),
    })


def _backbone(backbone: str | None) -> str:
    mode = backbone or os.environ.get("RAYSEARCH_KNN_BACKBONE", "exact")
    if mode not in ("exact", "ivf"):
        raise ValueError(f"knn_backbone must be 'exact' or 'ivf', "
                         f"got {mode!r}")
    return mode


IVF_QCHUNK = 2048  # query rows per in-group matmul block
# probe depth for the graph backbone. Deeper than ann_ivf's query-time
# IVF_NPROBE=4 because EVERY vector is a query here and the recall
# contract is on edges (1-NN recall >= 0.9 pinned in pytest; measured
# 0.926 at sf0.01 — the synthetic near-uniform embeddings are the
# worst case for cell separation, real corpora cluster far better).
# The scan fraction is ~KNN_IVF_NPROBE/K; sub-quadratic as K scales
# with N (K ~ sqrt(N) at 100 TB keeps work ~nprobe*sqrt(N) per
# vector while this constant stays fixed).
KNN_IVF_NPROBE = 10


def _knn_partials_exact(sf_dir: str, nb: int):
    """Exact block-pair fan-out: tasks -> Dataset of k-bounded
    partials (built from the task REFS via from_arrow_refs — partials
    stream from the object store into the merge groupby without driver
    materialization), bucketed by a coarse vec-hash key. Tasks are
    submitted through a SLIDING in-flight window (ray.wait one at a
    time past WINDOW), so finished workers start the next pair
    immediately — the per-256-task full-wave barrier this replaces
    idled every early finisher until the slowest task of its wave
    (round-3 VERDICT item 8)."""
    import ray
    import ray.data

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
    window, refs, inflight = 256, [], []
    for i in range(len(blocks)):
        for j in range(i, len(blocks)):
            if len(inflight) >= window:
                done, inflight = ray.wait(inflight, num_returns=1)
                refs.extend(done)
            inflight.append(pair_task.remote(blocks[i], blocks[j],
                                             i == j))
    refs.extend(inflight)
    return ray.data.from_arrow_refs(refs)


def _knn_partials_ivf(sf_dir: str, nb: int):
    """IVF-bucketed fan-out emitting the SAME partial schema: each
    vector joins its argmax centroid's member set and probes its
    IVF_NPROBE nearest centroids; candidates score only within a
    probed cell. Pure Dataset composition — one map_batches (assign
    against broadcast centroids) and ONE centroid groupby whose
    kernel runs the identical _row_topk scorer in IVF_QCHUNK-row
    blocks (task memory = chunk x cell, never cell x cell)."""
    import ray
    import ray.data

    from raysearch.pipelines.similarity import IVF_CENTROIDS, _ivf_train

    # cells scale with the table: K ~ sqrt(N)/4 (floor IVF_CENTROIDS)
    # keeps per-cell work ~4*sqrt(N) rows and the scan fraction
    # ~nprobe/K shrinking as N grows — this is what makes the backbone
    # sub-quadratic (total compute ~nprobe * N * N/K ~ N^1.5), not
    # just a constant-factor discount on the cross join. The /4 growth
    # rate is tuned so recall holds >= 0.9 even on the testdata's
    # NEAR-UNIFORM vectors (IVF's adversarial case — no cell
    # structure); clustered corpora measure 1.000 at 10k-40k rows
    # (BASELINE.md round-4 crossover table).
    K = max(IVF_CENTROIDS, int(np.sqrt(max(_n_emb(sf_dir), 1)) / 4))
    cents = _ivf_train(sf_dir, k=K)
    cref = ray.put(cents)
    nprobe = min(KNN_IVF_NPROBE, len(cents))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, mat = _emb_matrix(batch)
        labels = batch["label"].to_numpy().astype(np.int64)
        bn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = bn @ c.T
        # role 0 = member of its argmax cell; role 1 = probing query
        # (the argmax cell is one of the probes, so each vector is
        # also scored against its own cell's members)
        probes = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        n = len(ids)
        member = pa.table({
            "cid": pa.array(probes[:, 0].astype(np.int64), pa.int64()),
            "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
            "label": pa.array(labels, pa.int64()),
            "emb": pa.array(list(bn), pa.list_(pa.float64(),
                                               bn.shape[1])),
            "role": pa.array(np.zeros(n, np.int64), pa.int64()),
        })
        rep = np.repeat(np.arange(n), nprobe)
        query = pa.table({
            "cid": pa.array(probes.ravel().astype(np.int64), pa.int64()),
            "vec_id": pa.array(ids[rep].astype(np.int64), pa.int64()),
            "label": pa.array(labels[rep], pa.int64()),
            "emb": pa.array(list(bn[rep]), pa.list_(pa.float64(),
                                                    bn.shape[1])),
            "role": pa.array(np.ones(n * nprobe, np.int64), pa.int64()),
        })
        return pa.concat_tables([member, query])

    def cell_topk(g: pd.DataFrame) -> pd.DataFrame:
        mem = g[g.role == 0]
        qry = g[g.role == 1]
        if not len(mem) or not len(qry):
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in ("vec_id", "true_label",
                                           "nbr_id", "nbr_label",
                                           "bucket")}).assign(
                cos=np.array([], np.float64))[
                ["vec_id", "true_label", "nbr_id", "nbr_label",
                 "cos", "bucket"]]
        ids_b = mem.vec_id.to_numpy(np.int64)
        lab_b = mem.label.to_numpy(np.int64)
        mat_b = np.stack(mem.emb.to_numpy()).astype(np.float64)
        ids_a = qry.vec_id.to_numpy(np.int64)
        lab_a = qry.label.to_numpy(np.int64)
        mat_a = np.stack(qry.emb.to_numpy()).astype(np.float64)
        parts = []
        for s in range(0, len(ids_a), IVF_QCHUNK):
            e = min(s + IVF_QCHUNK, len(ids_a))
            sims = round6(mat_a[s:e] @ mat_b.T)
            sims[ids_a[s:e, None] == ids_b[None, :]] = -np.inf  # self
            parts.append(_row_topk(ids_a[s:e], lab_a[s:e],
                                   ids_b, lab_b, sims))
        t = pa.concat_tables(parts)
        df = t.to_pandas()
        df["bucket"] = (df.vec_id.to_numpy(np.int64)
                        & (nb - 1)).astype(np.int64)
        return df

    ds = _read_emb_labeled(sf_dir).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("cid").map_groups(cell_topk,
                                        batch_format="pandas")


def _knn_partials_ds(sf_dir: str, backbone: str | None = None):
    """The shared fan-out of the six knn-graph operators: k-bounded
    per-row top-k partial rows (vec_id, true_label, nbr_id, nbr_label,
    cos, bucket), produced by the selected backbone (module docstring).
    Downstream merge is identical for both modes because top-k is a
    mergeable aggregate over whatever candidate set the backbone
    scored."""
    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_emb(sf_dir))
    if _backbone(backbone) == "ivf":
        return _knn_partials_ivf(sf_dir, nb)
    return _knn_partials_exact(sf_dir, nb)


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
def knn_graph(sf_dir: str, backbone: str | None = None) -> pa.Table:
    """Cosine k-NN graph: every vector's top-{k} neighbors (self
    excluded), rank under (round6(cos) DESC, nbr_id ASC). Exact under
    the default backbone; ``backbone="ivf"`` swaps in the
    sub-quadratic probe fan-out (same schema, approximate edges)."""
    ds = _knn_partials_ds(sf_dir, backbone)
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
def knn_label_eval(sf_dir: str,
                   backbone: str | None = None) -> pa.Table:
    """Leave-one-out k-NN classification eval over the labeled
    embedding table: predict each vector's label by majority vote of
    its {k} nearest neighbors' labels (ties -> smallest label) and
    report the confusion matrix (true_label, pred_label, n) — the
    standard embedding-quality probe. Neighbors come from the
    pluggable backbone: exact by default (the oracle contract);
    backbone="ivf" / RAYSEARCH_KNN_BACKBONE=ivf selects the
    sub-quadratic IVF candidate generator."""
    from ray.data.aggregate import Sum

    ds = _knn_partials_ds(sf_dir, backbone)
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


def knn_graph_ivf(sf_dir: str) -> pa.Table:
    """knn_graph on the sub-quadratic IVF backbone — the 100 TB path
    of the whole kNN-graph operator family, registered so its timing
    and row shape are driver/bench-visible. Approximate by
    construction -> rows-only check (no SQL oracle); 1-NN edge recall
    vs the exact backbone is pinned in tests/test_knn.py."""
    return knn_graph(sf_dir, backbone="ivf")


QUERIES = {
    "knn_graph": knn_graph,
    "knn_label_eval": knn_label_eval,
    "knn_graph_ivf": knn_graph_ivf,
}

ORACLE_SQL = {
    "knn_graph": sql_knn_graph(),
    "knn_label_eval": sql_knn_label_eval(),
    # knn_graph_ivf: approximate -> rows-only check, no SQL oracle
}
