"""Distributed PageRank over the exact cosine k-NN graph — the
iterative graph algorithm (Brin & Page 1998) expressed as Pregel-style
supersteps on Ray Data, and a centrality ranking for the embedding
corpus (which documents sit in the densest semantic neighborhoods).

The whole computation runs in FIXED-POINT INTEGER arithmetic (prob
mass in units of 1e-12, damping as the exact rational 85/100, floor
division): integer sums are associative, so the result is
bit-identical under any reduce order AND reproducible in SQL — the
oracle replays the same K supersteps as unrolled CTEs over the
composed knn-edge CTE with DuckDB's `//`. A float PageRank cannot
survive a value-hash (summation order perturbs the low bits at every
merge); the fixed-point contract costs nothing the ranking cares
about (~1e-12 resolution; at node counts beyond ~1e9 raise PR_SCALE
to keep >= 3 significant digits per node — contribs stay < 2^63 up
to PR_SCALE = 1e15).

Shape per superstep (x {iters}): edges are built ONCE from the shared
knn partials fan-out (knn.py), re-keyed (bucket = src-hash, src, dst,
deg) with the out-degree carried ON the edge rows, and MATERIALIZED —
k-bounded narrow rows, so the O(N^2) similarity work never re-runs.
The rank vector is a (bucket, node, p) dataset co-bucketed with the
edge source key. Superstep = union -> ONE src-bucket groupby (each
edge reads p[src] in-group, emits an integer contribution row keyed
by the DESTINATION bucket; each node emits its teleport row keyed by
its own bucket) -> ONE dst-bucket groupby (new p = plain sum of the
group's rows). Two coarse exchanges per superstep, both carrying
narrow integer rows; nothing node-cardinality ever reaches the
driver. The final top-{k} is k-bounded: per-block local top-k under
(p DESC, node ASC), driver merges n_blocks x {k} rows.

Partitioning assumptions: a node's in-edges within one bucket fit a
reduce group (in-degree of a k-NN graph is bounded in expectation;
auto_buckets keeps groups ~constant-size); every node has out-degree
>= 1 when N >= 2 (k-NN guarantees it), so no dangling-mass handling
is needed — for N = 1 the single node holds exactly its teleport
share, the same formula the oracle computes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.pipelines.knn import (
    KNN_K,
    _knn_partials_ds,
    _merge_topk,
    sql_knn_graph,
)
from raysearch.pipelines.similarity import _n_emb

PR_SCALE = 10 ** 12          # prob mass units of 1e-12
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an exact rational
PR_ITERS = 3
PR_K = 20

_COLS = ["bucket", "a", "b", "deg", "p", "side"]


def _edges_ds(sf_dir: str, nb: int):
    """(bucket=src-hash, a=src, b=dst, deg=src out-degree) edge rows
    from the shared knn fan-out, in the unified superstep schema."""

    def edge_kern(g: pd.DataFrame) -> pd.DataFrame:
        top = _merge_topk(g)
        src = top.vec_id.to_numpy(np.int64)
        deg = top.groupby("vec_id")["nbr_id"].transform("size")
        return pd.DataFrame({
            "bucket": src & (nb - 1), "a": src,
            "b": top.nbr_id.to_numpy(np.int64),
            "deg": deg.to_numpy(np.int64),
            "p": np.int64(0), "side": np.int64(0)})[_COLS]

    return (_knn_partials_ds(sf_dir)
            .groupby("bucket").map_groups(edge_kern,
                                          batch_format="pandas")
            .materialize())


def pagerank_topk(sf_dir: str) -> pa.Table:
    """The {k} most central vectors of the exact cosine {knnk}-NN
    graph after {iters} fixed-point PageRank supersteps (damping
    {dn}/{dd}, mass units of 1/{scale}), ties broken by vec_id.""" \
        .format(k=PR_K, knnk=KNN_K, iters=PR_ITERS, dn=PR_D_NUM,
                dd=PR_D_DEN, scale=PR_SCALE)
    import ray.data

    from raysearch.hashing import auto_buckets

    n = _n_emb(sf_dir)
    if n == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "p": pa.array([], pa.int64())})
    nb = auto_buckets(n)
    teleport = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // (PR_D_DEN * n)
    p0 = PR_SCALE // n

    if n == 1:
        import os

        import pyarrow.parquet as pq
        vid = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id"])["vec_id"].to_numpy().astype(np.int64)
        return pa.table({"vec_id": pa.array(vid, pa.int64()),
                         "p": pa.array([teleport], pa.int64())})

    edges = _edges_ds(sf_dir, nb)

    # p0 comes from the vec_id column itself (unique by schema) — a
    # map-only pass, and immune to a source's edge rows ever being
    # re-batched across block boundaries (deriving nodes from edges
    # would double-mint p0 rows in that case)
    import os

    def p0_kern(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df.vec_id.to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": nodes & (nb - 1), "a": nodes,
            "b": np.int64(0), "deg": np.int64(0),
            "p": np.int64(p0), "side": np.int64(1)})[_COLS]

    p_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id"]).map_batches(p0_kern,
                                        batch_format="pandas")

    def contrib_kern(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g.side == 1]
        e = g[g.side == 0]
        # in-group p[src] lookup via sorted arrays (each src's edges
        # and its p row share this bucket by construction)
        pn = pr.a.to_numpy(np.int64)
        pv = pr.p.to_numpy(np.int64)
        order = np.argsort(pn)
        pn, pv = pn[order], pv[order]
        src = e.a.to_numpy(np.int64)
        pos = np.searchsorted(pn, src)
        psrc = pv[pos]
        c = (psrc * PR_D_NUM) // (e.deg.to_numpy(np.int64) * PR_D_DEN)
        dst = e.b.to_numpy(np.int64)
        out_e = pd.DataFrame({
            "bucket": dst & (nb - 1), "a": dst, "b": np.int64(0),
            "deg": np.int64(0), "p": c, "side": np.int64(2)})
        out_t = pd.DataFrame({
            "bucket": pn & (nb - 1), "a": pn, "b": np.int64(0),
            "deg": np.int64(0), "p": np.int64(teleport),
            "side": np.int64(2)})
        return pd.concat([out_e[_COLS], out_t[_COLS]],
                         ignore_index=True)

    def sum_kern(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("a", as_index=False).agg(p=("p", "sum")))
        a = s.a.to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": a & (nb - 1), "a": a, "b": np.int64(0),
            "deg": np.int64(0), "p": s.p.to_numpy(np.int64),
            "side": np.int64(1)})[_COLS]

    for _ in range(PR_ITERS):
        p_ds = (edges.union(p_ds)
                .groupby("bucket").map_groups(contrib_kern,
                                              batch_format="pandas")
                .groupby("bucket").map_groups(sum_kern,
                                              batch_format="pandas"))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["p", "a"],
                              ascending=[False, True]).head(PR_K)

    df = p_ds.map_batches(local_topk,
                          batch_format="pandas").to_pandas()
    if "a" not in df.columns or not len(df):
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "p": pa.array([], pa.int64())})
    df = (df.sort_values(["p", "a"], ascending=[False, True],
                         ignore_index=True).head(PR_K))
    return pa.table({
        "vec_id": pa.array(df.a.to_numpy(np.int64), pa.int64()),
        "p": pa.array(df.p.to_numpy(np.int64), pa.int64()),
    })


def sql_pagerank_topk() -> str:
    knn = sql_knn_graph().strip().rstrip(";")
    iters = ""
    prev = "p0"
    for i in range(1, PR_ITERS + 1):
        iters += f""",
it{i} AS (
  SELECT n.node,
         (SELECT tele FROM consts)
         + coalesce(sum((pp.p * {PR_D_NUM})
                        // (e.deg * {PR_D_DEN})), 0) AS p
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN {prev} pp ON pp.node = e.src
  GROUP BY n.node
)"""
        prev = f"it{i}"
    return f"""
WITH knn AS ({knn}),
edges AS (
  SELECT vec_id AS src, nbr_id AS dst,
         count(*) OVER (PARTITION BY vec_id) AS deg
  FROM knn
),
nodes AS (SELECT DISTINCT vec_id AS node FROM embeddings),
consts AS (
  SELECT ({PR_SCALE} * ({PR_D_DEN} - {PR_D_NUM}))
           // ({PR_D_DEN} * count(*)) AS tele,
         {PR_SCALE} // count(*) AS p0
  FROM nodes
),
p0 AS (SELECT node, (SELECT p0 FROM consts) AS p FROM nodes){iters}
SELECT node::BIGINT AS vec_id, p::BIGINT AS p
FROM {prev}
ORDER BY p DESC, vec_id
LIMIT {PR_K}
"""


QUERIES = {
    "pagerank_topk": pagerank_topk,
}

ORACLE_SQL = {
    "pagerank_topk": sql_pagerank_topk(),
}
