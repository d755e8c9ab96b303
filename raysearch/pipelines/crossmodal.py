"""Cross-modal consistency audit: for every vector, pair its EXACT
cosine 1-nearest-neighbor with the 3-gram Jaccard similarity of the
two documents' texts (vec_id == doc_id in the driver schema). A
nearest neighbor whose text shares nothing is the fingerprint of a
corrupted / misaligned embedding row — the standard sanity probe
before trusting an embedding table for dedup or retrieval.

Shape (everything linear, text never shuffles):

1. 1-NN pairs come from the shared knn fan-out (knn.py), rank-1 rows
   kept in the merge groupby.
2. Exchange A (doc-bucket): each pair emits one row under EACH member
   doc; documents emit their distinct 3-gram 60-bit hashes + set size
   (doc_shingles_flat — the shingle family's collision budget). The
   in-group kernel attaches every member's gram hashes to its pairs:
   output rows are (pair-bucket, a, b, cos, gram-hash, set-size,
   side), at most (k-NN in-degree + 1) x grams per doc — linear with
   a small constant.
3. Exchange B (pair-bucket): per pair, |A∩B| = gram hashes seen on
   BOTH sides, sizes ride the rows, jaccard = i / (na + nb - i)
   (0 when both docs are gram-less). No pair table is ever broadcast
   and no gram group enumerates quadratic co-occurrences (the two
   traps the dedup family documents).

Oracle: the knn CTE composed with a DISTINCT-3-gram self-join —
fully SQL-expressible, round6 on cos and jaccard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.numutil import round6
from raysearch.pipelines.knn import (
    _knn_partials_ds,
    _merge_topk,
    sql_knn_graph,
)
from raysearch.pipelines.similarity import _n_emb

JACC_NGRAM = 3


def text_emb_consistency(sf_dir: str, backbone: str | None = None
                         ) -> pa.Table:
    """(doc_id, nbr_id, cos, jaccard): every vector's 1-NN and the
    3-gram Jaccard of the two texts, sorted by doc_id. 1-NN comes
    from the pluggable kNN backbone: exact by default (the oracle
    contract); backbone="ivf" / RAYSEARCH_KNN_BACKBONE=ivf selects
    the sub-quadratic IVF candidate generator."""
    import os

    import ray.data

    from raysearch.hashing import auto_buckets, splitmix64
    from raysearch.pipelines.textops import (
        doc_shingles_flat,
        md5_prefix_ints,
    )

    n = _n_emb(sf_dir)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "nbr_id": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64()),
                      "jaccard": pa.array([], pa.float64())})
    if n < 2:
        return empty
    nb = auto_buckets(n)

    def _pair_bucket(a, b):
        h = splitmix64((a.astype(np.uint64) << np.uint64(20))
                       ^ b.astype(np.uint64))
        return (h & np.uint64(nb - 1)).astype(np.int64)

    # 1-NN pairs, re-keyed under EACH member doc (side 0)
    def pair_kern(g: pd.DataFrame) -> pd.DataFrame:
        top = _merge_topk(g)
        top = top[top["rank"] == 1]
        a = top.vec_id.to_numpy(np.int64)
        b = top.nbr_id.to_numpy(np.int64)
        cos = top.cos.to_numpy(np.float64)
        member = np.concatenate([a, b])
        return pd.DataFrame({
            "bucket": member & (nb - 1), "doc": member,
            "a": np.concatenate([a, a]), "b": np.concatenate([b, b]),
            "cos": np.concatenate([cos, cos]),
            "h": np.int64(0), "size": np.int64(0),
            "side": np.int64(0)})

    pairs = (_knn_partials_ds(sf_dir, backbone)
             .groupby("bucket").map_groups(pair_kern,
                                           batch_format="pandas"))

    # distinct 3-gram hashes + set size per doc (side 1)
    def gram_rows(batch: pa.Table) -> pd.DataFrame:
        ids, flat, starts = doc_shingles_flat(batch, ngram=JACC_NGRAM)
        if not len(ids):
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in ("bucket", "doc", "a", "b",
                                           "h", "size", "side")}
                                ).assign(cos=np.array([], np.float64))[
                ["bucket", "doc", "a", "b", "cos", "h", "size",
                 "side"]]
        counts = np.diff(np.append(starts, len(flat)))
        doc = np.repeat(ids.astype(np.int64), counts)
        size = np.repeat(counts.astype(np.int64), counts)
        h = md5_prefix_ints(flat, 15).astype(np.int64)
        return pd.DataFrame({
            "bucket": doc & (nb - 1), "doc": doc,
            "a": np.int64(0), "b": np.int64(0), "cos": np.float64(0),
            "h": h, "size": size, "side": np.int64(1)})

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]).map_batches(
        gram_rows, batch_format="pyarrow", zero_copy_batch=True)

    # exchange A: attach each member's gram hashes to its pairs
    def attach_kern(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g.side == 0][["doc", "a", "b", "cos"]]
        gr = g[g.side == 1][["doc", "h", "size"]]
        if not len(p):
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in ("bucket", "a", "b", "h",
                                           "size", "is_a")}).assign(
                cos=np.array([], np.float64))[
                ["bucket", "a", "b", "cos", "h", "size", "is_a"]]
        j = p.merge(gr, on="doc", how="left")
        j["h"] = j["h"].fillna(-1).astype(np.int64)      # gram-less
        j["size"] = j["size"].fillna(0).astype(np.int64)  # doc marker
        a = j.a.to_numpy(np.int64)
        b = j.b.to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": _pair_bucket(a, b), "a": a, "b": b,
            "cos": j.cos.to_numpy(np.float64),
            "h": j.h.to_numpy(np.int64),
            "size": j["size"].to_numpy(np.int64),
            "is_a": (j.doc.to_numpy(np.int64) == a).astype(np.int64)})

    # exchange B: per pair, intersect the two hash sets
    def jacc_kern(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g.h >= 0]
        both = (real.drop_duplicates(["a", "b", "h", "is_a"])
                .groupby(["a", "b", "h"])["is_a"].size())
        inter = (both[both == 2].reset_index()
                 .groupby(["a", "b"], as_index=False)["h"].size()
                 .rename(columns={"size": "i"}))
        sizes = (g.groupby(["a", "b", "is_a"], as_index=False)
                 .agg(sz=("size", "max"), cos=("cos", "max")))
        wide = sizes.pivot_table(index=["a", "b"], columns="is_a",
                                 values="sz", fill_value=0)
        wide.columns = [f"s{c}" for c in wide.columns]
        out = wide.reset_index()
        if "s0" not in out.columns:
            out["s0"] = np.int64(0)
        if "s1" not in out.columns:
            out["s1"] = np.int64(0)
        cosm = (sizes.groupby(["a", "b"], as_index=False)
                .agg(cos=("cos", "max")))
        out = out.merge(cosm, on=["a", "b"])
        out = out.merge(inter, on=["a", "b"], how="left")
        out["i"] = out["i"].fillna(0).astype(np.int64)
        den = out.s0.to_numpy(np.int64) + out.s1.to_numpy(np.int64) \
            - out.i.to_numpy(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(den > 0,
                           out.i.to_numpy(np.int64)
                           / np.maximum(den, 1), 0.0)
        return pd.DataFrame({
            "a": out.a.to_numpy(np.int64),
            "b": out.b.to_numpy(np.int64),
            "cos": out.cos.to_numpy(np.float64),
            "jaccard": round6(jac)})

    out = (pairs.union(docs)
           .groupby("bucket").map_groups(attach_kern,
                                         batch_format="pandas")
           .groupby("bucket").map_groups(jacc_kern,
                                         batch_format="pandas"))
    df = out.to_pandas()
    if "a" not in df.columns or not len(df):
        return empty
    df = df.sort_values("a", ignore_index=True)
    return pa.table({
        "doc_id": pa.array(df.a.to_numpy(np.int64), pa.int64()),
        "nbr_id": pa.array(df.b.to_numpy(np.int64), pa.int64()),
        "cos": pa.array(df.cos.to_numpy(np.float64), pa.float64()),
        "jaccard": pa.array(df.jaccard.to_numpy(np.float64),
                            pa.float64()),
    })


def sql_text_emb_consistency() -> str:
    knn = sql_knn_graph().strip().rstrip(";")
    return rf"""
WITH knn AS ({knn}),
p AS (SELECT vec_id AS a, nbr_id AS b, cos FROM knn WHERE rank = 1),
t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents),
g AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
      AS gram
  FROM t WHERE len(toks) >= {JACC_NGRAM}
),
sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, count(*)::BIGINT AS i
  FROM p
  JOIN g ga ON ga.doc_id = p.a
  JOIN g gb ON gb.doc_id = p.b AND gb.gram = ga.gram
  GROUP BY p.a, p.b
)
SELECT p.a AS doc_id, p.b AS nbr_id, p.cos,
       round(CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0)
                       - coalesce(i, 0) > 0
             THEN coalesce(i, 0)::DOUBLE
                  / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
                     - coalesce(i, 0))
             ELSE 0 END, 6) AS jaccard
FROM p
LEFT JOIN sz sa ON sa.doc_id = p.a
LEFT JOIN sz sb ON sb.doc_id = p.b
LEFT JOIN inter ON inter.a = p.a AND inter.b = p.b
ORDER BY doc_id
"""


QUERIES = {
    "text_emb_consistency": text_emb_consistency,
}

ORACLE_SQL = {
    "text_emb_consistency": sql_text_emb_consistency(),
}
