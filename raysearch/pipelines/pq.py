"""Product-quantization ANN (Jégou et al., PAMI 2011): compress each
(normalized) embedding into M sub-space code ids and answer top-k by
asymmetric distance computation (ADC) — per query, an (M x K) table
of exact sub-distances to every codebook entry, so a candidate's
approximate distance is M table lookups + a sum instead of a dim-wide
dot product.

Why this is the 100 TB memory path: at M=8 sub-spaces the code layout
is 8 bytes/vector vs 256 bytes of float32 — a 32x cut, letting a
worker hold ~30M codes per GiB. Here codes are recomputed per batch
from the broadcast codebooks (the fixtures are small and the engine
never materializes derived state it can recompute in one pass); the
deployment shape is encode-once into a codes column next to vec_id
and scan THAT at query time — same kernels, same result.

Determinism contract (no RNG anywhere): codebook seeds are the first
K vectors' sub-vectors in vec_id order; PQ_LLOYD_ITERS fixed Lloyd
rounds whose assign step is map-side combiner partials (per
(subspace, code) sum + count rows; the driver fsum-reduces M x K
rows, exactly-rounded so block arrival order cannot perturb
centroids). Approximate by construction -> registered rows-only (no
SQL oracle; the iterative trainer is not SQL-expressible); recall
vs the exact ann_topk contract is gated in pytest and measured in
the bench quality block.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from raysearch.numutil import round6

PQ_M = 8            # sub-spaces (dim 64 -> 8-dim sub-vectors)
PQ_CODES = 16       # codebook entries per sub-space (4-bit codes)
PQ_LLOYD_ITERS = 2  # fixed Lloyd rounds (determinism over polish)
_EMB = "embeddings.parquet"


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(
        np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _pq_train(sf_dir: str) -> np.ndarray:
    """(PQ_M, K, subdim) codebooks over NORMALIZED vectors. K may be
    < PQ_CODES on tiny corpora (fewer than PQ_CODES seed vectors) —
    every downstream shape derives from the returned K."""
    import math

    import pyarrow.parquet as pq_
    import ray
    import ray.data

    from raysearch.pipelines.similarity import _emb_matrix, _read_emb

    seed_tbl = pq_.read_table(os.path.join(sf_dir, _EMB),
                              columns=["vec_id", "embedding"],
                              filters=[("vec_id", "<", PQ_CODES)])
    ids, mat = _emb_matrix(seed_tbl)
    order = np.argsort(ids)
    seeds = _norm_rows(mat[order])
    K = len(seeds)
    dim = seeds.shape[1]
    if dim % PQ_M:
        raise ValueError(f"dim {dim} not divisible by PQ_M={PQ_M}")
    sub = dim // PQ_M
    # (M, K, sub): subspace m's codebook seeded from the same K rows
    books = np.stack([seeds[:, m * sub:(m + 1) * sub]
                      for m in range(PQ_M)])

    for _ in range(PQ_LLOYD_ITERS):
        bref = ray.put(books)

        def partials(batch: pa.Table) -> pa.Table:
            bk = ray.get(bref)
            _, bmat = _emb_matrix(batch)
            x = _norm_rows(bmat)
            ms, cs, ns, vs = [], [], [], []
            for m in range(PQ_M):
                xm = x[:, m * sub:(m + 1) * sub]
                # argmin ||x - c||^2 = argmax (x.c - ||c||^2 / 2)
                aff = xm @ bk[m].T - 0.5 * (bk[m] ** 2).sum(1)
                assign = np.argmax(aff, axis=1)
                sums = np.zeros((len(bk[m]), sub))
                np.add.at(sums, assign, xm)
                counts = np.bincount(assign, minlength=len(bk[m]))
                nz = np.flatnonzero(counts)
                ms.append(np.full(len(nz), m, np.int64))
                cs.append(nz.astype(np.int64))
                ns.append(counts[nz].astype(np.int64))
                vs.extend(list(sums[nz]))
            return pa.table({
                "m": pa.array(np.concatenate(ms), pa.int64()),
                "cid": pa.array(np.concatenate(cs), pa.int64()),
                "n": pa.array(np.concatenate(ns), pa.int64()),
                "vsum": pa.array(vs, pa.list_(pa.float64()))})

        agg = pa.concat_tables(
            _read_emb(sf_dir)
            .map_batches(partials, batch_format="pyarrow",
                         zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow"))
        mm = agg["m"].to_numpy()
        cc = agg["cid"].to_numpy()
        nn = agg["n"].to_numpy()
        vv = (np.array(agg["vsum"].to_pylist())
              if agg.num_rows else np.zeros((0, sub)))
        new = books.copy()
        for m in range(PQ_M):
            sel = mm == m
            counts = np.bincount(cc[sel], weights=nn[sel],
                                 minlength=K).astype(np.int64)
            for c in np.unique(cc[sel]):
                rows = sel & (cc == c)
                # exactly-rounded reduce: block order can't move floats
                new[m, c] = np.array(
                    [math.fsum(vv[rows, d]) for d in range(sub)]
                ) / counts[c]
        books = new
    return books


PQ_RERANK = 100  # ADC shortlist depth re-ranked with exact distances


def pq_topk(sf_dir: str) -> pa.Table:
    """PQ + exact re-rank top-10 for query vectors vec_id 0..4 (the
    exact ann_topk contract's query set, same output schema): the code
    scan ranks every vector by ADC-approximated squared L2 (monotone
    in cosine on normalized vectors), keeps a per-batch shortlist, the
    driver merges to a global ADC top-{R} per query, and ONE
    predicate-pushdown read of those <= R x |queries| raw vectors
    re-ranks them with exact cosine — the standard ADC+R cascade
    (Jégou et al. §V), so the full-precision table is touched only
    k-bounded. Final rank by (round6(cos) desc, vec_id), directly
    comparable to ann_topk. Recall is gated in pytest; on clustered
    (real-corpus-shaped) embeddings the shortlist covers the true
    top-k with large margin — the near-uniform fixtures here are PQ's
    adversarial case and the measured-regardless honest number."""
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray
    import ray.data

    from raysearch.pipelines.similarity import (TOPK, _emb_matrix,
                                                _query_vectors,
                                                _read_emb)

    books = _pq_train(sf_dir)
    sub = books.shape[2]
    qids, qmat = _query_vectors(sf_dir)
    qn = _norm_rows(qmat)
    # per-query ADC tables: dtab[j, m, c] = ||q_m - book[m, c]||^2
    dtab = np.stack([
        ((qn[:, m * sub:(m + 1) * sub][:, None, :] -
          books[m][None, :, :]) ** 2).sum(-1)
        for m in range(books.shape[0])], axis=1)
    bref = ray.put(books)
    tref = ray.put(dtab)

    def score(batch: pa.Table) -> pa.Table:
        bk, dt = ray.get(bref), ray.get(tref)
        ids, bmat = _emb_matrix(batch)
        x = _norm_rows(bmat)
        M, K, s = bk.shape
        adist = np.zeros((len(ids), len(qids)))
        for m in range(M):
            xm = x[:, m * s:(m + 1) * s]
            aff = xm @ bk[m].T - 0.5 * (bk[m] ** 2).sum(1)
            codes = np.argmax(aff, axis=1)
            adist += dt[:, m, codes].T        # (n, Q)
        out_q, out_v, out_d = [], [], []
        for j, qid in enumerate(qids):
            col = adist[:, j]
            kk = min(PQ_RERANK, len(ids))
            top = np.argpartition(col, kk - 1)[:kk]
            out_q.extend([int(qid)] * kk)
            out_v.extend(int(v) for v in ids[top])
            out_d.extend(float(v) for v in col[top])
        return pa.table({
            "query_vec_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "adist": pa.array(out_d, pa.float64())})

    ds = _read_emb(sf_dir).map_batches(score, batch_format="pyarrow",
                                       zero_copy_batch=True)
    cand = pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow")).to_pandas()
    # global ADC shortlist per query (deterministic: adist, vec_id)
    cand = cand.sort_values(["query_vec_id", "adist", "vec_id"],
                            ascending=[True, True, True])
    cand = cand.groupby("query_vec_id").head(PQ_RERANK)

    # exact re-rank: one narrow filtered read of the shortlist vectors
    short_ids = np.unique(cand.vec_id.to_numpy(np.int64))
    raw = pq_.read_table(os.path.join(sf_dir, _EMB),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "in", short_ids.tolist())])
    rids, rmat = _emb_matrix(raw)
    rn = _norm_rows(rmat)
    pos = {int(v): i for i, v in enumerate(rids)}
    rows = np.asarray([pos[int(v)] for v in cand.vec_id], np.int64)
    qrow = {int(q): j for j, q in enumerate(qids)}
    qsel = np.asarray([qrow[int(v)] for v in cand.query_vec_id],
                      np.int64)
    cand = cand.assign(cos=round6(
        (rn[rows] * qn[qsel]).sum(axis=1)))
    cand = cand.sort_values(["query_vec_id", "cos", "vec_id"],
                            ascending=[True, False, True])
    cand["rank"] = cand.groupby("query_vec_id").cumcount() + 1
    cand = cand[cand["rank"] <= TOPK]
    return pa.table({
        "query_vec_id": pa.array(cand.query_vec_id.to_numpy(np.int64),
                                 pa.int64()),
        "vec_id": pa.array(cand.vec_id.to_numpy(np.int64), pa.int64()),
        "rank": pa.array(cand["rank"].to_numpy(np.int64), pa.int64()),
        "cos": pa.array(cand.cos.to_numpy(np.float64), pa.float64()),
    })


QUERIES = {"pq_topk": pq_topk}
ORACLE_SQL: dict[str, str] = {}  # approximate by construction:
# iterative k-means trainer; recall vs exact ann_topk gated in pytest
# (tests/test_pq.py) and measured in the bench quality block
