"""mmr_topk (Maximal Marginal Relevance diversified ranking):
independent brute-force equivalence on the sf fixture, and the
diversity property on a planted two-cluster corpus — near-identical
docs that BM25 ranks consecutively must interleave under MMR; docs
without an embedding row count as orthogonal."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.numutil import round6
from raysearch.pipelines import search_queries as SQ


def _brute_mmr(pool: pd.DataFrame, emb: dict) -> pd.DataFrame:
    """Straight-from-the-spec reference: plain Python loops, no shared
    code with the operator's vectorized kernel."""
    rows = []
    for qid in sorted(pool.query_id.unique()):
        g = pool[pool.query_id == qid].sort_values("rank")
        dids = g.doc_id.tolist()
        rel = g.score.to_numpy(np.float64)
        mx = rel.max()
        rel_n = [float(round6(r / mx)) if mx > 0 else 0.0 for r in rel]
        chosen = []
        avail = set(range(len(dids)))
        for rank in range(1, min(SQ.TOPK, len(dids)) + 1):
            best_i, best_s = None, None
            for i in sorted(avail):
                # per-pair sim: true cos if BOTH have embeddings else
                # 0 (orthogonal contract); max over chosen may be
                # NEGATIVE — no clamp in the spec
                sims = []
                vi = emb.get(dids[i])
                for j in chosen:
                    vj = emb.get(dids[j])
                    if vi is not None and vj is not None:
                        sims.append(float(round6(np.dot(vi, vj))))
                    else:
                        sims.append(0.0)
                ms = max(sims) if sims else 0.0
                s = float(round6(SQ.MMR_LAMBDA * rel_n[i]
                                 - (1 - SQ.MMR_LAMBDA) * ms))
                if best_s is None or s > best_s or \
                        (s == best_s and dids[i] < dids[best_i]):
                    best_i, best_s = i, s
            chosen.append(best_i)
            avail.remove(best_i)
            rows.append((qid, rank, dids[best_i], best_s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id",
                                       "mmr_score"])


def test_mmr_matches_bruteforce(ray_session):
    sf = "/root/testdata/sf0.001"
    eng = SQ.mmr_topk(sf).to_pandas()
    idx = SQ.cached_index(sf)
    pool = SQ.topk_rounded_for_index(
        idx, "bm25", rank_lo=1, rank_hi=SQ.MMR_POOL,
        buffer=2 * SQ.MMR_POOL).to_pandas()
    t = pq.read_table(os.path.join(sf, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    from raysearch.pipelines.similarity import _emb_matrix

    ids, mat = _emb_matrix(t)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    emb = {int(i): mat[j] for j, i in enumerate(ids)}
    ref = _brute_mmr(pool, emb)
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ref.reset_index(drop=True),
        check_dtype=False)


def test_mmr_diversifies_planted_clusters(ray_session, tmp_path):
    """10 docs, identical text (equal bm25), two embedding clusters
    (docs 0-4 = e0, docs 5-9 = e1, orthogonal). BM25 ties rank purely
    by doc_id (0,1,2,...); MMR must ALTERNATE clusters after the
    first pick. Doc 9 gets no embedding row -> orthogonal to all, so
    it behaves as its own singleton."""
    n = 10
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["hash join"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["t"] * n, pa.string()),
        "n_chars": pa.array([9] * n, pa.int64()),
    }), os.path.join(tmp_path, "documents.parquet"))
    dim = 4
    vecs = np.zeros((n - 1, dim))
    vecs[:5, 0] = 1.0        # cluster A: docs 0..4
    vecs[5:, 1] = 1.0        # cluster B: docs 5..8
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n - 1, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n - 1, np.int32), pa.int32()),
    }), os.path.join(tmp_path, "embeddings.parquet"))
    out = SQ.mmr_topk(str(tmp_path)).to_pandas()
    q0 = out[out.query_id == 0].sort_values("rank").doc_id.tolist()
    # pick 1: doc 0 (tie -> smallest id). pick 2: any cluster-A doc
    # now pays sim 1.0; cluster-B (doc 5) and the embedding-less doc 9
    # pay 0 -> doc 5 wins (smaller id). pick 3: both clusters covered,
    # doc 9 (orthogonal) wins over same-cluster repeats.
    assert q0[0] == 0
    assert q0[1] == 5
    assert q0[2] == 9
    # after both clusters are covered every remaining doc pays
    # maxsim 1.0 (sim to its own cluster's pick), so the tail is a
    # pure mmr tie resolved by doc_id ASC
    assert q0[3:] == [1, 2, 3, 4, 6, 7, 8]
