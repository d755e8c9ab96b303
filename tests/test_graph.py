"""pagerank_topk: the engine's fixed-point supersteps must match a
pure-numpy replay of the same contract (brute-force round6-cosine
k-NN edges -> integer PageRank), the composed DuckDB oracle, and
themselves under any bucket count — plus the N=1 degenerate corpus."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.numutil import round6
from raysearch.pipelines import graph as G
from raysearch.pipelines.knn import KNN_K


def _write_emb(tmp_path, vecs, ids=None):
    n = len(vecs)
    if ids is None:
        ids = 1000 + 7 * np.arange(n, dtype=np.int64)
    # descending file order stresses any ordering assumption
    order = np.argsort(ids)[::-1]
    pq.write_table(pa.table({
        "vec_id": pa.array(np.asarray(ids)[order], pa.int64()),
        "embedding": pa.array([[float(x) for x in vecs[i]]
                               for i in order],
                              pa.list_(pa.float32())),
        "label": pa.array((np.asarray(ids)[order] % 3).astype(np.int64),
                          pa.int64()),
    }), os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def _reference_pagerank(vecs, ids):
    """Brute-force replay of the documented contract in numpy/python
    ints: round6 cosines, top-k under (cos DESC, nbr ASC), fixed-point
    supersteps with floor division."""
    n = len(ids)
    m = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = round6(m @ m.T)
    order = np.argsort(ids)
    ids_s, sims = np.asarray(ids)[order], sims[np.ix_(order, order)]
    edges = []  # (src, dst)
    deg = {}
    for i in range(n):
        cand = [(-sims[i, j], ids_s[j]) for j in range(n) if j != i]
        cand.sort()
        nbrs = [c[1] for c in cand[:KNN_K]]
        deg[ids_s[i]] = len(nbrs)
        edges += [(int(ids_s[i]), int(d)) for d in nbrs]
    p = {int(v): G.PR_SCALE // n for v in ids_s}
    tele = (G.PR_SCALE * (G.PR_D_DEN - G.PR_D_NUM)) // (G.PR_D_DEN * n)
    for _ in range(G.PR_ITERS):
        new = {int(v): tele for v in ids_s}
        for s, d in edges:
            new[d] += (p[s] * G.PR_D_NUM) // (deg[s] * G.PR_D_DEN)
        p = new
    rows = sorted(p.items(), key=lambda kv: (-kv[1], kv[0]))[:G.PR_K]
    return pd.DataFrame({"vec_id": [r[0] for r in rows],
                         "p": [r[1] for r in rows]})


def test_pagerank_matches_reference(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    ids = 1000 + 7 * np.arange(40, dtype=np.int64)
    sf = _write_emb(tmp_path, vecs, ids)
    eng = G.pagerank_topk(sf).to_pandas()
    ref = _reference_pagerank(vecs, ids)
    pd.testing.assert_frame_equal(eng, ref, check_dtype=False)


def test_pagerank_oracle_parity(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    sf = _write_emb(tmp_path, rng.normal(size=(30, 6)))
    eng = G.pagerank_topk(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    ora = con.execute(G.sql_pagerank_topk()).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_pagerank_bucket_invariance(ray_session, tmp_path,
                                    monkeypatch):
    import raysearch.hashing as H

    rng = np.random.default_rng(3)
    sf = _write_emb(tmp_path, rng.normal(size=(25, 5)))
    out = {}
    for nb in (2, 8):
        monkeypatch.setattr(H, "auto_buckets", lambda *a, **k: nb)
        out[nb] = G.pagerank_topk(sf).to_pandas()
    pd.testing.assert_frame_equal(out[2], out[8])


def test_pagerank_single_vector(ray_session, tmp_path):
    sf = _write_emb(tmp_path, np.ones((1, 4)), ids=np.array([42]))
    df = G.pagerank_topk(sf).to_pandas()
    assert df.vec_id.tolist() == [42]
    tele = (G.PR_SCALE * (G.PR_D_DEN - G.PR_D_NUM)) // G.PR_D_DEN
    assert df.p.tolist() == [tele]


def test_label_prop_planted_clusters(ray_session, tmp_path):
    # two tight clusters; one node in each carries the WRONG label ->
    # after 2 majority rounds both adopt their cluster's label
    rng = np.random.default_rng(9)
    a = rng.normal(size=4)
    b = -a + rng.normal(scale=0.01, size=4)
    vecs = np.vstack([a + rng.normal(scale=0.01, size=(8, 4)),
                      b + rng.normal(scale=0.01, size=(8, 4))])
    ids = np.arange(16, dtype=np.int64) * 5 + 3
    sf = _write_emb(tmp_path, vecs, ids)
    # overwrite labels: cluster A -> 0 (one traitor 1), B -> 1 (one 0)
    t = pq.read_table(os.path.join(sf, "embeddings.parquet"))
    idx = {v: i for i, v in
           enumerate(t["vec_id"].to_numpy().tolist())}
    lab = np.zeros(16, dtype=np.int64)
    lab[[idx[int(i)] for i in ids[8:]]] = 1
    lab[idx[int(ids[0])]] = 1   # traitor in A
    lab[idx[int(ids[8])]] = 0   # traitor in B
    pq.write_table(pa.table({
        "vec_id": t["vec_id"],
        "embedding": t["embedding"],
        "label": pa.array(lab, pa.int64()),
    }), os.path.join(sf, "embeddings.parquet"))
    eng = G.label_prop(sf).to_pandas().set_index("vec_id")
    assert (eng.loc[list(map(int, ids[:8])), "label"] == 0).all()
    assert (eng.loc[list(map(int, ids[8:])), "label"] == 1).all()
    assert int(eng.changed.sum()) == 2
    # oracle parity on the same adversarial table
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    ora = con.execute(G.sql_label_prop()).df()
    pd.testing.assert_frame_equal(eng.reset_index(), ora,
                                  check_dtype=False)


def test_label_prop_bucket_invariance(ray_session, tmp_path,
                                      monkeypatch):
    import raysearch.hashing as H

    rng = np.random.default_rng(13)
    sf = _write_emb(tmp_path, rng.normal(size=(20, 5)))
    out = {}
    for nb in (2, 8):
        monkeypatch.setattr(H, "auto_buckets", lambda *a, **k: nb)
        out[nb] = G.label_prop(sf).to_pandas()
    pd.testing.assert_frame_equal(out[2], out[8])


def test_triangle_stats_complete_graph(ray_session, tmp_path):
    # N=4 with k=5 -> every node links every other: K4. Each node has
    # degree 3, 3 wedges, 3 closed triangles, clustering exactly 1.0
    rng = np.random.default_rng(21)
    sf = _write_emb(tmp_path, rng.normal(size=(4, 6)),
                    ids=np.array([9, 2, 30, 14]))
    eng = G.triangle_stats(sf).to_pandas()
    assert eng.vec_id.tolist() == [2, 9, 14, 30]
    assert eng.degree.tolist() == [3] * 4
    assert eng.n_triangles.tolist() == [3] * 4
    assert eng.clustering.tolist() == [1.0] * 4


def test_triangle_stats_matches_reference(ray_session, tmp_path):
    from itertools import combinations

    rng = np.random.default_rng(31)
    vecs = rng.normal(size=(30, 6))
    ids = 100 + 3 * np.arange(30, dtype=np.int64)
    sf = _write_emb(tmp_path, vecs, ids)
    eng = G.triangle_stats(sf).to_pandas()
    # reference: brute-force knn -> undirected edge set -> count
    m = vecs.astype(np.float32).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = round6(m @ m.T)
    und = set()
    adj = {int(v): set() for v in ids}
    for i in range(30):
        cand = sorted((-sims[i, j], int(ids[j]))
                      for j in range(30) if j != i)[:KNN_K]
        for _, nb in cand:
            und.add((min(int(ids[i]), nb), max(int(ids[i]), nb)))
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    for _, row in eng.iterrows():
        v = int(row.vec_id)
        nbrs = sorted(adj[v])
        tri = sum((min(x, y), max(x, y)) in und
                  for x, y in combinations(nbrs, 2))
        assert row.degree == len(nbrs)
        assert row.n_triangles == tri, v
    # oracle parity on the same table
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    ora = con.execute(G.sql_triangle_stats()).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_triangle_stats_bucket_invariance(ray_session, tmp_path,
                                          monkeypatch):
    import raysearch.hashing as H

    rng = np.random.default_rng(17)
    sf = _write_emb(tmp_path, rng.normal(size=(24, 5)))
    out = {}
    for nb in (2, 8):
        monkeypatch.setattr(H, "auto_buckets", lambda *a, **k: nb)
        out[nb] = G.triangle_stats(sf).to_pandas()
    pd.testing.assert_frame_equal(out[2], out[8])


def test_emb_quantize_exact_cases(ray_session, tmp_path):
    from raysearch.pipelines import quantize as Q

    # dim0 spans [0, 255] -> s = 1, codes = values, zero error;
    # dim1 is CONSTANT -> s = 1 by contract, codes 0, zero error
    vecs = np.array([[0.0, 7.0], [51.0, 7.0], [255.0, 7.0]])
    sf = _write_emb(tmp_path, vecs, ids=np.array([5, 1, 9]))
    eng = Q.emb_quantize(sf).to_pandas().set_index("vec_id")
    assert eng.loc[1, "code_sum"] == 51    # dim1 code 0
    assert eng.loc[5, "code_sum"] == 0
    assert eng.loc[9, "code_sum"] == 255
    assert (eng.max_abs_err == 0.0).all()
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    ora = con.execute(Q.sql_emb_quantize()).df()
    pd.testing.assert_frame_equal(eng.reset_index(), ora,
                                  check_dtype=False)


def test_emb_quantize_error_bound(ray_session, tmp_path):
    from raysearch.pipelines import quantize as Q

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(60, 5)).astype(np.float32)
    sf = _write_emb(tmp_path, vecs)
    eng = Q.emb_quantize(sf).to_pandas()
    m = vecs.astype(np.float64)
    s = (m.max(axis=0) - m.min(axis=0)) / 255.0
    # affine quantization error is at most half a step per dim
    assert eng.max_abs_err.max() <= s.max() / 2 + 1e-9


def test_text_emb_consistency_planted(ray_session, tmp_path):
    """Cross-modal audit vs oracle: twin docs with twin vectors must
    pair up with jaccard 1.0; a corrupted row (identical vector,
    unrelated text) must surface with jaccard ~0; gram-less (short)
    texts get jaccard 0 without crashing."""
    from raysearch.pipelines import crossmodal as X

    rng = np.random.default_rng(41)
    base = rng.normal(size=(4, 6))
    # ids 0/1: twin vectors + twin texts -> consistent pair
    # ids 2/3: twin vectors, UNRELATED texts -> corruption fingerprint
    # ids 4/5: distinct vectors; id 5's text is too short for 3-grams
    vecs = np.vstack([base[0], base[0] + 1e-6,
                      base[1], base[1] + 1e-6,
                      base[2], base[3]])
    ids = np.arange(6, dtype=np.int64)
    _write_emb(tmp_path, vecs, ids)
    texts = ["alpha beta gamma delta epsilon",
             "alpha beta gamma delta epsilon",
             "alpha beta gamma delta epsilon",
             "completely different words entirely here",
             "some middling text goes here now",
             "too short"]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["t"] * 6, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(tmp_path, "documents.parquet"))
    eng = X.text_emb_consistency(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    ora = con.execute(X.sql_text_emb_consistency()).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=True)
    byid = eng.set_index("doc_id")
    assert byid.loc[0, "nbr_id"] == 1 and byid.loc[0, "jaccard"] == 1.0
    assert byid.loc[2, "nbr_id"] == 3 and byid.loc[2, "jaccard"] == 0.0
    assert byid.loc[5, "jaccard"] == 0.0   # gram-less side
