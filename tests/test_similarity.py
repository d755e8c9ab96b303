"""Similarity-search structure + recall: the LSH path is approximate by
design; verify it probes a small fraction of the data yet recovers a
meaningful share of the exact top-k on the testdata embeddings."""

import numpy as np
import pytest

from raysearch.pipelines import similarity as S

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact(ray_session):
    return S.ann_topk(SF).to_pandas()


def test_exact_topk_shape(exact):
    assert len(exact) == S.N_QUERY_VECS * S.TOPK
    for q in range(S.N_QUERY_VECS):
        sub = exact[exact.query_vec_id == q]
        assert sub["rank"].tolist() == list(range(1, S.TOPK + 1))
        # self-similarity = 1.0 must rank first
        assert sub.iloc[0].vec_id == q and sub.iloc[0].cos == 1.0
        # scores non-increasing
        assert (np.diff(sub.cos.to_numpy()) <= 0).all()


def test_lsh_recall(ray_session, exact):
    approx = S.ann_lsh(SF).to_pandas()
    recalls = []
    for q in range(S.N_QUERY_VECS):
        e = set(exact[exact.query_vec_id == q].vec_id)
        a = set(approx[approx.query_vec_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    mean = sum(recalls) / len(recalls)
    # margin-ordered multiprobe at the default depth scans
    # LSH_PROBES/256 ~ 9.4% of vectors; on structure-free random
    # embeddings that bounds recall well below 1, but it must beat the
    # scanned fraction by a wide margin (the hashes concentrate
    # direction; measured 0.5 at sf0.1, 24 probes)
    assert mean >= 0.35, recalls
    # and every query at least recovers itself
    for q in range(S.N_QUERY_VECS):
        assert q in set(approx[approx.query_vec_id == q].vec_id)


def test_embedding_dups_symmetric_threshold(ray_session):
    t = S.embedding_dups(SF).to_pandas()
    assert (t.vec_a < t.vec_b).all()
    assert (t.cos >= S.DUP_COS_THRESHOLD).all()


def test_ivf_recall_and_determinism(ray_session, exact):
    approx = S.ann_ivf(SF).to_pandas()
    recalls = []
    for q in range(S.N_QUERY_VECS):
        e = set(exact[exact.query_vec_id == q].vec_id)
        a = set(approx[approx.query_vec_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    mean = sum(recalls) / len(recalls)
    # nprobe/K = 4/16 scans ~25% of vectors; on structure-free random
    # embeddings recall is bounded well below 1 but must beat the
    # scanned fraction
    assert mean >= 0.35, recalls
    # every query recovers itself (its own cluster is always probed)
    for q in range(S.N_QUERY_VECS):
        assert q in set(approx[approx.query_vec_id == q].vec_id)
    # deterministic end to end (fixed seeds, fixed iterations, no RNG)
    again = S.ann_ivf(SF).to_pandas()
    assert again.equals(approx)


def test_ivf_centroids_unit_norm(ray_session):
    cents = S._ivf_train(SF)
    assert cents.shape == (S.IVF_CENTROIDS, 64)
    norms = np.linalg.norm(cents, axis=1)
    assert np.allclose(norms[norms > 0], 1.0)


def test_embedding_dups_multiblock_unsorted_ids(ray_session, tmp_path,
                                                monkeypatch):
    """Regression (round-3 ADVICE high): the off-diagonal block-pair
    kernel must not assume vec_ids are globally sorted across blocks.
    Build a corpus larger than the block size with ids written in
    DESCENDING order so every off-diagonal block pair has block-a ids
    strictly greater than block-b ids, and compare the distributed
    join with a driver-side brute force."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n, dim = 300, 8
    mat = rng.standard_normal((n, dim))
    # plant strong cross-block dups between far-apart ids
    for a, b in [(5, 280), (17, 251), (40, 299), (123, 260)]:
        mat[b] = mat[a] + rng.standard_normal(dim) * 0.01
    ids = np.arange(n, dtype=np.int64)[::-1].copy()  # descending order
    tbl = __import__("pyarrow").table({
        "vec_id": ids,
        "embedding": list(mat[ids].astype(np.float64)),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    monkeypatch.setattr(S, "DUP_BLOCK_ROWS", 64)  # force ~5 blocks

    got = S.embedding_dups(str(tmp_path)).to_pandas()

    from raysearch.numutil import round6
    bn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = round6(bn @ bn.T)
    ia, ib = np.nonzero(np.triu(sims >= S.DUP_COS_THRESHOLD, 1))
    want = sorted(zip(ia.tolist(), ib.tolist()))
    assert list(zip(got.vec_a, got.vec_b)) == want
    assert np.allclose(got.cos.to_numpy(), sims[ia, ib])


def test_embedding_dups_lsh_subset_and_recall(ray_session):
    """Bucketed variant: every reported pair is a TRUE pair (exact
    verification inside buckets => precision 1.0) and recall vs the
    exact block-pair join is meaningful for near-dup cosines."""
    exact_pairs = S.embedding_dups(SF).to_pandas()
    approx = S.embedding_dups_lsh(SF).to_pandas()
    ex = set(zip(exact_pairs.vec_a, exact_pairs.vec_b))
    ap = set(zip(approx.vec_a, approx.vec_b))
    assert ap <= ex  # precision 1.0 by construction
    # high-cosine pairs land in the same hyperplane bucket with high
    # probability: recall on cos >= 0.9 pairs must be strong
    hot = exact_pairs[exact_pairs.cos >= 0.9]
    if len(hot):
        hot_set = set(zip(hot.vec_a, hot.vec_b))
        rec = len(hot_set & ap) / len(hot_set)
        assert rec >= 0.5, rec


def test_embedding_dups_lsh_planted_near_dups(ray_session, tmp_path):
    """Multi-table retention on TRUE near-dups (the regime the
    operator optimizes; the fixture corpus has no cos >= 0.9 pairs):
    plant 40 near-identical pairs among random vectors and require
    the theoretical 1-(1-p^k)^L retention (~0.87 at cos ~0.95..0.99)
    within sampling slack, plus exact-verified cosines and no
    duplicate pairs across tables."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    n, dim, n_dup = 600, 16, 40
    mat = rng.standard_normal((n, dim))
    planted = []
    for i in range(n_dup):
        a, b = 2 * i, 2 * i + 1
        mat[b] = mat[a] + rng.standard_normal(dim) * 0.03
        planted.append((a, b))
    tbl = pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(mat.astype(np.float64)),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    got = S.embedding_dups_lsh(str(tmp_path)).to_pandas()
    assert not got.duplicated(["vec_a", "vec_b"]).any()
    bn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    hot = [(a, b) for a, b in planted if bn[a] @ bn[b] >= 0.9]
    found = set(zip(got.vec_a, got.vec_b))
    rec = len([p for p in hot if p in found]) / len(hot)
    assert rec >= 0.7, rec
    # reported cosines are exact (verified in-bucket)
    from raysearch.numutil import round6
    for _, r in got.iterrows():
        assert r.cos == round6(np.array(
            [bn[int(r.vec_a)] @ bn[int(r.vec_b)]]))[0]


def test_semdedup_precision_recall_determinism(ray_session):
    """SemDeDup: precision vs the exact pair table is 1.0 by
    construction (a flagged vector always has a real smaller-id
    neighbor at cos >= threshold inside its cluster); recall is
    bounded only by the cluster partition; fully deterministic."""
    got = S.semdedup(SF).to_pandas()
    again = S.semdedup(SF).to_pandas()
    assert again.equals(got)
    assert set(got.columns) == {"vec_id", "cluster_id", "is_dup",
                                "max_prior_cos"}
    exact = S.embedding_dups(SF).to_pandas()
    exact_dups = set(exact.vec_b)
    flagged = set(got[got.is_dup == 1].vec_id)
    assert flagged <= exact_dups                  # precision 1.0
    rec = len(flagged & exact_dups) / max(1, len(exact_dups))
    assert rec >= 0.3, rec                        # measured 0.37
    # flagged vectors' reported prior-cos clears the threshold
    f = got[got.is_dup == 1]
    assert (f.max_prior_cos >= S.SEMDEDUP_COS).all()


def test_semdedup_planted_identical(ray_session, tmp_path):
    """Exactly-identical vectors assign to the same cluster no matter
    what the centroids are, so byte-identical dups are ALWAYS caught
    (the property the cluster partition cannot break). Smallest id of
    each set survives."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    n, dim = 200, 8
    mat = rng.standard_normal((n, dim))
    twins = [(3, 150), (20, 199), (77, 130), (8, 9)]
    for a, b in twins:
        mat[b] = mat[a]
    tbl = pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(mat.astype(np.float64)),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    got = S.semdedup(str(tmp_path)).to_pandas().set_index("vec_id")
    for a, b in twins:
        assert got.loc[b, "is_dup"] == 1, (a, b)
        assert got.loc[b, "max_prior_cos"] == 1.0
        assert got.loc[a, "cluster_id"] == got.loc[b, "cluster_id"]
    # every vector appears exactly once
    assert len(got) == n


def test_embedding_pc1_matches_eigh(ray_session):
    """Distributed Gram-matrix PCA must match a single-process numpy
    eigendecomposition to the output rounding quantum, be end-to-end
    deterministic, and actually capture the top component (projection
    variance == top eigenvalue / n)."""
    import pyarrow.parquet as pq

    got = S.embedding_pc1(SF).to_pandas()
    again = S.embedding_pc1(SF).to_pandas()
    assert again.equals(got)

    tbl = pq.read_table(SF + "/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    c = mat - mat.mean(axis=0)
    w, V = np.linalg.eigh(c.T @ c)
    pc1 = V[:, -1]
    if pc1[int(np.argmax(np.abs(pc1)))] < 0:
        pc1 = -pc1
    import pandas as pd
    ref = pd.DataFrame({"vec_id": ids, "p": c @ pc1}).sort_values(
        "vec_id", ignore_index=True)
    err = np.abs(got.pc1_proj.to_numpy() - ref.p.to_numpy()).max()
    assert err < 1.0e-5, err
    # projections carry the top-eigenvalue variance
    var = got.pc1_proj.to_numpy().var() * len(got)
    assert abs(var - w[-1]) / w[-1] < 1.0e-3


def test_kmeans_clusters_deterministic_optimal(ray_session):
    """kmeans_clusters: same table twice -> identical assignment;
    every vector present exactly once; each row's cluster is the
    argmax (ties to smallest id) against the trainer's centroids and
    cos matches the recomputed rounded similarity."""
    import pyarrow.parquet as pq

    from raysearch.numutil import round6

    sf = "/root/testdata/sf0.001"
    a = S.kmeans_clusters(sf).to_pandas()
    b = S.kmeans_clusters(sf).to_pandas()
    assert a.equals(b)
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids, mat = S._emb_matrix(t)
    assert sorted(a.vec_id) == sorted(ids.tolist())
    cents = S._ivf_train(sf)
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = round6(n @ cents.T)
    cid = np.argmax(sims, axis=1)
    order = np.argsort(ids)
    assert (a.cluster_id.to_numpy() == cid[order]).all()
    assert np.array_equal(a.cos.to_numpy(),
                          sims[np.arange(len(cid)), cid][order])
