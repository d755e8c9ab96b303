"""knn.py: DuckDB parity on adversarial synthetic embeddings —
multi-block partial merges with UNSORTED vec_ids across blocks,
identical vectors (cos ties broken by nbr_id), vote ties (smallest
label wins), self-exclusion — plus bucket/block-size invariance."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import knn as K


def _write_emb(tmp_path, ids, mat, labels):
    tbl = pa.table({
        "vec_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(np.asarray(labels, np.int32), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"),
                   row_group_size=50)
    return str(tmp_path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    return con.execute(sql).df()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


def _parity(sf, fn, sql):
    eng = _norm(fn(sf).to_pandas())
    ora = _norm(_oracle(sf, sql))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    return eng


def _fixture(tmp_path, n=120, dim=6, seed=7):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    # plant identical-vector runs (cos == 1 ties at the rank boundary)
    mat[10] = mat[11] = mat[12] = mat[13] = mat[14] = mat[15]
    labels = rng.integers(0, 3, n)
    # DESCENDING ids: block 2's ids all smaller than block 1's — the
    # off-diagonal order trap (ADVICE round-2 high item on dups)
    ids = np.arange(n)[::-1]
    return _write_emb(tmp_path, ids, mat, labels)


def test_knn_graph_multiblock_unsorted(ray_session, tmp_path,
                                       monkeypatch):
    monkeypatch.setattr(K, "DUP_BLOCK_ROWS", 32)  # forces 4 blocks
    sf = _fixture(tmp_path)
    eng = _parity(sf, K.knn_graph, K.sql_knn_graph())
    # every vector present, exactly K neighbors, no self-edges
    df = K.knn_graph(sf).to_pandas()
    assert (df.groupby("vec_id").size() == K.KNN_K).all()
    assert (df.vec_id != df.nbr_id).all()
    # identical vectors rank each other first, smallest nbr_id first:
    # rows 10..15 share one vector and ids are reversed (row i has
    # vec_id 119-i), so vec_id 109's partners are 104..108
    ident = df[df.vec_id == 109].iloc[0]
    assert ident.nbr_id == 104 and round(ident.cos, 6) == 1.0


def test_knn_label_eval_vote_ties(ray_session, tmp_path, monkeypatch):
    monkeypatch.setattr(K, "DUP_BLOCK_ROWS", 32)
    sf = _fixture(tmp_path)
    eng = _parity(sf, K.knn_label_eval, K.sql_knn_label_eval())
    # one prediction per vector total
    assert eng.n.sum() == 120


def test_knn_tiny_table(ray_session, tmp_path):
    # n - 1 < KNN_K: every other vector is a neighbor; parity holds
    rng = np.random.default_rng(3)
    sf = _write_emb(tmp_path, [5, 1, 9], rng.standard_normal((3, 4)),
                    [0, 1, 0])
    eng = _parity(sf, K.knn_graph, K.sql_knn_graph())
    assert len(eng) == 3 * 2
    _parity(sf, K.knn_label_eval, K.sql_knn_label_eval())


def test_knn_bucket_invariance(ray_session, tmp_path, monkeypatch):
    sf = _fixture(tmp_path, n=80)
    results = {}
    for nb in (2, 64):
        monkeypatch.setattr("raysearch.hashing.auto_buckets",
                            lambda n, _nb=nb, **kw: _nb)
        results[nb] = (_norm(K.knn_graph(sf).to_pandas()),
                       _norm(K.knn_label_eval(sf).to_pandas()))
    pd.testing.assert_frame_equal(results[2][0], results[64][0])
    pd.testing.assert_frame_equal(results[2][1], results[64][1])


def test_knn_backbone_validation():
    import pytest

    with pytest.raises(ValueError):
        K._backbone("bogus")
    assert K._backbone(None) == "exact"
    assert K._backbone("ivf") == "ivf"


def test_knn_ivf_backbone_recall(ray_session):
    """Round-4 gate: ivf-mode 1-NN edge recall >= 0.9 vs the exact
    backbone at sf0.01 (the driver-scale table). Also asserts the
    schema contract: both backbones emit identical columns/dtypes."""
    sf = "/root/testdata/sf0.01"
    ex = K.knn_graph(sf).to_pandas()
    ap = K.knn_graph(sf, backbone="ivf").to_pandas()
    assert list(ex.columns) == list(ap.columns)
    assert [str(t) for t in ex.dtypes] == [str(t) for t in ap.dtypes]
    # every vector still gets a full top-k row set
    assert ap.groupby("vec_id")["rank"].max().eq(K.KNN_K).all()
    e1 = set(map(tuple, ex[ex["rank"] == 1][["vec_id", "nbr_id"]]
                 .values.tolist()))
    a1 = set(map(tuple, ap[ap["rank"] == 1][["vec_id", "nbr_id"]]
                 .values.tolist()))
    recall = len(e1 & a1) / max(len(e1), 1)
    assert recall >= 0.9, f"ivf 1-NN edge recall {recall:.3f} < 0.9"


def test_knn_ivf_env_switch_consumers(ray_session, monkeypatch):
    """The RAYSEARCH_KNN_BACKBONE env switch reaches the fan-out's
    consumers: pagerank/label_prop produce well-formed node tables
    on the ivf backbone (values are approximate by contract)."""
    from raysearch.pipelines.graph import label_prop, pagerank_topk

    sf = "/root/testdata/sf0.001"
    monkeypatch.setenv("RAYSEARCH_KNN_BACKBONE", "ivf")
    pr = pagerank_topk(sf).to_pandas()
    assert len(pr) == 20 and pr.p.gt(0).all()
    lp = label_prop(sf).to_pandas()
    assert len(lp) == 500
    assert (lp.changed == (lp.label != lp.label0).astype(int)).all()


def test_ivf_backbone_param_consumers(ray_session):
    """The explicit backbone= parameter (round-4: threaded through
    every consumer, not just the env switch) produces schema-identical
    tables on all four graph/crossmodal consumers, and the two
    metric-style consumers stay close to exact at the driver-scale
    table: knn_label_eval accuracy within 0.05, text_emb_consistency
    1-NN agreement >= 0.85 (measured 0.008 / 0.926 at sf0.01 on the
    adversarial near-uniform embeddings)."""
    from raysearch.pipelines.crossmodal import text_emb_consistency
    from raysearch.pipelines.graph import (
        label_prop,
        pagerank_topk,
        triangle_stats,
    )

    sf = "/root/testdata/sf0.001"
    for fn in (pagerank_topk, label_prop, triangle_stats):
        ex, ap = fn(sf).to_pandas(), fn(sf, backbone="ivf").to_pandas()
        assert list(ex.columns) == list(ap.columns)
        assert [str(t) for t in ex.dtypes] == [str(t) for t in ap.dtypes]
        assert len(ap) > 0

    sf = "/root/testdata/sf0.01"

    def acc(cm):
        return float(cm[cm.true_label == cm.pred_label].n.sum()
                     / max(cm.n.sum(), 1))

    d = abs(acc(K.knn_label_eval(sf).to_pandas())
            - acc(K.knn_label_eval(sf, backbone="ivf").to_pandas()))
    assert d <= 0.05, f"ivf knn_label_eval accuracy delta {d:.4f}"

    ce = text_emb_consistency(sf).to_pandas().set_index("doc_id")
    ci = (text_emb_consistency(sf, backbone="ivf").to_pandas()
          .set_index("doc_id"))
    j = ce.join(ci, rsuffix="_ivf", how="inner")
    agree = float((j.nbr_id == j.nbr_id_ivf).mean())
    assert agree >= 0.85, f"ivf 1-NN agreement {agree:.3f}"
