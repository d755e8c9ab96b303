"""embstats operators (label_centroids, emb_norm_stats):
adversarial-edge parity vs their DuckDB oracles — zero vectors,
single-member labels, constant-norm labels (exact-zero variance /
the -0.0 normalizer), negative components, non-contiguous labels."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import embstats as EB


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


def _emb(tmp_path, vecs, labels):
    n = len(vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([np.asarray(v, np.float32) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def _parity(fn, sql, sf):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    eng = _norm(fn(sf).to_pandas())
    ora = _norm(con.execute(sql).df())
    assert [str(t) for t in eng.dtypes] == [str(t) for t in ora.dtypes]
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)
    return eng


def test_centroids_adversarial(ray_session, tmp_path):
    sf = _emb(tmp_path, [
        [0.0, 0.0, 0.0],        # zero vector
        [1.0, -2.0, 3.0],       # negatives
        [1.0, -2.0, 3.0],
        [-1.0, 2.0, -3.0],      # cancels with the two above per dim?
        [0.5, 0.5, 0.5],        # lone label 7 (non-contiguous)
    ], labels=[0, 0, 0, 0, 7])
    eng = _parity(EB.label_centroids, EB.sql_label_centroids(), sf)
    assert len(eng) == 6        # 2 labels x 3 dims
    l0 = eng[eng.label == 0].set_index("pos")
    # dim 0: (0 + 1 + 1 - 1) / 4 = 0.25
    assert l0.loc[0, "mean"] == 0.25 and l0.loc[0, "n"] == 4
    assert l0.loc[1, "mean"] == -0.5
    l7 = eng[eng.label == 7].set_index("pos")
    assert (l7["mean"] == 0.5).all() and (l7["n"] == 1).all()


def test_norm_stats_adversarial(ray_session, tmp_path):
    sf = _emb(tmp_path, [
        [0.0, 0.0],             # norm 0
        [3.0, 4.0],             # norm 5
        [-3.0, -4.0],           # norm 5 (sign-invariant)
        [1.0, 0.0],             # lone label: var exactly 0
    ], labels=[1, 1, 1, 2])
    eng = _parity(EB.emb_norm_stats, EB.sql_emb_norm_stats(), sf)
    l1 = eng[eng.label == 1].iloc[0]
    assert l1["n"] == 3
    assert l1["min_norm"] == 0.0 and l1["max_norm"] == 5.0
    # mean 10/3, var = (0 + 25 + 25)/3 - (10/3)^2 = 50/9
    assert abs(l1["mean_norm"] - round(10 / 3, 6)) <= 1e-9
    assert abs(l1["var_norm"] - round(50 / 9, 6)) <= 1e-6
    l2 = eng[eng.label == 2].iloc[0]
    # single member: variance must be EXACTLY +0.0, not -0.0 noise
    assert l2["var_norm"] == 0.0
    assert str(l2["var_norm"]) == "0.0"
    assert l2["min_norm"] == l2["max_norm"] == 1.0


def test_hard_negatives_adversarial(ray_session, tmp_path):
    # query 0 (label 1, pointing +x). Same-label vectors are NEVER
    # negatives however close; the nearest other-label vector wins;
    # exact-tie cosines rank by vec_id.
    sf = _emb(tmp_path, [
        [1.0, 0.0],             # vec 0 = query, label 1
        [2.0, 0.0],             # same label, cos 1.0 -> excluded
        [1.0, 0.1],             # label 2, very close
        [0.0, 1.0],             # label 2, orthogonal
        [1.0, -0.1],            # label 3, tie with vec 2 by symmetry
        [-1.0, 0.0],            # label 3, opposite
    ], labels=[1, 1, 2, 2, 3, 3])
    eng = _parity(EB.hard_negatives, EB.sql_hard_negatives(), sf)
    q0 = eng[eng.query_vec_id == 0].sort_values("rank")
    assert 1 not in set(q0.vec_id)          # same-label excluded
    # ranks: tie between 2 and 4 at cos(1, 0.1) -> vec_id order
    assert q0.vec_id.tolist() == [2, 4, 3, 5]
    assert q0.iloc[0]["cos"] == q0.iloc[1]["cos"]


def test_hard_negatives_no_negative_exists(ray_session, tmp_path):
    # single-label corpus: a query has NO valid negative -> no rows
    sf = _emb(tmp_path, [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
              labels=[5, 5, 5])
    eng = _parity(EB.hard_negatives, EB.sql_hard_negatives(), sf)
    assert len(eng) == 0


def test_emb_outliers_adversarial(ray_session, tmp_path):
    # label 1: centroid (1, 0); vec 2 farthest; exact ties between
    # vecs 0 and 1 (symmetric about the centroid) rank by vec_id.
    # label 9: single member -> dist exactly 0, still reported.
    sf = _emb(tmp_path, [
        [0.0, 0.0],             # dist 1 from centroid
        [2.0, 0.0],             # dist 1 (tie with vec 0)
        [1.0, 3.0],             # dist 3 -> rank 1
        [1.0, -3.0],            # dist 3 -> tie with vec 2
        [7.0, 7.0],             # lone label 9
    ], labels=[1, 1, 1, 1, 9])
    eng = _parity(EB.emb_outliers, EB.sql_emb_outliers(), sf)
    l1 = eng[eng.label == 1].sort_values("rank")
    assert len(l1) == 3                     # top-3 of 4 members
    assert l1.vec_id.tolist() == [2, 3, 0]  # ties by vec_id, then 0<1
    assert l1.dist.tolist()[:2] == [3.0, 3.0]
    l9 = eng[eng.label == 9].iloc[0]
    assert l9["dist"] == 0.0 and l9["vec_id"] == 4
    assert str(l9["dist"]) == "0.0"         # -0.0 normalized


def test_norm_stats_constant_label(ray_session, tmp_path):
    # many identical vectors: s2/n - mean^2 cancels to ~0 with float
    # noise on both engines; the clip + round6 + (-0.0 -> +0.0)
    # normalizer must agree bit-for-bit
    sf = _emb(tmp_path, [[0.1, 0.2, 0.3]] * 50, labels=[4] * 50)
    eng = _parity(EB.emb_norm_stats, EB.sql_emb_norm_stats(), sf)
    assert eng.loc[0, "var_norm"] == 0.0
    assert eng.loc[0, "min_norm"] == eng.loc[0, "max_norm"]
