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


def test_norm_stats_constant_label(ray_session, tmp_path):
    # many identical vectors: s2/n - mean^2 cancels to ~0 with float
    # noise on both engines; the clip + round6 + (-0.0 -> +0.0)
    # normalizer must agree bit-for-bit
    sf = _emb(tmp_path, [[0.1, 0.2, 0.3]] * 50, labels=[4] * 50)
    eng = _parity(EB.emb_norm_stats, EB.sql_emb_norm_stats(), sf)
    assert eng.loc[0, "var_norm"] == 0.0
    assert eng.loc[0, "min_norm"] == eng.loc[0, "max_norm"]
