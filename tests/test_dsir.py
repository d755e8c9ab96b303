"""dsir_weights: oracle parity on adversarial inputs + the
discrimination property (target-language docs score higher per
bigram than off-target docs)."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_docs(path, rows):
    langs, texts = zip(*rows)
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
        "lang": pa.array(list(langs), pa.string()),
        "source": pa.array(["t"] * len(rows)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return str(path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(sql).df()


ROWS = [
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("en", "the quick brown fox runs fast today"),
    ("en", "quick brown animals jump over lazy dogs"),
    ("de", "der schnelle braune fuchs springt heute"),
    ("de", "der faule hund schlaeft den ganzen tag"),
    ("fr", "le renard brun rapide saute par dessus"),
    ("en", "single"),       # 1 token: no bigrams, excluded both sides
    ("en", ""),             # empty: excluded
    ("de", "   "),          # whitespace-only: excluded
    ("en", "THE  Quick   Brown fox"),  # casing + multi-space
]


def test_dsir_adversarial_parity(ray_session, tmp_path):
    from raysearch.pipelines.dsir import ORACLE_SQL, dsir_weights

    d = _write_docs(tmp_path, ROWS)
    eng = dsir_weights(d).to_pandas()
    ora = _oracle(d, ORACLE_SQL["dsir_weights"])
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()),
        check_exact=True)
    # bigram-less docs excluded
    assert set(eng.doc_id) == {0, 1, 2, 3, 4, 5, 9}


def test_dsir_discriminates(ray_session, tmp_path):
    from raysearch.pipelines.dsir import dsir_weights

    d = _write_docs(tmp_path, ROWS)
    eng = dsir_weights(d).to_pandas()
    per = (eng.set_index("doc_id").dsir_logratio
           / eng.set_index("doc_id").n_bigrams)
    en_mean = per.loc[[0, 1, 2, 9]].mean()
    off_mean = per.loc[[3, 4, 5]].mean()
    assert en_mean > off_mean


def test_dsir_resample_parity_and_bias(ray_session, tmp_path):
    from raysearch.pipelines.dsir import (dsir_resample,
                                          sql_dsir_resample)

    d = _write_docs(tmp_path, ROWS * 3)  # enough docs to sample from
    # NOTE: doc_ids must be unique — rebuild with fresh ids
    import pyarrow.parquet as pq2
    t = pq2.read_table(os.path.join(d, "documents.parquet"))
    t = t.set_column(0, "doc_id",
                     pa.array(range(t.num_rows), pa.int64()))
    pq2.write_table(t, os.path.join(d, "documents.parquet"))
    eng = dsir_resample(d).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.execute(sql_dsir_resample()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    # deterministic across runs
    again = dsir_resample(d).to_pandas()
    pd.testing.assert_frame_equal(eng, again)
    # ranked by sample_key descending
    assert (eng.sample_key.to_numpy()[:-1]
            >= eng.sample_key.to_numpy()[1:]).all()
