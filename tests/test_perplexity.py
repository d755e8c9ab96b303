"""perplexity_buckets: oracle parity on adversarial synthetic corpora
— tied scores at the tertile threshold, single-sample languages, a
language with no sampled docs (everything 'tail'), docs with < 2
tokens excluded — plus determinism."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import perplexity as P


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text, lang)"""
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["t"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _parity(sf):
    eng = P.perplexity_buckets(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(P.sql_perplexity_buckets()).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=True)
    return eng


def test_ties_and_short_docs(ray_session, tmp_path):
    # identical docs score identically -> tertile thresholds fall ON
    # tied values; docs 90/91 have < 2 tokens -> no score row at all
    rows = ([(i, "alpha beta gamma", "en") for i in range(10)]
            + [(10 + i, "alpha alpha alpha alpha", "en")
               for i in range(10)]
            + [(20 + i, "beta gamma delta epsilon zeta", "en")
               for i in range(10)]
            + [(90, "single", "en"), (91, "", "en")])
    sf = _write_docs(tmp_path, rows)
    eng = _parity(sf)
    assert set(eng.doc_id) == set(range(30))  # 90/91 excluded
    # identical texts must share one bucket
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        sub = eng[(eng.doc_id >= lo) & (eng.doc_id < hi)]
        assert sub.bucket.nunique() == 1


def test_unsampled_language_all_tail(ray_session, tmp_path,
                                     monkeypatch):
    monkeypatch.setattr(P, "PPLB_RATE_MAX", 0.0)
    rows = [(i, f"tok{i} tok{i + 1} tok{i + 2}", "en")
            for i in range(8)]
    sf = _write_docs(tmp_path, rows)
    eng = _parity(sf)
    assert (eng.bucket == "tail").all()


def test_mixed_langs_and_determinism(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(60):
        lang = ["en", "zh", "rare"][0 if i < 40 else (1 if i < 58
                                                      else 2)]
        text = " ".join(rng.choice(vocab,
                                   size=rng.integers(2, 9)))
        rows.append((1000 + 3 * i, text, lang))
    sf = _write_docs(tmp_path, rows)
    eng = _parity(sf)
    eng2 = P.perplexity_buckets(sf).to_pandas()
    pd.testing.assert_frame_equal(eng, eng2)
    assert set(eng.lang) == {"en", "zh", "rare"}
