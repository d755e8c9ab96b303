"""wildcard.py: index-backed prefix retrieval + autocomplete — oracle
parity on adversarial vocabularies (terms exactly equal to the
prefix, terms straddling the range upper bound, punctuation-attached
token variants, case folding, df tie-breaks) plus the miss path."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raysearch.pipelines import wildcard as W


def _write_docs(path, texts):
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return str(path)


def _parity(d, fn, sql):
    eng = fn(d).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.execute(sql).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    return eng


def test_wildcard_adversarial(ray_session, tmp_path, monkeypatch):
    monkeypatch.setattr(W, "PREFIXES", ("s", "sp", "zz"))
    d = _write_docs(tmp_path, [
        "s alone is a term",              # 0: term == prefix exactly
        "spark matches s AND sp",         # 1: nested prefixes overlap
        "spark, punctuation variant",     # 2: 'spark,' still prefix-s
        "SPARK uppercase folds",          # 3: case folding
        "szz last in the s-range",        # 4: upper-bound straddle
        "t just above the range",         # 5: no hit
        "",                               # 6: empty
    ])
    eng = _parity(d, W.wildcard_docs, W.sql_wildcard_docs())
    by = eng.set_index(["prefix", "doc_id"]).n_terms
    assert by.loc[("s", 0)] == 1      # the bare term 's' itself
    assert by.loc[("s", 1)] == 3      # 'spark' + bare 's' + bare 'sp'
    assert not (eng.prefix == "zz").any()
    assert set(eng[eng.prefix == "sp"].doc_id) == {1, 2, 3}
    # doc 4's 'szz' counted under 's' but not 'sp'
    assert ("s", 4) in by.index and ("sp", 4) not in by.index


def test_term_suggest_ties_and_k(ray_session, tmp_path, monkeypatch):
    monkeypatch.setattr(W, "PREFIXES", ("w", "zz"))
    monkeypatch.setattr(W, "SUGGEST_K", 3)
    # w-terms: wa (df 2), wb (df 2), wc (df 2), wd (df 1) -> ties
    # broken by term asc; k=3 truncates wd
    d = _write_docs(tmp_path, [
        "wa wb wc",
        "wa wb wc wd",
    ])
    eng = _parity(d, W.term_suggest, W.sql_term_suggest())
    w = eng[eng.prefix == "w"]
    assert w.term.tolist() == ["wa", "wb", "wc"]
    assert w["rank"].tolist() == [1, 2, 3]
    assert len(eng[eng.prefix == "zz"]) == 0


def test_prefix_hi_ascii_guard():
    assert W._prefix_hi("s") == "t"
    assert W._prefix_hi("da") == "db"
    with pytest.raises(AssertionError):
        W._prefix_hi("é")


def test_wildcard_all_prefixes_miss(ray_session, tmp_path, monkeypatch):
    monkeypatch.setattr(W, "PREFIXES", ("zz", "qq"))
    d = _write_docs(tmp_path, ["alpha beta", "gamma delta"])
    eng = _parity(d, W.wildcard_docs, W.sql_wildcard_docs())
    assert len(eng) == 0
    sug = _parity(d, W.term_suggest, W.sql_term_suggest())
    assert len(sug) == 0
