"""phrase_suggest (ES phrase suggester): adversarial-corpus oracle
parity and pins that the bigram CONTEXT does the work — a typo
corrects when its corrected bigrams are corpus-frequent and sticks
when the model prefers the identity phrase (the documented laplace
contract)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import suggest as SG


def _docs(tmp_path, texts):
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["t"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _parity(sf) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    eng = SG.phrase_suggest(sf).to_pandas()
    ora = con.execute(SG.sql_phrase_suggest()).df()
    key = ["query_id", "suggestion", "score"]
    e = eng[key].sort_values("query_id", ignore_index=True)
    o = ora[key].sort_values("query_id", ignore_index=True)
    e["score"] = e.score.round(6)
    o["score"] = o.score.round(6)
    pd.testing.assert_frame_equal(e, o, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-6)
    return e


def test_context_corrects_typos(ray_session, tmp_path):
    """Corpus saturated with the corrected bigrams: every query whose
    typo has a frequent corrected context must flip to the corrected
    phrase."""
    texts = ["fast hash join runs", "merge sort stream here",
             "window batch data flow", "dup row line block",
             "slow query plan cost"] * 6 + ["  hash\tjoin ", ""]
    sf = _docs(tmp_path, texts)
    got = _parity(sf)
    by_q = dict(zip(got.query_id, got.suggestion))
    assert by_q[0] == "fast hash join"
    assert by_q[1] == "merge sort stream"
    assert by_q[2] == "window batch data"
    assert by_q[3] == "dup row line"
    assert by_q[4] == "slow query plan"


def test_identity_wins_without_evidence(ray_session, tmp_path):
    """A corpus with NO bigram evidence for any correction and no
    1-edit vocab neighbors: every suggestion is the identity phrase
    (the suggester must not hallucinate corrections)."""
    texts = ["alpha beta gamma delta", "epsilon zeta eta theta"] * 3
    sf = _docs(tmp_path, texts)
    got = _parity(sf)
    assert list(got.suggestion) == [q.lower() for q in SG.SUGGEST_QUERIES]


def test_adversarial_parity(ray_session, tmp_path):
    """Unicode vocab, tabs/edge whitespace, empty docs, and 1-edit
    AMBIGUITY (hash/hush both present) — engine == oracle."""
    texts = ["fast hush join", "fast hash join", "naïve café 日本語",
             "", "  merge\tsort  stream ", "dup row line",
             "hach hach hach"]  # the typo itself is corpus vocab here
    sf = _docs(tmp_path, texts * 2)
    _parity(sf)


def test_transposition_is_two_edits(ray_session, tmp_path):
    """Plain-Levenshtein contract pin: 'rwo' does NOT expand to 'row'
    (a transposition is 2 edits, no Damerau), so a query containing
    it keeps the identity phrase even when the corrected bigrams are
    corpus-frequent."""
    from raysearch.pipelines.suggest import _expansions

    assert "row" not in _expansions("rwo", ["row", "rwo", "raw"])
    assert set(_expansions("roww", ["row", "rwo", "raw"])) >= {"row"}
