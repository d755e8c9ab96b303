"""grep_lines / term_vectors_topk: adversarial-corpus oracle parity
plus the structural contracts the oracles can't see (cap semantics,
line-number arithmetic, tf completeness). Fixture-SF value parity is
covered by test_entry_parity."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _adv_corpus(tmp_path) -> str:
    """Multiline docs with edge whitespace: terms at line start/end,
    tabs, CRLF, empty lines, repeated terms on one line, unicode
    lines, an empty doc — plus enough 'hash join' material that the
    bm25 query set matches."""
    texts = [
        "batch start\nmid batch mid\nend batch",   # term at start/mid/end
        "batch batch batch\n\n\tbatch\ttab",       # repeats, empty line, tabs
        "dup line one\r\nafter crlf dup",          # CRLF (\r stays in line)
        "no match here\nbatches dupes subbatch",   # substrings must NOT hit
        "naïve café 日本語\nbatch après ünïcode",   # unicode neighbors
        "",                                        # empty doc
        "hash join merge\nsort hash join",         # bm25 query material
        "the fast hash join\nquery scan batch dup",
    ] * 2
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["t"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("op", ["grep_lines", "term_vectors_topk"])
def test_adversarial_parity(ray_session, tmp_path, op):
    import duckdb

    from raysearch.pipelines import codeops as CO

    sf = _adv_corpus(tmp_path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    eng = CO.QUERIES[op](sf).to_pandas()
    ora = con.execute(CO.ORACLE_SQL[op]).df()
    assert len(eng) > 0
    pd.testing.assert_frame_equal(_norm(eng), _norm(ora),
                                  check_dtype=False)


def test_grep_matches_are_token_hits_with_true_line_numbers(ray_session,
                                                            tmp_path):
    # brute-force re-derivation: every returned (doc, line_no, line)
    # must be the doc's actual line at that 1-based ordinal, contain
    # the term as a whitespace token, and the per-term result must be
    # the FIRST rows of the full match set under (doc_id, line_no)
    from raysearch.pipelines.codeops import (GREP_MAX, GREP_TERMS,
                                             grep_lines)

    sf = _adv_corpus(tmp_path)
    res = grep_lines(sf).to_pandas()
    docs = pq.read_table(os.path.join(sf, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    lines = {int(r.doc_id): r.text.split("\n") for r in docs.itertuples()}

    full = []
    for did in sorted(lines):
        for no, ln in enumerate(lines[did], start=1):
            toks = set(ln.lower().split())
            for t in GREP_TERMS:
                if t in toks:
                    full.append((t, did, no, ln))
    want = pd.DataFrame(full, columns=["term", "doc_id", "line_no",
                                       "line"])
    want = (want.sort_values(["term", "doc_id", "line_no"],
                             ignore_index=True)
            .groupby("term").head(GREP_MAX).reset_index(drop=True))
    got = res.sort_values(["term", "doc_id", "line_no"],
                          ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert "zzznothingzzz" not in set(got.term)
    # substrings never match ('batches', 'subbatch', 'dupes' docs)
    assert 3 not in set(got.doc_id % 8)


def test_grep_cap_bites_at_fixture_scale(ray_session):
    # at sf0.001 'batch' has df > GREP_MAX: the cap must truncate to
    # exactly GREP_MAX rows, and they must be the global first rows
    # under (doc_id, line_no)
    from raysearch.pipelines.codeops import GREP_MAX, grep_lines

    res = grep_lines(SF).to_pandas()
    per = res.groupby("term").size()
    assert per["batch"] == GREP_MAX
    b = res[res.term == "batch"]
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    matching = sorted(int(r.doc_id) for r in docs.itertuples()
                      if "batch" in set(r.text.lower().split()))
    assert len(matching) > GREP_MAX          # the cap genuinely bites
    # single-line fixture docs: first GREP_MAX matching docs exactly
    assert b.doc_id.tolist() == matching[:GREP_MAX]
    assert (b.line_no == 1).all()


def test_term_vectors_complete_and_consistent(ray_session):
    # one row per (query, hit, distinct term); tf sums to the doc's
    # token count; vectors agree with a brute-force tokenize
    from raysearch.pipelines.codeops import term_vectors_topk
    from raysearch.pipelines.search_queries import bm25_topk

    tv = term_vectors_topk(SF).to_pandas()
    bm = bm25_topk(SF).to_pandas()
    assert set(zip(tv.query_id, tv.doc_id)) == \
        set(zip(bm.query_id, bm.doc_id))
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    toks = {int(r.doc_id): r.text.lower().split()
            for r in docs.itertuples()}
    for (q, d), g in tv.groupby(["query_id", "doc_id"]):
        want = pd.Series(toks[d]).value_counts()
        assert g.tf.sum() == len(toks[d])
        assert dict(zip(g.term, g.tf)) == want.to_dict()
