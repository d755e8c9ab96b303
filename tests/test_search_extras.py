"""Adversarial-edge parity for the round-4 search surface additions:
highlight_topk (window clamps, substring-vs-token position semantics),
paged_topk (partial second page, boundary ties), facet_counts
(multi-facet grouping). Each case runs the REAL pipeline over a tiny
/tmp documents.parquet against the same DuckDB oracle SQL."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_docs(path, rows):
    """rows: list of (text, lang, source)."""
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[0]) for r in rows], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return str(path)


def _oracle(d):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    return con


def _assert_parity(eng: pa.Table, con, sql: str):
    e = eng.to_pandas()
    o = con.execute(sql).df()
    cols = sorted(e.columns)
    pd.testing.assert_frame_equal(
        e[cols].sort_values(cols, ignore_index=True),
        o[cols].sort_values(cols, ignore_index=True),
        check_exact=True)
    return e


def test_highlight_adversarial(ray_session, tmp_path):
    from raysearch.pipelines import search_queries as sq

    d = _write_docs(tmp_path, [
        # query 0 is "Fast hash join?" -> terms fast, hash, join
        ("hash at position one with join later", "en", "a"),   # clamp left
        ("x" * 100 + " trailing hash", "en", "a"),              # short window
        ("the hashing tool then a real hash token", "en", "a"),  # substring
        #  ^ first_hit must point at 'hashing' (substring semantics,
        #    pinned identically on both sides)
        ("JOIN uppercase only join", "en", "a"),                # case fold
        ("(hash) punctuation wrapped", "en", "a"),
    ])
    con = _oracle(d)
    e = _assert_parity(sq.highlight_topk(d), con, sq.sql_highlight_topk())
    q0 = e[e.query_id == 0].set_index("doc_id")
    assert q0.loc[0, "first_hit"] == 1            # clamp: window from char 1
    assert q0.loc[2, "first_hit"] == 5            # 'hashing' substring wins
    assert q0.loc[0, "window"].startswith("hash at")


def test_paged_partial_second_page(ray_session, tmp_path):
    from raysearch.pipelines import search_queries as sq

    # 15 docs match query 0's terms -> page 2 holds ranks 11..15 only
    rows = [(f"hash join doc number {i} filler words", "en", "a")
            for i in range(15)]
    rows += [("nothing relevant at all", "en", "a")] * 5
    d = _write_docs(tmp_path, rows)
    con = _oracle(d)
    e = _assert_parity(sq.paged_topk(d), con, sq.sql_paged_topk())
    q0 = e[e.query_id == 0]
    assert sorted(q0["rank"].tolist()) == [11, 12, 13, 14, 15]
    # page 1 and page 2 are disjoint
    p1 = sq.bm25_topk(d).to_pandas()
    overlap = set(zip(p1.query_id, p1.doc_id)) & set(
        zip(e.query_id, e.doc_id))
    assert not overlap


def test_facet_counts_adversarial(ray_session, tmp_path):
    from raysearch.pipelines import search_queries as sq

    rows = [(f"hash join doc {i}", lang, src)
            for i, (lang, src) in enumerate(
                [("en", "web"), ("en", "web"), ("en", "book"),
                 ("de", "web"), ("fr", "code"), ("en", "web"),
                 ("de", "book"), ("en", "code"), ("fr", "web"),
                 ("de", "web"), ("en", "book"), ("fr", "code")])]
    d = _write_docs(tmp_path, rows)
    con = _oracle(d)
    e = _assert_parity(sq.facet_counts(d), con, sq.sql_facet_counts())
    q0 = e[e.query_id == 0]
    # facet counts must add back up to the page size (10 hits)
    assert q0.n_docs.sum() == 10


def test_synonym_expansion_semantics(ray_session, tmp_path, monkeypatch):
    """Synonym filter: expanded term matches docs lacking the original;
    weights sum on collision; absent synonyms are inert."""
    from raysearch.pipelines import search_queries as sq

    monkeypatch.setattr(sq, "SYNONYMS", {"hash": ("digest",),
                                         "join": ("zzznever",)})
    d = _write_docs(tmp_path, [
        ("digest only document here", "en", "a"),   # matches via synonym
        ("hash only document here", "en", "a"),     # matches via original
        ("hash digest both in one", "en", "a"),     # both contribute
        ("unrelated filler words", "en", "a"),
    ])
    con = _oracle(d)
    e = _assert_parity(sq.synonym_topk(d), con, sq.sql_synonym_topk())
    q0 = e[e.query_id == 0]  # "Fast hash join?"
    assert {0, 1, 2} <= set(q0.doc_id)          # synonym-only doc ranked
    plain = sq.bm25_topk(d).to_pandas()
    assert 0 not in set(plain[plain.query_id == 0].doc_id)


def test_expanded_qweights_collision_sum():
    from raysearch.pipelines import search_queries as sq

    orig = sq.SYNONYMS
    try:
        sq.SYNONYMS = {"hash": ("join",)}   # synonym collides with term
        qw = dict(sq.expanded_qweights("hash join join"))
        assert qw == {"hash": 1, "join": 3}  # 2 original + 1 expanded
    finally:
        sq.SYNONYMS = orig


def test_highlight_non_ascii_char_positions(ray_session, tmp_path):
    """first_hit is a CHARACTER position: multi-byte UTF-8 before the
    hit must not shift it (byte offsets would)."""
    from raysearch.pipelines import search_queries as sq

    d = _write_docs(tmp_path, [
        ("héllo wörld hash join", "en", "a"),   # 2 multi-byte chars
        ("日本語テキスト hash merge sort", "ja", "a"),
    ])
    con = _oracle(d)
    e = _assert_parity(sq.highlight_topk(d), con, sq.sql_highlight_topk())
    q0 = e[e.query_id == 0].set_index("doc_id")
    assert q0.loc[0, "first_hit"] == 13   # chars, not bytes (15)
    assert q0.loc[1, "first_hit"] == 9
    assert q0.loc[0, "window"].startswith("héllo wörld hash")


def test_msm_topk_oracle_parity_and_semantics(ray_session):
    """minimum_should_match: oracle parity at sf0.001 plus the
    semantic sandwich — every msm hit holds >= MSM_M distinct query
    terms (it is a subset of the disjunctive candidates and a superset
    of the conjunctive bool_and hits for queries with 2 terms)."""
    import duckdb
    import os
    import pandas as pd

    from raysearch.pipelines.search_queries import (
        DOC_QUERIES,
        MSM_M,
        ORACLE_SQL,
        msm_topk,
    )
    from raysearch.score import query_term_weights

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        import pytest

        pytest.skip("testdata missing")
    eng = msm_topk(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(ORACLE_SQL["msm_topk"]).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()),
        check_exact=True)
    # semantics: every hit really contains >= MSM_M distinct terms
    docs = con.execute("SELECT doc_id, lower(text) t FROM documents").df()
    txt = dict(zip(docs.doc_id, docs.t))
    for row in eng.itertuples():
        terms = [t for t, _ in query_term_weights(DOC_QUERIES[row.query_id])]
        n = sum(1 for t in terms if t in txt[row.doc_id].split())
        assert n >= MSM_M, (row.query_id, row.doc_id, n)
