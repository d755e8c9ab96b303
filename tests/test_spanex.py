"""spanex ops: semantic pins for span-NOT exclusion windows,
common-terms candidate gating, and the MRR/MAP eval — hand-built
corpora where the expected hit sets are enumerable by eye, plus
oracle parity on each probe corpus."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def _oracle(d: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    return con.execute(sql).df()


def _assert_parity(eng: pa.Table, ora: pd.DataFrame):
    eng = eng.to_pandas()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)


def test_span_not_semantics(ray_session, tmp_path, monkeypatch):
    from raysearch.pipelines import spanex as sx

    monkeypatch.setattr(sx, "SPANNOT_QUERIES", [("join", "hash")])
    # W = 3 (module default). Token positions are 0-based in the
    # engine, 1-based in the oracle — both use DIFFERENCES only.
    d = _write_docs(tmp_path, [
        "join alpha beta gamma delta",        # 0: survives (no hash)
        "hash join alpha beta gamma",         # 1: |0-1|=1 <= 3 -> excluded
        "join alpha beta gamma hash",         # 2: |0-4|=4 > 3 -> survives
        "join alpha hash beta join",          # 3: first join excluded
                                              #    (gap 2), second join at
                                              #    pos 4 gap 2 -> excluded
        "join a b c d e f g join hash",       # 4: join@0 survives,
                                              #    join@8 gap 1 -> stf=1
        "alpha beta hash gamma",              # 5: no include term
    ])
    res = sx.span_not_topk(d).to_pandas()
    assert set(res.doc_id) == {0, 2, 4}
    _assert_parity(sx.span_not_topk(d), _oracle(d, sx.sql_span_not_topk()))


def test_span_not_absent_exclude_is_plain_bm25(ray_session):
    """With an absent exclude term every occurrence survives, so the
    ranking must equal plain BM25 on the include term (same rounding
    contract) — pinned on the sf0.001 fixture's real index."""
    from raysearch.pipelines import search_queries as sq
    from raysearch.pipelines import spanex as sx

    d = "/root/testdata/sf0.001"
    res = sx.span_not_topk(d).to_pandas()
    qid = [i for i, (_, ex) in enumerate(sx.SPANNOT_QUERIES)
           if ex == "zzznothingzzz"]
    assert len(qid) == 1
    got = res[res.query_id == qid[0]].reset_index(drop=True)
    inc = sx.SPANNOT_QUERIES[qid[0]][0]
    want = sq.topk_rounded_for_index(
        sq.cached_index(d), "bm25", queries=[[(inc, 1)]]).to_pandas()
    pd.testing.assert_frame_equal(
        got[["doc_id", "rank", "score"]],
        want[["doc_id", "rank", "score"]], check_exact=True)


def test_common_terms_candidate_gate(ray_session, tmp_path, monkeypatch):
    from raysearch.pipelines import spanex as sx

    monkeypatch.setattr(sx, "COMMON_QUERIES",
                        ["rare common", "common other"])
    # 'common'/'other' in 4/5 docs (df 0.8 > cutoff 0.5) ->
    # scoring-only; 'rare' in 1/5 -> selector. Query 0 must return
    # ONLY doc 0 even though 'common' matches almost everything;
    # query 1 has no rare term -> plain disjunction fallback.
    d = _write_docs(tmp_path, [
        "rare common other text",
        "common other alpha beta",
        "common other gamma delta",
        "common other words",
        "plain filler line",
    ])
    res = sx.common_terms_topk(d).to_pandas()
    q0 = res[res.query_id == 0]
    assert set(q0.doc_id) == {0}
    q1 = res[res.query_id == 1]
    assert set(q1.doc_id) == {0, 1, 2, 3}   # any 'common' or 'other' doc
    _assert_parity(sx.common_terms_topk(d),
                   _oracle(d, sx.sql_common_terms_topk()))


def test_map_mrr_bounds_and_perfect_query(ray_session):
    """MRR/AP are in [0,1]; a query whose BM25 top-10 equals the
    overlap top-10 set has AP@10 = 1 iff all ten are relevant."""
    from raysearch.pipelines import spanex as sx

    res = sx.map_mrr_eval("/root/testdata/sf0.001").to_pandas()
    assert len(res) == 10
    assert ((res.mrr >= 0) & (res.mrr <= 1)).all()
    assert ((res.ap10 >= 0) & (res.ap10 <= 1)).all()
    # MRR=1 whenever the top-ranked BM25 doc is judged relevant; at
    # least one fixture query behaves that way (vocabulary overlap
    # between the two scorers is high)
    assert (res.mrr == 1.0).any()


def test_interval_semantics(ray_session, tmp_path, monkeypatch):
    """Hand-enumerable ordered-interval corpus: order violations,
    exact span-boundary hits (span == W) and misses (W+1), multiple
    anchors per doc, and missing-term docs — engine == oracle and the
    expected hit/count map pinned by eye. W = 2 + INTERVAL_MAXGAPS
    = 8 token positions from t1 to t3."""
    from raysearch.pipelines import spanex as sx

    monkeypatch.setattr(sx, "INTERVAL_QUERIES", [("a", "b", "c")])
    texts = [
        "a b c",                   # doc 0: one anchor, span 2
        "a c b",                   # doc 1: order violated -> no hit
        "a b x x x x x x c",       # doc 2: span exactly 8 -> hit
        "a b x x x x x x x c",     # doc 3: span 9 -> no hit
        "a b c a b c",             # doc 4: two anchors
        "a x b x c",               # doc 5: gapped but in budget
        "b c a",                   # doc 6: nothing follows the a
        "a b",                     # doc 7: no c at all
    ]
    d = _write_docs(tmp_path, texts)
    got = sx.interval_topk(d)
    _assert_parity(got, _oracle(d, sx.sql_interval_topk()))
    e = got.to_pandas()
    assert dict(zip(e.doc_id, e.score)) == {0: 1, 2: 1, 4: 2, 5: 1}
    assert list(e.sort_values("rank").doc_id) == [4, 0, 2, 5]
