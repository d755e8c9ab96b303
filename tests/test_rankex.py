"""Property tests for the ranking extensions (dismax, fuzzy, MaxP,
nDCG). Oracle value parity is covered by test_entry_parity; these pin
the structural contracts the oracles can't see."""

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_levenshtein_matches_duckdb():
    import duckdb

    from raysearch.pipelines.rankex import levenshtein

    pairs = [("hash", "hach"), ("sort", "sart"), ("", "abc"),
             ("abc", ""), ("kitten", "sitting"), ("table", "tabel"),
             ("stream", "stram"), ("a", "a"), ("ab", "ba")]
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_fuzzy_expansion_rules():
    from raysearch.pipelines.rankex import fuzzy_expansions

    vocab = ["sort", "part", "hash", "join", "the"]
    # "sart" expands to BOTH sort and part; exact terms map to
    # themselves; unexpandable terms drop
    [exp] = fuzzy_expansions(["sart join zzzzzz"], vocab)
    assert exp == [("join", 1), ("part", 1), ("sort", 1)]
    # colliding expansions add multiplicities ("sort sart" -> sort x2)
    [exp] = fuzzy_expansions(["sort sart"], vocab)
    assert ("sort", 2) in exp and ("part", 1) in exp
    # ascending unique-term order (the accumulation contract)
    assert exp == sorted(exp)


def test_prefix_expansion_rules():
    from raysearch.pipelines.rankex import prefix_expansions

    vocab = ["scan", "sort", "spark", "part", "the"]
    # 's' expands to every s-term; exact terms are their own prefix;
    # no-match prefixes drop
    [exp] = prefix_expansions(["s part zzz"], vocab)
    assert exp == [("part", 1), ("scan", 1), ("sort", 1), ("spark", 1)]
    # colliding expansions add multiplicities ('s sort' -> sort x2)
    [exp] = prefix_expansions(["s sort"], vocab)
    assert ("sort", 2) in exp and ("scan", 1) in exp
    assert exp == sorted(exp)
    # repeated prefix doubles every expansion's weight
    [exp] = prefix_expansions(["s s"], vocab)
    assert all(w == 2 for _, w in exp)


def test_prefix_results_contain_an_expansion(ray_session):
    # every result doc contains at least one term extending one of its
    # query's prefixes (brute-force over the corpus text)
    from raysearch.pipelines.rankex import PREFIX_QUERIES, prefix_topk
    from raysearch.score import query_term_weights

    res = prefix_topk(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    toks = {int(r.doc_id): set(r.text.lower().split())
            for r in docs.itertuples()}
    prefixes = [[t for t, _ in query_term_weights(q)]
                for q in PREFIX_QUERIES]
    assert len(res) > 0
    assert set(res.query_id) == set(range(len(PREFIX_QUERIES)))
    for q, d in zip(res.query_id, res.doc_id):
        assert any(t.startswith(p) for p in prefixes[q]
                   for t in toks[d]), (q, d)


def test_dismax_bounded_by_sum_and_max(ray_session):
    # TIE in (0,1) means: max contrib <= dismax score <= disjunction
    # (sum) score for the same doc. Compare against a deep bm25 run.
    from raysearch.pipelines.rankex import dismax_topk
    from raysearch.pipelines.search_queries import (cached_index,
                                                    topk_rounded_for_index)

    dm = dismax_topk(SF).to_pandas()
    deep = topk_rounded_for_index(cached_index(SF), "bm25",
                                  rank_hi=500, buffer=600).to_pandas()
    full = {(q, d): s for q, d, s in zip(deep.query_id, deep.doc_id,
                                         deep.score)}
    assert len(dm) > 0
    for q, d, s in zip(dm.query_id, dm.doc_id, dm.score):
        assert (q, d) in full
        # rounded values: allow the 1e-6 rounding quantum
        assert s <= full[(q, d)] + 1e-6


def test_maxp_passage_corpus_roundtrip(ray_session):
    # passages re-tokenize to exactly the document's token windows and
    # reassemble (in widx order) to the document's token stream
    from raysearch.pipelines.rankex import (PASSAGE_STRIDE, PASSAGE_W,
                                            _passage_corpus)

    tbl = _passage_corpus(SF).take_all()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    want = {int(r.doc_id): r.text.lower().split()
            for r in docs.itertuples()}
    got: dict[int, dict[int, list[str]]] = {}
    for row in tbl:
        parent, widx = divmod(int(row["doc_id"]), PASSAGE_STRIDE)
        got.setdefault(parent, {})[widx] = row["content"].split()
    assert set(got) == {d for d, t in want.items() if t}
    for parent, wins in got.items():
        assert sorted(wins) == list(range(len(wins)))
        joined = [t for w in sorted(wins) for t in wins[w]]
        assert joined == want[parent]
        assert all(len(wins[w]) == PASSAGE_W for w in sorted(wins)[:-1])
        assert 1 <= len(wins[max(wins)]) <= PASSAGE_W


def test_maxp_score_is_best_passage(ray_session):
    # a doc's maxp score must equal the max BM25 over its passages,
    # verified independently via a deep passage-level query
    from raysearch.numutil import round6
    from raysearch.pipelines.rankex import (PASSAGE_STRIDE,
                                            cached_passage_index,
                                            maxp_topk)
    from raysearch.pipelines.search_queries import DOC_QUERIES
    from raysearch.query import query_index

    mx = maxp_topk(SF).to_pandas()
    raw = query_index(cached_passage_index(SF), DOC_QUERIES,
                      k=100_000).to_pandas()
    raw["parent"] = raw.doc_id // PASSAGE_STRIDE
    best = (raw.groupby(["query_id", "parent"]).score.max()
            .to_dict())
    assert len(mx) > 0
    for q, d, s in zip(mx.query_id, mx.doc_id, mx.score):
        assert s == float(round6(np.float64(best[(q, d)])))


def test_negated_excludes_and_preserves_scores(ray_session):
    # no result doc may contain its query's negative term, and every
    # surviving (query, doc) keeps its EXACT unfiltered BM25 score
    from raysearch.pipelines.rankex import NEG_TERMS, negated_topk
    from raysearch.pipelines.search_queries import (cached_index,
                                                    topk_rounded_for_index)

    res = negated_topk(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    toks = {int(r.doc_id): set(r.text.lower().split())
            for r in docs.itertuples()}
    assert len(res) > 0
    for q, d in zip(res.query_id, res.doc_id):
        assert NEG_TERMS[q] not in toks[d]
    deep = topk_rounded_for_index(cached_index(SF), "bm25",
                                  rank_hi=500, buffer=600).to_pandas()
    full = {(q, d): s for q, d, s in zip(deep.query_id, deep.doc_id,
                                         deep.score)}
    for q, d, s in zip(res.query_id, res.doc_id, res.score):
        assert full[(q, d)] == s


def test_best_passage_aligns_with_topk(ray_session):
    # exactly one best passage per bm25_topk row; the rank-1 doc's
    # best-passage score equals the maxp table's score for that doc
    from raysearch.pipelines.rankex import (PASSAGE_W,
                                            best_passage_topk,
                                            maxp_topk)
    from raysearch.pipelines.search_queries import bm25_topk

    bp = best_passage_topk(SF).to_pandas()
    bm = bm25_topk(SF).to_pandas()
    assert len(bp) == len(bm)
    assert set(zip(bp.query_id, bp.doc_id)) == \
        set(zip(bm.query_id, bm.doc_id))
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    npass = {int(r.doc_id): -(-len(r.text.split()) // PASSAGE_W)
             for r in docs.itertuples()}
    assert all(0 <= p < npass[d] for p, d in zip(bp.pidx, bp.doc_id))
    mx = maxp_topk(SF).to_pandas()
    mxmap = {(q, d): s for q, d, s in zip(mx.query_id, mx.doc_id,
                                          mx.score)}
    hits = 0
    for q, d, s in zip(bp.query_id, bp.doc_id, bp.pscore):
        if (q, d) in mxmap:
            assert mxmap[(q, d)] == s
            hits += 1
    assert hits > 0


def test_spanfirst_gate_and_scores(ray_session):
    # every result doc has a query term among its first N tokens
    # (brute-force check) and keeps its exact unfiltered BM25 score
    from raysearch.pipelines.rankex import SPANFIRST_N, spanfirst_topk
    from raysearch.pipelines.search_queries import (DOC_QUERIES,
                                                    cached_index,
                                                    topk_rounded_for_index)
    from raysearch.score import query_term_weights

    res = spanfirst_topk(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    heads = {int(r.doc_id): set(r.text.lower().split()[:SPANFIRST_N])
             for r in docs.itertuples()}
    qterms = [{t for t, _ in query_term_weights(q)}
              for q in DOC_QUERIES]
    assert len(res) > 0
    for q, d in zip(res.query_id, res.doc_id):
        assert qterms[q] & heads[d], (q, d)
    deep = topk_rounded_for_index(cached_index(SF), "bm25",
                                  rank_hi=500, buffer=600).to_pandas()
    full = {(q, d): s for q, d, s in zip(deep.query_id, deep.doc_id,
                                         deep.score)}
    for q, d, s in zip(res.query_id, res.doc_id, res.score):
        assert full[(q, d)] == s


def test_ltr_features_consistency(ray_session):
    # one feature row per bm25_topk hit; features agree with the
    # sibling pipelines that compute them independently
    from raysearch.pipelines.rankex import ltr_features
    from raysearch.pipelines.search_queries import (bm25_topk,
                                                    hit_positions_topk)

    lt = ltr_features(SF).to_pandas()
    bm = bm25_topk(SF).to_pandas()
    assert len(lt) == len(bm)
    assert (lt.n_terms_matched >= 1).all()
    assert (lt.n_hits >= lt.n_terms_matched).all()
    assert (lt.overlap >= lt.n_hits).all()  # weights >= 1 per hit
    hp = hit_positions_topk(SF).to_pandas()
    hmap = {(q, d): (f, n) for q, d, f, n in zip(
        hp.query_id, hp.doc_id, hp.first_pos, hp.n_hits)}
    for q, d, f, n in zip(lt.query_id, lt.doc_id, lt.first_pos,
                          lt.n_hits):
        assert hmap[(q, d)] == (f, n)


def test_percolate_conjunction_gate(ray_session):
    # brute-force the conjunction gate over the sampled stream
    from raysearch.pipelines.rankex import PERCOLATE_MOD, percolate_docs
    from raysearch.pipelines.search_queries import DOC_QUERIES
    from raysearch.score import query_term_weights

    got = percolate_docs(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    qterms = [{t for t, _ in query_term_weights(q)}
              for q in DOC_QUERIES]
    want = set()
    for r in docs.itertuples():
        if r.doc_id % PERCOLATE_MOD:
            continue
        toks = set(r.text.lower().split())
        for qid, ts in enumerate(qterms):
            if ts <= toks:
                want.add((int(r.doc_id), qid))
    assert set(zip(got.doc_id, got.query_id)) == want
    assert len(want) > 0


def test_impact_pruning_bounded_and_biting(ray_session):
    # every pruned score is <= the exact unpruned score for the same
    # (query, doc) — pruning only removes positive contributions —
    # and the truncation genuinely bites on this corpus (some query
    # term's df exceeds IMPACT_P)
    from raysearch.pipelines.pruning import IMPACT_P, impact_topk
    from raysearch.pipelines.search_queries import (DOC_QUERIES,
                                                    cached_index,
                                                    topk_rounded_for_index)
    from raysearch.query import lexicon_df
    from raysearch.score import query_term_weights

    pr = impact_topk(SF).to_pandas()
    assert len(pr) > 0
    deep = topk_rounded_for_index(cached_index(SF), "bm25",
                                  rank_hi=500, buffer=600).to_pandas()
    full = {(q, d): s for q, d, s in zip(deep.query_id, deep.doc_id,
                                         deep.score)}
    for q, d, s in zip(pr.query_id, pr.doc_id, pr.score):
        assert s <= full[(q, d)] + 1e-6, (q, d)
    terms = sorted({t for qry in DOC_QUERIES
                    for t, _ in query_term_weights(qry)})
    df = lexicon_df(cached_index(SF), terms)
    assert max(df.values()) > IMPACT_P  # the truncation is exercised


def test_ndcg_in_unit_interval_and_self_consistent(ray_session):
    from raysearch.pipelines.rankex import ndcg_eval

    nd = ndcg_eval(SF).to_pandas()
    assert len(nd) == 10
    assert (nd.ndcg >= 0).all() and (nd.ndcg <= 1.0 + 1e-9).all()
    assert (nd.dcg <= nd.idcg + 1e-9).all()
    # idcg > 0 whenever the query matched anything
    assert (nd.idcg > 0).all()


def test_multifield_title_weight_reorders(ray_session, tmp_path):
    """A doc whose only 'hash join' evidence sits in its leading-8
    token prefix (the title field) must outrank a doc with the same
    evidence buried past the prefix: per-field stats + the 2x title
    weight are real, not a relabeled body score. Also pins oracle
    parity on a corpus with empty/unicode/multiline docs."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from raysearch.pipelines import rankex as RX
    from raysearch.pipelines import search_queries as SQ

    pad = " ".join(["pad"] * 10)
    texts = [
        "hash join " + pad,            # 0: terms in title AND body
        pad + " hash join",            # 1: terms past the prefix (body only)
        "hash " + pad,                 # 2: one term in title
        "naïve café\n日本語 join",      # 3: unicode + newline
        "",                            # 4: empty
        "merge sort stream " + pad,
    ] * 3
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["t"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(tmp_path, "documents.parquet"))
    sf = str(tmp_path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    eng = RX.multifield_topk(sf).to_pandas()
    ora = con.execute(RX.sql_multifield_topk()).df()
    norm = lambda d: (d[sorted(d.columns)]
                      .assign(score=lambda x: x.score.round(6))
                      .sort_values(sorted(d.columns), ignore_index=True))
    pd.testing.assert_frame_equal(norm(eng), norm(ora),
                                  check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-6)
    q0 = eng[eng.query_id == 0].sort_values("rank")  # 'Fast hash join?'
    r = {d: rk for d, rk in zip(q0.doc_id % 6, q0["rank"])}
    assert r[0] < r[1]  # title+body beats body-only
    # and the combined ranking is not the plain body ranking
    bm = SQ.bm25_topk(sf).to_pandas()
    j = eng.merge(bm, on=["query_id", "doc_id"], suffixes=("_mf", "_b"))
    assert len(j) and not np.allclose(j.score_mf, j.score_b)
