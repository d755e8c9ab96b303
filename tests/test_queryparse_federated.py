"""Session-7 operators: the boolean query DSL (Lucene classic
QueryParser shape), federated multi-index search, and the completion
suggester — parser/algebra units, adversarial-corpus oracle parity,
and the federated==monolithic exactness pin."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.pipelines import queryparse as QP
from raysearch.pipelines import federated as FD
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


ADV_TEXTS = [
    "hash join merge sort window",
    "sort window sort window",
    "merge sort fast line",
    "  hash\tjoin ",                       # tabs + edge whitespace
    "",                                    # empty doc
    "scan filter batch slow",
    "scan batch",
    "dup row line dup row line",
    "stream window table",
    "window only here",
    "query batch fast",
    "query batch slow",
    "naïve café 日本語 query batch",       # unicode tokens
] * 3


# ---- parser units ----

def test_parse_shapes():
    assert QP.parse_dsl("a AND b") == ("and", [("term", "a"),
                                               ("term", "b")])
    assert QP.parse_dsl("a OR b AND c") == (
        "or", [("term", "a"), ("and", [("term", "b"), ("term", "c")])])
    assert QP.parse_dsl("NOT a AND b") == (
        "and", [("not", ("term", "a")), ("term", "b")])
    assert QP.parse_dsl("(a OR b) AND c") == (
        "and", [("or", [("term", "a"), ("term", "b")]), ("term", "c")])
    # atom normalization through the query tokenizer
    assert QP.parse_dsl("Sort, AND Window!") == (
        "and", [("term", "sort"), ("term", "window")])


@pytest.mark.parametrize("bad", [
    "a b",                # implicit adjacency rejected
    "(a AND b",           # unbalanced paren
    "a AND",              # dangling operator
    "AND a",              # leading operator
    "a OR OR b",          # doubled operator
    "NOT a",              # pure negative — rejected AT PARSE TIME
    "a OR NOT b",         # NOT under OR — rejected at parse time
    "NOT a AND NOT b",    # no positive clause — rejected at parse
    "NOT (a OR b)",       # negated group with no positive sibling
])
def test_parse_errors(bad):
    with pytest.raises(QP.DslError):
        QP.parse_dsl(bad)


def test_eval_sets_algebra():
    sets = {"a": np.array([1, 2, 3, 4]), "b": np.array([3, 4, 5]),
            "c": np.array([4, 6]), "z": np.array([], dtype=np.int64)}
    get = lambda t: sets[t]
    ev = lambda q: QP.eval_sets(QP.parse_dsl(q), get).tolist()
    assert ev("a AND b") == [3, 4]
    assert ev("a OR c") == [1, 2, 3, 4, 6]
    assert ev("a AND NOT b") == [1, 2]
    assert ev("a AND NOT NOT b") == [3, 4]          # double negation
    assert ev("(a OR c) AND NOT b") == [1, 2, 6]
    assert ev("b OR (a AND NOT c)") == [1, 2, 3, 4, 5]
    assert ev("a AND z") == []
    # worker-side defense in depth: eval_sets re-raises on ASTs that
    # bypass parse-time validation (built directly here)
    with pytest.raises(QP.DslError):
        QP.eval_sets(("not", ("term", "a")), get)
    with pytest.raises(QP.DslError):
        QP.eval_sets(("or", [("term", "a"),
                             ("not", ("term", "b"))]), get)
    with pytest.raises(QP.DslError):
        QP.eval_sets(("and", [("not", ("term", "a")),
                              ("not", ("term", "b"))]), get)


# ---- dsl_topk adversarial parity ----

def test_dsl_topk_adversarial_parity(ray_session, tmp_path):
    sf = _docs(tmp_path, ADV_TEXTS)
    eng = QP.dsl_topk(sf).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(QP.sql_dsl_topk()).df().sort_values(
        ["query_id", "rank"], ignore_index=True)
    ora = ora[eng.columns.tolist()].astype(
        {c: eng.dtypes[c] for c in eng.columns})
    pd.testing.assert_frame_equal(eng, ora)
    # MUST_NOT semantics visible: no 'sort AND NOT window' hit may
    # contain 'window' (doc 1 is saturated with both -> excluded)
    q1_docs = set(eng[eng.query_id == 1].doc_id)
    assert q1_docs
    for d in q1_docs:
        assert "window" not in ADV_TEXTS[d].split()


# ---- federated ----

def test_federated_equals_monolithic(ray_session, tmp_path):
    """The headline exactness claim on an adversarial corpus: two
    disjoint sub-indexes with merged stats == the single-index BM25,
    frame-equal after the shared rounding contract."""
    from raysearch.pipelines.search_queries import bm25_topk

    sf = _docs(tmp_path, ADV_TEXTS)
    fed = FD.federated_topk(sf).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    mono = bm25_topk(sf).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(
        fed[["query_id", "doc_id", "rank", "score"]],
        mono[["query_id", "doc_id", "rank", "score"]])


def test_merged_stats_are_exact_sums(ray_session, tmp_path):
    from raysearch.stats import load_stats

    sf = _docs(tmp_path, ADV_TEXTS)
    idxs = FD.federated_indexes(sf)
    st = [load_stats(i) for i in idxs]
    merged = FD.merged_stats(idxs, ["hash", "window", "query"])
    assert merged["n_docs"] == st[0]["n_docs"] + st[1]["n_docs"]
    tot = st[0]["total_tokens"] + st[1]["total_tokens"]
    assert merged["avgdl"] == pytest.approx(tot / merged["n_docs"])
    # df sums term-wise and equals the corpus truth
    texts = ADV_TEXTS
    for t in ("hash", "window", "query"):
        truth = sum(1 for x in texts if t in x.lower().split())
        assert merged["df"][t] == truth


# ---- completion suggester ----

def test_completion_adversarial_parity(ray_session, tmp_path):
    sf = _docs(tmp_path, ADV_TEXTS)
    eng = SG.completion_suggest(sf).to_pandas().sort_values(
        ["prefix", "rank"], ignore_index=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(SG.sql_completion_suggest()).df().sort_values(
        ["prefix", "rank"], ignore_index=True)
    ora = ora[eng.columns.tolist()].astype(
        {c: eng.dtypes[c] for c in eng.columns})
    pd.testing.assert_frame_equal(eng, ora)
    # the no-match probe must yield zero rows, not a fabricated hit
    assert not (eng.prefix == "zz").any()
    # an exact-term prefix completes to at least itself
    assert "sort" in set(eng[eng.prefix == "sort"].term)


def test_sayt_adversarial_parity(ray_session, tmp_path):
    from raysearch.pipelines import rankex as RX

    sf = _docs(tmp_path, ADV_TEXTS)
    eng = RX.sayt_topk(sf).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(RX.sql_sayt_topk()).df().sort_values(
        ["query_id", "rank"], ignore_index=True)
    ora = ora[eng.columns.tolist()].astype(
        {c: eng.dtypes[c] for c in eng.columns})
    pd.testing.assert_frame_equal(eng, ora)


def test_sayt_expansion_rules():
    from raysearch.pipelines.rankex import sayt_expansions

    vocab = ["sort", "sorted", "window", "merge"]
    # last token is the prefix; earlier tokens stay exact
    [x] = sayt_expansions(["merge so"], vocab)
    assert x == [("merge", 1), ("sort", 1), ("sorted", 1)]
    # exact-term prefix expands onto itself and its extensions only
    [x] = sayt_expansions(["merge sort"], vocab)
    assert x == [("merge", 1), ("sort", 1), ("sorted", 1)]
    # dead prefix: the query survives on its exact terms
    [x] = sayt_expansions(["merge zz"], vocab)
    assert x == [("merge", 1)]
    # collision: exact token == an expansion -> weights add
    [x] = sayt_expansions(["sort so"], vocab)
    assert x == [("sort", 2), ("sorted", 1)]


def test_trec_run_roundtrip_exact(ray_session, tmp_path):
    """The TREC sink's parse-back equals the BM25 table bit-for-bit
    (the %.6f round-trip claim) on an adversarial corpus."""
    from raysearch.pipelines.io_formats import trec_run_export
    from raysearch.pipelines.search_queries import bm25_topk

    sf = _docs(tmp_path, ADV_TEXTS)
    t = trec_run_export(sf).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    b = bm25_topk(sf).to_pandas()[t.columns.tolist()].sort_values(
        ["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(t, b)


def test_trec_empty_run(ray_session, tmp_path):
    """A corpus sharing no vocabulary with the query set produces an
    EMPTY run; the sink must return the typed contract table, not
    crash on a shard-less read."""
    from raysearch.pipelines.io_formats import trec_run_export

    sf = _docs(tmp_path, ["xxx yyy zzz", "aaa bbb ccc"])
    t = trec_run_export(sf)
    assert t.num_rows == 0
    assert t.schema.names == ["query_id", "doc_id", "rank", "score"]


def test_completion_tie_order(ray_session, tmp_path):
    """Equal-cf completions order by term ASC (the deterministic tie
    contract): 'sa'/'sb' both cf=2 -> sa ranks first."""
    sf = _docs(tmp_path, ["sa sb", "sb sa", "other words"])
    eng = SG.completion_suggest(sf).to_pandas()
    s = eng[eng.prefix == "s"].sort_values("rank")
    assert list(s.term[:2]) == ["sa", "sb"]
    assert list(s["rank"]) == list(range(1, len(s) + 1))


def test_merged_equals_monolithic(ray_session, tmp_path):
    """Segment-merging the two sub-indexes must be behavior-identical
    to the monolithic build (the Lucene addIndexes contract)."""
    from raysearch.pipelines.federated import merged_topk
    from raysearch.pipelines.search_queries import bm25_topk

    sf = _docs(tmp_path, ADV_TEXTS)
    m = merged_topk(sf).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    b = bm25_topk(sf).to_pandas()[m.columns.tolist()].sort_values(
        ["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(m, b)
