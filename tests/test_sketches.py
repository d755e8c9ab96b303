"""Sketch-family operators (raysearch/pipelines/sketches.py): HLL
primitive correctness + error bound, exact heavy-hitter threshold
edges, per-group top-k ties, and the PII/normalize cleaning ops on
adversarial inputs the fixture corpus lacks."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.pipelines import sketches as S

SF = "/root/testdata/sf0.001"


# ---- pure-numpy primitives (no Ray) ----

def test_clz64_matches_bit_length():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        np.array([0, 1, 2, 3, (1 << 63), (1 << 64) - 1], dtype=np.uint64),
        rng.integers(0, 1 << 63, size=500).astype(np.uint64),
    ])
    got = S._clz64(vals)
    want = np.array([64 - int(v).bit_length() for v in vals])
    assert (got == want).all()


def test_hll_registers_merge_associative():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 60, size=3000)
    b = rng.integers(0, 1 << 60, size=3000)
    both = S._hll_registers(np.concatenate([a, b]))
    merged = np.maximum(S._hll_registers(a), S._hll_registers(b))
    assert (both == merged).all()


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_hll_estimate_error_bound(n):
    rng = np.random.default_rng(n)
    # distinct 64-bit draws (collisions negligible)
    vals = rng.integers(0, 1 << 62, size=n)
    est = S._hll_estimate(S._hll_registers(vals))
    # standard error 1.04/sqrt(4096) ~= 1.6 %; allow 5 sigma
    assert abs(est - n) / n < 0.082, (n, est)


def test_hll_operator_tracks_exact(ray_session):
    exact = S.distinct_users(SF).to_pandas().set_index("event_type")
    approx = S.hll_distinct_users(SF).to_pandas().set_index("event_type")
    assert sorted(exact.index) == sorted(approx.index)
    for t in exact.index:
        e = int(exact.loc[t, "n_users"])
        a = int(approx.loc[t, "n_users_est"])
        assert abs(a - e) / max(e, 1) < 0.05, (t, e, a)


# ---- heavy hitters: exact threshold edge ----

def _write_docs(tmp_path, texts):
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def test_heavy_hitters_exact_threshold(ray_session, tmp_path):
    # N = 2 * HH_S tokens; 'edge' appears exactly 2 times = N/HH_S
    # (NOT > N/HH_S -> excluded); 'over' appears 3 times (included).
    s = S.HH_S
    fillers = [f"w{i}" for i in range(2 * s - 5)]
    toks = fillers + ["edge", "edge", "over", "over", "over"]
    assert len(toks) == 2 * s
    # spread across docs so multiple batches see them
    docs = [" ".join(toks[i::10]) for i in range(10)]
    d = _write_docs(tmp_path, docs)
    got = S.heavy_hitters(d).to_pandas()
    want = _oracle(d, S.sql_heavy_hitters())
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)
    assert set(got.term) == {"over"}


def test_grouped_topk_ties_deterministic(ray_session, tmp_path):
    # equal n_chars -> doc_id ascending breaks the tie on both sides
    texts = ["aaaa"] * 7 + ["bb"] * 3
    d = _write_docs(tmp_path, texts)
    got = S.grouped_topk(d).to_pandas()
    want = _oracle(d, S.sql_grouped_topk())
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)
    assert got.sort_values("rank").doc_id.tolist() == [0, 1, 2]


# ---- PII scrub / normalize on adversarial inputs ----

def test_pii_and_normalize_adversarial(ray_session, tmp_path):
    from raysearch.pipelines import textops as T

    texts = [
        "contact bob.smith+tag@sub.example.co.uk or call +1 (415) 555-0199",
        "server at 192.168.0.1 and 10.0.0.255, backup 999.999.999.999",
        "no pii here, just   multiple   spaces\tand\ttabs",
        "",
        "  edge whitespace  ",
        "two emails a@b.io c@d.org then 123-456-7890 and 0800 123 456",
        "MiXeD CaSe TEXT\nwith\nnewlines",
        "digits 1234567 run 12345678901234",
    ]
    d = _write_docs(tmp_path, texts)
    for name in ("pii_scrub", "normalize_text"):
        got = T.QUERIES[name](d).to_pandas()
        want = _oracle(d, T.ORACLE_SQL[name])
        pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                      check_dtype=False)
    scrub = T.QUERIES["pii_scrub"](d).to_pandas().set_index("doc_id")
    assert scrub.loc[0, "n_emails"] == 1 and scrub.loc[0, "n_phones"] >= 1
    assert scrub.loc[1, "n_ips"] == 3  # pattern is shape-based ([0-9]{1,3})
    assert scrub.loc[5, "n_emails"] == 2


def test_stratified_sample_rates(ray_session):
    from raysearch.pipelines import joins as J

    got = J.stratified_sample(SF).to_pandas()
    tot = pq.read_table(os.path.join(SF, "documents.parquet"),
                        columns=["lang"]).to_pandas()
    for lang, g in got.groupby("lang"):
        frac = len(g) / (tot.lang == lang).sum()
        want = 0.25 if lang == "en" else 0.5
        assert abs(frac - want) < 0.15, (lang, frac)


def test_distinct_users_bucket_invariance(ray_session, monkeypatch):
    # result must not depend on the bucket cardinality
    base = S.distinct_users(SF).to_pandas()
    import raysearch.hashing as H

    monkeypatch.setattr(S, "auto_buckets",
                        lambda *a, **k: 4, raising=False)
    # patch the symbol the function actually resolves at call time
    orig = H.auto_buckets
    monkeypatch.setattr(H, "auto_buckets", lambda *a, **k: 4)
    try:
        small = S.distinct_users(SF).to_pandas()
    finally:
        monkeypatch.setattr(H, "auto_buckets", orig)
    pd.testing.assert_frame_equal(
        base.sort_values("event_type", ignore_index=True),
        small.sort_values("event_type", ignore_index=True))


def test_rep_signals_adversarial(ray_session, tmp_path):
    """Gopher repetition signals vs oracle on inputs the fixture
    corpus lacks: heavy line dup, empty lines, token dup, empty doc,
    empty-lines-only doc, tabs + double spaces."""
    from raysearch.pipelines import textops as T

    sf = _write_docs(tmp_path, [
        "same line\nsame line\nsame line\nother",
        "a b c\n\n\na b c\n",
        "the the the the unique",
        "",
        "\n\n\n",
        "one\ntwo\nthree",
        "x\nxx\nx\nxx\nx",
        "Tab\there and  spaces\nTab\there",
    ])
    got = _norm(T.rep_signals(sf).to_pandas())
    want = _norm(_oracle(sf, T.sql_rep_signals()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byid = got.set_index("doc_id")
    assert byid.loc[0, "dup_line_frac"] == 0.5
    assert byid.loc[2, "top_word_frac"] == 0.8
    assert byid.loc[4, "n_lines"] == 0


def test_rep_ngram_signals_adversarial(ray_session, tmp_path):
    """N-gram repetition signals vs oracle on boundary inputs: empty
    doc, single token (no bigrams), two tokens (no trigrams),
    all-identical tokens, a repeated 3-token phrase, case folding +
    multiple spaces."""
    from raysearch.pipelines import textops as T

    sf = _write_docs(tmp_path, [
        "",
        "hello",
        "a b",
        "x x x x x",
        "the cat sat the cat sat the cat sat",
        "The  THE\tthe",
    ])
    got = _norm(T.rep_ngram_signals(sf).to_pandas())
    want = _norm(_oracle(sf, T.sql_rep_ngram_signals()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byid = got.set_index("doc_id")
    assert byid.loc[0, "n_bigrams"] == 0
    assert byid.loc[1, "n_bigrams"] == 0
    assert byid.loc[2, "n_bigrams"] == 1
    assert byid.loc[2, "dup_trigram_frac"] == 0.0
    assert byid.loc[3, "top_bigram_frac"] == 1.0
    assert abs(byid.loc[3, "dup_trigram_frac"] - 2 / 3) < 1e-6
    assert byid.loc[4, "top_bigram_frac"] == 0.375
    assert abs(byid.loc[4, "dup_trigram_frac"] - 4 / 7) < 1e-6
    assert byid.loc[5, "top_bigram_frac"] == 1.0


def test_gopher_filters_adversarial(ray_session, tmp_path):
    """Gopher quality rules vs oracle on threshold-straddling inputs:
    empty doc, 49 vs 50 words, mean-word-length just over 10,
    non-alpha-heavy doc, exactly-2 vs 1 distinct stopwords, case
    folding."""
    from raysearch.pipelines import textops as T

    base = "the be word" + " word" * 47          # 50 words, 2 stops
    sf = _write_docs(tmp_path, [
        "",
        "the be" + " word" * 47,                 # 49 words
        base,                                    # kept
        "the be " + " ".join(["x" * 11] * 48),   # mwl > 10
        "the be " + " ".join(["123"] * 48),      # alpha frac 2/50
        "the the" + " word" * 48,                # 1 distinct stopword
        "THE BE word" + " Word" * 47,            # folds to kept
    ])
    got = _norm(T.gopher_filters(sf).to_pandas())
    want = _norm(_oracle(sf, T.sql_gopher_filters()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byid = got.set_index("doc_id").sort_index()
    assert list(byid["kept"]) == [0, 0, 1, 0, 0, 0, 1]
    assert byid.loc[1, "n_words"] == 49
    assert byid.loc[4, "alpha_word_frac"] == 0.04
    assert byid.loc[5, "stopword_hits"] == 1


def test_dup_spans_adversarial(ray_session, tmp_path):
    """Token-span dedup vs oracle: a 5-gram shared across docs counts
    every slot it occupies; a 5-gram repeated only WITHIN one doc does
    not; docs under 5 tokens have zero spans but stay in the result;
    case folds before windowing."""
    from raysearch.pipelines import dedup as D

    shared = "alpha beta gamma delta epsilon"
    sf = _write_docs(tmp_path, [
        shared + " zeta",                 # 2 slots, 1 shared
        "prefix " + shared,               # 2 slots, 1 shared
        shared + " " + shared,            # within + cross: all slots
                                          # containing the shared gram
        "only here repeated only here repeated only here",  # self-rep
        "short doc here",                 # < 5 tokens -> 0 spans
        "",
        "ALPHA Beta GAMMA delta EPSILON",  # folds to the shared gram
    ])
    got = _norm(D.dup_spans(sf).to_pandas())
    want = _norm(_oracle(sf, D.sql_dup_spans()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byid = got.set_index("doc_id").sort_index()
    assert byid.loc[4, "n_spans"] == 0
    assert byid.loc[5, "n_spans"] == 0
    assert byid.loc[0, "n_dup_spans"] == 1
    assert byid.loc[1, "n_dup_spans"] == 1
    assert byid.loc[6, "n_spans"] == 1
    assert byid.loc[6, "n_dup_spans"] == 1
    # doc 3's repeats exist only within itself -> nothing dup
    assert byid.loc[3, "n_dup_spans"] == 0


def test_para_dedup_adversarial(ray_session, tmp_path):
    """Paragraph dedup vs oracle: cross-doc dup lines, within-doc-only
    repeats (must NOT count), empty docs, blank-line-only docs,
    trailing newline, whitespace-only lines."""
    from raysearch.pipelines import dedup as D

    sf = _write_docs(tmp_path, [
        "shared line\nunique one",
        "shared line\nshared line\nother",
        "",
        "\n\n",
        "only here\nonly here",
        "shared line",
        "tail\n",
        "  \n x",
    ])
    got = _norm(D.para_dedup(sf).to_pandas())
    want = _norm(_oracle(sf, D.sql_para_dedup()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byid = got.set_index("doc_id").sort_index()
    assert list(byid["n_dup_paras"]) == [1, 2, 0, 0, 0, 1, 0, 0]
    assert byid.loc[4, "dup_para_frac"] == 0.0   # within-doc only
    assert byid.loc[2, "n_paras"] == 0


def test_decontaminate_adversarial(ray_session, tmp_path):
    """Benchmark decontamination: a doc embedding a benchmark doc's
    text is flagged; benchmark self-hits are not; <5-token docs have
    no grams. Engine vs oracle plus direct assertions."""
    import pyarrow.parquet as _pq

    from raysearch.pipelines import textops as T

    bench = "alpha beta gamma delta epsilon zeta eta theta"
    tbl = pa.table({
        "doc_id": pa.array([0, 101, 202, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            bench,
            "totally different benchmark words here ok",
            "x",
            "prefix junk " + bench + " suffix",
            "alpha beta gamma delta",
            "clean doc with no shared five gram runs",
            "",
        ], pa.string()),
        "lang": pa.array(["en"] * 7),
        "source": pa.array(["t"] * 7),
        "n_chars": pa.array([0] * 7, pa.int64()),
    })
    _pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    sf = str(tmp_path)
    got = _norm(T.decontaminate(sf).to_pandas())
    want = _norm(_oracle(sf, T.sql_decontaminate()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byid = got.set_index("doc_id")
    assert byid.loc[1, "contaminated"] == 1
    assert byid.loc[0, "contaminated"] == 0      # benchmark self-hit
    assert byid.loc[0, "is_benchmark"] == 1
    assert byid.loc[2, "n_grams"] == 0           # <5 tokens
    assert byid.loc[4, "contaminated"] == 0      # 4 tokens, no 5-gram


def test_rolling_active_users_adversarial(ray_session, tmp_path):
    """Window membership edges: a user active on day d counts in
    windows d..d+6 only (d+7 excluded); duplicate (user, day) pairs
    across FILES (forcing cross-batch dedup) count once; two users on
    one day count twice. Engine vs DuckDB oracle + semantic spots."""
    import duckdb
    from raysearch.pipelines.sketches import (_DAY_US,
                                              rolling_active_users,
                                              sql_rolling_active_users)

    def ev(eid, day, frac_us, uid):
        return (eid, day * _DAY_US + frac_us, uid)

    rows_a = [ev(1, 100, 10, 7), ev(2, 100, 20, 7),   # same user+day
              ev(3, 107, 30, 7),                      # d+7: new window
              ev(4, 100, 40, 8)]
    rows_b = [ev(5, 100, 50, 7),                      # dup across files
              ev(6, 103, 60, 8)]
    for i, rows in enumerate((rows_a, rows_b)):
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        })
        os.makedirs(os.path.join(tmp_path, "events.parquet"),
                    exist_ok=True)
        pq.write_table(tbl, os.path.join(tmp_path, "events.parquet",
                                         f"part-{i}.parquet"))
    eng = rolling_active_users(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet/*.parquet')")
    ora = con.execute(sql_rolling_active_users()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    by_w = eng.set_index("window_day").n_users
    assert by_w.loc[100] == 2          # users 7 and 8 on day 100
    assert by_w.loc[106] == 2          # day-100 activity still visible
    assert by_w.loc[107] == 2          # user 7 via day 107, user 8 via 103
    assert by_w.loc[110] == 1          # only user 7's day-107 remains
    assert 113 in by_w.index and 114 not in by_w.index


def test_decontaminate_bloom_superset(ray_session, tmp_path, monkeypatch):
    """Bloom decontamination NEVER false-negatives: flags a superset
    of the exact operator — asserted at the default filter size (where
    it should match exactly on this load factor) AND under a
    deliberately undersized 256-bit filter that forces false
    positives."""
    import numpy as np

    from raysearch.pipelines import textops as T

    # corpus with real contamination: doc 0 is benchmark (0 % 101 == 0),
    # doc 7 embeds one of its 5-grams, others are clean
    texts = {
        0: "alpha beta gamma delta epsilon zeta",
        7: "prefix words alpha beta gamma delta epsilon more",
        3: "totally different tokens here one two three",
        5: "yet another clean document body with words",
    }
    ids = sorted(texts)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string()),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["t"] * len(ids)),
        "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))

    ex = T.decontaminate(str(tmp_path)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    bl = T.decontaminate_bloom(str(tmp_path)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert (bl.n_maybe_contam >= ex.n_contam).all()
    pd.testing.assert_series_equal(bl.contaminated, ex.contaminated)
    assert ex.set_index("doc_id").contaminated.loc[7] == 1

    # undersized filter: everything the exact op flags MUST stay
    # flagged; extra flags (false positives) are allowed
    monkeypatch.setattr(T, "_BLOOM_M", np.uint64(256))
    monkeypatch.setattr(T, "_BLOOM_WORDS", 4)
    tiny = T.decontaminate_bloom(str(tmp_path)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert (tiny.n_maybe_contam >= ex.n_contam).all()
    assert (tiny.contaminated >= ex.contaminated).all()


def test_cohort_retention_adversarial(ray_session, tmp_path):
    """Cohort edges: k is the exact day offset from a user's FIRST
    activity day (k=0 rows are cohort sizes); offsets past
    RETENTION_MAX_K are dropped; duplicate (user, day) pairs across
    files count once; a later-joining user lands in its own cohort.
    Engine vs DuckDB oracle + semantic spots."""
    import duckdb
    from raysearch.pipelines.sketches import (RETENTION_MAX_K, _DAY_US,
                                              cohort_retention,
                                              sql_cohort_retention)

    def ev(eid, day, frac_us, uid):
        return (eid, day * _DAY_US + frac_us, uid)

    rows_a = [ev(1, 100, 10, 7), ev(2, 100, 20, 7),    # same user+day
              ev(3, 103, 30, 7),                       # k=3
              ev(4, 100 + RETENTION_MAX_K, 40, 7),     # k=K kept
              ev(5, 100 + RETENTION_MAX_K + 1, 50, 7),  # k=K+1 dropped
              ev(6, 100, 60, 8)]                       # same cohort
    rows_b = [ev(7, 103, 70, 7),                       # dup across files
              ev(8, 105, 80, 9),                       # later cohort
              ev(9, 106, 90, 9)]                       # its k=1
    for i, rows in enumerate((rows_a, rows_b)):
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([""] * len(rows)),
        })
        os.makedirs(os.path.join(tmp_path, "events.parquet"),
                    exist_ok=True)
        pq.write_table(tbl, os.path.join(tmp_path, "events.parquet",
                                         f"part-{i}.parquet"))

    eng = cohort_retention(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet/*.parquet')")
    ora = con.execute(sql_cohort_retention()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    m = eng.set_index(["cohort_day", "k"]).n_users
    assert m.loc[(100, 0)] == 2                       # users 7 and 8
    assert m.loc[(100, 3)] == 1                       # day-103 once
    assert m.loc[(100, RETENTION_MAX_K)] == 1         # boundary kept
    assert (100, RETENTION_MAX_K + 1) not in m.index  # boundary drop
    assert m.loc[(105, 0)] == 1 and m.loc[(105, 1)] == 1  # user 9


def test_bpe_merges_adversarial(ray_session, tmp_path):
    """BPE trainer vs the unrolled SQL oracle on the semantics that
    matter: greedy non-overlapping counts ('aaaa' has TWO (a,a)
    applications, 'aaa' has one), merged-symbol cascades ('abab' ->
    (a,b) then (ab,ab)), and the deterministic tie order."""
    from raysearch.pipelines import bpe as B

    sf = _write_docs(tmp_path, [
        "aaaa aaaa aaaa",          # (a,a) x2 per word
        "abab abab",               # cascade: ab then abab
        "xy xy xy",                # tie fodder
        "q",                       # single-symbol word: no pairs
    ])
    got = B.bpe_merges(sf).to_pandas()
    want = _oracle(sf, B.sql_bpe_merges())
    pd.testing.assert_frame_equal(
        got, want.astype({"step": "int64", "pair_count": "int64"}),
        check_dtype=False)
    # step 1 must be (a,a) with greedy count 2*3 words = 6
    assert (got.iloc[0]["left"], got.iloc[0]["right"]) == ("a", "a")
    assert got.iloc[0]["pair_count"] == 6
    # the cascade merge (aa,aa) or (ab/xy families) must appear with
    # a MERGED multi-char symbol on one side within the first steps
    assert any(len(l) > 1 or len(r) > 1
               for l, r in zip(got["left"], got["right"]))
    # steps are 1..n with no gaps
    assert list(got["step"]) == list(range(1, len(got) + 1))


def test_c4_filters_adversarial(ray_session, tmp_path):
    """C4 line/punctuation rules vs oracle: terminal-punct detection
    incl. closing quote, short-line counting, sentence threshold at
    exactly 3, brace and lorem-ipsum flags, empty docs."""
    from raysearch.pipelines import textops as T

    sf = _write_docs(tmp_path, [
        "A good sentence here.\nAnother one!\nIs this real?",   # kept
        'He said "stop."\nshort\nok line here.',
        "code { return 1; } with. three. dots.",                # brace
        "Lorem Ipsum dolor sit. amet. consectetur.",            # phrase
        "only two. enders!",                                    # < 3
        "",
        "no punctuation at all just words",
    ])
    got = _norm(T.c4_filters(sf).to_pandas())
    want = _norm(_oracle(sf, T.sql_c4_filters()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byid = got.set_index("doc_id").sort_index()
    assert byid.loc[0, "kept"] == 1
    assert byid.loc[0, "term_punct_frac"] == 1.0
    assert byid.loc[1, "short_line_frac"] == round(1 / 3, 6)
    assert byid.loc[2, "has_brace"] == 1 and byid.loc[2, "kept"] == 0
    assert byid.loc[3, "has_bad_phrase"] == 1 and byid.loc[3, "kept"] == 0
    assert byid.loc[4, "n_sentences"] == 2 and byid.loc[4, "kept"] == 0
    assert byid.loc[5, "n_lines"] == 0


def test_export_by_lang_sink(ray_session, tmp_path):
    """Partitioned sink: summary counts come from written footers and
    must equal both the oracle and a full read-back; kept-dir mode
    leaves hive-partitioned files on disk."""
    import duckdb as _dd

    from raysearch.pipelines import extras as E

    (tmp_path / "in").mkdir()
    sf = _write_docs(tmp_path / "in",
                     ["one doc", "zwei", "drei", "vier", "cinq"])
    # vary langs: rewrite with a lang column mix
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(sf, "documents.parquet"))
    t = t.set_column(t.schema.get_field_index("lang"), "lang",
                     pa.array(["en", "de", "de", "de", "fr"]))
    _pq.write_table(t, os.path.join(sf, "documents.parquet"))

    out = tmp_path / "sink"
    got = E.export_by_lang(sf, out_dir=str(out)).to_pandas()
    assert dict(zip(got.lang, got.n_rows)) == {"en": 1, "de": 3, "fr": 1}
    back = _dd.connect().execute(
        f"SELECT lang, count(*) FROM read_parquet('{out}/lang=*/*.parquet',"
        f" hive_partitioning=1) GROUP BY lang").df()
    assert dict(zip(back.iloc[:, 0], back.iloc[:, 1])) == \
        {"en": 1, "de": 3, "fr": 1}
    # a re-run into the same out_dir overwrites (no double counting)
    rerun = E.export_by_lang(sf, out_dir=str(out)).to_pandas()
    assert rerun.equals(got)
    # gate path cleans up its temp dir
    got2 = E.export_by_lang(sf).to_pandas()
    assert got2.n_rows.sum() == 5


def test_bpe_encode_adversarial(ray_session, tmp_path):
    """Encoding with the trained merges vs the unrolled SQL replay:
    cascaded merges shrink 'abab' to one symbol, unmergeable words
    keep codepoint length, empty docs emit 0 symbols, and total
    symbols = words' encoded lengths (no cross-word merging)."""
    from raysearch.pipelines import bpe as B

    sf = _write_docs(tmp_path, [
        "aaaa aaaa aaaa",
        "abab abab",
        "xy xy xy",
        "q",
        "",                         # zero-token doc -> 0 symbols
        "zw",                       # symbols never trained on
    ])
    got = B.bpe_encode(sf).to_pandas()
    want = _oracle(sf, B.sql_bpe_encode())
    pd.testing.assert_frame_equal(
        got, want.astype({c: "int64" for c in
                          ("doc_id", "n_words", "n_symbols")}),
        check_dtype=False)
    byid = got.set_index("doc_id")
    assert byid.loc[4, "n_words"] == 0
    assert byid.loc[4, "n_symbols"] == 0
    # with K=6 merges on this tiny vocab even (z,w) trains eventually
    # — the invariants that always hold: at least one symbol per word,
    # and merging never grows a word beyond its codepoint count
    assert (got[got.n_words > 0].n_symbols
            >= got[got.n_words > 0].n_words).all()
    assert byid.loc[0, "n_symbols"] <= 4 * 3  # <= codepoints of doc 0


def test_slot_dedup_zero_doc_corpus(ray_session, tmp_path):
    """A zero-row documents table must yield an empty result, not a
    KeyError from sort_values on a column-less frame."""
    from raysearch.pipelines import dedup as D

    sf = _write_docs(tmp_path, [])
    for fn in (D.para_dedup, D.dup_spans):
        out = fn(sf).to_pandas()
        assert len(out) == 0 and "doc_id" in out.columns


def test_script_stats_adversarial(ray_session, tmp_path):
    """Unicode-script profile vs oracle: mixed scripts, tie between
    classes (alphabetical winner), unclassified-only text ('none'),
    empty docs, katakana (outside every class) vs Han."""
    from raysearch.pipelines import textops as T

    sf = _write_docs(tmp_path, [
        "héllo мир 日本語 123 عربى",     # mixed, latin wins (5)
        "日本語テスト",                   # 3 Han + katakana (unclassified)
        "абв abc",                        # 3 cyrillic vs 3 latin: TIE
                                          # -> 'cyrillic' (alphabetical)
        "!!! ???",                        # zero classified -> 'none'
        "",
        "12345",                          # digits dominate
    ])
    got = _norm(T.script_stats(sf).to_pandas())
    want = _norm(_oracle(sf, T.sql_script_stats()))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    byid = got.set_index("doc_id").sort_index()
    assert byid.loc[0, "dominant"] == "latin"
    assert byid.loc[1, "dominant"] == "han"
    assert byid.loc[1, "n_han"] == 3
    assert byid.loc[2, "dominant"] == "cyrillic"   # tie -> alphabetical
    assert byid.loc[3, "dominant"] == "none"
    assert byid.loc[4, "dominant"] == "none"
    assert byid.loc[5, "dominant"] == "digit"


def test_heavy_hitters_ss_bounds(ray_session, tmp_path, monkeypatch):
    """SpaceSaving guarantees on a forced-compression corpus
    (SS_CAP=3 < vocab): every reported term's true count lies in
    [cnt_lo, cnt_hi], and no term with true count > E (= total
    discarded-max) is missed."""
    monkeypatch.setattr(S, "SS_CAP", 3)
    monkeypatch.setattr(S, "SS_K", 100)
    texts = [
        "big big big big mid mid small rare1",
        "big big big mid mid mid small rare2",
        "big big mid small small rare3 rare4 rare5",
    ]
    d = _write_docs(tmp_path, texts)
    got = S.heavy_hitters_ss(d).to_pandas()
    # exact truth from the raw texts
    import collections
    truth = collections.Counter(" ".join(texts).split())
    for _, r in got.iterrows():
        assert r.cnt_lo <= truth[r.term] <= r.cnt_hi, \
            (r.term, truth[r.term], r.cnt_lo, r.cnt_hi)
    err_total = int(got.cnt_hi.iloc[0] - got.cnt_lo.iloc[0])
    missed = set(truth) - set(got.term)
    for t in missed:
        assert truth[t] <= err_total, (t, truth[t], err_total)
    # the two dominant terms are always found and ordered first
    assert got.term.iloc[0] == "big" and got.term.iloc[1] == "mid"


def test_heavy_hitters_ss_exact_when_under_cap(ray_session, tmp_path):
    """vocab <= SS_CAP: nothing is ever discarded, so E = 0 and
    cnt_lo == cnt_hi == the exact count for every term."""
    texts = ["aa aa bb", "aa bb cc", "cc cc cc aa"]
    d = _write_docs(tmp_path, texts)
    got = S.heavy_hitters_ss(d).to_pandas()
    import collections
    truth = collections.Counter(" ".join(texts).split())
    assert (got.cnt_lo == got.cnt_hi).all()
    assert {t: int(n) for t, n in zip(got.term, got.cnt_lo)} == dict(truth)


def test_cms_guarantees(ray_session, tmp_path):
    """CMS pins: estimates never undercount, the absent term reads 0
    unless a collision inflates it, and a high-collision corpus
    (vocab >> probe set, N*e/W ~ 3) keeps overestimates inside a
    loose Markov-bound multiple."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raysearch.pipelines import sketches as sk

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(5000)] + ["hash", "dup", "the"]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(200)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    t = sk.cms_term_counts(str(tmp_path)).to_pandas()
    assert (t.est >= t.exact).all()          # one-sided error
    assert (t.overestimate >= 0).all()
    n_tokens = 200 * 40
    bound = int(np.e * n_tokens / sk.CMS_W) + 1   # ~6 expected
    assert (t.overestimate <= 12 * bound).all()   # loose tail multiple


def test_cms_rows_deterministic_and_mergeable():
    """Row hashes are stable across calls/processes (md5-based, not
    Python's salted hash) and partial sketches merge by addition."""
    import numpy as np

    from raysearch.pipelines.sketches import (CMS_D, CMS_W, _cms_rows)

    terms = np.array(["alpha", "beta", "gamma"], dtype=object)
    a, b = _cms_rows(terms), _cms_rows(terms)
    assert (a == b).all() and a.shape == (CMS_D, 3)
    assert (a >= 0).all() and (a < CMS_W).all()
    # add-merge: sketch(x+y) == sketch(x) + sketch(y) by construction
    t1 = np.zeros((CMS_D, CMS_W), np.int64)
    t2 = np.zeros((CMS_D, CMS_W), np.int64)
    tall = np.zeros((CMS_D, CMS_W), np.int64)
    for r in range(CMS_D):
        np.add.at(t1[r], a[r][:2], [3, 5])
        np.add.at(t2[r], a[r][2:], [7])
        np.add.at(tall[r], a[r], [3, 5, 7])
    assert (t1 + t2 == tall).all()
