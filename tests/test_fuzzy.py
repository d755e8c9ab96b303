"""fuzzy_name_pairs: DuckDB parity on adversarial name sets — the
'ab'/'ba' shared-variant-but-distance-2 trap, duplicate names (dist
0), empty strings, Unicode (CJK + astral-plane emoji), length-diff-2
non-pairs — plus bucket invariance and the blocking guarantee."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysearch.pipelines import fuzzy as F


def _write_customers(tmp_path, names):
    n = len(names)
    tbl = pa.table({
        "c_custkey": pa.array(list(range(1, n + 1)), pa.int64()),
        "c_name": pa.array(list(names), pa.string()),
        "c_nationkey": pa.array([0] * n, pa.int32()),
        "c_acctbal": pa.array([0.0] * n, pa.float64()),
        "c_mktsegment": pa.array(["X"] * n, pa.string()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "customer.parquet"))
    return str(tmp_path)


def _parity(sf):
    eng = F.fuzzy_name_pairs(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{sf}/customer.parquet')")
    ora = con.execute(F.sql_fuzzy_name_pairs()).df()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False,
                                  check_exact=True)
    return eng


NAMES = [
    "ab",        # 1: transposition trap with 2 ('ba' shares variant 'b')
    "ba",        # 2
    "abc",       # 3: deletion pair with 4, substitution with 5
    "abcd",      # 4
    "abd",       # 5
    "dup",       # 6: exact duplicate of 7 -> dist 0
    "dup",       # 7
    "",          # 8: empty; dist 1 to any single char
    "a",         # 9
    "xyzzy",     # 10: isolated
    "日本語",     # 11: CJK; BYTE distance 3 to 12 (not a pair — the
    "日本話",     # 12: contract is UTF-8 bytes, like SQL levenshtein)
    "a💡b",      # 13: emoji; byte distance 4 to 'ab' (not a pair)
    "ab💡b",     # 14: one inserted ASCII byte vs 13 -> dist 1
]


def test_fuzzy_adversarial(ray_session, tmp_path):
    sf = _write_customers(tmp_path, NAMES)
    eng = _parity(sf)
    pairs = set(zip(eng.custkey_a, eng.custkey_b))
    assert (1, 2) not in pairs          # 'ab'/'ba' is distance 2
    assert (3, 4) in pairs and (3, 5) in pairs
    assert (6, 7) in pairs              # exact duplicates
    assert int(eng.set_index(["custkey_a", "custkey_b"])
               .loc[(6, 7), "dist"]) == 0
    assert (8, 9) in pairs              # '' vs 'a'
    assert (11, 12) not in pairs        # CJK sub = 3 BYTES, not 1
    assert (1, 13) not in pairs         # 'ab' vs 'a💡b' = 4 bytes
    assert (13, 14) in pairs            # single-byte insertion
    assert not any(a == 10 or b == 10 for a, b in pairs)


def test_fuzzy_blocking_guarantee(ray_session, tmp_path):
    # random short strings over a tiny alphabet: dense dist-1 pairs;
    # the SymSpell blocking must reproduce the exact cross join
    rng = np.random.default_rng(11)
    names = ["".join(rng.choice(list("abc"), size=rng.integers(1, 5)))
             for _ in range(80)]
    sf = _write_customers(tmp_path, names)
    eng = _parity(sf)
    assert len(eng) > 0


def test_fuzzy_bucket_invariance(ray_session, tmp_path, monkeypatch):
    sf = _write_customers(tmp_path, NAMES)
    results = {}
    for nb in (2, 64):
        monkeypatch.setattr("raysearch.hashing.auto_buckets",
                            lambda n, _nb=nb, **kw: _nb)
        results[nb] = F.fuzzy_name_pairs(sf).to_pandas()
    pd.testing.assert_frame_equal(results[2], results[64])


def _write_docs(tmp_path, texts):
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_spellfix_adversarial(ray_session, tmp_path, monkeypatch):
    # vocabulary: 'cat' (df 1), 'car' (df 4), 'bat'/'bag' (equal df 2)
    monkeypatch.setattr(F, "SPELL_QUERIES", [
        "cat",        # exact match must WIN over higher-df 'car'
        "caf",        # dist-1 of both cat and car -> df picks 'car'
        "ba",         # dist-1 of bat and bag, equal df -> 'bag' (asc)
        "zzz car",    # 'zzz' has no candidate -> dropped
        "caf cat",    # weights: caf->car, cat stays
    ])
    d = _write_docs(tmp_path, [
        "cat car bat bag",
        "car bat bag",
        "car other words",
        "car again",
    ])
    eng = F.spellfix_topk(d).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.execute(F.sql_spellfix_topk()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True),
        check_dtype=False)
    # query 0 ('cat'): only doc 0 contains cat -> single result
    q0 = eng[eng.query_id == 0]
    assert q0.doc_id.tolist() == [0]
    # query 3: 'zzz' dropped, results = the 'car' docs (all 4)
    assert set(eng[eng.query_id == 3].doc_id) == {0, 1, 2, 3}


def test_spellfix_no_candidates_anywhere(ray_session, tmp_path,
                                         monkeypatch):
    # a corpus whose vocabulary is nowhere near any query term: every
    # term drops, the correction scan returns ZERO candidate batches
    # (the concat guard), and the result is empty like the oracle's
    monkeypatch.setattr(F, "SPELL_QUERIES", ["qqqqq wwwww"])
    d = _write_docs(tmp_path, ["alpha beta gamma", "delta epsilon"])
    eng = F.spellfix_topk(d).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.execute(F.sql_spellfix_topk()).df()
    assert len(eng) == 0 and len(ora) == 0
