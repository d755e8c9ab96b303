"""Winnowing fingerprint properties beyond the driver oracle check:
the MOSS matching guarantee, batch-composition independence, short-doc
edge cases, and non-ASCII parity against a DuckDB oracle on an
adversarial in-memory table."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raysearch.pipelines.winnow import (  # noqa: E402
    WINNOW_K, WINNOW_W, _winnow_batch, sql_winnow_fingerprints)


def _fps(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    d, f = _winnow_batch(t)
    out = {}
    for doc, fp in zip(d, f):
        out.setdefault(int(doc), set()).add(int(fp))
    return out


def test_matching_guarantee():
    """Any shared substring of >= K + W - 1 chars forces a shared
    fingerprint (the winnowing theorem), even in otherwise-disjoint
    documents."""
    shared = "zqxjvkwpbfyg"  # K + W - 1 = 11 < len
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    a = "aaaaaaaaaaaaaaaa" + shared + "bbbbbbbbbbbbbbbb"
    b = "cccccccccccccccc" + shared + "dddddddddddddddd"
    fps = _fps([a, b])
    assert fps[0] & fps[1]


def test_disjoint_texts_disjoint_fps():
    fps = _fps(["abcdefghijklmnop" * 3, "qrstuvwxyz012345" * 3])
    assert not (fps[0] & fps[1])


def test_batch_composition_independence():
    """Per-doc fingerprints are identical whether docs share a batch
    or arrive alone — the flat-array kernel must never leak a
    neighbor's codepoints into a window."""
    texts = ["the quick brown fox jumps over the lazy dog",
             "x" * (WINNOW_K - 1),          # no grams
             "pack my box with five dozen",
             "y" * (WINNOW_K + 1),          # short: single window
             ""]
    together = _fps(texts)
    alone = {}
    for i, t in enumerate(texts):
        alone.update(_fps([t], ids=[i]))
    assert together == alone


def test_short_docs():
    fps = _fps(["a" * (WINNOW_K - 1)])          # < K chars: no grams
    assert 0 not in fps
    k_exact = _fps(["abcdefgh"])                # exactly one gram
    assert len(k_exact[0]) == 1
    # K <= len < K + W - 1: every gram exists, single truncated window
    t = "abcdefghij"                             # 3 grams, W = 4
    fps = _fps([t])
    grams = [t[i:i + WINNOW_K] for i in range(len(t) - WINNOW_K + 1)]
    hs = [sum(ord(c) * 31 ** (WINNOW_K - 1 - j)
              for j, c in enumerate(g)) for g in grams]
    assert fps[0] == {min(hs)}


def test_repeated_text_collapses():
    """A document of one repeated character has ONE distinct gram ->
    one fingerprint, regardless of length."""
    fps = _fps(["z" * 500])
    assert len(fps[0]) == 1


def test_unicode_parity_vs_duckdb():
    """Codepoint arithmetic (utf-32 view) must match DuckDB's
    unicode(substr(...)) on multi-byte text: accents, CJK, emoji,
    and a mixed doc long enough to winnow properly."""
    texts = ["héllo wörld — ünïcode winnowing tëst çontent hère",
             "中文分词指纹测试中文分词指纹测试中文分词",
             "emoji 🎉 inside 🎉 the 🎉 stream keeps codepoints aligned",
             "plain ascii control for the same kernel and oracle"]
    ids = [7, 11, 13, 17]
    eng = _fps(texts, ids=ids)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(zip(ids, texts)))
    ora = con.execute(sql_winnow_fingerprints()).df()
    want = {}
    for doc, fp in zip(ora.doc_id, ora.fp):
        want.setdefault(int(doc), set()).add(int(fp))
    assert eng == want


def test_pairs_threshold(ray_session):
    """winnow_pairs end-to-end on sf0.001: planted near-dup pairs
    surface, output sorted, counts >= the threshold."""
    from raysearch.pipelines.winnow import WINNOW_MIN_SHARED, winnow_pairs

    t = winnow_pairs("/root/testdata/sf0.001").to_pandas()
    assert len(t) > 0
    assert (t.n_shared >= WINNOW_MIN_SHARED).all()
    assert (t.doc_a < t.doc_b).all()
    # the strongest planted near-dup pair at this sf
    assert ((t.doc_a == 110) & (t.doc_b == 467)).any()
