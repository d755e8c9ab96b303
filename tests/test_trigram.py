"""Property tests for trigram-index regex search: encoding rules,
batch-composition invariance of the derived corpus, candidate
soundness (superset) and end-to-end exactness vs brute force."""

import os
import re
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_literal_trigram_encoding():
    from raysearch.pipelines.trigram import literal_trigrams

    # space and control bytes map to '_', case folds, dedup + sort
    assert literal_trigrams("Hash Join") == sorted(
        {"has", "ash", "sh_", "h_j", "_jo", "joi", "oin"})
    assert literal_trigrams("a\tb c") == literal_trigrams("a b c")
    # short literals yield nothing below the window
    assert literal_trigrams("abc") == ["abc"]


def test_trigram_corpus_batch_invariance():
    # a doc's trigram-token string must not depend on which batch it
    # arrives in (the cross-document window-masking invariant)
    import pyarrow as pa

    from raysearch.pipelines.trigram import _trigram_batch

    tbl = pq.read_table(os.path.join(SF, "documents.parquet"),
                        columns=["doc_id", "text"]).slice(0, 10)
    whole = _trigram_batch(tbl).to_pandas()
    parts = []
    for i in range(tbl.num_rows):
        parts.append(_trigram_batch(tbl.slice(i, 1)).to_pandas())
    import pandas as pd

    solo = pd.concat(parts, ignore_index=True)
    assert whole.content.tolist() == solo.content.tolist()
    # tokens re-derive the original trigrams
    txt = tbl["text"][0].as_py().lower()
    grams = [txt[i:i + 3].replace(" ", "_") for i in range(len(txt) - 2)]
    assert whole.content[0].split() == grams


def test_regex_trigram_docs_exact_vs_bruteforce(ray_session):
    from raysearch.pipelines.trigram import (REGEX_QUERIES,
                                             regex_trigram_docs)

    got = regex_trigram_docs(SF).to_pandas()
    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    want = set()
    for qid, (p, _) in enumerate(REGEX_QUERIES):
        rx = re.compile(p)
        for r in docs.itertuples():
            if rx.search(r.text.lower()):
                want.add((qid, int(r.doc_id)))
    assert set(zip(got.query_id, got.doc_id)) == want
    assert len(want) > 0


def test_candidates_are_superset(ray_session):
    # the trigram AND/OR candidate stage alone (no verify) must cover
    # every true match — soundness of the pruning
    from raysearch.pipelines.trigram import (REGEX_QUERIES,
                                             cached_trigram_index,
                                             literal_trigrams)
    from raysearch.segments import (decode_posting_row, part_dirname,
                                    read_postings)
    from raysearch.stats import load_stats

    idx = cached_trigram_index(SF)
    parts = load_stats(idx)["parts"]
    all_grams = sorted({g for _, lits in REGEX_QUERIES
                        for l in lits for g in literal_trigrams(l)})
    post: dict[str, list] = {}
    for part in parts:
        d = part_dirname(idx, part)
        if not os.path.isdir(d):
            continue
        tbl = read_postings(d, all_grams)
        for i in range(tbl.num_rows):
            post.setdefault(tbl["term"][i].as_py(), []).append(
                decode_posting_row(tbl, i)[0])
    merged = {t: np.sort(np.concatenate(v)) for t, v in post.items()}

    docs = pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    for qid, (p, lits) in enumerate(REGEX_QUERIES):
        cand = set()
        for l in lits:
            gs = literal_trigrams(l)
            if any(g not in merged for g in gs):
                continue
            cur = merged[gs[0]]
            for g in gs[1:]:
                cur = cur[np.isin(cur, merged[g], assume_unique=True)]
            cand.update(cur.tolist())
        rx = re.compile(p)
        true = {int(r.doc_id) for r in docs.itertuples()
                if rx.search(r.text.lower())}
        assert true <= cand, (p, true - cand)
