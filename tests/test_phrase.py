"""phrase_topk adversarial checks beyond the fixed-testdata oracle:
overlapping occurrences, document-boundary isolation, >k hit
truncation — driven over a synthetic documents.parquet against the
same DuckDB oracle SQL."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture()
def adv_dir(tmp_path):
    texts = [
        "na na na na na",                      # overlapping: 'na na' x4
        "the merge",                            # ends with phrase head...
        "sort begins this one",                 # ...next doc starts w/ tail
        "merge sort merge sort merge sort",     # repeated full phrase
        "",                                     # empty doc
        "hash join hash join",                  # another phrase
        "just filler words here",
    ] + [f"merge sort filler {i}" for i in range(12)]  # >k hits
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_phrase_adversarial(ray_session, adv_dir, monkeypatch):
    from raysearch.pipelines import search_queries as SQ

    phrases = [["merge", "sort"], ["na", "na"], ["hash", "join"],
               ["absent", "phrase"]]
    monkeypatch.setattr(SQ, "PHRASE_QUERIES", phrases)
    eng = SQ.phrase_topk(adv_dir).to_pandas()

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{adv_dir}/documents.parquet')")
    ora = con.execute(SQ.sql_phrase_topk()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()))

    # overlapping occurrences counted: 5x 'na' -> 4 matches of 'na na'
    assert int(eng[(eng.phrase_id == 1)
                   & (eng.doc_id == 0)].tf.iloc[0]) == 4
    # doc 1 ('the merge') + doc 2 ('sort ...') must NOT produce a
    # cross-document 'merge sort' match
    ms = eng[eng.phrase_id == 0]
    assert not set(ms.doc_id) & {1, 2}
    # repeated full phrase: tf 3, ranked first
    top = ms[ms["rank"] == 1].iloc[0]
    assert top.doc_id == 3 and top.tf == 3
    # >k hits truncate at k
    assert len(ms) == SQ.TOPK
    # absent phrase yields no rows
    assert (eng.phrase_id != 3).all()
