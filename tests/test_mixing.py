"""mix_weights: oracle parity on adversarial inputs (zero-token
language, single-language corpus) plus the alpha-smoothing
invariants."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_docs(path, rows):
    langs, texts = zip(*rows)
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
        "lang": pa.array(list(langs), pa.string()),
        "source": pa.array(["t"] * len(rows)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))
    return str(path)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(sql).df()


def test_mix_weights_adversarial(ray_session, tmp_path):
    from raysearch.pipelines.mixing import ORACLE_SQL, mix_weights

    d = _write_docs(tmp_path, [
        ("en", "one two three four five six seven eight"),
        ("en", "more english words in this row"),
        ("de", "nur drei worte"),
        ("xx", ""),           # zero-token language: weight 0, epochs 0
        ("xx", "   "),        # whitespace-only
    ])
    eng = mix_weights(d).to_pandas()
    ora = _oracle(d, ORACLE_SQL["mix_weights"])
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()),
        check_exact=True)
    xx = eng[eng.lang == "xx"].iloc[0]
    assert xx.n_tokens == 0 and xx.weight == 0.0 and xx.epochs == 0.0
    assert abs(eng.weight.sum() - 1.0) < 1e-5
    # alpha < 1 compresses: the small domain's weight exceeds its
    # proportional token share, the big one's is below
    en = eng[eng.lang == "en"].iloc[0]
    de = eng[eng.lang == "de"].iloc[0]
    tot = eng.n_tokens.sum()
    assert de.weight > de.n_tokens / tot
    assert en.weight < en.n_tokens / tot
    assert de.epochs > 1.0 > en.epochs


def test_mix_weights_single_lang(ray_session, tmp_path):
    from raysearch.pipelines.mixing import mix_weights

    d = _write_docs(tmp_path, [("en", "a b c"), ("en", "d e")])
    eng = mix_weights(d).to_pandas()
    assert len(eng) == 1
    assert eng.weight.iloc[0] == 1.0 and eng.epochs.iloc[0] == 1.0


def test_pmi_top_bigrams_adversarial(ray_session, tmp_path):
    """Min-count boundary (exactly PMI_MIN_COUNT kept, one less
    dropped), cross-doc adjacency never counted, single-token and
    empty docs contribute unigrams only; full oracle parity."""
    import duckdb

    from raysearch.pipelines.extras import (PMI_MIN_COUNT,
                                            pmi_top_bigrams,
                                            sql_pmi_top_bigrams)

    rows = []
    # "aa bb" appears exactly PMI_MIN_COUNT times (kept);
    # "cc dd" PMI_MIN_COUNT - 1 times (dropped)
    rows += [("en", "aa bb filler")] * PMI_MIN_COUNT
    rows += [("en", "cc dd filler")] * (PMI_MIN_COUNT - 1)
    rows += [("en", "cc")]          # single token: unigram only
    rows += [("en", "dd")]          # if cross-doc joined, cc dd += 1
    rows += [("en", "")]
    langs, texts = zip(*rows)
    tbl = pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
        "lang": pa.array(list(langs), pa.string()),
        "source": pa.array(["t"] * len(rows)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    eng = pmi_top_bigrams(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ora = con.execute(sql_pmi_top_bigrams()).df()
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    pairs = set(zip(eng.w1, eng.w2))
    assert ("aa", "bb") in pairs
    assert ("cc", "dd") not in pairs


def test_mix_sample_rebalances(ray_session, tmp_path):
    """The sampler executes the alpha-smoothed plan: the dominant
    language's realized keep-rate is strictly below a small
    language's; zero-token languages are excluded; membership is
    deterministic; full oracle parity."""
    from raysearch.pipelines.mixing import ORACLE_SQL, mix_sample

    rows = ([("en", "many english tokens appear in this document "
              * 4)] * 40
            + [("de", "wenige deutsche worte hier")] * 8
            + [("xx", "")] * 3)
    d = _write_docs(tmp_path, rows)
    eng = mix_sample(d).to_pandas()
    ora = _oracle(d, ORACLE_SQL["mix_sample"])
    cols = sorted(eng.columns)
    pd.testing.assert_frame_equal(
        eng[cols].sort_values(cols, ignore_index=True),
        ora[cols].sort_values(cols, ignore_index=True)
        .astype(eng[cols].dtypes.to_dict()), check_exact=True)
    assert "xx" not in set(eng.lang)
    kept = eng.lang.value_counts()
    en_rate = kept.get("en", 0) / 40
    de_rate = kept.get("de", 0) / 8
    assert en_rate < de_rate
    again = mix_sample(d).to_pandas()
    pd.testing.assert_frame_equal(
        eng.sort_values(cols, ignore_index=True),
        again.sort_values(cols, ignore_index=True))
