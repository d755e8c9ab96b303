"""Open-vocabulary model cap (round-4 VERDICT item 3): with
``vocab_cap=K`` the broadcast LM / NB models hold constant bytes no
matter how large the corpus vocabulary grows, while the default
(None) path stays bit-identical to the oracle-checked exact model.

Assertions:
- CONSTANT SIZE: two synthetic corpora whose vocabularies differ 2x
  produce capped models of IDENTICAL array lengths and bytes.
- EXACT WHEN UNSATURATED: a cap >= the true vocabulary routes through
  the capped code path but must reproduce the exact result
  end-to-end (bigram_logprob, trigram_logprob, nb_lang_eval,
  perplexity_buckets).
- SANE WHEN SATURATED: capped bigram scores respect the exact model's
  invariant lp <= 0, and docs built ONLY from kept (frequent) grams
  score identically to the uncapped run.
- EXACT SMOOTHING SCALARS: the NB capped model's vocab size V and
  per-class token totals equal the uncapped model's (only the
  per-class likelihood tables shrink).
"""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# frequent backbone phrase: its grams always survive any cap >= ~10
_COMMON = "the quick brown fox jumps over the lazy dog"


def _highvocab_dir(tmp_path, name: str, n_docs: int, uniq_per_doc: int):
    """n_docs docs, each = the common phrase + uniq_per_doc tokens
    unique to that doc -> vocabulary grows ~n_docs * uniq_per_doc."""
    texts, langs = [], []
    for i in range(n_docs):
        uniq = " ".join(f"u{name}{i}x{j}" for j in range(uniq_per_doc))
        texts.append(_COMMON + " " + uniq)
        langs.append("en" if i % 3 else "de")
    # a doc of ONLY common grams: must score identically under any cap
    texts.append(_COMMON)
    langs.append("en")
    d = tmp_path / name
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    return str(d)


def _frame(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, ignore_index=True)


CAP = 16


def test_bigram_model_bytes_constant(ray_session, tmp_path):
    import ray

    from raysearch.pipelines.lm import _train

    d1 = _highvocab_dir(tmp_path, "a", 40, 6)
    d2 = _highvocab_dir(tmp_path, "b", 80, 6)   # ~2x the vocabulary
    m1 = ray.get(_train(d1, vocab_cap=CAP))
    m2 = ray.get(_train(d2, vocab_cap=CAP))
    for a, b in zip(m1, m2):
        assert len(a) <= CAP and len(b) <= CAP
        assert a.nbytes == b.nbytes       # constant model bytes
    # and without the cap the model tracks the vocabulary
    full2 = ray.get(_train(d2))
    assert len(full2[2]) > 2 * CAP


def test_trigram_model_bytes_constant(ray_session, tmp_path):
    import ray

    from raysearch.pipelines.lm import _train3

    d1 = _highvocab_dir(tmp_path, "c", 40, 6)
    d2 = _highvocab_dir(tmp_path, "d", 80, 6)
    m1 = ray.get(_train3(d1, vocab_cap=CAP))
    m2 = ray.get(_train3(d2, vocab_cap=CAP))
    for a, b in zip(m1, m2):
        assert len(a) <= CAP
        assert a.nbytes == b.nbytes


def test_bigram_cap_unsaturated_is_exact(ray_session, tmp_path):
    from raysearch.pipelines.lm import bigram_logprob

    d = _highvocab_dir(tmp_path, "e", 30, 4)
    exact = _frame(bigram_logprob(d))
    capped = _frame(bigram_logprob(d, vocab_cap=10_000))
    pd.testing.assert_frame_equal(capped, exact)


def test_trigram_cap_unsaturated_is_exact(ray_session, tmp_path):
    from raysearch.pipelines.lm import trigram_logprob

    d = _highvocab_dir(tmp_path, "f", 30, 4)
    pd.testing.assert_frame_equal(
        _frame(trigram_logprob(d, vocab_cap=10_000)),
        _frame(trigram_logprob(d)))


def test_bigram_cap_saturated_scores_sane(ray_session, tmp_path):
    from raysearch.pipelines.lm import bigram_logprob

    d = _highvocab_dir(tmp_path, "g", 40, 6)
    exact = bigram_logprob(d).to_pandas().set_index("doc_id")
    capped = (bigram_logprob(d, vocab_cap=CAP)
              .to_pandas().set_index("doc_id"))
    # same doc coverage, lp <= 0 everywhere (the exact-model invariant
    # the clamp preserves), n_bigrams untouched by the cap
    assert set(capped.index) == set(exact.index)
    assert (capped.logprob <= 0).all()
    pd.testing.assert_series_equal(capped.n_bigrams, exact.n_bigrams)
    # the all-common doc (last doc_id) uses only kept grams with exact
    # counts -> identical score
    last = exact.index.max()
    assert capped.loc[last, "logprob"] == exact.loc[last, "logprob"]


def test_nb_cap_scalars_exact_and_model_bounded(ray_session, tmp_path):
    import ray

    from raysearch.pipelines.nbayes import _train_nb, nb_lang_eval

    d = _highvocab_dir(tmp_path, "h", 60, 6)
    classes_e, per_e, priors_e, vocab_e = ray.get(_train_nb(d))
    classes_c, per_c, priors_c, vocab_c = ray.get(
        _train_nb(d, vocab_cap=CAP))
    assert classes_c == classes_e
    assert vocab_c == vocab_e                 # V stays exact
    np.testing.assert_array_equal(priors_c, priors_e)
    for (he, ne, te), (hc, nc, tc) in zip(per_e, per_c):
        assert tc == te                       # tot_c stays exact
        assert len(hc) <= CAP < len(he)       # tables shrink to cap
        # every kept (token, count) is one of the exact model's rows
        pos = np.searchsorted(he, hc)
        np.testing.assert_array_equal(he[pos], hc)
        np.testing.assert_array_equal(ne[pos], nc)
    # generous cap routes the capped path but reproduces the exact
    # confusion matrix end-to-end
    pd.testing.assert_frame_equal(
        _frame(nb_lang_eval(d, vocab_cap=10_000)),
        _frame(nb_lang_eval(d)))
    # saturated cap still yields a well-formed confusion matrix over
    # the same doc mass
    cm = nb_lang_eval(d, vocab_cap=CAP).to_pandas()
    ex = nb_lang_eval(d).to_pandas()
    assert cm.n.sum() == ex.n.sum()


def test_perplexity_cap_unsaturated_is_exact(ray_session, tmp_path):
    from raysearch.pipelines.perplexity import perplexity_buckets

    d = _highvocab_dir(tmp_path, "i", 30, 4)
    pd.testing.assert_frame_equal(
        _frame(perplexity_buckets(d, vocab_cap=10_000)),
        _frame(perplexity_buckets(d)))
