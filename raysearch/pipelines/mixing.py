"""Domain-mixture weighting over the ``documents`` table — the
"how much of each domain does the training run sample" operator of
large-scale LM data pipelines (the alpha-power smoothing used by
multilingual/mixture recipes: w_d ∝ tokens_d^alpha with alpha < 1
up-weights small domains relative to proportional sampling; cf. the
published Pile / XLM sampling-rate formulas).

Per language: document count, whitespace-token count, normalized
sampling weight w_l = tokens_l^0.5 / Σ_m tokens_m^0.5, and the
implied epochs-over-the-domain multiplier
epochs_l = w_l · total_tokens / tokens_l (how many passes over
domain l a token-budget-matched run would make).

Scale shape: classic combiner — per-batch (lang, n_docs, n_tokens)
partials map-side, ONE groupby over lang-cardinality rows, final
normalization on the driver over the tiny per-lang table. Token
counting is a pyarrow regex kernel; text never shuffles.

Float determinism: the normalizer Σ sqrt(tokens) is computed with
math.fsum (exactly-rounded, order-independent); DuckDB's scalar
subquery sums the same handful of per-lang doubles. Both sides round
to 6 decimals (numutil.round6 == DuckDB round half-away)."""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raysearch.numutil import round6

_DOCS = "documents.parquet"
MIX_ALPHA = 0.5  # alpha-power smoothing exponent (sqrt)


def mix_weights(sf_dir: str) -> pa.Table:
    """(lang, n_docs, n_tokens, weight, epochs) per language."""
    import ray.data
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch["text"], pa.large_string())
        toks = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        t = pa.table({"lang": batch["lang"], "toks": toks})
        agg = t.group_by("lang").aggregate([("toks", "sum"),
                                            ("toks", "count")])
        return pa.table({
            "lang": agg["lang"],
            "n_tokens": pc.cast(agg["toks_sum"], pa.int64()),
            "n_docs": pc.cast(agg["toks_count"], pa.int64()),
        })

    ds = ray.data.read_parquet(os.path.join(sf_dir, _DOCS),
                               columns=["lang", "text"])
    per = (ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("lang")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_tokens", alias_name="n_tokens"))
           .to_pandas().sort_values("lang", ignore_index=True))
    nt = per.n_tokens.to_numpy(np.float64)
    s = np.power(nt, MIX_ALPHA)
    denom = math.fsum(s)
    total = float(per.n_tokens.sum())
    weight = round6(s / denom)
    # a zero-token language samples nothing: epochs defined as 0
    # (guards the 0/0), same CASE on the oracle side
    with np.errstate(invalid="ignore"):
        epochs = round6(np.where(nt > 0, s / denom * total
                                 / np.where(nt > 0, nt, 1.0), 0.0))
    return pa.table({
        "lang": pa.array(per.lang.tolist(), pa.string()),
        "n_docs": pa.array(per.n_docs.to_numpy(np.int64), pa.int64()),
        "n_tokens": pa.array(per.n_tokens.to_numpy(np.int64), pa.int64()),
        "weight": pa.array(weight, pa.float64()),
        "epochs": pa.array(epochs, pa.float64()),
    })


def sql_mix_weights() -> str:
    return rf"""
WITH per AS (
  SELECT lang, count(*)::BIGINT AS n_docs,
         sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(pow(n_tokens::DOUBLE, {MIX_ALPHA})) AS denom,
               sum(n_tokens)::DOUBLE AS total FROM per)
SELECT lang, n_docs, n_tokens,
       round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / tot.denom, 6) AS weight,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / tot.denom
                       * tot.total / n_tokens, 6) END AS epochs
FROM per CROSS JOIN tot
"""


# ---- applying the mix: deterministic token-budget-matched sampler ----

MIX_SAMPLE_FRAC = 0.5  # target token budget as a fraction of corpus


def mix_sample(sf_dir: str) -> pa.Table:
    """EXECUTE the mix_weights plan: sample documents so the output's
    language composition follows the alpha-smoothed weights under a
    token budget of MIX_SAMPLE_FRAC x total tokens. Per-language keep
    rate r_l = min(1, weight_l * total_tokens * FRAC / tokens_l)
    (capped at 1 — upsampling needs replication, out of scope);
    membership = (md5(doc_id) fraction) < r_l, reproducible from the
    doc_id alone on any engine (same contract as sample_split).

    Scale shape: the rate table is lang-cardinality (computed from
    the same combiner pass as mix_weights, driver-side); the sampling
    pass is MAP-ONLY. Rates are round6'd on both sides so the float
    threshold compare is bit-identical."""
    per = mix_weights(sf_dir).to_pandas()
    total = float(per.n_tokens.sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(
            per.n_tokens.to_numpy(np.int64) > 0,
            np.minimum(1.0, per.weight.to_numpy(np.float64) * total
                       * MIX_SAMPLE_FRAC
                       / np.where(per.n_tokens.to_numpy(np.int64) > 0,
                                  per.n_tokens.to_numpy(np.float64),
                                  1.0)),
            0.0)
    rates = dict(zip(per.lang, round6(r)))

    def pick(batch: pa.Table) -> pa.Table:
        # the membership-hash contract is shared with dsir_resample
        # and the SQL oracles: 44-bit md5 prefix of str(doc_id)
        from raysearch.pipelines.textops import md5_prefix_ints

        ids = batch["doc_id"].to_numpy()
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        sid = np.array([str(int(i)) for i in ids], dtype=object)
        h = md5_prefix_ints(sid, 11)
        frac = (h.astype(np.float64) + 0.5) / float(1 << 44)
        thr = np.array([rates.get(l, 0.0) for l in langs])
        keep = frac < thr
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "lang": pa.array(langs[keep].tolist(), pa.string()),
        })

    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, _DOCS),
                               columns=["doc_id", "lang"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True)
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


def sql_mix_sample() -> str:
    return rf"""
WITH per AS (
  SELECT lang, count(*)::BIGINT AS n_docs,
         sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(pow(n_tokens::DOUBLE, {MIX_ALPHA})) AS denom,
               sum(n_tokens)::DOUBLE AS total FROM per),
rates AS (
  SELECT lang,
         CASE WHEN n_tokens = 0 THEN 0.0
              ELSE round(least(1.0,
                   round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / tot.denom,
                         6) * tot.total * {MIX_SAMPLE_FRAC} / n_tokens),
                   6)
         END AS r
  FROM per CROSS JOIN tot
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates USING (lang)
WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 11))::BIGINT + 0.5)
      / 17592186044416.0 < rates.r
"""


QUERIES = {"mix_weights": mix_weights, "mix_sample": mix_sample}
ORACLE_SQL = {"mix_weights": sql_mix_weights(),
              "mix_sample": sql_mix_sample()}
