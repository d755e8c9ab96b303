"""Distributed BPE merge training over the ``documents`` table: learn
the first ``BPE_MERGES`` byte-pair-encoding merges (Sennrich et al.
2016) from word-level symbol sequences, exactly.

Contract (pinned so a SQL oracle can replay it): symbols start as the
codepoints of each lowered whitespace token; one training step counts,
for every adjacent symbol pair, the number of GREEDY NON-OVERLAPPING
left-to-right occurrences in each word (that is exactly how many
merges would be applied), weighted by the word's corpus frequency,
then merges the winning pair everywhere (ties: highest count, then
lexicographically smallest left, then right symbol).

The exact-parity device: a word's symbol sequence is encoded as the
string ``' ' + '  '.join(symbols) + ' '`` (double space BETWEEN
symbols, single at the ends; symbols never contain spaces). The pair
(a, b) then appears as the pattern ``' a  b '``, whose non-overlapping
occurrence count and left-to-right replacement with ``' ab '`` — which
preserves the encoding invariant, because the pattern consumes one
space from each side and the replacement restores both — have
IDENTICAL semantics in Python ``str.count``/``str.replace`` and SQL
``replace``/length-difference. Engine and oracle therefore agree
bit-for-bit with no epsilon.

Scale shape: ONE corpus pass builds the (word, count) vocabulary — the
classic BPE working set, tiny relative to the corpus (the shuffle
carries per-batch word partials, the combiner pattern). Each of the
K = BPE_MERGES training steps runs over the VOCABULARY dataset only:
merges-so-far (<= K strings, driver-broadcast via closure) are
re-applied map-side, per-batch pair partials aggregate through a
(left, right) groupby, and the driver reduces block-local top-1 rows
(k-bounded, never the full pair table). Per-unique-word Python in the
map stage is the standard trainer shape (the vocab is frequency-
collapsed); the corpus itself is touched exactly once.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.pipelines.textops import _tokens

_DOCS = "documents.parquet"
BPE_MERGES = 6


def _sym(word: str) -> str:
    return " " + "  ".join(word) + " "


def _pat(a: str, b: str) -> str:
    return f" {a}  {b} "


def _vocab(sf_dir: str):
    """(word, cnt) vocabulary Dataset: one corpus pass, map-side
    per-batch partial counts, one word groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat = _tokens(b).flatten().to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table({
            "word": pa.array(uniq.astype(str), pa.string()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    ds = ray.data.read_parquet(os.path.join(sf_dir, _DOCS),
                               columns=["text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("word").aggregate(Sum("cnt", alias_name="cnt"))


def bpe_merges(sf_dir: str) -> pa.Table:
    """(step, left, right, merged, pair_count) for the first
    BPE_MERGES training steps (fewer rows if the vocabulary runs out
    of adjacent pairs)."""
    from ray.data.aggregate import Sum

    vocab = _vocab(sf_dir).materialize()
    merges: list[tuple[str, str]] = []
    out_rows = []

    for step in range(1, BPE_MERGES + 1):
        done = list(merges)  # rebroadcast per step via closure capture

        def pair_partials(b: pa.Table) -> pa.Table:
            words = b["word"].to_pylist()
            cnts = b["cnt"].to_numpy()
            acc: dict[tuple[str, str], int] = {}
            for w, c in zip(words, cnts):
                s = _sym(w)
                for a_, b_ in done:
                    s = s.replace(_pat(a_, b_), f" {a_}{b_} ")
                syms = s.strip(" ").split("  ") if len(s) > 2 else []
                for p in set(zip(syms, syms[1:])):
                    n = s.count(_pat(*p))
                    if n:
                        acc[p] = acc.get(p, 0) + n * int(c)
            if not acc:
                return pa.table({"left": pa.array([], pa.string()),
                                 "right": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            ks = sorted(acc)
            return pa.table({
                "left": pa.array([k[0] for k in ks], pa.string()),
                "right": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([acc[k] for k in ks], pa.int64()),
            })

        def block_top1(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            df = b.to_pandas().sort_values(
                ["n", "left", "right"],
                ascending=[False, True, True]).head(1)
            return pa.Table.from_pandas(df, preserve_index=False)

        agg = (vocab.map_batches(pair_partials, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .groupby(["left", "right"]).aggregate(
                   Sum("n", alias_name="n"))
               .map_batches(block_top1, batch_format="pyarrow"))
        blocks = list(agg.iter_batches(batch_format="pyarrow"))
        if not blocks:
            break
        tops = pa.concat_tables(blocks).to_pandas()
        if len(tops) == 0:
            break
        best = tops.sort_values(["n", "left", "right"],
                                ascending=[False, True, True]).iloc[0]
        merges.append((str(best.left), str(best.right)))
        out_rows.append((step, str(best.left), str(best.right),
                         str(best.left) + str(best.right),
                         int(best.n)))

    return pa.table({
        "step": pa.array([r[0] for r in out_rows], pa.int64()),
        "left": pa.array([r[1] for r in out_rows], pa.string()),
        "right": pa.array([r[2] for r in out_rows], pa.string()),
        "merged": pa.array([r[3] for r in out_rows], pa.string()),
        "pair_count": pa.array([r[4] for r in out_rows], pa.int64()),
    })


def _training_ctes() -> str:
    """The K-step unrolled training CTE chain (tok/v0/cand/cnts/best/v)
    shared VERBATIM by sql_bpe_merges and sql_bpe_encode — one source,
    so the two oracles cannot drift."""
    parts = [r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS w
  FROM documents
),
v0 AS (
  SELECT ' ' || array_to_string(regexp_extract_all(w, '.'), '  ')
         || ' ' AS ws,
         count(*)::BIGINT AS cnt
  FROM tok GROUP BY 1
)"""]
    for i in range(1, BPE_MERGES + 1):
        p = i - 1
        parts.append(f""",
cand{i} AS (
  SELECT DISTINCT ws, cnt,
    unnest(list_transform(range(1, len(sy)),
           j -> [sy[j], sy[j + 1]])) AS pr
  FROM (SELECT ws, cnt,
               string_split(trim(ws, ' '), '  ') AS sy FROM v{p})
),
cnts{i} AS (
  SELECT pr[1] AS a, pr[2] AS b,
    sum(cnt * (length(ws)
        - length(replace(ws, ' ' || pr[1] || '  ' || pr[2] || ' ',
                         '')))
        // length(' ' || pr[1] || '  ' || pr[2] || ' '))::BIGINT AS n
  FROM cand{i} GROUP BY 1, 2 HAVING n > 0
),
best{i} AS (
  SELECT a, b, n FROM cnts{i}
  ORDER BY n DESC, a ASC, b ASC LIMIT 1
),
v{i} AS (
  SELECT replace(v.ws, ' ' || t.a || '  ' || t.b || ' ',
                 ' ' || t.a || t.b || ' ') AS ws, v.cnt
  FROM v{p} v CROSS JOIN best{i} t
)""")
    return "".join(parts)


def sql_bpe_merges() -> str:
    """Unrolled K-step oracle: each step's CTEs re-derive candidate
    pairs from the previous vocabulary encoding, count non-overlapping
    occurrences via length difference under replace, pick the winner
    with the same total order, and rewrite the vocabulary."""
    unions = "\nUNION ALL\n".join(
        f'SELECT {i}::BIGINT AS step, a AS "left", b AS "right",'
        f" a || b AS merged, n::BIGINT AS pair_count FROM best{i}"
        for i in range(1, BPE_MERGES + 1))
    return _training_ctes() + "\n" + unions + "\nORDER BY step"


def bpe_encode(sf_dir: str) -> pa.Table:
    """Apply the BPE_MERGES trained merges to every document: per doc,
    its word count and its encoded SYMBOL count (the tokenizer-output
    length a dataloader budgets by) — the other half of the BPE loop
    (bpe_merges trains; this encodes).

    Scale shape: training reuses bpe_merges (vocabulary passes only);
    encoding is then ONE map-only corpus pass — the merge list (<= K
    tiny strings) rides the closure, each batch encodes its UNIQUE
    words once (batch-local dedup, the trainer's per-unique-word
    precedent) and sums symbol lengths per doc via an inverse lookup.
    No exchange at all; per-doc rows stream straight out. Zero-token
    docs emit 0 symbols (the oracle's LEFT JOIN contract)."""
    import ray.data

    mt = bpe_merges(sf_dir)
    merges = list(zip(mt["left"].to_pylist(), mt["right"].to_pylist()))

    def encode(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = _tokens(b)
        ids = b["doc_id"].to_numpy()
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
        uniq, inv = np.unique(flat.astype(object), return_inverse=True)
        enc_len = np.empty(len(uniq), dtype=np.int64)
        for i, w in enumerate(uniq):
            s = _sym(str(w))
            for a_, b_ in merges:
                s = s.replace(_pat(a_, b_), f" {a_}{b_} ")
            enc_len[i] = s.count("  ") + 1 if len(s) > 2 else 0
        per_tok = enc_len[inv]
        # cumsum-difference segment sums: exact for zero-token docs
        # anywhere in the batch (np.add.reduceat crashes on a trailing
        # empty doc and mis-sums interior ones)
        csum = np.concatenate(([0], np.cumsum(per_tok)))
        ends = np.cumsum(counts)
        starts = ends - counts
        n_syms = (csum[ends] - csum[starts]).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(counts, pa.int64()),
            "n_symbols": pa.array(n_syms, pa.int64()),
        })

    ds = ray.data.read_parquet(os.path.join(sf_dir, _DOCS),
                               columns=["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True)
    # empty corpus: iter_batches yields zero batches and
    # concat_tables(()) raises — return the documented empty shape
    batches = [t for t in ds.iter_batches(batch_format="pyarrow")
               if t.num_rows]
    if not batches:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_words": pa.array([], pa.int64()),
                         "n_symbols": pa.array([], pa.int64())})
    return pa.concat_tables(batches).sort_by("doc_id")


def sql_bpe_encode() -> str:
    """The merge chain comes from the SHARED _training_ctes() (so the
    two oracles cannot drift), then every (doc, word) symbol string
    replays the K replaces (LEFT JOIN ON TRUE keeps the string
    unchanged when a step ran out of pairs) and docs aggregate;
    documents with no tokens LEFT-JOIN back in with 0 symbols."""
    parts = [_training_ctes()]
    parts.append(r""",
d0 AS (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(w, '.'), '  ')
         || ' ' AS ws
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '\S+')) AS w
        FROM documents)
)""")
    for i in range(1, BPE_MERGES + 1):
        p = i - 1
        parts.append(f""",
d{i} AS (
  SELECT d.doc_id,
         CASE WHEN t.a IS NULL THEN d.ws
              ELSE replace(d.ws, ' ' || t.a || '  ' || t.b || ' ',
                           ' ' || t.a || t.b || ' ') END AS ws
  FROM d{p} d LEFT JOIN best{i} t ON TRUE
)""")
    parts.append(f""",
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
         sum(len(string_split(trim(ws, ' '), '  ')))::BIGINT
           AS n_symbols
  FROM d{BPE_MERGES} GROUP BY doc_id
)
SELECT documents.doc_id,
       COALESCE(agg.n_words, 0)::BIGINT AS n_words,
       COALESCE(agg.n_symbols, 0)::BIGINT AS n_symbols
FROM documents LEFT JOIN agg ON documents.doc_id = agg.doc_id
ORDER BY documents.doc_id
""")
    return "".join(parts)


QUERIES = {
    "bpe_merges": bpe_merges,
    "bpe_encode": bpe_encode,
}

ORACLE_SQL = {
    "bpe_merges": sql_bpe_merges(),
    "bpe_encode": sql_bpe_encode(),
}
