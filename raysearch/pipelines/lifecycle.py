"""Index-lifecycle pipelines: incremental append, tombstone deletes,
compaction — each exercised end-to-end over the documents table and
oracle-checked against DuckDB.

The reference engine rebuilds from scratch every run
(/root/reference/src/main.rs:66-99); these entries prove the
Lucene-style lifecycle (raysearch/maintenance.py) preserves exact
scoring semantics:

- appended_topk: build on half the corpus, append the other half ->
  results must equal the one-shot build (oracle = the plain BM25 SQL).
- deleted_topk: tombstone doc_id % 7 == 3 -> results use STALE
  build-time stats but exclude tombstoned docs (oracle = BM25 SQL with
  whole-corpus df/N/avgdl and a candidate filter).
- compacted_topk: delete + compact -> results equal a fresh build over
  the live docs (oracle = BM25 SQL over the filtered relation).

Each entry builds its own index under /tmp/raysearch_cache keyed by
the documents file fingerprint, with a sentinel marking the finished
lifecycle state (a compacted index must not be "resumed" into a plain
rebuild).
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raysearch.config import IndexConfig
from raysearch.numutil import round6
from raysearch.pipelines.search_queries import (
    B,
    K1,
    _docs_path,
    _source_fingerprint,
    sql_bm25_topk,
    topk_rounded_for_index,
)

DEL_MOD, DEL_REM = 7, 3  # tombstone predicate: doc_id % 7 == 3
_NUM_PARTS = 8


def _corpus_reader(sf_dir: str):
    """Same column contract as search_queries._corpus_ds: (doc_id,
    content) ONLY — no lang column, so every row takes the plain
    whitespace tokenizer that matches the \\S+ oracle CTEs (a lang
    value like 'json'/'html' would otherwise route rows to the
    structured tokenizers and break oracle equivalence)."""
    import ray.data

    ds = ray.data.read_parquet(_docs_path(sf_dir),
                               columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: b.rename_columns(["doc_id", "content"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _split_reader(sf_dir: str, parity: int):
    """Streaming corpus reader restricted to doc_id % 2 == parity —
    the append split, filtered inside map_batches (no driver
    materialization). Same (doc_id, content) contract as
    _corpus_reader."""
    def pick(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["doc_id", "content"])
        keep = pc.equal(pc.bit_wise_and(b["doc_id"], 1), parity)
        return b.filter(keep)

    import ray.data

    ds = ray.data.read_parquet(_docs_path(sf_dir),
                               columns=["doc_id", "text"])
    return ds.map_batches(pick, batch_format="pyarrow",
                          zero_copy_batch=True)


# BUMP when the lifecycle build contract changes (tokenizer routing,
# split rule, delete predicate...) — the sentinel embeds it, so warm
# /tmp caches built under an older contract rebuild instead of being
# served stale (v2: lang column dropped from the corpus readers)
_CONTRACT_VERSION = "v2"


def _lifecycle_dir(sf_dir: str, kind: str) -> tuple[str, str]:
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = os.path.join("/tmp", "raysearch_cache", f"lifecycle-{kind}-{key}")
    fp = f"{_CONTRACT_VERSION}:{_source_fingerprint(_docs_path(sf_dir))}"
    sentinel = os.path.join(idx, f".done-{hashlib.md5(fp.encode()).hexdigest()[:12]}")
    return idx, sentinel


def _fresh(idx: str) -> None:
    shutil.rmtree(idx, ignore_errors=True)
    os.makedirs(idx, exist_ok=True)


def _deleted_ids(sf_dir: str) -> list[int]:
    ids = pq.read_table(_docs_path(sf_dir), columns=["doc_id"])["doc_id"]
    return [d for d in ids.to_pylist() if d % DEL_MOD == DEL_REM]


def _cfg() -> IndexConfig:
    return IndexConfig(num_parts=_NUM_PARTS, k1=K1, b=B)


def appended_index(sf_dir: str) -> str:
    """Half-build + append the other half; sentinel-cached."""
    from raysearch.build import build_index
    from raysearch.maintenance import append_index

    idx, sentinel = _lifecycle_dir(sf_dir, "app")
    if os.path.exists(sentinel):
        return idx
    _fresh(idx)
    build_index(_split_reader(sf_dir, 0), idx, _cfg(),
                input_id=f"{sf_dir}#even")
    append_index(_split_reader(sf_dir, 1), idx,
                 input_id=f"{sf_dir}#odd", num_parts=_NUM_PARTS)
    open(sentinel, "w").close()
    return idx


def deleted_index(sf_dir: str) -> str:
    """Full build + tombstones (NOT compacted); sentinel-cached."""
    from raysearch.build import build_index
    from raysearch.maintenance import delete_docs

    idx, sentinel = _lifecycle_dir(sf_dir, "del")
    if os.path.exists(sentinel):
        return idx
    _fresh(idx)
    build_index(_corpus_reader(sf_dir), idx, _cfg(),
                input_id=f"{sf_dir}#full")
    delete_docs(idx, _deleted_ids(sf_dir))
    open(sentinel, "w").close()
    return idx


def compacted_index(sf_dir: str) -> str:
    """Full build + tombstones + compaction; sentinel-cached."""
    from raysearch.build import build_index
    from raysearch.maintenance import compact_index, delete_docs

    idx, sentinel = _lifecycle_dir(sf_dir, "cmp")
    if os.path.exists(sentinel):
        return idx
    _fresh(idx)
    build_index(_corpus_reader(sf_dir), idx, _cfg(),
                input_id=f"{sf_dir}#full")
    delete_docs(idx, _deleted_ids(sf_dir))
    compact_index(idx)
    open(sentinel, "w").close()
    return idx


def appended_topk(sf_dir: str) -> pa.Table:
    """BM25 top-k from an index built as base-half + appended-half —
    must be IDENTICAL to the one-shot build's results (oracle is the
    plain whole-corpus BM25 SQL)."""
    return topk_rounded_for_index(appended_index(sf_dir), "bm25")


def deleted_topk(sf_dir: str) -> pa.Table:
    """BM25 top-k with tombstoned docs (doc_id % 7 == 3) filtered from
    every posting list while df/N/avgdl stay build-time — the
    stale-stats-until-compaction semantics. Top-k back-fills from live
    docs."""
    return topk_rounded_for_index(deleted_index(sf_dir), "bm25")


def compacted_topk(sf_dir: str) -> pa.Table:
    """BM25 top-k after compaction: segments rewritten without the
    tombstoned docs, stats and lexicon recomputed exactly — results
    equal a fresh build over the live corpus."""
    return topk_rounded_for_index(compacted_index(sf_dir), "bm25")


def time_travel_topk(sf_dir: str) -> pa.Table:
    """Snapshot (time-travel) query: BM25 top-k over the APPENDED
    index AS OF the pre-append generation — results must equal a
    plain build over the base half alone, even though the index now
    also holds the appended half.

    Works because the layout is append-only LSM (immutable segments;
    an append only adds part dirs and rewrites stats/lexicon,
    maintenance.append_index): the old generation IS the part subset
    [0, offset). Collection stats for the snapshot are summed from
    the retained per-part stats detail, and per-term df is re-derived
    by summing the snapshot parts' own df columns (query_index's
    `asof` path) — the post-append lexicon is never consulted, so no
    future document leaks into N/avgdl/idf. The reference rebuilds
    from scratch every run and has no generations at all
    (/root/reference/src/main.rs:66-99)."""
    from raysearch.stats import load_stats

    idx = appended_index(sf_dir)
    st = load_stats(idx)
    base = [d for d in st["parts_detail"] if d["part"] < _NUM_PARTS]
    n_docs = sum(d["n_docs"] for d in base)
    sum_dl = sum(d["sum_dl"] for d in base)
    return topk_rounded_for_index(idx, "bm25", asof={
        "parts": [d["part"] for d in base],
        "n_docs": n_docs,
        # same float expression the base build stored (stats.py:52)
        # and the oracle computes: sum(dl)::DOUBLE / count(*)
        "avgdl": sum_dl / n_docs if n_docs else 0.0,
    })


def index_diff_stats(sf_dir: str) -> pa.Table:
    """Index-generation diff: per-term (df, cf) of the FULL index vs
    the post-compaction LIVE index (tombstones doc_id % DEL_MOD ==
    DEL_REM removed), with a vanished flag for terms whose last
    posting died — the observability table a rolling rebuild needs to
    audit what a compaction actually dropped.

    Plan: both sides are the ALREADY-BUILT cached indexes' merged
    lexicons (two filtered parquet reads, no corpus pass, no new
    exchange); the driver outer-merges vocab-bounded rows (same
    acceptance as term_stats — at open vocab this merge is one
    term-bucket exchange, each term finalizing in its bucket)."""
    import numpy as np
    import pyarrow.dataset as pads

    from raysearch.pipelines.search_queries import cached_index

    full_idx = cached_index(sf_dir)
    live_idx = compacted_index(sf_dir)

    def lex(idx: str):
        t = pads.dataset(os.path.join(idx, "lexicon")).to_table(
            columns=["term", "df", "cf"])
        return t.to_pandas()

    m = lex(full_idx).merge(lex(live_idx), on="term", how="left",
                            suffixes=("_full", "_live"))
    m[["df_live", "cf_live"]] = \
        m[["df_live", "cf_live"]].fillna(0)
    m = m.sort_values("term", ignore_index=True)
    return pa.table({
        "term": pa.array(m.term, pa.string()),
        "df_full": pa.array(m.df_full.to_numpy(np.int64), pa.int64()),
        "cf_full": pa.array(m.cf_full.to_numpy(np.int64), pa.int64()),
        "df_live": pa.array(m.df_live.to_numpy(np.int64), pa.int64()),
        "cf_live": pa.array(m.cf_live.to_numpy(np.int64), pa.int64()),
        "vanished": pa.array((m.df_live.to_numpy(np.int64) == 0)
                             .astype(np.int64), pa.int64()),
    })


def sql_index_diff_stats() -> str:
    return rf"""
WITH tokf AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
),
f AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df_full,
             count(*)::BIGINT AS cf_full
      FROM tokf GROUP BY term),
tokl AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents WHERE {_LIVE}
),
l AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df_live,
             count(*)::BIGINT AS cf_live
      FROM tokl GROUP BY term)
SELECT f.term, f.df_full, f.cf_full,
       coalesce(l.df_live, 0)::BIGINT AS df_live,
       coalesce(l.cf_live, 0)::BIGINT AS cf_live,
       (l.term IS NULL)::BIGINT AS vanished
FROM f LEFT JOIN l ON f.term = l.term
"""


def generation_drift(sf_dir: str) -> pa.Table:
    """Index-generation rank-drift audit: per query, how the BM25
    top-k CHANGED between the pre-append snapshot generation
    (time_travel_topk's result) and the current post-append index
    (appended_topk's) — overlap, Jaccard, and the entered/exited doc
    counts. The monitoring table a rolling ingest pipeline alerts on
    ("did tonight's append reshape customer-facing rankings?"),
    composing the two lifecycle entries it audits.

    Shape: two already-audited k-bounded pipelines + driver set math
    over 2 x Q x k rows; the snapshot side reads only the retained
    per-part stats detail (no pre-append lexicon exists to consult).
    Jaccard is NULL when both lists are empty (0/0)."""
    cur = appended_topk(sf_dir).to_pandas()
    old = time_travel_topk(sf_dir).to_pandas()
    qs = sorted(set(cur.query_id) | set(old.query_id))
    c_by_q = {q: set(g.doc_id) for q, g in cur.groupby("query_id")}
    o_by_q = {q: set(g.doc_id) for q, g in old.groupby("query_id")}
    rows = {k: [] for k in ("query_id", "n_old", "n_cur", "n_overlap",
                            "jaccard", "n_entered", "n_exited")}
    for q in qs:
        c, o = c_by_q.get(q, set()), o_by_q.get(q, set())
        ov = len(c & o)
        un = len(c) + len(o) - ov
        rows["query_id"].append(int(q))
        rows["n_old"].append(len(o))
        rows["n_cur"].append(len(c))
        rows["n_overlap"].append(ov)
        rows["jaccard"].append(round6(float(ov) / un) if un else None)
        rows["n_entered"].append(len(c - o))
        rows["n_exited"].append(len(o - c))
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "n_old": pa.array(rows["n_old"], pa.int64()),
        "n_cur": pa.array(rows["n_cur"], pa.int64()),
        "n_overlap": pa.array(rows["n_overlap"], pa.int64()),
        "jaccard": pa.array(rows["jaccard"], pa.float64()),
        "n_entered": pa.array(rows["n_entered"], pa.int64()),
        "n_exited": pa.array(rows["n_exited"], pa.int64()),
    })


def sql_generation_drift() -> str:
    old_sql = sql_bm25_topk(
        rel="(SELECT * FROM documents WHERE doc_id % 2 = 0) docs_base")
    return f"""
WITH cur AS ({sql_bm25_topk()}),
old AS ({old_sql}),
qs AS (SELECT DISTINCT query_id FROM (
  SELECT query_id FROM cur UNION SELECT query_id FROM old)),
ov AS (
  SELECT c.query_id, count(*)::BIGINT AS n
  FROM cur c JOIN old o ON o.query_id = c.query_id
                       AND o.doc_id = c.doc_id
  GROUP BY 1
),
nc AS (SELECT query_id, count(*)::BIGINT AS n FROM cur GROUP BY 1),
no AS (SELECT query_id, count(*)::BIGINT AS n FROM old GROUP BY 1)
SELECT qs.query_id::BIGINT AS query_id,
       coalesce(no.n, 0) AS n_old,
       coalesce(nc.n, 0) AS n_cur,
       coalesce(ov.n, 0) AS n_overlap,
       CASE WHEN coalesce(no.n, 0) + coalesce(nc.n, 0)
                 - coalesce(ov.n, 0) > 0
            THEN round(coalesce(ov.n, 0)::DOUBLE
                       / (coalesce(no.n, 0) + coalesce(nc.n, 0)
                          - coalesce(ov.n, 0)), 6) END AS jaccard,
       coalesce(nc.n, 0) - coalesce(ov.n, 0) AS n_entered,
       coalesce(no.n, 0) - coalesce(ov.n, 0) AS n_exited
FROM qs
LEFT JOIN ov USING (query_id)
LEFT JOIN nc USING (query_id)
LEFT JOIN no USING (query_id)
"""


QUERIES = {
    "appended_topk": appended_topk,
    "deleted_topk": deleted_topk,
    "compacted_topk": compacted_topk,
    "time_travel_topk": time_travel_topk,
    "index_diff_stats": index_diff_stats,
    "generation_drift": generation_drift,
}

_LIVE = f"doc_id % {DEL_MOD} <> {DEL_REM}"

ORACLE_SQL = {
    "appended_topk": sql_bm25_topk(),
    "deleted_topk": sql_bm25_topk(scores_where=f"tf.{_LIVE}"),
    "compacted_topk": sql_bm25_topk(
        rel=f"(SELECT * FROM documents WHERE {_LIVE}) docs_live"),
    # the snapshot generation is the even half (the base build of
    # appended_index): the oracle is a one-shot build over it
    "time_travel_topk": sql_bm25_topk(
        rel="(SELECT * FROM documents WHERE doc_id % 2 = 0) docs_base"),
    "index_diff_stats": sql_index_diff_stats(),
    "generation_drift": sql_generation_drift(),
}
