"""Query pipeline: batch top-k search over a built index.

The reference serves queries from an unbounded channel into threads
sharing one Arc'd index (/root/reference/src/processor.rs:83-144); its
sharded mode partial-aggregates per-shard scores under locks and
barriers (src/processor.rs:146-369). Here queries are a small broadcast
side and the INDEX is the distributed dimension:

    from_items([{part: p} for parts])            # one row per segment
      -> map_batches(SegmentScorer, concurrency=A)  # actor pool
      -> P * Q * k candidate rows (tiny)
      -> final top-k merge per query (driver-side heap over <= P*k rows)

Because segments partition by DOCUMENT hash, each segment computes the
FINAL BM25 score of its docs (global df/N/avgdl are broadcast), so
per-segment top-k is exact and the merge is a k-way selection — no
score re-aggregation, no barriers, and pruning inside a segment stays
safe. (The reference's term-range sharding — where partial scores must
be sum-merged, src/lib.rs:190-226 — is what forced its lock+condvar
dance; doc partitioning dissolves it.)

The scorer is an actor pool: query-term weights, global df, and
collection stats are computed once per actor in __init__; each __call__
reads only its part's postings for the query terms (parquet row-group
pruning on the sorted term column) and scores vectorized.

Within a segment, scoring is exact full evaluation of the query's
posting lists (vectorized term-at-a-time accumulation in sorted term
order — the determinism contract shared with the oracle). See
raysearch/wand.py for the optional exact max-score/block-max pruning
path used when a segment's candidate set is large.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


from raysearch.score import (
    accumulate_scores,
    as_qweights,
    bm25_contrib,
    bm25_idf,
    axiomatic_contrib,
    classic_contrib,
    classic_idf,
    dfi_contrib,
    dfr_contrib,
    jm_contrib,
    topk,
)
from raysearch.segments import (SCORER_COLUMNS, SCORER_COLUMNS_BMW,
                                decode_posting_row, has_block_meta,
                                part_dirname, read_postings)
from raysearch.stats import load_stats

RESULT_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("rank", pa.int32()),
    ("doc_id", pa.int64()),
    ("score", pa.float64()),
])


def read_queries(path: str) -> list[str]:
    """Query-file source (SURVEY §2.1 S2 — the reference harness reads
    queries.txt lines, /root/reference/src/bin/test.rs:20-32). Returns
    non-empty lines; tokenization happens at scoring time."""
    with open(path, encoding="utf-8") as f:
        return [ln.strip() for ln in f if ln.strip()]


def lexicon_df(index_dir: str, terms: list[str]) -> dict[str, int]:
    """Global df for the query terms (filtered read of the lexicon)."""
    import pyarrow.dataset as pads

    if not terms:
        # isin([]) builds a null-typed value set -> ArrowTypeError; a
        # token-less query (pure punctuation) legitimately has no terms
        return {}
    lex = pads.dataset(os.path.join(index_dir, "lexicon"))
    tbl = lex.to_table(columns=["term", "df"],
                       filter=pads.field("term").isin(terms))
    return dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))


def lexicon_cf(index_dir: str, terms: list[str]) -> dict[str, int]:
    """Global collection frequency for the query terms (filtered
    lexicon read) — the smoothing denominator for Dirichlet
    query-likelihood scoring."""
    import pyarrow.dataset as pads

    if not terms:
        return {}
    lex = pads.dataset(os.path.join(index_dir, "lexicon"))
    tbl = lex.to_table(columns=["term", "cf"],
                       filter=pads.field("term").isin(terms))
    return dict(zip(tbl["term"].to_pylist(), tbl["cf"].to_pylist()))


def asof_df(index_dir: str, parts, terms: list[str]) -> dict[str, int]:
    """Per-generation global df for a snapshot (time-travel) query:
    the sum of each snapshot part's PER-PART df for the query terms.
    Segments are immutable, so the subset sum IS the df the lexicon
    held at that generation. One tiny fan-out over the snapshot parts
    (term-filtered reads of the posting files' narrow (term, df)
    columns — terms x parts rows), never the current global lexicon,
    which already includes later generations."""
    import ray.data

    from raysearch.segments import read_postings

    if not terms:
        return {}

    def kern(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["part"].to_pylist():
            pdir = part_dirname(index_dir, int(p))
            if os.path.isdir(pdir):
                outs.append(read_postings(pdir, terms,
                                          columns=["term", "df"]))
        if not outs:
            return pa.table({"term": pa.array([], pa.large_string()),
                             "df": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    parts_ds = ray.data.from_items([{"part": int(p)} for p in parts])
    tbl = pa.concat_tables(
        parts_ds.map_batches(kern, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    if len(tbl) == 0:
        return {}
    agg = tbl.group_by("term").aggregate([("df", "sum")])
    return dict(zip(agg["term"].to_pylist(), agg["df_sum"].to_pylist()))


def _apply_boost(docs: np.ndarray, sc: np.ndarray, boost):
    """Static document boost (Lucene-style query-time boost list):
    multiply the FINAL accumulated score of every doc in the sorted
    boost-id array by the factor — before top-k truncation, so the
    boosted ranking is exact, not a post-hoc reorder of an unboosted
    top-k. ``boost`` is (sorted int64 ids, float factor) or None."""
    if boost is None or not len(docs):
        return sc
    bids, bf = boost
    pos = np.searchsorted(bids, docs)
    ok = pos < len(bids)
    hit = np.zeros(len(docs), dtype=bool)
    hit[ok] = bids[pos[ok]] == docs[ok]
    sc = sc.astype(np.float64, copy=True)
    sc[hit] *= bf
    return sc


def _gather_dl(docs: np.ndarray, dl_parts) -> np.ndarray:
    """Per-candidate dl from the posting rows already in hand: every
    candidate matched >= 1 term and dl rides alongside tf in the
    decoded postings, so no extra reads or broadcasts. ``docs`` is
    the sorted unique union of the parts' doc arrays; dl is constant
    per doc, so any occurrence may supply it."""
    all_d = np.concatenate([d for d, _ in dl_parts])
    all_l = np.concatenate([l for _, l in dl_parts])
    pos = np.searchsorted(docs, all_d)
    dlv = np.zeros(len(docs), np.float64)
    dlv[pos] = all_l.astype(np.float64)
    return dlv


def _apply_decay(docs: np.ndarray, sc: np.ndarray, dlv, decay):
    """Gaussian length decay (the ES function_score `gauss` shape with
    decay 0.5 at distance ``scale`` from ``origin``): multiply each
    doc's FINAL accumulated score by 0.5 ** (((dl - origin)/scale)^2)
    — before top-k truncation, so the decayed ranking is exact.
    ``dlv`` is the per-candidate dl from _gather_dl (gathered ONCE
    and shared with _apply_rank_feature); ``decay`` is
    (origin, scale) or None."""
    if decay is None or not len(docs):
        return sc
    origin, scale = decay
    # mirrors the oracle SQL term-for-term:
    # pow(0.5, pow((dl - origin) / scale, 2))
    mult = np.power(0.5, ((dlv - origin) / scale) ** 2)
    return sc.astype(np.float64, copy=False) * mult


def _apply_rank_feature(docs: np.ndarray, sc: np.ndarray, dlv,
                        rank_feature):
    """ES rank_feature query (Lucene FeatureField saturation): ADD
    w * dl / (dl + pivot) to each doc's FINAL accumulated score — a
    static per-doc prior blended additively with the text score
    (contrast decay's multiplicative reshaping). Applied before
    top-k truncation, so the blended ranking is exact; ``dlv`` is
    the shared per-candidate dl gather. ``rank_feature`` is
    (w, pivot) or None."""
    if rank_feature is None or not len(docs):
        return sc
    w, pivot = rank_feature
    # mirrors the oracle SQL term-for-term: w * (dl / (dl + pivot))
    return sc.astype(np.float64, copy=False) + w * (dlv / (dlv + pivot))


def score_queries_over_postings(
        qweights, postings: dict, max_tfs: dict, df: dict,
        n_docs: int, avgdl: float, k1: float, b: float, k: int,
        mode: str, prune: bool = False,
        cf: dict | None = None, total_tokens: int = 0,
        mu: float = 2000.0, boost=None, decay=None,
        rank_feature=None) -> pa.Table:
    """Score a query batch against one segment's (already decoded)
    postings — the shared kernel behind both the one-shot SegmentScorer
    and the resident SegmentServer actors (raysearch/serve.py).
    Doc-hash partitioning makes these per-segment scores FINAL, so
    per-segment top-k is exact (see module docstring)."""
    if boost is not None and prune:
        # MaxScore bounds don't account for per-doc boost factors; the
        # boosted path uses the exhaustive (still df-bounded) scorer
        raise ValueError("boost requires prune=False")
    if boost is not None and mode not in ("bm25", "overlap"):
        # the documented contract: dirichlet/jm scores are NEGATIVE
        # log-likelihood sums (a factor > 1 would DEMOTE boosted
        # docs) and the other modes' boosted rankings have no oracle;
        # refuse rather than silently widen the contract
        raise ValueError("boost supports bm25/overlap only "
                         "(other modes are unmodeled or would invert "
                         "the intended promotion)")
    if prune and mode in ("classic", "jm", "dfr", "boolean", "dfi", "axiomatic"):
        # the MaxScore/block-max upper bounds are derived for the
        # bm25/overlap tf curves; the other modes score exhaustively
        # (still df-bounded per query term)
        raise ValueError(f"{mode} mode requires prune=False")
    if decay is not None and (prune or mode != "bm25"):
        # the decay multiplier rescales FINAL per-doc scores by a
        # dl-dependent factor in (0, 1]; MaxScore bounds don't model
        # it, and non-bm25 modes (negative or integer scores) would
        # invert/break the intended demotion
        raise ValueError("decay requires mode='bm25' and prune=False")
    if rank_feature is not None and (prune or mode != "bm25"):
        # the additive prior shifts FINAL per-doc scores; MaxScore
        # bounds don't model it, and on negative-log-likelihood modes
        # the blend has no modeled contract
        raise ValueError("rank_feature requires mode='bm25' and "
                         "prune=False")
    qids, ranks, dids, scores = [], [], [], []
    for qid, qw in enumerate(qweights):
        if mode == "dirichlet":
            from raysearch.score import dirichlet_scores

            docs, sc = dirichlet_scores(qw, postings.get, cf or {},
                                        total_tokens, mu)
            d, s = topk(docs, sc, k)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            dids.extend(d.tolist())
            scores.extend(float(x) for x in s)
            continue
        if prune:
            from raysearch.wand import pruned_topk

            d, s = pruned_topk(qw, postings, max_tfs, df, n_docs,
                               avgdl, k1, b, k, mode)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            dids.extend(d.tolist())
            scores.extend(float(x) for x in s)
            continue
        per_term = []
        dl_parts = []
        for term, w in qw:  # ascending term order = accumulation contract
            got = postings.get(term)
            if got is None:
                continue
            docs, tfs, dls = got
            if mode == "overlap":
                contrib = (w * tfs).astype(np.int64)
            elif mode == "classic":
                idf = classic_idf(df.get(term, 0), n_docs)
                contrib = classic_contrib(tfs, dls, idf, w)
            elif mode == "jm":
                contrib = jm_contrib(tfs, dls, (cf or {}).get(term, 0),
                                     total_tokens, w)
            elif mode == "dfi":
                contrib = dfi_contrib(tfs, dls, (cf or {}).get(term, 0),
                                      total_tokens, w)
            elif mode == "axiomatic":
                contrib = axiomatic_contrib(tfs, dls, df.get(term, 0),
                                            n_docs, avgdl, w)
            elif mode == "dfr":
                contrib = dfr_contrib(tfs, dls, df.get(term, 0),
                                      n_docs, avgdl, w)
            elif mode == "boolean":
                contrib = np.full(len(docs), int(w), np.int64)
            else:
                idf = bm25_idf(df.get(term, 0), n_docs)
                contrib = bm25_contrib(tfs, dls, idf, w, k1, b, avgdl)
            per_term.append((docs, contrib))
            if decay is not None or rank_feature is not None:
                dl_parts.append((docs, dls))
        docs, sc = accumulate_scores(per_term)
        sc = _apply_boost(docs, sc, boost)
        if dl_parts and len(docs) and (decay is not None
                                       or rank_feature is not None):
            dlv = _gather_dl(docs, dl_parts)
            sc = _apply_decay(docs, sc, dlv, decay)
            sc = _apply_rank_feature(docs, sc, dlv, rank_feature)
        d, s = topk(docs, sc, k)
        qids.extend([qid] * len(d))
        ranks.extend(range(1, len(d) + 1))
        dids.extend(d.tolist())
        scores.extend(float(x) for x in s)
    return pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "rank": pa.array(ranks, pa.int32()),
        "doc_id": pa.array(dids, pa.int64()),
        "score": pa.array(scores, pa.float64()),
    })


def merge_candidates(cand: pd.DataFrame, n_queries: int, k: int) -> pa.Table:
    """Final top-k per query from the P*Q*k candidate rows (k-bounded
    by construction — a driver-side selection, not a shuffle)."""
    if cand.empty:
        cand = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int32"),
                             "doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    out_frames = []
    for qid in range(n_queries):
        sub = cand[cand.query_id == qid]
        sub = sub.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(k)
        sub = sub.assign(rank=np.arange(1, len(sub) + 1, dtype=np.int32))
        out_frames.append(sub)
    if not out_frames:
        return RESULT_SCHEMA.empty_table()
    merged = pd.concat(out_frames, ignore_index=True)
    return pa.table({
        "query_id": pa.array(merged.query_id.to_numpy(np.int64), pa.int64()),
        "rank": pa.array(merged["rank"].to_numpy(np.int32), pa.int32()),
        "doc_id": pa.array(merged.doc_id.to_numpy(np.int64), pa.int64()),
        "score": pa.array(merged.score.to_numpy(np.float64), pa.float64()),
    })


def keep_postings(decoded: tuple, keep: np.ndarray) -> tuple:
    """Restrict one decoded posting row (docs, tfs, dls) to the
    ALLOWLISTED docs. ``keep`` sorted unique; an empty allowlist
    matches nothing (the caller passes None for "no filter")."""
    docs, tfs, dls = decoded
    if len(keep) == 0:
        z = np.zeros(0, docs.dtype)
        return z, tfs[:0], dls[:0]
    idx = np.searchsorted(keep, docs)
    idx[idx == len(keep)] = len(keep) - 1
    m = keep[idx] == docs
    if m.all():
        return decoded
    return docs[m], tfs[m], dls[m]


class SegmentScorer:
    """Actor-pool stage: one actor scores many segments, state
    (queries, global df, stats) loaded once per actor."""

    def __init__(self, index_dir: str, queries: list[str], k: int,
                 mode: str, df: dict[str, int], n_docs: int, avgdl: float,
                 k1: float, b: float, prune: bool = False,
                 cf: dict[str, int] | None = None, total_tokens: int = 0,
                 mu: float = 2000.0,
                 deleted: np.ndarray | None = None,
                 boost=None,
                 keep: np.ndarray | None = None,
                 decay=None,
                 rank_feature=None):
        self.index_dir = index_dir
        self.k, self.mode = k, mode
        self.df, self.n_docs, self.avgdl = df, n_docs, avgdl
        self.k1, self.b = k1, b
        self.prune = prune
        self.cf, self.total_tokens, self.mu = cf, total_tokens, mu
        self.boost = boost
        self.decay = decay
        self.rank_feature = rank_feature
        # sorted unique tombstoned doc_ids (maintenance.delete_docs),
        # broadcast once per actor. Stats stay build-time — the
        # standard stale-stats-until-compaction semantics — but
        # tombstoned docs are filtered from every posting list before
        # scoring, so top-k back-fills from live docs.
        self.deleted = (deleted if deleted is not None and len(deleted)
                        else None)
        # sorted unique ALLOWLIST of doc_ids (Lucene filter-query
        # semantics: df/N/avgdl stay whole-corpus, only eligible docs
        # are scored — the mirror image of the tombstone path). None
        # means no filter; an EMPTY array legitimately matches nothing.
        # Broadcast once per actor like `deleted`; at 100 TB a
        # high-cardinality filter should instead be stored as a
        # per-segment attribute bitmap at build time (same layout as
        # the tombstone files) — this array form is for query-time
        # ad-hoc filters whose id set fits an object-store broadcast.
        self.keep = keep
        # raw strings or pre-tokenized [(term, weight), ...] lists
        # (query-by-document callers build weights themselves)
        self.qweights = [as_qweights(q) for q in queries]
        self.all_terms = sorted({t for qw in self.qweights for t, _ in qw})

    def _score_part(self, part: int) -> pa.Table:
        part_dir = part_dirname(self.index_dir, part)
        if not os.path.isdir(part_dir):
            return RESULT_SCHEMA.empty_table()
        if (self.prune and self.deleted is None and self.keep is None
                and self.mode in ("bm25", "overlap")
                and has_block_meta(part_dir)):
            # stored block-max skip path: posting rows stay ENCODED;
            # wand.pruned_topk_blockmax decodes only the blocks its
            # interval sweep proves can matter. Tombstones fall back
            # to the eager path (filtering needs the full arrays).
            from raysearch.wand import LazyPostings, pruned_topk_blockmax

            lazy = LazyPostings(read_postings(part_dir, self.all_terms,
                                              columns=SCORER_COLUMNS_BMW))
            qids, ranks, dids, scores = [], [], [], []
            for qid, qw in enumerate(self.qweights):
                d, s = pruned_topk_blockmax(
                    qw, lazy, self.df, self.n_docs, self.avgdl,
                    self.k1, self.b, self.k, self.mode)
                qids.extend([qid] * len(d))
                ranks.extend(range(1, len(d) + 1))
                dids.extend(d.tolist())
                scores.extend(float(x) for x in s)
            return pa.table({
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(dids, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            })
        tbl = read_postings(part_dir, self.all_terms,
                            columns=SCORER_COLUMNS)
        postings = {}
        max_tfs = {}
        for i, t in enumerate(tbl["term"].to_pylist()):
            decoded = decode_posting_row(tbl, i)
            if self.deleted is not None:
                from raysearch.maintenance import filter_postings

                decoded = filter_postings(decoded, self.deleted)
            if self.keep is not None:
                decoded = keep_postings(decoded, self.keep)
            postings[t] = decoded
            # max_tf stays the stored value: for live docs it is still
            # a valid UPPER bound, which is all the pruning path needs
            max_tfs[t] = tbl["max_tf"][i].as_py()
        return score_queries_over_postings(
            self.qweights, postings, max_tfs, self.df, self.n_docs,
            self.avgdl, self.k1, self.b, self.k, self.mode, self.prune,
            cf=self.cf, total_tokens=self.total_tokens, mu=self.mu,
            boost=self.boost, decay=self.decay,
            rank_feature=self.rank_feature)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = [self._score_part(int(p)) for p in batch["part"].to_pylist()]
        return pa.concat_tables(outs) if outs else RESULT_SCHEMA.empty_table()


def query_index(
    index_dir: str,
    queries: list[str],
    k: int = 10,
    mode: str = "bm25",
    concurrency: int | None = None,
    use_actors: bool = False,
    prune: bool = False,
    mu: float = 2000.0,
    boost=None,
    keep: np.ndarray | None = None,
    decay=None,
    rank_feature=None,
    asof: dict | None = None,
) -> pa.Table:
    """Top-k for each query: (query_id, rank, doc_id, score), ranked by
    the deterministic total order (-score, doc_id).

    use_actors=False (default) scores with stateless tasks — right for
    one-shot batch jobs (no pool spin-up latency; the scorer holds no
    heavy state because global df/stats are tiny and postings reads are
    term-filtered). use_actors=True runs the SegmentScorer actor pool —
    right for a long-lived session issuing many query batches, where
    actors amortize state across calls."""
    import ray.data

    stats = load_stats(index_dir)
    cfg = stats["config"]
    parts = stats.get("parts")
    if parts is None:
        from raysearch.segments import list_segment_parts

        parts = list_segment_parts(index_dir)
    all_terms = sorted({t for q in queries
                        for t, _ in as_qweights(q)})
    if asof is not None:
        # time-travel (snapshot) query: segments are immutable and
        # append-only (maintenance.append_index numbers new parts
        # after the old — the LSM layout), so a past generation IS a
        # part subset. Collection stats come from the caller (summed
        # from the per-part stats detail of the snapshot parts) and
        # df is re-derived by summing the PER-PART df column over the
        # snapshot parts (one tiny fan-out, terms x parts rows) —
        # never the post-append global lexicon, whose df/N/avgdl
        # would leak future documents into the scores.
        if mode in ("dirichlet", "jm", "dfi"):
            raise ValueError("asof supports bm25/overlap/classic "
                             "(per-generation cf is not reconstructed)")
        parts = sorted(asof["parts"])
        if not set(parts) <= set(stats.get("parts") or parts):
            raise ValueError("asof parts not in the index")
        df = asof.get("df")
        if df is None:
            df = asof_df(index_dir, parts, all_terms)
    else:
        df = lexicon_df(index_dir, all_terms)
    if concurrency is None:
        concurrency = max(1, min(len(parts), 16))
    parts_ds = ray.data.from_items([{"part": p} for p in parts])
    scorer_kwargs = dict(
        index_dir=index_dir, queries=queries, k=k, mode=mode, df=df,
        n_docs=(asof["n_docs"] if asof is not None else stats["n_docs"]),
        avgdl=(asof["avgdl"] if asof is not None else stats["avgdl"]),
        k1=cfg["k1"], b=cfg["b"], prune=prune)
    if boost is not None:
        if prune:
            raise ValueError(
                "boost requires prune=False (MaxScore bounds don't "
                "account for per-doc boost factors)")
        if mode not in ("bm25", "overlap"):
            raise ValueError(
                f"boost supports bm25/overlap only, not {mode} "
                "(dirichlet/jm scores are negative log sums — a "
                "factor would invert the intended promotion — and "
                "the other modes' boosted rankings are unmodeled)")
        scorer_kwargs["boost"] = boost
    if prune and mode in ("classic", "jm", "dfr", "boolean", "dfi", "axiomatic"):
        raise ValueError(f"{mode} mode requires prune=False (no "
                         "MaxScore bounds for its tf curve)")
    if decay is not None:
        if prune or mode != "bm25":
            raise ValueError(
                "decay requires mode='bm25' and prune=False (the "
                "dl-dependent multiplier isn't modeled by MaxScore "
                "bounds and would invert non-positive score scales)")
        scorer_kwargs["decay"] = decay
    if rank_feature is not None:
        if prune or mode != "bm25":
            raise ValueError(
                "rank_feature requires mode='bm25' and prune=False "
                "(the additive dl prior isn't modeled by MaxScore "
                "bounds and has no contract on other score scales)")
        scorer_kwargs["rank_feature"] = rank_feature
    if keep is not None:
        # normalize once driver-side so every scorer shares the sorted
        # unique form keep_postings' searchsorted requires
        scorer_kwargs["keep"] = np.unique(
            np.asarray(keep, dtype=np.int64))
    if mode in ("dirichlet", "jm", "dfi"):
        scorer_kwargs["cf"] = lexicon_cf(index_dir, all_terms)
        scorer_kwargs["total_tokens"] = stats["total_tokens"]
        scorer_kwargs["mu"] = mu
    from raysearch.maintenance import load_deletes

    deleted = load_deletes(index_dir)
    if len(deleted):
        scorer_kwargs["deleted"] = deleted
    # several segments per task: per-part work is a filtered parquet
    # read + vectorized scoring (~tens of ms), so one task per part
    # would be pure scheduling overhead at high P
    per_task = max(1, len(parts) // (2 * concurrency))
    if use_actors:
        candidates = parts_ds.map_batches(
            SegmentScorer, fn_constructor_kwargs=scorer_kwargs,
            batch_format="pyarrow", batch_size=per_task,
            concurrency=(1, min(concurrency, max(1, len(parts)))),
            num_cpus=1)
    else:
        scorer = SegmentScorer(**scorer_kwargs)
        candidates = parts_ds.map_batches(
            scorer, batch_format="pyarrow", batch_size=per_task, num_cpus=1)
    # P * Q * k candidate rows — k-bounded and tiny by construction, so
    # the final merge is a driver-side selection, not a shuffle
    cand = candidates.to_pandas()
    return merge_candidates(cand, len(queries), k)
