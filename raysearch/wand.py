"""Exact top-k pruning (MaxScore family) for segment scoring.

The reference evaluates every posting of every query term
(/root/reference/src/lib.rs:374-399 — no pruning of any kind). This
module implements an EXACT pruned evaluation that returns the same
top-k, bit-identical scores included:

1. Per-term score upper bound:
   - bm25: weight * idf * (k1+1) — the tf->infinity limit of the term
     contribution (monotone in tf, independent of dl because the
     tf-norm is < k1+1 for all finite tf, dl).
   - overlap: weight * max_tf (max_tf is stored per posting row at
     build time).
2. theta seed: take the highest-bound term, compute its per-doc
   contributions, and let theta = its k-th largest contribution (0 if
   it has fewer than k postings). At least k documents have final
   score >= theta (their own contribution from that term alone).
3. Non-essential prefix: order terms by ascending bound and mark the
   longest prefix whose cumulative bounds sum STRICTLY below theta.
   A doc containing only non-essential terms scores < theta, so it
   cannot displace any of the >= k docs scoring >= theta — the
   candidate set (union of essential postings) is a superset of the
   true top-k.
3b. Block-max refinement: each essential posting is viewed in
   128-entry blocks with a per-block max-tf score bound (dl-free,
   conservative); a candidate whose summed block bounds plus the
   non-essential total still falls strictly below theta is dropped
   before full scoring. Still a superset of the true top-k.
4. Candidates are then scored over ALL query terms in ascending
   unique-term order — the same canonical accumulation order as full
   evaluation and the oracle — so returned scores are bit-identical.

Cross-checked against full evaluation on every fixture corpus in
tests/test_wand.py.
"""

from __future__ import annotations

import numpy as np

from raysearch.score import accumulate_scores, bm25_contrib, bm25_idf, topk

Posting = tuple[np.ndarray, np.ndarray, np.ndarray]  # docs, tfs, dls

BLOCK = 128  # posting entries per block for block-max bounds


def _block_entry_bounds(tfs: np.ndarray, w: int, idf: float, k1: float,
                        b: float, mode: str) -> np.ndarray:
    """Per-entry score upper bound from each 128-entry block's max tf.

    The bound is dl-free (denominator minimized at dl -> 0:
    tf*(k1+1)/(tf + k1*(1-b)) is the largest the tf-norm can get for
    that tf), so it is conservative for every entry in the block."""
    n = len(tfs)
    starts = np.arange(0, n, BLOCK)
    bmax = np.maximum.reduceat(tfs, starts).astype(np.float64)
    if mode == "overlap":
        block_ub = w * bmax
    else:
        block_ub = (w * idf) * (bmax * (k1 + 1.0)) / (bmax + k1 * (1.0 - b))
    return np.repeat(block_ub, np.minimum(BLOCK, n - starts))


def _block_max_candidates(essential, postings, idfs, k1, b, mode,
                          theta: float, cum_non_essential: float
                          ) -> np.ndarray:
    """Block-max candidate pruning (exact): a doc whose summed
    block-level upper bounds across the essential terms, plus the
    non-essential terms' total bound, fall strictly below theta cannot
    reach the top-k and is dropped before canonical scoring."""
    if not essential:
        return np.zeros(0, np.int64)
    all_docs = np.concatenate([postings[t][0] for t, _ in essential])
    if theta <= cum_non_essential:
        return np.unique(all_docs)
    all_ubs = np.concatenate([
        _block_entry_bounds(postings[t][1], w, idfs[t], k1, b, mode)
        for t, w in essential])
    uniq, inv = np.unique(all_docs, return_inverse=True)
    ub = np.full(len(uniq), cum_non_essential, dtype=np.float64)
    np.add.at(ub, inv, all_ubs)
    return uniq[ub >= theta]


def term_upper_bound(weight: int, idf: float, k1: float, mode: str,
                     max_tf: int) -> float:
    if mode == "overlap":
        return float(weight * max_tf)
    return weight * idf * (k1 + 1.0)


def pruned_topk(
    qweights: list[tuple[str, int]],
    postings: dict[str, Posting],
    max_tfs: dict[str, int],
    df: dict[str, int],
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    mode: str = "bm25",
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k with MaxScore pruning over one segment's postings."""
    terms = [(t, w) for t, w in qweights if t in postings]
    if not terms:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    idfs = {t: bm25_idf(df.get(t, 0), n_docs) for t, _ in terms}

    def contrib(t: str, w: int, docs, tfs, dls) -> np.ndarray:
        if mode == "overlap":
            return (w * tfs).astype(np.int64)
        return bm25_contrib(tfs, dls, idfs[t], w, k1, b, avgdl)

    bounds = {t: term_upper_bound(w, idfs[t], k1, mode, max_tfs.get(t, 0))
              for t, w in terms}

    # theta seed from the highest-bound term's own contributions
    t_best, w_best = max(terms, key=lambda tw: (bounds[tw[0]], tw[0]))
    docs_b, tfs_b, dls_b = postings[t_best]
    if len(docs_b) >= k:
        cb = contrib(t_best, w_best, docs_b, tfs_b, dls_b)
        theta = float(np.partition(cb, len(cb) - k)[len(cb) - k])
    else:
        theta = 0.0

    # longest ascending-bound prefix with cumulative bounds < theta
    by_bound = sorted(terms, key=lambda tw: (bounds[tw[0]], tw[0]))
    non_essential: set[str] = set()
    cum = 0.0
    for t, _ in by_bound:
        if t == t_best:
            break
        if cum + bounds[t] < theta:
            non_essential.add(t)
            cum += bounds[t]
        else:
            break
    essential = [tw for tw in terms if tw[0] not in non_essential]

    cand = _block_max_candidates(essential, postings, idfs,
                                 k1, b, mode, theta, cum)
    if len(cand) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    # canonical-order scoring restricted to candidates (bit-identical
    # to full evaluation for these docs)
    per_term = []
    for t, w in sorted(terms):
        docs, tfs, dls = postings[t]
        pos = np.searchsorted(docs, cand)
        pos_c = np.clip(pos, 0, len(docs) - 1)
        hit = docs[pos_c] == cand
        sel = pos_c[hit]
        if hit.any():
            per_term.append((cand[hit], contrib(t, w, docs[sel], tfs[sel],
                                                dls[sel])))
    final_docs, final_scores = accumulate_scores(per_term)
    return topk(final_docs, final_scores, k)
