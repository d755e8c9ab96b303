"""Dirichlet query-likelihood kernel: brute-force equivalence and the
doc-partitioning invariance that makes per-segment scores final."""

import math

import numpy as np

from raysearch.score import dirichlet_scores, topk

MU = 2000.0

# tiny corpus: doc -> {term: tf}; dl = sum of tfs
DOCS = {
    1: {"hash": 3, "join": 1, "scan": 2},
    2: {"join": 4, "sort": 1},
    3: {"hash": 1, "sort": 5, "scan": 1},
    4: {"merge": 2},
}


def _lookup_for(docs: dict):
    """term -> (doc_ids asc, tfs, dls) over a doc subset."""
    def lookup(term):
        rows = [(d, tf[term], sum(tf.values()))
                for d, tf in sorted(docs.items()) if term in tf]
        if not rows:
            return None
        a = np.array(rows, np.int64)
        return a[:, 0], a[:, 1], a[:, 2]
    return lookup


def _cf_total(docs: dict):
    cf: dict = {}
    for tf in docs.values():
        for t, n in tf.items():
            cf[t] = cf.get(t, 0) + n
    return cf, sum(cf.values())


def _brute(qweights, docs, cf, total):
    """Direct per-doc evaluation of the Dirichlet QL formula."""
    out = {}
    cand = {d for d, tf in docs.items()
            if any(t in tf for t, _ in qweights if cf.get(t, 0) > 0)}
    for d in cand:
        dl = sum(docs[d].values())
        s = 0.0
        for t, w in qweights:
            if cf.get(t, 0) == 0:
                continue
            p = cf[t] / total
            s += w * math.log((docs[d].get(t, 0) + MU * p) / (dl + MU))
        out[d] = s
    return out


def test_matches_brute_force():
    cf, total = _cf_total(DOCS)
    qw = [("hash", 1), ("sort", 2), ("zzz_absent", 1)]
    docs, scores = dirichlet_scores(qw, _lookup_for(DOCS), cf, total, MU)
    exp = _brute(qw, DOCS, cf, total)
    assert set(docs.tolist()) == set(exp)
    for d, s in zip(docs.tolist(), scores.tolist()):
        assert abs(s - exp[d]) < 1e-9


def test_partition_invariance():
    """Scoring each doc-partition separately (with GLOBAL cf/total)
    and merging top-k gives exactly the single-partition result —
    the property that keeps per-segment scores final."""
    cf, total = _cf_total(DOCS)
    qw = [("hash", 1), ("join", 1), ("sort", 1)]
    d_all, s_all = dirichlet_scores(qw, _lookup_for(DOCS), cf, total, MU)
    ka, sa = topk(d_all, s_all, 3)

    parts = [{1: DOCS[1], 4: DOCS[4]}, {2: DOCS[2], 3: DOCS[3]}]
    merged: list[tuple[int, float]] = []
    for p in parts:
        d, s = dirichlet_scores(qw, _lookup_for(p), cf, total, MU)
        merged.extend(zip(d.tolist(), s.tolist()))
    md = np.array([d for d, _ in merged], np.int64)
    ms = np.array([s for _, s in merged], np.float64)
    kb, sb = topk(md, ms, 3)
    assert ka.tolist() == kb.tolist()
    assert sa.tolist() == sb.tolist()


def test_absent_terms_and_empty():
    cf, total = _cf_total(DOCS)
    d, s = dirichlet_scores([("zzz", 1)], _lookup_for(DOCS), cf, total, MU)
    assert len(d) == 0 and len(s) == 0
    d, s = dirichlet_scores([], _lookup_for(DOCS), cf, total, MU)
    assert len(d) == 0


def test_scores_negative_and_tf_monotone():
    """QL log-probabilities are negative; more query-term mass in a
    doc of equal length scores higher."""
    docs = {1: {"a": 5, "b": 5}, 2: {"a": 9, "b": 1}}
    cf, total = _cf_total(docs)
    d, s = dirichlet_scores([("a", 1)], _lookup_for(docs), cf, total, MU)
    by = dict(zip(d.tolist(), s.tolist()))
    assert all(v < 0 for v in by.values())
    assert by[2] > by[1]


def test_resident_dirichlet_identity(ray_session, tmp_path):
    """The resident serving path supports dirichlet and is
    bit-identical to the one-shot scorer and the oracle."""
    import ray.data

    from raysearch.build import build_index
    from raysearch.config import IndexConfig
    from raysearch.corpus import QUERIES, generate_corpus
    from raysearch.oracle import Oracle
    from raysearch.query import query_index
    from raysearch.serve import QuerySession

    corpus = generate_corpus(600, seed=707, labeled=True)
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(corpus), idx,
                IndexConfig(num_parts=5), input_id="rand-707")
    golden = Oracle(corpus).search_all(QUERIES, k=10, mode="dirichlet")
    one_shot = query_index(idx, QUERIES, k=10, mode="dirichlet")
    with QuerySession(idx, num_actors=2) as s:
        resident = s.query_batch(QUERIES, k=10, mode="dirichlet")
    assert one_shot.equals(golden)
    assert resident.equals(golden)
