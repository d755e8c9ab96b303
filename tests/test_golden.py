"""Golden-fixture pinning (FIXTURES.md §3): today's oracle must equal
the COMMITTED golden top-k bytes — catches engine+oracle co-drift that
rank-identity alone cannot see. Regenerate deliberately with
tests/gen_golden.py after intentional semantics changes."""

import os

import pyarrow.parquet as pq

from raysearch.corpus import QUERIES, generate_corpus
from raysearch.oracle import Oracle

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures")


def test_queries_fixture_pinned():
    t = pq.read_table(os.path.join(FIXTURE_DIR, "queries.parquet"))
    assert t["query"].to_pylist() == QUERIES


def test_oracle_matches_committed_golden():
    golden = pq.read_table(os.path.join(FIXTURE_DIR, "golden_topk.parquet"))
    o = Oracle(generate_corpus(100, seed=42, labeled=True))
    bm25 = o.search_all(QUERIES, k=10, mode="bm25")
    tf = o.search_all(QUERIES, k=10, mode="overlap")
    assert golden["query_id"].to_pylist() == bm25["query_id"].to_pylist()
    assert golden["rank"].to_pylist() == bm25["rank"].to_pylist()
    assert golden["doc_id"].to_pylist() == bm25["doc_id"].to_pylist()
    assert golden["score_bm25"].to_pylist() == bm25["score"].to_pylist()
    assert golden["doc_id_tf"].to_pylist() == tf["doc_id"].to_pylist()
    assert golden["score_tf"].to_pylist() == tf["score"].to_pylist()
