"""Regenerate the committed golden fixtures (FIXTURES.md §3).

Run manually after an INTENTIONAL semantics change:
    python tests/gen_golden.py
The committed parquet pins tokenizer+scoring semantics: if engine and
oracle ever drift together (a co-bug would still pass rank-identity),
tests/test_golden.py catches it against these bytes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from raysearch.corpus import QUERIES, generate_corpus  # noqa: E402
from raysearch.oracle import Oracle  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures")


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    pq.write_table(
        pa.table({"query_id": pa.array(range(len(QUERIES)), pa.int64()),
                  "query": pa.array(QUERIES, pa.string())}),
        os.path.join(FIXTURE_DIR, "queries.parquet"))
    corpus = generate_corpus(100, seed=42, labeled=True)
    o = Oracle(corpus)
    bm25 = o.search_all(QUERIES, k=10, mode="bm25")
    tf = o.search_all(QUERIES, k=10, mode="overlap")
    golden = pa.table({
        "query_id": bm25["query_id"],
        "rank": bm25["rank"],
        "doc_id": bm25["doc_id"],
        "score_bm25": bm25["score"],
        "doc_id_tf": tf["doc_id"],
        "score_tf": tf["score"],
    })
    pq.write_table(golden, os.path.join(FIXTURE_DIR, "golden_topk.parquet"))
    print("wrote", FIXTURE_DIR)


if __name__ == "__main__":
    main()
