"""raysearch — a Ray-Data-native full-text index + BM25 query engine.

Built from scratch against the behavior of donalshijan/Search-Engine
(see SURVEY.md for the file:line map of the reference semantics); the
execution architecture is idiomatic Ray Data, not a port:

- ingest: ``ray.data.read_parquet`` over a ``(repo, path, commit, lang,
  content)`` source-code table (column-pruned at the read),
- tokenize: ``map_batches`` over zero-copy Arrow batches emitting
  ``(term, doc_id, tf, dl)`` triples, pre-aggregated per document
  map-side (the combiner),
- build: a doc-hash-partitioned ``groupby`` shuffle constructing
  sorted, delta+varint-compressed posting lists per segment, with
  per-partition document-length tables, per-partition manifests with
  lineage metadata (resumable), and tree-merged collection statistics,
- query: queries broadcast to a stateless/actor scorer stage; each
  segment returns an exact local top-k (scores are complete per doc
  because partitioning is by document), merged by a tiny final top-k.
"""

from raysearch.config import IndexConfig
from raysearch.tokenize import tokenize_doc, tokenize_query

__all__ = ["IndexConfig", "tokenize_doc", "tokenize_query"]
__version__ = "0.1.0"
