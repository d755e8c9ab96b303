"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() happens here or in the raysearch library.

- entry(): flagship pipeline — build the segment index over the
  sf0.001 documents table (tokenize -> salted groupby shuffle ->
  delta+varint segments with manifests -> tree-merged stats + global
  lexicon), then run the fixed query set through the distributed BM25
  scorer and return the top-k table.
- queries(): one callable per implemented operator/pipeline from
  SURVEY.md §2 (+ the large-scale training-data ops); each takes an
  sf_dir and returns a pyarrow Table.
- oracle_sql(): the DuckDB-equivalent SQL per query, same column
  names/types.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SMOKE_SF = "/root/testdata/sf0.001"


def entry() -> Any:
    from raysearch.pipelines.search_queries import bm25_topk

    return bm25_topk(_SMOKE_SF)


def queries() -> dict[str, Callable[[str], Any]]:
    from raysearch.pipelines import search_queries

    out: dict[str, Callable[[str], Any]] = {}
    out.update(search_queries.QUERIES)
    try:
        from raysearch.pipelines import textops
        out.update(textops.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import dedup
        out.update(dedup.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import similarity
        out.update(similarity.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import events
        out.update(events.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import multimodal
        out.update(multimodal.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import extras
        out.update(extras.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import chunking
        out.update(chunking.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import lm
        out.update(lm.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import joins
        out.update(joins.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import sketches
        out.update(sketches.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import winnow
        out.update(winnow.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import mixing
        out.update(mixing.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import dsir
        out.update(dsir.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import packing
        out.update(packing.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import profile
        out.update(profile.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import bpe
        out.update(bpe.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import relational
        out.update(relational.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import knn
        out.update(knn.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import semistructured
        out.update(semistructured.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import wildcard
        out.update(wildcard.QUERIES)
    except ImportError:
        pass
    try:
        from raysearch.pipelines import fuzzy
        out.update(fuzzy.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from raysearch.pipelines import search_queries

    out: dict[str, str] = {}
    out.update(search_queries.ORACLE_SQL)
    for mod_name in ("textops", "dedup", "similarity", "events",
                     "multimodal", "extras", "chunking", "lm", "joins",
                     "sketches", "winnow", "mixing", "dsir", "packing",
                     "profile", "bpe", "relational", "knn",
                     "semistructured", "wildcard", "fuzzy"):
        try:
            mod = __import__(f"raysearch.pipelines.{mod_name}",
                             fromlist=["ORACLE_SQL"])
            out.update(mod.ORACLE_SQL)
        except ImportError:
            pass
    return out
