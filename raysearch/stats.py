"""Collection statistics: per-partition partials + tree merge.

Each segment's manifest records its partial (n_docs, sum_dl, total_tf,
n_terms, n_postings); the driver merges the P partials pairwise
(a balanced tree reduce — associative and commutative, so the shape is
free to change with P) into the global stats the BM25 scorer needs:
N and avgdl. df is per-term and lives in the global lexicon, not here
(SURVEY §4.3 "stats merge").
"""

from __future__ import annotations

import json
import os


def combine(a: dict, b: dict) -> dict:
    return {
        "n_docs": a["n_docs"] + b["n_docs"],
        "sum_dl": a["sum_dl"] + b["sum_dl"],
        "total_tf": a["total_tf"] + b["total_tf"],
        "n_postings": a["n_postings"] + b["n_postings"],
        "n_terms": a["n_terms"] + b["n_terms"],  # sum of per-part vocab sizes
    }


def tree_merge(partials: list[dict]) -> dict:
    """Pairwise balanced reduce over partition partials."""
    if not partials:
        return {"n_docs": 0, "sum_dl": 0, "total_tf": 0,
                "n_postings": 0, "n_terms": 0}
    level = list(partials)
    while len(level) > 1:
        nxt = [combine(level[i], level[i + 1])
               for i in range(0, len(level) - 1, 2)]
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    return level[0]


def stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats.json")


def write_stats(index_dir: str, merged: dict, config: dict,
                lineage: dict, extra: dict | None = None) -> dict:
    n_docs = merged["n_docs"]
    out = {
        "n_docs": n_docs,
        "total_tokens": merged["sum_dl"],
        "avgdl": merged["sum_dl"] / n_docs if n_docs else 0.0,
        "n_postings": merged["n_postings"],
        "config": config,
        "lineage": lineage,
    }
    if extra:
        out.update(extra)
    tmp = stats_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    os.replace(tmp, stats_path(index_dir))
    return out


def load_stats(index_dir: str) -> dict:
    with open(stats_path(index_dir)) as f:
        return json.load(f)
