"""Sequence-packing offsets over the documents table — GPT-style
"concatenate in doc_id order, chop into fixed L-token blocks"
packing: per document, its start offset in the concatenated token
stream, its token length, and the number of L-token training blocks
it spans. This is what a dataloader-shard planner needs to map
documents to training sequences without materializing the token
stream.

The core is a DISTRIBUTED ORDERED PREFIX SUM (the classic scan
primitive, which Ray Data has no operator for):

1. ONE corpus pass tokenizes and emits a narrow (doc_id, dl, rng)
   row per document (rng = balanced doc_id-RANGE bucket — ranges are
   disjoint and ordered, unlike hash buckets, so in-range order plus
   range order is total order). The narrow table (24 B/doc) is
   materialized once; text is never read again.
2. A range-cardinality groupby sums per-range token totals; the
   driver exclusive-cumsums this nb-row array into per-range BASE
   offsets and broadcasts it via ray.put.
3. One groupby(rng) co-locates each range; the in-group kernel sorts
   by doc_id and local-cumsums on top of the broadcast base — every
   doc's global offset with no global sort and no sequential pass.

Block math: a doc spanning [start, start+dl) crosses
floor((start+dl-1)/L) - floor(start/L) + 1 blocks (0 for empty docs);
both sides compute it in exact int64.

doc_id ranges come from parquet footer column statistics (min/max),
so bucketing needs no extra data pass; ids need not be dense —
skewed ranges cost balance, never correctness.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_DOCS = "documents.parquet"
PACK_L = 2048  # training-sequence (block) length in tokens


def _doc_id_bounds(path: str) -> tuple[int, int]:
    """(min, max) doc_id from parquet footer statistics — no data
    read. Falls back to a conservative scan only if a writer omitted
    statistics (our corpora never do)."""
    import pyarrow.parquet as pq

    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if f.endswith(".parquet")]
             if os.path.isdir(path) else [path])
    lo, hi = None, None
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().get_field_index("doc_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                t = pq.read_table(f, columns=["doc_id"])
                mn = pc.min_max(t["doc_id"]).values()
                vals = [v.as_py() for v in mn]
                lo = vals[0] if lo is None else min(lo, vals[0])
                hi = vals[1] if hi is None else max(hi, vals[1])
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return int(lo), int(hi)


def pack_offsets(sf_dir: str) -> pa.Table:
    """(doc_id, dl, start_tok, n_blocks) per document under
    concatenate-in-doc_id-order / chop-into-PACK_L-blocks packing."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets, parquet_rows

    path = os.path.join(sf_dir, _DOCS)
    empty = pa.table({c: pa.array([], pa.int64()) for c in
                      ("doc_id", "dl", "start_tok", "n_blocks")})
    n_rows = parquet_rows(path)
    if n_rows == 0:
        return empty
    nb = auto_buckets(n_rows)
    lo, hi = _doc_id_bounds(path)
    span = max(hi - lo + 1, 1)

    def narrow(batch: pa.Table) -> pa.Table:
        from raysearch.pipelines.textops import _tokens

        toks = _tokens(batch)
        dl = pc.list_value_length(toks).to_numpy().astype(np.int64)
        ids = batch["doc_id"].to_numpy()
        rng = np.clip((ids - lo) * nb // span, 0, nb - 1)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "dl": pa.array(dl, pa.int64()),
                         "rng": pa.array(rng, pa.int64())})

    rows = ray.data.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(narrow, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()

    totals = (rows.groupby("rng").aggregate(Sum("dl", alias_name="tot"))
              .to_pandas())
    base = np.zeros(nb, dtype=np.int64)
    base[totals["rng"].to_numpy(np.int64)] = totals["tot"].to_numpy(
        np.int64)
    base = np.concatenate(([0], np.cumsum(base)[:-1]))  # exclusive
    base_ref = ray.put(base)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)  # zero-copy numpy view
        g = g.sort_values("doc_id")
        dl = g["dl"].to_numpy(np.int64)
        start = (b[int(g["rng"].iloc[0])]
                 + np.concatenate(([0], np.cumsum(dl)[:-1])))
        nblk = np.where(
            dl > 0,
            (start + dl - 1) // PACK_L - start // PACK_L + 1, 0)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "dl": dl, "start_tok": start,
                             "n_blocks": nblk.astype(np.int64)})

    out = rows.groupby("rng").map_groups(kern, batch_format="pandas")
    df = out.to_pandas()
    if "start_tok" not in df.columns:  # empty input
        df = pd.DataFrame({c: np.array([], dtype=np.int64) for c in
                           ("doc_id", "dl", "start_tok", "n_blocks")})
    df = df.sort_values("doc_id", ignore_index=True)
    return pa.table({
        "doc_id": pa.array(df.doc_id.to_numpy(np.int64), pa.int64()),
        "dl": pa.array(df.dl.to_numpy(np.int64), pa.int64()),
        "start_tok": pa.array(df.start_tok.to_numpy(np.int64),
                              pa.int64()),
        "n_blocks": pa.array(df.n_blocks.to_numpy(np.int64),
                             pa.int64()),
    })


def sql_pack_offsets() -> str:
    return rf"""
WITH d AS (SELECT doc_id,
                  len(regexp_extract_all(text, '\S+'))::BIGINT AS dl
           FROM documents),
w AS (SELECT doc_id, dl,
             COALESCE(SUM(dl) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)::BIGINT AS start_tok
      FROM d)
SELECT doc_id, dl, start_tok,
       CASE WHEN dl = 0 THEN 0
            ELSE (start_tok + dl - 1) // {PACK_L}
                 - start_tok // {PACK_L} + 1
       END::BIGINT AS n_blocks
FROM w
"""


SHUF_HEX = 11  # 44-bit md5 prefix, the engine's shared order hash


def shuffle_positions(sf_dir: str) -> pa.Table:
    """Deterministic global-shuffle ordering for training epochs:
    every document's 0-based position in the md5(doc_id)-permuted
    order — reproducible from the key alone on any engine, so shards
    built on different machines agree without a stored permutation.

    The same distributed ordered-prefix-sum shape as pack_offsets,
    but on the HASH domain: bucket = the top bits of the 44-bit md5
    prefix, so buckets are RANGE-ordered in the shuffle key AND
    uniformly balanced by construction (no footer statistics needed).
    Pass 1 counts per bucket (combiner partials through one narrow
    groupby; the driver exclusive-cumsums nb rows into broadcast base
    ranks); pass 2 is one bucket groupby whose kernel sorts in-range
    by (hash, doc_id) and adds the base — a global permutation with
    NO global sort. Hash ties break by doc_id; lowercase fixed-width
    hex compares identically as string (oracle) and integer (engine).
    """
    import hashlib

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets, parquet_rows

    path = os.path.join(sf_dir, _DOCS)
    n_rows = parquet_rows(path)
    if n_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    nb = auto_buckets(n_rows)
    shift = np.uint64(4 * SHUF_HEX - int(nb).bit_length() + 1)

    def narrow(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        h = np.fromiter(
            (int(hashlib.md5(str(int(i)).encode())
                 .hexdigest()[:SHUF_HEX], 16) for i in ids),
            dtype=np.uint64, count=len(ids))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "h": pa.array(h.astype(np.int64), pa.int64()),
            "rng": pa.array((h >> shift).astype(np.int64), pa.int64()),
            "n": pa.array(np.ones(len(ids), np.int64), pa.int64()),
        })

    rows = ray.data.read_parquet(path, columns=["doc_id"]) \
        .map_batches(narrow, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()

    totals = (rows.groupby("rng").aggregate(Sum("n", alias_name="cnt"))
              .to_pandas())
    base = np.zeros(nb, dtype=np.int64)
    base[totals["rng"].to_numpy(np.int64)] = totals["cnt"].to_numpy(
        np.int64)
    base = np.concatenate(([0], np.cumsum(base)[:-1]))  # exclusive
    base_ref = ray.put(base)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)  # zero-copy numpy view
        ids = g["doc_id"].to_numpy(np.int64)
        h = g["h"].to_numpy(np.int64)
        order = np.lexsort((ids, h))
        pos = b[int(g["rng"].iloc[0])] + np.arange(len(ids),
                                                   dtype=np.int64)
        return pd.DataFrame({"doc_id": ids[order], "pos": pos})

    out = rows.groupby("rng").map_groups(kern, batch_format="pandas")
    df = out.to_pandas()
    if "pos" not in df.columns:  # empty input
        df = pd.DataFrame({"doc_id": np.array([], np.int64),
                           "pos": np.array([], np.int64)})
    df = df.sort_values("doc_id", ignore_index=True)
    return pa.table({
        "doc_id": pa.array(df.doc_id.to_numpy(np.int64), pa.int64()),
        "pos": pa.array(df.pos.to_numpy(np.int64), pa.int64()),
    })


def sql_shuffle_positions() -> str:
    return f"""
SELECT doc_id,
       (row_number() OVER (
            ORDER BY substr(md5(doc_id::VARCHAR), 1, {SHUF_HEX}),
                     doc_id) - 1)::BIGINT AS pos
FROM documents ORDER BY doc_id
"""


QUERIES = {"pack_offsets": pack_offsets,
           "shuffle_positions": shuffle_positions}
ORACLE_SQL = {"pack_offsets": sql_pack_offsets(),
              "shuffle_positions": sql_shuffle_positions()}
