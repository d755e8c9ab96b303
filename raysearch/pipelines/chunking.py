"""Content-defined chunking (CDC) over the ``documents`` table — the
rolling-hash fingerprinting op from the training-data mandate (the
sub-document dedup primitive: CDC boundaries survive insertions, so
shifted copies still share most chunk hashes, which byte-offset
chunking cannot do).

Vectorized: each batch flattens its documents into ONE byte array, a
polynomial rolling hash over a 16-byte window is computed with a
single strided-view matmul (no per-byte or per-doc Python), cut
points are a boolean mask (hash % TARGET == 0, cross-document windows
masked out), and chunk shas come from the boundary arrays.

No SQL oracle (a rolling hash is not reasonably expressible in
DuckDB): rows-only driver check + pytest properties (chunks
reassemble to the document; content-defined shift invariance).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

_DOCS = "documents.parquet"

CDC_WINDOW = 16          # rolling window bytes
CDC_TARGET = 64          # boundary when hash % TARGET == 0 (~64B mean)
CDC_MIN_CHUNK = 16       # suppress boundaries closer than this

# LOAD-BEARING INVARIANT: boundaries are only honored at offsets
# >= CDC_MIN_CHUNK into a document, and a cut at offset i is derived
# from the window [i-CDC_WINDOW, i). MIN_CHUNK >= WINDOW therefore
# guarantees every honored window lies wholly inside its document —
# the hash over the batch-flattened byte array can never leak a
# neighbor document's bytes into a cut decision (which would make
# chunking depend on batch composition).
assert CDC_MIN_CHUNK >= CDC_WINDOW
_P = np.uint64(1_000_003)
_POWERS = (_P ** np.arange(CDC_WINDOW, dtype=np.uint64))[::-1].copy()


def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, _DOCS),
                                 columns=["doc_id", "text"])


def _chunk_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, chunk_idx, n_bytes, chunk_sha) rows for one batch."""
    texts = [t.encode() for t in batch["text"].to_pylist()]
    doc_ids = batch["doc_id"].to_numpy()
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    keep = lens > 0
    if not keep.any():
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int64()),
                         "n_bytes": pa.array([], pa.int64()),
                         "chunk_sha": pa.array([], pa.string())})
    flat = np.frombuffer(b"".join(texts), dtype=np.uint8)
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    ends = starts + lens

    # rolling hash of every WINDOW-byte window: strided view + matmul
    cut = np.zeros(len(flat) + 1, dtype=bool)
    if len(flat) >= CDC_WINDOW:
        win = np.lib.stride_tricks.sliding_window_view(flat, CDC_WINDOW)
        h = win.astype(np.uint64) @ _POWERS  # wraps mod 2^64
        # window ending at byte i-1 puts a cut BEFORE byte i
        cand = np.flatnonzero(h % np.uint64(CDC_TARGET) == 0) + CDC_WINDOW
        cut[cand] = True
    # Python below loops over CHUNKS (~10/doc), never bytes: the
    # byte-level rolling hash above is one strided matmul
    out_d, out_i, out_n, out_sha = [], [], [], []
    for di in np.flatnonzero(keep):
        s, e = int(starts[di]), int(ends[di])
        # cuts interior to this doc, honoring the minimum chunk size
        interior = np.flatnonzero(cut[s + CDC_MIN_CHUNK:e])
        bounds = [s]
        for c in (interior + s + CDC_MIN_CHUNK).tolist():
            if c - bounds[-1] >= CDC_MIN_CHUNK:
                bounds.append(c)
        bounds.append(e)
        raw = texts[di]
        for k in range(len(bounds) - 1):
            a, b = bounds[k] - s, bounds[k + 1] - s
            out_d.append(int(doc_ids[di]))
            out_i.append(k)
            out_n.append(b - a)
            out_sha.append(hashlib.sha256(raw[a:b]).hexdigest()[:16])
    return pa.table({
        "doc_id": pa.array(out_d, pa.int64()),
        "chunk_idx": pa.array(out_i, pa.int64()),
        "n_bytes": pa.array(out_n, pa.int64()),
        "chunk_sha": pa.array(out_sha, pa.string()),
    })


def doc_chunks(sf_dir: str) -> pa.Table:
    """Per-document CDC chunk table (doc_id, chunk_idx, n_bytes,
    chunk_sha). Rows-only driver check; properties in pytest."""
    out = _read_docs(sf_dir).map_batches(
        _chunk_batch, batch_format="pyarrow", zero_copy_batch=True)
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow"))


def chunk_dedup_stats(sf_dir: str) -> pa.Table:
    """Corpus-level CDC dedup summary: total chunks/bytes vs distinct
    chunks/bytes — the 'how much would chunk-level dedup save' number.
    Shuffle carries (sha16, n_bytes) pairs only."""
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    chunks = _read_docs(sf_dir).map_batches(
        _chunk_batch, batch_format="pyarrow", zero_copy_batch=True)
    per_sha = chunks.groupby("chunk_sha").aggregate(
        Count(alias_name="copies"), Max("n_bytes", alias_name="n_bytes"))
    df = per_sha.to_pandas()
    total_chunks = int(df.copies.sum())
    total_bytes = int((df.copies * df.n_bytes).sum())
    return pa.table({
        "total_chunks": pa.array([total_chunks], pa.int64()),
        "distinct_chunks": pa.array([len(df)], pa.int64()),
        "total_bytes": pa.array([total_bytes], pa.int64()),
        "distinct_bytes": pa.array([int(df.n_bytes.sum())], pa.int64()),
    })


QUERIES = {
    "doc_chunks": doc_chunks,
    "chunk_dedup_stats": chunk_dedup_stats,
}

ORACLE_SQL = {}  # rolling hash: not SQL-expressible -> rows-only
