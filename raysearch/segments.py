"""Posting-list segment construction and IO.

A segment = one document-hash partition of the index:

    segments/part-00042/
        postings.parquet   term, df, cf, max_tf, docs_enc, tfs_enc, dls_enc
        doclens.parquet    doc_id, dl, sha (sha256 of source content)
        _MANIFEST.json     lineage + content hashes (checkpoint.py)

postings.parquet rows are term-sorted; doc_ids are ascending,
delta+varint encoded (codec.py); tf and dl ride along per posting entry
so BM25 needs no doclens join at query time. Small row groups keep
term-filtered reads cheap (row-group min/max pruning on the sorted term
column).

The reference never persists its index at all (nothing serializes
SearchLibrary — absence noted in SURVEY §2.1); this layout is mandated
by the north rule (compressed postings, per-partition doc-length
tables, resumable checkpoints).

All posting construction is vectorized: sort -> dictionary-encode ->
reduceat for df/cf/max_tf -> one bulk varint pass per column, then the
per-term blobs are cut out of the bulk buffer by byte offsets
(codec.bulk_encode_segmented). No per-term Python loop on the build
path.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raysearch.codec import (
    binary_from_offsets,
    bulk_encode_segmented,
    decode_doc_ids,
    decode_ints,
    decode_pos_runs,
    varint_run_byte_offsets,
)
from raysearch.triples import KIND_DOCLEN, KIND_POSTING

_SHA_HEX_LEN = 64

# block-max metadata granularity (Lucene-style BMW skip data): every
# posting row carries, per BLOCK-entry block, the absolute first doc
# (bfirst_enc, delta+varint) and the block max tf (bmax_enc, varint).
# ~2/BLOCK size overhead; lets the MaxScore path (wand.py) prune and
# DECODE whole blocks selectively — the stored first doc makes any
# block independently decodable from the unchanged row blob (the
# block's leading delta is replaced by the stored absolute value).
BLOCK = 128

PARTIAL_SCHEMA = pa.schema([
    ("dpart", pa.int32()),
    ("kind", pa.int8()),
    ("term", pa.large_string()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("max_tf", pa.int32()),
    ("docs_enc", pa.large_binary()),
    ("tfs_enc", pa.large_binary()),
    ("dls_enc", pa.large_binary()),
    ("bfirst_enc", pa.large_binary()),
    ("bmax_enc", pa.large_binary()),
])

POSTINGS_SCHEMA = pa.schema([
    ("term", pa.large_string()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("max_tf", pa.int32()),
    ("docs_enc", pa.large_binary()),
    ("tfs_enc", pa.large_binary()),
    ("dls_enc", pa.large_binary()),
    ("bfirst_enc", pa.large_binary()),
    ("bmax_enc", pa.large_binary()),
])

# positional variants (config.with_positions): pos_enc is the
# concatenation, in doc order, of each doc's delta+varint-encoded
# within-doc positions — split along the tf array (value counts) or
# varint_run_byte_offsets (byte slices), delta resetting per doc so
# per-doc blobs are independently decodable and byte-concatenable
PARTIAL_SCHEMA_POS = PARTIAL_SCHEMA.append(
    pa.field("pos_enc", pa.large_binary()))
POSTINGS_SCHEMA_POS = POSTINGS_SCHEMA.append(
    pa.field("pos_enc", pa.large_binary()))


def _pos_value_offsets(arr: pa.Array) -> tuple[np.ndarray, memoryview]:
    """(absolute value byte offsets, data buffer) of a large_binary
    array, honoring a nonzero array offset."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return off, data


def _concat_blob_runs(arr: pa.Array, bounds: np.ndarray) -> pa.Array:
    """Concatenate consecutive blob values into per-run blobs by byte
    slicing (zero-copy): run i = values [bounds[i], bounds[i+1])."""
    off, data = _pos_value_offsets(arr)
    b0 = off[bounds]
    newoff = b0 - b0[0]
    return pa.Array.from_buffers(
        pa.large_binary(), len(b0) - 1,
        [None, pa.py_buffer(newoff.astype(np.int64).tobytes()),
         pa.py_buffer(bytes(data[b0[0]:b0[-1]]))])


_binary_from_offsets = binary_from_offsets  # canonical impl: codec.py


def postings_from_sorted_triples(
    terms: pa.Array, doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
    pos: pa.Array | None = None,
) -> pa.Table:
    """Build encoded posting rows from (term, doc_id)-sorted triples.
    ``pos``, when given, is a large_binary array aligned with the
    triples: each value is that (term, doc)'s already-encoded
    within-doc position blob; per-term pos_enc is the byte-level
    concatenation over the term's doc run (no re-encode)."""
    n = len(doc_ids)
    if n == 0:
        return (POSTINGS_SCHEMA_POS if pos is not None
                else POSTINGS_SCHEMA).empty_table()
    dict_arr = pc.dictionary_encode(terms)
    # terms sorted => dictionary is in first-appearance = sorted order
    # and codes are monotonically nondecreasing
    codes = dict_arr.indices.to_numpy()
    uniq_terms = dict_arr.dictionary
    starts = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1])
    bounds = np.append(starts, n)
    df = np.diff(bounds)
    cf = np.add.reduceat(tfs, starts)
    max_tf = np.maximum.reduceat(tfs, starts)
    docs_buf, docs_off = bulk_encode_segmented(doc_ids, starts, delta=True)
    tfs_buf, tfs_off = bulk_encode_segmented(tfs, starts, delta=False)
    dls_buf, dls_off = bulk_encode_segmented(dls, starts, delta=False)
    # per-term block metadata: ceil(df/BLOCK) blocks per term; for each
    # block its first (absolute) doc and its max tf. One reduceat, one
    # bulk varint pass — same no-Python-loop discipline as the blobs.
    nb = (df + BLOCK - 1) // BLOCK
    brow_starts = np.zeros(len(nb), dtype=np.int64)
    np.cumsum(nb[:-1], out=brow_starts[1:])
    total_blocks = int(nb.sum())
    within = ((np.arange(total_blocks, dtype=np.int64)
               - np.repeat(brow_starts, nb)) * BLOCK)
    bstarts = np.repeat(bounds[:-1], nb) + within
    bfirst = doc_ids[bstarts]
    bmax = (np.maximum.reduceat(tfs, bstarts) if total_blocks
            else np.zeros(0, np.int64))
    bfirst_buf, bfirst_off = bulk_encode_segmented(
        bfirst, brow_starts, delta=True)
    bmax_buf, bmax_off = bulk_encode_segmented(
        bmax.astype(np.int64), brow_starts, delta=False)
    cols = {
        "term": pc.cast(uniq_terms, pa.large_string()),
        "df": pa.array(df, pa.int64()),
        "cf": pa.array(cf.astype(np.int64), pa.int64()),
        "max_tf": pa.array(max_tf.astype(np.int32), pa.int32()),
        "docs_enc": _binary_from_offsets(docs_buf, docs_off),
        "tfs_enc": _binary_from_offsets(tfs_buf, tfs_off),
        "dls_enc": _binary_from_offsets(dls_buf, dls_off),
        "bfirst_enc": _binary_from_offsets(bfirst_buf, bfirst_off),
        "bmax_enc": _binary_from_offsets(bmax_buf, bmax_off),
    }
    if pos is not None:
        cols["pos_enc"] = _concat_blob_runs(pos, bounds)
    return pa.table(cols)


def build_partials(group: pa.Table) -> pa.Table:
    """Stage B (per gkey group): triples -> encoded partial postings +
    one packed doclen row. With salt S=1 a group is a whole partition
    and the output is already final; with S>1 each of the S subgroups
    produces sorted partial runs merged in stage C."""
    dpart = int(group["dpart"][0].as_py())

    # terms arrive dictionary-encoded from the shuffle (triples.py);
    # decode once here — everything downstream wants plain strings
    tcol = group["term"]
    if pa.types.is_dictionary(tcol.type):
        group = group.set_column(
            group.schema.get_field_index("term"), "term",
            pc.cast(tcol, pa.large_string()))

    has_pos = "pos" in group.column_names
    schema = PARTIAL_SCHEMA_POS if has_pos else PARTIAL_SCHEMA
    out_tables = []
    post = group.filter(pc.equal(group["kind"], KIND_POSTING))
    if post.num_rows:
        post = post.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        tbl = postings_from_sorted_triples(
            post["term"].combine_chunks(),
            post["doc_id"].to_numpy(),
            post["tf"].to_numpy().astype(np.int64),
            post["dl"].to_numpy().astype(np.int64),
            pos=post["pos"] if has_pos else None)
        tbl = tbl.add_column(0, "dpart", pa.array([dpart] * tbl.num_rows, pa.int32()))
        tbl = tbl.add_column(1, "kind", pa.array([KIND_POSTING] * tbl.num_rows, pa.int8()))
        out_tables.append(tbl)

    dlen = group.filter(pc.equal(group["kind"], KIND_DOCLEN))
    if dlen.num_rows:
        dlen = dlen.sort_by([("doc_id", "ascending")])
        docs = dlen["doc_id"].to_numpy()
        dls = dlen["dl"].to_numpy().astype(np.int64)
        shas = dlen["sha"].to_pylist()
        one = np.zeros(1, dtype=np.int64)
        docs_buf, _ = bulk_encode_segmented(docs, one, delta=True)
        dls_buf, _ = bulk_encode_segmented(dls, one, delta=False)
        sha_buf = "".join(s if s is not None else "0" * _SHA_HEX_LEN
                          for s in shas).encode()
        dcols = {
            "dpart": pa.array([dpart], pa.int32()),
            "kind": pa.array([KIND_DOCLEN], pa.int8()),
            "term": pa.array([""], pa.large_string()),
            "df": pa.array([len(docs)], pa.int64()),
            "cf": pa.array([int(dls.sum())], pa.int64()),
            "max_tf": pa.array([0], pa.int32()),
            "docs_enc": pa.array([docs_buf], pa.large_binary()),
            "tfs_enc": pa.array([sha_buf], pa.large_binary()),
            "dls_enc": pa.array([dls_buf], pa.large_binary()),
            "bfirst_enc": pa.array([b""], pa.large_binary()),
            "bmax_enc": pa.array([b""], pa.large_binary()),
        }
        if has_pos:
            dcols["pos_enc"] = pa.array([b""], pa.large_binary())
        out_tables.append(pa.table(dcols))
    if not out_tables:
        return schema.empty_table()
    return pa.concat_tables([t.cast(schema) for t in out_tables])


def merge_partials(rows: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Stage C (per dpart): merge <=S partial runs into the final
    (postings, doclens) tables for one segment.

    When every term has a single run (salt=1) the encoded partials pass
    through untouched; otherwise the duplicated terms' runs are decoded,
    concatenated (doc sets are disjoint across salt subgroups) and
    rebuilt through the same vectorized core.
    """
    has_pos = "pos_enc" in rows.column_names
    out_schema = POSTINGS_SCHEMA_POS if has_pos else POSTINGS_SCHEMA
    post = rows.filter(pc.equal(rows["kind"], KIND_POSTING)) \
               .sort_by([("term", "ascending")])
    terms = post["term"]
    n = post.num_rows
    if n:
        tnp = np.asarray(terms.to_pylist(), dtype=object)
        dup_mask = np.zeros(n, dtype=bool)
        same = tnp[1:] == tnp[:-1]
        dup_mask[1:] |= same
        dup_mask[:-1] |= same
    else:
        dup_mask = np.zeros(0, dtype=bool)
    if dup_mask.any():
        keep = post.filter(pa.array(~dup_mask))
        dups = post.filter(pa.array(dup_mask))
        # decode duplicated runs back to triples and rebuild; per-doc
        # position blobs are byte-sliced along the tf array and ride
        # the triples untouched (delta resets per doc, so a blob is
        # valid wherever it lands after the doc-order re-sort)
        t_list, d_list, f_list, l_list, p_list = [], [], [], [], []
        for i in range(dups.num_rows):
            d = decode_doc_ids(dups["docs_enc"][i].as_py())
            t_list.append(np.full(len(d), dups["term"][i].as_py(),
                                  dtype=object))
            d_list.append(d)
            f = decode_ints(dups["tfs_enc"][i].as_py())
            f_list.append(f)
            l_list.append(decode_ints(dups["dls_enc"][i].as_py()))
            if has_pos:
                blob = dups["pos_enc"][i].as_py()
                boff = varint_run_byte_offsets(blob, f)
                p_list.extend(blob[boff[j]:boff[j + 1]]
                              for j in range(len(f)))
        tcols = {
            "term": pa.array(np.concatenate(t_list), pa.large_string()),
            "doc_id": pa.array(np.concatenate(d_list), pa.int64()),
            "tf": pa.array(np.concatenate(f_list), pa.int64()),
            "dl": pa.array(np.concatenate(l_list), pa.int64()),
        }
        if has_pos:
            tcols["pos"] = pa.array(p_list, pa.large_binary())
        trip = pa.table(tcols).sort_by(
            [("term", "ascending"), ("doc_id", "ascending")])
        rebuilt = postings_from_sorted_triples(
            trip["term"].combine_chunks(), trip["doc_id"].to_numpy(),
            trip["tf"].to_numpy(), trip["dl"].to_numpy(),
            pos=trip["pos"] if has_pos else None)
        keep = keep.drop_columns(["dpart", "kind"]).cast(out_schema)
        postings = pa.concat_tables([keep, rebuilt]) \
                     .sort_by([("term", "ascending")])
    else:
        postings = post.drop_columns(["dpart", "kind"]).cast(out_schema)

    dlen = rows.filter(pc.equal(rows["kind"], KIND_DOCLEN))
    docs_l, dls_l, sha_l = [], [], []
    for i in range(dlen.num_rows):
        d = decode_doc_ids(dlen["docs_enc"][i].as_py())
        docs_l.append(d)
        dls_l.append(decode_ints(dlen["dls_enc"][i].as_py()))
        blob = dlen["tfs_enc"][i].as_py().decode()
        sha_l.append([blob[j * _SHA_HEX_LEN:(j + 1) * _SHA_HEX_LEN]
                      for j in range(len(d))])
    if docs_l:
        docs = np.concatenate(docs_l)
        order = np.argsort(docs, kind="stable")
        shas = np.concatenate([np.asarray(s, dtype=object) for s in sha_l])
        doclens = pa.table({
            "doc_id": pa.array(docs[order], pa.int64()),
            "dl": pa.array(np.concatenate(dls_l)[order].astype(np.int32),
                           pa.int32()),
            "sha": pa.array(shas[order].tolist(), pa.string()),
        })
    else:
        doclens = pa.table({"doc_id": pa.array([], pa.int64()),
                            "dl": pa.array([], pa.int32()),
                            "sha": pa.array([], pa.string())})
    return postings, doclens


# ---- segment IO ----

# exact segment-dir pattern: staging dirs are named
# "part-NNNNN.tmp-<pid>" and MUST never match (a SIGKILL can leave a
# staging dir containing a complete postings.parquet; a loose
# endswith(".tmp") filter would read it and double-count df/cf)
SEGMENT_DIR_RE = re.compile(r"part-(\d{5})")


def list_segment_parts(index_dir: str) -> list[int]:
    """Sorted part numbers of COMPLETE segment dirs only (exact
    part-NNNNN names; staging leftovers excluded)."""
    seg_root = os.path.join(index_dir, "segments")
    out = []
    for d in os.listdir(seg_root):
        m = SEGMENT_DIR_RE.fullmatch(d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def clean_stale_staging(index_dir: str) -> int:
    """Delete part-NNNNN.tmp-<pid> leftovers from killed builds (their
    contents may be complete OR truncated; either way they are not
    segments). Returns the number removed."""
    import shutil

    seg_root = os.path.join(index_dir, "segments")
    n = 0
    if not os.path.isdir(seg_root):
        return 0
    for d in os.listdir(seg_root):
        if SEGMENT_DIR_RE.fullmatch(d):
            continue
        if SEGMENT_DIR_RE.match(d) and ".tmp-" in d:
            shutil.rmtree(os.path.join(seg_root, d), ignore_errors=True)
            n += 1
    return n


def part_dirname(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, "segments", f"part-{part:05d}")


def write_segment_files(part_dir: str, postings: pa.Table,
                        doclens: pa.Table) -> dict:
    """Atomic write: temp dir + os.replace, so partial writes are
    invisible and a rerun's validation sees only complete segments."""
    tmp = part_dir + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(postings, os.path.join(tmp, "postings.parquet"),
                   row_group_size=1024, compression="zstd")
    pq.write_table(doclens, os.path.join(tmp, "doclens.parquet"),
                   row_group_size=65536, compression="zstd")
    if os.path.isdir(part_dir):
        import shutil
        shutil.rmtree(part_dir)
    os.replace(tmp, part_dir)
    return {
        "n_terms": postings.num_rows,
        "n_postings": int(pc.sum(postings["df"]).as_py() or 0),
        "n_docs": doclens.num_rows,
        "sum_dl": int(pc.sum(doclens["dl"]).as_py() or 0),
        "total_tf": int(pc.sum(postings["cf"]).as_py() or 0),
    }


# what a relevance scorer needs from a posting row — pass as
# read_postings(columns=...) so scoring a positional index never
# deserializes pos_enc (its widest column)
SCORER_COLUMNS = ["term", "max_tf", "docs_enc", "tfs_enc", "dls_enc"]
# the block-skip pruned path additionally reads df + the tiny block
# metadata blobs (wand.LazyPostings decodes row blobs on demand)
SCORER_COLUMNS_BMW = SCORER_COLUMNS + ["df", "bfirst_enc", "bmax_enc"]


def read_postings(part_dir: str, terms: list[str] | None = None,
                  columns: list[str] | None = None) -> pa.Table:
    """``columns`` prunes at the read — pass it on positional indexes
    whenever pos_enc isn't needed (it is the widest column)."""
    path = os.path.join(part_dir, "postings.parquet")
    if terms is None:
        return pq.read_table(path, columns=columns)
    import pyarrow.dataset as pads
    return pq.read_table(path, columns=columns,
                         filters=pads.field("term").isin(terms))


def read_doclens(part_dir: str, columns: list[str] | None = None) -> pa.Table:
    return pq.read_table(os.path.join(part_dir, "doclens.parquet"),
                         columns=columns)


def decode_posting_row(tbl: pa.Table, i: int
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    return (decode_doc_ids(tbl["docs_enc"][i].as_py()),
            decode_ints(tbl["tfs_enc"][i].as_py()),
            decode_ints(tbl["dls_enc"][i].as_py()))


def has_block_meta(part_dir: str) -> bool:
    """Whether this segment stores BMW block metadata (indexes built
    before the blockmax upgrade don't; readers fall back to eager
    whole-row decode)."""
    path = os.path.join(part_dir, "postings.parquet")
    return "bfirst_enc" in pq.read_schema(path).names


def read_block_meta(tbl: pa.Table, i: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(per-block absolute first doc, per-block max tf) for posting
    row i — decoded from the tiny bfirst_enc/bmax_enc blobs only, the
    row's posting blobs untouched."""
    return (decode_doc_ids(tbl["bfirst_enc"][i].as_py()),
            decode_ints(tbl["bmax_enc"][i].as_py()))


def decode_posting_blocks(tbl: pa.Table, i: int, df: int,
                          chosen: np.ndarray, bfirst: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(docs, tfs, dls) of ONLY the ``chosen`` blocks of posting row i
    (sorted block indices). The row blobs are byte-sliced at block
    boundaries (one high-bit scan via varint_run_byte_offsets — no
    value decode of skipped blocks); each chosen doc block rebases on
    its stored absolute first doc, so the leading cross-block delta in
    the unchanged row encoding is never needed."""
    nb = (df + BLOCK - 1) // BLOCK
    counts = np.full(nb, BLOCK, np.int64)
    counts[-1] = df - BLOCK * (nb - 1)
    if len(chosen) == nb:            # everything survives: plain decode
        return decode_posting_row(tbl, i)
    ccounts = counts[chosen]

    def blocks_of(blob: bytes) -> bytes:
        boff = varint_run_byte_offsets(blob, counts)
        return b"".join(blob[boff[j]:boff[j + 1]] for j in chosen)

    vals = decode_ints(blocks_of(tbl["docs_enc"][i].as_py()))
    cstarts = np.zeros(len(chosen), np.int64)
    np.cumsum(ccounts[:-1], out=cstarts[1:])
    s = np.cumsum(vals)
    base = s[cstarts] - bfirst[chosen]   # rebase each block's cumsum
    docs = s - np.repeat(base, ccounts)
    tfs = decode_ints(blocks_of(tbl["tfs_enc"][i].as_py()))
    dls = decode_ints(blocks_of(tbl["dls_enc"][i].as_py()))
    return docs, tfs, dls


def decode_posting_positions(tbl: pa.Table, i: int,
                             tfs: np.ndarray | None = None) -> np.ndarray:
    """Flat ABSOLUTE within-doc positions for posting row i, in doc
    order; split into per-doc runs with the row's tf array (pass it if
    already decoded to skip a second tfs_enc decode)."""
    if tfs is None:
        tfs = decode_ints(tbl["tfs_enc"][i].as_py())
    return decode_pos_runs(tbl["pos_enc"][i].as_py(), tfs)


def split_posting_positions(tbl: pa.Table, i: int,
                            tfs: np.ndarray) -> list[bytes]:
    """Per-doc ENCODED position blobs for posting row i (byte slices,
    no decode) — the unit compaction/merge shuffles around."""
    blob = tbl["pos_enc"][i].as_py()
    boff = varint_run_byte_offsets(blob, tfs)
    return [blob[boff[j]:boff[j + 1]] for j in range(len(tfs))]
