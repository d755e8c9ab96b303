"""Content-defined chunking properties: chunks reassemble exactly,
boundaries are deterministic, and — the point of CDC — a prefix
insertion leaves the suffix chunking untouched (byte-offset chunking
cannot do this)."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raysearch.pipelines import chunking as C

# non-repetitive text: seeded random words, so chunk shas are distinct
# (a repeated sentence dedups to ~3 distinct chunks, hiding the
# shift-invariance signal)
_rng = np.random.default_rng(99)
BASE = " ".join(
    "".join(_rng.choice(list("abcdefghijklmnop"), size=6))
    for _ in range(300))


def _write_docs(path, texts):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(path, "documents.parquet"))


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdc"))
    _write_docs(d, [BASE, "tiny", "", "PREFIX-INSERTED-HERE " + BASE])
    return d


def test_chunks_reassemble(ray_session, docs_dir):
    tbl = C.doc_chunks(docs_dir).to_pandas()
    texts = {0: BASE, 1: "tiny", 3: "PREFIX-INSERTED-HERE " + BASE}
    for did, text in texts.items():
        sub = tbl[tbl.doc_id == did].sort_values("chunk_idx")
        assert sub.n_bytes.sum() == len(text.encode())
        # verify each chunk sha against a driver-side re-chunk walk
        raw = text.encode()
        off = 0
        for _, row in sub.iterrows():
            piece = raw[off:off + row.n_bytes]
            assert hashlib.sha256(piece).hexdigest()[:16] == row.chunk_sha
            off += row.n_bytes
    assert 2 not in set(tbl.doc_id)  # empty doc produces no chunks


def test_shift_invariance(ray_session, docs_dir):
    """CDC property: inserting a prefix changes only the leading
    chunk(s); most suffix chunk hashes are shared."""
    tbl = C.doc_chunks(docs_dir).to_pandas()
    a = set(tbl[tbl.doc_id == 0].chunk_sha)   # BASE
    b = set(tbl[tbl.doc_id == 3].chunk_sha)   # PREFIX + BASE
    assert len(a) >= 5
    shared = len(a & b) / len(a)
    assert shared >= 0.7, (len(a), len(a & b))


def test_deterministic(ray_session, docs_dir):
    t1 = C.doc_chunks(docs_dir).to_pandas().sort_values(
        ["doc_id", "chunk_idx"], ignore_index=True)
    t2 = C.doc_chunks(docs_dir).to_pandas().sort_values(
        ["doc_id", "chunk_idx"], ignore_index=True)
    assert t1.equals(t2)


def test_dedup_stats(ray_session, docs_dir):
    st = C.chunk_dedup_stats(docs_dir).to_pandas().iloc[0]
    assert st.total_chunks >= st.distinct_chunks > 0
    assert st.total_bytes >= st.distinct_bytes > 0
    # doc 0 repeats one sentence 40x AND doc 3 shares doc 0's suffix:
    # distinct bytes must be well below total
    assert st.distinct_bytes < 0.8 * st.total_bytes


def test_batch_composition_independence(ray_session, docs_dir):
    """Chunk boundaries must depend only on each document's own bytes,
    never on batch neighbors: chunking with batch_size=1 equals the
    default batching (guarded by the MIN_CHUNK >= WINDOW invariant)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(docs_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    one = pa.concat_tables(
        ds.map_batches(C._chunk_batch, batch_format="pyarrow",
                       batch_size=1)
        .iter_batches(batch_format="pyarrow")).to_pandas()
    full = C.doc_chunks(docs_dir).to_pandas()
    key = ["doc_id", "chunk_idx"]
    assert one.sort_values(key, ignore_index=True).equals(
        full.sort_values(key, ignore_index=True))
