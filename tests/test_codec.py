import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raysearch.codec import (
    _py_varint_decode,
    _py_varint_encode,
    bulk_encode_segmented,
    decode_doc_ids,
    decode_ints,
    delta_decode,
    delta_encode,
    encode_posting,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63,
                     2**64 - 1], dtype=np.uint64)
    buf, nb = varint_encode(vals)
    assert varint_decode(buf).tolist() == vals.tolist()
    assert nb.tolist() == [1, 1, 1, 2, 2, 2, 3, 5, 10, 10]


def test_varint_matches_pure_python():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**62, size=5000, dtype=np.uint64)
    buf, _ = varint_encode(vals)
    assert buf == _py_varint_encode(vals)
    assert varint_decode(buf).tolist() == _py_varint_decode(buf)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf, _ = varint_encode(arr)
    assert varint_decode(buf).tolist() == vals
    assert buf == _py_varint_encode(vals)


def test_delta_roundtrip():
    v = np.array([3, 3, 10, 1000, 10**12], dtype=np.uint64)
    assert delta_decode(delta_encode(v)).tolist() == v.tolist()


def test_posting_roundtrip():
    docs = np.array([5, 17, 17 + 2**40, 17 + 2**40 + 1], dtype=np.int64)
    tfs = np.array([1, 300, 2, 9], dtype=np.int64)
    dbuf, tbuf = encode_posting(docs, tfs)
    assert decode_doc_ids(dbuf).tolist() == docs.tolist()
    assert decode_ints(tbuf).tolist() == tfs.tolist()


def test_bulk_encode_segmented_equals_per_run():
    rng = np.random.default_rng(11)
    runs = [np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.uint64)
            for n in (5, 1, 40, 3)]
    values = np.concatenate(runs)
    starts = np.cumsum([0] + [len(r) for r in runs[:-1]]).astype(np.int64)
    buf, offs = bulk_encode_segmented(values, starts, delta=True)
    assert len(offs) == len(runs) + 1
    for i, r in enumerate(runs):
        piece = buf[offs[i]:offs[i + 1]]
        assert decode_doc_ids(piece).tolist() == r.astype(np.int64).tolist()


def test_bulk_encode_no_delta():
    values = np.array([9, 1, 1, 300], dtype=np.uint64)
    starts = np.array([0, 2], dtype=np.int64)
    buf, offs = bulk_encode_segmented(values, starts, delta=False)
    assert decode_ints(buf[offs[0]:offs[1]]).tolist() == [9, 1]
    assert decode_ints(buf[offs[1]:offs[2]]).tolist() == [1, 300]


def test_empty():
    buf, nb = varint_encode(np.zeros(0, dtype=np.uint64))
    assert buf == b"" and len(nb) == 0
    assert len(varint_decode(b"")) == 0
