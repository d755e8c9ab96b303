"""Multimodal plumbing: the binary-payload actor stage is real (schema,
batching, actor signature, output layout); only the codec kernel is
stubbed (deterministic fake / strict NotImplementedError seam)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from raysearch.pipelines.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    MediaDecoder,
    decode_media,
)


def _media_table(n=10):
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(["image"] * n, pa.string()),
        "payload": pa.array([f"payload-{i}".encode() * (i + 1)
                             for i in range(n)], pa.large_binary()),
    }).cast(MEDIA_SCHEMA)


def test_strict_mode_raises():
    dec = MediaDecoder(strict=True)
    with pytest.raises(NotImplementedError):
        dec.decode(b"bytes", "image")


def test_fake_decode_deterministic():
    dec = MediaDecoder()
    f1 = dec.decode(b"abc", "image")
    f2 = dec.decode(b"abc", "audio")
    assert f1.shape == (FEATURE_DIM,) and f1.dtype == np.float32
    assert np.array_equal(f1, f2)
    assert not np.array_equal(f1, dec.decode(b"abd", "image"))
    assert (f1 >= 0).all() and (f1 < 1).all()


def test_stage_output_layout():
    dec = MediaDecoder()
    out = dec(_media_table())
    assert out.column_names == ["media_id", "media_type", "n_bytes",
                                "sha256", "features"]
    pay = _media_table()["payload"].to_pylist()
    assert out["n_bytes"].to_pylist() == [len(p) for p in pay]
    assert out["sha256"].to_pylist() == [
        hashlib.sha256(p).hexdigest() for p in pay]
    feats = out["features"].to_pylist()
    assert all(len(f) == FEATURE_DIM for f in feats)


def test_distributed_stage(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_media_table(100))
    out = decode_media(ds, concurrency=2, batch_size=16)
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert tbl.num_rows == 100
    assert sorted(tbl["media_id"].to_pylist()) == list(range(100))
