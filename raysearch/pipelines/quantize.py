"""Embedding compression: per-dimension affine int8 quantization of
the embedding table — the standard vector-store space/bandwidth lever
(4x smaller than float32; at 100 TB the codes, not the floats, are
what ships through the object store and lands in the ANN index).

Contract (bit-exact on engine and oracle): per dimension d,
mn_d = min(x_d), s_d = (max_d - mn_d)/255 (1.0 when the dimension is
constant); code = clip(round_half_away((x - mn_d)/s_d), 0, 255);
reconstruction x' = mn_d + code*s_d. Per vector the operator reports
the code checksum (sum of codes — the value-hash covers every code
without emitting dim columns) and round6(max |x - x'|), the max
reconstruction error. All float steps (float32→float64 read, the
subtract/divide, half-away rounding, mn + code*s) are performed
identically in numpy and SQL, so the comparison is exact.

Scale shape: pass 1 is a combiner — per-batch elementwise min/max
partials are dim-sized rows, reduced exactly on the driver
(elementwise min/max is order-independent) and broadcast once; pass
2 is map-only. Nothing wide anywhere; the per-vector result streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysearch.numutil import round6
from raysearch.pipelines.joins import _half_away
from raysearch.pipelines.similarity import _emb_matrix, _read_emb


def emb_quantize(sf_dir: str) -> pa.Table:
    """(vec_id, code_sum, max_abs_err): per-vector int8 quantization
    checksum and max reconstruction error under the per-dim affine
    contract in the module docstring."""
    import ray

    def read():
        return _read_emb(sf_dir)

    def mm_partial(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        if mat.shape[0] == 0:   # empty shard/block: no min identity
            return pa.table({"d": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "d": pa.array(np.arange(mat.shape[1], dtype=np.int64)),
            "mn": pa.array(mat.min(axis=0), pa.float64()),
            "mx": pa.array(mat.max(axis=0), pa.float64()),
        })

    parts = [b for b in read().map_batches(
        mm_partial, batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_format="pyarrow")]
    if not parts or sum(p.num_rows for p in parts) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "code_sum": pa.array([], pa.int64()),
                         "max_abs_err": pa.array([], pa.float64())})
    mm = pa.concat_tables(parts).to_pandas()
    g = mm.groupby("d")
    mn = g["mn"].min().sort_index().to_numpy()
    mx = g["mx"].max().sort_index().to_numpy()
    s = np.where(mx > mn, (mx - mn) / 255.0, 1.0)
    ref = ray.put((mn, s))

    def quant(batch: pa.Table) -> pa.Table:
        mn_b, s_b = ray.get(ref)  # zero-copy numpy views
        ids, mat = _emb_matrix(batch)
        if mat.shape[0] == 0:   # empty block: shape (0, 0) would not
            return pa.table({   # broadcast against the dim arrays
                "vec_id": pa.array([], pa.int64()),
                "code_sum": pa.array([], pa.int64()),
                "max_abs_err": pa.array([], pa.float64())})
        code = np.clip(_half_away((mat - mn_b) / s_b), 0, 255)
        err = np.abs(mat - (mn_b + code * s_b)).max(axis=1)
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
            "code_sum": pa.array(code.sum(axis=1).astype(np.int64),
                                 pa.int64()),
            "max_abs_err": pa.array(round6(err), pa.float64()),
        })

    out = read().map_batches(quant, batch_format="pyarrow",
                             zero_copy_batch=True)
    df = (pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
          .to_pandas().sort_values("vec_id", ignore_index=True))
    return pa.table({
        "vec_id": pa.array(df.vec_id.to_numpy(np.int64), pa.int64()),
        "code_sum": pa.array(df.code_sum.to_numpy(np.int64),
                             pa.int64()),
        "max_abs_err": pa.array(df.max_abs_err.to_numpy(np.float64),
                                pa.float64()),
    })


def sql_emb_quantize() -> str:
    return """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
u AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS d
  FROM e
),
mm AS (SELECT d, min(x) AS mn, max(x) AS mx FROM u GROUP BY d),
q AS (
  SELECT vec_id, x, mn,
         CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS s
  FROM u JOIN mm USING (d)
),
c AS (
  SELECT vec_id, x, mn, s,
         least(greatest(round((x - mn) / s, 0), 0), 255) AS code
  FROM q
)
SELECT vec_id,
       sum(code)::BIGINT AS code_sum,
       round(max(abs(x - (mn + code * s))), 6) AS max_abs_err
FROM c GROUP BY vec_id ORDER BY vec_id
"""


QUERIES = {
    "emb_quantize": emb_quantize,
}

ORACLE_SQL = {
    "emb_quantize": sql_emb_quantize(),
}
