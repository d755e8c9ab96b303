"""Exact distributed bivariate statistics: the Pearson correlation of
lineitem quantity and line price per return flag — the classic
one-pass sufficient-moment computation (n, Σx, Σy, Σxx, Σyy, Σxy)
expressed as a combiner pipeline.

Exactness contract, OVERFLOW-PROOF AT ANY SCALE: both variables are
integers (quantity rounds to int64 like every money op; price in
cents), so per-batch moment partials are exact int64 sums — and the
batch size is derived from the parquet FOOTER max statistics so a
batch's Σy² provably fits int64 (batch_rows·max_cents² < 2^62; the
naive whole-dataset int64 Sum sits at 80% of int64 at sf0.1 already
and would wrap silently at ~2.5x that). Cross-batch reduction then
runs in PYTHON ARBITRARY-PRECISION ints on the driver over the
(n_batches × flags)-row partial table — exact at any corpus size;
the driver holds one 6-int row per (batch, flag), documented and
bounded by the batch-size floor. The only floats are the final
r = (nΣxy − ΣxΣy) / sqrt((nΣxx − Σx²)(nΣyy − Σy²)) computed from
those scalars identically on engine (Python ints → float) and
oracle (HUGEINT → DOUBLE): int→double conversion, IEEE
sqrt/division, and round6 agree on both sides. Zero variance on
either axis defines r = 0.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.numutil import round6
from raysearch.pipelines.joins import _cents, _half_away, _read

_BATCH_FLOOR = 1024            # below this, raise instead of crawling


def _col_max(sf_dir: str, table: str, col: str) -> float:
    """Column max straight from parquet footer row-group statistics —
    file OR directory of shards; no data pages are read."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, table)
    files = ([os.path.join(path, f) for f in os.listdir(path)
              if f.endswith(".parquet")] if os.path.isdir(path)
             else [path])
    mx = None
    for f in files:
        md = pq.read_metadata(f)
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                c = rg.column(i)
                if c.path_in_schema == col and c.statistics is not None:
                    v = c.statistics.max
                    mx = v if mx is None else max(mx, v)
    if mx is None:
        raise ValueError(f"no footer statistics for {table}.{col}")
    return float(mx)


def qty_price_corr(sf_dir: str) -> pa.Table:
    """Per l_returnflag: row count, exact Σqty / Σcents, and the
    Pearson correlation of (quantity, extended price) — the standard
    profiling probe for 'does order size track line value'."""
    max_cents = int(_half_away(np.array(
        [_col_max(sf_dir, "lineitem.parquet", "l_extendedprice")]
    ) * 100.0)[0])
    max_prod = max(max_cents * max_cents, 1)
    safe_batch = (1 << 62) // max_prod
    if safe_batch < _BATCH_FLOOR:
        raise ValueError(
            f"max |cents| {max_cents} forces batches under "
            f"{_BATCH_FLOOR} rows; rescale the value column or shard "
            "the moment sums")
    safe_batch = min(safe_batch, 65536)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = _half_away(df["l_quantity"].to_numpy(np.float64))
        c = _cents(df["l_extendedprice"].to_numpy(np.float64))
        g = pd.DataFrame({"flag": df["l_returnflag"].to_numpy(),
                          "n": np.int64(1), "sx": q, "sy": c,
                          "sxx": q * q, "syy": c * c, "sxy": q * c})
        return g.groupby("flag", as_index=False).sum()

    parts = (_read(sf_dir, "lineitem.parquet",
                   columns=["l_returnflag", "l_quantity",
                            "l_extendedprice"])
             .map_batches(partial, batch_format="pandas",
                          batch_size=int(safe_batch)))
    # cross-batch reduce in Python ints: exact at any scale (int64
    # would wrap); one 6-int row per (batch, flag) reaches the driver
    acc: dict[str, list[int]] = {}
    for b in parts.iter_batches(batch_format="pandas"):
        for row in b.itertuples(index=False):
            a = acc.setdefault(row.flag, [0] * 6)
            a[0] += int(row.n)
            a[1] += int(row.sx)
            a[2] += int(row.sy)
            a[3] += int(row.sxx)
            a[4] += int(row.syy)
            a[5] += int(row.sxy)
    if not acc:
        return pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "sum_qty": pa.array([], pa.int64()),
            "sum_cents": pa.array([], pa.int64()),
            "corr_qty_price": pa.array([], pa.float64())})
    flags = sorted(acc)
    rs, ns, sxs, sys_ = [], [], [], []
    for f in flags:
        n, sx, sy, sxx, syy, sxy = acc[f]
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        r = (float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
             if d1 > 0 and d2 > 0 else 0.0)
        rs.append(round6(r))
        ns.append(n)
        sxs.append(sx)
        sys_.append(sy)
    return pa.table({
        "l_returnflag": pa.array(flags, pa.string()),
        "n_rows": pa.array(ns, pa.int64()),
        "sum_qty": pa.array(sxs, pa.int64()),
        "sum_cents": pa.array(sys_, pa.int64()),
        "corr_qty_price": pa.array(rs, pa.float64()),
    })


def sql_qty_price_corr() -> str:
    return """
WITH m AS (
  SELECT l_returnflag,
         count(*)::HUGEINT AS n,
         sum(CAST(round(l_quantity, 0) AS BIGINT))::HUGEINT AS sx,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))::HUGEINT
           AS sy,
         sum((CAST(round(l_quantity, 0) AS BIGINT))::HUGEINT
             * (CAST(round(l_quantity, 0) AS BIGINT))::HUGEINT)
           AS sxx,
         sum((CAST(round(l_extendedprice * 100, 0) AS BIGINT))::HUGEINT
             * (CAST(round(l_extendedprice * 100, 0) AS BIGINT
                     ))::HUGEINT) AS syy,
         sum((CAST(round(l_quantity, 0) AS BIGINT))::HUGEINT
             * (CAST(round(l_extendedprice * 100, 0) AS BIGINT
                     ))::HUGEINT) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n::BIGINT AS n_rows,
       sx::BIGINT AS sum_qty,
       sy::BIGINT AS sum_cents,
       round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             THEN (n * sxy - sx * sy)::DOUBLE
                  / (sqrt((n * sxx - sx * sx)::DOUBLE)
                     * sqrt((n * syy - sy * sy)::DOUBLE))
             ELSE 0 END, 6) AS corr_qty_price
FROM m ORDER BY l_returnflag
"""


QUERIES = {
    "qty_price_corr": qty_price_corr,
}

ORACLE_SQL = {
    "qty_price_corr": sql_qty_price_corr(),
}
