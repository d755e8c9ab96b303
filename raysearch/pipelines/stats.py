"""Exact distributed bivariate statistics: the Pearson correlation of
lineitem quantity and line price per return flag — the classic
one-pass sufficient-moment computation (n, Σx, Σy, Σxx, Σyy, Σxy)
expressed as a combiner pipeline.

Exactness contract: both variables are integers (quantity rounds to
int64 like every money op; price in cents), so the six sufficient
moments are EXACT int64 sums — additive, order-independent, and
bit-reproducible under any reduce schedule. The only floats are the
final r = (nΣxy − ΣxΣy) / sqrt((nΣxx − Σx²)(nΣyy − Σy²)) computed
from those scalars identically on engine (Python arbitrary-precision
ints → float) and oracle (HUGEINT → DOUBLE): int→double conversion,
IEEE sqrt/division, and round6 agree on both sides. Zero variance on
either axis defines r = 0.

Scale shape: per-batch partials collapse to flag-cardinality rows
map-side; ONE tiny groupby reduces them; driver math is O(flags).
Range bound (documented, asserted): Σxy per row ≤ qty·cents ≈ 5e8,
so int64 partials hold to ~1.8e10 rows; beyond that shard the sum
(per-range partials like pack_offsets' buckets) or center on a first
pass. The cross terms n·Σxy etc. exceed int64 at far smaller scales —
they are computed in Python ints (arbitrary precision) and HUGEINT,
never in the exchanged columns.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.numutil import round6
from raysearch.pipelines.joins import _cents, _half_away, _read

# int64 safety bound for the exchanged Σxy partials (see docstring)
_CORR_MAX_ROWS = 18_000_000_000


def qty_price_corr(sf_dir: str) -> pa.Table:
    """Per l_returnflag: row count, exact Σqty / Σcents, and the
    Pearson correlation of (quantity, extended price) — the standard
    profiling probe for 'does order size track line value'."""
    from ray.data.aggregate import Sum

    from raysearch.pipelines.joins import _n_rows

    n_li = _n_rows(sf_dir, "lineitem.parquet")
    if n_li > _CORR_MAX_ROWS:
        raise ValueError(
            f"lineitem ({n_li} rows) exceeds the int64 moment bound; "
            "shard the Σxy sum per doc_id range (pack_offsets' bucket "
            "pattern) or center on a first pass")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = _half_away(df["l_quantity"].to_numpy(np.float64))
        c = _cents(df["l_extendedprice"].to_numpy(np.float64))
        g = pd.DataFrame({"flag": df["l_returnflag"].to_numpy(),
                          "n": np.int64(1), "sx": q, "sy": c,
                          "sxx": q * q, "syy": c * c, "sxy": q * c})
        return g.groupby("flag", as_index=False).sum()

    agg = (_read(sf_dir, "lineitem.parquet",
                 columns=["l_returnflag", "l_quantity",
                          "l_extendedprice"])
           .map_batches(partial, batch_format="pandas")
           .groupby("flag").aggregate(
               Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
               Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
               Sum("syy", alias_name="syy"),
               Sum("sxy", alias_name="sxy")))
    df = agg.to_pandas()
    if "flag" not in df.columns or not len(df):
        return pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "sum_qty": pa.array([], pa.int64()),
            "sum_cents": pa.array([], pa.int64()),
            "corr_qty_price": pa.array([], pa.float64())})
    df = df.sort_values("flag", ignore_index=True)
    rs = []
    for _, row in df.iterrows():
        # Python ints: the cross terms overflow int64 long before the
        # exchanged partials do
        n, sx, sy = int(row.n), int(row.sx), int(row.sy)
        sxx, syy, sxy = int(row.sxx), int(row.syy), int(row.sxy)
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        r = (float(num) / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
             if d1 > 0 and d2 > 0 else 0.0)
        rs.append(round6(r))
    return pa.table({
        "l_returnflag": pa.array(df.flag.tolist(), pa.string()),
        "n_rows": pa.array(df.n.to_numpy(np.int64), pa.int64()),
        "sum_qty": pa.array(df.sx.to_numpy(np.int64), pa.int64()),
        "sum_cents": pa.array(df.sy.to_numpy(np.int64), pa.int64()),
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
         sum(CAST(round(l_quantity, 0) AS BIGINT)
             * CAST(round(l_quantity, 0) AS BIGINT))::HUGEINT AS sxx,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             )::HUGEINT AS syy,
         sum(CAST(round(l_quantity, 0) AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             )::HUGEINT AS sxy
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
