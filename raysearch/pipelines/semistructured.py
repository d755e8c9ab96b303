"""Semi-structured (JSON string) column processing over
``events.props`` — the last untouched column in the driver schema.
The shape every log/clickstream pipeline needs: extract typed fields
from a JSON payload column WITHOUT a per-row json.loads, then
aggregate.

Extraction is one vectorized Arrow regex pass per batch
(pc.extract_regex with a compiled-once RE2 pattern — the same
kernel-level contract as textops.pii_scrub); rows with no ``k`` match
drop out of the aggregate exactly like SQL's NULL semantics.
Aggregation is the combiner pattern: per-(batch, type) partials with
additive count/sum and mergeable min/max, one type-cardinality
exchange.

The extraction CONTRACT is the regex itself — the first
'"k": <integer>' occurrence anywhere in the payload — and the oracle
runs the SAME RE2 pattern through DuckDB's regexp_extract, so engine
and oracle agree on EVERY input (nested objects, floats, invalid
JSON included). On the schema's actual flat single-level payloads the
regex agrees with a real JSON parser; that agreement is pinned by a
pytest comparing against json.loads, not by the driver oracle. A
true-JSON-path contract (top-level-only keys) would need a per-row
parse — the documented trade for staying vectorized.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

_EVENTS = "events.parquet"

# a JSON integer value for key "k" (optional sign; whitespace per
# JSON). pc.extract_regex requires NAMED groups.
_K_PATTERN = r'"k"\s*:\s*(?P<k>-?\d+)'


def props_stats(sf_dir: str) -> pa.Table:
    """Per-event-type aggregates of the JSON integer field props.k:
    rows with the field, sum, min, max. One narrow exchange of
    per-batch partials; the props string never shuffles."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pd.DataFrame:
        props = b["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, _K_PATTERN)
        # the child field does NOT inherit the struct's validity
        # (non-matching rows read as '' with null_count 0 — casting
        # that crashes on any batch mixing matched and unmatched
        # rows), so filter by the STRUCT validity explicitly
        valid = pc.is_valid(m).to_numpy(zero_copy_only=False)
        if not valid.any():
            return pd.DataFrame({"event_type": [], "n_with_k": [],
                                 "sum_k": [], "min_k": [], "max_k": []})
        mask = pa.array(valid)
        k = pc.cast(m.field("k").filter(mask), pa.int64()).to_numpy()
        types = np.asarray(b["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"event_type": types[valid], "k": k})
        return (df.groupby("event_type", as_index=False)
                .agg(n_with_k=("k", "size"), sum_k=("k", "sum"),
                     min_k=("k", "min"), max_k=("k", "max")))

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, _EVENTS),
        columns=["event_type", "props"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = ds.groupby("event_type").aggregate(
        Sum("n_with_k", alias_name="n_with_k"),
        Sum("sum_k", alias_name="sum_k"),
        Min("min_k", alias_name="min_k"),
        Max("max_k", alias_name="max_k"))
    df = agg.to_pandas()
    if "event_type" not in df.columns:  # no row carried the field
        df = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                           "n_with_k": [], "sum_k": [], "min_k": [],
                           "max_k": []})
    df = df.sort_values("event_type", ignore_index=True)
    return pa.table({
        "event_type": pa.array(df.event_type.tolist(), pa.string()),
        "n_with_k": pa.array(df.n_with_k.to_numpy(np.int64), pa.int64()),
        "sum_k": pa.array(df.sum_k.to_numpy(np.int64), pa.int64()),
        "min_k": pa.array(df.min_k.to_numpy(np.int64), pa.int64()),
        "max_k": pa.array(df.max_k.to_numpy(np.int64), pa.int64()),
    })


def sql_props_stats() -> str:
    # literally the engine's RE2 pattern (DuckDB regexp_extract is
    # also RE2) with the named group anonymized — ONE source, so the
    # contract holds on every input (nested keys, floats, invalid
    # JSON) and cannot drift. regexp_extract returns '' on no match.
    pat = _K_PATTERN.replace("(?P<k>", "(")
    return rf"""
WITH x AS (
  SELECT event_type,
         regexp_extract(props, '{pat}', 1) AS ks
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n_with_k,
       sum(CAST(ks AS BIGINT))::BIGINT AS sum_k,
       min(CAST(ks AS BIGINT))::BIGINT AS min_k,
       max(CAST(ks AS BIGINT))::BIGINT AS max_k
FROM x WHERE ks <> ''
GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "props_stats": props_stats,
}

ORACLE_SQL = {
    "props_stats": sql_props_stats(),
}
