"""Semi-structured (JSON string) column processing over
``events.props`` — the last untouched column in the driver schema.
The shape every log/clickstream pipeline needs: extract typed fields
from a JSON payload column WITHOUT a per-row json.loads, then
aggregate.

Extraction is one vectorized Arrow regex pass per batch
(pc.extract_regex with a compiled-once RE2 pattern — the same
kernel-level contract as textops.pii_scrub); documents with no ``k``
field drop out of the aggregate exactly like SQL's NULL semantics.
Aggregation is the combiner pattern: per-(batch, type) partials with
additive count/sum and mergeable min/max, one type-cardinality
exchange. The oracle extracts with DuckDB's native JSON operator, so
the regex's JSON-number contract is pinned against a real parser.
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
        ks = m.field("k") if m.null_count < len(m) else None
        valid = pc.is_valid(m).to_numpy(zero_copy_only=False)
        if ks is None or not valid.any():
            return pd.DataFrame({"event_type": [], "n_with_k": [],
                                 "sum_k": [], "min_k": [], "max_k": []})
        k = np.zeros(len(valid), dtype=np.int64)
        k[valid] = pc.cast(pc.drop_null(ks), pa.int64()).to_numpy()
        types = np.asarray(b["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"event_type": types[valid], "k": k[valid]})
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
    return """
SELECT event_type,
       count(*)::BIGINT AS n_with_k,
       sum(CAST((props->>'k') AS BIGINT))::BIGINT AS sum_k,
       min(CAST((props->>'k') AS BIGINT))::BIGINT AS min_k,
       max(CAST((props->>'k') AS BIGINT))::BIGINT AS max_k
FROM events
WHERE json_valid(props) AND (props->>'k') IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "props_stats": props_stats,
}

ORACLE_SQL = {
    "props_stats": sql_props_stats(),
}
