"""Second relational wave: the remaining TPC-H query shapes the
star-schema tables can express — returned-item customer ranking
(Q10 shape: fact-fact join grouped by a BROADCAST-resolved dimension
key with a k-bounded global top-k), nation-pair trade volume
(Q7 shape: one fact pass resolving TWO broadcast dimensions whose
product keys the final nation^2-cardinality aggregate), and
small-quantity-order revenue (Q17 shape: the correlated aggregate —
a per-part average computed in one combiner pass feeds an integer
threshold on a second pass over the same fact table).

The reference engine has no relational layer (its only wide op is the
index HashMap, src/lib.rs:341); these follow relational.py's budget
rules exactly:

- Dimension maps (customer/supplier key -> nationkey, the brand's
  partkeys, the per-part averages) broadcast once via ray.put as
  sorted numpy arrays under JOIN_BROADCAST_CAP with a hard raise
  above it naming the bucketed-shuffle alternative.
- Fact sides meet in ONE orderkey-bucketed exchange after map-side
  pre-aggregation — the exchange carries per-key partials, never raw
  fact rows; a single orderkey's lines always fit one reduce group.
- Money is exact int64 c4 (cents x (100 - discount)) end-to-end; the
  Q17 quantity threshold is the integer cross-multiplication
  5 * qty * n < sum_qty (qty < 0.2 * avg), so no float division
  exists anywhere a value-hash could see.
- Global top-k is k-bounded everywhere: per-bucket kernels and
  per-block partials emit at most k rows under the total order
  (revenue DESC, key ASC), and the driver merges n_blocks x k rows.
- Date/flag predicates push into the parquet reads.
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.pipelines.joins import (
    JOIN_BROADCAST_CAP,
    _cents,
    _epoch_us,
    _half_away,
    _n_rows,
    _read,
    _sorted_hits,
)
from raysearch.numutil import fmt_doc
from raysearch.pipelines.relational import (
    _broadcast_dim,
    _lookup,
)

# ---- Q10 shape: returned-item customer ranking ----

Q10_D1 = datetime.datetime(1996, 1, 1)
Q10_D2 = datetime.datetime(1996, 4, 1)
Q10_FLAG = "R"
Q10_K = 20

# ---- Q7 shape: nation-pair trade volume ----

Q7_D1 = datetime.datetime(1996, 1, 1)
Q7_D2 = datetime.datetime(1997, 1, 1)

# ---- Q17 shape: small-quantity-order revenue ----

Q17_BRAND = "Brand#4"
Q17_YEARS = 7.0


def _nation_names(sf_dir: str) -> dict[int, str]:
    """nationkey -> name (nation is O(25) rows — driver-side)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    return dict(zip(
        nation["n_nationkey"].to_numpy().astype(np.int64).tolist(),
        nation["n_name"].to_pylist()))


def _nation_dim(sf_dir: str, table: str, key_col: str, nat_col: str,
                names: dict[int, str]):
    """Broadcast (key -> nationkey) restricted to nationkeys that
    EXIST in the nation table — the oracles' inner JOIN nation
    semantics. An FK-violating nationkey must drop its row before any
    top-k/aggregate, never crash the driver-side name attach."""
    return _broadcast_dim(
        sf_dir, table, key_col, nat_col,
        filters=[(nat_col, "in", [int(k) for k in names])])


@fmt_doc(k=Q10_K, fl=Q10_FLAG, d1=Q10_D1, d2=Q10_D2)
def returned_item_customers(sf_dir: str) -> pa.Table:
    """TPC-H-Q10-shaped returned-item report: the {k} customers who
    lost the most revenue to returns (l_returnflag = '{fl}') on orders
    placed in {d1:%Y-%m}..{d2:%Y-%m} — revenue in exact int64 c4.

    Shape: the returnflag AND the order window push into the parquet
    reads. customer (custkey -> nationkey) broadcasts once, so the
    membership/nation lookup happens BEFORE top-k selection on both
    engine and oracle (a dangling o_custkey can never occupy a top-k
    slot). Orders emit (okey, custkey) rows; lineitem collapses
    map-side to per-okey c4 partials; ONE orderkey-bucketed exchange
    joins them and emits per-custkey partials; a coarse
    custkey-bucket kernel fuses the exact final sums with the local
    top-{k} under (revenue DESC, custkey ASC), bounding the driver
    merge at n_buckets x {k} rows. Only the {k} winners' names
    and balances are fetched, via a key-filtered customer read."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from raysearch.hashing import auto_buckets

    names = _nation_names(sf_dir)
    cust_ref = _nation_dim(sf_dir, "customer.parquet",
                           "c_custkey", "c_nationkey", names)
    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        ck = df["o_custkey"].to_numpy(np.int64)
        # membership only: a dangling o_custkey OR an FK-violating
        # c_nationkey must never occupy a top-k slot (the oracle's
        # JOIN customer JOIN nation drops both before LIMIT); the
        # winners' nationkeys re-derive from the same broadcast map
        hit, _ = _lookup(ck, cust_ref)
        ok, ck = ok[hit], ck[hit]
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok, "custkey": ck,
            "side": np.int64(0), "nl": np.int64(0),
            "c4": np.int64(0)})

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        g = (pd.DataFrame({
                "okey": df["l_orderkey"].to_numpy(np.int64),
                "c4": cents * (100 - disc)})
             .groupby("okey", as_index=False)
             .agg(nl=("c4", "size"), c4=("c4", "sum")))
        g["nl"] = g["nl"].astype(np.int64)
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        custkey=np.int64(0), side=np.int64(1))[
            ["bucket", "okey", "custkey", "side", "nl", "c4"]]

    def join_kern(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g.side == 0][["okey", "custkey"]]
        li = (g[g.side == 1].groupby("okey", as_index=False)
              .agg(nl=("nl", "sum"), c4=("c4", "sum")))
        j = o.merge(li, on="okey", how="inner")
        out = (j.groupby("custkey", as_index=False)
               .agg(nl=("nl", "sum"), c4=("c4", "sum")))
        out["cbucket"] = out.custkey.to_numpy(np.int64) & (nb - 1)
        return out

    # per-custkey totals + local top-k fused in ONE coarse-bucket
    # kernel (cbucket partitions custkeys, so in-group sums are
    # final) — NOT groupby(custkey).aggregate(Sum): Ray's
    # sort-aggregate pays per-group dispatch on high-cardinality keys
    # (measured ~7k rows/s; see dedup._cross_doc_slot_dup)
    def sum_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = (g.groupby("custkey", as_index=False)
               .agg(n_lines=("nl", "sum"), revenue_c4=("c4", "sum")))
        # k-bounded partial under the FULL total order (revenue DESC,
        # custkey ASC) — exact int64 revenue, so ties at the k
        # boundary resolve identically everywhere
        return tot.sort_values(["revenue_c4", "custkey"],
                               ascending=[False, True]).head(Q10_K)

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pads.field("o_orderdate") >= Q10_D1)
                           & (pads.field("o_orderdate") < Q10_D2))
                   ).map_batches(o_rows, batch_format="pandas")
    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_extendedprice", "l_discount"],
               filter=pads.field("l_returnflag") == Q10_FLAG
               ).map_batches(l_partial, batch_format="pandas")
    parts = (orders.union(li)
             .groupby("bucket").map_groups(join_kern,
                                           batch_format="pandas")
             .groupby("cbucket").map_groups(sum_topk,
                                            batch_format="pandas"))
    df = parts.to_pandas()
    if "custkey" not in df.columns or not len(df):
        return pa.table({
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "n_name": pa.array([], pa.string()),
            "bal_cents": pa.array([], pa.int64()),
            "n_lines": pa.array([], pa.int64()),
            "revenue_c4": pa.array([], pa.int64())})
    df = (df.sort_values(["revenue_c4", "custkey"],
                         ascending=[False, True], ignore_index=True)
          .head(Q10_K))
    hit, nat = _lookup(df.custkey.to_numpy(np.int64), cust_ref)
    assert hit.all()  # membership was resolved before top-k
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal"],
        filters=[("c_custkey", "in",
                  [int(k) for k in df.custkey])]).to_pandas()
    j = df.merge(cust, left_on="custkey", right_on="c_custkey")
    j["n_name"] = [names[int(n)] for n in nat]
    j = j.sort_values(["revenue_c4", "custkey"],
                      ascending=[False, True], ignore_index=True)
    return pa.table({
        "c_custkey": pa.array(j.custkey.to_numpy(np.int64), pa.int64()),
        "c_name": pa.array(j.c_name.tolist(), pa.string()),
        "n_name": pa.array(j.n_name.tolist(), pa.string()),
        "bal_cents": pa.array(
            _cents(j.c_acctbal.to_numpy(np.float64)), pa.int64()),
        "n_lines": pa.array(j.n_lines.to_numpy(np.int64), pa.int64()),
        "revenue_c4": pa.array(j.revenue_c4.to_numpy(np.int64),
                               pa.int64()),
    })


def sql_returned_item_customers() -> str:
    return f"""
WITH rev AS (
  SELECT o_custkey,
         count(*)::BIGINT AS n_lines,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
             )::BIGINT AS revenue_c4
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = '{Q10_FLAG}'
    AND o_orderdate >= TIMESTAMP '{Q10_D1:%Y-%m-%d}'
    AND o_orderdate < TIMESTAMP '{Q10_D2:%Y-%m-%d}'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name,
       CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
       n_lines, revenue_c4
FROM rev
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue_c4 DESC, c_custkey
LIMIT {Q10_K}
"""


@fmt_doc(d1=Q7_D1, d2=Q7_D2)
def nation_trade_volume(sf_dir: str) -> pa.Table:
    """TPC-H-Q7-shaped trade volume: c4 revenue shipped in
    {d1:%Y}..{d2:%Y} between every (supplier nation, customer nation)
    pair with DIFFERENT nations — the two-dimension fact resolution.

    Shape: customer and supplier nation maps broadcast once; orders
    emit (okey, cust_nation) rows (no date filter — the window is on
    shipdate); lineitem, window-filtered AT THE READ, resolves the
    supplier nation locally and collapses map-side to per-
    (okey, supp_nation) c4 partials. ONE orderkey-bucketed exchange
    joins them, drops same-nation pairs, and emits per-pair partials;
    the final exchange is nation^2-cardinality. Names attach
    driver-side (nation is O(25) rows)."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets

    names = _nation_names(sf_dir)
    # nation-FK-filtered broadcasts: an FK-violating nationkey drops
    # its row exactly like the oracle's JOIN nation, instead of
    # minting a NaN name at the driver-side attach
    cust_ref = _nation_dim(sf_dir, "customer.parquet",
                           "c_custkey", "c_nationkey", names)
    supp_ref = _nation_dim(sf_dir, "supplier.parquet",
                           "s_suppkey", "s_nationkey", names)
    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        hit, cnat = _lookup(df["o_custkey"].to_numpy(np.int64),
                            cust_ref)
        ok = ok[hit]
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok, "snat": np.int64(-1),
            "cnat": cnat, "side": np.int64(0), "nl": np.int64(0),
            "c4": np.int64(0)})

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        hit, snat = _lookup(df["l_suppkey"].to_numpy(np.int64),
                            supp_ref)
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        c4 = (cents * (100 - disc))[hit]
        g = (pd.DataFrame({"okey": ok[hit], "snat": snat, "c4": c4})
             .groupby(["okey", "snat"], as_index=False)
             .agg(nl=("c4", "size"), c4=("c4", "sum")))
        g["nl"] = g["nl"].astype(np.int64)
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        cnat=np.int64(-1), side=np.int64(1))[
            ["bucket", "okey", "snat", "cnat", "side", "nl", "c4"]]

    def join_kern(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g.side == 0][["okey", "cnat"]]
        li = (g[g.side == 1]
              .groupby(["okey", "snat"], as_index=False)
              .agg(nl=("nl", "sum"), c4=("c4", "sum")))
        j = o.merge(li, on="okey", how="inner")
        j = j[j.snat != j.cnat]
        return (j.groupby(["snat", "cnat"], as_index=False)
                .agg(nl=("nl", "sum"), c4=("c4", "sum")))

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_custkey"]
                   ).map_batches(o_rows, batch_format="pandas")
    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"],
               filter=((pads.field("l_shipdate") >= Q7_D1)
                       & (pads.field("l_shipdate") < Q7_D2))
               ).map_batches(l_partial, batch_format="pandas")
    agg = (orders.union(li)
           .groupby("bucket").map_groups(join_kern,
                                         batch_format="pandas")
           .groupby(["snat", "cnat"]).aggregate(
               Sum("nl", alias_name="n_lines"),
               Sum("c4", alias_name="revenue_c4")))
    df = agg.to_pandas()
    if "snat" not in df.columns or not len(df):
        return pa.table({
            "supp_nation": pa.array([], pa.string()),
            "cust_nation": pa.array([], pa.string()),
            "n_lines": pa.array([], pa.int64()),
            "revenue_c4": pa.array([], pa.int64())})
    df["supp_nation"] = df.snat.map(names)
    df["cust_nation"] = df.cnat.map(names)
    df = df.sort_values(["supp_nation", "cust_nation"],
                        ignore_index=True)
    return pa.table({
        "supp_nation": pa.array(df.supp_nation.tolist(), pa.string()),
        "cust_nation": pa.array(df.cust_nation.tolist(), pa.string()),
        "n_lines": pa.array(df.n_lines.to_numpy(np.int64), pa.int64()),
        "revenue_c4": pa.array(df.revenue_c4.to_numpy(np.int64),
                               pa.int64()),
    })


def sql_nation_trade_volume() -> str:
    return f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       count(*)::BIGINT AS n_lines,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
           )::BIGINT AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_D1:%Y-%m-%d}'
  AND l_shipdate < TIMESTAMP '{Q7_D2:%Y-%m-%d}'
  AND s_nationkey <> c_nationkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


@fmt_doc(brand=Q17_BRAND, yrs=Q17_YEARS)
def small_qty_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q17-shaped small-quantity-order revenue: over '{brand}'
    parts, the lines whose quantity is below 20% of that part's
    average quantity — the correlated aggregate. Reports the line
    count, the exact cents sum, and avg_yearly = round6(cents / 100 /
    {yrs}) (the only float, computed identically on both sides).

    Shape: the brand's partkeys come from a filtered dimension read
    (hard-raise above JOIN_BROADCAST_CAP) and broadcast sorted. Pass 1
    collapses lineitem map-side to per-partkey (n, sum_qty) partials —
    the groupby is brand-part-cardinality (a dimension), and its
    result broadcasts back as three sorted arrays. Pass 2 re-reads
    the same 2 columns and keeps rows under the INTEGER threshold
    5 * qty * n < sum_qty (exactly qty < 0.2 * avg, no float
    division); per-batch single-row partials reduce through Ray's
    aggregate — no wide exchange in either pass."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from raysearch.numutil import round6

    # shared filtered-partkey broadcast (ONE place for the cap rule)
    pk_ref = _partkeys_ref(sf_dir,
                           filters=[("p_brand", "==", Q17_BRAND)])
    pk = ray.get(pk_ref)  # zero-copy view of the local put

    from raysearch.hashing import auto_buckets

    nbp = auto_buckets(len(pk))

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_partkey"].to_numpy(np.int64)
        hit, _ = _sorted_hits(ray.get(pk_ref), k)
        q = _half_away(df["l_quantity"].to_numpy(np.float64))[hit]
        g = (pd.DataFrame({"partkey": k[hit], "q": q})
             .groupby("partkey", as_index=False)
             .agg(n=("q", "size"), sq=("q", "sum")))
        g["n"] = g["n"].astype(np.int64)
        g["pbucket"] = g.partkey.to_numpy(np.int64) & (nbp - 1)
        return g

    # per-part totals via a coarse part-bucket kernel (buckets
    # partition partkeys, so in-group sums are final) — not a
    # high-cardinality Ray sort-aggregate (per-group dispatch cost;
    # see dedup._cross_doc_slot_dup)
    def part_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("partkey", as_index=False).agg(
            n=("n", "sum"), sq=("sq", "sum"))

    cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    avg = (_read(sf_dir, "lineitem.parquet", columns=cols[:2])
           .map_batches(qty_partial, batch_format="pandas")
           .groupby("pbucket").map_groups(part_sum,
                                          batch_format="pandas"))
    adf = avg.to_pandas()
    if "partkey" not in adf.columns or not len(adf):
        return pa.table({
            "n_lines": pa.array([0], pa.int64()),
            "sum_cents": pa.array([0], pa.int64()),
            "avg_yearly": pa.array([0.0], pa.float64())})
    order = np.argsort(adf.partkey.to_numpy(np.int64))
    stats_ref = ray.put((adf.partkey.to_numpy(np.int64)[order],
                         adf.n.to_numpy(np.int64)[order],
                         adf.sq.to_numpy(np.int64)[order]))

    def small_partial(df: pd.DataFrame) -> pd.DataFrame:
        pks, ns, sqs = ray.get(stats_ref)  # zero-copy numpy views
        k = df["l_partkey"].to_numpy(np.int64)
        hit, p = _sorted_hits(pks, k)
        q = _half_away(df["l_quantity"].to_numpy(np.float64))[hit]
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))[hit]
        keep = 5 * q * ns[p] < sqs[p]
        return pd.DataFrame({"n": [int(keep.sum())],
                             "s": [int(cents[keep].sum())]})

    agg = (_read(sf_dir, "lineitem.parquet", columns=cols)
           .map_batches(small_partial, batch_format="pandas")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("s", alias_name="s")))
    n, s = int(agg["n"] or 0), int(agg["s"] or 0)
    return pa.table({
        "n_lines": pa.array([n], pa.int64()),
        "sum_cents": pa.array([s], pa.int64()),
        "avg_yearly": pa.array([round6(s / 100.0 / Q17_YEARS)],
                               pa.float64()),
    })


def sql_small_qty_revenue() -> str:
    return f"""
WITH bp AS (
  SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}'
), agg AS (
  SELECT l_partkey,
         count(*)::BIGINT AS n,
         sum(CAST(round(l_quantity, 0) AS BIGINT))::BIGINT AS sq
  FROM lineitem JOIN bp ON l_partkey = p_partkey
  GROUP BY l_partkey
), small AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem JOIN agg ON lineitem.l_partkey = agg.l_partkey
  WHERE 5 * CAST(round(l_quantity, 0) AS BIGINT) * agg.n < agg.sq
)
SELECT count(*)::BIGINT AS n_lines,
       coalesce(sum(cents), 0)::BIGINT AS sum_cents,
       round(coalesce(sum(cents), 0) / 100.0 / {Q17_YEARS}, 6)
         AS avg_yearly
FROM small
"""


# ---- Q19 shape: disjunctive-predicate discounted revenue ----

Q19_TERMS = (("Brand#1", 1, 11), ("Brand#4", 10, 20),
             ("Brand#9", 20, 30))


@fmt_doc(terms=Q19_TERMS)
def disjunct_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q19-shaped discounted revenue under a DISJUNCTION of
    (brand, quantity-range) terms — the multi-predicate OR no single
    parquet filter can push down: revenue c4 and line count for lines
    matching ANY of {terms}.

    Shape: part (partkey -> brand-term index, -1 for brands outside
    every term) broadcasts once (cap-gated via _broadcast_dim); each
    lineitem batch resolves its term index, applies that term's
    quantity bounds VECTORIZED (one gather of per-term lo/hi arrays —
    no per-term scan), and emits a single int partial row; Ray's
    aggregate reduces. Zero wide exchanges; exact int64 c4."""
    from ray.data.aggregate import Sum

    brand_idx = {b: i for i, (b, _, _) in enumerate(Q19_TERMS)}
    lo = np.array([t[1] for t in Q19_TERMS], dtype=np.int64)
    hi = np.array([t[2] for t in Q19_TERMS], dtype=np.int64)

    dim_ref = _broadcast_dim(
        sf_dir, "part.parquet", "p_partkey", "p_brand",
        val_fn=lambda col: np.array(
            [brand_idx.get(b, -1) for b in col.to_pylist()],
            dtype=np.int64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hit, term = _lookup(df["l_partkey"].to_numpy(np.int64),
                            dim_ref)
        q = _half_away(df["l_quantity"].to_numpy(np.float64))[hit]
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64)
                          * 100.0)
        c4 = (cents * (100 - disc))[hit]
        termed = term >= 0
        t = term[termed]
        keep = (q[termed] >= lo[t]) & (q[termed] <= hi[t])
        return pd.DataFrame({"n": [int(keep.sum())],
                             "c4": [int(c4[termed][keep].sum())]})

    agg = (_read(sf_dir, "lineitem.parquet",
                 columns=["l_partkey", "l_quantity", "l_extendedprice",
                          "l_discount"])
           .map_batches(partial, batch_format="pandas")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("c4", alias_name="c4")))
    return pa.table({
        "n_lines": pa.array([int(agg["n"] or 0)], pa.int64()),
        "revenue_c4": pa.array([int(agg["c4"] or 0)], pa.int64()),
    })


def sql_disjunct_revenue() -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND CAST(round(l_quantity, 0) AS BIGINT) "
        f"BETWEEN {lo} AND {hi})"
        for b, lo, hi in Q19_TERMS)
    return f"""
SELECT count(*)::BIGINT AS n_lines,
       coalesce(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))),
           0)::BIGINT AS revenue_c4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {ors}
"""


# ---- Q21 shape: sole-late-supplier blame ranking ----

Q21_LATE_DAYS = 60
Q21_LATE_US = Q21_LATE_DAYS * 86_400 * 1_000_000
Q21_K = 25


@fmt_doc(k=Q21_K, d=Q21_LATE_DAYS)
def sole_late_supplier(sf_dir: str) -> pa.Table:
    """TPC-H-Q21-shaped sole-blame ranking: the {k} suppliers that
    were most often the ONLY late supplier on a multi-supplier order
    (late = the supplier's last lineitem shipped more than {d} days
    after the order date; the testdata has no l_receiptdate /
    l_commitdate, so lateness anchors to o_orderdate).

    Shape (the reference's accumulate-then-rank loop,
    src/lib.rs:374-411, re-expressed as relational supersteps):
    lineitem collapses map-side to per-(orderkey, suppkey) max-ship
    partials; orders emit (okey, orderdate) rows; ONE
    orderkey-bucketed exchange joins them, applies the
    exactly-one-late-among->=2-suppliers predicate per order in a
    vectorized kernel, and emits per-suppkey credit partials (a
    dangling l_suppkey is dropped against the supplier-membership
    broadcast BEFORE counting, so it neither earns blame nor pads
    the order's supplier count — both sides agree); a
    coarse suppkey-bucket kernel fuses exact final counts with the
    local top-{k} under (numwait DESC, suppkey ASC), bounding the
    driver merge at n_buckets x {k} rows. Only the {k} winners'
    names are fetched, via a key-filtered supplier read."""
    import pyarrow.parquet as pq

    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))
    # membership broadcast: a dangling l_suppkey must never occupy a
    # top-k slot (the oracle's JOIN supplier drops it before LIMIT)
    sup_ref = _broadcast_dim(sf_dir, "supplier.parquet",
                             "s_suppkey", "s_nationkey")

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        od = df["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok,
            "side": np.int64(0), "supp": np.int64(-1), "v": od})

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = df["l_suppkey"].to_numpy(np.int64)
        hit, _ = _lookup(sk, sup_ref)
        g = (pd.DataFrame({
                "okey": df["l_orderkey"].to_numpy(np.int64)[hit],
                "supp": sk[hit],
                "v": df["l_shipdate"].to_numpy("datetime64[us]")
                     .astype(np.int64)[hit]})
             .groupby(["okey", "supp"], as_index=False)
             .agg(v=("v", "max")))
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        side=np.int64(1))[
            ["bucket", "okey", "side", "supp", "v"]]

    def join_kern(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g.side == 0][["okey", "v"]].rename(columns={"v": "odate"})
        li = (g[g.side == 1].groupby(["okey", "supp"], as_index=False)
              .agg(v=("v", "max")))
        j = li.merge(o, on="okey", how="inner")
        if not len(j):
            return pd.DataFrame({"sbucket": pd.Series([], np.int64),
                                 "supp": pd.Series([], np.int64),
                                 "numwait": pd.Series([], np.int64)})
        j["late"] = j.v.to_numpy() > j.odate.to_numpy() + Q21_LATE_US
        per_o = (j.groupby("okey")
                 .agg(n_supp=("supp", "size"), n_late=("late", "sum")))
        hits = per_o[(per_o.n_supp >= 2) & (per_o.n_late == 1)].index
        credit = j[j.late & j.okey.isin(hits)]
        out = (credit.groupby("supp", as_index=False)
               .agg(numwait=("late", "sum")))
        out["numwait"] = out.numwait.astype(np.int64)
        out["sbucket"] = out.supp.to_numpy(np.int64) & (nb - 1)
        return out[["sbucket", "supp", "numwait"]]

    def sum_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = (g.groupby("supp", as_index=False)
               .agg(numwait=("numwait", "sum")))
        return tot.sort_values(["numwait", "supp"],
                               ascending=[False, True]).head(Q21_K)

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_orderdate"]
                   ).map_batches(o_rows, batch_format="pandas")
    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"]
               ).map_batches(l_partial, batch_format="pandas")
    parts = (orders.union(li)
             .groupby("bucket").map_groups(join_kern,
                                           batch_format="pandas")
             .groupby("sbucket").map_groups(sum_topk,
                                            batch_format="pandas"))
    df = parts.to_pandas()
    empty = pa.table({
        "s_suppkey": pa.array([], pa.int64()),
        "s_name": pa.array([], pa.string()),
        "numwait": pa.array([], pa.int64())})
    if "supp" not in df.columns or not len(df):
        return empty
    df = (df.sort_values(["numwait", "supp"],
                         ascending=[False, True], ignore_index=True)
          .head(Q21_K))
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in",
                  [int(k) for k in df.supp])]).to_pandas()
    j = df.merge(sup, left_on="supp", right_on="s_suppkey",
                 how="inner")
    j = j.sort_values(["numwait", "supp"],
                      ascending=[False, True], ignore_index=True)
    return pa.table({
        "s_suppkey": pa.array(j.supp.to_numpy(np.int64), pa.int64()),
        "s_name": pa.array(j.s_name.tolist(), pa.string()),
        "numwait": pa.array(j.numwait.to_numpy(np.int64), pa.int64()),
    })


def sql_sole_late_supplier() -> str:
    return f"""
WITH l AS (
  -- only REAL suppliers participate (engine filters dangling
  -- l_suppkey against the supplier broadcast before counting, so a
  -- ghost supplier neither earns blame nor pads n_supp)
  SELECT l_orderkey AS okey, l_suppkey AS supp,
         max(l_shipdate) AS mship
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier)
  GROUP BY l_orderkey, l_suppkey
), j AS (
  SELECT l.okey, l.supp,
         (l.mship > o.o_orderdate
          + INTERVAL {Q21_LATE_DAYS} DAY) AS late
  FROM l JOIN orders o ON l.okey = o.o_orderkey
), per_o AS (
  SELECT okey, count(*) AS n_supp,
         sum(CASE WHEN late THEN 1 ELSE 0 END) AS n_late,
         max(CASE WHEN late THEN supp END) AS late_supp
  FROM j GROUP BY okey
)
SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
FROM per_o JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT {Q21_K}
"""


# ---- Q6 shape: discount-band revenue forecast ----

Q6_D1 = datetime.datetime(1996, 1, 1)
Q6_D2 = datetime.datetime(1997, 1, 1)
Q6_DISC_LO = 5      # discount hundredths, inclusive band [5, 7]
Q6_DISC_HI = 7
Q6_QTY = 24


@fmt_doc(d1=Q6_D1, d2=Q6_D2, lo=Q6_DISC_LO, hi=Q6_DISC_HI, q=Q6_QTY)
def forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q6-shaped revenue forecast: the revenue that would be
    recovered by dropping discounts in the [{lo}, {hi}]-hundredths
    band on small (< {q}) quantities shipped in {d1:%Y} — i.e.
    sum(extendedprice * discount) over that slice.

    The simplest possible distributed plan, kept deliberately pure:
    the date window pushes into the parquet READ (row groups outside
    {d1:%Y} never leave storage), the discount/quantity predicates and
    the money product are one vectorized integer kernel per batch
    (cents x discount-hundredths = exact int64 'c3'), and the only
    cross-node traffic is one 2-int partial row per batch into Ray's
    Sum aggregate. No exchange, no driver state, O(batches) network
    bytes — the floor any scan-aggregate should hit at 100 TB.
    Float appears only in the final display division, after both
    engines agree on the exact integer."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    from raysearch.numutil import round6

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        keep = ((disc >= Q6_DISC_LO) & (disc <= Q6_DISC_HI)
                & (df["l_quantity"].to_numpy(np.float64) < Q6_QTY))
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64)[keep])
        return pd.DataFrame({
            "n": [int(keep.sum())],
            "c3": [int((cents * disc[keep]).sum())]})

    ds = _read(sf_dir, "lineitem.parquet",
               columns=["l_extendedprice", "l_discount", "l_quantity"],
               filter=((pads.field("l_shipdate") >= Q6_D1)
                       & (pads.field("l_shipdate") < Q6_D2))
               ).map_batches(partial, batch_format="pandas")
    agg = ds.aggregate(Sum("n", alias_name="n"),
                       Sum("c3", alias_name="c3"))
    n, c3 = int(agg["n"] or 0), int(agg["c3"] or 0)
    return pa.table({
        "n_lines": pa.array([n], pa.int64()),
        "revenue_c3": pa.array([c3], pa.int64()),
        "revenue": pa.array([round6(c3 / 10_000.0)], pa.float64()),
    })


def sql_forecast_revenue() -> str:
    return f"""
WITH f AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * CAST(round(l_discount * 100, 0) AS BIGINT) AS c3
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q6_D1:%Y-%m-%d}'
    AND l_shipdate < TIMESTAMP '{Q6_D2:%Y-%m-%d}'
    AND CAST(round(l_discount * 100, 0) AS BIGINT)
        BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
    AND l_quantity < {Q6_QTY}
)
SELECT count(*)::BIGINT AS n_lines,
       COALESCE(sum(c3), 0)::BIGINT AS revenue_c3,
       round(COALESCE(sum(c3), 0) / 10000.0, 6) AS revenue
FROM f
"""


# ---- Q2 shape: cheapest-shipment supplier per part ----

Q2_BRAND = "Brand#4"


@fmt_doc(brand=Q2_BRAND)
def min_cost_supplier(sf_dir: str) -> pa.Table:
    """TPC-H-Q2-shaped correlated-min: for every '{brand}' part, the
    supplier behind its cheapest shipment (min l_extendedprice cents;
    ties -> smallest suppkey). The testdata has no partsupp table, so
    'cost' anchors to the shipped price — the distributed shape (a
    per-group argmin correlated against the group's own min) is
    exactly Q2's.

    Shape: TWO small-side broadcasts (the brand's partkeys as a
    membership set, the supplier keys so a dangling l_suppkey is
    dropped BEFORE the argmin on both engines — the oracle's f CTE
    filters identically); lineitem collapses map-side to
    per-(part, supp) min-cents partials, so the ONE part-bucketed
    exchange carries at most |parts x touching-suppliers| narrow
    rows; the per-bucket kernel finishes the min and resolves the
    argmin tie-break (cents ASC, suppkey ASC) vectorized. Winner
    names come from key-filtered dimension reads of only the result
    rows — the fact table never materializes anywhere."""
    import pyarrow.parquet as pq

    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_rows(sf_dir, "part.parquet"), 2_000)
    part_ref = _broadcast_dim(
        sf_dir, "part.parquet", "p_partkey", "p_brand",
        val_fn=lambda col: (np.asarray(col.to_pylist(), dtype=object)
                            == Q2_BRAND).astype(np.int64))
    sup_ref = _broadcast_dim(sf_dir, "supplier.parquet",
                             "s_suppkey", "s_nationkey")

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        pk = df["l_partkey"].to_numpy(np.int64)
        sk = df["l_suppkey"].to_numpy(np.int64)
        bhit, is_brand = _lookup(pk, part_ref)
        shit, _ = _lookup(sk, sup_ref)
        brand = np.zeros(len(pk), dtype=bool)
        brand[bhit] = is_brand.astype(bool)
        keep = brand & shit
        g = (pd.DataFrame({
                "pk": pk[keep], "sk": sk[keep],
                "c": _cents(df["l_extendedprice"]
                            .to_numpy(np.float64))[keep]})
             .groupby(["pk", "sk"], as_index=False).agg(c=("c", "min")))
        return g.assign(bucket=g.pk.to_numpy() & (nb - 1))

    def argmin_kern(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby(["pk", "sk"], as_index=False).agg(c=("c", "min"))
             .sort_values(["pk", "c", "sk"], ignore_index=True))
        return m.drop_duplicates("pk")[["pk", "sk", "c"]]

    win = (_read(sf_dir, "lineitem.parquet",
                 columns=["l_partkey", "l_suppkey", "l_extendedprice"])
           .map_batches(l_partial, batch_format="pandas")
           .groupby("bucket")
           .map_groups(argmin_kern, batch_format="pandas")).to_pandas()
    empty = pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "p_name": pa.array([], pa.string()),
        "s_suppkey": pa.array([], pa.int64()),
        "s_name": pa.array([], pa.string()),
        "min_price_cents": pa.array([], pa.int64())})
    if not len(win) or "pk" not in win.columns:
        return empty
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"],
        filters=[("p_partkey", "in", [int(k) for k in win.pk])]
    ).to_pandas()
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in",
                  sorted({int(k) for k in win.sk}))]).to_pandas()
    j = (win.merge(part, left_on="pk", right_on="p_partkey")
         .merge(sup, left_on="sk", right_on="s_suppkey")
         .sort_values("pk", ignore_index=True))
    return pa.table({
        "p_partkey": pa.array(j.pk.to_numpy(np.int64), pa.int64()),
        "p_name": pa.array(j.p_name.tolist(), pa.string()),
        "s_suppkey": pa.array(j.sk.to_numpy(np.int64), pa.int64()),
        "s_name": pa.array(j.s_name.tolist(), pa.string()),
        "min_price_cents": pa.array(j.c.to_numpy(np.int64), pa.int64()),
    })


def sql_min_cost_supplier() -> str:
    return f"""
WITH f AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_brand = '{Q2_BRAND}')
    AND l_suppkey IN (SELECT s_suppkey FROM supplier)
), m AS (
  SELECT pk, sk, c,
         row_number() OVER (PARTITION BY pk ORDER BY c, sk) AS rn
  FROM f
)
SELECT p_partkey, p_name, s_suppkey, s_name, c AS min_price_cents
FROM m JOIN part ON pk = p_partkey JOIN supplier ON sk = s_suppkey
WHERE rn = 1
ORDER BY p_partkey
"""


# ---- Q11 shape: global-threshold important parts ----

# a part is 'important' if rev * n_parts * DEN > total * NUM, i.e.
# its revenue strictly exceeds NUM/DEN x the mean per-part revenue.
# (TPC-H Q11 thresholds on a fixed FRACTION of the total; with the
# testdata's part count proportional to SF that fraction either
# selects everything or nothing depending on scale, so the
# scale-invariant mean-multiple keeps the exact same plan shape —
# a whole-fact-table scalar gating a per-group HAVING — while
# returning a stable ~15-20% of parts at every SF.)
Q11_NUM = 11
Q11_DEN = 10


@fmt_doc(num=Q11_NUM, den=Q11_DEN)
def important_parts(sf_dir: str) -> pa.Table:
    """TPC-H-Q11-shaped 'important stock': parts whose total c4
    revenue strictly exceeds {num}/{den} of the MEAN per-part revenue
    — the global-scalar HAVING, whose defining feature is a scalar
    computed over the whole fact table gating a per-group aggregate
    over the same table.

    One fact pass: per-part c4 partials collapse map-side and land in
    the object store ONCE (materialized partials dataset). BOTH global
    scalars — total revenue and the revenue-bearing part count — are
    distributed aggregates over one tiny per-bucket summary pass, by
    construction identical to the sums/counts of the per-part finals,
    so the threshold both engines apply is the same exact integer
    pair. The part-bucketed exchange finishes per-part sums and
    filters with the integer cross-multiplication
    rev * n_parts * {den} > total * {num} (no float division anywhere
    a hash could see). Output is part-cardinality at worst (a
    dimension-sized sink at scale, like every per-part report)."""
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_rows(sf_dir, "part.parquet"), 2_000)

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        g = (pd.DataFrame({"pk": df["l_partkey"].to_numpy(np.int64),
                           "c4": cents * (100 - disc)})
             .groupby("pk", as_index=False).agg(c4=("c4", "sum")))
        return g.assign(bucket=g.pk.to_numpy() & (nb - 1))

    partials = (_read(sf_dir, "lineitem.parquet",
                      columns=["l_partkey", "l_extendedprice",
                               "l_discount"])
                .map_batches(l_partial, batch_format="pandas")
                ).materialize()

    def bucket_scalars(g: pd.DataFrame) -> pd.DataFrame:
        # exact per-bucket (distinct parts, total c4): a part's rows
        # all share one bucket, so the distinct count is exact
        return pd.DataFrame({"np": [int(g.pk.nunique())],
                             "c4": [int(g.c4.sum())]})

    sc = (partials.groupby("bucket")
          .map_groups(bucket_scalars, batch_format="pandas")
          .aggregate(Sum("np", alias_name="np"),
                     Sum("c4", alias_name="c4")))
    n_parts, total = int(sc["np"] or 0), int(sc["c4"] or 0)

    def thresh_kern(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pk", as_index=False).agg(c4=("c4", "sum"))
        keep = (s.c4.to_numpy(object) * n_parts * Q11_DEN
                > total * Q11_NUM)
        return s[keep]

    hot = (partials.groupby("bucket")
           .map_groups(thresh_kern, batch_format="pandas")).to_pandas()
    if not len(hot) or "pk" not in hot.columns:
        hot = pd.DataFrame({"pk": pd.Series([], dtype=np.int64),
                            "c4": pd.Series([], dtype=np.int64)})
    hot = hot.sort_values(["c4", "pk"], ascending=[False, True],
                          ignore_index=True)
    return pa.table({
        "p_partkey": pa.array(hot.pk.to_numpy(np.int64), pa.int64()),
        "revenue_c4": pa.array(hot.c4.to_numpy(np.int64), pa.int64()),
    })


def sql_important_parts() -> str:
    # HUGEINT arithmetic on the oracle side mirrors the engine's
    # Python-int cross-multiplication (c4 * n_parts * den overflows
    # int64 at large SF)
    return f"""
WITH f AS (
  SELECT l_partkey AS pk,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS c4
  FROM lineitem
), per_part AS (
  SELECT pk, sum(c4)::BIGINT AS revenue_c4 FROM f GROUP BY pk
), tot AS (
  SELECT COALESCE(sum(revenue_c4), 0)::HUGEINT AS t,
         count(*)::HUGEINT AS n_parts
  FROM per_part
)
SELECT pk AS p_partkey, revenue_c4
FROM per_part, tot
WHERE revenue_c4::HUGEINT * n_parts * {Q11_DEN} > t * {Q11_NUM}
ORDER BY revenue_c4 DESC, pk
"""


# ---- referential-integrity audit ----

def fk_integrity(sf_dir: str) -> pa.Table:
    """Foreign-key integrity audit across the star schema — the
    data-engineering preflight every warehouse load runs: row counts
    plus FOUR anti-join violation counts (lineitem rows with no parent
    order, orders with no lineitem children, lineitem rows with an
    unknown supplier, order rows with an unknown customer).

    Shape: supplier/customer memberships broadcast once (dimension
    side); orders<->lineitem — the two fact tables — meet in ONE
    orderkey-bucketed exchange of map-side-collapsed (okey, count)
    partials, whose per-bucket kernel computes BOTH anti-join
    directions at once (np.isin each way) and emits six per-bucket
    counters; a final 6-row-per-bucket Sum reduce produces the single
    summary row. Broadcast-membership violations ride the same
    exchange as sentinel side-rows, so the whole audit is one pass
    over each fact table and zero driver-side row state."""
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))
    sup_ref = _broadcast_dim(sf_dir, "supplier.parquet",
                             "s_suppkey", "s_nationkey")
    cust_ref = _broadcast_dim(sf_dir, "customer.parquet",
                              "c_custkey", "c_nationkey")

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        shit, _ = _lookup(df["l_suppkey"].to_numpy(np.int64), sup_ref)
        g = (pd.DataFrame({"okey": ok})
             .groupby("okey", as_index=False).agg(cnt=("okey", "size")))
        g = g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                     side=np.int64(1))
        sent = pd.DataFrame({
            "okey": [np.int64(-1)], "cnt": [int((~shit).sum())],
            "bucket": [np.int64(0)], "side": [np.int64(3)]})
        return pd.concat([g, sent], ignore_index=True)[
            ["bucket", "okey", "side", "cnt"]]

    def o_partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        chit, _ = _lookup(df["o_custkey"].to_numpy(np.int64), cust_ref)
        g = pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok,
            "side": np.int64(0), "cnt": np.int64(1)})
        sent = pd.DataFrame({
            "bucket": [np.int64(0)], "okey": [np.int64(-1)],
            "side": [np.int64(4)], "cnt": [int((~chit).sum())]})
        return pd.concat([g, sent], ignore_index=True)

    METRICS = ["n_lineitem", "n_orders", "dangling_li_orders",
               "childless_orders", "dangling_li_supp",
               "dangling_order_cust"]

    def audit_kern(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g.side == 1]
        o = g[g.side == 0]
        li_sum = (li.groupby("okey", as_index=False)
                  .agg(cnt=("cnt", "sum")))
        okeys = o.okey.to_numpy()
        vals = [
            int(li_sum.cnt.sum()),
            int(len(o)),
            int(li_sum.cnt.to_numpy()[
                ~np.isin(li_sum.okey.to_numpy(), okeys)].sum()),
            int((~np.isin(okeys, li_sum.okey.to_numpy())).sum()),
            int(g[g.side == 3].cnt.sum()),
            int(g[g.side == 4].cnt.sum()),
        ]
        return pd.DataFrame({"metric": METRICS,
                             "v": np.asarray(vals, np.int64)})

    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_suppkey"]
               ).map_batches(l_partial, batch_format="pandas")
    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_custkey"]
                   ).map_batches(o_partial, batch_format="pandas")
    agg = (li.union(orders)
           .groupby("bucket").map_groups(audit_kern,
                                         batch_format="pandas")
           .groupby("metric")
           .aggregate(Sum("v", alias_name="v"))).to_pandas()
    got = dict(zip(agg["metric"], agg["v"].astype(np.int64)))
    return pa.table({m: pa.array([int(got.get(m, 0))], pa.int64())
                     for m in METRICS})


def sql_fk_integrity() -> str:
    return """
SELECT
  (SELECT count(*) FROM lineitem)::BIGINT AS n_lineitem,
  (SELECT count(*) FROM orders)::BIGINT AS n_orders,
  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  )::BIGINT AS dangling_li_orders,
  (SELECT count(*) FROM orders o WHERE NOT EXISTS
     (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
  )::BIGINT AS childless_orders,
  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
     (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
  )::BIGINT AS dangling_li_supp,
  (SELECT count(*) FROM orders o WHERE NOT EXISTS
     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  )::BIGINT AS dangling_order_cust
"""


# ---- Q8 shape: national market share ----

Q8_REGION = "EUROPE"
Q8_TARGET = "NATION_8"
Q8_TYPE = "PROMO"
Q8_D1 = datetime.datetime(1996, 1, 1)
Q8_D2 = datetime.datetime(1998, 1, 1)


def _region_nationkeys(sf_dir: str, region_name: str) -> list[int]:
    """nationkeys of one region — delegates to relational.py's
    _region_nations (the one region-membership helper)."""
    from raysearch.pipelines.relational import _region_nations

    return _region_nations(sf_dir, region_name)[0].tolist()


def _partkeys_ref(sf_dir: str, filters=None, name_contains=None):
    """Broadcast the sorted partkeys matching a predicate (dimension
    side, cap-checked like every broadcast in this module)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    n_part = _n_rows(sf_dir, "part.parquet")
    if n_part > JOIN_BROADCAST_CAP:
        raise ValueError(
            f"part ({n_part} rows) exceeds the broadcast cap; use the "
            "bucketed-shuffle membership join (joins.revenue_by_nation"
            "'s >cap path) with the part filter pushed into the read")
    cols = ["p_partkey"] + (["p_name"] if name_contains else [])
    t = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                      columns=cols, filters=filters)
    if name_contains:
        t = t.filter(pc.match_substring(t["p_name"], name_contains))
    pk = np.sort(t["p_partkey"].to_numpy().astype(np.int64))
    return ray.put(pk)


@fmt_doc(region=Q8_REGION, tgt=Q8_TARGET, ptype=Q8_TYPE,
         d1=Q8_D1, d2=Q8_D2)
def market_share(sf_dir: str) -> pa.Table:
    """TPC-H-Q8-shaped national market share: among '{ptype}'-part
    order lines bought by {region} customers with orders placed in
    {d1:%Y}..{d2:%Y}, the fraction of c4 revenue supplied by
    '{tgt}', per order year — the conditional-share aggregate
    (CASE numerator over the same sum).

    Shape: three broadcast dimensions ({ptype} partkeys, supplier ->
    nationkey, {region}-customer membership — all FK/cap-checked);
    orders (window pushed into the read) emit (okey, year) for
    in-region customers; lineitem keeps {ptype}-part lines, resolves
    the supplier nation locally and collapses map-side to per-okey
    (target_c4, total_c4) partials. ONE orderkey-bucketed exchange
    joins the sides; the final aggregate is year-cardinality. The
    only float is mkt_share = round6(target/total), computed with the
    same float64 division on both engines."""
    import pyarrow.dataset as pads
    import ray
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets
    from raysearch.numutil import round6

    names = _nation_names(sf_dir)
    target_keys = [k for k, v in names.items() if v == Q8_TARGET]
    if not target_keys:
        raise ValueError(f"nation {Q8_TARGET!r} not in nation table")
    target_key = target_keys[0]
    region_nats = _region_nationkeys(sf_dir, Q8_REGION)
    cust_ref = _broadcast_dim(
        sf_dir, "customer.parquet", "c_custkey", "c_nationkey",
        filters=[("c_nationkey", "in", region_nats)])
    supp_ref = _nation_dim(sf_dir, "supplier.parquet",
                           "s_suppkey", "s_nationkey", names)
    pk_ref = _partkeys_ref(sf_dir, filters=[("p_type", "==", Q8_TYPE)])
    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        hit, _ = _lookup(df["o_custkey"].to_numpy(np.int64), cust_ref)
        ok = ok[hit]
        yr = df["o_orderdate"].dt.year.to_numpy(np.int64)[hit]
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok, "year": yr,
            "side": np.int64(0), "tgt": np.int64(0), "c4": np.int64(0)})

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        phit, _ = _sorted_hits(ray.get(pk_ref),
                               df["l_partkey"].to_numpy(np.int64))
        shit, snat = _lookup(df["l_suppkey"].to_numpy(np.int64),
                             supp_ref)
        keep = phit & shit
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        c4 = (cents * (100 - disc))[keep]
        snat_all = np.full(len(ok), -1, np.int64)
        snat_all[shit] = snat
        is_tgt = snat_all[keep] == target_key
        g = (pd.DataFrame({"okey": ok[keep], "c4": c4,
                           "tgt": np.where(is_tgt, c4, 0)})
             .groupby("okey", as_index=False)
             .agg(tgt=("tgt", "sum"), c4=("c4", "sum")))
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        year=np.int64(-1), side=np.int64(1))[
            ["bucket", "okey", "year", "side", "tgt", "c4"]]

    def join_kern(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g.side == 0][["okey", "year"]]
        li = (g[g.side == 1].groupby("okey", as_index=False)
              .agg(tgt=("tgt", "sum"), c4=("c4", "sum")))
        j = o.merge(li, on="okey", how="inner")
        return (j.groupby("year", as_index=False)
                .agg(tgt=("tgt", "sum"), c4=("c4", "sum")))

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pads.field("o_orderdate") >= Q8_D1)
                           & (pads.field("o_orderdate") < Q8_D2))
                   ).map_batches(o_rows, batch_format="pandas")
    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"]
               ).map_batches(l_partial, batch_format="pandas")
    agg = (orders.union(li)
           .groupby("bucket").map_groups(join_kern,
                                         batch_format="pandas")
           .groupby("year").aggregate(
               Sum("tgt", alias_name="target_c4"),
               Sum("c4", alias_name="total_c4")))
    df = agg.to_pandas()
    if "year" not in df.columns or not len(df):
        return pa.table({
            "o_year": pa.array([], pa.int64()),
            "target_c4": pa.array([], pa.int64()),
            "total_c4": pa.array([], pa.int64()),
            "mkt_share": pa.array([], pa.float64())})
    df = df.sort_values("year", ignore_index=True)
    tgt = df.target_c4.to_numpy(np.int64)
    tot = df.total_c4.to_numpy(np.int64)
    share = round6(tgt.astype(np.float64) / tot.astype(np.float64))
    return pa.table({
        "o_year": pa.array(df.year.to_numpy(np.int64), pa.int64()),
        "target_c4": pa.array(tgt, pa.int64()),
        "total_c4": pa.array(tot, pa.int64()),
        "mkt_share": pa.array(share, pa.float64()),
    })


def sql_market_share() -> str:
    return f"""
WITH f AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS c4,
         ns.n_name AS snation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{Q8_D1:%Y-%m-%d}'
    AND o_orderdate < TIMESTAMP '{Q8_D2:%Y-%m-%d}'
)
SELECT o_year::BIGINT AS o_year,
       sum(CASE WHEN snation = '{Q8_TARGET}' THEN c4 ELSE 0 END)
         ::BIGINT AS target_c4,
       sum(c4)::BIGINT AS total_c4,
       round(sum(CASE WHEN snation = '{Q8_TARGET}' THEN c4 ELSE 0 END)
             ::DOUBLE / sum(c4), 6) AS mkt_share
FROM f GROUP BY o_year ORDER BY o_year
"""


# ---- Q9 shape: product-line profit by supplier nation and year ----

Q9_WORD = "widget"


@fmt_doc(w=Q9_WORD)
def product_profit(sf_dir: str) -> pa.Table:
    """TPC-H-Q9-shaped product-line profit: c4 revenue of lines whose
    part name contains '{w}', grouped by (supplier nation, order
    year). (The schema has no partsupp/ps_supplycost, so profit is
    the price-side term of Q9's expression — the join/rollup shape is
    the point.)

    Shape: '{w}' partkeys (substring match on the dimension read) and
    the supplier nation map broadcast once; orders emit (okey, year);
    lineitem keeps matching parts and collapses map-side to per-
    (okey, snat) c4 partials; ONE orderkey-bucketed exchange joins
    them and the final aggregate is (nation x year)-cardinality.
    Names attach driver-side (nation is O(25) rows)."""
    import ray
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets

    names = _nation_names(sf_dir)
    supp_ref = _nation_dim(sf_dir, "supplier.parquet",
                           "s_suppkey", "s_nationkey", names)
    pk_ref = _partkeys_ref(sf_dir, name_contains=Q9_WORD)
    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        yr = df["o_orderdate"].dt.year.to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok, "year": yr,
            "snat": np.int64(-1), "side": np.int64(0),
            "nl": np.int64(0), "c4": np.int64(0)})

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        phit, _ = _sorted_hits(ray.get(pk_ref),
                               df["l_partkey"].to_numpy(np.int64))
        shit, snat = _lookup(df["l_suppkey"].to_numpy(np.int64),
                             supp_ref)
        keep = phit & shit
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        c4 = (cents * (100 - disc))[keep]
        snat_all = np.full(len(ok), -1, np.int64)
        snat_all[shit] = snat
        g = (pd.DataFrame({"okey": ok[keep], "snat": snat_all[keep],
                           "c4": c4})
             .groupby(["okey", "snat"], as_index=False)
             .agg(nl=("c4", "size"), c4=("c4", "sum")))
        g["nl"] = g["nl"].astype(np.int64)
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        year=np.int64(-1), side=np.int64(1))[
            ["bucket", "okey", "year", "snat", "side", "nl", "c4"]]

    def join_kern(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g.side == 0][["okey", "year"]]
        li = (g[g.side == 1]
              .groupby(["okey", "snat"], as_index=False)
              .agg(nl=("nl", "sum"), c4=("c4", "sum")))
        j = o.merge(li, on="okey", how="inner")
        return (j.groupby(["snat", "year"], as_index=False)
                .agg(nl=("nl", "sum"), c4=("c4", "sum")))

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_orderdate"]
                   ).map_batches(o_rows, batch_format="pandas")
    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"]
               ).map_batches(l_partial, batch_format="pandas")
    agg = (orders.union(li)
           .groupby("bucket").map_groups(join_kern,
                                         batch_format="pandas")
           .groupby(["snat", "year"]).aggregate(
               Sum("nl", alias_name="n_lines"),
               Sum("c4", alias_name="profit_c4")))
    df = agg.to_pandas()
    if "snat" not in df.columns or not len(df):
        return pa.table({
            "nation": pa.array([], pa.string()),
            "o_year": pa.array([], pa.int64()),
            "n_lines": pa.array([], pa.int64()),
            "profit_c4": pa.array([], pa.int64())})
    df["nation"] = df.snat.map(names)
    df = df.sort_values(["nation", "year"], ignore_index=True)
    return pa.table({
        "nation": pa.array(df.nation.tolist(), pa.string()),
        "o_year": pa.array(df.year.to_numpy(np.int64), pa.int64()),
        "n_lines": pa.array(df.n_lines.to_numpy(np.int64), pa.int64()),
        "profit_c4": pa.array(df.profit_c4.to_numpy(np.int64),
                              pa.int64()),
    })


def sql_product_profit() -> str:
    return f"""
SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
       count(*)::BIGINT AS n_lines,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
           )::BIGINT AS profit_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_WORD}%'
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---- Q3 shape: unshipped-revenue shipping priority ----

Q3_SEGMENT = "BUILDING"
Q3_DATE = datetime.datetime(1998, 6, 1)
Q3_K = 10


@fmt_doc(seg=Q3_SEGMENT, d=Q3_DATE, k=Q3_K)
def shipping_priority(sf_dir: str) -> pa.Table:
    """TPC-H-Q3-shaped shipping priority: the {k} highest-revenue
    orders placed by '{seg}' customers BEFORE {d:%Y-%m-%d} whose
    revenue counts only lines still unshipped at that date
    (l_shipdate > cutoff) — revenue in exact int64 c4.

    Shape: the '{seg}' customer membership broadcasts once (sorted
    custkeys); both date predicates push into the parquet reads
    (orders keeps the pre-cutoff window, lineitem the post-cutoff
    one). Orders emit (okey, orderdate) for member customers;
    lineitem collapses map-side to per-okey c4 partials; ONE
    orderkey-bucketed exchange joins the sides and each bucket kernel
    emits its local top-{k} under the total order
    (revenue DESC, okey ASC) — exact int64 revenue, so boundary ties
    resolve identically everywhere — bounding the driver merge at
    n_buckets x {k} rows."""
    import pyarrow.dataset as pads

    from raysearch.hashing import auto_buckets

    cust_ref = _broadcast_dim(
        sf_dir, "customer.parquet", "c_custkey", "c_nationkey",
        filters=[("c_mktsegment", "==", Q3_SEGMENT)])
    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        hit, _ = _lookup(df["o_custkey"].to_numpy(np.int64), cust_ref)
        ok = ok[hit]
        od = _epoch_us(df["o_orderdate"])[hit]
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok, "odate_us": od,
            "side": np.int64(0), "c4": np.int64(0)})

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        g = (pd.DataFrame({
                "okey": df["l_orderkey"].to_numpy(np.int64),
                "c4": cents * (100 - disc)})
             .groupby("okey", as_index=False).agg(c4=("c4", "sum")))
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        odate_us=np.int64(-1), side=np.int64(1))[
            ["bucket", "okey", "odate_us", "side", "c4"]]

    def join_topk(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g.side == 0][["okey", "odate_us"]]
        li = (g[g.side == 1].groupby("okey", as_index=False)
              .agg(revenue_c4=("c4", "sum")))
        j = o.merge(li, on="okey", how="inner")
        return j.sort_values(["revenue_c4", "okey"],
                             ascending=[False, True]).head(Q3_K)

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=pads.field("o_orderdate") < Q3_DATE
                   ).map_batches(o_rows, batch_format="pandas")
    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_extendedprice", "l_discount"],
               filter=pads.field("l_shipdate") > Q3_DATE
               ).map_batches(l_partial, batch_format="pandas")
    df = (orders.union(li)
          .groupby("bucket").map_groups(join_topk,
                                        batch_format="pandas")
          ).to_pandas()
    if "okey" not in df.columns or not len(df):
        return pa.table({
            "l_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "revenue_c4": pa.array([], pa.int64())})
    df = (df.sort_values(["revenue_c4", "okey"],
                         ascending=[False, True], ignore_index=True)
          .head(Q3_K))
    return pa.table({
        "l_orderkey": pa.array(df.okey.to_numpy(np.int64), pa.int64()),
        "o_orderdate": pa.array(
            df.odate_us.to_numpy(np.int64).astype("datetime64[us]"),
            pa.timestamp("us")),
        "revenue_c4": pa.array(df.revenue_c4.to_numpy(np.int64),
                               pa.int64()),
    })


def sql_shipping_priority() -> str:
    return f"""
SELECT l_orderkey,
       o_orderdate,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
           )::BIGINT AS revenue_c4
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE:%Y-%m-%d}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE:%Y-%m-%d}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_c4 DESC, l_orderkey
LIMIT {Q3_K}
"""


# ---- Q16 shape: supplier breadth per part group ----

Q16_EXCL_BRAND = "Brand#13"
Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)
Q16_MIN_BAL = 2000.0


@fmt_doc(xb=Q16_EXCL_BRAND, sizes=Q16_SIZES, bal=Q16_MIN_BAL)
def part_supplier_breadth(sf_dir: str) -> pa.Table:
    """TPC-H-Q16-shaped supplier breadth: how many DISTINCT suppliers
    ship each (brand, type, size) part group, over parts that are not
    '{xb}' and whose size is in {sizes}, excluding low-standing
    suppliers (s_acctbal < {bal} — the schema's stand-in for Q16's
    complaint list). lineitem is the part-supplier bridge (the schema
    has no partsupp).

    Shape: the filtered part dimension maps partkey -> a dense group
    id (one id per distinct (brand, type, size)) driver-side and
    broadcasts (sorted partkeys, gid) once; the excluded-supplier set
    broadcasts as a sorted array. Each lineitem batch keeps bridged
    pairs, dedups (gid, suppkey) map-side, and ONE group-bucketed
    exchange carries only distinct pairs (<= n_groups x n_suppliers
    rows globally, and per-group mass is bounded by the supplier
    count — the count-distinct never ships raw fact rows). A group id
    lives in exactly one bucket, so in-bucket distinct counts are
    final; the driver attaches the O(groups) attribute strings."""
    import pyarrow.parquet as pq
    import ray

    from raysearch.hashing import auto_buckets

    n_part = _n_rows(sf_dir, "part.parquet")
    if n_part > JOIN_BROADCAST_CAP:
        raise ValueError(
            f"part ({n_part} rows) exceeds the broadcast cap; use the "
            "bucketed-shuffle membership join with the part filter "
            "pushed into the read")
    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filters=[("p_brand", "!=", Q16_EXCL_BRAND),
                 ("p_size", "in", list(Q16_SIZES))]).to_pandas()
    part = part.sort_values("p_partkey", ignore_index=True)
    gid, groups = pd.factorize(
        pd.Series(list(zip(part.p_brand, part.p_type,
                           part.p_size.astype(np.int64)))), sort=True)
    pk_gid_ref = ray.put((part.p_partkey.to_numpy(np.int64),
                          gid.astype(np.int64)))
    excl = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey"],
        filters=[("s_acctbal", "<", Q16_MIN_BAL)])
    excl_ref = ray.put(np.sort(
        excl["s_suppkey"].to_numpy().astype(np.int64)))
    nb = auto_buckets(len(groups), docs_per_bucket=16)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        pk, gv = ray.get(pk_gid_ref)
        keys = df["l_partkey"].to_numpy(np.int64)
        sup = df["l_suppkey"].to_numpy(np.int64)
        hit, pos = _sorted_hits(pk, keys)
        xhit, _ = _sorted_hits(ray.get(excl_ref), sup)
        keep_sup = sup[hit][~xhit[hit]]
        keep_gid = gv[pos[~xhit[hit]]]
        out = (pd.DataFrame({"gid": keep_gid, "supp": keep_sup})
               .drop_duplicates(ignore_index=True))
        out["bucket"] = out.gid.to_numpy(np.int64) & (nb - 1)
        return out[["bucket", "gid", "supp"]]

    def count_kern(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["gid", "supp"])
        out = (d.groupby("gid", as_index=False)
               .agg(supplier_cnt=("supp", "size")))
        out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
        return out

    df = (_read(sf_dir, "lineitem.parquet",
                columns=["l_partkey", "l_suppkey"])
          .map_batches(pairs, batch_format="pandas")
          .groupby("bucket").map_groups(count_kern,
                                        batch_format="pandas")
          ).to_pandas()
    if "gid" not in df.columns or not len(df):
        return pa.table({
            "p_brand": pa.array([], pa.string()),
            "p_type": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64()),
            "supplier_cnt": pa.array([], pa.int64())})
    attrs = [groups[int(i)] for i in df.gid]
    df = df.assign(p_brand=[a[0] for a in attrs],
                   p_type=[a[1] for a in attrs],
                   p_size=np.array([a[2] for a in attrs], np.int64))
    df = df.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], ignore_index=True)
    return pa.table({
        "p_brand": pa.array(df.p_brand.tolist(), pa.string()),
        "p_type": pa.array(df.p_type.tolist(), pa.string()),
        "p_size": pa.array(df.p_size.to_numpy(np.int64), pa.int64()),
        "supplier_cnt": pa.array(df.supplier_cnt.to_numpy(np.int64),
                                 pa.int64()),
    })


def sql_part_supplier_breadth() -> str:
    sizes = ", ".join(str(s) for s in Q16_SIZES)
    return f"""
SELECT p_brand, p_type, p_size::BIGINT AS p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_size IN ({sizes})
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_MIN_BAL})
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---- Q20 shape: dominant suppliers of a part line ----

Q20_WORD = "widget"
Q20_D1 = datetime.datetime(1998, 1, 1)
Q20_D2 = datetime.datetime(1999, 1, 1)


@fmt_doc(w=Q20_WORD, d1=Q20_D1, d2=Q20_D2)
def excess_suppliers(sf_dir: str) -> pa.Table:
    """TPC-H-Q20-shaped dominant-supplier audit: suppliers who shipped
    MORE THAN HALF of some '{w}'-part's total {d1:%Y} quantity
    (2 * qty_supplier_part > qty_part, exact integer quantities) —
    the correlated per-part threshold, adapted to lineitem as the
    part-supplier bridge (no partsupp/availqty in the schema).

    Shape: '{w}' partkeys broadcast once; the ship window pushes into
    the read. ONE lineitem pass collapses map-side to per-(partkey,
    suppkey) integer quantity partials; ONE partkey-bucketed exchange
    groups them — a partkey lives in exactly one bucket, so each
    kernel finalizes both the per-(part, supp) sums AND the per-part
    totals locally and applies the threshold with no second fact
    pass. Winners (<= n_suppliers ids) merge driver-side; names and
    nations attach via a key-filtered supplier read."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    from raysearch.hashing import auto_buckets

    names = _nation_names(sf_dir)
    pk_ref = _partkeys_ref(sf_dir, name_contains=Q20_WORD)
    nb = auto_buckets(_n_rows(sf_dir, "part.parquet"))

    def sp_partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["l_partkey"].to_numpy(np.int64)
        hit, _ = _sorted_hits(ray.get(pk_ref), keys)
        qty = _half_away(df["l_quantity"].to_numpy(np.float64))
        g = (pd.DataFrame({"pkey": keys[hit],
                           "supp": df["l_suppkey"].to_numpy(
                               np.int64)[hit],
                           "qty": qty[hit]})
             .groupby(["pkey", "supp"], as_index=False)
             .agg(qty=("qty", "sum")))
        g["bucket"] = g.pkey.to_numpy(np.int64) & (nb - 1)
        return g[["bucket", "pkey", "supp", "qty"]]

    def threshold_kern(g: pd.DataFrame) -> pd.DataFrame:
        sp = (g.groupby(["pkey", "supp"], as_index=False)
              .agg(qty=("qty", "sum")))
        tot = sp.groupby("pkey")["qty"].transform("sum")
        win = sp[2 * sp.qty > tot]
        return pd.DataFrame({
            "supp": np.unique(win.supp.to_numpy(np.int64))})

    df = (_read(sf_dir, "lineitem.parquet",
                columns=["l_partkey", "l_suppkey", "l_quantity"],
                filter=((pads.field("l_shipdate") >= Q20_D1)
                        & (pads.field("l_shipdate") < Q20_D2)))
          .map_batches(sp_partial, batch_format="pandas")
          .groupby("bucket").map_groups(threshold_kern,
                                        batch_format="pandas")
          ).to_pandas()
    if "supp" not in df.columns or not len(df):
        return pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "n_name": pa.array([], pa.string())})
    winners = np.unique(df.supp.to_numpy(np.int64))
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
        filters=[("s_suppkey", "in", [int(k) for k in winners]),
                 ("s_nationkey", "in", [int(k) for k in names])]
        ).to_pandas()
    supp["n_name"] = [names[int(n)] for n in supp.s_nationkey]
    supp = supp.sort_values(["s_name", "s_suppkey"],
                            ignore_index=True)
    return pa.table({
        "s_suppkey": pa.array(supp.s_suppkey.to_numpy(np.int64),
                              pa.int64()),
        "s_name": pa.array(supp.s_name.tolist(), pa.string()),
        "n_name": pa.array(supp.n_name.tolist(), pa.string()),
    })


def sql_excess_suppliers() -> str:
    return f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         sum(CAST(round(l_quantity, 0) AS BIGINT)) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%{Q20_WORD}%'
    AND l_shipdate >= TIMESTAMP '{Q20_D1:%Y-%m-%d}'
    AND l_shipdate < TIMESTAMP '{Q20_D2:%Y-%m-%d}'
  GROUP BY l_suppkey, l_partkey
), pq AS (
  SELECT l_partkey, sum(q) AS tot FROM sp GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM sp
JOIN pq USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE 2 * q > tot
ORDER BY s_name, s_suppkey
"""


# ---- Q12 shape: priority counts per shipping class ----
# (the schema has no l_shipmode/commitdate/receiptdate; Q12's CASE-
# counting essence maps onto shipping-DELAY classes instead)

Q12_D1 = datetime.datetime(1996, 1, 1)
Q12_D2 = datetime.datetime(1998, 1, 1)
Q12_FAST_DAYS = 30
Q12_REG_DAYS = 90
Q12_HIGH = ("1-URGENT", "2-HIGH")
_DAY_US = 86_400_000_000


@fmt_doc(d1=Q12_D1, d2=Q12_D2, f=Q12_FAST_DAYS, r=Q12_REG_DAYS)
def ship_delay_priority(sf_dir: str) -> pa.Table:
    """TPC-H-Q12-shaped priority audit: line counts of HIGH
    (1-URGENT/2-HIGH) vs other orders per shipping class — FAST
    (shipped within {f} days of the order), REGULAR (within {r}),
    SLOW (later) — over {d1:%Y}..{d2:%Y} ship dates. (No l_shipmode
    in the schema; the delay class plays Q12's mode role while
    keeping its CASE-counting aggregate exactly.)

    Shape: the ship window pushes into the lineitem read; the delay
    needs each line's shipdate AGAINST its order's date, so orders
    emit (okey, odate, is_high) rows and lineitem collapses map-side
    to per-(okey, ship_day) line counts — the exchange carries
    day-collapsed partials, never raw lines. ONE orderkey-bucketed
    exchange joins the sides and classifies (floor-day difference ==
    DuckDB date_diff('day') for any timestamps, midnight-aligned or
    not, because both count midnight boundaries); the final aggregate
    is 3x2-cardinality."""
    import pyarrow.dataset as pads

    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        od = _epoch_us(df["o_orderdate"])
        hi = df["o_orderpriority"].isin(Q12_HIGH).to_numpy()
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok, "odate_us": od,
            "high": hi.astype(np.int64), "ship_day": np.int64(-1),
            "side": np.int64(0), "nl": np.int64(0)})

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        sday = _epoch_us(df["l_shipdate"]) // _DAY_US
        g = (pd.DataFrame({"okey": ok, "ship_day": sday})
             .groupby(["okey", "ship_day"], as_index=False)
             .agg(nl=("ship_day", "size")))
        g["nl"] = g["nl"].astype(np.int64)
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        odate_us=np.int64(-1), high=np.int64(0),
                        side=np.int64(1))[
            ["bucket", "okey", "odate_us", "high", "ship_day",
             "side", "nl"]]

    def class_kern(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g.side == 0][["okey", "odate_us", "high"]]
        li = (g[g.side == 1]
              .groupby(["okey", "ship_day"], as_index=False)
              .agg(nl=("nl", "sum")))
        j = li.merge(o, on="okey", how="inner")
        delay = (j.ship_day.to_numpy(np.int64)
                 - j.odate_us.to_numpy(np.int64) // _DAY_US)
        cls = np.where(delay <= Q12_FAST_DAYS, "FAST",
                       np.where(delay <= Q12_REG_DAYS,
                                "REGULAR", "SLOW"))
        hi = j.high.to_numpy(np.int64)
        nl = j.nl.to_numpy(np.int64)
        return (pd.DataFrame({"ship_class": cls,
                              "hi": hi * nl, "lo": (1 - hi) * nl})
                .groupby("ship_class", as_index=False)
                .agg(hi=("hi", "sum"), lo=("lo", "sum")))

    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]
                   ).map_batches(o_rows, batch_format="pandas")
    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_shipdate"],
               filter=((pads.field("l_shipdate") >= Q12_D1)
                       & (pads.field("l_shipdate") < Q12_D2))
               ).map_batches(l_partial, batch_format="pandas")
    df = (orders.union(li)
          .groupby("bucket").map_groups(class_kern,
                                        batch_format="pandas")
          .groupby("ship_class").aggregate(
              Sum("hi", alias_name="high_line_count"),
              Sum("lo", alias_name="low_line_count"))).to_pandas()
    if "ship_class" not in df.columns or not len(df):
        return pa.table({
            "ship_class": pa.array([], pa.string()),
            "high_line_count": pa.array([], pa.int64()),
            "low_line_count": pa.array([], pa.int64())})
    df = df.sort_values("ship_class", ignore_index=True)
    return pa.table({
        "ship_class": pa.array(df.ship_class.tolist(), pa.string()),
        "high_line_count": pa.array(
            df.high_line_count.to_numpy(np.int64), pa.int64()),
        "low_line_count": pa.array(
            df.low_line_count.to_numpy(np.int64), pa.int64()),
    })


def sql_ship_delay_priority() -> str:
    hi = ", ".join(f"'{p}'" for p in Q12_HIGH)
    return f"""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                 <= {Q12_FAST_DAYS} THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate)
                 <= {Q12_REG_DAYS} THEN 'REGULAR'
            ELSE 'SLOW' END AS ship_class,
       sum(CASE WHEN o_orderpriority IN ({hi})
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ({hi})
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_D1:%Y-%m-%d}'
  AND l_shipdate < TIMESTAMP '{Q12_D2:%Y-%m-%d}'
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "returned_item_customers": returned_item_customers,
    "ship_delay_priority": ship_delay_priority,
    "nation_trade_volume": nation_trade_volume,
    "small_qty_revenue": small_qty_revenue,
    "disjunct_revenue": disjunct_revenue,
    "sole_late_supplier": sole_late_supplier,
    "forecast_revenue": forecast_revenue,
    "min_cost_supplier": min_cost_supplier,
    "important_parts": important_parts,
    "fk_integrity": fk_integrity,
    "market_share": market_share,
    "product_profit": product_profit,
    "shipping_priority": shipping_priority,
    "part_supplier_breadth": part_supplier_breadth,
    "excess_suppliers": excess_suppliers,
}

ORACLE_SQL = {
    "returned_item_customers": sql_returned_item_customers(),
    "ship_delay_priority": sql_ship_delay_priority(),
    "nation_trade_volume": sql_nation_trade_volume(),
    "small_qty_revenue": sql_small_qty_revenue(),
    "disjunct_revenue": sql_disjunct_revenue(),
    "sole_late_supplier": sql_sole_late_supplier(),
    "forecast_revenue": sql_forecast_revenue(),
    "min_cost_supplier": sql_min_cost_supplier(),
    "important_parts": sql_important_parts(),
    "fk_integrity": sql_fk_integrity(),
    "market_share": sql_market_share(),
    "product_profit": sql_product_profit(),
    "shipping_priority": sql_shipping_priority(),
    "part_supplier_breadth": sql_part_supplier_breadth(),
    "excess_suppliers": sql_excess_suppliers(),
}
