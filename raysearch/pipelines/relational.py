"""TPC-H-shaped relational operators over the star-schema tables the
earlier waves left untouched (supplier, part, region): a 6-table
co-located-nation join (Q5 shape), a HAVING-filtered fact-fact join
with global top-k (Q18 shape), a broadcast dimension-classify share
(Q14 shape), and a distributed ANTI join (Q22 shape, churn framing).

The reference engine has no relational layer at all (its only wide op
is the index HashMap, src/lib.rs:341); these extend the engine the
same way joins.py does, reusing its exchange patterns:

- Fact-fact joins (lineitem x orders) bucket BOTH sides by orderkey
  hash-mask (auto-sized via hashing.auto_buckets) after map-side
  pre-aggregation — the exchange carries per-key partials, never raw
  fact rows.
- Dimension sides (supplier, part, customer key->attr maps) broadcast
  once via ray.put as sorted numpy arrays (zero-copy ray.get per
  batch) under JOIN_BROADCAST_CAP, with a HARD raise above it naming
  the bucketed-shuffle alternative (revenue_by_nation's >cap path) —
  the same budget rule as joins.top_unshipped_orders.
- Money stays in exact int64 cents / c4 units end-to-end, and the
  Q22 above-average threshold is an INTEGER cross-multiplication
  (cents * n_customers > sum_cents) — no float division anywhere a
  value-hash could see.
- Date predicates push into the parquet reads (row-group pruning).

Partitioning assumptions: a single orderkey's lineitems always fit
one reduce group (bounded by lines-per-order, a schema constant);
nation/region are O(100) rows and drive driver-side name attachment
only.
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.numutil import fmt_doc
from raysearch.pipelines.joins import (
    JOIN_BROADCAST_CAP,
    _cents,
    _epoch_us,
    _half_away,
    _n_rows,
    _read,
    _sorted_hits,
)

# ---- Q5 shape: local supplier volume ----

Q5_REGION = "ASIA"
Q5_D1 = datetime.datetime(1996, 1, 1)
Q5_D2 = datetime.datetime(1997, 1, 1)

# ---- Q18 shape: large-volume orders ----

Q18_QTY = 250
Q18_K = 20

# ---- Q14 shape: promo revenue share ----

Q14_D1 = datetime.datetime(1996, 3, 1)
Q14_D2 = datetime.datetime(1996, 4, 1)
Q14_PROMO = "PROMO"

# ---- Q22 shape: churned above-average customers ----

Q22_CUTOFF = datetime.datetime(1999, 1, 1)


def _broadcast_dim(sf_dir: str, table: str, key_col: str, val_col: str,
                   filters=None, val_fn=None):
    """Read a dimension's (key -> int value) map driver-side, sort by
    key, ray.put once. Hard-raises above JOIN_BROADCAST_CAP (checked
    against the UNFILTERED footer count, before any read) — the >cap
    implementation is the bucketed-shuffle join, not a silent
    driver-side blowup. ``val_fn`` derives the int64 values from the
    raw value column (default: numeric cast) — the ONE place the cap
    rule lives for every broadcast dimension in this module."""
    import pyarrow.parquet as pq
    import ray

    n = _n_rows(sf_dir, table)
    if n > JOIN_BROADCAST_CAP:
        raise ValueError(
            f"{table} ({n} rows) exceeds the broadcast cap; use the "
            "bucketed-shuffle join (joins.revenue_by_nation's >cap "
            "path) for this dimension")
    t = pq.read_table(os.path.join(sf_dir, table),
                      columns=[key_col, val_col], filters=filters)
    k = t[key_col].to_numpy().astype(np.int64)
    v = (val_fn(t[val_col]) if val_fn is not None
         else t[val_col].to_numpy().astype(np.int64))
    order = np.argsort(k)
    return ray.put((k[order], v[order]))


def _lookup(keys: np.ndarray, ref) -> tuple[np.ndarray, np.ndarray]:
    """searchsorted join against a broadcast (sorted keys, values)
    pair: returns (hit mask, values for hits)."""
    import ray

    ks, vs = ray.get(ref)  # zero-copy numpy views
    hit, pos = _sorted_hits(ks, keys)
    return hit, vs[pos]


def _region_nations(sf_dir: str, region_name: str | None = None
                    ) -> tuple[np.ndarray, dict[int, str]]:
    """nationkeys inside ``region_name`` (default Q5_REGION) + the
    full key->name map (nation and region are O(100) rows —
    driver-side by design). The ONE region-membership helper, shared
    with relational_ext (Q8)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rk = {r["r_name"]: r["r_regionkey"]
          for r in region.to_pylist()}[region_name or Q5_REGION]
    nk = nation["n_nationkey"].to_numpy().astype(np.int64)
    reg = nation["n_regionkey"].to_numpy().astype(np.int64)
    names = dict(zip(nk.tolist(), nation["n_name"].to_pylist()))
    return np.sort(nk[reg == rk]), names


@fmt_doc(reg=Q5_REGION)
def local_supplier_volume(sf_dir: str) -> pa.Table:
    """TPC-H-Q5-shaped local supplier volume: revenue per nation from
    1996 orders where the customer and the lineitem's supplier sit in
    the SAME nation of region {reg} — the canonical 6-table join.

    Shape: nation/region resolve driver-side (O(100) rows); customer
    (custkey->nationkey) and supplier (suppkey->nationkey) broadcast
    once as sorted numpy arrays. The two FACT sides meet in ONE
    orderkey-bucketed exchange: orders (window-filtered at the read)
    emit (okey, cust_nation) rows for in-region customers only;
    lineitem batches resolve the supplier nation locally and
    pre-aggregate (okey, supp_nation) c4 partials map-side. The
    per-bucket kernel equi-joins on okey, keeps cust_nation ==
    supp_nation, and emits per-nation partials; the final exchange is
    nation-cardinality. Revenue is exact int64 c4."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets

    region_nk, names = _region_nations(sf_dir)
    cust_ref = _broadcast_dim(sf_dir, "customer.parquet",
                              "c_custkey", "c_nationkey")
    supp_ref = _broadcast_dim(sf_dir, "supplier.parquet",
                              "s_suppkey", "s_nationkey")
    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        hit, nat = _lookup(df["o_custkey"].to_numpy(np.int64), cust_ref)
        ok = ok[hit]
        in_reg = np.isin(nat, region_nk)
        ok, nat = ok[in_reg], nat[in_reg]
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok, "nat": nat,
            "side": np.int64(0), "nl": np.int64(0), "c4": np.int64(0)})

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        hit, nat = _lookup(df["l_suppkey"].to_numpy(np.int64), supp_ref)
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        c4 = cents * (100 - disc)
        ok, c4 = ok[hit], c4[hit]
        in_reg = np.isin(nat, region_nk)
        g = (pd.DataFrame({"okey": ok[in_reg], "nat": nat[in_reg],
                           "c4": c4[in_reg]})
             .groupby(["okey", "nat"], as_index=False)
             .agg(nl=("c4", "size"), c4=("c4", "sum")))
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        side=np.int64(1))[
            ["bucket", "okey", "nat", "side", "nl", "c4"]]

    def join_kern(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g.side == 0][["okey", "nat"]]
        li = (g[g.side == 1]
              .groupby(["okey", "nat"], as_index=False)
              .agg(nl=("nl", "sum"), c4=("c4", "sum")))
        j = o.merge(li, on=["okey", "nat"], how="inner")
        return (j.groupby("nat", as_index=False)
                .agg(nl=("nl", "sum"), c4=("c4", "sum")))

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=((pads.field("o_orderdate") >= Q5_D1)
                           & (pads.field("o_orderdate") < Q5_D2))
                   ).map_batches(o_rows, batch_format="pandas")
    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]
               ).map_batches(l_partial, batch_format="pandas")
    agg = (orders.union(li)
           .groupby("bucket").map_groups(join_kern,
                                         batch_format="pandas")
           .groupby("nat").aggregate(Sum("nl", alias_name="n_lines"),
                                     Sum("c4",
                                         alias_name="revenue_c4")))
    df = agg.to_pandas()
    if "nat" not in df.columns:  # zero groups ran (empty join result)
        df = pd.DataFrame({c: np.array([], dtype=np.int64)
                           for c in ("nat", "n_lines", "revenue_c4")})
    df["n_name"] = df.nat.map(names)
    df = df.sort_values(["revenue_c4", "n_name"],
                        ascending=[False, True], ignore_index=True)
    return pa.table({
        "n_name": pa.array(df.n_name.tolist(), pa.string()),
        "n_lines": pa.array(df.n_lines.to_numpy(np.int64), pa.int64()),
        "revenue_c4": pa.array(df.revenue_c4.to_numpy(np.int64),
                               pa.int64()),
    })


def sql_local_supplier_volume() -> str:
    return f"""
SELECT n_name, count(*)::BIGINT AS n_lines,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))::BIGINT
         AS revenue_c4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND s_nationkey = c_nationkey
  AND o_orderdate >= TIMESTAMP '{Q5_D1:%Y-%m-%d}'
  AND o_orderdate < TIMESTAMP '{Q5_D2:%Y-%m-%d}'
GROUP BY n_name
ORDER BY revenue_c4 DESC, n_name
"""


@fmt_doc(k=Q18_K, qty=Q18_QTY)
def big_orders(sf_dir: str) -> pa.Table:
    """TPC-H-Q18-shaped large-volume orders: the {k} orders with the
    largest o_totalprice among those whose lineitem quantity sum
    exceeds {qty} — the HAVING-filtered fact-fact join.

    Shape: lineitem collapses map-side to per-orderkey quantity-sum
    partials (exact int64 — quantities are integral); both sides meet
    in ONE orderkey-bucketed exchange; the kernel finishes the sum,
    applies HAVING > {qty}, joins the order attributes, and emits only
    its local top-{k} under (total_cents DESC, orderdate, orderkey) —
    the driver merges n_buckets x {k} rows, never the joined table
    (same k-bounded merge as joins.top_unshipped_orders)."""
    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_rows(sf_dir, "orders.parquet"))

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
                "okey": df["l_orderkey"].to_numpy(np.int64),
                "qty": _half_away(df["l_quantity"].to_numpy(np.float64))})
             .groupby("okey", as_index=False).agg(qty=("qty", "sum")))
        return g.assign(bucket=g.okey.to_numpy() & (nb - 1),
                        side=np.int64(0), custkey=np.int64(0),
                        date_us=np.int64(0), cents=np.int64(0))[
            ["bucket", "okey", "side", "custkey", "date_us", "cents",
             "qty"]]

    def o_rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": ok & (nb - 1), "okey": ok, "side": np.int64(1),
            "custkey": df["o_custkey"].to_numpy(np.int64),
            "date_us": _epoch_us(df["o_orderdate"]),
            "cents": _cents(df["o_totalprice"].to_numpy(np.float64)),
            "qty": np.int64(0)})

    def topk_kern(g: pd.DataFrame) -> pd.DataFrame:
        li = (g[g.side == 0].groupby("okey", as_index=False)
              .agg(qty=("qty", "sum")))
        li = li[li.qty > Q18_QTY]
        o = g[g.side == 1][["okey", "custkey", "date_us", "cents"]]
        j = o.merge(li, on="okey", how="inner")
        return j.sort_values(["cents", "date_us", "okey"],
                             ascending=[False, True, True]).head(Q18_K)

    li = _read(sf_dir, "lineitem.parquet",
               columns=["l_orderkey", "l_quantity"]).map_batches(
        l_partial, batch_format="pandas")
    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"]).map_batches(
        o_rows, batch_format="pandas")
    out = (li.union(orders)
           .groupby("bucket").map_groups(topk_kern,
                                         batch_format="pandas"))
    df = out.to_pandas()
    if "okey" not in df.columns:  # zero groups ran (empty input)
        df = pd.DataFrame({c: np.array([], dtype=np.int64) for c in
                           ("okey", "custkey", "date_us", "cents",
                            "qty")})
    df = df.sort_values(["cents", "date_us", "okey"],
                        ascending=[False, True, True]).head(Q18_K)
    return pa.table({
        "o_orderkey": pa.array(df.okey.to_numpy(np.int64), pa.int64()),
        "o_custkey": pa.array(df.custkey.to_numpy(np.int64),
                              pa.int64()),
        "orderdate_us": pa.array(df.date_us.to_numpy(np.int64),
                                 pa.int64()),
        "total_cents": pa.array(df.cents.to_numpy(np.int64),
                                pa.int64()),
        "sum_qty": pa.array(df.qty.to_numpy(np.int64), pa.int64()),
    })


def sql_big_orders() -> str:
    return f"""
SELECT o_orderkey, o_custkey,
       epoch_us(o_orderdate)::BIGINT AS orderdate_us,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
       sum(CAST(round(l_quantity, 0) AS BIGINT))::BIGINT AS sum_qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY 1, 2, 3, 4
HAVING sum_qty > {Q18_QTY}
ORDER BY total_cents DESC, orderdate_us, o_orderkey
LIMIT {Q18_K}
"""


@fmt_doc(d1=Q14_D1, promo=Q14_PROMO)
def promo_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q14-shaped promo revenue share for {d1:%Y-%m}: of the c4
    revenue shipped that month, the fraction from parts of type
    '{promo}'. Part (partkey -> is_promo) broadcasts once; lineitem is
    month-filtered AT THE READ; per-batch int partials reduce through
    Ray's aggregate — no wide exchange at all. promo_share_pct =
    round6(100 * promo / total) is the only float, computed after the
    exact integer sums on both engine and oracle."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    from raysearch.numutil import round6

    dim_ref = _broadcast_dim(
        sf_dir, "part.parquet", "p_partkey", "p_type",
        val_fn=lambda col: (np.asarray(col.to_pylist(), dtype=object)
                            == Q14_PROMO).astype(np.int64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hit, is_promo = _lookup(df["l_partkey"].to_numpy(np.int64),
                                dim_ref)
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        c4 = (cents * (100 - disc))[hit]
        return pd.DataFrame({
            "promo_c4": [int((c4 * is_promo).sum())],
            "total_c4": [int(c4.sum())]})

    ds = _read(sf_dir, "lineitem.parquet",
               columns=["l_partkey", "l_extendedprice", "l_discount"],
               filter=((pads.field("l_shipdate") >= Q14_D1)
                       & (pads.field("l_shipdate") < Q14_D2))
               ).map_batches(partial, batch_format="pandas")
    agg = ds.aggregate(Sum("promo_c4", alias_name="promo_c4"),
                       Sum("total_c4", alias_name="total_c4"))
    p, t = int(agg["promo_c4"] or 0), int(agg["total_c4"] or 0)
    share = round6(100.0 * p / t) if t else 0.0
    return pa.table({
        "promo_c4": pa.array([p], pa.int64()),
        "total_c4": pa.array([t], pa.int64()),
        "promo_share_pct": pa.array([share], pa.float64()),
    })


def sql_promo_revenue() -> str:
    return f"""
WITH m AS (
  SELECT sum(CASE WHEN p_type = '{Q14_PROMO}' THEN
               CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
             ELSE 0 END)::BIGINT AS promo_c4,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
             )::BIGINT AS total_c4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_D1:%Y-%m-%d}'
    AND l_shipdate < TIMESTAMP '{Q14_D2:%Y-%m-%d}'
)
SELECT promo_c4, total_c4,
       round(100.0 * promo_c4 / total_c4, 6) AS promo_share_pct
FROM m
"""


@fmt_doc(cut=Q22_CUTOFF)
def churned_customers(sf_dir: str) -> pa.Table:
    """TPC-H-Q22-shaped churn report, the distributed ANTI join:
    per nation, the count and total balance of customers whose
    account balance exceeds the positive-balance average but who
    placed NO order since {cut:%Y-%m-%d}.

    Two phases. Phase 1 computes the global mean as exact integers
    (count, cents sum) via one combiner pass — and the threshold
    compare is the integer cross-multiplication cents * n > sum_cents,
    so no float division exists on either engine. Phase 2 is the anti
    join: above-threshold customers and map-side-deduplicated recent
    orderer keys bucket by custkey hash-mask; the per-bucket kernel
    keeps customers with no match (np.isin against the group's order
    side) and emits per-nation partials. The exchange carries one row
    per above-threshold customer + one per (batch, distinct custkey) —
    never raw orders."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets

    # phase 1: exact integer moments of positive balances
    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["c_acctbal"].to_numpy(np.float64))
        pos = cents > 0
        return pd.DataFrame({"n": [int(pos.sum())],
                             "s": [int(cents[pos].sum())]})

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    stats = _read(sf_dir, "customer.parquet",
                  columns=["c_acctbal"]).map_batches(
        bal_partial, batch_format="pandas").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    n_pos, s_cents = int(stats["n"] or 0), int(stats["s"] or 0)

    nb = auto_buckets(_n_rows(sf_dir, "customer.parquet"))

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["c_custkey"].to_numpy(np.int64)
        cents = _cents(df["c_acctbal"].to_numpy(np.float64))
        keep = cents * n_pos > s_cents
        ck, cents = ck[keep], cents[keep]
        return pd.DataFrame({
            "bucket": ck & (nb - 1), "custkey": ck,
            "nationkey": df["c_nationkey"].to_numpy(np.int64)[keep],
            "cents": cents, "side": np.int64(0)})

    def o_keys(df: pd.DataFrame) -> pd.DataFrame:
        ck = np.unique(df["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "bucket": ck & (nb - 1), "custkey": ck,
            "nationkey": np.int64(-1), "cents": np.int64(0),
            "side": np.int64(1)})

    def anti_kern(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g.side == 0]
        active = g[g.side == 1].custkey.to_numpy()
        keep = ~np.isin(c.custkey.to_numpy(), active)
        kept = c[keep]
        return (kept.groupby("nationkey", as_index=False)
                .agg(n_cust=("cents", "size"), cents=("cents", "sum")))

    cust = _read(sf_dir, "customer.parquet",
                 columns=cust_cols).map_batches(
        c_rows, batch_format="pandas")
    orders = _read(sf_dir, "orders.parquet", columns=["o_custkey"],
                   filter=pads.field("o_orderdate") >= Q22_CUTOFF
                   ).map_batches(o_keys, batch_format="pandas")
    agg = (cust.union(orders)
           .groupby("bucket").map_groups(anti_kern,
                                         batch_format="pandas")
           .groupby("nationkey").aggregate(
               Sum("n_cust", alias_name="n_cust"),
               Sum("cents", alias_name="bal_cents")))
    df = agg.to_pandas()
    if "nationkey" not in df.columns:  # zero churned customers
        df = pd.DataFrame({c: np.array([], dtype=np.int64)
                           for c in ("nationkey", "n_cust", "bal_cents")})
    df = df.sort_values("nationkey", ignore_index=True)
    return pa.table({
        "c_nationkey": pa.array(df.nationkey.to_numpy(np.int64),
                                pa.int64()),
        "n_cust": pa.array(df.n_cust.to_numpy(np.int64), pa.int64()),
        "bal_cents": pa.array(df.bal_cents.to_numpy(np.int64),
                              pa.int64()),
    })


def sql_churned_customers() -> str:
    return f"""
WITH stats AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))::BIGINT AS s
  FROM customer WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) > 0
)
SELECT c_nationkey::BIGINT AS c_nationkey,
       count(*)::BIGINT AS n_cust,
       sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))::BIGINT
         AS bal_cents
FROM customer, stats
WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * stats.n > stats.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = customer.c_custkey
                    AND o.o_orderdate >= TIMESTAMP
                        '{Q22_CUTOFF:%Y-%m-%d}')
GROUP BY 1 ORDER BY 1
"""


# ---- Q13 shape: customer order-count distribution ----

def cust_order_dist(sf_dir: str) -> pa.Table:
    """TPC-H-Q13-shaped distribution: for each order count c, how many
    customers placed exactly c orders — INCLUDING zero-order customers
    (the LEFT OUTER join semantics most naive distributed joins drop).

    Shape: orders collapse map-side to per-custkey count partials;
    customers emit zero rows on the same custkey-bucket key, so the
    per-bucket kernel resolves the outer join locally (sum counts per
    custkey over the union — a customer with no order rows keeps its
    0). The second exchange is the count-cardinality histogram
    groupby of per-bucket partials. Raw orders never shuffle."""
    from ray.data.aggregate import Sum

    from raysearch.hashing import auto_buckets

    nb = auto_buckets(_n_rows(sf_dir, "customer.parquet"))

    def o_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"custkey": df["o_custkey"].to_numpy(np.int64)})
             .groupby("custkey", as_index=False)
             .agg(cnt=("custkey", "size")))
        g["cnt"] = g["cnt"].astype(np.int64)
        return g.assign(bucket=g.custkey.to_numpy() & (nb - 1),
                        side=np.int64(1))[
            ["bucket", "custkey", "cnt", "side"]]

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": ck & (nb - 1), "custkey": ck,
            "cnt": np.zeros(len(ck), np.int64), "side": np.int64(0)})

    def outer_kern(g: pd.DataFrame) -> pd.DataFrame:
        # keep only custkeys present on the CUSTOMER side (orders with
        # a dangling custkey don't mint a customer), then sum counts
        cust_keys = g[g.side == 0].custkey.to_numpy()
        tot = (g[np.isin(g.custkey.to_numpy(), cust_keys)]
               .groupby("custkey", as_index=False)
               .agg(c_count=("cnt", "sum")))
        return (tot.groupby("c_count", as_index=False)
                .agg(custdist=("custkey", "size")))

    orders = _read(sf_dir, "orders.parquet",
                   columns=["o_custkey"]).map_batches(
        o_partial, batch_format="pandas")
    cust = _read(sf_dir, "customer.parquet",
                 columns=["c_custkey"]).map_batches(
        c_rows, batch_format="pandas")
    agg = (orders.union(cust)
           .groupby("bucket").map_groups(outer_kern,
                                         batch_format="pandas")
           .groupby("c_count").aggregate(
               Sum("custdist", alias_name="custdist")))
    df = agg.to_pandas()
    if "c_count" not in df.columns:  # empty input
        df = pd.DataFrame({"c_count": np.array([], np.int64),
                           "custdist": np.array([], np.int64)})
    df = df.sort_values(["custdist", "c_count"],
                        ascending=[False, False], ignore_index=True)
    return pa.table({
        "c_count": pa.array(df.c_count.to_numpy(np.int64), pa.int64()),
        "custdist": pa.array(df.custdist.to_numpy(np.int64),
                             pa.int64()),
    })


def sql_cust_order_dist() -> str:
    return """
SELECT c_count::BIGINT AS c_count, count(*)::BIGINT AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ---- Q15 shape: top supplier(s) by quarterly revenue ----

Q15_D1 = datetime.datetime(1996, 1, 1)
Q15_D2 = datetime.datetime(1996, 4, 1)


@fmt_doc(d1=Q15_D1, d2=Q15_D2)
def top_suppliers(sf_dir: str) -> pa.Table:
    """TPC-H-Q15-shaped top supplier: the supplier(s) whose
    {d1:%Y-%m}–{d2:%Y-%m} shipped revenue equals the maximum — the
    argmax-with-ties pattern (every tied supplier is returned, exactly
    like the reference query's revenue = max(total_revenue) subquery).

    Shape: lineitem window-filtered AT THE READ collapses map-side to
    per-suppkey c4 partials; a coarse supplier-bucket kernel finishes
    the per-supplier sums exactly (int64 c4, so the max compare can
    never be perturbed by float summation order); the driver takes
    max + ties over the supplier-cardinality table and name-joins the
    (tiny) supplier dimension."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from raysearch.hashing import auto_buckets

    nbs = auto_buckets(_n_rows(sf_dir, "supplier.parquet"))

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df["l_extendedprice"].to_numpy(np.float64))
        disc = _half_away(df["l_discount"].to_numpy(np.float64) * 100.0)
        g = (pd.DataFrame({
                 "suppkey": df["l_suppkey"].to_numpy(np.int64),
                 "c4": cents * (100 - disc)})
             .groupby("suppkey", as_index=False)
             .agg(c4=("c4", "sum")))
        g["sbucket"] = g.suppkey.to_numpy(np.int64) & (nbs - 1)
        return g

    # per-supplier totals in a coarse supplier-bucket kernel
    # (buckets partition suppkeys -> in-group sums final) rather
    # than a high-cardinality Ray sort-aggregate (per-group
    # dispatch cost; see dedup._cross_doc_slot_dup)
    def supp_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("suppkey", as_index=False).agg(
            revenue_c4=("c4", "sum"))

    agg = (_read(sf_dir, "lineitem.parquet",
                 columns=["l_suppkey", "l_extendedprice", "l_discount"],
                 filter=((pads.field("l_shipdate") >= Q15_D1)
                         & (pads.field("l_shipdate") < Q15_D2)))
           .map_batches(l_partial, batch_format="pandas")
           .groupby("sbucket").map_groups(supp_sum,
                                          batch_format="pandas"))
    df = agg.to_pandas()
    if "suppkey" not in df.columns or not len(df):
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "revenue_c4": pa.array([], pa.int64())})
    top = df[df.revenue_c4 == df.revenue_c4.max()]
    # name-join only the tied winners: a key-filtered read (row-group
    # pruned), never the whole supplier dimension on the driver — the
    # same dimension-budget rule as _broadcast_dim
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in",
                  [int(k) for k in top.suppkey])]).to_pandas()
    j = (top.merge(supp, left_on="suppkey", right_on="s_suppkey")
         .sort_values("s_suppkey", ignore_index=True))
    return pa.table({
        "s_suppkey": pa.array(j.s_suppkey.to_numpy(np.int64),
                              pa.int64()),
        "s_name": pa.array(j.s_name.tolist(), pa.string()),
        "revenue_c4": pa.array(j.revenue_c4.to_numpy(np.int64),
                               pa.int64()),
    })


def sql_top_suppliers() -> str:
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
             )::BIGINT AS revenue_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_D1:%Y-%m-%d}'
    AND l_shipdate < TIMESTAMP '{Q15_D2:%Y-%m-%d}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, revenue_c4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue_c4 = (SELECT max(revenue_c4) FROM rev)
ORDER BY s_suppkey
"""


QUERIES = {
    "local_supplier_volume": local_supplier_volume,
    "big_orders": big_orders,
    "promo_revenue": promo_revenue,
    "churned_customers": churned_customers,
    "cust_order_dist": cust_order_dist,
    "top_suppliers": top_suppliers,
}

ORACLE_SQL = {
    "local_supplier_volume": sql_local_supplier_volume(),
    "big_orders": sql_big_orders(),
    "promo_revenue": sql_promo_revenue(),
    "churned_customers": sql_churned_customers(),
    "cust_order_dist": sql_cust_order_dist(),
    "top_suppliers": sql_top_suppliers(),
}
