"""Randomized operator parity: seeded-random documents/events tables
(written as MULTI-FILE parquet so cross-batch dedup/merge paths are
exercised) run through the oracle-checked pipeline operators and
compared against their DuckDB oracles. Breadth armor beyond the fixed
sf fixtures — different seeds shift key skew, tie patterns, window
alignment, language balance, and text shape; the generators plant the
edges the ops care about (duplicate timestamps, exact window
boundaries, empty/whitespace/unicode docs, cross-file duplicate rows,
PII strings, duplicate lines)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# --- generators -----------------------------------------------------

_WORDS = ("data ray engine index search query batch shuffle stream "
          "block actor arrow table group sort merge spill token term "
          "the a of and to in Deduplicate Pipeline CLUSTER muster").split()
_EXTRA = ["naïve", "café", "日本語テスト", "🎉party", "x1,y2;z3!", "3.14",
          "user@example.com", "call 555-123-4567 now", "ip 10.0.0.1 here"]


def _gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    vocab = _WORDS + _EXTRA
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 40))
        toks = list(rng.choice(vocab, size=k))
        if k and rng.random() < 0.3:          # duplicate lines (rep_signals)
            line = " ".join(toks[: max(1, k // 3)])
            t = line + "\n" + " ".join(toks) + "\n" + line
        else:
            t = " ".join(toks)
        if rng.random() < 0.05:
            t = "  " + t.replace(" ", "  ", 1)   # edge/double whitespace
        if rng.random() < 0.03:
            t = ""                               # empty docs
        texts.append(t)
    # cross-row exact duplicates for the dedup family
    for _ in range(n // 20):
        a, b = rng.integers(0, n, size=2)
        texts[int(a)] = texts[int(b)]
    langs = rng.choice(["en", "de", "fr", "ja"], size=n,
                       p=[0.55, 0.25, 0.15, 0.05])
    srcs = rng.choice([f"https://s{i}.example/x" for i in range(7)], size=n)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array(langs.tolist()),
        "source": pa.array(srcs.tolist()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    half_hour_us = 1_800_000_000
    base = 1_700_000_000_000_000
    users = (rng.pareto(1.1, size=n) * 40).astype(np.int64) % 150
    ts = base + rng.integers(0, 60 * 48, size=n) * half_hour_us \
        + rng.integers(0, half_hour_us, size=n)
    snap = rng.random(n) < 0.15               # exact window boundaries
    ts[snap] = base + (ts[snap] - base) // half_hour_us * half_hour_us
    dup = rng.random(n) < 0.08                # duplicate timestamps (ties)
    ts[dup] = ts[(np.nonzero(dup)[0] * 7) % n]
    types = rng.choice(["click", "view", "purchase", "scroll"], size=n,
                       p=[0.45, 0.35, 0.1, 0.1])
    value = rng.integers(0, 100_000, size=n) / 100.0   # exact 2-decimal
    # varied props JSON: integer k (incl. negatives), k beside other
    # fields, a DIFFERENT key, floats-after-k, and empty objects —
    # exercises props_stats' regex extraction on both match shapes
    kv = rng.integers(-50, 500, size=n)
    sel = rng.random(n)
    props = [('{"k": %d}' % kv[i]) if sel[i] < 0.35 else
             ('{"k" : %d, "m": "x%d"}' % (kv[i], i % 7))
             if sel[i] < 0.5 else
             ('{"other": %d}' % kv[i]) if sel[i] < 0.7 else
             ('{"kk": 1, "f": 2.5}') if sel[i] < 0.8 else "{}"
             for i in range(n)]
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(types.tolist()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(props),
    })


def _write_sharded(tbl: pa.Table, out_dir: str, n_files: int,
                   rng: np.random.Generator) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # shuffle rows so files are NOT key-ranged (unsorted-input armor),
    # then duplicate a slice across two files (cross-file dup armor)
    perm = rng.permutation(tbl.num_rows)
    tbl = tbl.take(pa.array(perm))
    cuts = np.linspace(0, tbl.num_rows, n_files + 1).astype(int)
    for i in range(n_files):
        part = tbl.slice(cuts[i], cuts[i + 1] - cuts[i])
        pq.write_table(part, os.path.join(out_dir, f"part-{i}.parquet"))


_DOC_OPS = ["doc_lengths", "token_counts", "quality_score", "lang_id",
            "rep_signals", "rep_ngram_signals", "gopher_filters", "c4_filters",
            "para_dedup", "dup_spans",
            "dedup_exact",
            "fingerprint", "dedup_simhash",
            "source_stats", "lang_source_rollup", "mix_weights", "doclen_histogram",
            "doclen_ntile",
            "normalize_text", "pii_scrub", "stratified_sample", "lang_confusion",
            "script_stats",
            "heavy_hitters", "grouped_topk", "sample_split", "mix_sample",
            "bpe_merges", "bpe_encode", "shuffle_positions",
            "nb_lang_eval", "slop_topk", "boosted_topk",
            # round-5 session-3 ops: retrieval extensions, derived
            # indexes (passages, trigrams), eval + IO round trips
            "dismax_topk", "fuzzy_topk", "maxp_topk", "ndcg_eval",
            "negated_topk", "best_passage_topk", "spanfirst_topk",
            "ltr_features", "percolate_docs", "regex_trigram_docs",
            "csv_roundtrip",
            # round-5 session-2 ops enrolled retroactively
            "filtered_topk", "rm3_topk", "rescore_topk",
            "collapse_topk", "query_hit_counts", "msm_topk",
            "explain_topk", "scorer_agreement", "hit_positions_topk",
            "jsonl_roundtrip", "pmi_pairs", "pmi_window_pairs",
            # full doc-table sweep: every remaining oracle-backed op
            # whose only input is the documents table
            "bm25_topk", "overlap_topk", "dirichlet_topk",
            "phrase_topk", "near_topk", "synonym_topk", "paged_topk",
            "facet_counts", "highlight_topk", "snippet_topk",
            "snippet_lines_topk", "more_like_this", "term_suggest",
            "wildcard_docs", "spellfix_topk", "blocklist_docs",
            "bool_and_docs", "postings", "term_stats",
            "collection_stats", "doc_entropy", "zipf_slope",
            "phrase_counts", "pmi_top_bigrams", "top_terms_tfidf",
            "clean_corpus", "clean_pipeline", "dedup_minhash",
            "ngram_jaccard", "simhash_pairs", "winnow_fingerprints",
            "winnow_pairs", "decontaminate", "dsir_weights",
            "dsir_resample", "bigram_logprob", "trigram_logprob",
            "perplexity_buckets", "pack_offsets", "split_leakage",
            "dedup_keep_best", "export_by_lang", "prefix_topk",
            "sig_terms_topk", "source_vocab_overlap", "source_term_kl",
            # index-lifecycle entries (append/delete/compact their own
            # derived indexes under /tmp, keyed by corpus fingerprint)
            "appended_topk", "deleted_topk", "compacted_topk",
            "dup_clusters", "impact_topk",
            # round-5 session-5 ops
            "span_not_topk", "common_terms_topk", "map_mrr_eval",
            "index_diff_stats", "subtoken_stats",
            "range_facet_counts", "terms_agg_topk",
            "classic_topk", "decay_topk",
            "time_travel_topk", "qpp_stats", "multifield_topk",
            "sorted_topk", "phrase_suggest", "jm_topk",
            "dfr_topk", "boolean_topk", "dup_rate_by_source",
            # round-5 session-7 ops
            "federated_topk", "dsl_topk", "completion_suggest",
            "sayt_topk", "trec_run_export", "dfi_topk",
            "interval_topk", "axiomatic_topk", "merged_topk",
            # round-5 session-8 ops
            "grep_lines", "term_vectors_topk", "rare_bigrams",
            "demote_topk", "adjacency_matrix", "rank_feature_topk",
            "composite_agg", "string_stats", "blockjoin_topk",
            "phrase_prefix_topk", "ipc_roundtrip", "split_oov_rate",
            "pool_depth_k", "percolate_scored", "generation_drift"]
_EVT_OPS = ["events_window", "events_hopping", "user_sessions",
            "session_funnel", "rolling_active_users", "cohort_retention",
            "event_quantiles", "value_histogram", "event_anomalies",
            "distinct_users", "window_top_events", "asof_join",
            "running_user_value", "event_transitions",
            "range_join_events", "latest_events", "winsor_stats",
            "user_paths", "user_daily_fill", "props_stats",
            # round-5 session-8 ops
            "events_pipeline_agg", "percentile_ranks", "top_metrics",
            "value_ttest"]
_SEEDS = [1117, 2223]


@pytest.fixture(scope="module", params=_SEEDS, ids=lambda s: f"seed{s}")
def rand_dir(request, tmp_path_factory):
    seed = request.param
    rng = np.random.default_rng(seed)
    d = tmp_path_factory.mktemp(f"rand{seed}")
    _write_sharded(_gen_documents(rng, 1500),
                   str(d / "documents.parquet"), 3, rng)
    _write_sharded(_gen_events(rng, 6000),
                   str(d / "events.parquet"), 3, rng)
    return str(d)


@pytest.fixture(scope="module")
def rand_con(rand_dir):
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{rand_dir}/{t}.parquet/*.parquet')")
    yield c
    c.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def _to_pandas(res) -> pd.DataFrame:
    import ray.data
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    raise TypeError(type(res))


@pytest.mark.parametrize("name", _DOC_OPS + _EVT_OPS)
def test_random_table_parity(ray_session, rand_dir, rand_con, name):
    import __ray_entry__ as entry
    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    engine = _normalize(_to_pandas(q(rand_dir)))
    oracle = _normalize(rand_con.execute(sql).df())
    assert list(engine.columns) == list(oracle.columns), \
        f"{name}: columns {list(engine.columns)} != {list(oracle.columns)}"
    assert len(engine) == len(oracle), \
        f"{name}: rows {len(engine)} != {len(oracle)}"
    pd.testing.assert_frame_equal(engine, oracle, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1.0e-6)


# --- randomized TPC-H-shaped tables for the relational operators ----

def _gen_tpch(rng: np.random.Generator, n_orders: int, n_lines: int):
    from raysearch.pipelines import joins as J

    region = pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int64)),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"]),
    })
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(10, dtype=np.int64)),
        "n_name": pa.array([f"NATION_{i}" for i in range(10)]),
        "n_regionkey": pa.array(
            (np.arange(10) % 5).astype(np.int64)),
    })
    n_cust = 60
    # plant one FK-violating nationkey on each dimension: the oracles'
    # JOIN nation silently drops those rows, and the engines must
    # match (not crash at the driver-side name attach)
    c_nat = rng.integers(0, 10, n_cust).astype(np.int64)
    c_nat[7] = 99
    customer = pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        # 'c<i>' names make dist-1 pairs dense (c1/c2, c10/c20, ...)
        "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(c_nat),
        # nonzero balances straddling the positive-mean threshold
        "c_acctbal": pa.array(
            rng.integers(-100_000, 1_000_000, n_cust) / 100.0),
        "c_mktsegment": pa.array(
            rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"],
                       n_cust, p=[0.5, 0.3, 0.2]).tolist()),
    })
    n_supp, n_part = 20, 40
    s_nat = rng.integers(0, 10, n_supp).astype(np.int64)
    s_nat[3] = 98   # FK-violating supplier nationkey (see above)
    supplier = pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"s{i}" for i in range(n_supp)]),
        "s_nationkey": pa.array(s_nat),
        # straddles Q16's 2000.0 exclusion threshold
        "s_acctbal": pa.array(
            rng.integers(-100_000, 500_000, n_supp) / 100.0),
    })
    part = pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        # 'widget' substring present so the Q9/Q20 name filters bite
        "p_name": pa.array(
            [f"p{i} " + ("widget" if i % 3 == 0 else "bolt")
             for i in range(n_part)]),
        # Brand#4 present so small_qty_revenue's filter is non-empty
        "p_brand": pa.array(rng.choice(
            ["Brand#1", "Brand#4", "Brand#9"], n_part,
            p=[0.4, 0.35, 0.25]).tolist()),
        "p_type": pa.array(rng.choice(
            ["PROMO", "STANDARD", "ECONOMY"], n_part,
            p=[0.3, 0.4, 0.3]).tolist()),
        "p_size": pa.array(np.ones(n_part, dtype=np.int32)),
        "p_retailprice": pa.array(np.ones(n_part)),
    })
    d1 = np.datetime64(J.Q4_D1, "us")
    span_days = 1200
    odates = d1 + (rng.integers(-400, span_days, n_orders)
                   * np.timedelta64(1, "D"))
    # plant exact window boundaries
    odates[0] = d1
    odates[1] = np.datetime64(J.Q4_D2, "us")          # first day OUT
    odates[2] = np.datetime64(J.Q4_D2, "us") - np.timedelta64(1, "us")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
        "o_custkey": pa.array(
            rng.integers(0, n_cust, n_orders).astype(np.int64)),
        "o_orderstatus": pa.array(["O"] * n_orders),
        "o_totalprice": pa.array(
            rng.integers(0, 10_000_000, n_orders) / 100.0),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"], n_orders).tolist()),
    })
    # lineitems: some orders have none (keys only up to n_orders-50),
    # ship dates correlated to the order date with exact +60d plants
    lkeys = rng.integers(0, n_orders - 50, n_lines).astype(np.int64)
    # plant heavy orders so the Q18 HAVING (> 250 qty) is non-trivially
    # satisfied on every seed: orders 0..9 get 30 lines each
    lkeys[:300] = np.repeat(np.arange(10, dtype=np.int64), 30)
    offs = rng.integers(0, 120, n_lines) * np.timedelta64(1, "D")
    sdates = odates[lkeys] + offs
    exact60 = rng.random(n_lines) < 0.08
    sdates[exact60] = odates[lkeys[exact60]] + np.timedelta64(60, "D")
    plus1 = rng.random(n_lines) < 0.05
    sdates[plus1] = (odates[lkeys[plus1]] + np.timedelta64(60, "D")
                     + np.timedelta64(1, "us"))
    lineitem = pa.table({
        "l_orderkey": pa.array(lkeys),
        "l_partkey": pa.array(
            rng.integers(0, n_part, n_lines).astype(np.int64)),
        "l_suppkey": pa.array(
            rng.integers(0, n_supp, n_lines).astype(np.int64)),
        "l_linenumber": pa.array(np.arange(n_lines, dtype=np.int32)),
        "l_quantity": pa.array(
            rng.integers(1, 50, n_lines).astype(np.float64)),
        "l_extendedprice": pa.array(
            rng.integers(0, 1_000_000, n_lines) / 100.0),
        "l_discount": pa.array(
            rng.integers(0, 11, n_lines) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, n_lines) / 100.0),
        "l_returnflag": pa.array(
            rng.choice(["A", "N", "R"], n_lines).tolist()),
        "l_linestatus": pa.array(
            rng.choice(["O", "F"], n_lines).tolist()),
        "l_shipdate": pa.array(sdates, pa.timestamp("us")),
    })
    return {"region": region, "nation": nation, "customer": customer,
            "supplier": supplier, "part": part, "orders": orders,
            "lineitem": lineitem}


_TPCH_OPS = ["order_priority_counts", "pricing_summary",
             "revenue_by_nation", "top_unshipped_orders",
             # fifth wave
             "local_supplier_volume", "big_orders", "promo_revenue",
             "churned_customers", "fuzzy_name_pairs",
             "cust_order_dist", "top_suppliers",
             # seventh wave
             "returned_item_customers", "nation_trade_volume",
             "small_qty_revenue", "qty_price_corr", "disjunct_revenue",
             # round 4, third wave
             "market_share", "product_profit", "shipping_priority",
             "part_supplier_breadth", "excess_suppliers",
             "ship_delay_priority",
             # round-5 session-4 sweep: the remaining oracle-backed
             # TPC-H-family entries
             "fk_integrity", "forecast_revenue", "important_parts",
             "min_cost_supplier", "sole_late_supplier",
             # round-5 session-8
             "matrix_stats"]


@pytest.fixture(scope="module", params=_SEEDS, ids=lambda s: f"tp{s}")
def tpch_dir(request, tmp_path_factory):
    rng = np.random.default_rng(request.param + 31)
    d = tmp_path_factory.mktemp(f"tpch{request.param}")
    tables = _gen_tpch(rng, 800, 3000)
    for name, tbl in tables.items():
        if name in ("orders", "lineitem"):
            _write_sharded(tbl, str(d / f"{name}.parquet"), 3, rng)
        else:
            pq.write_table(tbl, str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def tpch_con(tpch_dir):
    c = duckdb.connect()
    for t in ("orders", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{tpch_dir}/{t}.parquet/*.parquet')")
    for t in ("customer", "nation", "region", "supplier", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{tpch_dir}/{t}.parquet')")
    yield c
    c.close()


@pytest.mark.parametrize("name", _TPCH_OPS)
def test_random_tpch_parity(ray_session, tpch_dir, tpch_con, name):
    import __ray_entry__ as entry
    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    engine = _normalize(_to_pandas(q(tpch_dir)))
    oracle = _normalize(tpch_con.execute(sql).df())
    assert list(engine.columns) == list(oracle.columns), name
    assert len(engine) == len(oracle), name
    pd.testing.assert_frame_equal(engine, oracle, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1.0e-6)


# --- randomized embeddings tables for the vector/graph operators ----

def _gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    dim = 6
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    # planted exact duplicates (dedup/dup-pair armor)
    for _ in range(n // 15):
        a, b = rng.integers(0, n, size=2)
        mat[int(a)] = mat[int(b)]
    # sparse non-contiguous ids, with a couple below N_QUERY_VECS so
    # ann_topk's fixed query-id contract is non-trivially exercised
    ids = np.sort(rng.choice(np.arange(5, 6 * n, dtype=np.int64),
                             size=n - 2, replace=False))
    ids = np.concatenate([np.array([1, 3], dtype=np.int64), ids])
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([[float(x) for x in row] for row in mat],
                              pa.list_(pa.float32())),
        "label": pa.array((ids % 3).astype(np.int64), pa.int64()),
    })


_EMB_OPS = ["knn_graph", "knn_label_eval", "pagerank_topk",
            "label_prop", "triangle_stats", "ann_topk",
            "embedding_dups", "emb_quantize",
            # round-5 session-3 sweep
            "ann_filtered_topk", "emb_norm_stats", "label_centroids",
            "emb_outliers", "hard_negatives",
            # round-5 session-8
            "ann_range"]


@pytest.fixture(scope="module", params=_SEEDS, ids=lambda s: f"em{s}")
def emb_dir(request, tmp_path_factory):
    rng = np.random.default_rng(request.param + 57)
    d = tmp_path_factory.mktemp(f"emb{request.param}")
    _write_sharded(_gen_embeddings(rng, 90),
                   str(d / "embeddings.parquet"), 3, rng)
    return str(d)


@pytest.fixture(scope="module")
def emb_con(emb_dir):
    c = duckdb.connect()
    c.execute("CREATE VIEW embeddings AS SELECT * FROM "
              f"read_parquet('{emb_dir}/embeddings.parquet/*.parquet')")
    yield c
    c.close()


@pytest.mark.parametrize("name", _EMB_OPS)
def test_random_embeddings_parity(ray_session, emb_dir, emb_con, name):
    import __ray_entry__ as entry
    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    engine = _normalize(_to_pandas(q(emb_dir)))
    oracle = _normalize(emb_con.execute(sql).df())
    assert list(engine.columns) == list(oracle.columns), name
    assert len(engine) == len(oracle), name
    pd.testing.assert_frame_equal(engine, oracle, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1.0e-6)
