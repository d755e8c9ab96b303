"""Deduplication ops over the ``documents`` table — the core
training-data-pipeline operators: exact dedup, MinHash+LSH near-dup,
SimHash, and exact n-gram-Jaccard verification. All hashing is
md5-derived (deterministic across engine and DuckDB oracle).

Scale notes (how each runs at 100 TB):
- exact: hash-partitioned groupby on the content hash; first-wins per
  group. One shuffle of (sha, doc_id) pairs, never the content.
- minhash-lsh: signatures are computed map-side (shingle -> 16 minhash
  values -> 8 banded keys, 2 rows each), the only shuffle is
  groupby(band_id, band_key) whose groups are candidate buckets;
  verification touches only candidate docs.
- simhash: map-side 48-bit signature; pair search is a blocked
  all-vs-all over the (tiny) signature table — at larger scale the
  standard trick is bucketing on bit-bands of the signature, same
  groupby shape as LSH.
- ngram-jaccard: inverted-index join on shingles with a frequency cap
  (hot shingles are skipped for candidate generation — the skew guard;
  the cap is part of the operator contract and mirrored in the oracle).
"""

from __future__ import annotations

import hashlib
import itertools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raysearch.pipelines.textops import (
    SQL_GRAMS_CTE,
    doc_shingles,
    doc_shingles_flat,
    md5_prefix_ints,
)

_DOCS = "documents.parquet"

# MinHash parameters (shared with the SQL oracle). The gram hash is 44
# bits (11 md5 hex chars) and A < 2^19 so A*h + B < 2^63 stays exact in
# both numpy uint64 and DuckDB BIGINT — no big-int arithmetic anywhere.
NUM_HASHES = 16
BAND_ROWS = 2
NUM_BANDS = NUM_HASHES // BAND_ROWS
MERSENNE_P = (1 << 61) - 1
HASH_HEX = 11
_A = [260817 + 4099 * i for i in range(NUM_HASHES)]
_B = [987654321 + 31337 * i for i in range(NUM_HASHES)]
JACCARD_THRESHOLD = 0.5
NGRAM_JACCARD_THRESHOLD = 0.8
GRAM_DF_CAP = 20          # hot-shingle cutoff for candidate generation
SIMHASH_BITS = 48


def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, _DOCS),
                                 columns=["doc_id", "text"])




# ---- exact dedup ----

def dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup: hash-partitioned groupby on sha256(text), keep the
    smallest doc_id per group. Only (sha, doc_id) pairs shuffle."""
    import ray.data
    from ray.data.aggregate import Count, Min

    def sha_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "sha": pa.array([hashlib.sha256(t.encode()).hexdigest()
                             for t in batch["text"].to_pylist()],
                            pa.string()),
            "doc_id": batch["doc_id"],
        })

    ds = _read_docs(sf_dir).map_batches(sha_rows, batch_format="pyarrow",
                                        zero_copy_batch=True)
    agg = ds.groupby("sha").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_copies"))
    df = agg.to_pandas()
    return pa.table({
        "keep_doc_id": pa.array(df.keep_doc_id.to_numpy(np.int64), pa.int64()),
        "n_copies": pa.array(df.n_copies.to_numpy(np.int64), pa.int64()),
    })


# ---- MinHash + LSH ----

_A_NP = np.array(_A, dtype=np.uint64)
_B_NP = np.array(_B, dtype=np.uint64)


def _signatures_batch(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, (n_docs x NUM_HASHES) minhash matrix) — one md5 per
    unique gram, affine hashes + per-doc mins fully vectorized."""
    doc_ids, flat, starts = doc_shingles_flat(batch)
    if len(doc_ids) == 0:
        return doc_ids, np.zeros((0, NUM_HASHES), dtype=np.uint64)
    h = md5_prefix_ints(flat, HASH_HEX)  # < 2^44
    vals = (h[:, None] * _A_NP[None, :] + _B_NP[None, :]) % np.uint64(
        MERSENNE_P)
    sigs = np.minimum.reduceat(vals, starts, axis=0)
    return doc_ids, sigs


def _band_rows_fn(batch: pa.Table) -> pa.Table:
    doc_ids, sigs = _signatures_batch(batch)
    n = len(doc_ids)
    out_doc = np.repeat(doc_ids, NUM_BANDS)
    out_band = np.tile(np.arange(NUM_BANDS, dtype=np.int64), n)
    keys = [",".join(str(v) for v in sigs[i, b * BAND_ROWS:(b + 1) * BAND_ROWS])
            for i in range(n) for b in range(NUM_BANDS)]
    return pa.table({
        "doc_id": pa.array(out_doc, pa.int64()),
        "band_id": pa.array(out_band, pa.int64()),
        "band_key": pa.array(keys, pa.string()),
    })


def _shingle_sets_for(sf_dir: str, doc_ids: set[int]) -> dict[int, set]:
    """Fetch shingle sets for candidate docs only (broadcast semi-join
    into a map_batches filter — candidates are a tiny side)."""
    import ray.data

    wanted = pa.array(sorted(doc_ids), pa.int64())

    def fetch(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch["doc_id"], wanted))
        d, sets = doc_shingles(sub)
        return pa.table({
            "doc_id": pa.array([int(x) for x in d], pa.int64()),
            "grams": pa.array([sorted(s) for s in sets],
                              pa.list_(pa.string())),
        })

    out = _read_docs(sf_dir).map_batches(fetch, batch_format="pyarrow",
                                         zero_copy_batch=True)
    res = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for d, g in zip(b["doc_id"].to_pylist(), b["grams"].to_pylist()):
            res[d] = set(g)
    return res


def _pairs_table(pairs: list[tuple[int, int, float]]) -> pa.Table:
    pairs = sorted(pairs)
    return pa.table({
        "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
        "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        "jaccard": pa.array([p[2] for p in pairs], pa.float64()),
    })


def dedup_minhash(sf_dir: str) -> pa.Table:
    """MinHash(16)+LSH(8 bands x 2) candidate generation over 3-gram
    shingles, exact-Jaccard verification, threshold 0.5."""

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # one group per band_id: vectorized duplicate-key detection,
        # Python only over the (rare) colliding keys
        dup = group[group["band_key"].duplicated(keep=False)]
        rows = []
        for _, sub in dup.groupby("band_key"):
            docs = sorted(set(sub["doc_id"].tolist()))
            rows.extend(itertools.combinations(docs, 2))
        return pd.DataFrame(rows or None, columns=["doc_a", "doc_b"])

    bands = _read_docs(sf_dir).map_batches(
        _band_rows_fn, batch_format="pyarrow", zero_copy_batch=True)
    cand_ds = bands.groupby("band_id").map_groups(
        emit_pairs, batch_format="pandas")
    cand = {(int(a), int(b))
            for a, b in zip(*[cand_ds.to_pandas()[c]
                              for c in ("doc_a", "doc_b")])}
    if not cand:
        return _pairs_table([])
    involved = {d for p in cand for d in p}
    sets = _shingle_sets_for(sf_dir, involved)
    out = []
    for a, b in cand:
        sa, sb = sets.get(a, set()), sets.get(b, set())
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = round(inter / (len(sa) + len(sb) - inter), 6)
        if j >= JACCARD_THRESHOLD:
            out.append((a, b, j))
    return _pairs_table(out)


# ---- SimHash ----

def _simhash_batch(batch: pa.Table) -> pa.Table:
    doc_ids, flat, starts = doc_shingles_flat(batch)
    if len(doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "simhash": pa.array([], pa.int64())})
    h = md5_prefix_ints(flat, 12).astype(np.int64)  # 48 bits
    sim = np.zeros(len(doc_ids), dtype=np.int64)
    for j in range(SIMHASH_BITS):  # loop over BITS, never over docs
        votes = np.add.reduceat(2 * ((h >> j) & 1) - 1, starts)
        sim |= (votes > 0).astype(np.int64) << j
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                     "simhash": pa.array(sim, pa.int64())})


def dedup_simhash(sf_dir: str) -> pa.Table:
    """48-bit SimHash per doc over distinct 3-gram shingles (+1/-1
    votes per bit, strict majority sets the bit)."""
    out = _read_docs(sf_dir).map_batches(
        _simhash_batch, batch_format="pyarrow", zero_copy_batch=True)
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return tbl


_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POPCNT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


SIMHASH_HAMMING_MAX = 8


def simhash_pairs(sf_dir: str) -> pa.Table:
    """Near-dup pairs with hamming(simhash) <= 8: each batch of the
    signature table is compared against the broadcast signature set
    (blocked all-vs-all; at larger scale this becomes bit-band
    bucketing with the same groupby shape as LSH)."""
    import ray
    import ray.data

    sims = dedup_simhash(sf_dir)
    all_docs = sims["doc_id"].to_numpy()
    all_sims = sims["simhash"].to_numpy()
    ref = ray.put((all_docs, all_sims))

    def block(batch: pa.Table) -> pa.Table:
        docs_g, sims_g = ray.get(ref)
        d = batch["doc_id"].to_numpy()
        s = batch["simhash"].to_numpy()
        out_a, out_b, out_h = [], [], []
        for i in range(len(d)):
            x = np.bitwise_xor(sims_g, s[i])
            ham = _popcount64(x.astype(np.uint64))
            hit = (ham <= SIMHASH_HAMMING_MAX) & (docs_g > d[i])
            for j in np.flatnonzero(hit):
                out_a.append(int(d[i]))
                out_b.append(int(docs_g[j]))
                out_h.append(int(ham[j]))
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_h, pa.int64())})

    ds = ray.data.from_arrow(sims).map_batches(block, batch_format="pyarrow")
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return tbl.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# ---- exact n-gram Jaccard ----

def ngram_jaccard(sf_dir: str) -> pa.Table:
    """Exact 3-gram-Jaccard near-dup pairs (threshold 0.8): candidates
    from an inverted shingle join (shingles with df <= GRAM_DF_CAP
    only — the hot-key guard), intersections counted distributed,
    Jaccard over the full shingle sets."""
    import ray.data
    from ray.data.aggregate import Count

    def gram_rows(batch: pa.Table) -> pa.Table:
        doc_ids, flat, starts = doc_shingles_flat(batch)
        bounds = np.append(starts, len(flat))
        out_d = np.repeat(doc_ids, np.diff(bounds))
        # coarse shuffle key: all copies of a gram land in one group,
        # but each reduce group holds MANY grams (no per-gram dispatch)
        gpart = md5_prefix_ints(flat, 8) % np.uint64(64)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "gram": pa.array(flat.tolist(), pa.string()),
                         "gpart": pa.array(gpart.astype(np.int64),
                                           pa.int64())})

    grams = _read_docs(sf_dir).map_batches(
        gram_rows, batch_format="pyarrow", zero_copy_batch=True)

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # one group per gpart; pair emission fully vectorized: factorize
        # grams, find runs, emit triangular index blocks per run-length
        # class (Python loops only over the <= GRAM_DF_CAP length
        # classes, never over grams or pairs)
        codes, _ = pd.factorize(group["gram"], sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        docs_s = group["doc_id"].to_numpy()[order]
        starts = np.r_[0, np.flatnonzero(np.diff(codes_s)) + 1]
        lens = np.diff(np.r_[starts, len(codes_s)])
        out_a, out_b = [], []
        for m in np.unique(lens):
            if m < 2 or m > GRAM_DF_CAP:
                continue
            idx = starts[lens == m]
            block = docs_s[idx[:, None] + np.arange(m)]
            block.sort(axis=1)
            tri_a, tri_b = np.triu_indices(m, 1)
            out_a.append(block[:, tri_a].ravel())
            out_b.append(block[:, tri_b].ravel())
        if not out_a:
            return pd.DataFrame({"pkey": np.zeros(0, np.int64),
                                 "ppart": np.zeros(0, np.int64)})
        # pack the pair into one int64 (doc_ids < 2^31) and give it a
        # coarse partition key: per-pair counting then happens inside
        # 64 vectorized np.unique calls, not a million-group aggregate
        pkey = (np.concatenate(out_a) << np.int64(32)) | \
            np.concatenate(out_b)
        return pd.DataFrame({"pkey": pkey, "ppart": pkey % 64})

    def count_pairs(group: pd.DataFrame) -> pd.DataFrame:
        uniq, counts = np.unique(group["pkey"].to_numpy(), return_counts=True)
        return pd.DataFrame({
            "doc_a": uniq >> np.int64(32),
            "doc_b": uniq & np.int64(0xFFFFFFFF),
            "inter": counts.astype(np.int64)})

    inter_ds = (grams.groupby("gpart")
                .map_groups(emit_pairs, batch_format="pandas")
                .groupby("ppart")
                .map_groups(count_pairs, batch_format="pandas"))
    inter = inter_ds.to_pandas()
    sizes = (grams.groupby("doc_id")
             .aggregate(Count(alias_name="n")).to_pandas()
             .set_index("doc_id")["n"])
    na = inter.doc_a.map(sizes).to_numpy(np.float64)
    nb = inter.doc_b.map(sizes).to_numpy(np.float64)
    ivals = inter["inter"].to_numpy(np.float64)
    j = np.round(ivals / (na + nb - ivals), 6)
    keep = j >= NGRAM_JACCARD_THRESHOLD
    return _pairs_table(list(zip(
        inter.doc_a.to_numpy()[keep].tolist(),
        inter.doc_b.to_numpy()[keep].tolist(),
        j[keep].tolist())))


# ---- oracle SQL ----

def sql_dedup_exact() -> str:
    return """
SELECT min(doc_id)::BIGINT AS keep_doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY text
"""


def sql_dedup_minhash() -> str:
    return f"""
WITH {SQL_GRAMS_CTE},
h AS (SELECT doc_id, gram,
             ('0x' || substr(md5(gram), 1, {HASH_HEX}))::BIGINT AS h
      FROM g),
mh AS (
  SELECT doc_id, i,
         min(((260817 + 4099 * i) * h
              + (987654321 + 31337 * i)) % {MERSENNE_P})::BIGINT AS mh
  FROM h, range(0, {NUM_HASHES}) r(i)
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, (i // {BAND_ROWS})::BIGINT AS band_id,
         string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkey
  FROM mh GROUP BY doc_id, i // {BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN g ga ON ga.doc_id = c.doc_a
  JOIN g gb ON gb.doc_id = c.doc_b AND ga.gram = gb.gram
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       round(inter::DOUBLE / (sa.n + sb.n - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON doc_a = sa.doc_id
JOIN sz sb ON doc_b = sb.doc_id
WHERE round(inter::DOUBLE / (sa.n + sb.n - inter), 6)
      >= {JACCARD_THRESHOLD}
"""


def sql_dedup_simhash() -> str:
    return f"""
WITH {SQL_GRAMS_CTE},
h AS (SELECT doc_id, gram,
             ('0x' || substr(md5(gram), 1, 12))::BIGINT AS h FROM g),
votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, range(0, {SIMHASH_BITS}) r(i)
  GROUP BY doc_id, i
)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN 1::BIGINT << i ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY doc_id
"""


def sql_simhash_pairs() -> str:
    return f"""
WITH sim AS ({sql_dedup_simhash()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
"""


def sql_ngram_jaccard() -> str:
    return f"""
WITH {SQL_GRAMS_CTE},
df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
keep AS (SELECT gram FROM df WHERE df BETWEEN 2 AND {GRAM_DF_CAP}),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM g a
  JOIN keep k ON a.gram = k.gram
  JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id)
SELECT doc_a, doc_b,
       round(inter::DOUBLE / (sa.n + sb.n - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON doc_a = sa.doc_id
JOIN sz sb ON doc_b = sb.doc_id
WHERE round(inter::DOUBLE / (sa.n + sb.n - inter), 6)
      >= {NGRAM_JACCARD_THRESHOLD}
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "simhash_pairs": simhash_pairs,
    "ngram_jaccard": ngram_jaccard,
}

ORACLE_SQL = {
    "dedup_exact": sql_dedup_exact(),
    "dedup_minhash": sql_dedup_minhash(),
    "dedup_simhash": sql_dedup_simhash(),
    "simhash_pairs": sql_simhash_pairs(),
    "ngram_jaccard": sql_ngram_jaccard(),
}
