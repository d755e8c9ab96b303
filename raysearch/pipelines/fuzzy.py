"""Fuzzy (edit-distance) entity matching — the record-linkage /
typo-clustering primitive, SymSpell-style (Garbe's deletion-
neighborhood blocking): two strings are within Levenshtein distance 1
only if they share a member of {self} ∪ {all 1-deletion variants}, so
candidate generation is a hash join on variant hashes instead of the
O(N^2) cross join the SQL oracle runs.

Distance is over UTF-8 BYTES — the exact semantics of
DuckDB/Postgres levenshtein(), which the oracle runs (a codepoint
contract silently diverges on multi-byte text). Everything is
vectorized per LENGTH CLASS: one vectorized UTF-8 encode views as a
(rows x maxbytes) byte matrix, and every deletion variant's
polynomial rolling hash comes from prefix Horner states +
reverse-cumsum suffix sums (the winnow.py hashing idiom):
hash(delete i) = prefix_i * B^(L-1-i) + suffix_{i+1}. Python loops
run only over byte positions (~name length) and distinct length
classes, never over rows or pairs.

Candidate guarantee (proof in _verify): a shared variant forces
|len_a - len_b| <= 1; a len-diff-1 candidate is ALWAYS a true
deletion pair (the shared variant must equal the shorter name), and an
equal-length candidate needs exactly the <=1-mismatch check (deleting
different positions can fake distance 2, e.g. 'ab' / 'ba'). Hash
collisions only ADD false candidates (equal strings always collide
equal) — the exact verify kills them, so the result is exact.

Exchanges: ONE coarse groupby on the variant-hash bucket (candidate
emission via the shared _run_pairs triangular kernel), ONE on the
pair bucket (cross-bucket dedup of pairs found under several shared
variants + the verify). Work scales with sum(bucket^2) of the variant
blocking, not N^2.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raysearch.hashing import splitmix64

_B = np.uint64(1099511628211)  # FNV-1a prime as the polynomial base


def _name_codes(names) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 BYTE matrix (rows x maxbytes, zero-padded) + row byte
    lengths, via one vectorized encode + view — no per-row loop. The
    distance contract is over UTF-8 BYTES, matching DuckDB/Postgres
    levenshtein() exactly (a codepoint-level contract diverges from
    the SQL oracle on any multi-byte text — caught by the CJK/emoji
    adversarial tests). UTF-8 of NUL-free text never contains a zero
    byte, so padding is unambiguous."""
    u = np.asarray(list(names), dtype="U")
    if len(u) == 0:
        return np.zeros((0, 0), np.uint64), np.zeros(0, np.int64)
    b = np.char.encode(u, "utf-8")
    max_b = b.dtype.itemsize
    if max_b == 0:  # every name empty
        return np.zeros((len(u), 0), np.uint64), np.zeros(len(u),
                                                          np.int64)
    codes = (b.view(np.uint8).reshape(len(b), max_b)
             .astype(np.uint64))
    lens = (codes != 0).sum(axis=1).astype(np.int64)
    return codes, lens


def _variant_hashes(codes: np.ndarray, lens: np.ndarray):
    """For every row, the splitmix64-finalized polynomial hash of the
    string itself and of each 1-deletion variant. Returns parallel
    (row_idx, hash) arrays. Vectorized per length class."""
    out_rows, out_hash = [], []
    with np.errstate(over="ignore"):
        for L in np.unique(lens):
            L = int(L)
            sel = np.flatnonzero(lens == L)
            if L == 0:
                # the empty string's self-hash must go through the
                # SAME finalizer as a 1-char name's deletion variant
                # (raw 0), or ''-vs-single-char pairs are missed
                out_rows.append(sel)
                out_hash.append(splitmix64(np.zeros(len(sel),
                                                    np.uint64)))
                continue
            c = codes[sel, :L]                      # (n, L)
            pw = np.empty(L, np.uint64)
            pw[0] = 1
            for k in range(1, L):
                pw[k] = pw[k - 1] * _B
            # prefix Horner states p_i = hash(s[:i])
            p = np.zeros((len(sel), L + 1), np.uint64)
            for i in range(L):
                p[:, i + 1] = p[:, i] * _B + c[:, i]
            # suffix sums S_i = sum_{j>=i} c_j * B^(L-1-j)
            w = c * pw[::-1][None, :]
            S = np.zeros((len(sel), L + 1), np.uint64)
            S[:, :L] = w[:, ::-1].cumsum(axis=1,
                                         dtype=np.uint64)[:, ::-1]
            # the string itself
            out_rows.append(sel)
            out_hash.append(splitmix64(p[:, L]))
            # each deletion position i: prefix_i * B^(L-1-i) + S_{i+1}
            for i in range(L):
                h = p[:, i] * pw[L - 1 - i] + S[:, i + 1]
                out_rows.append(sel)
                out_hash.append(splitmix64(h))
    return (np.concatenate(out_rows),
            np.concatenate(out_hash).astype(np.int64))


def _verify(names_a, names_b) -> np.ndarray:
    """Exact Levenshtein<=1 for candidate pairs (|len diff| <= 1 by
    construction): len-diff-1 candidates are true by the shared-
    variant argument; equal-length pairs need mismatches <= 1.
    Returns the distance (0/1) or -1 for rejected pairs."""
    ca, la = _name_codes(names_a)
    cb, lb = _name_codes(names_b)
    n = len(la)
    dist = np.full(n, -1, dtype=np.int64)
    diff1 = np.abs(la - lb) == 1
    dist[diff1] = 1
    same = la == lb
    if same.any():
        # equal-length rows have len <= min(maxlen_a, maxlen_b) and
        # zero padding beyond, so comparing the common width suffices
        w = min(ca.shape[1], cb.shape[1])
        mism = (ca[same, :w] != cb[same, :w]).sum(axis=1)
        d = np.full(int(same.sum()), -1, dtype=np.int64)
        d[mism <= 1] = (mism[mism <= 1] > 0).astype(np.int64)
        dist[same] = d
    return dist


def fuzzy_name_pairs(sf_dir: str) -> pa.Table:
    """All customer pairs whose names are within Levenshtein distance
    1 (custkey_a < custkey_b), with both names and the exact distance
    — via SymSpell deletion-neighborhood blocking instead of the
    oracle's O(N^2) cross join."""
    import ray.data

    from raysearch.hashing import auto_buckets, parquet_rows
    from raysearch.pipelines.dedup import _check_packable, _run_pairs

    path = os.path.join(sf_dir, "customer.parquet")
    nb = auto_buckets(parquet_rows(path))

    def variant_rows(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_numpy().astype(np.int64)
        _check_packable(keys)
        names = b["c_name"].to_pylist()
        codes, lens = _name_codes(names)
        rows, hashes = _variant_hashes(codes, lens)
        return pa.table({
            "bucket": pa.array(hashes & (nb - 1), pa.int64()),
            "vhash": pa.array(hashes, pa.int64()),
            "custkey": pa.array(keys[rows], pa.int64()),
            "name": pa.array(np.asarray(names, dtype=object)[rows]
                             .tolist(), pa.string()),
        })

    def emit_cands(g: pd.DataFrame) -> pd.DataFrame:
        # a name whose deletions coincide (e.g. 'aab' deleting either
        # 'a') emits the same (vhash, custkey) twice — dedup, or the
        # run kernel would see equal-doc runs
        g = g.drop_duplicates(["vhash", "custkey"])
        order = np.lexsort((g["custkey"].to_numpy(),
                            g["vhash"].to_numpy()))
        g = g.iloc[order]
        a, b = _run_pairs([g["vhash"].to_numpy()],
                          g["custkey"].to_numpy())
        if len(a) == 0:
            # fixed-width 'U1' empties keep Ray's block-size estimator
            # off the object-dtype path (np.vectorize rejects size-0
            # object inputs and logs an error per empty block)
            return pd.DataFrame({"ppart": [], "packed": [],
                                 "ka": [], "kb": [],
                                 "na": np.array([], dtype="U1"),
                                 "nb_": np.array([], dtype="U1")})
        packed = (a.astype(np.int64) << 32) | b.astype(np.int64)
        packed, idx = np.unique(packed, return_index=True)
        a, b = a[idx], b[idx]
        lookup = (g.drop_duplicates("custkey")
                  .set_index("custkey")["name"])
        pp = (splitmix64(packed.astype(np.uint64))
              % np.uint64(nb)).astype(np.int64)
        return pd.DataFrame({
            "ppart": pp, "packed": packed, "ka": a, "kb": b,
            "na": lookup.loc[a].to_numpy(),
            "nb_": lookup.loc[b].to_numpy()})

    def verify_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("packed")
        if not len(g):
            return pd.DataFrame({"custkey_a": [], "custkey_b": [],
                                 "name_a": np.array([], dtype="U1"),
                                 "name_b": np.array([], dtype="U1"),
                                 "dist": []})
        dist = _verify(g["na"].to_numpy(), g["nb_"].to_numpy())
        ok = dist >= 0
        return pd.DataFrame({
            "custkey_a": g["ka"].to_numpy()[ok],
            "custkey_b": g["kb"].to_numpy()[ok],
            "name_a": g["na"].to_numpy()[ok],
            "name_b": g["nb_"].to_numpy()[ok],
            "dist": dist[ok]})

    ds = ray.data.read_parquet(path, columns=["c_custkey", "c_name"])
    out = (ds.map_batches(variant_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket").map_groups(emit_cands,
                                         batch_format="pandas")
           .groupby("ppart").map_groups(verify_pairs,
                                        batch_format="pandas"))
    df = out.to_pandas()
    if "custkey_a" not in df.columns:  # no pairs anywhere
        df = pd.DataFrame({"custkey_a": np.array([], np.int64),
                           "custkey_b": np.array([], np.int64),
                           "name_a": pd.Series([], dtype=object),
                           "name_b": pd.Series([], dtype=object),
                           "dist": np.array([], np.int64)})
    df = df.sort_values(["custkey_a", "custkey_b"], ignore_index=True)
    return pa.table({
        "custkey_a": pa.array(df.custkey_a.to_numpy(np.int64),
                              pa.int64()),
        "custkey_b": pa.array(df.custkey_b.to_numpy(np.int64),
                              pa.int64()),
        "name_a": pa.array(df.name_a.tolist(), pa.string()),
        "name_b": pa.array(df.name_b.tolist(), pa.string()),
        "dist": pa.array(df.dist.to_numpy(np.int64), pa.int64()),
    })


def sql_fuzzy_name_pairs() -> str:
    return """
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       a.c_name AS name_a, b.c_name AS name_b,
       levenshtein(a.c_name, b.c_name)::BIGINT AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY custkey_a, custkey_b
"""


QUERIES = {
    "fuzzy_name_pairs": fuzzy_name_pairs,
}

ORACLE_SQL = {
    "fuzzy_name_pairs": sql_fuzzy_name_pairs(),
}
