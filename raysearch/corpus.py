"""Deterministic synthetic source-code corpus (FIXTURES.md §1-2).

Shape fixed by BASELINE.json input_hint: Parquet table
(repo, path, commit, lang, content) + a dense int64 doc_id assigned at
generation time (rank of (repo, path, commit) under lexicographic
sort). Relevance labels are embedded in ``path`` (src/q{q}/...),
mirroring the reference's documents/query{q}document{d}.txt convention
(/root/reference/src/bin/test.rs:122-137).

Content is keyword-heavy, Zipf-skewed source-code-ish text (hot terms
like 'import', 'return', 'def' — exercises skew handling) interleaved
with query-specific vocabulary so both BM25 and the reference
overlap·tf score rank the labeled docs on top.

Everything is seeded; no wall-clock, no external data.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# 10 fixed queries; punctuation/case chosen so the query tokenizer
# (\w+ lower) differs from raw whitespace splitting (FIXTURES.md §2).
QUERIES: list[str] = [
    "How does the Parser build an AST?",
    "Tokenize input, stream lexer buffers!",
    "Why is the scheduler preempting threads?",
    "Allocate memory arena; free the pool.",
    "Does the compiler optimize inline functions?",
    "Serialize the payload into binary frames.",
    "Retry the network socket on timeout?",
    "Hash the bucket index into lookup tables.",
    "Commit the transaction log to disk!",
    "Render the widget layout on canvas.",
]

# distinctive per-query vocabulary (only labeled docs contain these)
_QUERY_VOCAB: list[list[str]] = [
    ["parser", "ast", "grammar", "syntax"],
    ["tokenize", "lexer", "buffers", "stream"],
    ["scheduler", "preempting", "threads", "quantum"],
    ["allocate", "arena", "pool", "free"],
    ["compiler", "optimize", "inline", "functions"],
    ["serialize", "payload", "frames", "binary"],
    ["retry", "socket", "timeout", "network"],
    ["hash", "bucket", "lookup", "tables"],
    ["commit", "transaction", "log", "disk"],
    ["render", "widget", "layout", "canvas"],
]

# Zipf-skewed common code tokens (the hot-term population)
_COMMON = [
    "import", "return", "def", "fn", "let", "self", "class", "pub",
    "const", "if", "else", "for", "while", "match", "struct", "impl",
    "use", "mod", "type", "static", "async", "await", "try", "except",
    "raise", "with", "from", "as", "in", "not", "and", "or", "none",
    "true", "false", "println", "print", "vec", "string", "result",
]

_LANGS = ["py", "rs", "txt", "py", "rs", "py", "json", "html"]  # weighted


def _make_content(rng: np.random.Generator, qvocab: list[str], n_lines: int,
                  lang: str) -> str:
    # Zipf ranks over the common vocabulary -> heavy skew on 'import' etc.
    zipf_p = 1.0 / np.arange(1, len(_COMMON) + 1)
    zipf_p /= zipf_p.sum()
    lines = []
    for _ in range(n_lines):
        k = int(rng.integers(4, 9))
        words = list(rng.choice(_COMMON, size=k, p=zipf_p))
        if qvocab and rng.random() < 0.85:
            words += list(rng.choice(qvocab, size=int(rng.integers(1, 4))))
        rng.shuffle(words)
        lines.append(" ".join(words))
    body = "\n".join(lines)
    if lang == "json":
        import json as _json
        return _json.dumps({"doc": [body], "meta": "generated fixture"})
    if lang == "html":
        return f"<html><head><title>skip me</title></head><body><p>{body}</p></body></html>"
    return body


def generate_corpus(n_docs: int, seed: int = 42, labeled: bool = True,
                    min_lines: int = 4, max_lines: int = 24) -> pa.Table:
    """Generate n_docs rows; if labeled, docs cycle through the 10 query
    labels (doc i -> query i % 10) and carry that query's vocabulary."""
    rng = np.random.default_rng(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_docs):
        q = i % 10 if labeled else -1
        d = i // 10
        repo = f"org{i % 7}/repo{(i // 7) % 25}"
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        path = (f"src/q{q + 1}/doc{d}_{i}.{lang}" if labeled
                else f"src/misc/doc{i}.{lang}")
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:12]
        qvocab = _QUERY_VOCAB[q] if labeled else []
        n_lines = int(rng.integers(min_lines, max_lines + 1))
        content = _make_content(rng, qvocab, n_lines, lang)
        repos.append(repo); paths.append(path); commits.append(commit)
        langs.append(lang); contents.append(content)
    # doc_id = dense rank of (repo, path, commit) lexicographic
    order = sorted(range(n_docs), key=lambda j: (repos[j], paths[j], commits[j]))
    doc_id = [0] * n_docs
    for rank, j in enumerate(order):
        doc_id[j] = rank
    tbl = pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })
    return tbl


def write_corpus(out_dir: str, n_docs: int, seed: int = 42,
                 labeled: bool = True, rows_per_file: int = 50_000) -> str:
    """Write the corpus as a directory of parquet files (sharded so the
    read parallelizes); returns the directory path."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_corpus(n_docs, seed=seed, labeled=labeled)
    n_files = max(1, (n_docs + rows_per_file - 1) // rows_per_file)
    for f in range(n_files):
        lo, hi = f * rows_per_file, min((f + 1) * rows_per_file, n_docs)
        pq.write_table(tbl.slice(lo, hi - lo),
                       os.path.join(out_dir, f"corpus-{f:05d}.parquet"))
    return out_dir


def _gen_shard(out_dir: str, shard: int, n_docs: int, offset: int,
               seed: int) -> str:
    """One shard, seeded independently (deterministic regardless of
    scheduling order); doc_id = global row index (sequential — the
    bench corpus doesn't need the lexicographic-rank property)."""
    rng = np.random.default_rng(seed + 1000 * shard)
    repos, paths, commits, langs, contents, ids = [], [], [], [], [], []
    for j in range(n_docs):
        i = offset + j
        q = i % 10
        repo = f"org{i % 7}/repo{(i // 7) % 25}"
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        path = f"src/q{q + 1}/doc{i // 10}_{i}.{lang}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:12]
        # RAY_GRAFT_CONTENT_SCALE shrinks/grows doc bodies for the
        # bandwidth-saturation control experiment (BASELINE.md): same
        # doc count, scaled shuffle bytes
        scale = float(os.environ.get("RAY_GRAFT_CONTENT_SCALE", "1"))
        n_lines = max(1, int(int(rng.integers(4, 25)) * scale))
        contents.append(_make_content(rng, _QUERY_VOCAB[q], n_lines, lang))
        repos.append(repo); paths.append(path); commits.append(commit)
        langs.append(lang); ids.append(i)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })
    dest = os.path.join(out_dir, f"corpus-{shard:05d}.parquet")
    pq.write_table(tbl, dest)
    return dest


def write_corpus_parallel(out_dir: str, n_docs: int, seed: int = 42,
                          rows_per_file: int = 6250) -> str:
    """Large bench corpora: one Ray task per shard (Ray must already be
    initialised). Deterministic per-shard seeding."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    gen = ray.remote(_gen_shard)
    n_files = max(1, (n_docs + rows_per_file - 1) // rows_per_file)
    refs = []
    for f in range(n_files):
        lo = f * rows_per_file
        hi = min(lo + rows_per_file, n_docs)
        refs.append(gen.remote(out_dir, f, hi - lo, lo, seed))
    ray.get(refs)
    return out_dir


# ---- file-tree ingestion (reference S1 shape) ----

# extension -> tokenizer dispatch lang, mirroring the reference's
# match on file extension (/root/reference/src/main.rs:336-344)
SUPPORTED_EXTS: dict[str, str] = {"txt": "text", "html": "html",
                                  "json": "json"}


def corpus_from_files(root: str,
                      supported_exts: dict[str, str] | None = None):
    """Distributed file-tree corpus source: the reference ingests a
    directory of .txt/.html/.json files (src/main.rs:320-344); here
    ``ray.data.read_binary_files`` streams (path, bytes) blocks in
    parallel and a vectorized map stage produces the engine corpus
    schema (doc_id, path, lang, content).

    - unsupported extensions are dropped map-side (M6 filter, exactly
      the reference's skip branch);
    - doc_id = splitmix64(md5-prefix of the RELATIVE path): stable
      across re-runs, machines, and file enumeration order — the
      property resumable builds need (input_id + manifest validation
      reuse segments only if ids are reproducible).
    """
    import hashlib as _hl

    import ray.data

    from raysearch.hashing import splitmix64

    exts = supported_exts or SUPPORTED_EXTS

    def to_corpus(b: pa.Table) -> pa.Table:
        paths = [os.path.relpath(p, root) for p in b["path"].to_pylist()]
        suffix = [p.rsplit(".", 1)[-1].lower() if "." in p else ""
                  for p in paths]
        keep = [i for i, e in enumerate(suffix) if e in exts]
        rel = [paths[i] for i in keep]
        raw = np.array([int(_hl.md5(p.encode()).hexdigest()[:15], 16)
                        for p in rel], dtype=np.uint64)
        ids = (splitmix64(raw) >> np.uint64(1)).astype(np.int64)
        texts = [b["bytes"][i].as_py().decode("utf-8", errors="replace")
                 for i in keep]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "path": pa.array(rel, pa.string()),
            "lang": pa.array([exts[suffix[i]] for i in keep], pa.string()),
            "content": pa.array(texts, pa.string()),
        })

    return ray.data.read_binary_files(root, include_paths=True).map_batches(
        to_corpus, batch_format="pyarrow")
