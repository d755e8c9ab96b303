"""Tokenizers replicating the reference's exact semantics.

Reference behavior (file:line in /root/reference):
- plain text docs: whitespace-split, then lowercase each token;
  punctuation is KEPT ("go." != "go") — src/lib.rs:70-74.
- HTML docs: parse, take <body> text nodes joined by " ", whitespace
  split + lowercase — src/lib.rs:76-93.
- JSON docs: recursively collect string values AND object keys
  (numbers/bools/null ignored; parse failure -> no tokens), whitespace
  split + lowercase — src/lib.rs:95-137.
- queries: regex \\w+ matches, lowercased — a DIFFERENT normalization
  from documents (punctuation stripped on the query side only) —
  src/lib.rs:151-157.

Lowercase-then-split equals the reference's split-then-lowercase
because Unicode lowercasing never produces whitespace; we exploit that
to run the plain-text path fully vectorized with pyarrow kernels.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_QUERY_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# lang values routed to the structured-format tokenizers; everything
# else (source code, natural language, txt) is plain text.
HTML_LANGS = frozenset({"html", "htm"})
JSON_LANGS = frozenset({"json"})


def tokenize_plain(text: str) -> list[str]:
    return [t.lower() for t in text.split()]


class _BodyTextParser(HTMLParser):
    """Collects text inside <body>; if the document has no <body> tag at
    all, falls back to all text (the reference's html5ever parser always
    synthesizes a body; Python's html.parser does not)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.in_body = 0
        self.saw_body = False
        self.body_chunks: list[str] = []
        self.all_chunks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "body":
            self.in_body += 1
            self.saw_body = True

    def handle_endtag(self, tag: str) -> None:
        if tag == "body" and self.in_body:
            self.in_body -= 1

    def handle_data(self, data: str) -> None:
        self.all_chunks.append(data)
        if self.in_body:
            self.body_chunks.append(data)


def tokenize_html(text: str) -> list[str]:
    p = _BodyTextParser()
    try:
        p.feed(text)
        p.close()
    except Exception:
        return []
    chunks = p.body_chunks if p.saw_body else p.all_chunks
    return tokenize_plain(" ".join(chunks))


def _collect_json_tokens(node, out: list[str]) -> None:
    if isinstance(node, dict):
        for k, v in node.items():
            out.extend(tokenize_plain(k))
            _collect_json_tokens(v, out)
    elif isinstance(node, list):
        for v in node:
            _collect_json_tokens(v, out)
    elif isinstance(node, str):
        out.extend(tokenize_plain(node))
    # numbers / bools / null ignored (src/lib.rs:118-124)


def tokenize_json(text: str) -> list[str]:
    try:
        node = json.loads(text)
    except Exception:
        return []  # src/lib.rs:131-135: parse failure -> empty
    out: list[str] = []
    _collect_json_tokens(node, out)
    return out


def tokenize_doc(text: str, lang: str = "txt") -> list[str]:
    if lang in HTML_LANGS:
        return tokenize_html(text)
    if lang in JSON_LANGS:
        return tokenize_json(text)
    return tokenize_plain(text)


def tokenize_query(query: str) -> list[str]:
    """\\w+ lowercase; duplicates kept (multiplicity matters, src/lib.rs:374-399)."""
    return [m.group(0).lower() for m in _QUERY_TOKEN_RE.finditer(query)]


# ---- vectorized batch path ----

def _drop_empty_tokens(lst: pa.Array) -> pa.Array:
    """Arrow's utf8_split_whitespace emits '' tokens at string edges
    (leading/trailing whitespace); Python's str.split() never does.
    Filter them so both paths agree exactly."""
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    if pc.all(keep).as_py() in (True, None):
        return lst
    n = len(lst)
    dl = pc.list_value_length(lst).to_numpy().astype(np.int64)
    row = np.repeat(np.arange(n, dtype=np.int64), dl)
    keep_np = keep.to_numpy(zero_copy_only=False)
    new_counts = np.zeros(n, dtype=np.int64)
    np.add.at(new_counts, row[keep_np], 1)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_counts, out=offsets[1:])
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), flat.filter(keep))


def tokenize_column(content: pa.Array, lang: pa.Array | None = None) -> pa.ListArray:
    """Tokenize a string column into list<string>, one list per row.

    Plain rows run through pyarrow kernels (utf8_lower +
    utf8_split_whitespace — zero Python per token); html/json rows (if
    any) run through the per-row Python tokenizers and are stitched
    back in position.
    """
    content = pc.cast(content, pa.large_string())
    lowered = pc.utf8_lower(content)
    # pyarrow 16.1 bug: utf8_split_whitespace intermittently fails to
    # split a trailing separator in the LAST row when its input is the
    # direct output of another string kernel (fresh buffers are fine).
    # A defensive copy via concat_arrays normalizes the buffers and
    # eliminates it (verified over thousands of randomized batches).
    if isinstance(lowered, pa.ChunkedArray):
        lowered = lowered.combine_chunks()
    lowered = pa.concat_arrays([lowered])
    plain = _drop_empty_tokens(pc.utf8_split_whitespace(lowered))
    # utf8proc lowercasing differs from Python/Rust full casing on
    # exactly two inputs (exhaustive scan): U+0130 'İ' (-> 'i' vs
    # 'i̇') and the contextual final-sigma rule for 'Σ' (-> 'σ'
    # always vs 'ς' at word end). Rows containing either (rare in any
    # real corpus) are re-tokenized with the exact Python path.
    needs_py = pc.or_(pc.match_substring(content, "İ"),
                      pc.match_substring(content, "Σ"))
    if pc.any(needs_py).as_py():
        fix_idx = np.flatnonzero(
            needs_py.to_numpy(zero_copy_only=False))
        lists = plain.to_pylist()
        content_np = content.to_numpy(zero_copy_only=False)
        for i in fix_idx:
            lists[i] = tokenize_plain(content_np[i])
        plain = pa.array(lists, type=pa.large_list(pa.large_string()))
    if lang is None:
        return plain
    lang_np = np.asarray(lang.to_numpy(zero_copy_only=False), dtype=object)
    special = np.isin(lang_np, list(HTML_LANGS | JSON_LANGS))
    if not special.any():
        return plain
    lists = plain.to_pylist()
    content_np = content.to_numpy(zero_copy_only=False)
    for i in np.flatnonzero(special):
        lists[i] = tokenize_doc(content_np[i], lang_np[i])
    return pa.array(lists, type=pa.large_list(pa.large_string()))
