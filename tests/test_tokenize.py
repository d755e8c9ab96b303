"""Tokenizer unit vectors capturing the reference's exact semantics
(FIXTURES.md §3; reference file:line in each assertion's comment)."""

import pyarrow as pa

from raysearch.tokenize import (
    tokenize_column,
    tokenize_doc,
    tokenize_html,
    tokenize_json,
    tokenize_plain,
    tokenize_query,
)


def test_plain_keeps_punctuation():
    # split_whitespace + lowercase, punctuation kept (src/lib.rs:70-74)
    assert tokenize_plain("Go. go GO") == ["go.", "go", "go"]
    assert tokenize_plain("  lots\t of\nspace ") == ["lots", "of", "space"]
    assert tokenize_plain("") == []


def test_query_strips_punctuation_keeps_duplicates():
    # \w+ lowercase (src/lib.rs:151-157); multiplicity kept
    assert tokenize_query("Go. go GO") == ["go", "go", "go"]
    assert tokenize_query("Does size matter?.") == ["does", "size", "matter"]
    assert tokenize_query("re-try the re-try") == ["re", "try", "the", "re", "try"]
    assert tokenize_query("") == []


def test_doc_query_asymmetry():
    # "go." as a doc token never equals query token "go"
    assert "go." in tokenize_plain("go.")
    assert tokenize_query("go.") == ["go"]


def test_json_string_values_and_keys_only():
    # string values + object keys; numbers/bools/null ignored
    # (src/lib.rs:110-137)
    assert tokenize_json('{"a b": ["X", 1, null]}') == ["a", "b", "x"]
    assert tokenize_json('{"K": {"nested Key": "Val Ue"}}') == \
        ["k", "nested", "key", "val", "ue"]
    assert tokenize_json("[1, true, null]") == []
    assert tokenize_json("not json") == []  # parse failure -> empty


def test_html_body_only():
    # body text nodes joined with " " (src/lib.rs:76-93)
    html = "<html><head><title>Skip This</title></head><body><p>Keep" \
           " <b>Me</b></p></body></html>"
    assert tokenize_html(html) == ["keep", "me"]
    # no <body> tag at all -> fall back to all text (html5ever would
    # synthesize a body around it)
    assert tokenize_html("<p>Loose Text</p>") == ["loose", "text"]


def test_dispatch_on_lang():
    assert tokenize_doc("A b", "py") == ["a", "b"]
    assert tokenize_doc('{"x": "Y"}', "json") == ["x", "y"]
    assert tokenize_doc("<body>Hi</body>", "html") == ["hi"]


def test_tokenize_column_matches_row_tokenizers():
    contents = ["Go. go GO", '{"a b": ["X", 1, null]}',
                "<body>Hi There</body>", "plain Words"]
    langs = ["py", "json", "html", "txt"]
    out = tokenize_column(pa.array(contents), pa.array(langs)).to_pylist()
    expected = [tokenize_doc(c, l) for c, l in zip(contents, langs)]
    assert out == expected


def test_tokenize_column_all_plain_fast_path():
    out = tokenize_column(pa.array(["A b", "C  d\te"])).to_pylist()
    assert out == [["a", "b"], ["c", "d", "e"]]


def test_tokenize_column_edge_whitespace_matches_python_split():
    # arrow's split emits '' at string edges; python's split doesn't —
    # the column path must match python exactly (incl. dl counts)
    texts = ["  lead", "trail  ", "  both  ", "", "   ", "a\n"]
    out = tokenize_column(pa.array(texts)).to_pylist()
    assert out == [[t.lower() for t in s.split()] for s in texts]
