"""Pinned extractor spec (FIXTURES.md §D) — the byte-identity source."""

from tweetf0rm_spark.extract import extract_outlinks, extract_text


def test_blocks_emit_newlines():
    html = b"<html><body><p>one</p><p>two</p><div>three</div></body></html>"
    assert extract_text(html) == "one\ntwo\nthree"


def test_script_style_dropped():
    html = b"<body><script>var x=1;</script><style>p{}</style><p>keep</p></body>"
    assert extract_text(html) == "keep"


def test_whitespace_collapse_and_strip():
    html = b"<body><p>  a   b\t c  </p><p>   </p></body>"
    assert extract_text(html) == "a b c"


def test_inline_tags_emit_nothing():
    html = b"<body><p>a<b>b</b><i>c</i>d</p></body>"
    assert extract_text(html) == "abcd"


def test_br_and_title():
    html = b"<html><head><title>T</title></head><body>x<br>y</body></html>"
    assert extract_text(html) == "T\nx\ny"


def test_no_trailing_newline():
    out = extract_text(b"<body><p>a</p></body>")
    assert not out.endswith("\n")


def test_charrefs_decoded():
    assert extract_text(b"<body><p>a&amp;b &lt;c&gt;</p></body>") == "a&b <c>"


def test_outlinks_document_order():
    html = (
        b'<body><a href="https://a.example/1">x</a>'
        b'<a href="https://a.example/2">y</a>'
        b"<a>no-href</a>"
        b'<a href="https://a.example/3">z</a></body>'
    )
    assert extract_outlinks(html) == [
        "https://a.example/1",
        "https://a.example/2",
        "https://a.example/3",
    ]


def test_none_and_str_inputs():
    assert extract_text(None) is None
    assert extract_text("<body><p>s</p></body>") == "s"
    assert extract_outlinks(None) == []


def test_utf8_strict():
    assert extract_text("<body><p>héllo wörld</p></body>".encode()) == "héllo wörld"


def test_corpus_text_column_matches_extractor(corpus):
    """pages.text is BY CONSTRUCTION the extractor output — re-extract
    and compare byte-for-byte (the BASELINE.json:L15 invariant)."""
    sample = corpus.pages.head(100)
    for _, row in sample.iterrows():
        assert extract_text(row.html) == row.text
