"""Extraction golden tests (SURVEY.md §5 item 2): jsoup-Element.text()
whitespace semantics and the byte-identical-per-url invariant."""

from rayindex.extract import extract_batch, extract_text, extract_title

GOLDEN = [
    # whitespace collapse + block boundaries
    (
        "<html><head><title>T</title></head><body><p>a  b</p><p>c</p></body></html>",
        "T a b c",
    ),
    # inline tags do not separate
    ("<html><body><p>a<b>b</b>c</p></body></html>", "ab​c".replace("​", "")),
    # script/style excluded (jsoup DataNodes)
    ("<html><body><p>x</p><script>var y=2;</script><style>p{}</style></body></html>", "x"),
    # <br> is a boundary
    ("<html><body>a<br>b</body></html>", "a b"),
    # newlines/tabs collapse
    ("<html><body><p>a\n\t b</p></body></html>", "a b"),
    # entity decoding
    ("<html><body><p>a &amp; b</p></body></html>", "a & b"),
    # heading + nested lists
    (
        "<html><body><h1>H</h1><ul><li>one</li><li>two</li></ul></body></html>",
        "H one two",
    ),
]


def test_golden_pairs():
    for html, want in GOLDEN:
        assert extract_text(html) == want, html


def test_title_literal_substring():
    assert extract_title("<html><head><title>A &amp; B</title></head></html>") == "A &amp; B"
    assert extract_title("<html><body>no title</body></html>") == ""


def test_byte_identical_invariant(fixture_corpus):
    """input_hint: extracted text must equal the pages.text column per url."""
    out = extract_batch(fixture_corpus.pages)
    assert out.column("extracted_text").to_pylist() == out.column("text").to_pylist()


def test_every_fixture_page_has_title(fixture_corpus):
    """Missing <title> crashes the reference (SearchingServiceImpl.java:163-167)."""
    out = extract_batch(fixture_corpus.pages)
    assert all(t for t in out.column("title").to_pylist())


def test_extractor_never_crashes_on_fuzzed_html():
    """Robustness: arbitrary tag soup must parse without raising."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(alphabet="<>ab c/!&;=\"'пqт-\n", max_size=300))
    @settings(max_examples=200, deadline=None)
    def run(s):
        out = extract_text(s)
        assert isinstance(out, str)
        assert "  " not in out  # whitespace always collapsed
        assert out == out.strip()
        extract_title(s)

    run()


def test_fast_extractor_matches_parser(fixture_corpus):
    """The vectorized regex path must be byte-identical to the parser path on
    the corpus family (well-formed markup)."""
    from rayindex.extract import extract_batch_fast

    a = extract_batch(fixture_corpus.pages)
    b = extract_batch_fast(fixture_corpus.pages)
    assert a.column("extracted_text").to_pylist() == b.column("extracted_text").to_pylist()
    assert a.column("title").to_pylist() == b.column("title").to_pylist()
