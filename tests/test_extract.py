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


# --- hybrid extractor: byte-identical to the parser on ANY input ----------

# One exemplar per divergence class the fuzz campaign found (each of these
# made an earlier fast/hybrid draft diverge from the parser; the detector in
# rayindex/extract.py flags the row back to the parser path).
HYBRID_ADVERSARIAL = [
    '<a href="foo>bar">x</a>y',          # A: '>' inside a quoted attr value
    "<a href='foo>bar'>x</a>y",          # A: single-quote variant
    '<a x="q>r" y="s>t">even quotes',    # A: even quote count, '>' inside
    'lcb\'t<p"#]c;dsttc">tt',            # A2a/H: quote in the tag-name token
    ']ccr<c="psb/;c="x>ye]a',            # A2a: name swallows '="' then fails
    'a < b and c > d',                   # B: '<' that is not a tag start
    '< p>text',                          # B
    '<![CDATA[ foo > bar ]]>x',          # C: CDATA section
    '&l<b></b>t; end',                   # D: entity interrupted by a tag
    'aax&<sr#pl#i\t \'y\'ttc ?s>ltd',    # D: bare '&' cut by a tag
    'ti</p<adptcsx\ne=s>"pe[aa',         # E: '<' inside an end-tag span
    'abc<p attr',                        # E': tag open unclosed at EOF
    'tail</ p>tail',                     # G: end tag with a space (parser
                                         #    emits a block boundary)
    '<p&= #p>x',                         # H: name runs through punctuation
    '<p\v>x y',                          # H: \v is a name char to the parser
    '<script>unclosed... text',          # F: unclosed CDATA block
    '<script> <!-- </script> --> x</script>',  # F: comment/script interleave
    '<script>a<template>b</script>c</template>d',  # F: interleaved closes
    '<template>?><script>"<p><script></template>-->x',  # F: nested opens
    '?>\'<template><div class="x">"</template><?',  # T: block tag inside
                                         #    template emits a separator
    '><template>><p>]]><<p></template>text ',      # T
    'iaeet<?lx\'\nit<p t>ie?-',          # P: block tag nested in a PI
    '<!DOCTYPE x "q>u">tail',            # declaration with '>' in quotes
    '<![rc garbage>boom',                # parser-crash fallback (AssertionError
                                         #    from _markupbase on bad marked section)
]


def test_hybrid_matches_parser_on_divergence_classes():
    import pyarrow as pa

    from rayindex.extract import extract_batch_hybrid

    t = pa.table({
        "url": [f"u{i}" for i in range(len(HYBRID_ADVERSARIAL))],
        "html": [s.encode("utf-8") for s in HYBRID_ADVERSARIAL],
    })
    a = extract_batch(t)
    b = extract_batch_hybrid(t)
    for i, case in enumerate(HYBRID_ADVERSARIAL):
        assert (
            a.column("extracted_text")[i].as_py() == b.column("extracted_text")[i].as_py()
        ), case
    assert a.column("title").to_pylist() == b.column("title").to_pylist()


def test_hybrid_matches_parser_on_fixture_corpus(fixture_corpus):
    from rayindex.extract import extract_batch_hybrid

    a = extract_batch(fixture_corpus.pages)
    b = extract_batch_hybrid(fixture_corpus.pages)
    assert a.column("extracted_text").to_pylist() == b.column("extracted_text").to_pylist()
    assert a.column("title").to_pylist() == b.column("title").to_pylist()


def test_hybrid_matches_parser_fuzz():
    """Seeded slice of the adversarial fuzz campaign (the full run covered
    ~250k rows across three generators with zero mismatches)."""
    import random

    import pyarrow as pa

    from rayindex.extract import extract_batch_hybrid

    random.seed(20260820)
    alpha = "ab c<>&\"'/=!-;#x[]?pscriptstyleitlecdata\n\t\v"
    frags = HYBRID_ADVERSARIAL + ["<p>ok</p>", "text ", '<div class="a">x</div>']
    rows = []
    for _ in range(400):
        if random.random() < 0.5:
            rows.append("".join(random.choice(alpha) for _ in range(random.randint(0, 200))))
        else:
            rows.append("".join(random.choice(frags) for _ in range(random.randint(1, 6))))
    t = pa.table({
        "url": [f"u{i}" for i in range(len(rows))],
        "html": [r.encode("utf-8") for r in rows],
    })
    a = extract_batch(t)
    b = extract_batch_hybrid(t)
    for i in range(len(rows)):
        assert (
            a.column("extracted_text")[i].as_py() == b.column("extracted_text")[i].as_py()
        ), repr(rows[i])
        assert a.column("title")[i].as_py() == b.column("title")[i].as_py(), repr(rows[i])


def test_parser_crash_fallback_is_deterministic():
    """CPython HTMLParser raises on '<![rc'-style marked sections; extract_text
    must not propagate (one bad page must not kill a build task)."""
    out = extract_text("before <![rc garbage>after")
    assert isinstance(out, str)
    # deterministic: same input, same output
    assert out == extract_text("before <![rc garbage>after")


def test_hybrid_empty_batch():
    import pyarrow as pa

    from rayindex.extract import extract_batch_hybrid

    t = pa.table({"url": pa.array([], type=pa.string()), "html": pa.array([], type=pa.binary())})
    out = extract_batch_hybrid(t)
    assert out.num_rows == 0
    assert out.column("extracted_text").type == pa.string()
    assert out.column("title").type == pa.string()


def test_null_html_is_empty_page_in_all_extractors():
    """A crawl table WILL contain null html rows (failed fetches); the
    semantics are 'empty page' ("" text, "" title) in every extractor — one
    null row must neither kill a build task nor emit a null extracted_text."""
    import pyarrow as pa

    from rayindex.extract import extract_batch_fast, extract_batch_hybrid

    t = pa.table({
        "url": ["a", "b", "c"],
        "html": pa.array([b"<p>hi</p>", None, b"x<b>y</b>z"], type=pa.binary()),
    })
    for fn in (extract_batch, extract_batch_fast, extract_batch_hybrid):
        out = fn(t)
        assert out.column("extracted_text").to_pylist() == ["hi", "", "xyz"], fn.__name__
        assert out.column("title").to_pylist() == ["", "", ""], fn.__name__
    # all-null batch (the fast path's bytes-dtype sniff must not trip on it)
    t2 = pa.table({"url": ["a"], "html": pa.array([None], type=pa.binary())})
    for fn in (extract_batch, extract_batch_fast, extract_batch_hybrid):
        out = fn(t2)
        assert out.column("extracted_text").to_pylist() == [""], fn.__name__


def test_non_utf8_html_replaced_in_all_extractors():
    """Real crawls contain non-UTF-8 pages; one must not kill a build task.
    Canonical semantics: U+FFFD per bad byte (Python errors="replace"),
    identical across the parser, fast and hybrid paths."""
    import pyarrow as pa

    from rayindex.extract import extract_batch_fast, extract_batch_hybrid

    t = pa.table({
        "url": ["a", "b"],
        "html": pa.array([b"<p>caf\xe9</p>", b"<p>ok</p>"], type=pa.binary()),
    })
    want = ["caf�", "ok"]
    for fn in (extract_batch, extract_batch_fast, extract_batch_hybrid):
        out = fn(t)
        assert out.column("extracted_text").to_pylist() == want, fn.__name__
