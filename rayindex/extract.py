"""HTML → (text, title) extraction — M1/M2 of SURVEY.md §2.2.

The reference extracts visible text with jsoup: ``Jsoup.parse(content).text()``
(dto/indexing/PageIndexer.java:93, services/IndexingPageServiceImpl.java:83,
query-side services/SearchingServiceImpl.java:168).  jsoup ``Element.text()``
semantics, which this module reproduces and the input invariant pins
byte-for-byte per url:

- all descendant text nodes are concatenated (including ``<head>``/``<title>``
  text — those are TextNodes in jsoup);
- ``<script>``/``<style>`` bodies are DataNodes in jsoup, hence EXCLUDED;
  comments excluded;
- a single separating space appears at block-element boundaries and ``<br>``;
  no separator at inline boundaries (``a<b>b</b>c`` → ``abc``);
- runs of ASCII whitespace collapse to one space; result is trimmed.

Title (M2): the reference takes the raw substring between literal ``<title>``
and ``</title>`` via indexOf (services/SearchingServiceImpl.java:163-167) and
crashes when absent — fixtures therefore always carry a title; we return ""
for the absent case.

This is a **stateless** ``map_batches`` stage (tasks, not actors): HTML
parsing is inherently per-document, but each batch stays an Arrow table and
the parser/regexes are module-level (compiled once per worker process).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

# jsoup block tags that produce a whitespace boundary in text() (subset
# relevant to web pages; jsoup Tag.isBlock + <br> special case).
_BLOCK_TAGS = frozenset(
    """html head body title p div h1 h2 h3 h4 h5 h6 ul ol li dl dt dd table
    thead tbody tfoot tr td th blockquote pre article section header footer
    nav aside main form fieldset address hr caption figure figcaption br
    noscript center""".split()
)
_SKIP_TAGS = frozenset({"script", "style", "template"})
_WS_RUN = re.compile(r"[ \t\n\r\f\v]+")
_TITLE_OPEN = "<title>"
_TITLE_CLOSE = "</title>"


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if not self._skip_depth:
            self.parts.append(data)


def extract_text(html: str) -> str:
    """Visible text with jsoup ``Element.text()`` whitespace semantics.

    CPython's HTMLParser raises (AssertionError from ``_markupbase``) on
    malformed marked sections like ``<![rc``; a crawl-scale corpus WILL
    contain such bytes, and one bad page must not kill a build task — fall
    back to the regex path for that row (deterministic, and the hybrid
    extractor inherits the same choice because it delegates to this
    function).
    """
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        import pandas as pd

        return extract_text_fast(pd.Series([html])).iloc[0]
    return _WS_RUN.sub(" ", "".join(p.parts)).strip()


def extract_title(html: str) -> str:
    """Raw substring between literal ``<title>`` and ``</title>`` (M2)."""
    i = html.find(_TITLE_OPEN)
    if i < 0:
        return ""
    j = html.find(_TITLE_CLOSE, i)
    if j < 0:
        return ""
    return html[i + len(_TITLE_OPEN) : j]


_BLOCK_TAG_RE = re.compile(
    r"(?i)</?(?:" + "|".join(sorted(_BLOCK_TAGS)) + r")\b[^>]*/?>"
)
_SKIP_BLOCK_RE = re.compile(r"(?is)<(script|style|template)\b[^>]*>.*?</\1\s*>")
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")


def extract_text_fast(htmls: "pd.Series") -> "pd.Series":
    """Vectorized regex fast path with the same semantics as ``extract_text``
    on well-formed markup (C regex engines instead of a per-char Python
    parser; ~2× faster on this corpus and friendlier to multi-core scaling).

    Known divergence from the parser path: attribute values containing a
    literal ``>`` truncate the tag early (regexes cannot pair quotes).  The
    build pipeline verifies fast≡parser per corpus in tests; use the parser
    path (``extractor="parser"``) for adversarial input.
    """
    import html as _html

    s = htmls
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    s = s.str.replace(_SKIP_BLOCK_RE, "", regex=True)  # jsoup DataNodes excluded
    s = s.str.replace(_BLOCK_TAG_RE, "\n", regex=True)  # block boundaries
    s = s.str.replace(_ANY_TAG_RE, "", regex=True)  # inline tags: no separator
    # entity decoding only where entities exist (rare; python fallback)
    mask = s.str.contains("&", regex=False)
    if mask.any():
        s = s.copy()
        s[mask] = s[mask].map(_html.unescape)
    return s.str.replace(_WS_RUN, " ", regex=True).str.strip()


def extract_titles_fast(htmls: "pd.Series") -> "pd.Series":
    """M2 literal-substring semantics, vectorized."""
    return htmls.str.extract(r"(?s)<title>(.*?)</title>", expand=False).fillna("")


def extract_batch_fast(batch: pa.Table) -> pa.Table:
    """Fast-path counterpart of ``extract_batch`` (same output columns)."""
    import pandas as pd

    raw = batch.column("html").to_pandas()
    nonnull = raw.dropna()
    is_bytes = raw.dtype == object and len(nonnull) and isinstance(nonnull.iloc[0], bytes)
    htmls = raw.str.decode("utf-8", errors="replace") if is_bytes else raw
    if not isinstance(htmls, pd.Series):
        htmls = pd.Series(htmls)
    # null html (failed fetch) = empty page — matches extract_batch
    htmls = htmls.fillna("")
    texts = extract_text_fast(htmls)
    titles = extract_titles_fast(htmls)
    batch = batch.append_column("extracted_text", pa.array(texts.to_numpy(), type=pa.string()))
    batch = batch.append_column("title", pa.array(titles.to_numpy(), type=pa.string()))
    return batch


# ---------------------------------------------------------------------------
# Hybrid path: the vectorized kernels over every row — run as pyarrow.compute
# RE2 kernels (C++, zero-copy, no Python objects) — plus a vectorized SUSPECT
# detector that routes only rows whose markup could make the regex path
# diverge from the parser back through ``extract_text``.  Every known
# divergence class has a detector (each one is a case in
# tests/test_extract.py; the classes were found by fuzzing hybrid vs parser
# over ~250k adversarial rows):
#
#   A. quotes that CPython pairs differently from a first-'>' truncation —
#      a ``>`` inside a quoted attr value, quotes inside tag/attr NAMES
#      (two-stage: A2a name-token quotes, A2b residual-quote validation
#      after erasing well-formed '="..."' values and paired bare strings);
#   B. a ``<`` that is not a tag start (``< b``, ``<1>``) — the parser keeps
#      it as text, the regexes may strip it;
#   C. CDATA / exotic declarations (``<![``);
#   D. an entity interrupted by a tag (``&l<b></b>t;``) — stripping the tag
#      first would fuse a decodable entity the parser never sees;
#   E. a tag-open with another ``<`` before its ``>`` or unclosed at EOF;
#   G. an end tag not followed by a letter (``</ p>`` is an end tag to the
#      parser, invisible to the block regex);
#   H. CPython's tolerant tag-name scan runs through punctuation ('<p"x>' is
#      a tag NAMED 'p"x') while the regexes' \b stops at it;
#   P. a PI/declaration with a nested '<' (the parser may consume a block
#      tag INSIDE the instruction);
#   T. <template> — NOT a CDATA element in CPython: block tags inside it
#      still fire separator events while the span removal deletes them
#      wholesale; template is rare enough to always take the parser path;
#   F. script/style/<!-- tokens SURVIVING the skip-block and comment removal
#      passes (unclosed blocks, comment/script interleave), plus a per-type
#      open/close count mismatch for the CDATA tags (nesting/interleaving
#      pairs differently in CDATA mode than in a non-greedy span removal).
#
# Detectors are deliberately conservative: a false positive only costs that
# row a parser pass; a miss would cost correctness, so each regex flags the
# whole construct class.  The skip-block pass runs BEFORE the comment pass
# (CPython's HTMLParser enters CDATA mode inside <script>, so comment
# markers inside script bodies are script text, not comments).
#
# RE2 has no lookarounds, so the "not followed by" branches are expanded
# into char-class + end-of-string alternatives.
_SPECIAL_TAG_ALT = "|".join(sorted(_BLOCK_TAGS | _SKIP_TAGS))
_RE2_MISC = (
    r"<([^a-zA-Z!/?]|$)"  # B: not a tag start
    r"|<!\["  # C: CDATA-ish declaration
    r"|&[-a-zA-Z0-9#]{0,32}<"  # D: entity cut by a tag (incl. bare '&<')
    r"|</?[a-zA-Z][^\s/>]*[\"']"  # A2a: quote inside the tag-NAME token
    r"|</?[a-zA-Z][^>]*<"  # E: '<' inside a tag span
    r"|</?[a-zA-Z][^<>]*$"  # E': tag open never closed at EOF
    r"|</([^a-zA-Z]|$)"  # G: end tag not followed by a letter
    r"|<[?!][^<>]*<"  # P: PI/declaration with a nested '<'
    r"|(?i)</?template\b"  # T: template always takes the parser path
    r"|(?i)(</?(" + _SPECIAL_TAG_ALT + r"))[^\w \t\n\r\f/>]"  # H
)
_RE2_ATTR_VALUE = r"=[\t\n\r\f ]*(\"[^\"<>]*\"|'[^'<>]*')"
_RE2_BARE_QSTRING = r"\"[^\"<>=]*\"|'[^'<>=]*'"
_RE2_SPAN_QUOTE = r"<[^<>]*[\"']"
_RE2_RESIDUAL = r"(?i)</?(script|style|template)\b|<!--"
_RE2_BLOCK_TAG = r"(?i)</?(" + "|".join(sorted(_BLOCK_TAGS)) + r")\b[^>]*/?>"
_CDATA_TAGS = ("script", "style")  # CPython's CDATA_CONTENT_ELEMENTS


def suspect_mask(htmls: pa.Array) -> pa.Array:
    """Pass-1 suspects over raw html (pass 2 — the residual skip/comment
    check — runs inside ``extract_batch_hybrid`` on the intermediate)."""
    import pyarrow.compute as pc

    quoteless = pc.replace_substring_regex(htmls, pattern=_RE2_ATTR_VALUE, replacement="=V")
    quoteless = pc.replace_substring_regex(quoteless, pattern=_RE2_BARE_QSTRING, replacement="Q")
    suspect = pc.or_(
        pc.match_substring_regex(quoteless, _RE2_SPAN_QUOTE),
        pc.match_substring_regex(htmls, _RE2_MISC),
    )
    if pc.any(pc.match_substring_regex(htmls, r"(?i)<(script|style)\b")).as_py():
        for tag in _CDATA_TAGS:
            opens = pc.count_substring_regex(htmls, rf"(?i)<{tag}\b")
            closes = pc.count_substring_regex(htmls, rf"(?i)</{tag}\b")
            suspect = pc.or_(suspect, pc.not_equal(opens, closes))
    return suspect


def extract_batch_hybrid(batch: pa.Table) -> pa.Table:
    """Vectorized extraction with per-row parser fallback — byte-identical to
    ``extract_batch`` on ANY input (fuzzed in tests), at RE2 speed on the
    well-formed majority.  This is the default build extractor."""
    import pyarrow.compute as pc

    html_col = batch.column("html")
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    if pa.types.is_string(html_col.type):
        s0 = html_col
    else:
        try:
            s0 = pc.cast(html_col, pa.string())  # zero-copy validate, common case
        except pa.lib.ArrowInvalid:
            # non-UTF-8 bytes (real crawls contain them): U+FFFD-replace like
            # the parser path — Python-loop only on batches with bad bytes
            s0 = pa.array(
                [b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else b
                 for b in html_col.to_pylist()],
                type=pa.string(),
            )
    # null html (failed fetch) = empty page — matches extract_batch; a null
    # here would otherwise flow a null extracted_text into the analyzer
    s0 = pc.fill_null(s0, "")
    if len(s0) == 0:
        batch = batch.append_column("extracted_text", pa.array([], type=pa.string()))
        return batch.append_column("title", pa.array([], type=pa.string()))
    suspect = suspect_mask(s0)
    x = s0
    for tag in ("script", "style", "template"):
        x = pc.replace_substring_regex(
            x, pattern=rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", replacement=""
        )
    x = pc.replace_substring_regex(x, pattern=r"(?s)<!--.*?-->", replacement="")
    suspect = pc.or_(suspect, pc.match_substring_regex(x, _RE2_RESIDUAL))
    x = pc.replace_substring_regex(x, pattern=_RE2_BLOCK_TAG, replacement="\n")
    x = pc.replace_substring_regex(x, pattern=r"<[^>]+>", replacement="")
    amp = pc.match_substring(x, "&")
    if pc.any(amp).as_py():
        import html as _html

        vals = x.to_pylist()
        x = pa.array(
            [_html.unescape(v) if m else v for v, m in zip(vals, amp.to_pylist())],
            type=pa.string(),
        )
    x = pc.replace_substring_regex(x, pattern=r"[ \t\n\r\f\v]+", replacement=" ")
    x = pc.utf8_trim(x, " \t\n\r\f\v")
    if pc.any(suspect).as_py():
        sus = s0.filter(suspect).to_pylist()
        x = pc.replace_with_mask(
            x, suspect, pa.array([extract_text(h) for h in sus], type=pa.string())
        )
    titles = pc.fill_null(
        pc.struct_field(pc.extract_regex(s0, r"(?s)<title>(?P<t>.*?)</title>"), "t"), ""
    )
    batch = batch.append_column("extracted_text", x)
    return batch.append_column("title", titles)



def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: pages(url, html, ...) → + extracted_text, title.

    Keeps the batch Arrow end-to-end; emits ``extracted_text`` alongside the
    input ``text`` column so the byte-identity invariant (input_hint) can be
    asserted downstream (tests) without losing the golden column.
    """
    htmls = batch.column("html").to_pylist()
    texts = []
    titles = []
    for raw in htmls:
        # errors="replace": a non-UTF-8 page (real crawls contain them) must
        # not kill the build task — U+FFFD per bad byte, same in every path
        s = raw.decode("utf-8", "replace") if isinstance(raw, (bytes, bytearray)) else raw
        if s is None:
            # null html (failed fetch) = empty page; one bad row must not
            # kill a build task, and downstream already handles "" docs
            s = ""
        texts.append(extract_text(s))
        titles.append(extract_title(s))
    batch = batch.append_column("extracted_text", pa.array(texts, type=pa.string()))
    batch = batch.append_column("title", pa.array(titles, type=pa.string()))
    return batch
