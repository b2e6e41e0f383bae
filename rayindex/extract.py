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
    """Visible text with jsoup ``Element.text()`` whitespace semantics."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
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
    htmls = raw.str.decode("utf-8") if raw.dtype == object and len(raw) and isinstance(raw.iloc[0], bytes) else raw
    if not isinstance(htmls, pd.Series):
        htmls = pd.Series(htmls)
    texts = extract_text_fast(htmls)
    titles = extract_titles_fast(htmls)
    batch = batch.append_column("extracted_text", pa.array(texts.to_numpy(), type=pa.string()))
    batch = batch.append_column("title", pa.array(titles.to_numpy(), type=pa.string()))
    return batch


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
        s = raw.decode("utf-8") if isinstance(raw, (bytes, bytearray)) else raw
        texts.append(extract_text(s))
        titles.append(extract_title(s))
    batch = batch.append_column("extracted_text", pa.array(texts, type=pa.string()))
    batch = batch.append_column("title", pa.array(titles, type=pa.string()))
    return batch
