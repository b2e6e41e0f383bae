"""Snippet builder — F1-F4 of SURVEY.md §2.8, faithful to the reference.

Reference (services/SearchingServiceImpl.java):

- F1 ``findSentencePattern`` (:331-360): ``[^.!?;]*[Uu]w1 (U|u)w2 ...[^.!?;]*``
  — "sentences" (runs without ``.!?;``) containing the raw query words
  ADJACENT and IN ORDER, each word's first letter case-insensitive.
- F2 ``equalsMatchingWords`` (:362-390): ``\\b[Uu]w1 [Uu]w2 ...\\b`` variant
  used as a confirmation match inside each candidate sentence.
- F3 ``getPatternForContainsIgnoreCase`` (:392-405): per-letter char-class
  whole-word pattern, used to collect case-preserving occurrences.
- F4 ``createSnippet``/``trimSnippetSentence`` (:418-505): for each distinct
  matched surface form: trim context around occurrences (120 chars per side
  with ``...``), wrap every occurrence in ``<b>…</b>``; cap: a result longer
  than 300 chars is truncated to 249.  Quirks kept faithfully: a split part of
  EXACTLY 120 chars is dropped (neither <120 nor >120 branch matches), Java
  ``split`` drops trailing empty parts, and the words are matched against the
  progressively mutated sentence.
- Fallback string when nothing matches (:177-181).

Snippets match raw query *words*, not lemmas (``query.trim().split(" ")``,
:171).  The reference picks ``snippetList.get(0)`` from a ``HashSet`` — a
nondeterministic choice; we define the deterministic equivalent: candidate
sentences are processed in order of appearance in the page text.

This is a driver-side / top-k-only stage (≤ k rows per query), not a
distributed operator.
"""

from __future__ import annotations

import re

NO_MATCH_SNIPPET = "Нет совпадений на этой странице"


def _first_letter_class(word: str) -> str:
    u, low = word[0].upper(), word[0].lower()
    return f"[{re.escape(u)}{re.escape(low)}]{re.escape(word[1:])}"


def find_sentence_pattern(query_words: list[str]) -> str:
    """F1 (services/SearchingServiceImpl.java:331-360)."""
    if not query_words:
        return "[^.!?;]*"
    parts = ["[^.!?;]*", _first_letter_class(query_words[0])]
    for w in query_words[1:]:
        u, low = w[0].upper(), w[0].lower()
        parts.append(f" ({re.escape(u)}|{re.escape(low)}){re.escape(w[1:])}")
    parts.append("[^.!?;]*")
    return "".join(parts)


def equals_matching_words(query_words: list[str]) -> str:
    """F2 (:362-390)."""
    if not query_words:
        return r"\b"
    parts = [r"\b", _first_letter_class(query_words[0])]
    for w in query_words[1:]:
        parts.append(" " + _first_letter_class(w))
    parts.append(r"\b")
    return "".join(parts)


def contains_ignore_case_pattern(word: str) -> str:
    """F3 (:392-405): per-letter [Uu] classes with word boundaries."""
    body = "".join(f"[{re.escape(c.upper())}{re.escape(c.lower())}]" for c in word)
    return rf"(\b{body}\b)"


def _java_split(s: str, sep: str) -> list[str]:
    """Java String.split(literal): trailing empty strings removed."""
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def trim_snippet_sentence(sentence: str, word: str) -> str:
    """F4 trim (:455-505) — faithful incl. the len==120 drop quirk."""
    parts = _java_split(sentence, word)
    out: list[str] = []
    for i, part in enumerate(parts):
        last = i == len(parts) - 1
        if i % 2 == 0 and len(part) > 120:
            if i > 0:
                out.append(part[:120])
            else:
                out.append("...")
                out.append(part[-120:])
            if not last:
                out.append(word)
        if i % 2 == 0 and len(part) < 120:
            out.append(part)
            if not last:
                out.append(word)
        if i % 2 != 0 and len(part) > 120:
            out.append(part[:120])
            out.append("...")
            if not last:
                out.append(word)
        if i % 2 != 0 and len(part) < 120:
            out.append(part)
            if not last:
                out.append(word)
    result = "".join(out)
    if len(result) > 300:
        result = result[:249]
    return result


_DELIM_RE = re.compile(r"[.!?;]")


def _anchor_pattern(query_words: list[str]) -> str:
    """The adjacency core of F1 — ``find_sentence_pattern`` without the
    ``[^.!?;]*`` context wings."""
    parts = [_first_letter_class(query_words[0])]
    for w in query_words[1:]:
        u, low = w[0].upper(), w[0].lower()
        parts.append(f" ({re.escape(u)}|{re.escape(low)}){re.escape(w[1:])}")
    return "".join(parts)


def _sentences_ref(query_words: list[str], page_text: str):
    """Literal F1 scan: candidate sentences exactly as
    ``finditer(find_sentence_pattern(...))`` yields them.  Kept as the
    reference semantics (tests pin the fast path to it) and as the runtime
    path when a query word contains a sentence delimiter — then the anchor
    can span runs and the fast expansion below would be wrong."""
    sent_re = re.compile(find_sentence_pattern(query_words))
    for m in sent_re.finditer(page_text):
        yield m.group()


def _sentences_fast(query_words: list[str], page_text: str):
    """Equivalent candidate stream in O(text):  F1's pattern
    ``[^.!?;]*ANCHOR[^.!?;]*`` always matches the FULL delimiter-free run
    containing an anchor occurrence (the greedy wings extend to the run's
    ends, and the scan reaches the run start first), and ``finditer``
    resumes at the run end — so the matches are exactly: for each anchor at
    or after the previous run's end, that anchor's enclosing run.  The
    literal scan backtracks the leading wing per start position (quadratic
    on long non-matching runs: ~80 ms per 5 M-corpus doc measured); this
    path finds anchors with one linear scan and expands via bisect on the
    delimiter positions."""
    import bisect

    anchor_re = re.compile(_anchor_pattern(query_words))
    delims: list[int] | None = None
    e_prev = 0
    for m in anchor_re.finditer(page_text):
        a = m.start()
        if a < e_prev:
            continue
        if delims is None:  # computed lazily: no anchor → no delimiter scan
            delims = [d.start() for d in _DELIM_RE.finditer(page_text)]
        i = bisect.bisect_left(delims, a)
        s = (delims[i - 1] + 1) if i else 0
        j = bisect.bisect_left(delims, m.end())
        e = delims[j] if j < len(delims) else len(page_text)
        yield page_text[s:e]
        e_prev = e


def create_snippet(query: str, page_text: str) -> str:
    """F4 (:418-453): first matching sentence, bolded and trimmed; fallback."""
    query_words = [w for w in query.strip().split(" ") if w]
    if not query_words or not page_text:
        return NO_MATCH_SNIPPET
    confirm_re = re.compile(equals_matching_words(query_words))
    delim_in_words = bool(_DELIM_RE.search(" ".join(query_words)))
    gen = (_sentences_ref if delim_in_words else _sentences_fast)(
        query_words, page_text
    )
    # deterministic stand-in for the reference's HashSet: order of appearance
    # (dedup-by-string cannot change which sentence comes FIRST, and only the
    # first confirmed sentence is used — so confirm lazily and stop there)
    sentence = None
    for cand in gen:
        if confirm_re.search(cand):
            sentence = cand
            break
    if sentence is None:
        return NO_MATCH_SNIPPET
    for word in query_words:
        matches = re.findall(contains_ignore_case_pattern(word), sentence)
        if not matches:
            continue
        done = ""
        for surface in matches:
            if surface in done:  # Java contains() dedup quirk (:440-442)
                continue
            sentence = trim_snippet_sentence(sentence, surface)
            sentence = sentence.replace(surface, f"<b>{surface}</b>")
            done += surface
    return sentence
