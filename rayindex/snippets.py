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


def create_snippet(query: str, page_text: str) -> str:
    """F4 (:418-453): first matching sentence, bolded and trimmed; fallback."""
    query_words = [w for w in query.strip().split(" ") if w]
    if not query_words or not page_text:
        return NO_MATCH_SNIPPET
    sent_re = re.compile(find_sentence_pattern(query_words))
    confirm_re = re.compile(equals_matching_words(query_words))
    # deterministic stand-in for the reference's HashSet: order of appearance,
    # dedup by sentence string
    seen: set[str] = set()
    candidates: list[str] = []
    for m in sent_re.finditer(page_text):
        sentence = m.group()
        if sentence in seen:
            continue
        if confirm_re.search(sentence):
            seen.add(sentence)
            candidates.append(sentence)
    if not candidates:
        return NO_MATCH_SNIPPET
    sentence = candidates[0]
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
