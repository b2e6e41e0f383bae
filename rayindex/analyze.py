"""Tokenization / lemmatization — M3-M6 and actor stage ST1 of SURVEY.md §2.

Reference semantics (dto/indexing/Lemmatizator.java):

- M3 normalizer (:97-102): lowercase → replace ``[^а-я\\s]`` with a space →
  trim → split on ``\\s+``.  Only Cyrillic а-я survives — digits, Latin,
  punctuation and even ``ё`` (U+0451, outside а-я) become spaces.  Java's
  ``\\s`` is ASCII ``[ \\t\\n\\x0B\\f\\r]``; we use the same explicit class.
- M4 particle filter (:84-95): drop the word when any morph form carries
  МЕЖД/ПРЕДЛ/СОЮЗ — here a per-form boolean in the closed dictionary.
- M5 first normal form (:47-52): ``getNormalForms(word).get(0)``; unknown
  words fall back to identity (deterministic replacement for Lucene
  RussianLuceneMorphology, which is not available / not deterministic here).
- M6 collectLemmas (:33-62): per-document ``{lemma: occurrence count}``.

The reference wastefully re-instantiates the morphology per page
(dto/indexing/PageIndexer.java:74) and per query
(services/SearchingServiceImpl.java:38).  Here the analyzer state (dictionary
+ compiled regex) lives in an **actor pool**: ``map_batches(LemmatizeStage,
concurrency=N)`` loads it once per actor in ``__init__`` (broadcast via
``ray.put`` when a dict ref is given) and processes batches vectorized
(pandas str kernels + explode + groupby — no per-row Python loop).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .schema import doc_ids_for_urls

# Java \s (dto/indexing/Lemmatizator.java:99 uses "[^а-я\s]")
_JAVA_WS = " \t\n\x0b\f\r"


class Analyzer:
    """Closed-dictionary analyzer with the reference's collectLemmas semantics.

    ``strip_class`` is the char class replaced by spaces (the reference uses
    ``[^а-я\\s]``; the English bench analyzer keeps ``a-z0-9``).
    """

    def __init__(
        self,
        lemma_map: dict[str, str] | None = None,
        particles: set[str] | frozenset[str] | None = None,
        keep: str = "а-я",
    ):
        self.lemma_map = dict(lemma_map or {})
        self.particles = frozenset(particles or ())
        self.keep = keep
        self._strip_re = re.compile(f"[^{keep}{_JAVA_WS}]")
        self._split_re = re.compile(f"[{_JAVA_WS}]+")

    # -- row-wise (driver/query/oracle path) --------------------------------
    def collect_lemmas(self, text: str) -> Counter:
        """M6: document text → {lemma: tf} (Lemmatizator.java:33-62)."""
        cleaned = self._strip_re.sub(" ", text.lower()).strip()
        out: Counter = Counter()
        if not cleaned:
            return out
        for word in self._split_re.split(cleaned):
            if not word or word in self.particles:
                continue
            out[self.lemma_map.get(word, word)] += 1
        return out

    def lemma_positions(self, text: str) -> list[tuple[str, int]]:
        """Ordered (lemma, word-position) pairs for a query phrase; particles
        consume a position but emit no pair, and the position counter matches
        the positional index layer (rank among non-empty normalized tokens).
        Returns None-marker via empty list for blank text."""
        cleaned = self._strip_re.sub(" ", text.lower()).strip()
        out: list[tuple[str, int]] = []
        if not cleaned:
            return out
        pos = 0
        for word in self._split_re.split(cleaned):
            if not word:
                continue
            if word in self.particles:
                pos += 1
                continue
            out.append((self.lemma_map.get(word, word), pos))
            pos += 1
        return out

    # -- vectorized (actor batch path) --------------------------------------
    def lemmatize_arrow(
        self, texts: pa.Array | pa.ChunkedArray, with_positions: bool = False
    ) -> tuple:
        """Arrow-native M3-M6 over a batch → (rows, terms, tfs) — plus, when
        ``with_positions``, a per-(row, term) delta+varbyte blob of the
        term's word positions (position = rank among the row's NON-EMPTY
        normalized tokens, particles included — i.e. the word index in the
        squeeze-normalized text the phrase verifier matches against).

        All per-token work happens in C++ kernels (lower, regex replace,
        split, flatten, dictionary-encode); the Python-level lemma/particle
        lookup touches only the batch's UNIQUE tokens.  Semantically exactly
        ``collect_lemmas`` per row; output (row, term) order is
        (row, first-token-appearance-in-dictionary) — grouped by row.
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lowered = pc.utf8_lower(texts)
        cleaned = pc.replace_substring_regex(
            lowered, pattern=self._strip_re.pattern, replacement=" "
        )
        lists = pc.split_pattern_regex(cleaned, pattern=self._split_re.pattern)
        tokens = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        if len(tokens) == 0:
            empty3 = (np.empty(0, np.int64), pa.array([], pa.string()), np.empty(0, np.int64))
            return empty3 + ([],) if with_positions else empty3
        denc = tokens.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        uniq = denc.dictionary.to_pylist()
        # per unique token: drop empties/particles (M4), first normal form or
        # identity (M5); distinct surface forms can share a lemma, so counts
        # key on a lemma id, not the surface-form id
        lemma_to_id: dict[str, int] = {}
        # int32 throughout the flat-token arrays: unique-token and row counts
        # are far below 2^31, and halving the per-batch fresh footprint
        # matters twice — cache pressure everywhere, and first-touch page
        # faults on hosts where new anonymous memory is expensive
        uniq_to_lid = np.empty(len(uniq), dtype=np.int32)
        for i, u in enumerate(uniq):
            if u == "" or u in self.particles:
                uniq_to_lid[i] = -1
                continue
            m = self.lemma_map.get(u, u)
            uniq_to_lid[i] = lemma_to_id.setdefault(m, len(lemma_to_id))
        idx = denc.indices.to_numpy(zero_copy_only=False)
        lids = uniq_to_lid[idx]
        keep = lids >= 0
        rows = parents[keep]
        kept_lids = lids[keep]
        # tf counting on integer keys (row, lemma_id) — pure numpy; the key
        # fits int32 when n_rows * n_lemmas does (always true for the
        # default 2048-row batches), else fall back to int64
        n_lemmas = max(1, len(lemma_to_id))
        if len(lists) * n_lemmas < 2**31:
            key = (rows.astype(np.int32) * np.int32(n_lemmas)).astype(np.int32)
            key += kept_lids
        else:
            key = rows.astype(np.int64) * n_lemmas + kept_lids
        if not with_positions:
            uk, counts = np.unique(key, return_counts=True)
        else:
            # word position per flat token: rank among the row's non-empty
            # tokens (particles count — they occupy a slot in the normalized
            # text even though they are not indexed)
            uniq_is_word = np.array([u != "" for u in uniq], dtype=bool)
            is_word = uniq_is_word[idx]
            cnt = np.cumsum(is_word)
            start_idx = np.flatnonzero(
                np.concatenate(([True], parents[1:] != parents[:-1]))
            )
            base_at_start = cnt[start_idx] - is_word[start_idx]
            seg_lens = np.diff(np.concatenate((start_idx, [len(parents)])))
            base = np.repeat(base_at_start, seg_lens)
            pos_kept = (cnt - 1 - base)[keep].astype(np.uint64)
            order = np.argsort(key, kind="stable")
            sp = pos_kept[order]
            uk, counts = np.unique(key[order], return_counts=True)
            ends = np.cumsum(counts)
            starts = ends - counts
            # delta-encode positions, resetting at group (posting) heads, then
            # ONE vectorized varbyte pass sliced into per-posting blobs
            deltas = sp.copy()
            if sp.size:
                deltas[1:] = sp[1:] - sp[:-1]
                deltas[starts] = sp[starts]
            from .codec import varbyte_encode, varbyte_lengths

            blob_all = varbyte_encode(deltas)
            boff = np.concatenate(([0], np.cumsum(varbyte_lengths(deltas))))
            blobs = [blob_all[boff[s] : boff[e]] for s, e in zip(starts, ends)]
        out_rows = (uk // n_lemmas).astype(np.int64)
        out_lids = (uk % n_lemmas).astype(np.int64)
        lemma_arr = pa.array(list(lemma_to_id.keys()), pa.string())
        out_terms = lemma_arr.take(pa.array(out_lids))
        if with_positions:
            return out_rows, out_terms, counts.astype(np.int64), blobs
        return out_rows, out_terms, counts.astype(np.int64)

    def lemmatize_series(self, texts: pd.Series) -> pd.DataFrame:
        """Compatibility wrapper → DataFrame(row, term, tf)."""
        rows, terms, tfs = self.lemmatize_arrow(pa.array(texts, pa.string()))
        return pd.DataFrame({"row": rows, "term": terms.to_numpy(zero_copy_only=False), "tf": tfs})


def reference_russian_analyzer(lemma_map: dict[str, str], particles: set[str]) -> Analyzer:
    """Conformance analyzer: Cyrillic-only survival (Lemmatizator.java:97-102)."""
    return Analyzer(lemma_map=lemma_map, particles=particles, keep="а-я")


# English stop-set for the bench corpus: plays the МЕЖД/ПРЕДЛ/СОЮЗ particle
# role so the frequent-lemma cutoff & particle paths are exercised in English.
EN_STOPWORDS = frozenset("a an the and of in to is on at by for with".split())


def simple_analyzer() -> Analyzer:
    """Latin+digit analyzer (identity lemmas) for the bench corpus."""
    return Analyzer(lemma_map=None, particles=EN_STOPWORDS, keep="a-z0-9")


def make_analyzer(spec: dict) -> Analyzer:
    """Registry (SURVEY.md §2.11): build an analyzer from a plain-dict spec."""
    name = spec.get("name", "simple")
    if name == "reference_ru":
        return reference_russian_analyzer(spec["lemma_map"], set(spec["particles"]))
    if name == "simple":
        return simple_analyzer()
    raise KeyError(f"unknown analyzer {name!r}")


class LemmatizeStage:
    """ST1 actor: pages batch → exploded postings (doc_id, site, term, tf, doc_len).

    ``analyzer_spec`` is either a plain dict or a ``ray.ObjectRef`` to one
    (broadcast once with ``ray.put`` by the driver and fetched once per actor
    here — never re-shipped per batch).  ``text_col`` names the input text
    column (``extracted_text`` in the pipeline).
    """

    def __init__(self, analyzer_spec, text_col: str = "extracted_text",
                 positions: bool = False):
        if isinstance(analyzer_spec, ray.ObjectRef):
            analyzer_spec = ray.get(analyzer_spec)
        self.analyzer = make_analyzer(analyzer_spec)
        self.text_col = text_col
        self.positions = positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "doc_id" in batch.schema.names:  # P2 passes the stored id through
            doc_ids = batch.column("doc_id").to_numpy().astype(np.int64)
        else:  # standalone use over raw pages
            doc_ids = doc_ids_for_urls(batch.column("url").to_pandas().to_numpy())
        pos_blobs: list[bytes] = []
        if self.positions:
            rows, terms, tfs, pos_blobs = self.analyzer.lemmatize_arrow(
                batch.column(self.text_col), with_positions=True
            )
        else:
            rows, terms, tfs = self.analyzer.lemmatize_arrow(batch.column(self.text_col))
        # doc_len = Σ tf per document (A8) — computable batch-locally because
        # every posting of a doc comes from the same input row.
        dl_per_row = np.zeros(len(batch), dtype=np.int64)
        np.add.at(dl_per_row, rows, tfs)
        # `first` marks one posting row per doc (rows are sorted ascending by
        # construction), letting the doclen table be a shuffle-free filter.
        # Docs with ZERO terms still get one marker row (term "", tf 0) so the
        # doclen table is exactly one row per document — the fused P3 derives
        # n_docs / per-site pages from it; ``encode_group`` drops the markers.
        has_terms = np.zeros(len(batch), dtype=bool)
        has_terms[rows] = True
        empty_rows = np.nonzero(~has_terms)[0].astype(np.int64)
        if len(rows):
            first = np.concatenate(([True], rows[1:] != rows[:-1]))
        else:
            first = np.zeros(0, dtype=bool)
        if len(empty_rows):
            rows = np.concatenate([rows, empty_rows])
            terms = pa.concat_arrays(
                [terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms,
                 pa.array([""] * len(empty_rows), pa.string())]
            )
            tfs = np.concatenate([tfs, np.zeros(len(empty_rows), np.int64)])
            first = np.concatenate([first, np.ones(len(empty_rows), bool)])
            if self.positions:
                pos_blobs = pos_blobs + [b""] * len(empty_rows)
        sites = pc.take(batch.column("site"), pa.array(rows))
        cols = {
            "doc_id": pa.array(doc_ids[rows], type=pa.int64()),
            "site": sites,
            "term": terms,
            "tf": pa.array(tfs.astype(np.uint32), type=pa.uint32()),
            "doc_len": pa.array(dl_per_row[rows].astype(np.uint32), type=pa.uint32()),
            "first": pa.array(first, type=pa.bool_()),
        }
        if self.positions:
            cols["positions"] = pa.array(pos_blobs, type=pa.binary())
        return pa.table(cols)
