"""Real byte-pair-encoding tokenizer: Sennrich-style merge training over a
distributed word histogram + GPT-2-style merge-rank encoding in an actor pool.

Round 2 shipped ``textops.token_count_bpe`` — a BPE-ish *regex* count kept
because a real trained tokenizer seemed out of reach.  It isn't: BPE is a
published algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the merge-rank encoder is the
GPT-2 public reference implementation's algorithm) and needs no external
libraries.  This module implements it for real:

- **Training input is a word histogram, not the corpus** — the published
  approach.  The histogram is computed DISTRIBUTED (per-batch partial
  value-counts → global groupby-sum → top-K by (count desc, word asc)), so
  only the bounded K-row vocabulary ever reaches the driver; at 100 TB the
  corpus streams, the histogram stays K rows.
- **Training is incremental-pair-count BPE** (the subword-nmt optimization):
  pair counts and a pair→words index are maintained across merges instead of
  rescanning the vocabulary each round, so a merge costs only the words it
  touches.
- **Encoding is an actor-pool stage**: merge ranks are built once per actor
  in ``__init__``; each batch dictionary-encodes its token column and
  encodes only UNIQUE words (a persistent per-actor cache carries across
  batches); per-document totals come from numpy segment sums.

Determinism: merge ties break on the lexicographically smallest pair, and
the histogram's top-K cut breaks count ties on the word, so training is
reproducible across runs and parallelism levels (pinned by tests).

No SQL oracle: BPE training/encoding is iterative and not expressible in
DuckDB, so the driver entry is rows-only; equivalence against a pure-driver
brute force, reconstruction (tokens concatenate to the word), and
determinism are pinned by pytest instead.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

END = "</w>"  # end-of-word marker symbol (Sennrich)
_NORM_PATTERN = "[^a-z0-9]+"  # same surface normalization as the 'simple' analyzer


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Merge all non-overlapping occurrences of ``pair``, left to right."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _word_pairs(syms: list[str]) -> Counter:
    c: Counter = Counter()
    for i in range(len(syms) - 1):
        c[(syms[i], syms[i + 1])] += 1
    return c


def train_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a word→count histogram.

    Incremental algorithm: global pair counts plus a pair→word-index map are
    updated per merge (only touched words are re-scanned).  Stops early when
    the best pair occurs once (merging hapax pairs only memorizes words).
    Ties on count break on the lexicographically smallest pair.
    """
    words: list[list[str]] = []
    counts: list[int] = []
    for w, n in sorted(word_counts.items()):
        if not w:
            continue
        words.append(list(w) + [END])
        counts.append(int(n))

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(zip(words, counts)):
        for p, k in _word_pairs(syms).items():
            pair_counts[p] += k * n
            pair_words.setdefault(p, set()).add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        for idx in list(pair_words.get(best, ())):
            syms = words[idx]
            n = counts[idx]
            before = _word_pairs(syms)
            merged = _merge_word(syms, best)
            after = _word_pairs(merged)
            words[idx] = merged
            for p, k in (before - after).items():
                pair_counts[p] -= k * n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
                elif p in pair_words and p not in after:
                    pair_words[p].discard(idx)
            for p, k in (after - before).items():
                pair_counts[p] += k * n
                pair_words.setdefault(p, set()).add(idx)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style encoding: repeatedly apply the LOWEST-rank applicable
    merge (all its occurrences at once) until none applies."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        syms = _merge_word(syms, best)
    return syms


def word_histogram(sf_dir: str, top_k: int = 65536) -> dict[str, int]:
    """Distributed word histogram over ``documents.text``: per-batch partial
    value-counts → global groupby-sum → deterministic top-K cut
    (count desc, word asc).  Only K rows reach the driver."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.replace_substring_regex(
                    pc.utf8_lower(t.column("text")), pattern=_NORM_PATTERN, replacement=" "
                ),
                pattern=" +",
            )
        )
        vc = toks.combine_chunks().value_counts()
        words = vc.field("values")
        ns = vc.field("counts").cast(pa.int64())
        keep = pc.not_equal(words, "")
        return pa.table({"word": words.filter(keep), "n": ns.filter(keep)})

    hist = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .sum("n")
    )
    df = hist.to_pandas()  # bounded: unique normalized words, then cut to K
    df = df.rename(columns={"sum(n)": "n"})
    df = df.sort_values(["n", "word"], ascending=[False, True], kind="mergesort").head(top_k)
    return dict(zip(df["word"], df["n"].astype(int)))


class BpeEncodeStage:
    """Actor stage: text → per-doc BPE token totals.  Merge ranks build once
    per actor; unique words encode once and cache across batches."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref) if isinstance(merges_ref, ray.ObjectRef) else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._cache: dict[str, int] = {}  # word → token count

    def _count(self, word: str) -> int:
        got = self._cache.get(word)
        if got is None:
            got = len(encode_word(word, self.ranks))
            self._cache[word] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(batch.column("text")), pattern=_NORM_PATTERN, replacement=" "
            ),
            pattern=" +",
        )
        toks = pc.list_flatten(lists).combine_chunks()
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        n_rows = len(batch)
        totals = np.zeros(n_rows, dtype=np.int64)
        nwords = np.zeros(n_rows, dtype=np.int64)
        if len(toks):
            denc = toks.dictionary_encode()
            if isinstance(denc, pa.ChunkedArray):
                denc = denc.combine_chunks()
            uniq = denc.dictionary.to_pylist()
            per_uniq = np.fromiter(
                (0 if u == "" else self._count(u) for u in uniq),
                dtype=np.int64,
                count=len(uniq),
            )
            idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(totals, parents, per_uniq[idx])
            np.add.at(nwords, parents, (per_uniq[idx] > 0).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(nwords, pa.int64()),
                "n_bpe_tokens": pa.array(totals, pa.int64()),
            }
        )


def bpe_tokens(sf_dir: str, n_merges: int = 200, top_k: int = 65536) -> rd.Dataset:
    """End-to-end trained-BPE token counting: distributed histogram → driver
    merge training (bounded input) → broadcast ranks → actor-pool encode.
    Returns (doc_id, n_words, n_bpe_tokens)."""
    from .textops import auto_concurrency

    merges = train_bpe(word_histogram(sf_dir, top_k=top_k), n_merges=n_merges)
    merges_ref = ray.put(merges)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        BpeEncodeStage,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=auto_concurrency(),
        batch_size=1024,
    )
