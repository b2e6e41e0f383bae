"""Trained-BPE tokenizer: golden merges on the published example corpus,
reconstruction/determinism properties, and the distributed pipeline vs a
pure-driver brute force."""

import numpy as np
import pytest

from rayindex.bpe import END, encode_word, train_bpe


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_golden_merges_sennrich_example():
    # hand-traced with (count desc, pair asc) tie-break
    merges = train_bpe(SENNRICH, n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_golden_encode_lowest():
    merges = train_bpe(SENNRICH, n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + END]
    # unseen word falls back to chars + marker where no merge applies
    assert encode_word("zq", ranks) == ["z", "q", END]


def test_reconstruction_property():
    rng = np.random.default_rng(3)
    vocab = {
        "".join(rng.choice(list("abcdef"), size=rng.integers(1, 9))): int(n)
        for n in rng.integers(1, 50, size=120)
    }
    merges = train_bpe(vocab, n_merges=64)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(vocab) + ["fedcba", "aaaa", "x"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END  # tokens concatenate to the word


def test_training_deterministic_and_early_stop():
    assert train_bpe(SENNRICH, n_merges=5) == train_bpe(SENNRICH, n_merges=5)
    # all-hapax vocabulary with no repeated pair across words → stops at once
    assert train_bpe({"ab": 1, "cd": 1}, n_merges=10) == []


def test_incremental_counts_match_rescan():
    # the incremental trainer must equal a naive rescan-every-round trainer
    from collections import Counter

    from rayindex.bpe import _merge_word, _word_pairs

    def naive(word_counts, n_merges):
        words = {w: list(w) + [END] for w in sorted(word_counts) if w}
        merges = []
        for _ in range(n_merges):
            pc = Counter()
            for w, syms in words.items():
                for p, k in _word_pairs(syms).items():
                    pc[p] += k * word_counts[w]
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if pc[best] < 2:
                break
            merges.append(best)
            words = {w: _merge_word(s, best) for w, s in words.items()}
        return merges

    rng = np.random.default_rng(11)
    vocab = {
        "".join(rng.choice(list("abcd"), size=rng.integers(2, 7))): int(n)
        for n in rng.integers(1, 20, size=60)
    }
    assert train_bpe(vocab, n_merges=40) == naive(vocab, 40)


@pytest.mark.usefixtures("ray_session")
def test_bpe_pipeline_vs_bruteforce():
    import pyarrow.parquet as pq

    from rayindex.bpe import bpe_tokens, train_bpe, word_histogram, encode_word

    sf = "/root/testdata/sf0.001"
    got = bpe_tokens(sf, n_merges=50).to_pandas().sort_values("doc_id").reset_index(drop=True)

    hist = word_histogram(sf)
    merges = train_bpe(hist, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    tab = (
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    norm = re.compile("[^a-z0-9]+")
    want_tokens, want_words = [], []
    for text in tab["text"]:
        words = [w for w in norm.sub(" ", text.lower()).split() if w]
        want_words.append(len(words))
        want_tokens.append(sum(len(encode_word(w, ranks)) for w in words))
    assert list(got["doc_id"]) == list(tab["doc_id"])
    assert list(got["n_words"]) == want_words
    assert list(got["n_bpe_tokens"]) == want_tokens
    # trained merges actually compress: fewer tokens than chars, more than words
    assert (got["n_bpe_tokens"] >= got["n_words"]).all()
