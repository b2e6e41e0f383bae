"""Snippet conformance (F1-F4, SURVEY.md §2.8)."""

from rayindex.snippets import (
    NO_MATCH_SNIPPET,
    create_snippet,
    trim_snippet_sentence,
)


def test_basic_bolding():
    text = "Тут кошка сидит. Другое предложение."
    assert create_snippet("кошка", text) == "Тут <b>кошка</b> сидит"


def test_first_letter_case_insensitive():
    text = "Кошка сидит тут. Нет совпадений."
    assert create_snippet("кошка", text) == "<b>Кошка</b> сидит тут"


def test_phrase_must_be_adjacent_in_order():
    text = "кошка тут и дом там."
    # words present but not adjacent → no sentence matches the F1 pattern
    assert create_snippet("кошка дом", text) == NO_MATCH_SNIPPET
    text2 = "вот кошка дом стоит."
    got = create_snippet("кошка дом", text2)
    assert "<b>кошка</b>" in got and "<b>дом</b>" in got


def test_no_match_fallback():
    assert create_snippet("отсутствует", "просто текст.") == NO_MATCH_SNIPPET


def test_sentence_split_on_punctuation():
    text = "первая часть без слова. вторая кошка часть! третья."
    got = create_snippet("кошка", text)
    assert got == " вторая <b>кошка</b> часть"


def test_trim_long_context():
    long_left = "л" * 200
    sentence = f"{long_left} кошка хвост"
    got = trim_snippet_sentence(sentence, "кошка")
    assert got.startswith("...")
    # 120 chars of left context survive
    assert got == "..." + "л" * 119 + " " + "кошка" + " хвост"


def test_cap_300_truncates_to_249():
    sentence = "а" * 115 + " кошка " + "б" * 115 + " кошка " + "в" * 115
    got = trim_snippet_sentence(sentence, "кошка")
    assert len(got) <= 249


def test_multiple_occurrences_all_bolded():
    text = "кошка видит кошка бежит."
    got = create_snippet("кошка", text)
    assert got.count("<b>кошка</b>") == 2


def test_snippets_never_crash_on_fuzzed_input():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.text(alphabet="абв xy.?!;()[]*+\\", max_size=60),
        st.text(alphabet="абвгд xy.?!; ", max_size=300),
    )
    @settings(max_examples=150, deadline=None)
    def run(query, text):
        out = create_snippet(query, text)
        assert isinstance(out, str)

    run()


def test_fast_sentence_stream_equals_literal_f1_scan():
    """_sentences_fast must yield exactly the strings the literal
    finditer(find_sentence_pattern) scan yields, on texts exercising anchors
    at run starts/ends, repeated anchors in one run, delimiter runs, and
    no-match pages."""
    import random

    from rayindex.snippets import _sentences_fast, _sentences_ref

    rng = random.Random(13)
    vocab = ["stream", "Stream", "group", "rows", "key", "x.y", "a;b",
             "...", "the", "of", ";", ".", "!", "?", "zz"]
    for trial in range(300):
        words = [rng.choice(["stream", "group"]),
                 rng.choice(["rows", "key"])][: rng.randint(1, 2)]
        n = rng.randint(0, 60)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        if rng.random() < 0.5 and n:
            # plant the anchor phrase somewhere
            pos = rng.randint(0, len(text))
            text = text[:pos] + " " + " ".join(words) + " " + text[pos:]
        ref = list(_sentences_ref(words, text))
        fast = list(_sentences_fast(words, text))
        assert fast == ref, (trial, words, text)


def test_create_snippet_delimiter_word_falls_back(monkeypatch):
    """A query word containing a sentence delimiter must route through the
    literal F1 scan (the anchor may span delimiter runs there, which the
    fast run-expansion cannot handle); delimiter-free queries must take the
    fast path.  Routing is pinned with raising sentinels, and the fallback's
    output value is pinned exactly."""
    from rayindex import snippets as sn

    text = "alpha x.y beta. other sentence"
    assert sn.create_snippet("x.y", text) == "alpha <b>x.y</b> beta"
    assert sn.create_snippet("x.y beta", text) == "alpha <b>x.y</b> "

    def _boom(*_a, **_k):
        raise AssertionError("wrong sentence-candidate path")

    # delimiter in a query word → the fast path must NOT be consulted
    monkeypatch.setattr(sn, "_sentences_fast", _boom)
    assert sn.create_snippet("x.y", text) == "alpha <b>x.y</b> beta"
    monkeypatch.undo()
    # delimiter-free query → the literal scan must NOT be consulted
    # (the 'y ' value is the reference's F2-F4 trim-quirk output, pinned
    # as-is; what matters here is the routing plus value stability)
    monkeypatch.setattr(sn, "_sentences_ref", _boom)
    assert sn.create_snippet("beta", text) == "y "
