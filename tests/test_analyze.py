"""Analyzer golden tests (SURVEY.md §5 item 1): M3-M6 semantics."""

import pandas as pd

from rayindex.analyze import Analyzer, make_analyzer, simple_analyzer

DICT = {"кошка": "кот", "кошки": "кот", "кошкой": "кот", "дома": "дом", "дом": "дом"}
PARTS = {"и", "в", "но", "ах"}


def make():
    return Analyzer(lemma_map=DICT, particles=PARTS, keep="а-я")


def test_cyrillic_only_normalization():
    a = make()
    # digits, Latin, punctuation, and ё all become separators (M3)
    assert dict(a.collect_lemmas("Кошка123 cat ёлка!")) == {"кот": 1, "лка": 1}


def test_particles_dropped():
    a = make()
    assert dict(a.collect_lemmas("кошка и дом, но ах")) == {"кот": 1, "дом": 1}


def test_first_normal_form_and_identity_fallback():
    a = make()
    # кошки → кот (dict); неизвестное → itself (M5 identity fallback)
    assert dict(a.collect_lemmas("кошки неизвестное")) == {"кот": 1, "неизвестное": 1}


def test_tf_counts():
    a = make()
    got = a.collect_lemmas("кошка кошки кошкой дом дома")
    assert dict(got) == {"кот": 3, "дом": 2}


def test_blank_and_stripped_to_nothing():
    a = make()
    assert dict(a.collect_lemmas("")) == {}
    assert dict(a.collect_lemmas("only latin 42!")) == {}


def test_vectorized_matches_rowwise(fixture_corpus):
    a = make_analyzer(fixture_corpus.analyzer_spec)
    texts = pd.Series(fixture_corpus.pages.column("text").to_pylist()[:60])
    ex = a.lemmatize_series(texts)
    for i in range(len(texts)):
        rows = ex[ex["row"] == i]
        assert dict(zip(rows["term"], rows["tf"])) == dict(a.collect_lemmas(texts[i]))


def test_simple_analyzer_en():
    a = simple_analyzer()
    got = a.collect_lemmas("The Table, the table and 42 tables!")
    assert dict(got) == {"table": 2, "42": 1, "tables": 1}
