"""Deterministic fixtures (FIXTURES.md): the `pages` input table
(BASELINE.json input_hint schema), the closed lemma dictionary replacing
RussianLuceneMorphology (dto/indexing/Lemmatizator.java:14-17), and the
reference query set.  Everything is seeded — no wall clock, no external data.

Two corpora:

- ``gen_fixture()`` — the single-site Russian conformance corpus (single-site
  because the reference's multi-site search path is ill-defined, SURVEY.md
  §3.2): Zipf term distribution over ~500 lemmas, one head lemma on ≥85 % of
  pages (exercises the 80 % frequent-lemma cutoff,
  services/SearchingServiceImpl.java:272-298, and shuffle salting), every page
  carries a ``<title>`` (missing titles crash the reference,
  services/SearchingServiceImpl.java:163-167).
- ``pages_from_documents()`` — the bench corpus: the driver's
  ``documents.parquet`` text wrapped into the same pages schema, replicated
  deterministically to bench size, written as many Parquet fragments so both
  scaling runs have ample read parallelism.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import PAGES_SCHEMA

_LETTERS = "абвгдежзиклмнопрстуфхцчшщыэюя"
_SUFFIXES = ["", "а", "ом", "ами", "у", "ах", "ы", "е", "ой", "ов"]
# ~20 real Russian particles (МЕЖД/ПРЕДЛ/СОЮЗ classes, Lemmatizator.java:12)
PARTICLES = (
    "и в на но ах ой же ли бы не ни под над от до из у о к с за при об для".split()
)
_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds
_LATIN_WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
SITE = "fixture.example"
SITE_URL = f"https://{SITE}"


@dataclass
class Fixture:
    pages: pa.Table
    lemma_map: dict[str, str]
    particles: set[str]
    queries: list[dict]
    lemmas: list[str] = field(default_factory=list)  # rank order (0 = head)
    forms: dict[str, list[str]] = field(default_factory=dict)  # lemma → forms

    @property
    def analyzer_spec(self) -> dict:
        return {
            "name": "reference_ru",
            "lemma_map": self.lemma_map,
            "particles": sorted(self.particles),
        }


def _gen_vocab(rng: np.random.Generator, n_lemmas: int):
    lemmas: list[str] = []
    seen: set[str] = set(PARTICLES)
    while len(lemmas) < n_lemmas:
        length = int(rng.integers(4, 9))
        w = "".join(rng.choice(list(_LETTERS), size=length))
        if w not in seen:
            seen.add(w)
            lemmas.append(w)
    lemma_map: dict[str, str] = {}
    forms: dict[str, list[str]] = {}
    for lem in lemmas:
        n_forms = int(rng.integers(2, 6))
        fs = [lem]
        lemma_map[lem] = lem
        for suf in rng.permutation(_SUFFIXES[1:])[: n_forms - 1]:
            f = lem + suf
            if f not in seen:
                seen.add(f)
                lemma_map[f] = lem
                fs.append(f)
        forms[lem] = fs
    return lemmas, lemma_map, forms


def _page_html(title: str, heading: str, paragraphs: list[str]) -> tuple[str, str]:
    """Build HTML + its golden jsoup-text (block boundaries → single spaces)."""
    body = f"<h1>{heading}</h1>" + "".join(f"<p>{p}</p>" for p in paragraphs)
    html = f"<html><head><title>{title}</title></head><body>{body}</body></html>"
    golden = " ".join([title, heading, *paragraphs])
    return html, golden


def gen_fixture(n_pages: int = 2000, n_lemmas: int = 500, seed: int = 42) -> Fixture:
    """The conformance corpus: pages + dictionary + query set."""
    rng = np.random.default_rng(seed)
    lemmas, lemma_map, forms = _gen_vocab(rng, n_lemmas)
    head = lemmas[0]
    # Zipf sampling over lemma ranks
    ranks = np.arange(1, n_lemmas + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    phrase = f"{forms[lemmas[10]][0]} {forms[lemmas[11]][0]}"  # verbatim snippet phrase

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_pages):
        url = f"{SITE_URL}/p/{i:08d}"
        is_en = (i % 40) == 7  # ~2.5 % Latin pages → strip-to-nothing path
        title = f"Страница {i:08d} {forms[lemmas[int(rng.integers(1, n_lemmas))]][0]}"
        if is_en:
            heading = "latin page"
            paragraphs = [" ".join(rng.choice(_LATIN_WORDS, size=12))]
        else:
            heading = " ".join(
                forms[lemmas[j]][int(rng.integers(0, len(forms[lemmas[j]])))]
                for j in rng.choice(n_lemmas, size=3, p=probs)
            )
            paragraphs = []
            for _ in range(int(rng.integers(1, 5))):
                n_words = int(rng.integers(5, 31))
                ws = []
                for j in rng.choice(n_lemmas, size=n_words, p=probs):
                    lem = lemmas[j]
                    ws.append(forms[lem][int(rng.integers(0, len(forms[lem])))])
                    # sprinkle particles (dropped by M4)
                    if rng.random() < 0.15:
                        ws.append(PARTICLES[int(rng.integers(0, len(PARTICLES)))])
                paragraphs.append(" ".join(ws))
            if rng.random() < 0.85:  # head lemma on ≥85 % of pages → 80 % cutoff
                paragraphs.append(forms[head][0])
            if i % 97 == 3:
                paragraphs.append(f"Вот {phrase} здесь.")
        html, golden = _page_html(title, heading, paragraphs)
        urls.append(url)
        tss.append(_EPOCH_US + i * 1_000_000)
        htmls.append(html.encode("utf-8"))
        texts.append(golden)
        langs.append("en" if is_en else "ru")

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )

    # query set (~50 queries; FIXTURES.md §3)
    queries: list[dict] = []
    qid = 0

    def q(text: str, site: str | None = None):
        nonlocal qid
        queries.append({"query_id": qid, "query": text, "site": site})
        qid += 1

    q(forms[head][0])  # head term alone → cut by 80 % rule → empty
    q("ققق")  # unknown word (strips to nothing)
    q("nonexistentlatin")  # strips to nothing under [^а-я]
    q(phrase)  # verbatim phrase (snippet bolding path)
    for k in range(1, 24):
        lem = lemmas[(7 * k) % n_lemmas]
        fs = forms[lem]
        q(fs[k % len(fs)])  # single term, inflected forms included
    for k in range(24, 40):
        a = lemmas[(5 * k + 1) % n_lemmas]
        b = lemmas[(11 * k + 3) % n_lemmas]
        q(f"{forms[a][k % len(forms[a])]} {forms[b][(k + 1) % len(forms[b])]}")
    for k in range(40, 48):
        a, b, c = (lemmas[(3 * k + m) % n_lemmas] for m in range(3))
        q(f"{forms[a][0]} {forms[b][0]} {forms[c][0]}")
    q(f"{forms[head][0]} {forms[lemmas[20 % n_lemmas]][0]}")  # head + mid: head cut, mid survives
    q(f"{forms[lemmas[30 % n_lemmas]][0]} ыыыы")  # known word + unknown word

    return Fixture(
        pages=pages,
        lemma_map=lemma_map,
        particles=set(PARTICLES),
        queries=queries,
        lemmas=lemmas,
        forms=forms,
    )


def write_pages(table: pa.Table, out_dir: str, n_fragments: int = 16) -> str:
    """Write a pages table as ``n_fragments`` Parquet files (read parallelism)."""
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    per = max(1, (n + n_fragments - 1) // n_fragments)
    for k, lo in enumerate(range(0, n, per)):
        pq.write_table(table.slice(lo, per), os.path.join(out_dir, f"part-{k:05d}.parquet"))
    return out_dir


def pages_from_documents(
    documents_path: str,
    out_dir: str,
    repeat: int = 1,
    n_fragments: int = 64,
    body_repeat: int = 1,
) -> str:
    """Bench corpus: wrap the driver's documents table into the pages schema.

    Deterministic (row order + repeat index only).  ``site`` is encoded in the
    url host as ``{source}.bench.example`` so per-site stats/df semantics have
    multiple sites to aggregate over.  ``body_repeat`` repeats the body
    paragraphs to approximate realistic web-page sizes (real Common-Crawl
    pages are tens of KB; the driver's document texts are ~100-400 B) —
    it multiplies extraction/lemmatization compute without growing the
    posting-row count (term *frequencies* grow, distinct terms per doc do
    not).  Idempotent: returns early when the output manifest marker exists.
    """
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    docs = pq.read_table(documents_path, columns=["doc_id", "text", "lang", "source"])
    os.makedirs(out_dir, exist_ok=True)
    d_ids = docs.column("doc_id").to_pylist()
    # The SQL oracles reconstruct warc_ts as EPOCH + doc_id·1s (repeat=1), so
    # the stamp below derives from doc_id, not the row index.  The driver's
    # documents table has doc_id == row index, making the two equivalent —
    # pin that assumption here so a filtered/reordered corpus fails loudly
    # instead of silently diverging from the oracles.
    if d_ids != list(range(len(d_ids))):
        raise ValueError(
            "pages_from_documents: documents.parquet doc_id must equal the "
            "row index (the oracle SQL reconstructs warc_ts from doc_id)"
        )
    d_texts = docs.column("text").to_pylist()
    d_langs = docs.column("lang").to_pylist()
    d_srcs = docs.column("source").to_pylist()
    rows_total = len(d_ids) * repeat
    per_frag = max(1, (rows_total + n_fragments - 1) // n_fragments)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    frag = 0
    written = 0
    for r in range(repeat):
        for i in range(len(d_ids)):
            did = d_ids[i]
            url = f"https://{d_srcs[i]}.bench.example/d/{did:08d}/{r}"
            title = f"doc {did} rep {r}"
            body_words = d_texts[i].split()
            # 2 paragraphs exercise block-boundary extraction
            half = max(1, len(body_words) // 2)
            paragraphs = [" ".join(body_words[:half]), " ".join(body_words[half:]) or "tail"]
            if body_repeat > 1:
                paragraphs = paragraphs * body_repeat
            if r:
                paragraphs.append(f"rep{r}")
            html, golden = _page_html(title, f"heading {did}", paragraphs)
            urls.append(url)
            tss.append(_EPOCH_US + (r * len(d_ids) + did) * 1_000_000)
            htmls.append(html.encode("utf-8"))
            texts.append(golden)
            langs.append(d_langs[i])
            if len(urls) >= per_frag:
                t = pa.table(
                    {
                        "url": pa.array(urls, pa.string()),
                        "warc_ts": pa.array(tss, pa.timestamp("us")),
                        "html": pa.array(htmls, pa.binary()),
                        "text": pa.array(texts, pa.string()),
                        "lang": pa.array(langs, pa.string()),
                    },
                    schema=PAGES_SCHEMA,
                )
                pq.write_table(t, os.path.join(out_dir, f"part-{frag:05d}.parquet"))
                written += t.num_rows
                frag += 1
                urls, tss, htmls, texts, langs = [], [], [], [], []
    if urls:
        t = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            },
            schema=PAGES_SCHEMA,
        )
        pq.write_table(t, os.path.join(out_dir, f"part-{frag:05d}.parquet"))
        written += t.num_rows
    with open(marker, "w") as f:
        f.write(str(written))
    return out_dir
