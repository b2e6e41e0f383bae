"""Brute-force oracle of the reference's build + query semantics.

A deliberately simple dict-of-dicts implementation, independent of the Ray
pipeline and the compressed segments, used by the conformance suite: the
engine's index snapshot and its ranked results must match this oracle exactly
(SURVEY.md §5 items 3-4).

Semantics implemented verbatim from the reference (single-site path — the
multi-site loop is ill-defined, SURVEY.md §3.2):

- build: per page collectLemmas → tf postings; per-site df counters
  (dto/indexing/PageIndexer.java:161-204).
- query (services/SearchingServiceImpl.java:30-201):
  1. collectLemmas(query) (:41)
  2. lemma rows looked up per (lemma, site); UNKNOWN lemmas are silently
     dropped (no row → no LemmaEntity, :203-270)
  3. frequent-lemma cutoff: keep iff Math.round(100*df/site_pages) < 80
     (:272-298); Java Math.round = floor(x+0.5)
  4. rarest-first order (:58-62); tie → (df, term) ascending (our
     deterministic refinement of Java's unstable map ordering)
  5. progressive AND intersection (:96-107)
  6. relevance = Σtf over surviving query lemmas, normalized by the max over
     candidates (:300-329)
  7. sort relevance desc (:186-189); tie → doc_id asc (deterministic
     refinement).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass, field

from .analyze import Analyzer
from .schema import doc_ids_for_urls


def java_round(x: float) -> int:
    """Java Math.round(float): floor(x + 0.5)."""
    return math.floor(x + 0.5)


@dataclass
class OracleIndex:
    analyzer: Analyzer
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term → {doc: tf}
    df: dict[tuple[str, str], int] = field(default_factory=dict)  # (site, term) → df
    site_pages: Counter = field(default_factory=Counter)
    doc_site: dict[int, str] = field(default_factory=dict)
    doc_url: dict[int, str] = field(default_factory=dict)
    doc_len: dict[int, int] = field(default_factory=dict)
    doc_text: dict[int, str] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return sum(self.site_pages.values())


def build_oracle_index(pages_rows: list[dict], analyzer: Analyzer,
                       num_shards: int = 1) -> OracleIndex:
    """pages rows (url, text, …) → in-memory index. ``text`` is the golden
    extracted text (the build path's extractor is tested separately).
    ``num_shards`` must match the build's sharding so doc ids agree (the id
    embeds the shard index — schema.py)."""
    from .schema import hash64_strings
    import numpy as np

    idx = OracleIndex(analyzer=analyzer)
    df: dict[tuple[str, str], int] = defaultdict(int)
    for row in pages_rows:
        url = row["url"]
        shard = int(hash64_strings([url])[0] % np.uint64(num_shards)) if num_shards > 1 else 0
        doc_id = int(doc_ids_for_urls([url], shard, num_shards)[0])
        site = url.split("://", 1)[-1].split("/", 1)[0]
        lemmas = analyzer.collect_lemmas(row["text"])
        idx.site_pages[site] += 1
        idx.doc_site[doc_id] = site
        idx.doc_url[doc_id] = url
        idx.doc_len[doc_id] = sum(lemmas.values())
        idx.doc_text[doc_id] = row["text"]
        for term, tf in lemmas.items():
            idx.postings.setdefault(term, {})[doc_id] = tf
            df[(site, term)] += 1
    idx.df = dict(df)
    return idx


def oracle_search(
    idx: OracleIndex, query: str, site: str | None = None, k: int | None = 10
) -> list[dict]:
    """Ranked results: [{doc_id, url, abs, relevance}] (top-k or all)."""
    qlemmas = list(idx.analyzer.collect_lemmas(query).keys())
    if site is None:
        # clean global semantics: df summed over sites, pages = all docs
        df_of = lambda t: sum(v for (s, t2), v in idx.df.items() if t2 == t)
        pages = idx.n_docs
    else:
        df_of = lambda t: idx.df.get((site, t), 0)
        pages = idx.site_pages.get(site, 0)
    # step 2: unknown lemmas silently dropped
    known = [t for t in qlemmas if df_of(t) > 0]
    # step 3: 80 % cutoff
    kept = [t for t in known if pages and java_round(100.0 * df_of(t) / pages) < 80]
    if not kept:
        return []
    # step 4: rarest-first, deterministic ties
    kept.sort(key=lambda t: (df_of(t), t))
    # step 5: progressive intersection
    cand: set[int] | None = None
    for t in kept:
        docs = {
            d for d in idx.postings.get(t, {}) if site is None or idx.doc_site[d] == site
        }
        cand = docs if cand is None else (cand & docs)
    cand = cand or set()
    if not cand:
        return []
    # step 6: Σtf, normalize by max
    scored = []
    for d in cand:
        abs_rel = float(sum(idx.postings[t].get(d, 0) for t in kept))
        scored.append((d, abs_rel))
    max_rel = max(s for _, s in scored)
    out = [
        {"doc_id": d, "url": idx.doc_url[d], "abs": s, "relevance": s / max_rel}
        for d, s in scored
    ]
    # step 7: relevance desc, doc_id asc
    out.sort(key=lambda r: (-r["relevance"], r["doc_id"]))
    return out[:k] if k else out


def oracle_bm25(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[dict]:
    """Exhaustive disjunctive BM25 top-k (Lucene idf), the WAND oracle.

    Terms contribute in (df, term)-ascending order so float summation order is
    deterministic and identical to the engine's.
    """
    qlemmas = sorted(
        {t for t in idx.analyzer.collect_lemmas(query)},
        key=lambda t: (len(idx.postings.get(t, {})), t),
    )
    n = idx.n_docs
    avgdl = (sum(idx.doc_len.values()) / n) if n else 0.0
    scores: dict[int, float] = defaultdict(float)
    for t in qlemmas:
        plist = idx.postings.get(t, {})
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, tf in plist.items():
            dl = idx.doc_len[d]
            scores[d] += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [{"doc_id": d, "score": s} for d, s in ranked]
