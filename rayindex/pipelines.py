"""Flagship pipelines over the driver's testdata: pages synthesis → index
build → search, with /tmp caching keyed by scale factor (resume-friendly)."""

from __future__ import annotations

import os

import pandas as pd

from .build import build_index
from .fixtures import pages_from_documents
from .query import QueryEngine

SIMPLE_SPEC = {"name": "simple"}
CACHE_ROOT = "/tmp/rayindex_cache"
PAGES_GEN_VERSION = 2  # bump when pages_from_documents output changes (stale-cache guard)

# engine demo queries over the documents vocabulary: conjunctions, a term that
# sits at the 80 % cutoff boundary, and an unknown word (silently dropped)
FLAGSHIP_QUERIES = [
    "table spark",
    "customer join order",
    "slow query",
    "vector stream",
    "merge xyzzynotaword",
]

# selective queries (rare id-derived term + dense term): the regime where
# block-max WAND's pruning pays for its doc-at-a-time loop
WAND_QUERIES = [
    "123 table",
    "77 scan merge",
    "301 query window",
    "42 sort",
]

# phrase queries: bigrams that occur adjacently in the documents vocabulary
# (so verification has real positives) + one conjunctive-match-but-never-
# adjacent pair to exercise the all-filtered path
PHRASE_QUERIES = [
    "table hash",
    "customer join",
    "slow query",
    "hash table",
]

# dictionary prefix for the autocomplete-style scan entry
PREFIX_QUERY = "st"

# dictionary suffixes for the trailing-wildcard (*suffix) entry
SUFFIX_QUERIES = ["t", "e"]

# explicit thesaurus rewrites for the synonym-search entry: (label, groups) —
# OR within a group, AND across groups; words chosen so groups overlap on
# some docs and differ on others
SYNONYM_QUERIES = [
    ("table|window fast|slow", [["table", "window"], ["fast", "slow"]]),
    ("scan|merge key|row", [["scan", "merge"], ["key", "row"]]),
]

# misspelled/near-neighbor words for the fuzzy-lookup entry: a word with
# vocabulary neighbors at distance 0 and 1, and a 2-digit token that matches
# many id-derived numeric terms within one edit
FUZZY_QUERIES = ["scan", "77"]

# did-you-mean inputs: a known word (stays), 1-edit misspellings (corrected
# to the highest-df neighbor), and gibberish with no neighbor (stays, df 0)
DYM_QUERIES = ["merge scann tabl zzzzqq", "querry 778"]

# glob patterns for the wildcard-lookup entry: literal-head, literal-tail,
# head+tail, middle-only, and a no-match control
WILDCARD_QUERIES = ["sc*", "*ble", "s*n", "*4*", "zz*qq"]

# left-context word for the next-word-suggestion entry
NEXT_WORD = "table"

# RAG chunking window for the chunk_docs entry: sized so the ~15-60-token
# document texts produce both single- and multi-chunk docs
CHUNK_SIZE = 24
CHUNK_OVERLAP = 8

# token budget for the sequence-packing entry (~2-6 docs per sequence at
# the driver corpus's 15-60-token texts)
PACK_BUDGET = 128

# winnowing params: k-gram size is pinned to 3 (the SQL mirror concatenates
# three tokens literally); window of 4 hashes per the MOSS paper's example
WINNOW_K = 3
WINNOW_W = 4

# blocklist words for the wordlist-gate entry (real corpus vocabulary so
# hits exist at every sf)
BLOCKLIST = ("spark", "slow")

# vocabulary size for the OOV-rate quality signal
OOV_VOCAB_K = 64

# RE2 pattern for the distributed doc-store grep entry (3-digit runs
# starting with 1 — page ids and body numbers both hit)
SCAN_REGEX_PATTERN = "1[0-9]{2}"

# document for the term-vector entry, chosen by doc_id so BOTH sides derive
# the url from the documents table (corpus-independent)
TERM_VECTOR_DOC_ID = 42

# site-collapse width for the collapsed-search entry (2 keeps real per-site
# competition visible; 1 would reduce every site to its single best doc)
COLLAPSE_PER_SITE = 2

# half-open [from, to) warc_ts window for the date-range entry, epoch-µs:
# pages_from_documents(repeat=1) stamps EPOCH + doc_id seconds, so this keeps
# docs 100..399 — a strict subset of every query's match set
DATED_WINDOW_US = (1_577_836_800_000_000 + 100 * 1_000_000,
                   1_577_836_800_000_000 + 400 * 1_000_000)

# date-facet bucket width: 60 s spans the sf0.01 corpus (~500 s of stamps)
# across ~9 non-trivial buckets
FACET_DATES_GRAN_US = 60_000_000

# title-boost queries: digit terms appear in exactly one page TITLE
# ("doc {id} rep 0") plus any body occurrences, so the boost reorders real
# ties; the last query has no title hits (control — boost is a no-op)
BOOST_QUERIES = ["42 table", "137 merge", "table merge"]
TITLE_BOOST = 3

# two-word proximity queries for the NEAR entry (slop NEAR_SLOP): pairs that
# co-occur at varying distances so the window actually separates results
NEAR_QUERIES = ["slow query", "customer order", "table merge", "key row"]
NEAR_SLOP = 3

# (positive query, excluded word) pairs for the boolean-NOT entry
NOT_QUERIES = [
    ("slow query", "table"),
    ("vector stream", "merge"),
    ("table spark", "row"),
    ("customer join order", "xyzzynotaword"),  # unknown exclusion → no-op
]

# the site (documents `source`) the site-restricted entry pins; the driver's
# documents tables use source names src0..srcN at every sf
RESTRICT_SOURCE = "src0"


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def bench_pages(
    sf_dir: str, repeat: int = 1, n_fragments: int = 64, body_repeat: int = 1
) -> str:
    suffix = f"_b{body_repeat}" if body_repeat > 1 else ""
    out = os.path.join(
        CACHE_ROOT, f"pages_{_sf_name(sf_dir)}_r{repeat}{suffix}_v{PAGES_GEN_VERSION}"
    )
    return pages_from_documents(
        os.path.join(sf_dir, "documents.parquet"), out, repeat=repeat,
        n_fragments=n_fragments, body_repeat=body_repeat,
    )


def build_bench_index(sf_dir: str, repeat: int = 1, out_dir: str | None = None, **kwargs) -> str:
    """Build (or resume) the index over the documents-seeded pages table."""
    pages_dir = bench_pages(sf_dir, repeat)
    if out_dir is None:
        out_dir = os.path.join(
            CACHE_ROOT, f"index_{_sf_name(sf_dir)}_r{repeat}_v{PAGES_GEN_VERSION}"
        )
    build_index(pages_dir, out_dir, SIMPLE_SPEC, **kwargs)
    return out_dir


def flagship_search(sf_dir: str, repeat: int = 1, queries: list[str] | None = None) -> pd.DataFrame:
    """Build index (cached) + answer the demo query set with the reference
    scorer; returns (query, rank, doc_id, url, relevance, title, snippet)."""
    index_dir = build_bench_index(sf_dir, repeat)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        res = eng.search(q, k=10, with_snippets=True)
        for rank, r in enumerate(res["data"], 1):
            rows.append(
                {
                    "query": q,
                    "rank": rank,
                    "doc_id": r["doc_id"],
                    "url": r.get("url", ""),
                    "relevance": r["relevance"],
                    "title": r.get("title", ""),
                    "snippet": r.get("snippet", ""),
                }
            )
    return pd.DataFrame(
        rows,
        columns=["query", "rank", "doc_id", "url", "relevance", "title", "snippet"],
    )


def engine_search_scores(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Flagship end-to-end, ORACLE-CHECKABLE: build the index over the
    documents-seeded pages, run the reference-semantics search, return ALL
    matches (the reference backend ignores limit/offset —
    controllers/ApiController.java:55-58) as (query, url, score, relevance).

    No rank column: result-set identity is order-insensitive, which sidesteps
    the doc_id (hash) tie-break that SQL cannot reproduce; the DuckDB oracle
    reconstructs page text from the documents table and replays the cutoff /
    intersection / Σtf/max pipeline."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        res = eng.search(q, k=None, with_snippets=False)
        ids = [r["doc_id"] for r in res["data"]]
        meta = eng.doc_meta(ids)
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def _engine_search_scores_codec(sf_dir: str, codec: str,
                                queries: list[str] | None = None) -> pd.DataFrame:
    """``engine_search_scores`` through an index built with an explicit
    postings codec, in its own cache dir — hash-checked against the SAME
    DuckDB oracle, proving that codec's read path end-to-end (dictionary →
    block slicing → decode → scoring)."""
    index_dir = build_bench_index(
        sf_dir,
        repeat=1,
        out_dir=os.path.join(
            CACHE_ROOT, f"index_{_sf_name(sf_dir)}_r1_{codec}_v{PAGES_GEN_VERSION}"
        ),
        codec=codec,
    )
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        res = eng.search(q, k=None, with_snippets=False)
        meta = eng.doc_meta([r["doc_id"] for r in res["data"]])
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def engine_search_scores_pfor(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Flagship search through a PForDelta-encoded index (codec.py
    ``pfor_encode_stream``; the default codec since round 3)."""
    return _engine_search_scores_codec(sf_dir, "pfor", queries)


def engine_search_scores_vb(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Flagship search through a delta+varbyte-encoded index — keeps the
    legacy-default codec's read path oracle-checked now that new builds
    default to ``"pfor"``."""
    return _engine_search_scores_codec(sf_dir, "vb", queries)


def index_audit(sf_dir: str) -> pd.DataFrame:
    """Distributed integrity audit of the flagship index (rayindex/audit.py):
    every segment-row invariant plus the postings-vs-dictionary df
    cross-check.  A healthy index returns the EMPTY violation table — the
    oracle pins exactly that (zero rows, same columns)."""
    from .audit import audit_index

    index_dir = build_bench_index(sf_dir, repeat=1)
    return audit_index(index_dir)


def engine_term_df(sf_dir: str) -> pd.DataFrame:
    """End-to-end A1 check THROUGH the built index: the engine's loaded global
    term→df dictionary (from the compressed-segment build) as a table."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    return eng.term_df_table()


def wand_search(sf_dir: str, repeat: int = 1, queries: list[str] | None = None) -> pd.DataFrame:
    """BM25 block-max WAND top-10 per demo query."""
    index_dir = build_bench_index(sf_dir, repeat)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        for rank, (doc_id, score) in enumerate(eng.bm25_wand(q, k=10), 1):
            rows.append({"query": q, "rank": rank, "doc_id": doc_id, "score": score})
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


def engine_search_topk(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Reference-scorer top-10 per query, ORACLE-CHECKABLE: the engine's own
    result order breaks score ties by doc_id (a url hash SQL cannot
    reproduce), so this entry re-ranks the engine's FULL match set by
    (score desc, url asc) — a total order DuckDB replays exactly.  Scores are
    integer Σtf and relevance is one exact IEEE division of the engine's
    integers, so the driver's value hash is stable."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        data = eng.search(q, k=None, with_snippets=False)["data"]
        meta = eng.doc_meta([r["doc_id"] for r in data])
        items = sorted(
            ((r, meta[r["doc_id"]]["url"]) for r in data),
            key=lambda x: (-x[0]["abs"], x[1]),
        )
        for rank, (r, url) in enumerate(items[:10], 1):
            rows.append(
                {
                    "query": q,
                    "rank": rank,
                    "url": url,
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "rank", "url", "score", "relevance"])


def engine_search_after(sf_dir: str, queries: list[str] | None = None,
                        page_size: int = 4) -> pd.DataFrame:
    """Deep pagination end-to-end, ORACLE-CHECKABLE: every flagship query's
    FULL match set is drained through ``QueryEngine.search_after`` cursor
    pages of ``page_size`` rows; emitting (page, rank) per row lets the
    oracle pin that the union of cursor pages is EXACTLY the ordered scan
    (row_number / page arithmetic over the same (score desc, url) order) —
    no dropped, duplicated or reordered rows across page boundaries."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        after = None
        page = rank = 0
        while True:
            df = eng.search_after(q, k=page_size, after=after)
            if df.empty:
                break
            page += 1
            for r in df.itertuples(index=False):
                rank += 1
                rows.append({"query": q, "page": page, "rank": rank,
                             "url": r.url, "score": int(r.score),
                             "relevance": float(r.relevance)})
            if len(df) < page_size:
                break
            after = (int(df["score"].iloc[-1]), str(df["url"].iloc[-1]))
    return pd.DataFrame(
        rows, columns=["query", "page", "rank", "url", "score", "relevance"])


BOOL_QUERY = "table AND (customer OR spark) NOT join"
BOOL_POSITIVES = ("table", "customer", "spark")
BOOL_NOT = "join"


def engine_search_bool(sf_dir: str, expr: str | None = None) -> pd.DataFrame:
    """Boolean query language end-to-end, ORACLE-CHECKABLE: the full match
    set of ``table AND (customer OR spark) NOT join`` through
    ``QueryEngine.search_bool`` — parser, sorted-set algebra and the
    Σtf-of-positive-lemmas scoring all pinned by one conditional-aggregation
    SQL (bool_or flags per term, score over the positive set)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    res = eng.search_bool(expr or BOOL_QUERY, k=None)
    ids = [r["doc_id"] for r in res["data"]]
    meta = eng.doc_meta(ids)
    rows = [
        {"url": meta[r["doc_id"]]["url"], "score": int(r["abs"]),
         "relevance": float(r["relevance"])}
        for r in res["data"]
    ]
    return pd.DataFrame(rows, columns=["url", "score", "relevance"])


def engine_search_or_scores(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Disjunctive reference scorer end-to-end through the compressed index,
    ORACLE-CHECKABLE: same shape as :func:`engine_search_scores` but the
    candidate set is the UNION of kept-term postings and score counts only
    the terms a document matches (QueryEngine.search_or)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        res = eng.search_or(q, k=None)
        ids = [r["doc_id"] for r in res["data"]]
        meta = eng.doc_meta(ids)
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def engine_prefix_terms(sf_dir: str, prefix: str | None = None) -> pd.DataFrame:
    """Dictionary prefix scan through the built index, ORACLE-CHECKABLE:
    (term, df) for every indexed term starting with ``prefix`` — the
    autocomplete/vocabulary-exploration path, reading only the term_stats
    sidecar with the term range pushed down."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    return eng.prefix_terms(prefix or PREFIX_QUERY)


def engine_complete(sf_dir: str, prefix: str = "s", k: int = 5) -> pd.DataFrame:
    """Query autocomplete through the built index, ORACLE-CHECKABLE: top-k
    completions of the demo prefix ranked (df desc, term asc) with a rank
    column (QueryEngine.complete).  Prefix "s" has 6 vocabulary completions
    at sf0.01, so the k=5 cut and both sort keys are exercised."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    return eng.complete(prefix, k=k)


def engine_search_synonyms(sf_dir: str, queries=None) -> pd.DataFrame:
    """Synonym-expanded search end-to-end through the compressed index,
    ORACLE-CHECKABLE: for each (label, groups) rewrite, the FULL match set
    with integer Σtf score over all matched synonym terms and one-divide
    relevance (QueryEngine.search_synonyms; OR within group, AND across
    groups)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for label, groups in queries or SYNONYM_QUERIES:
        res = eng.search_synonyms(groups, k=None)
        ids = [r["doc_id"] for r in res["data"]]
        meta = eng.doc_meta(ids)
        for r in res["data"]:
            rows.append(
                {
                    "query": label,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def engine_suffix_terms(sf_dir: str, suffixes: list[str] | None = None) -> pd.DataFrame:
    """Trailing-wildcard dictionary lookup through the built index,
    ORACLE-CHECKABLE: (q, term, df) for every indexed term ending with
    each query suffix — the leading-wildcard (``*suffix``) path, served
    from a reversed-term sorted view of the term_stats dictionary (one
    binary-search range probe per query, never a vocabulary scan)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    parts = []
    for s in suffixes or SUFFIX_QUERIES:
        t = eng.suffix_terms(s)
        t.insert(0, "q", s)
        parts.append(t)
    return pd.concat(parts, ignore_index=True)


def engine_fuzzy_terms(sf_dir: str, words: list[str] | None = None) -> pd.DataFrame:
    """Fuzzy dictionary lookup through the built index, ORACLE-CHECKABLE:
    (q, term, df) for every indexed term within Levenshtein distance 1 of
    each query word — the did-you-mean path, served from the SymSpell
    deletion-neighborhood over the term_stats dictionary (oracle:
    DuckDB ``levenshtein(term, q) <= 1`` over the same page tokens)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    parts = []
    for w in words or FUZZY_QUERIES:
        t = eng.fuzzy_terms(w)
        t.insert(0, "q", w)
        parts.append(t)
    return pd.concat(parts, ignore_index=True)


def engine_did_you_mean(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Did-you-mean spell correction through the built index,
    ORACLE-CHECKABLE: (q, word, corrected, df) for every distinct
    analyzer-normalized word of each query — known words stay, unknown
    words map to the Levenshtein-≤1 dictionary neighbor with the highest
    global df (tie → term ascending), no-neighbor words stay with df 0
    (oracle: DuckDB ``levenshtein`` + correlated argmax over the same
    page-token dictionary)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    parts = []
    for q in queries or DYM_QUERIES:
        t = eng.suggest(q)
        t.insert(0, "q", q)
        parts.append(t)
    return pd.concat(parts, ignore_index=True)


def engine_search_corrected(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Spell-tolerant search end-to-end, ORACLE-CHECKABLE: each DYM query is
    rewritten by :meth:`QueryEngine.suggest` (unknown words → argmax-df
    distance-1 neighbor) and the CORRECTED query runs the reference
    conjunctive search — (query, url, score, relevance) over all matches
    (oracle: the did-you-mean correction replayed in SQL feeds the usual
    cutoff/intersection/Σtf pipeline)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or DYM_QUERIES:
        res = eng.search_corrected(q, k=None, with_snippets=False)
        meta = eng.doc_meta([r["doc_id"] for r in res["data"]])
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def engine_phrase_topk(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Phrase search end-to-end, ORACLE-CHECKABLE: conjunctive candidates
    from the postings, exact-adjacency verification against the doc store's
    normalized text, then the deterministic (score desc, url) top-10 the SQL
    oracle replays (QueryEngine.search_phrase rank order uses the doc_id
    hash tie-break; this entry re-ranks by url like engine_search_topk)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or PHRASE_QUERIES:
        data = eng.search_phrase(q, k=None)["data"]
        if not data:
            continue
        items = sorted(data, key=lambda r: (-r["abs"], r["url"]))
        for rank, r in enumerate(items[:10], 1):
            rows.append(
                {
                    "query": q,
                    "rank": rank,
                    "url": r["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "rank", "url", "score", "relevance"])


def engine_phrase_pos_topk(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Phrase search through the POSITIONAL index layer, ORACLE-CHECKABLE
    with the SAME SQL as ``engine_phrase_topk``: a ``positions=True`` build
    (delta+varbyte position lists colocated with the postings), adjacency
    proven by position-list intersection instead of doc-store re-reads.
    Output-identical to the doc-store verify path — one oracle pins both."""
    index_dir = build_bench_index(
        sf_dir, repeat=1,
        out_dir=os.path.join(
            CACHE_ROOT, f"index_{_sf_name(sf_dir)}_r1_pos_v{PAGES_GEN_VERSION}"
        ),
        positions=True,
    )
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    assert eng.has_positions
    rows = []
    for q in queries or PHRASE_QUERIES:
        data = eng.search_phrase_positional(q, k=None)["data"]
        if not data:
            continue
        items = sorted(data, key=lambda r: (-r["abs"], r["url"]))
        for rank, r in enumerate(items[:10], 1):
            rows.append(
                {
                    "query": q,
                    "rank": rank,
                    "url": r["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "rank", "url", "score", "relevance"])


def _near_topk(sf_dir: str, queries: list[str] | None, slop: int,
               ordered: bool) -> pd.DataFrame:
    """Shared body of the two NEAR entries (only the ``ordered`` flag
    differs)."""
    index_dir = build_bench_index(
        sf_dir, repeat=1,
        out_dir=os.path.join(
            CACHE_ROOT, f"index_{_sf_name(sf_dir)}_r1_pos_v{PAGES_GEN_VERSION}"
        ),
        positions=True,
    )
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or NEAR_QUERIES:
        data = eng.search_near(q, slop=slop, k=None, ordered=ordered)["data"]
        if not data:
            continue
        items = sorted(data, key=lambda r: (-r["abs"], r["url"]))
        for rank, r in enumerate(items[:10], 1):
            rows.append(
                {
                    "query": q,
                    "rank": rank,
                    "url": r["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "rank", "url", "score", "relevance"])


def engine_near_topk(sf_dir: str, queries: list[str] | None = None,
                     slop: int = NEAR_SLOP) -> pd.DataFrame:
    """Proximity (NEAR/slop) search through the positional layer,
    ORACLE-CHECKABLE: candidates/scores as the reference conjunctive search,
    kept iff some occurrence pair of the two query words sits within
    ``slop`` words (|pos_a − pos_b| ≤ slop).  The oracle replays the window
    over per-page token ordinals."""
    return _near_topk(sf_dir, queries, slop, ordered=False)


def engine_near_ordered_topk(sf_dir: str, queries: list[str] | None = None,
                             slop: int = NEAR_SLOP) -> pd.DataFrame:
    """ORDERED proximity search (SpanNearQuery inOrder=true) through the
    positional layer, ORACLE-CHECKABLE: as engine_near_topk but the two
    words must appear in QUERY order (pos_a < pos_b, pos_b − pos_a ≤ slop)."""
    return _near_topk(sf_dir, queries, slop, ordered=True)


def engine_term_vector(sf_dir: str, doc_id: int | None = None) -> pd.DataFrame:
    """Per-document term vector through the built index, ORACLE-CHECKABLE:
    (term, tf) of the page seeded from documents row TERM_VECTOR_DOC_ID —
    both sides derive the url from the documents table, so the entry is
    corpus-independent (oracle: the page-token CTE filtered to that url)."""
    import pyarrow.compute as pc_
    import pyarrow.dataset as pads_

    from .schema import doc_ids_for_urls

    did = TERM_VECTOR_DOC_ID if doc_id is None else doc_id
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    t = pads_.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["source"], filter=pc_.field("doc_id") == did
    )
    if t.num_rows == 0:
        raise ValueError(f"doc_id {did} not present in {sf_dir}/documents.parquet")
    src = t.column("source").to_pylist()[0]
    url = f"https://{src}.bench.example/d/{did:08d}/0"
    engine_id = int(doc_ids_for_urls([url])[0])
    return eng.doc_term_vector(engine_id)


def engine_search_site(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Site-restricted reference search end-to-end, ORACLE-CHECKABLE: the
    J5/J6 path (per-site df cutoff, bloom-verified site membership) pinned
    against SQL for the first time — (query, url, score, relevance) for
    matches on the RESTRICT_SOURCE site only.  The cutoff uses the SITE's
    page count and per-site df, which the oracle replays on the
    source-filtered pages."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    site = f"{RESTRICT_SOURCE}.bench.example"
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        res = eng.search(q, site=site, k=None, with_snippets=False)
        ids = [r["doc_id"] for r in res["data"]]
        meta = eng.doc_meta(ids)
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def engine_facet_sites(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Per-site match-count facets for each flagship query, ORACLE-CHECKABLE:
    (query, site, n) over the conjunctive candidate set, sites resolved via
    the skinny doclen table (QueryEngine.facet_sites)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        f = eng.facet_sites(q)
        for site, n in zip(f["site"], f["n"]):
            rows.append({"query": q, "site": site, "n": int(n)})
    return pd.DataFrame(rows, columns=["query", "site", "n"])


def engine_wildcard_terms(sf_dir: str, patterns: list[str] | None = None) -> pd.DataFrame:
    """Glob dictionary lookup through the built index, ORACLE-CHECKABLE:
    (pattern, term, df) for every indexed term matching each glob (oracle:
    SQL LIKE with * → %)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    parts = []
    for p in patterns or WILDCARD_QUERIES:
        t = eng.wildcard_terms(p)
        t.insert(0, "pattern", p)
        parts.append(t)
    return pd.concat(parts, ignore_index=True)


def engine_index_stats(sf_dir: str) -> pd.DataFrame:
    """One-row physical index census, ORACLE-CHECKABLE: distinct terms and
    total postings read from segment-row metadata must equal the corpus's
    logical counts (oracle: distinct terms / distinct (url, term) pairs)."""
    from .segments import index_stats

    index_dir = build_bench_index(sf_dir, repeat=1)
    s = index_stats(index_dir)
    return pd.DataFrame(
        {"n_terms": pd.Series([s["n_terms"]], dtype="int64"),
         "n_postings": pd.Series([s["n_postings"]], dtype="int64")}
    )


def engine_scan_regex(sf_dir: str, pattern: str | None = None):
    """Distributed doc-store regex grep, ORACLE-CHECKABLE: (url, n_hits) of
    every stored page whose extracted text matches the RE2 pattern (oracle:
    DuckDB regexp_extract_all over the reconstructed page text — both
    engines are RE2, the redact_regex discipline)."""
    from .segments import scan_regex

    index_dir = build_bench_index(sf_dir, repeat=1)
    return scan_regex(index_dir, pattern or SCAN_REGEX_PATTERN)


def engine_search_collapsed(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Site-collapsed search end-to-end, ORACLE-CHECKABLE: at most
    COLLAPSE_PER_SITE best docs per site survive each flagship query's
    conjunctive match, ranked under (score desc, url asc); relevance
    normalizes by the PRE-collapse match-set max (oracle: two row_number
    windows over the same reconstruction)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    parts = []
    for q in queries or FLAGSHIP_QUERIES:
        t = eng.search_collapsed(q, per_site=COLLAPSE_PER_SITE)
        t.insert(0, "query", q)
        parts.append(t)
    return pd.concat(parts, ignore_index=True)


def engine_search_dated(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Date-range search end-to-end, ORACLE-CHECKABLE: flagship conjunctive
    matches filtered to warc_ts ∈ [DATED_WINDOW_US), ranked (score desc,
    url asc) with relevance over the surviving set; ts resolves through the
    pruned positional take (oracle: the fixture's EPOCH + doc_id·1s stamp
    rule, SQL-reconstructed from the documents table)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    lo, hi = DATED_WINDOW_US
    parts = []
    for q in queries or FLAGSHIP_QUERIES:
        t = eng.search_dated(q, ts_from=lo, ts_to=hi)
        t.insert(0, "query", q)
        parts.append(t)
    return pd.concat(parts, ignore_index=True)


def engine_facet_dates(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Date-histogram facets end-to-end, ORACLE-CHECKABLE: (query, bucket, n)
    for each flagship query's match set at FACET_DATES_GRAN_US buckets
    (bucket = epoch-µs window start)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    parts = []
    for q in queries or FLAGSHIP_QUERIES:
        t = eng.facet_dates(q, granularity_us=FACET_DATES_GRAN_US)
        t.insert(0, "query", q)
        parts.append(t)
    return pd.concat(parts, ignore_index=True)


def engine_search_boosted(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Title-boosted search end-to-end, ORACLE-CHECKABLE: score = body Σtf +
    TITLE_BOOST × title Σtf over the kept terms, ranked (score desc, url
    asc) (oracle: the fixture's 'doc {id} rep 0' title template tokenized in
    SQL, joined to the same kept-term set)."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    parts = []
    for q in queries or BOOST_QUERIES:
        t = eng.search_boosted(q, title_boost=TITLE_BOOST)
        t.insert(0, "query", q)
        parts.append(t)
    return pd.concat(parts, ignore_index=True)


def engine_search_not(sf_dir: str, queries: list[tuple[str, str]] | None = None) -> pd.DataFrame:
    """Boolean-NOT search end-to-end, ORACLE-CHECKABLE: conjunctive matches
    of the positive query minus documents containing any lemma of the
    excluded word (QueryEngine.search_not), relevance renormalized over the
    surviving set."""
    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q, ex in queries or NOT_QUERIES:
        res = eng.search_not(q, ex, k=None)
        ids = [r["doc_id"] for r in res["data"]]
        meta = eng.doc_meta(ids)
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def engine_prelist_postings(sf_dir: str) -> pd.DataFrame:
    """Head-term prelist artifact, ORACLE-CHECKABLE: build the impact-ordered
    prelists with an untruncated prefix (n_top ≥ any df at this scale), read
    every head term's persisted (doc, tf, dl) rows back, and emit
    (term, url, tf, dl, score) — order-insensitive, so the doc-hash
    tie-break SQL can't reproduce never matters.  Proves the distributed
    decode → impact-sort → merge pipeline's CONTENT against DuckDB
    (ordering + O(k) serving identity are pinned by tests/test_prelists.py,
    and re-asserted here per term via bm25_topk ≡ bm25_exhaustive).

    Columns are integer-exact (term, url, tf, dl) — a score column spelled
    with the engine's exact parenthesization matched DuckDB on 12 897 of
    12 900 rows and differed by 1 ULP on 3 (DuckDB ``ln`` vs libm ``log``
    at rare arguments), so the float stays OUT of the hash: score identity
    is pinned engine-to-engine by the prelist tests instead."""
    from .prelists import build_prelists, head_terms, read_prelist

    index_dir = build_bench_index(sf_dir, repeat=1)
    import pyarrow.parquet as pq_

    n_docs = pq_.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    thr = max(8, n_docs // 5)
    build_prelists(index_dir, df_threshold=thr, n_top=10_000_000)
    heads = head_terms(index_dir, thr)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for term in heads["term"]:
        got = read_prelist(index_dir, term)
        assert got is not None, term
        docs, tfs, dls, df = got
        # serving identity re-asserted on the driver-gate path
        assert eng.bm25_topk(term, k=10) == eng.bm25_exhaustive(term, k=10), term
        urls = eng._urls_for(docs)
        rows.append(pd.DataFrame({
            "term": term, "url": urls,
            "tf": tfs.astype("int64"), "dl": dls.astype("int64"),
        }))
    if not rows:
        return pd.DataFrame({"term": pd.Series(dtype=str),
                             "url": pd.Series(dtype=str),
                             "tf": pd.Series(dtype="int64"),
                             "dl": pd.Series(dtype="int64")})
    return pd.concat(rows, ignore_index=True)


def engine_export_postings(sf_dir: str):
    """Index→dataset export end-to-end, ORACLE-CHECKABLE: decode every
    compressed segment back to exploded (url, term, tf) rows
    (segments.export_postings) — a dataset-level round-trip proof of the
    codec + salting + sharding path (the oracle recomputes the same table
    from the raw pages)."""
    from .segments import export_postings

    index_dir = build_bench_index(sf_dir, repeat=1)
    return export_postings(index_dir)


def _split_pages(sf_dir: str) -> list[str]:
    """Split the bench pages table into two DISJOINT-url halves by md5-LE64
    parity of the url — the two-crawl / two-url-space-shard shape that
    ``merge.merge_indexes`` is for.  Cached like the other /tmp artifacts."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .textops import _md5_le64_arrow

    pages_dir = bench_pages(sf_dir, repeat=1)
    halves = [
        os.path.join(CACHE_ROOT, f"pages_{_sf_name(sf_dir)}_half{h}_v{PAGES_GEN_VERSION}")
        for h in (0, 1)
    ]
    if all(os.path.exists(h + ".done") for h in halves):
        return halves
    for h, out in enumerate(halves):
        def keep(t: pa.Table, parity=h) -> pa.Table:
            par = _md5_le64_arrow(t.column("url")) & np.uint64(1)
            return t.filter(pa.array(par == np.uint64(parity)))

        shutil.rmtree(out, ignore_errors=True)
        rd.read_parquet(pages_dir).map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(out)
        open(out + ".done", "w").close()
    return halves


def build_merged_index(sf_dir: str) -> str:
    """Two half-corpus builds + a segment-level merge (rayindex.merge) —
    the merged index must be indistinguishable from one full build, so the
    merged entries share the full-build entries' oracles verbatim."""
    from .merge import merge_indexes

    roots = []
    for h, pdir in enumerate(_split_pages(sf_dir)):
        out = os.path.join(
            CACHE_ROOT, f"index_{_sf_name(sf_dir)}_half{h}_v{PAGES_GEN_VERSION}"
        )
        build_index(pdir, out, SIMPLE_SPEC)
        roots.append(out)
    merged = os.path.join(
        CACHE_ROOT, f"index_{_sf_name(sf_dir)}_merged_v{PAGES_GEN_VERSION}"
    )
    merge_indexes(roots, merged, SIMPLE_SPEC)
    return merged


def engine_merged_term_df(sf_dir: str) -> pd.DataFrame:
    """A1 through a MERGED index (half-build ∪ half-build): same oracle as
    engine_term_df — merge ≡ rebuild is the checked invariant."""
    eng = QueryEngine(build_merged_index(sf_dir), SIMPLE_SPEC)
    return eng.term_df_table()


def engine_merged_search(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Flagship search served from the MERGED index: scores, cutoff set and
    normalization must match a full single build bit-for-bit (shares
    engine_search_scores' oracle)."""
    eng = QueryEngine(build_merged_index(sf_dir), SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        res = eng.search(q, k=None, with_snippets=False)
        meta = eng.doc_meta([r["doc_id"] for r in res["data"]])
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def engine_sharded_search(sf_dir: str, queries: list[str] | None = None,
                          num_shards: int = 2) -> pd.DataFrame:
    """Flagship search served from a SHARDED build (``build_all`` with two
    url-hash shards — the multi-node unit): doc ids carry the shard
    namespace in their low bits, the engine fans every lookup across shard
    dirs, and scores / cutoff / normalization must match a single-shard
    build bit-for-bit — so this shares engine_search_scores' oracle."""
    from .build import build_all

    out_dir = os.path.join(
        CACHE_ROOT, f"index_{_sf_name(sf_dir)}_sh{num_shards}_v{PAGES_GEN_VERSION}"
    )
    pages = bench_pages(sf_dir, repeat=1)
    if not os.path.exists(os.path.join(out_dir, ".done")):
        build_all(pages, out_dir, SIMPLE_SPEC, num_shards=num_shards)
        open(os.path.join(out_dir, ".done"), "w").close()
    eng = QueryEngine(out_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        res = eng.search(q, k=None, with_snippets=False)
        meta = eng.doc_meta([r["doc_id"] for r in res["data"]])
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def _upsert_crawls(sf_dir: str) -> list[str]:
    """Two OVERLAPPING crawls of the bench url space for the upsert merge:

    - v1: every url; the even-md5-parity half carries STALE content (a fixed
      placeholder body) and an earlier ``warc_ts`` — the standing index
      before a re-crawl.
    - v2: the even-parity half only, with the ORIGINAL html and timestamp —
      the re-crawl that must win keep-latest.

    ``merge_indexes(on_conflict="latest")`` over their indexes must therefore
    reproduce one full build over the original pages bit-for-bit, which is
    what lets the upsert entry share engine_search_scores' oracle."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .textops import _md5_le64_arrow

    pages_dir = bench_pages(sf_dir, repeat=1)
    outs = [
        os.path.join(CACHE_ROOT, f"pages_{_sf_name(sf_dir)}_up{v}_v{PAGES_GEN_VERSION}")
        for v in (1, 2)
    ]
    if all(os.path.exists(o + ".done") for o in outs):
        return outs

    stale = b"<html><head><title>stale</title></head><body>stale copy</body></html>"
    hour_us = np.int64(3_600_000_000)

    def make_v1(t: pa.Table) -> pa.Table:
        even = (_md5_le64_arrow(t.column("url")) & np.uint64(1)) == np.uint64(0)
        ts = t.column("warc_ts").cast(pa.int64()).to_numpy().copy()
        ts[even] -= hour_us
        html = t.column("html").to_pylist()
        for i in np.flatnonzero(even):
            html[i] = stale
        return pa.table({
            "url": t.column("url"),
            "warc_ts": pa.array(ts).cast(pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
        })

    def make_v2(t: pa.Table) -> pa.Table:
        even = (_md5_le64_arrow(t.column("url")) & np.uint64(1)) == np.uint64(0)
        return t.select(["url", "warc_ts", "html"]).filter(pa.array(even))

    for out, fn in zip(outs, (make_v1, make_v2)):
        shutil.rmtree(out, ignore_errors=True)
        rd.read_parquet(pages_dir).map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(out)
        open(out + ".done", "w").close()
    return outs


def build_upsert_index(sf_dir: str) -> str:
    """Standing-index build + re-crawl build + keep-latest upsert merge
    (``merge.merge_indexes(on_conflict="latest")``): half the urls exist in
    BOTH inputs with different content, and the merged index must be
    indistinguishable from one full build over the true pages — so the
    upsert entries share the full-build entries' oracles verbatim."""
    from .merge import merge_indexes

    roots = []
    for v, pdir in enumerate(_upsert_crawls(sf_dir), 1):
        out = os.path.join(
            CACHE_ROOT, f"index_{_sf_name(sf_dir)}_up{v}_v{PAGES_GEN_VERSION}"
        )
        build_index(pdir, out, SIMPLE_SPEC)
        roots.append(out)
    merged = os.path.join(
        CACHE_ROOT, f"index_{_sf_name(sf_dir)}_upserted_v{PAGES_GEN_VERSION}"
    )
    merge_indexes(roots, merged, SIMPLE_SPEC, on_conflict="latest")
    return merged


def engine_upsert_search(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """Flagship search served from the UPSERT-merged index (stale standing
    index + re-crawl, keep-latest): scores, cutoff set and normalization must
    match a full build over the true pages bit-for-bit (shares
    engine_search_scores' oracle)."""
    eng = QueryEngine(build_upsert_index(sf_dir), SIMPLE_SPEC)
    rows = []
    for q in queries or FLAGSHIP_QUERIES:
        res = eng.search(q, k=None, with_snippets=False)
        meta = eng.doc_meta([r["doc_id"] for r in res["data"]])
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


def engine_batch_search(sf_dir: str, queries: list[str] | None = None):
    """Flagship search served by the DISTRIBUTED serving tier
    (rayindex.serve.batch_search): the query log streams through an actor
    pool of engine replicas, each holding ST4 state loaded once.  Row values
    must be independent of batch boundaries and pool size, so this shares
    engine_search_scores' oracle verbatim."""
    from .serve import batch_search

    index_dir = build_bench_index(sf_dir, repeat=1)
    return batch_search(index_dir, SIMPLE_SPEC, queries or FLAGSHIP_QUERIES)


def engine_wand_topk(sf_dir: str, queries: list[str] | None = None) -> pd.DataFrame:
    """BM25 top-k through the compressed index, ORACLE-CHECKABLE.

    Emits every doc whose score reaches the 10th-highest score (tie-inclusive
    — a threshold set is order-free, so the doc_id tie-break disappears).
    Scores are bit-identical to a DuckDB replay because every float op is
    mirrored exactly: idf = math.log ≡ DuckDB ln (verified ULP-identical,
    unlike numpy.log), per-term contribution uses the same literal
    association, and the per-doc sum runs in the engine's (df, term) order
    via DuckDB's ordered aggregate.  WAND is exercised on the same queries
    and asserted equal to the exhaustive head (block-max pruning correctness
    rides along)."""
    import math

    index_dir = build_bench_index(sf_dir, repeat=1)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    rows = []
    for q in queries or WAND_QUERIES:
        full = eng.bm25_exhaustive(q, k=1 << 62)
        wand = eng.bm25_wand(q, k=10)
        if wand != full[: len(wand)]:  # pytest pins this too; fail loudly here
            raise AssertionError(f"WAND != exhaustive head for {q!r}")
        if not full:
            continue
        thr = full[9][1] if len(full) >= 10 else -math.inf
        keep = [(d, s) for d, s in full if s >= thr]
        meta = eng.doc_meta([d for d, _ in keep])
        for d, s in keep:
            rows.append({"query": q, "url": meta[d]["url"], "score": float(s)})
    return pd.DataFrame(rows, columns=["query", "url", "score"])


def warc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """S2 WARC ingest conformance, ORACLE-CHECKABLE: the documents-seeded
    pages are written to a member-gzipped WARC archive set (the Common Crawl
    layout) by the distributed sink, read back by the streaming ``read_warc``
    source, and byte-compared row-for-row against the Parquet originals.
    Returns one (url, roundtrip_ok) row per page; the oracle pins the
    all-true table, so a lost record breaks the row count and a corrupted
    byte or timestamp breaks the hash."""
    import shutil
    import tempfile

    import pyarrow.dataset as pads
    import ray.data as rd

    from .sources import read_warc, write_warc

    pages_dir = bench_pages(sf_dir)
    tmp = tempfile.mkdtemp(prefix="rayindex_warc_rt_")
    try:
        write_warc(rd.read_parquet(pages_dir), tmp, gzip_members=True)
        back = read_warc(tmp).to_pandas()[["url", "warc_ts", "html"]]
        orig = (
            pads.dataset(pages_dir)
            .to_table(columns=["url", "warc_ts", "html"])
            .to_pandas()
        )
        m = orig.merge(back, on="url", how="left", suffixes=("", "_rt"))
        ok = (
            m["html_rt"].notna()
            & (m["html"] == m["html_rt"])
            & (m["warc_ts"] == m["warc_ts_rt"])
        )
        return (
            pd.DataFrame({"url": m["url"], "roundtrip_ok": ok.astype(bool)})
            .sort_values("url")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """JSONL connector conformance, ORACLE-CHECKABLE (the warc_roundtrip
    pattern): pages → JSONL (base64 html, epoch-µs ts) via the distributed
    sink → ``read_pages_jsonl`` → byte-compare against the Parquet originals.
    One (url, roundtrip_ok) row per page; the oracle pins the all-true
    table."""
    import shutil
    import tempfile

    import pyarrow.dataset as pads
    import ray.data as rd

    from .sources import read_pages_jsonl, write_pages_jsonl

    pages_dir = bench_pages(sf_dir)
    tmp = tempfile.mkdtemp(prefix="rayindex_jsonl_rt_")
    try:
        write_pages_jsonl(rd.read_parquet(pages_dir), tmp)
        back = read_pages_jsonl(tmp).to_pandas()[["url", "warc_ts", "html", "text", "lang"]]
        orig = (
            pads.dataset(pages_dir)
            .to_table(columns=["url", "warc_ts", "html", "text", "lang"])
            .to_pandas()
        )
        m = orig.merge(back, on="url", how="left", suffixes=("", "_rt"))
        ok = (
            m["html_rt"].notna()
            & (m["html"] == m["html_rt"])
            & (m["warc_ts"] == m["warc_ts_rt"])
            & (m["text"] == m["text_rt"])
            & (m["lang"] == m["lang_rt"])
        )
        return (
            pd.DataFrame({"url": m["url"], "roundtrip_ok": ok.astype(bool)})
            .sort_values("url")
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
