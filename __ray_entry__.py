"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (documents-seeded pages → checkpointed
index build → reference-semantics search) on sf0.001.  ``queries()`` exposes
one entry per implemented operator family from SURVEY.md §2 plus the
training-data operators (dedup / similarity / text analysis / temporal);
each SQL-expressible entry has a DuckDB mirror in ``oracle_sql()`` with
identical column names and semantics — including the hash-based dedup family
(DuckDB ``md5_number_upper`` ≡ the engine's LE64-of-md5 primitive) and, since
round 3, both engine top-k entries (url tie-break / tie-inclusive threshold
sets; BM25 floats mirrored op-for-op, ln ≡ math.log ULP-verified).  Only
THREE entries remain rows-only: LSH and IVF ANN are approximate by design —
their recall vs the exact scorer is pinned by pytest and recorded per-round
in the bench JSON (``ann_lsh_recall`` / ``ann_ivf_recall``) — and the
trained BPE tokenizer is an iterative algorithm (golden-merge and
brute-force-equivalence pytest instead).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_STOP_SQL = "('a','an','the','and','of','in','to','is','on','at','by','for','with')"

# shared tokenization CTEs (must mirror rayindex.analyze.simple_analyzer)
_TOKS = (
    "toks AS (SELECT doc_id, unnest(string_split_regex(trim(regexp_replace("
    "lower(text), '[^a-z0-9]', ' ', 'g')), ' +')) AS term FROM documents)"
)
_T = f"{_TOKS}, t AS (SELECT doc_id, term FROM toks WHERE term <> '' AND term NOT IN {_STOP_SQL})"
# token-LIST form of the same surface stream (for n-gram window SQL)
_TOKL = (
    "tokl AS (SELECT doc_id, list_filter(string_split_regex(trim(regexp_replace("
    "lower(text), '[^a-z0-9]', ' ', 'g')), ' +'), x -> x <> '') AS l FROM documents)"
)
_TOKS_SITE = (
    "toks AS (SELECT doc_id, source AS site, unnest(string_split_regex(trim(regexp_replace("
    "lower(text), '[^a-z0-9]', ' ', 'g')), ' +')) AS term FROM documents)"
)
_TS = f"{_TOKS_SITE}, t AS (SELECT doc_id, site, term FROM toks WHERE term <> '' AND term NOT IN {_STOP_SQL})"

_SEARCH_TERMS = ("table", "spark")

# Reconstruction of the documents-seeded pages' extracted text in SQL (must
# mirror rayindex.fixtures.pages_from_documents at repeat=1, body_repeat=1:
# golden = "doc {id} rep 0" + " heading {id} " + p1 + " " + p2 where p1/p2 are
# the text halves — i.e. the text itself, with " tail" appended for 1-word
# texts — and url = https://{source}.bench.example/d/{id:08d}/0).
_PAGES = (
    "pages AS (SELECT "
    "'https://' || source || '.bench.example/d/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '/0' AS url, "
    "'doc ' || doc_id || ' rep 0 heading ' || doc_id || ' ' || "
    "(CASE WHEN len(string_split_regex(trim(text), '\\s+')) < 2 THEN text || ' tail' ELSE text END) AS full_text "
    "FROM documents)"
)
_PTOKS = (
    f"{_PAGES}, ptoks AS (SELECT url, unnest(string_split_regex(trim(regexp_replace("
    "lower(full_text), '[^a-z0-9]', ' ', 'g')), ' +')) AS term FROM pages), "
    f"pt AS (SELECT url, term FROM ptoks WHERE term <> '' AND term NOT IN {_STOP_SQL})"
)

# source-filtered variant of _PAGES/_PTOKS (site-restricted entry): same page
# reconstruction over ONE site's documents, plus the site page count
# Entries with a recorded driver-gate row in CORRECTNESS_r03.json (the gate
# checked the first 50 dict entries); queries() rotates these to the back so a
# capped round-4 gate reaches the still-unrecorded half first.
_R03_DRIVER_CHECKED = frozenset({
    "ann_cosine_topk", "dedup_corpus", "dedup_exact", "dedup_near_clusters",
    "doc_len", "doc_tf", "doclen_quantiles", "embedding_near_dup",
    "engine_complete", "engine_export_postings", "engine_phrase_topk", "engine_prefix_terms",
    "engine_search_after", "engine_search_bool", "engine_search_not", "engine_search_or",
    "engine_search_scores", "engine_search_scores_pfor", "engine_search_scores_vb", "engine_search_topk",
    "engine_term_df", "engine_wand_topk", "events_anomalies", "events_asof",
    "events_funnel", "events_hopping", "events_range_join", "events_retention",
    "events_sessions", "events_windowed", "fingerprint", "frequent_terms",
    "index_audit", "jaccard_pairs", "kmv_distinct_terms", "lang_signals",
    "media_audio_stats", "media_features", "media_frames", "media_image_stats",
    "media_meta", "media_video_frames", "minhash_lsh_pairs", "quality_signals",
    "search_and", "simhash", "site_stats", "site_term_df",
    "term_df", "token_count_bpe",
})


def _ptoks_for_source(source: str) -> str:
    pages = _PAGES.replace("FROM documents)", f"FROM documents WHERE source = '{source}')")
    return (
        f"{pages}, ptoks AS (SELECT url, unnest(string_split_regex(trim(regexp_replace("
        "lower(full_text), '[^a-z0-9]', ' ', 'g')), ' +')) AS term FROM pages), "
        f"pt AS (SELECT url, term FROM ptoks WHERE term <> '' AND term NOT IN {_STOP_SQL})"
    )

# the flagship query set, tokenized with the same analyzer at import time so
# the SQL oracle sees the identical per-query term sets
def _flagship_query_terms() -> list[tuple[str, str]]:
    from rayindex.analyze import simple_analyzer
    from rayindex.pipelines import FLAGSHIP_QUERIES

    an = simple_analyzer()
    out = []
    for q in FLAGSHIP_QUERIES:
        for t in an.collect_lemmas(q):
            out.append((q, t))
    return out


def _wand_query_terms() -> list[tuple[str, str]]:
    """(query, term) pairs for the WAND query set — DISTINCT terms, matching
    bm25_exhaustive/bm25_wand's set semantics."""
    from rayindex.analyze import simple_analyzer
    from rayindex.pipelines import WAND_QUERIES

    an = simple_analyzer()
    out = []
    for q in WAND_QUERIES:
        for t in sorted(set(an.collect_lemmas(q))):
            out.append((q, t))
    return out


def _not_query_terms() -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """((query, positive term), (query, exclusion term)) pairs for the
    boolean-NOT entry — exclusion lemmas bypass the 80 % cutoff."""
    from rayindex.analyze import simple_analyzer
    from rayindex.pipelines import NOT_QUERIES

    an = simple_analyzer()
    pos, neg = [], []
    for q, ex in NOT_QUERIES:
        for t in an.collect_lemmas(q):
            pos.append((q, t))
        for t in an.collect_lemmas(ex):
            neg.append((q, t))
    return pos, neg


def _phrase_query_terms() -> list[tuple[str, str]]:
    from rayindex.analyze import simple_analyzer
    from rayindex.pipelines import PHRASE_QUERIES

    an = simple_analyzer()
    out = []
    for q in PHRASE_QUERIES:
        for t in an.collect_lemmas(q):
            out.append((q, t))
    return out


def _phrase_query_phrases() -> list[tuple[str, str]]:
    """(query, normalized-surface-phrase) pairs — stopwords KEPT, matching
    QueryEngine._norm_text."""
    from rayindex.pipelines import PHRASE_QUERIES
    from rayindex.query import QueryEngine

    return [(q, QueryEngine._norm_text(q)) for q in PHRASE_QUERIES]


def _dym_query_words() -> list[tuple[str, str]]:
    """(query, word) pairs for the did-you-mean entry — DISTINCT normalized
    words per query, matching QueryEngine.suggest's row set."""
    from rayindex.analyze import simple_analyzer
    from rayindex.pipelines import DYM_QUERIES

    an = simple_analyzer()
    out = []
    for q in DYM_QUERIES:
        for t in sorted(set(an.collect_lemmas(q))):
            out.append((q, t))
    return out


def _boost_query_terms() -> list[tuple[str, str]]:
    from rayindex.analyze import simple_analyzer
    from rayindex.pipelines import BOOST_QUERIES

    an = simple_analyzer()
    out = []
    for q in BOOST_QUERIES:
        for t in an.collect_lemmas(q):
            out.append((q, t))
    return out


def _near_query_terms() -> list[tuple[str, str]]:
    from rayindex.analyze import simple_analyzer
    from rayindex.pipelines import NEAR_QUERIES

    an = simple_analyzer()
    return [(q, t) for q in NEAR_QUERIES for t in an.collect_lemmas(q)]


def _near_query_pairs() -> list[tuple[str, str, str]]:
    """(query, word1, word2) for the two-word NEAR entry."""
    from rayindex.analyze import simple_analyzer
    from rayindex.pipelines import NEAR_QUERIES

    an = simple_analyzer()
    out = []
    for q in NEAR_QUERIES:
        ts = list(an.collect_lemmas(q))
        out.append((q, ts[0], ts[1]))
    return out


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver checks rows ≥ 0)."""
    from rayindex.pipelines import flagship_search

    return flagship_search("/root/testdata/sf0.001")


def _ann_index_for(sf_dir: str) -> str:
    """Build (or reuse) the persisted ANN index for ``sf_dir`` under /tmp —
    keyed by the embeddings file's identity so a changed input rebuilds."""
    import hashlib
    import os

    from rayindex.annindex import build_ann_index

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    key = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    out = f"/tmp/rayindex_ann_index_{key}"
    if not os.path.isfile(f"{out}/meta.npz"):
        build_ann_index(sf_dir, out)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from rayindex import textops

    def frequent_terms(sf_dir: str):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        return textops.frequent_terms(sf_dir, n_docs=n)

    q = {
        # --- reference operator inventory as dataset ops (SURVEY.md §2) ---
        "doc_tf": textops.doc_tf,  # M3-M6 tokenize+count (postings_flat)
        "term_df": textops.term_df,  # A1 global document frequency
        "site_term_df": textops.site_term_df,  # A1 per-site df (lemma table)
        "doc_len": textops.doc_len,  # A8 Σtf per doc
        "frequent_terms": frequent_terms,  # K3 80 % cutoff set
        "search_and": lambda sf: textops.search_and(sf, *_SEARCH_TERMS),  # J3+K1+K4
        "dedup_exact": textops.dedup_exact,  # D1 exact dedup
        "site_stats": textops.site_stats,  # A3-A5 statistics endpoint
        # --- training-data operators -------------------------------------
        "fingerprint": textops.fingerprint,
        "lang_signals": textops.lang_signals,
        "quality_signals": textops.quality_signals,
        "token_count_bpe": textops.token_count_bpe,
        "jaccard_pairs": lambda sf: textops.ngram_jaccard_pairs(sf, n=1),
        "embedding_near_dup": textops.embedding_near_dup,
        "dedup_near_clusters": textops.dedup_near_clusters,  # pairs → components → winner
        "dedup_corpus": textops.dedup_corpus,  # winners APPLIED via hash join
        "ann_cosine_topk": textops.ann_cosine_topk,
        "ann_rerank_fixed": textops.ann_rerank_fixed,  # SQL-checked rerank kernel
        # head-term prelist artifact content, value-hashed vs DuckDB (r5)
        "engine_prelist_postings": __import__(
            "rayindex.pipelines", fromlist=["engine_prelist_postings"]
        ).engine_prelist_postings,
        # --- temporal / streaming ops over the events table --------------
        "events_windowed": __import__("rayindex.events", fromlist=["windowed_counts"]).windowed_counts,
        "events_retention": __import__(
            "rayindex.events", fromlist=["retention_cohorts"]
        ).retention_cohorts,
        "events_anomalies": __import__(
            "rayindex.events", fromlist=["rate_anomalies"]
        ).rate_anomalies,
        "events_sessions": __import__("rayindex.events", fromlist=["sessionize"]).sessionize,
        "events_asof": __import__("rayindex.events", fromlist=["asof_last_error"]).asof_last_error,
        "events_hopping": __import__("rayindex.events", fromlist=["hopping_counts"]).hopping_counts,
        "events_range_join": __import__(
            "rayindex.events", fromlist=["range_join_errors"]
        ).range_join_errors,
        "events_funnel": __import__(
            "rayindex.events", fromlist=["funnel_steps"]
        ).funnel_steps,
        # --- distributed statistics: exact quantiles + mergeable KMV sketch
        "doclen_quantiles": textops.doclen_quantiles,
        "kmv_distinct_terms": textops.kmv_distinct_terms,
        # --- multimodal (binary payload columns; STUB decode kernels) ----
        "media_meta": __import__("rayindex.multimodal", fromlist=["media_meta"]).media_meta,
        "media_frames": __import__("rayindex.multimodal", fromlist=["media_frames"]).media_frames,
        "media_features": __import__("rayindex.multimodal", fromlist=["media_features"]).media_features,
        # --- multimodal with REAL decoders (BMP / WAV / Y4M headers parsed
        # from the payload bytes; pixel/sample content closed-form so the
        # decode step itself is what the oracle checks) --------------------
        "media_image_stats": __import__(
            "rayindex.multimodal", fromlist=["media_image_stats"]
        ).media_image_stats,
        "media_audio_stats": __import__(
            "rayindex.multimodal", fromlist=["media_audio_stats"]
        ).media_audio_stats,
        "media_video_frames": __import__(
            "rayindex.multimodal", fromlist=["media_video_frames"]
        ).media_video_frames,
        # --- flagship END-TO-END through the built index (SQL-checked) ---
        "engine_search_scores": __import__(
            "rayindex.pipelines", fromlist=["engine_search_scores"]
        ).engine_search_scores,
        "engine_search_scores_pfor": __import__(
            "rayindex.pipelines", fromlist=["engine_search_scores_pfor"]
        ).engine_search_scores_pfor,
        "engine_search_scores_vb": __import__(
            "rayindex.pipelines", fromlist=["engine_search_scores_vb"]
        ).engine_search_scores_vb,
        "engine_term_df": __import__(
            "rayindex.pipelines", fromlist=["engine_term_df"]
        ).engine_term_df,
        "index_audit": __import__(
            "rayindex.pipelines", fromlist=["index_audit"]
        ).index_audit,
        # --- S2 source connectors: WARC (Common Crawl layout) and JSONL
        # (LLM-pipeline interchange) roundtrips ---------------------------
        "warc_roundtrip": __import__(
            "rayindex.pipelines", fromlist=["warc_roundtrip"]
        ).warc_roundtrip,
        "jsonl_roundtrip": __import__(
            "rayindex.pipelines", fromlist=["jsonl_roundtrip"]
        ).jsonl_roundtrip,
        # --- SQL-checked via md5_number_upper (≡ LE64 of md5 bytes) ------
        "minhash_lsh_pairs": textops.minhash_lsh_pairs,
        "simhash": textops.simhash,
        # --- engine top-k, SQL-checked since round 3 (url tie-break /
        # tie-inclusive threshold set; BM25 floats mirrored op-for-op) ------
        "engine_search_topk": __import__(
            "rayindex.pipelines", fromlist=["engine_search_topk"]
        ).engine_search_topk,
        "engine_search_after": __import__(
            "rayindex.pipelines", fromlist=["engine_search_after"]
        ).engine_search_after,  # cursor deep-pagination ≡ ordered scan
        "engine_search_bool": __import__(
            "rayindex.pipelines", fromlist=["engine_search_bool"]
        ).engine_search_bool,  # boolean language: a AND (b OR c) NOT d
        "engine_wand_topk": __import__(
            "rayindex.pipelines", fromlist=["engine_wand_topk"]
        ).engine_wand_topk,
        # --- round-3 engine extensions (all SQL-checked) ------------------
        "engine_search_or": __import__(
            "rayindex.pipelines", fromlist=["engine_search_or_scores"]
        ).engine_search_or_scores,
        "engine_prefix_terms": __import__(
            "rayindex.pipelines", fromlist=["engine_prefix_terms"]
        ).engine_prefix_terms,
        "engine_complete": __import__(
            "rayindex.pipelines", fromlist=["engine_complete"]
        ).engine_complete,
        "engine_phrase_topk": __import__(
            "rayindex.pipelines", fromlist=["engine_phrase_topk"]
        ).engine_phrase_topk,
        "engine_search_not": __import__(
            "rayindex.pipelines", fromlist=["engine_search_not"]
        ).engine_search_not,
        "engine_export_postings": __import__(
            "rayindex.pipelines", fromlist=["engine_export_postings"]
        ).engine_export_postings,
        "engine_search_site": __import__(
            "rayindex.pipelines", fromlist=["engine_search_site"]
        ).engine_search_site,
        "engine_wildcard_terms": __import__(
            "rayindex.pipelines", fromlist=["engine_wildcard_terms"]
        ).engine_wildcard_terms,
        "engine_scan_regex": __import__(
            "rayindex.pipelines", fromlist=["engine_scan_regex"]
        ).engine_scan_regex,
        "engine_index_stats": __import__(
            "rayindex.pipelines", fromlist=["engine_index_stats"]
        ).engine_index_stats,
        "engine_search_collapsed": __import__(
            "rayindex.pipelines", fromlist=["engine_search_collapsed"]
        ).engine_search_collapsed,
        "engine_search_dated": __import__(
            "rayindex.pipelines", fromlist=["engine_search_dated"]
        ).engine_search_dated,
        "engine_facet_dates": __import__(
            "rayindex.pipelines", fromlist=["engine_facet_dates"]
        ).engine_facet_dates,
        "engine_search_boosted": __import__(
            "rayindex.pipelines", fromlist=["engine_search_boosted"]
        ).engine_search_boosted,
        "engine_facet_sites": __import__(
            "rayindex.pipelines", fromlist=["engine_facet_sites"]
        ).engine_facet_sites,
        "engine_fuzzy_terms": __import__(
            "rayindex.pipelines", fromlist=["engine_fuzzy_terms"]
        ).engine_fuzzy_terms,
        "engine_suffix_terms": __import__(
            "rayindex.pipelines", fromlist=["engine_suffix_terms"]
        ).engine_suffix_terms,
        "engine_did_you_mean": __import__(
            "rayindex.pipelines", fromlist=["engine_did_you_mean"]
        ).engine_did_you_mean,
        "engine_search_corrected": __import__(
            "rayindex.pipelines", fromlist=["engine_search_corrected"]
        ).engine_search_corrected,
        "engine_search_synonyms": __import__(
            "rayindex.pipelines", fromlist=["engine_search_synonyms"]
        ).engine_search_synonyms,
        "engine_phrase_pos_topk": __import__(
            "rayindex.pipelines", fromlist=["engine_phrase_pos_topk"]
        ).engine_phrase_pos_topk,
        "engine_near_topk": __import__(
            "rayindex.pipelines", fromlist=["engine_near_topk"]
        ).engine_near_topk,
        "engine_near_ordered_topk": __import__(
            "rayindex.pipelines", fromlist=["engine_near_ordered_topk"]
        ).engine_near_ordered_topk,
        "engine_term_vector": __import__(
            "rayindex.pipelines", fromlist=["engine_term_vector"]
        ).engine_term_vector,
        # --- round-3 segment merge (Lucene-style): two half-corpus builds
        # merged WITHOUT re-lemmatizing must equal one full build, so both
        # entries share the full-build oracles verbatim ---------------------
        "engine_merged_term_df": __import__(
            "rayindex.pipelines", fromlist=["engine_merged_term_df"]
        ).engine_merged_term_df,
        "engine_merged_search": __import__(
            "rayindex.pipelines", fromlist=["engine_merged_search"]
        ).engine_merged_search,
        # --- round-3 upsert merge (on_conflict="latest"): a stale standing
        # index + an overlapping re-crawl merged keep-latest must equal one
        # full build over the true pages, so it shares that oracle ----------
        "engine_upsert_search": __import__(
            "rayindex.pipelines", fromlist=["engine_upsert_search"]
        ).engine_upsert_search,
        # --- sharded build (2 url-hash shards) must serve the flagship
        # results bit-for-bit — shares engine_search_scores' oracle ---------
        "engine_sharded_search": __import__(
            "rayindex.pipelines", fromlist=["engine_sharded_search"]
        ).engine_sharded_search,
        # --- round-3 distributed serving tier: query log → actor pool of
        # engine replicas; values independent of batching/pool size ---------
        "engine_batch_search": __import__(
            "rayindex.pipelines", fromlist=["engine_batch_search"]
        ).engine_batch_search,
        # --- round-3 corpus curation staples (all SQL-checked) ------------
        "sample_hash": textops.sample_hash,
        "tfidf": textops.tfidf,
        "curate_corpus": textops.curate_corpus,
        "curate_corpus_near": textops.curate_corpus_near,
        "top_terms_per_site": textops.top_terms_per_site,
        "redact_regex": textops.redact_regex,
        "bigram_counts": textops.bigram_counts,
        "lm_score": textops.lm_score,
        "next_words": lambda sf: textops.next_words(
            sf, __import__("rayindex.pipelines", fromlist=["NEXT_WORD"]).NEXT_WORD
        ),
        # --- round-3 second wave: repetition / decontamination / stratified
        # sampling / collocations (all SQL-checked) ------------------------
        "repetition_signals": textops.repetition_signals,
        "decontaminate": textops.decontaminate,
        "stratified_sample": textops.stratified_sample,
        "pmi_bigrams": lambda sf: textops.pmi_bigrams(sf, k=20, min_n=2),
        # --- round-3 third wave: MoreLikeThis + inter-doc duplicated-text
        # fraction (both SQL-checked, integer-exact) ------------------------
        "related_docs": lambda sf: textops.related_docs(sf, query_doc_id=0, k=10),
        "dup_ngram_fraction": lambda sf: textops.dup_ngram_fraction(sf, n=2),
        "hybrid_rrf": lambda sf: textops.hybrid_rrf(sf, *_SEARCH_TERMS, query_vec_id=0),
        "hard_negatives": lambda sf: textops.hard_negatives(sf, query_doc_id=0),
        "chunk_docs": lambda sf: textops.chunk_docs(
            sf,
            __import__("rayindex.pipelines", fromlist=["CHUNK_SIZE"]).CHUNK_SIZE,
            __import__("rayindex.pipelines", fromlist=["CHUNK_OVERLAP"]).CHUNK_OVERLAP,
        ),
        "pack_sequences": lambda sf: textops.pack_sequences(
            sf, __import__("rayindex.pipelines", fromlist=["PACK_BUDGET"]).PACK_BUDGET
        ),
        "source_overlap": lambda sf: textops.source_overlap(
            sf,
            __import__("rayindex.pipelines", fromlist=["WINNOW_K"]).WINNOW_K,
            __import__("rayindex.pipelines", fromlist=["WINNOW_W"]).WINNOW_W,
        ),
        "blocklist_hits": lambda sf: textops.blocklist_hits(
            sf, __import__("rayindex.pipelines", fromlist=["BLOCKLIST"]).BLOCKLIST
        ),
        "oov_rate": lambda sf: textops.oov_rate(
            sf, __import__("rayindex.pipelines", fromlist=["OOV_VOCAB_K"]).OOV_VOCAB_K
        ),
        "winnow_fingerprints": lambda sf: textops.winnow_fingerprints(
            sf,
            __import__("rayindex.pipelines", fromlist=["WINNOW_K"]).WINNOW_K,
            __import__("rayindex.pipelines", fromlist=["WINNOW_W"]).WINNOW_W,
        ),
        "weighted_sample": textops.weighted_sample,
        # --- rows-only (approximate by design; recall pinned by pytest and
        # recorded as a bench metric) --------------------------------------
        "ann_lsh_topk": textops.ann_lsh_topk,
        "ann_ivf_topk": textops.ann_ivf_topk,
        # persisted-artifact ANN (r4 verdict #3): build the signature/IVF/PQ
        # index once per sf_dir (cached under /tmp, keyed by file identity),
        # then probe it — LSH result identity with the inline path is pinned
        # by tests/test_annindex.py
        "ann_lsh_indexed": lambda sf: __import__(
            "rayindex.annindex", fromlist=["lsh_topk"]
        ).lsh_topk(_ann_index_for(sf)),
        "ann_ivf_indexed": lambda sf: __import__(
            "rayindex.annindex", fromlist=["ivf_topk"]
        ).ivf_topk(_ann_index_for(sf)),
        # --- rows-only (iterative algorithm — not SQL-expressible; golden
        # merges + brute-force equivalence pinned by tests/test_bpe.py) ----
        "bpe_tokens": __import__("rayindex.bpe", fromlist=["bpe_tokens"]).bpe_tokens,
    }
    # Round-5 rotation (r4 VERDICT "Next round" #2): the driver gate samples
    # a budget-capped PREFIX of this dict, so the six entries that have
    # never had a driver-green row lead it — the three r4 ArrowInvalid-join
    # reds (now guarded by rayindex.joins.safe_join) plus the three
    # rows-only-by-design entries — followed by everything else in build
    # order (r3-checked entries last, as before, so a deep gate still
    # re-covers the freshest rows first).
    never_green = ("tfidf", "lm_score", "pmi_bigrams",
                   "ann_lsh_topk", "ann_ivf_topk", "bpe_tokens")
    out = {k: q[k] for k in never_green}
    out.update({k: v for k, v in q.items()
                if k not in out and k not in _R03_DRIVER_CHECKED})
    out.update({k: v for k, v in q.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    stop = _STOP_SQL
    ta, tb = _SEARCH_TERMS
    from rayindex.pipelines import RESTRICT_SOURCE as _restrict_src
    # interpolated (not hardcoded) so editing a pipelines.py constant keeps
    # engine and oracle in lockstep instead of failing as a hash mismatch
    from rayindex.pipelines import (
        BLOCKLIST as _blocklist,
        CHUNK_OVERLAP as _chunk_ov,
        CHUNK_SIZE as _chunk_sz,
        COLLAPSE_PER_SITE as _collapse_n,
        DATED_WINDOW_US as _dated_win,
        FACET_DATES_GRAN_US as _facet_gran,
        NEAR_SLOP as _near_slop,
        NEXT_WORD as _next_word,
        OOV_VOCAB_K as _oov_k,
        PACK_BUDGET as _pack_budget,
        WINNOW_W as _winnow_w,
        SCAN_REGEX_PATTERN as _scan_rx,
        TITLE_BOOST as _title_boost,
    )
    # DuckDB md5_number_upper(s) == int.from_bytes(md5(s)[:8], 'little') —
    # the hash primitive of the whole dedup family (textops._md5_le64), which
    # is what makes minhash/simhash/media oracles exactly expressible.
    from rayindex.textops import MinHasher

    _mh = MinHasher()
    _perm_vals = ", ".join(
        f"({j}, {int(a)}, {int(b)})" for j, (a, b) in enumerate(zip(_mh.a, _mh.b))
    )
    _mask61 = (1 << 61) - 1
    # MinHash+LSH candidate-pair CTE chain ending in mhp(doc_a, doc_b) —
    # shared by minhash_lsh_pairs and the composed curate_corpus_near
    _mh_pairs_ctes = (
        r"toks AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS l FROM documents), "
        "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(l) - 1), "
        "i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))) AS s FROM toks WHERE len(l) >= 3), "
        f"hv AS (SELECT doc_id, CAST(md5_number_upper(s) & CAST({_mask61} AS UBIGINT) AS HUGEINT) AS hv FROM sh), "
        f"perms(j, a, b) AS (VALUES {_perm_vals}), "
        "m AS (SELECT hv.doc_id, p.j, "
        f"min(((CAST(p.a AS HUGEINT) * hv.hv + p.b) % 18446744073709551616) % {_mask61}) AS sig "
        "FROM hv CROSS JOIN perms p GROUP BY hv.doc_id, p.j), "
        "bands AS (SELECT doc_id, CAST(j // 4 AS INTEGER) AS band, "
        "substr(md5(string_agg(CAST(sig AS VARCHAR), '-' ORDER BY j)), 1, 16) AS band_hash "
        "FROM m GROUP BY doc_id, j // 4), "
        "mhp AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b "
        "FROM bands x JOIN bands y ON x.band = y.band AND x.band_hash = y.band_hash "
        "AND y.doc_id > x.doc_id)"
    )

    # winnowing CTE chain ending in wfp(doc_id, fp) — shared by
    # winnow_fingerprints and source_overlap
    _winnow_ctes = (
        f"{_TOKL}, "
        "g AS (SELECT doc_id, "
        "unnest(list_transform(range(1, len(l) - 1), i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram, "
        "unnest(range(1, len(l) - 1)) AS pos FROM tokl WHERE len(l) >= 3), "
        "h AS (SELECT doc_id, pos, md5_number_upper(gram) AS hv FROM g), "
        "wmin AS (SELECT doc_id, pos, "
        f"min(hv) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND {_winnow_w - 1} FOLLOWING) AS mn, "
        "count(*) OVER (PARTITION BY doc_id) AS cnt FROM h), "
        "wfp AS (SELECT DISTINCT doc_id, "
        "CAST(CAST(mn AS HUGEINT) - 9223372036854775808 AS BIGINT) AS fp "
        f"FROM wmin WHERE pos <= greatest(1, cnt - {_winnow_w - 1}))"
    )

    # did-you-mean correction CTEs (need a d(term, df) CTE in scope) —
    # shared by engine_did_you_mean and engine_search_corrected so the two
    # entries can never pin different correction semantics
    _dym_sel = (
        "q(q, word) AS (VALUES "
        + ", ".join(f"('{q}', '{w}')" for q, w in _dym_query_words())
        + "), "
        "sel AS (SELECT q.q, q.word, "
        "CASE WHEN EXISTS (SELECT 1 FROM d WHERE d.term = q.word) THEN q.word "
        "ELSE coalesce((SELECT d.term FROM d WHERE levenshtein(d.term, q.word) <= 1 "
        "ORDER BY d.df DESC, d.term LIMIT 1), q.word) END AS corrected FROM q)"
    )

    def _near_sql(pred: str) -> str:
        """The NEAR oracle chain — unordered and ordered differ only in the
        position predicate."""
        return (
            f"WITH {_PTOKS}, "
            "pagetokl AS (SELECT url, list_filter(string_split_regex(trim(regexp_replace("
            "lower(full_text), '[^a-z0-9]', ' ', 'g')), ' +'), x -> x <> '') AS l FROM pages), "
            "posr AS (SELECT url, unnest(l) AS term, unnest(range(1, len(l)+1)) AS pos FROM pagetokl), "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _near_query_terms())
            + "), "
            "qp(query, t1, t2) AS (VALUES "
            + ", ".join(f"('{q}', '{a}', '{b}')" for q, a, b in _near_query_pairs())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "ver AS (SELECT co.query, co.url, co.score FROM co JOIN qp USING (query) "
            "WHERE EXISTS (SELECT 1 FROM posr a, posr b WHERE a.url = co.url AND b.url = co.url "
            f"AND a.term = qp.t1 AND b.term = qp.t2 AND {pred})), "
            "ranked AS (SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance, "
            "row_number() OVER (PARTITION BY query ORDER BY score DESC, url) AS rn FROM ver) "
            "SELECT query, CAST(rn AS BIGINT) AS rank, url, score, relevance "
            "FROM ranked WHERE rn <= 10"
        )
    out = {
        "doc_tf": f"WITH {_T} SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term",
        "term_df": f"WITH {_T} SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY term",
        "site_term_df": f"WITH {_TS} SELECT site, term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY site, term",
        "doc_len": f"WITH {_T} SELECT doc_id, CAST(count(*) AS BIGINT) AS doc_len FROM t GROUP BY doc_id",
        "frequent_terms": (
            f"WITH {_T}, df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY term) "
            "SELECT term, df FROM df WHERE 200*df >= 159*(SELECT count(*) FROM documents)"
        ),
        "search_and": (
            f"WITH {_T}, tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term), "
            f"hits AS (SELECT * FROM tf WHERE term IN ('{ta}','{tb}')), "
            "per_doc AS (SELECT doc_id, count(DISTINCT term) AS n_terms, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY doc_id), "
            "co AS (SELECT doc_id, score FROM per_doc WHERE n_terms = 2) "
            "SELECT doc_id, score, CAST(score AS DOUBLE) / (SELECT max(score) FROM co) AS relevance "
            "FROM co ORDER BY relevance DESC, doc_id LIMIT 10"
        ),
        "dedup_exact": "SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text",
        "dedup_corpus": (
            "SELECT d.doc_id, d.source, d.n_chars FROM documents d "
            "JOIN (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text) w "
            "USING (doc_id)"
        ),
        "site_stats": (
            f"WITH {_TS} SELECT site, CAST(count(DISTINCT doc_id) AS BIGINT) AS pages, "
            "CAST(count(DISTINCT term) AS BIGINT) AS lemmas FROM t GROUP BY site"
        ),
        "fingerprint": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM documents"
        ),
        "lang_signals": (
            "SELECT doc_id, "
            "CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_latin, "
            "CAST(length(regexp_replace(text, '[^а-яА-ЯёЁ]', '', 'g')) AS BIGINT) AS n_cyrillic, "
            "CASE WHEN length(regexp_replace(text, '[^а-яА-ЯёЁ]', '', 'g')) > "
            "length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) THEN 'ru' ELSE 'en' END AS pred_lang "
            "FROM documents"
        ),
        "quality_signals": (
            f"WITH {_TOKS}, agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            f"CAST(count(*) FILTER (WHERE term IN {stop}) AS BIGINT) AS n_stopwords, "
            f"CAST(count(DISTINCT CASE WHEN term NOT IN {stop} THEN term END) AS BIGINT) AS n_unique_terms "
            "FROM toks WHERE term <> '' GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars, "
            "COALESCE(a.n_tokens, 0) AS n_tokens, COALESCE(a.n_stopwords, 0) AS n_stopwords, "
            "COALESCE(a.n_unique_terms, 0) AS n_unique_terms "
            "FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "token_count_bpe": (
            "SELECT doc_id, CAST(length(regexp_extract_all(text, "
            "'[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_tokens FROM documents"
        ),
        "jaccard_pairs": (
            "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents), "
            "gsets AS (SELECT doc_id, list(DISTINCT tok) AS grams FROM toks GROUP BY doc_id) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS n_inter, "
            "CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS BIGINT) AS n_union, "
            "CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
            "len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard "
            "FROM gsets a JOIN gsets b ON b.doc_id = a.doc_id + 1"
        ),
        "engine_term_df": (
            f"WITH {_PTOKS} SELECT term, CAST(count(DISTINCT url) AS BIGINT) AS df "
            "FROM pt GROUP BY term"
        ),
        "engine_search_scores": (
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms) "
            "SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance FROM co"
        ),
        "engine_prelist_postings": (
            # the persisted head-term prelists' full content (untruncated at
            # this scale): every (term, url, tf, dl) with the term's df above
            # the same threshold the builder used — integer-exact columns
            # only (a mirrored float score column hit 1-ULP ln() divergence
            # on 3/12900 rows; score identity is pinned by pytest instead)
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "dl AS (SELECT url, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY url), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "s AS (SELECT CAST((SELECT count(*) FROM pt) AS DOUBLE) / "
            "(SELECT count(*) FROM documents) AS avgdl, "
            "(SELECT count(*) FROM documents) AS n), "
            "heads AS (SELECT term, df.df FROM df, s WHERE df.df >= greatest(8, s.n // 5)) "
            "SELECT t.term, t.url, CAST(t.tf AS BIGINT) AS tf, d.dl "
            "FROM tf t JOIN heads h USING (term) JOIN dl d USING (url)"
        ),
        "engine_search_topk": (
            # engine_search_scores + deterministic (score desc, url) top-10;
            # relevance normalizes by the max over ALL matches (pre-cut)
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "ranked AS (SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance, "
            "row_number() OVER (PARTITION BY query ORDER BY score DESC, url) AS rn FROM co) "
            "SELECT query, CAST(rn AS BIGINT) AS rank, url, score, relevance "
            "FROM ranked WHERE rn <= 10"
        ),
        "engine_search_after": (
            # the cursor-paged drain must equal the full ordered scan: page
            # and rank derive from row_number over (score desc, url), the
            # exact total order QueryEngine.search_after walks
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "ranked AS (SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance, "
            "row_number() OVER (PARTITION BY query ORDER BY score DESC, url) AS rn FROM co) "
            "SELECT query, CAST((rn - 1) // 4 + 1 AS BIGINT) AS page, "
            "CAST(rn AS BIGINT) AS rank, url, score, relevance FROM ranked"
        ),
        "engine_wildcard_terms": (
            # glob → LIKE (terms are [a-z0-9]+: '*'→'%' is the whole mapping)
            f"WITH {_PTOKS}, d AS (SELECT term, CAST(count(DISTINCT url) AS BIGINT) AS df "
            "FROM pt GROUP BY term), "
            "p(pattern, like_p) AS (VALUES "
            + ", ".join(
                f"('{q}', '{q.replace('*', '%')}')"
                for q in __import__(
                    "rayindex.pipelines", fromlist=["WILDCARD_QUERIES"]
                ).WILDCARD_QUERIES
            )
            + ") "
            "SELECT p.pattern, d.term, d.df FROM p JOIN d ON d.term LIKE p.like_p"
        ),
        "engine_index_stats": (
            # the physical census (segment-row n_docs metadata) must equal
            # the corpus's logical term/posting counts
            f"WITH {_PTOKS}, p AS (SELECT DISTINCT url, term FROM pt) "
            "SELECT CAST(count(DISTINCT term) AS BIGINT) AS n_terms, "
            "CAST(count(*) AS BIGINT) AS n_postings FROM p"
        ),
        "engine_scan_regex": (
            # RE2 on both sides; non-overlapping global match count
            f"WITH {_PAGES}, "
            f"g AS (SELECT url, CAST(len(regexp_extract_all(full_text, '{_scan_rx}')) AS BIGINT) "
            "AS n_hits FROM pages) "
            "SELECT url, n_hits FROM g WHERE n_hits > 0"
        ),
        "next_words": (
            # successors of NEXT_WORD in the surface stream, top-10 by
            # (n desc, w2 asc) with a rank the engine stamps identically
            f"WITH {_TOKL}, "
            "w2s AS (SELECT unnest(list_transform(range(1, len(l)), "
            f"i -> CASE WHEN l[i] = '{_next_word}' THEN l[i+1] ELSE NULL END)) AS w2 "
            "FROM tokl WHERE len(l) >= 2), "
            "g AS (SELECT w2, CAST(count(*) AS BIGINT) AS n FROM w2s "
            "WHERE w2 IS NOT NULL GROUP BY w2) "
            "SELECT * FROM (SELECT CAST(row_number() OVER (ORDER BY n DESC, w2) AS BIGINT) "
            "AS rank, w2, n FROM g) WHERE rank <= 10"
        ),
        "engine_search_collapsed": (
            # per-(query, site) top-COLLAPSE_PER_SITE under (score desc,
            # url), then a global rank over the collapsed set; relevance
            # normalizes by the PRE-collapse per-query max
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "r AS (SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance, "
            "regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/]+)', 1) AS site FROM co), "
            "coll AS (SELECT *, row_number() OVER (PARTITION BY query, site "
            "ORDER BY score DESC, url) AS srn FROM r), "
            f"kp AS (SELECT * FROM coll WHERE srn <= {_collapse_n}) "
            "SELECT query, CAST(row_number() OVER (PARTITION BY query "
            "ORDER BY score DESC, url) AS BIGINT) AS rank, "
            "site, url, score, relevance FROM kp"
        ),
        "engine_search_dated": (
            # warc_ts reconstruction: pages_from_documents(repeat=1) stamps
            # EPOCH(2020-01-01) + doc_id seconds (doc_id ≡ row index);
            # half-open window, relevance over the SURVIVING set
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "pts AS (SELECT 'https://' || source || '.bench.example/d/' || "
            "lpad(CAST(doc_id AS VARCHAR), 8, '0') || '/0' AS url, "
            "CAST(1577836800000000 + doc_id * 1000000 AS BIGINT) AS ts FROM documents), "
            "w AS (SELECT co.query, co.url, pts.ts, co.score FROM co JOIN pts USING (url) "
            f"WHERE pts.ts >= {_dated_win[0]} AND pts.ts < {_dated_win[1]}) "
            "SELECT query, CAST(row_number() OVER (PARTITION BY query "
            "ORDER BY score DESC, url) AS BIGINT) AS rank, url, ts, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance FROM w"
        ),
        "engine_facet_dates": (
            # 60 s-bucket histogram of each query's match timestamps
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "pts AS (SELECT 'https://' || source || '.bench.example/d/' || "
            "lpad(CAST(doc_id AS VARCHAR), 8, '0') || '/0' AS url, "
            "CAST(1577836800000000 + doc_id * 1000000 AS BIGINT) AS ts FROM documents) "
            f"SELECT co.query, CAST((pts.ts // {_facet_gran}) * {_facet_gran} AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n FROM co JOIN pts USING (url) "
            "GROUP BY co.query, bucket"
        ),
        "engine_search_boosted": (
            # fielded scoring: body Σtf + TITLE_BOOST × title Σtf over the
            # kept terms; titles follow the fixture template 'doc {id} rep 0'
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _boost_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "tl AS (SELECT 'https://' || source || '.bench.example/d/' || "
            "lpad(CAST(doc_id AS VARCHAR), 8, '0') || '/0' AS url, "
            "unnest(string_split_regex(trim(regexp_replace("
            "'doc ' || doc_id || ' rep 0', '[^a-z0-9]', ' ', 'g')), ' +')) AS term "
            "FROM documents), "
            f"tlt AS (SELECT url, term FROM tl WHERE term <> '' AND term NOT IN {_STOP_SQL}), "
            "ttf AS (SELECT url, term, count(*) AS tf FROM tlt GROUP BY url, term), "
            "tb AS (SELECT k.query, t.url, CAST(sum(t.tf) AS BIGINT) AS btf "
            "FROM kept k JOIN ttf t USING (term) GROUP BY k.query, t.url), "
            f"b AS (SELECT co.query, co.url, co.score + {_title_boost} * coalesce(tb.btf, 0) AS score "
            "FROM co LEFT JOIN tb ON tb.query = co.query AND tb.url = co.url) "
            "SELECT query, CAST(row_number() OVER (PARTITION BY query "
            "ORDER BY score DESC, url) AS BIGINT) AS rank, url, "
            "CAST(score AS BIGINT) AS score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance FROM b"
        ),
        "engine_search_bool": (
            # table AND (customer OR spark) NOT join — flags via bool_or,
            # score = Σtf over the POSITIVE terms present (branch-blind),
            # relevance normalized by the match-set max
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "g AS (SELECT url, "
            "bool_or(term = 'table') AS h_table, "
            "bool_or(term = 'customer') AS h_customer, "
            "bool_or(term = 'spark') AS h_spark, "
            "bool_or(term = 'join') AS h_join, "
            "CAST(sum(CASE WHEN term IN ('table','customer','spark') "
            "THEN tf ELSE 0 END) AS BIGINT) AS score "
            "FROM tf GROUP BY url), "
            "m AS (SELECT url, score FROM g "
            "WHERE h_table AND (h_customer OR h_spark) AND NOT h_join) "
            "SELECT url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER () AS relevance FROM m"
        ),
        "engine_wand_topk": (
            # BM25 mirrored op-for-op: ln ≡ math.log (ULP-verified), literal
            # association matches query.QueryEngine._contrib, and the per-doc
            # sum uses DuckDB's ordered aggregate in the engine's (df, term)
            # accumulation order — floats are bit-identical, so the
            # tie-inclusive >= threshold set matches exactly.
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "dl AS (SELECT url, count(*) AS dl FROM pt GROUP BY url), "
            "nn AS (SELECT count(*) AS n_docs FROM pages), "
            "av AS (SELECT CAST((SELECT count(*) FROM pt) AS DOUBLE) "
            "/ CAST((SELECT n_docs FROM nn) AS DOUBLE) AS avgdl), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _wand_query_terms())
            + "), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "qd AS (SELECT q.query, q.term, df.df FROM q JOIN df USING (term)), "
            "idf AS (SELECT query, term, df, "
            "ln(1.0 + (CAST((SELECT n_docs FROM nn) - df AS DOUBLE) + 0.5) "
            "/ (CAST(df AS DOUBLE) + 0.5)) AS idf FROM qd), "
            "c AS (SELECT i.query, t.url, i.df, i.term, "
            "(i.idf * (CAST(t.tf AS DOUBLE) * (1.2 + 1.0))) / "
            "(CAST(t.tf AS DOUBLE) + (1.2 * ((1.0 - 0.75) + "
            "((0.75 * CAST(d.dl AS DOUBLE)) / (SELECT avgdl FROM av))))) AS contrib "
            "FROM idf i JOIN tf t USING (term) JOIN dl d ON d.url = t.url), "
            "scores AS (SELECT query, url, sum(contrib ORDER BY df, term) AS score "
            "FROM c GROUP BY query, url), "
            "thr AS (SELECT qq.query, (SELECT s2.score FROM scores s2 WHERE s2.query = qq.query "
            "ORDER BY s2.score DESC LIMIT 1 OFFSET 9) AS t "
            "FROM (SELECT DISTINCT query FROM scores) qq) "
            "SELECT s.query, s.url, s.score FROM scores s JOIN thr ON thr.query = s.query "
            "WHERE thr.t IS NULL OR s.score >= thr.t"
        ),
        "engine_search_or": (
            # disjunctive: same CTEs as engine_search_scores, minus the
            # conjunctive c = n_terms filter
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "hits AS (SELECT k.query, t.url, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url) "
            "SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance FROM cand"
        ),
        "engine_complete": (
            # autocomplete: the engine's (df desc, term asc) total order
            f"WITH {_PTOKS}, "
            "d AS (SELECT term, CAST(count(DISTINCT url) AS BIGINT) AS df "
            "FROM pt WHERE term LIKE 's%' GROUP BY term) "
            "SELECT CAST(row_number() OVER (ORDER BY df DESC, term) AS BIGINT) AS rank, "
            "term, df FROM d ORDER BY df DESC, term LIMIT 5"
        ),
        "engine_prefix_terms": (
            f"WITH {_PTOKS} SELECT term, CAST(count(DISTINCT url) AS BIGINT) AS df "
            "FROM pt WHERE term LIKE 'st%' GROUP BY term"
        ),
        "engine_suffix_terms": (
            f"WITH {_PTOKS}, d AS (SELECT term, CAST(count(DISTINCT url) AS BIGINT) AS df "
            "FROM pt GROUP BY term) "
            "SELECT 't' AS q, term, df FROM d WHERE term LIKE '%t' "
            "UNION ALL "
            "SELECT 'e' AS q, term, df FROM d WHERE term LIKE '%e'"
        ),
        "engine_search_synonyms": (
            # OR within a synonym group (Σtf over the group's terms), AND
            # across groups (inner join), relevance = one IEEE divide of
            # integer sums — mirrors QueryEngine.search_synonyms exactly
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "g1a AS (SELECT url, sum(tf) AS s FROM tf WHERE term IN ('table','window') GROUP BY url), "
            "g1b AS (SELECT url, sum(tf) AS s FROM tf WHERE term IN ('fast','slow') GROUP BY url), "
            "co1 AS (SELECT g1a.url, CAST(g1a.s + g1b.s AS BIGINT) AS score FROM g1a JOIN g1b USING (url)), "
            "g2a AS (SELECT url, sum(tf) AS s FROM tf WHERE term IN ('scan','merge') GROUP BY url), "
            "g2b AS (SELECT url, sum(tf) AS s FROM tf WHERE term IN ('key','row') GROUP BY url), "
            "co2 AS (SELECT g2a.url, CAST(g2a.s + g2b.s AS BIGINT) AS score FROM g2a JOIN g2b USING (url)) "
            "SELECT 'table|window fast|slow' AS query, url, score, "
            "CAST(score AS DOUBLE) / (SELECT max(score) FROM co1) AS relevance FROM co1 "
            "UNION ALL "
            "SELECT 'scan|merge key|row' AS query, url, score, "
            "CAST(score AS DOUBLE) / (SELECT max(score) FROM co2) AS relevance FROM co2"
        ),
        "engine_fuzzy_terms": (
            f"WITH {_PTOKS}, d AS (SELECT term, CAST(count(DISTINCT url) AS BIGINT) AS df "
            "FROM pt GROUP BY term) "
            "SELECT 'scan' AS q, term, df FROM d WHERE levenshtein(term, 'scan') <= 1 "
            "UNION ALL "
            "SELECT '77' AS q, term, df FROM d WHERE levenshtein(term, '77') <= 1"
        ),
        "engine_did_you_mean": (
            # known word → itself; unknown → argmax-df Levenshtein-≤1
            # neighbor (tie: term asc); no neighbor → itself with df 0
            f"WITH {_PTOKS}, d AS (SELECT term, CAST(count(DISTINCT url) AS BIGINT) AS df "
            "FROM pt GROUP BY term), "
            f"{_dym_sel} "
            "SELECT sel.q, sel.word, sel.corrected, "
            "coalesce((SELECT d.df FROM d WHERE d.term = sel.corrected), "
            "CAST(0 AS BIGINT)) AS df FROM sel"
        ),
        "engine_search_corrected": (
            # the did-you-mean rewrite (same sel CTE) feeds the reference
            # conjunctive pipeline: corrected DISTINCT words with df > 0
            # under the K3 cutoff are the query's kept-term set
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "d AS (SELECT term, CAST(count(DISTINCT url) AS BIGINT) AS df "
            "FROM pt GROUP BY term), "
            f"{_dym_sel}, "
            "kept AS (SELECT DISTINCT sel.q AS query, sel.corrected AS term "
            "FROM sel JOIN d ON d.term = sel.corrected "
            "WHERE 200 * d.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms) "
            "SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance FROM co"
        ),
        "engine_phrase_topk": (
            # conjunctive candidates + exact-adjacency verification on the
            # squeeze-normalized page text, then (score desc, url) top-10
            f"WITH {_PTOKS}, "
            "norm AS (SELECT url, ' ' || trim(regexp_replace(regexp_replace("
            "lower(full_text), '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g')) || ' ' AS ntext FROM pages), "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _phrase_query_terms())
            + "), "
            "qp(query, phrase) AS (VALUES "
            + ", ".join(f"('{q}', '{p}')" for q, p in _phrase_query_phrases())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "ver AS (SELECT co.query, co.url, co.score FROM co "
            "JOIN qp USING (query) JOIN norm USING (url) "
            "WHERE position(' ' || qp.phrase || ' ' IN norm.ntext) > 0), "
            "ranked AS (SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance, "
            "row_number() OVER (PARTITION BY query ORDER BY score DESC, url) AS rn FROM ver) "
            "SELECT query, CAST(rn AS BIGINT) AS rank, url, score, relevance "
            "FROM ranked WHERE rn <= 10"
        ),
        "engine_near_topk": _near_sql(
            f"abs(a.pos - b.pos) <= {_near_slop}"
        ),
        "engine_near_ordered_topk": _near_sql(
            # IN ORDER: t1 strictly before t2 within the slop
            f"a.pos < b.pos AND b.pos - a.pos <= {_near_slop}"
        ),
        "engine_term_vector": (
            # one page's (term, tf) — the url derived from documents row
            # TERM_VECTOR_DOC_ID on both sides
            f"WITH {_PTOKS}, "
            "u AS (SELECT 'https://' || source || '.bench.example/d/' || "
            "lpad(CAST(doc_id AS VARCHAR), 8, '0') || '/0' AS url FROM documents "
            "WHERE doc_id = "
            + str(__import__("rayindex.pipelines", fromlist=["TERM_VECTOR_DOC_ID"]).TERM_VECTOR_DOC_ID)
            + ") "
            "SELECT pt.term, CAST(count(*) AS BIGINT) AS tf FROM pt JOIN u USING (url) "
            "GROUP BY pt.term"
        ),
        "engine_search_not": (
            f"WITH {_PTOKS}, "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _not_query_terms()[0])
            + "), "
            "exq(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _not_query_terms()[1])
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms), "
            "exdocs AS (SELECT DISTINCT e.query, t.url FROM exq e JOIN tf t USING (term)), "
            "surv AS (SELECT co.query, co.url, co.score FROM co "
            "LEFT JOIN exdocs x ON x.query = co.query AND x.url = co.url WHERE x.url IS NULL) "
            "SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance FROM surv"
        ),
        "engine_export_postings": (
            f"WITH {_PTOKS} SELECT url, term, CAST(count(*) AS BIGINT) AS tf "
            "FROM pt GROUP BY url, term"
        ),
        "engine_search_site": (
            # per-site cutoff: kept iff round(100*site_df/site_pages) < 80,
            # i.e. 200*df < 159*site_pages (same half-up trick as global)
            f"WITH {_ptoks_for_source(_restrict_src)}, "
            "np AS (SELECT count(*) AS n FROM pages), "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT n FROM np)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c, CAST(sum(tf) AS BIGINT) AS score "
            "FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url, c.score FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms) "
            "SELECT query, url, score, "
            "CAST(score AS DOUBLE) / max(score) OVER (PARTITION BY query) AS relevance FROM co"
        ),
        "engine_facet_sites": (
            f"WITH {_PTOKS}, "
            "smap AS (SELECT 'https://' || source || '.bench.example/d/' || "
            "lpad(CAST(doc_id AS VARCHAR), 8, '0') || '/0' AS url, "
            "source || '.bench.example' AS site FROM documents), "
            "tf AS (SELECT url, term, count(*) AS tf FROM pt GROUP BY url, term), "
            "df AS (SELECT term, count(DISTINCT url) AS df FROM pt GROUP BY term), "
            "q(query, term) AS (VALUES "
            + ", ".join(f"('{q}', '{t}')" for q, t in _flagship_query_terms())
            + "), "
            "kept AS (SELECT q.query, q.term FROM q JOIN df USING (term) "
            "WHERE 200 * df.df < 159 * (SELECT count(*) FROM documents)), "
            "nk AS (SELECT query, count(*) AS n_terms FROM kept GROUP BY query), "
            "hits AS (SELECT k.query, t.url, t.term, t.tf FROM kept k JOIN tf t USING (term)), "
            "cand AS (SELECT query, url, count(DISTINCT term) AS c FROM hits GROUP BY query, url), "
            "co AS (SELECT c.query, c.url FROM cand c JOIN nk USING (query) WHERE c.c = nk.n_terms) "
            "SELECT co.query, s.site, CAST(count(*) AS BIGINT) AS n "
            "FROM co JOIN smap s USING (url) GROUP BY co.query, s.site"
        ),
        "sample_hash": (
            "SELECT doc_id, source, n_chars FROM documents "
            "WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 10"
        ),
        "top_terms_per_site": (
            f"WITH {_TS}, std AS (SELECT site, term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
            "FROM t GROUP BY site, term), "
            "r AS (SELECT site, term, df, row_number() OVER "
            "(PARTITION BY site ORDER BY df DESC, term) AS rank FROM std) "
            "SELECT site, CAST(rank AS BIGINT) AS rank, term, df FROM r WHERE rank <= 5"
        ),
        "curate_corpus": (
            # dedup winners ∧ length gate ∧ md5 sample — the composed pipeline
            "SELECT d.doc_id, d.source, d.n_chars FROM documents d "
            "JOIN (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text) w "
            "USING (doc_id) "
            "WHERE d.n_chars >= 50 "
            "AND md5_number_upper(CAST(d.doc_id AS VARCHAR)) % 100 < 50"
        ),
        "tfidf": (
            # ln ≡ math.log (ULP-verified); weight = one IEEE multiply of the
            # integer tf by idf — floats hash-match exactly
            f"WITH {_T}, tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
            "FROM t GROUP BY doc_id, term), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term) "
            "SELECT tf.doc_id, tf.term, tf.tf, "
            "CAST(tf.tf AS DOUBLE) * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) "
            "/ CAST(df.df AS DOUBLE)) AS tfidf "
            "FROM tf JOIN df USING (term)"
        ),
        "redact_regex": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_hits, "
            "CAST(length(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS BIGINT) AS n_chars_redacted, "
            "md5(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS redacted_fp "
            "FROM documents"
        ),
        "bigram_counts": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(trim("
            "regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g')), ' +'), x -> x <> '') AS l "
            "FROM documents), "
            "bg AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram "
            "FROM toks WHERE len(l) >= 2) "
            "SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg "
            "GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50"
        ),
        "lm_score": (
            # self-trained add-1 bigram LM: P(w2|w1) = (C(w1w2)+1)/(C(w1·)+V);
            # per-doc Σ n·ln(P) as an ORDERED aggregate (bigram asc) — the
            # engine accumulates sequentially in the same order, so the
            # doubles are bit-identical; avg is one IEEE divide
            f"WITH {_TOKL}, "
            "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(l)), "
            "i -> l[i] || ' ' || l[i+1])) AS bigram FROM tokl WHERE len(l) >= 2), "
            "gc AS (SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS n "
            "FROM bg GROUP BY doc_id, bigram), "
            "cb AS (SELECT bigram, CAST(sum(n) AS BIGINT) AS cb FROM gc GROUP BY bigram), "
            "cbw AS (SELECT bigram, cb, string_split(bigram, ' ')[1] AS w1 FROM cb), "
            "cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM cbw GROUP BY w1), "
            "v AS (SELECT count(DISTINCT x) AS v FROM (SELECT unnest(l) AS x FROM tokl)), "
            "sc AS (SELECT cbw.bigram, ln((cbw.cb + 1) / (cu.cu + 1 * (SELECT v FROM v))) AS logp "
            "FROM cbw JOIN cu USING (w1)), "
            "per AS (SELECT gc.doc_id, CAST(sum(gc.n) AS BIGINT) AS n_bigrams, "
            "sum(CAST(gc.n AS DOUBLE) * sc.logp ORDER BY gc.bigram) AS logp_sum "
            "FROM gc JOIN sc USING (bigram) GROUP BY gc.doc_id) "
            "SELECT doc_id, n_bigrams, logp_sum, logp_sum / n_bigrams AS avg_logp FROM per"
        ),
        "repetition_signals": (
            f"WITH {_TOKL}, "
            "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram FROM tokl WHERE len(l) >= 2), "
            "bgc AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY doc_id, bigram), "
            "top AS (SELECT doc_id, bigram AS top_bigram, CAST(n AS BIGINT) AS top_bigram_n FROM "
            "(SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, bigram) AS r FROM bgc) WHERE r = 1), "
            "nbg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams FROM bg GROUP BY doc_id), "
            "tg AS (SELECT doc_id, unnest(list_transform(range(1, len(l)-1), i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS trigram FROM tokl WHERE len(l) >= 3), "
            "tga AS (SELECT doc_id, CAST(count(*) - count(DISTINCT trigram) AS BIGINT) AS dup_trigram_n FROM tg GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(n.n_bigrams, 0) AS n_bigrams, COALESCE(t.top_bigram, '') AS top_bigram, "
            "COALESCE(t.top_bigram_n, 0) AS top_bigram_n, COALESCE(g.dup_trigram_n, 0) AS dup_trigram_n "
            "FROM documents d LEFT JOIN nbg n USING (doc_id) LEFT JOIN top t USING (doc_id) LEFT JOIN tga g USING (doc_id)"
        ),
        "decontaminate": (
            f"WITH {_TOKL}, "
            "g AS (SELECT doc_id, unnest(list_transform(range(1, len(l)-3), "
            "i -> l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4])) AS g5 FROM tokl WHERE len(l) >= 5), "
            "bench AS (SELECT DISTINCT g5 FROM g WHERE doc_id % 97 = 0), "
            "hits AS (SELECT doc_id, CAST(count(DISTINCT g5) AS BIGINT) AS n_overlap FROM g JOIN bench USING (g5) GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(h.n_overlap, 0) AS n_overlap, "
            "CAST(COALESCE(h.n_overlap, 0) > 0 AS BIGINT) AS contaminated "
            "FROM documents d LEFT JOIN hits h USING (doc_id)"
        ),
        "stratified_sample": (
            "SELECT doc_id, lang, source FROM documents "
            "WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < "
            "CASE lang WHEN 'en' THEN 20 ELSE 50 END"
        ),
        "related_docs": (
            f"WITH {_T}, "
            "tfd AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term), "
            "q AS (SELECT term, tf AS tfq FROM tfd WHERE doc_id = 0), "
            "s AS (SELECT tfd.doc_id AS doc_id, CAST(sum(tfd.tf * q.tfq) AS BIGINT) AS score "
            "FROM tfd JOIN q USING (term) WHERE tfd.doc_id <> 0 GROUP BY tfd.doc_id) "
            "SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "winnow_fingerprints": (
            # MOSS winnowing over token 3-grams: md5-LE64 per gram
            # (md5_number_upper ≡ the engine primitive), window-of-W min per
            # position, keep windows that fit (or the first when a doc has
            # < W grams), DISTINCT per doc, uint64 shifted to int64
            f"WITH {_winnow_ctes} SELECT doc_id, fp FROM wfp"
        ),
        "blocklist_hits": (
            # wordlist gate over the surface stream (stopwords kept);
            # lower + quote-escape so editing BLOCKLIST keeps engine and
            # oracle in lockstep (the engine lowercases its word set)
            f"WITH {_TOKL}, tok AS (SELECT doc_id, unnest(l) AS term FROM tokl) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits FROM tok "
            "WHERE term IN ("
            + ", ".join("'" + w.lower().replace("'", "''") + "'" for w in _blocklist)
            + ") GROUP BY doc_id"
        ),
        "oov_rate": (
            # top-K vocabulary by (count desc, term asc); per-doc OOV share
            f"WITH {_TOKL}, tok AS (SELECT doc_id, unnest(l) AS term FROM tokl), "
            "c AS (SELECT term, count(*) AS n FROM tok GROUP BY term), "
            "v AS (SELECT term FROM (SELECT term, row_number() OVER "
            f"(ORDER BY n DESC, term) AS rn FROM c) WHERE rn <= {_oov_k}), "
            "per AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov "
            "FROM tok t LEFT JOIN v ON v.term = t.term GROUP BY t.doc_id) "
            "SELECT doc_id, n_tokens, n_oov, "
            "CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate FROM per"
        ),
        "source_overlap": (
            # cross-source contamination: winnow fingerprints shared between
            # two sources (train/test leakage detector); same CTEs as
            # winnow_fingerprints
            f"WITH {_winnow_ctes}, "
            "sf AS (SELECT DISTINCT d.source, w.fp FROM wfp w "
            "JOIN documents d USING (doc_id)) "
            "SELECT a.source AS source_a, b.source AS source_b, "
            "CAST(count(*) AS BIGINT) AS n_shared_fps "
            "FROM sf a JOIN sf b ON a.fp = b.fp AND b.source > a.source "
            "GROUP BY a.source, b.source"
        ),
        "pack_sequences": (
            # per-source greedy first-fit in doc_id order: join while the
            # running total stays <= budget, else a new sequence; an
            # oversized doc always opens its own sequence.  The recursion
            # replays the sequential scan exactly (dedup_near_clusters
            # discipline: RECURSIVE oracle for an iterative operator).
            "WITH RECURSIVE "
            "tok AS (SELECT doc_id, source, CAST(len(list_filter(string_split_regex(trim("
            "regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g')), ' +'), x -> x <> '')) "
            "AS BIGINT) AS n_tokens FROM documents), "
            "t AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM tok), "
            "p AS ("
            "SELECT source, rn, doc_id, n_tokens, n_tokens AS fill, 0 AS seq FROM t WHERE rn = 1 "
            "UNION ALL "
            "SELECT t.source, t.rn, t.doc_id, t.n_tokens, "
            f"CASE WHEN p.fill + t.n_tokens <= {_pack_budget} THEN p.fill + t.n_tokens ELSE t.n_tokens END, "
            f"CASE WHEN p.fill + t.n_tokens <= {_pack_budget} THEN p.seq ELSE p.seq + 1 END "
            "FROM p JOIN t ON t.source = p.source AND t.rn = p.rn + 1) "
            "SELECT source, doc_id, n_tokens, CAST(seq AS BIGINT) AS seq_id, "
            "CAST(fill AS BIGINT) AS seq_fill FROM p"
        ),
        "chunk_docs": (
            # sliding windows of CHUNK_SIZE tokens at stride size−overlap;
            # last window = first one reaching the end (no suffix tails)
            f"WITH {_TOKL}, "
            "d AS (SELECT doc_id, l, len(l) AS n FROM tokl WHERE len(l) > 0), "
            "c AS (SELECT doc_id, l, n, unnest(range(CASE WHEN n > "
            f"{_chunk_sz} THEN 1 + (n - {_chunk_sz} + {_chunk_sz - _chunk_ov} - 1) "
            f"// {_chunk_sz - _chunk_ov} ELSE 1 END)) AS i FROM d) "
            "SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, "
            f"CAST(i * {_chunk_sz - _chunk_ov} AS BIGINT) AS start, "
            f"CAST(least(i * {_chunk_sz - _chunk_ov} + {_chunk_sz}, n) "
            f"- i * {_chunk_sz - _chunk_ov} AS BIGINT) AS n_tokens, "
            f"array_to_string(l[CAST(i * {_chunk_sz - _chunk_ov} + 1 AS BIGINT):"
            f"CAST(least(i * {_chunk_sz - _chunk_ov} + {_chunk_sz}, n) AS BIGINT)], ' ') "
            "AS chunk_text FROM c"
        ),
        "hard_negatives": (
            # MoreLikeThis top-50 lexical neighbors of doc 0, reranked by
            # embedding cosine ASC (hardest negatives first); the cosine
            # only orders — rows carry the integer lexical score
            f"WITH {_T}, "
            "tfd AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term), "
            "q AS (SELECT term, tf AS tfq FROM tfd WHERE doc_id = 0), "
            "s AS (SELECT tfd.doc_id AS doc_id, CAST(sum(tfd.tf * q.tfq) AS BIGINT) AS lex_score "
            "FROM tfd JOIN q USING (term) WHERE tfd.doc_id <> 0 GROUP BY tfd.doc_id), "
            "lex AS (SELECT doc_id, lex_score FROM (SELECT s.*, row_number() OVER "
            "(ORDER BY lex_score DESC, doc_id) AS lr FROM s) WHERE lr <= 50), "
            "c AS (SELECT lex.doc_id, lex.lex_score, list_cosine_similarity(e.embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cos "
            "FROM lex JOIN embeddings e ON e.vec_id = lex.doc_id) "
            "SELECT rank, doc_id, lex_score FROM (SELECT CAST(row_number() OVER "
            "(ORDER BY cos ASC, doc_id) AS BIGINT) AS rank, doc_id, lex_score FROM c) "
            "WHERE rank <= 10"
        ),
        "dup_ngram_fraction": (
            f"WITH {_TOKL}, "
            "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(l)), "
            "i -> l[i] || ' ' || l[i+1])) AS gram FROM tokl WHERE len(l) >= 2), "
            "gc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY doc_id, gram), "
            "df AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM gc GROUP BY gram), "
            "per AS (SELECT gc.doc_id, CAST(sum(gc.c) AS BIGINT) AS n_grams, "
            "CAST(sum(CASE WHEN df.df > 1 THEN gc.c ELSE 0 END) AS BIGINT) AS n_dup "
            "FROM gc JOIN df USING (gram) GROUP BY gc.doc_id) "
            "SELECT doc_id, n_grams, n_dup, "
            "CAST(n_dup AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_frac FROM per"
        ),
        "weighted_sample": (
            # Duffield-Lund-Thorup priority sample, integer-floored priority
            # w*2^20 // u with u = 20-bit md5-LE64 slice + 1 — int64-exact
            "WITH p AS (SELECT doc_id, n_chars, "
            "CAST((n_chars * 1048576) // (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) "
            "% 1048576 AS BIGINT) + 1) AS BIGINT) AS priority FROM documents) "
            "SELECT doc_id, n_chars, priority FROM p "
            "ORDER BY priority DESC, doc_id LIMIT 50"
        ),
        "hybrid_rrf": (
            # RRF fusion of the search_and lexical ranking and the
            # ann_cosine_topk semantic ranking; scores are 1/(60+rank) from
            # INTEGER ranks, one fixed-order add — IEEE-exact on both sides
            f"WITH {_T}, "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term), "
            f"hits AS (SELECT * FROM tf WHERE term IN ('{ta}','{tb}')), "
            "per_doc AS (SELECT doc_id, count(DISTINCT term) AS n_terms, sum(tf) AS score FROM hits GROUP BY doc_id), "
            "co AS (SELECT doc_id, score FROM per_doc WHERE n_terms = 2), "
            "lexr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM co), "
            "lex AS (SELECT doc_id, r FROM lexr WHERE r <= 10), "
            "sems AS (SELECT e.vec_id, list_cosine_similarity(e.embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)) AS score FROM embeddings e), "
            "semr AS (SELECT vec_id AS doc_id, row_number() OVER (ORDER BY score DESC, vec_id) AS r FROM sems), "
            "sem AS (SELECT doc_id, r FROM semr WHERE r <= 10), "
            "u AS (SELECT doc_id, COALESCE(1.0/(60 + l.r), 0) + COALESCE(1.0/(60 + s.r), 0) AS rrf "
            "FROM lex l FULL OUTER JOIN sem s USING (doc_id)) "
            "SELECT doc_id, rrf FROM u ORDER BY rrf DESC, doc_id LIMIT 10"
        ),
        "pmi_bigrams": (
            f"WITH {_TOKL}, "
            "uni AS (SELECT unnest(l) AS w FROM tokl), "
            "unic AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY w), "
            "n1 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni), "
            "bg AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram FROM tokl WHERE len(l) >= 2), "
            "bgc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY bigram), "
            "n2 AS (SELECT CAST(sum(n) AS BIGINT) AS v FROM bgc), "
            "top AS (SELECT bigram, n FROM bgc WHERE n >= 2 ORDER BY n DESC, bigram LIMIT 20) "
            "SELECT t.bigram, t.n, ln((CAST(t.n AS DOUBLE) * (SELECT v FROM n1) * (SELECT v FROM n1)) / "
            "(CAST((SELECT v FROM n2) AS DOUBLE) * a.n * b.n)) AS pmi "
            "FROM top t JOIN unic a ON a.w = string_split(t.bigram, ' ')[1] "
            "JOIN unic b ON b.w = string_split(t.bigram, ' ')[2]"
        ),
        "media_meta": (
            "WITH m AS (SELECT doc_id AS media_id, "
            "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n, ascii(substr(text, 1, 1)) AS b0 FROM documents) "
            "SELECT media_id, kind, n AS n_bytes, "
            "CAST(CASE WHEN kind='image' THEN 16 + n % 317 ELSE 0 END AS BIGINT) AS width, "
            "CAST(CASE WHEN kind='image' THEN 16 + (n*7 + b0) % 211 ELSE 0 END AS BIGINT) AS height, "
            "CAST(CASE WHEN kind='image' THEN 3 ELSE 0 END AS BIGINT) AS channels, "
            "CAST(CASE WHEN kind='audio' THEN 16000 ELSE 0 END AS BIGINT) AS sample_rate, "
            "CAST(CASE WHEN kind='audio' THEN n*4 ELSE 0 END AS BIGINT) AS n_samples, "
            "CAST(CASE WHEN kind='video' THEN greatest(1, n // 64) ELSE 0 END AS BIGINT) AS n_frames "
            "FROM m"
        ),
        # REAL-decoder media stats: the Ray side parses actual BMP/WAV/Y4M
        # bytes (rayindex.media_codecs); the oracle replays the closed-form
        # pixel/sample content (x+y+c+id etc.) the fixture generator encodes,
        # so any decode error (offset, padding, chunk walk, frame marker)
        # breaks the hash.
        "media_image_stats": (
            "WITH m AS (SELECT doc_id AS media_id, 16 + doc_id % 17 AS w, "
            "16 + doc_id % 11 AS h FROM documents WHERE doc_id % 3 = 0), "
            "px AS (SELECT media_id, w, h, unnest(range(w)) AS x FROM m), "
            "pxy AS (SELECT media_id, w, h, x, unnest(range(h)) AS y FROM px) "
            "SELECT media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, "
            "CAST(3 AS BIGINT) AS channels, "
            "CAST(SUM((x + y + media_id) % 256 + (x + y + 1 + media_id) % 256 "
            "+ (x + y + 2 + media_id) % 256) AS BIGINT) AS pixel_sum "
            "FROM pxy GROUP BY 1, 2, 3, 4"
        ),
        "media_audio_stats": (
            "WITH m AS (SELECT doc_id AS media_id, 8000 * (1 + doc_id % 3) AS rate, "
            "256 + doc_id % 181 AS n FROM documents WHERE doc_id % 3 = 1), "
            "s AS (SELECT media_id, rate, n, unnest(range(n)) AS i FROM m) "
            "SELECT media_id, CAST(rate AS BIGINT) AS sample_rate, "
            "CAST(n AS BIGINT) AS n_samples, "
            "CAST(SUM((7 * i + media_id) % 65536 - 32768) AS BIGINT) AS sample_sum "
            "FROM s GROUP BY 1, 2, 3"
        ),
        "media_video_frames": (
            "WITH m AS (SELECT doc_id AS media_id, 8 + doc_id % 9 AS w, "
            "8 + doc_id % 7 AS h, 4 + doc_id % 29 AS nf FROM documents WHERE doc_id % 3 = 2), "
            "f AS (SELECT media_id, w, h, unnest(range(0, nf, 4)) AS frame_id FROM m) "
            "SELECT media_id, CAST(frame_id AS BIGINT) AS frame_id, "
            "CAST(3 * w * h * ((31 * frame_id + media_id) % 256) AS BIGINT) AS frame_sum "
            "FROM f"
        ),
        "embedding_near_dup": (
            "SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b FROM embeddings a "
            "JOIN embeddings b ON b.vec_id > a.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
        ),
        "ann_cosine_topk": (
            "WITH s AS (SELECT e.vec_id, list_cosine_similarity(e.embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)) AS score FROM embeddings e) "
            "SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank, vec_id "
            "FROM s ORDER BY score DESC, vec_id LIMIT 10"
        ),
        "ann_rerank_fixed": (
            # exact rerank of the fixed vec_id % 7 == 0 probe set — the ANN
            # rerank kernel under a SQL-reproducible candidate filter
            "WITH s AS (SELECT e.vec_id, list_cosine_similarity(e.embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0)) AS score "
            "FROM embeddings e WHERE e.vec_id % 7 = 0) "
            "SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank, vec_id "
            "FROM s ORDER BY score DESC, vec_id LIMIT 10"
        ),
        "dedup_near_clusters": (
            # transitive closure of the near-dup pair graph; cluster id =
            # min reachable vec_id (singletons map to themselves)
            "WITH RECURSIVE p AS ("
            "SELECT a.vec_id AS a, b.vec_id AS b FROM embeddings a "
            "JOIN embeddings b ON b.vec_id > a.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4), "
            "e AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p), "
            "reach(src, dst) AS ("
            "SELECT vec_id, vec_id FROM embeddings "
            "UNION "
            "SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst) "
            "SELECT src AS vec_id, CAST(min(dst) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY src"
        ),
        "simhash": (
            r"WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents), "
            "t AS (SELECT doc_id, tok, CAST(count(*) AS HUGEINT) AS tf FROM toks WHERE tok <> '' GROUP BY doc_id, tok), "
            "h AS (SELECT doc_id, md5_number_upper(tok) AS hv, tf FROM t), "
            "bits AS (SELECT doc_id, i.i AS i, "
            "sum(CASE WHEN (hv >> i.i) & 1 = 1 THEN tf ELSE -tf END) AS acc "
            "FROM h CROSS JOIN (SELECT unnest(range(64)) AS i) i GROUP BY doc_id, i.i), "
            "vals AS (SELECT doc_id, sum(CASE WHEN acc > 0 THEN CAST(1 AS HUGEINT) << i ELSE 0 END) AS v "
            "FROM bits GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(v.v, 0) - 9223372036854775808 AS BIGINT) AS simhash "
            "FROM documents d LEFT JOIN vals v USING (doc_id)"
        ),
        "minhash_lsh_pairs": (
            # numpy uint64 arithmetic wraps at 2^64, so the permutation is
            # ((a*h + b) mod 2^64) mod p — mirrored with the double modulo.
            # The Ray side also caps pathological buckets at LSH_BUCKET_CAP
            # (512); fixture buckets are far smaller, so the sets agree.
            f"WITH {_mh_pairs_ctes} "
            "SELECT doc_a, doc_b FROM mhp ORDER BY doc_a, doc_b"
        ),
        "curate_corpus_near": (
            # the composed RefinedWeb pipeline: minhash pairs (same CTEs as
            # minhash_lsh_pairs) → recursive transitive closure → min-id
            # winner per cluster → n_chars gate → md5-LE64 hash sample
            f"WITH RECURSIVE {_mh_pairs_ctes}, "
            "e AS (SELECT doc_a AS a, doc_b AS b FROM mhp "
            "UNION ALL SELECT doc_b, doc_a FROM mhp), "
            "reach(src, dst) AS (SELECT doc_id, doc_id FROM documents "
            "UNION SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst), "
            "cl AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src), "
            "win AS (SELECT doc_id FROM cl WHERE doc_id = cluster_id) "
            "SELECT d.doc_id, d.source, d.n_chars FROM documents d JOIN win USING (doc_id) "
            "WHERE d.n_chars >= 50 AND "
            "md5_number_upper(CAST(d.doc_id AS VARCHAR)) % 100 < 50"
        ),
        "media_frames": (
            # documents are ASCII, so VARCHAR substr == byte slicing of the
            # utf-8 payload; frame f covers bytes [f*64, f*64+64)
            "WITH m AS (SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n "
            "FROM documents WHERE doc_id % 3 = 2), "
            "f AS (SELECT media_id, text, unnest(range(0, greatest(1, n // 64), 8)) AS frame_id FROM m) "
            "SELECT media_id, CAST(frame_id AS BIGINT) AS frame_id, "
            "substr(md5(substr(text, CAST(frame_id*64 + 1 AS INTEGER), 64)), 1, 16) AS frame_hash FROM f"
        ),
        "media_features": (
            "WITH f AS (SELECT doc_id AS media_id, unnest(range(16)) AS dim_id, text FROM documents) "
            "SELECT media_id, CAST(dim_id AS BIGINT) AS dim_id, "
            "CAST(CAST(CAST(md5_number_upper(text || ':' || dim_id) AS DOUBLE) "
            "/ 18446744073709551616.0 AS FLOAT) AS DOUBLE) AS value FROM f"
        ),
        "events_hopping": (
            # size 10 min / hop 5 min → each event lands in 2 windows
            "WITH e AS (SELECT epoch_us(ts) AS us, event_type, "
            "CAST(round(value*100) AS BIGINT) AS cents FROM events), "
            "x AS (SELECT ((us // 300000000) - k.k) * 300000000 AS w, event_type, cents "
            "FROM e CROSS JOIN (SELECT unnest(range(2)) AS k) k) "
            "SELECT CAST(w AS BIGINT) AS window_start_us, event_type, "
            "CAST(count(*) AS BIGINT) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents "
            "FROM x GROUP BY 1, 2"
        ),
        "events_range_join": (
            "SELECT a.event_id, b.event_id AS error_id FROM events a JOIN events b "
            "ON a.user_id = b.user_id AND b.event_type = 'error' "
            "AND epoch_us(a.ts) >= epoch_us(b.ts) "
            "AND epoch_us(a.ts) < epoch_us(b.ts) + 3600000000 "
            "AND a.event_id <> b.event_id"
        ),
        "events_funnel": (
            # first-touch funnel view → click → purchase; stage i counts only
            # events strictly after stage i-1's first hit, "after" on the
            # (ts, event_id) tuple — mirrors rayindex.events.funnel_steps
            "WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type "
            "FROM events WHERE event_type IN ('view','click','purchase')), "
            "s1 AS (SELECT user_id, us, event_id FROM ("
            "SELECT user_id, us, event_id, row_number() OVER "
            "(PARTITION BY user_id ORDER BY us, event_id) AS r "
            "FROM e WHERE event_type = 'view') WHERE r = 1), "
            "s2 AS (SELECT user_id, us, event_id FROM ("
            "SELECT e.user_id, e.us, e.event_id, row_number() OVER "
            "(PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS r "
            "FROM e JOIN s1 ON e.user_id = s1.user_id "
            "AND (e.us > s1.us OR (e.us = s1.us AND e.event_id > s1.event_id)) "
            "WHERE e.event_type = 'click') WHERE r = 1), "
            "s3 AS (SELECT user_id, us, event_id FROM ("
            "SELECT e.user_id, e.us, e.event_id, row_number() OVER "
            "(PARTITION BY e.user_id ORDER BY e.us, e.event_id) AS r "
            "FROM e JOIN s2 ON e.user_id = s2.user_id "
            "AND (e.us > s2.us OR (e.us = s2.us AND e.event_id > s2.event_id)) "
            "WHERE e.event_type = 'purchase') WHERE r = 1) "
            "SELECT s1.user_id, CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3 "
            "WHEN s2.user_id IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS reached "
            "FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id "
            "LEFT JOIN s3 ON s1.user_id = s3.user_id"
        ),
        "doclen_quantiles": (
            "SELECT source AS site, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q25, "
            "CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS q50, "
            "CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q75, "
            "CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS q95 "
            "FROM documents GROUP BY source"
        ),
        "kmv_distinct_terms": (
            # deterministic KMV sketch: K=64 smallest distinct 61-bit token
            # hashes per site; estimate (K-1)*2^61/kth, exact below K
            "WITH toks AS (SELECT source, unnest(list_filter(string_split_regex(trim("
            "regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g')), ' +'), x -> x <> '')) AS tok "
            "FROM documents), "
            "h AS (SELECT DISTINCT source, "
            "CAST(md5_number_upper(tok) & CAST(2305843009213693951 AS UBIGINT) AS BIGINT) AS hv "
            "FROM toks), "
            "r AS (SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rn, "
            "count(*) OVER (PARTITION BY source) AS cnt FROM h) "
            "SELECT source AS site, CAST(CASE WHEN max(cnt) < 64 THEN max(cnt) "
            "ELSE CAST(63 AS HUGEINT) * 2305843009213693952 // max(CASE WHEN rn = 64 THEN hv END) "
            "END AS BIGINT) AS n_distinct_est FROM r GROUP BY source"
        ),
        "events_windowed": (
            # exact integer cents (round(value*100)) — no float summation;
            # epoch-µs int64 keys — no pandas/DuckDB timestamp-unit skew
            "WITH w AS (SELECT (epoch_us(ts) // 300000000) * 300000000 AS window_start_us, "
            "event_type, CAST(round(value*100) AS BIGINT) AS cents FROM events) "
            "SELECT CAST(window_start_us AS BIGINT) AS window_start_us, event_type, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(cents) AS BIGINT) AS sum_cents FROM w GROUP BY window_start_us, event_type"
        ),
        "events_anomalies": (
            # per-type z-score over observed 5-min window counts; exact-int
            # moments → one divide each, mirrored op-for-op (see
            # events.rate_anomalies float discipline)
            "WITH w AS (SELECT (epoch_us(ts) // 300000000) * 300000000 AS window_start, "
            "event_type FROM events), "
            "c AS (SELECT event_type, window_start, CAST(count(*) AS BIGINT) AS n "
            "FROM w GROUP BY 1, 2), "
            "st AS (SELECT event_type, count(*) AS k, sum(n) AS s, sum(n*n) AS ssq "
            "FROM c GROUP BY event_type), "
            "z AS (SELECT c.event_type, c.window_start, c.n, "
            "(CAST(c.n AS DOUBLE) - CAST(st.s AS DOUBLE) / st.k) / "
            "sqrt(CAST(st.k * st.ssq - st.s * st.s AS DOUBLE) / CAST(st.k * st.k AS DOUBLE)) AS z "
            "FROM c JOIN st USING (event_type) "
            "WHERE st.k >= 2 AND st.k * st.ssq - st.s * st.s > 0) "
            "SELECT event_type, window_start, n, z FROM z WHERE abs(z) >= 2.0"
        ),
        "events_retention": (
            # cohort = period of a user's first event (10-min periods);
            # n_users = distinct users active in (cohort, offset)
            "WITH e AS (SELECT user_id, (epoch_us(ts) // 600000000) * 600000000 AS per FROM events), "
            "up AS (SELECT DISTINCT user_id, per FROM e), "
            "c AS (SELECT user_id, min(per) AS cohort FROM up GROUP BY user_id) "
            "SELECT CAST(c.cohort AS BIGINT) AS cohort_ts, "
            "CAST((up.per - c.cohort) // 600000000 AS BIGINT) AS period_offset, "
            "CAST(count(*) AS BIGINT) AS n_users FROM up JOIN c USING (user_id) "
            "GROUP BY 1, 2"
        ),
        "events_sessions": (
            "WITH o AS (SELECT user_id, ts, event_id, "
            "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) - 1 AS session_idx FROM o) "
            "SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(min(epoch_us(ts)) AS BIGINT) AS start_us, "
            "CAST(max(epoch_us(ts)) AS BIGINT) AS end_us "
            "FROM s GROUP BY user_id, session_idx"
        ),
        "events_asof": (
            # deterministic as-of: ties on ts broken by highest event_id
            "WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'), "
            "errors AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type='error') "
            "SELECT c.event_id, c.user_id, CAST(epoch_us(c.ts) AS BIGINT) AS ts_us, "
            "(SELECT e.value FROM errors e WHERE e.user_id = c.user_id AND e.ts <= c.ts "
            "ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS last_error_value "
            "FROM clicks c WHERE EXISTS "
            "(SELECT 1 FROM errors e WHERE e.user_id = c.user_id AND e.ts <= c.ts)"
        ),
    }
    # the positional phrase path must agree with the doc-store verify
    # path exactly — one oracle pins both engine implementations
    out["engine_phrase_pos_topk"] = out["engine_phrase_topk"]
    # merge ≡ rebuild: the merged index serves the SAME tables/scores as a
    # full single build, so the merged entries reuse those oracles verbatim
    out["engine_merged_term_df"] = out["engine_term_df"]
    # upsert ≡ rebuild: keep-latest merge of a stale index + re-crawl serves
    # the same scores as one full build over the true pages
    out["engine_upsert_search"] = out["engine_search_scores"]
    # sharded build ≡ single build: the shard namespace changes doc ids,
    # never scores/urls, so a 2-shard build serves identical results
    out["engine_sharded_search"] = out["engine_search_scores"]
    # PForDelta ≡ varbyte: both codecs decode to the same posting lists, so
    # either codec's index serves identical scores (tests/test_pfor_build.py)
    out["engine_search_scores_pfor"] = out["engine_search_scores"]
    out["engine_search_scores_vb"] = out["engine_search_scores"]
    # integrity audit of a freshly-built index: the invariant IS emptiness —
    # the oracle pins zero rows with the violation-table columns
    out["index_audit"] = (
        'SELECT CAST(NULL AS VARCHAR) AS term, CAST(NULL AS INTEGER) AS salt, '
        'CAST(NULL AS INTEGER) AS bucket, CAST(NULL AS VARCHAR) AS "check", '
        "CAST(NULL AS VARCHAR) AS detail WHERE FALSE"
    )
    # distributed serving tier ≡ single-process engine, row for row
    out["engine_batch_search"] = out["engine_search_scores"]
    out["engine_merged_search"] = out["engine_search_scores"]
    # WARC sink→source roundtrip: the invariant is per-page byte identity —
    # the oracle pins the all-true table over every page url, so a lost
    # record breaks the row count and a corrupted byte breaks the hash
    out["warc_roundtrip"] = (
        "SELECT 'https://' || source || '.bench.example/d/' || "
        "lpad(CAST(doc_id AS VARCHAR), 8, '0') || '/0' AS url, "
        "CAST(1 AS BOOLEAN) AS roundtrip_ok FROM documents"
    )
    # same invariant for the JSONL connector (text/lang compared too — the
    # JSONL path carries the full PAGES row, where WARC derives text/lang)
    out["jsonl_roundtrip"] = out["warc_roundtrip"]
    return out
