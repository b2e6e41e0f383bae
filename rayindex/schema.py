"""Arrow schemas and deterministic doc-id assignment.

Data model (SURVEY.md §1): the reference keeps four MySQL tables — ``site``,
``page`` (model/PageEntity.java:13-34), ``lemma`` (model/LemmaEntity.java:12-28,
``frequency`` = per-site document frequency) and ``index_table``
(model/IndexEntity.java:11-23, ``rank_value`` = within-page term count).  Here
each logical table is a Parquet-backed ``ray.data.Dataset`` of Arrow blocks.

The reference assigns page ids with MySQL auto-increment
(model/PageEntity.java:15-16) — a global sequential bottleneck that cannot
exist at 10^12 documents.  We replace it with a deterministic, order-free
url hash, computed vectorized per batch.  With ``num_shards == 1`` the id is
``hash64(url) >> 1``; with sharding the shard index occupies the LOW bits
(``doc_id = (hash64(url) >> (1+B)) << B | shard_index`` where
``B = bits(num_shards-1)``), which makes cross-shard doc_id ranges disjoint
— two urls in different shards can NEVER collide, so the query engine's
multi-shard posting merge never sees equal doc_ids.  Low bits (not high)
keep each shard's ids spread over the full [0, 2^63) range, which the
order-preserving docid-range salting of head terms depends on.  Within one
shard, a residual 2^(63-B)-space birthday collision (~5×10^4 pairs at the
10^12-doc design scale) maps both urls to the same doc_id; the build's exact
dup-resolution groupby then keeps one deterministic winner — a documented
treat-as-duplicate degradation, never a crash.  The id is confined to 63
bits and stored as ``int64`` so signed and unsigned orderings coincide —
Arrow/pandas/Ray aggregate machinery is int64-native (uint64 keys above 2^63
degrade to pickled-object columns in shuffles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# Input table (BASELINE.json input_hint): one row per Common-Crawl-style page.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # golden extracted text (byte-identity invariant)
        ("lang", pa.string()),
    ]
)

# Doc store (replaces the reference `page` table; SURVEY.md §1).  doc_len
# lives in the postings/doclen tables, not here.
DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("site", pa.string()),
        ("title", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
    ]
)

# Exploded postings before the shuffle: one row per (doc, term).  `first`
# marks one row per doc (shuffle-free doclen); `bucket` = hash(term) % B.
POSTINGS_FLAT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("site", pa.string()),
        ("term", pa.string()),
        ("tf", pa.uint32()),
        ("doc_len", pa.uint32()),
        ("first", pa.bool_()),
        ("bucket", pa.int32()),
    ]
)

# Term dictionary / df (replaces the reference `lemma` table: per-site df,
# dto/indexing/PageIndexer.java:161-204).
TERM_STATS_SCHEMA = pa.schema(
    [
        ("site", pa.string()),
        ("term", pa.string()),
        ("df", pa.int64()),
    ]
)

# Compressed index segment rows (replaces `index_table` rows; SURVEY.md §1).
# One row per (term, salt): delta+varbyte docids, varbyte tfs, varbyte doc
# lengths, and per-block (128 docs) block-max metadata as little-endian
# fixed-width binary blobs.
SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("bucket", pa.int32()),
        ("n_docs", pa.int64()),
        ("n_blocks", pa.int32()),
        ("b_last_doc", pa.binary()),  # uint64[n_blocks]
        ("b_max_tf", pa.binary()),  # uint32[n_blocks]
        ("b_min_dl", pa.binary()),  # uint32[n_blocks]
        ("b_doc_nbytes", pa.binary()),  # uint32[n_blocks]
        ("b_tf_nbytes", pa.binary()),  # uint32[n_blocks]
        ("b_dl_nbytes", pa.binary()),  # uint32[n_blocks]
        ("docs_blob", pa.binary()),
        ("tfs_blob", pa.binary()),
        ("dls_blob", pa.binary()),
        # positional layer (empty binary in non-positional builds): per-doc
        # position-blob byte lengths (uint32[n_docs] LE) + the concatenated
        # delta+varbyte position lists in docid order
        ("pos_nbytes_blob", pa.binary()),
        ("pos_blob", pa.binary()),
        # stream codec of the three blobs: "vb" (delta+varbyte) or "pfor"
        # (NewPFD patched frame-of-reference); block framing is shared
        ("codec", pa.string()),
    ]
)


def hash64_strings(values) -> np.ndarray:
    """Vectorized deterministic 64-bit hash of a string array → uint64.

    Uses pandas' SipHash-1-3 string hasher with its fixed default key — stable
    across processes and machines (no PYTHONHASHSEED involvement), C-speed.
    """
    arr = pd.array(values, dtype="object") if not isinstance(values, np.ndarray) else values
    out = pd.util.hash_array(np.asarray(arr, dtype=object), categorize=False)
    return out.astype(np.uint64)


def doc_ids_for_urls(urls, shard_index: int = 0, num_shards: int = 1) -> np.ndarray:
    """Deterministic doc id, int64 in [0, 2^63) (SURVEY.md §4; module
    docstring for the shard-namespace layout).

    num_shards == 1: ``hash64(url) >> 1``.  Sharded: shard index in the LOW
    ``B = bits(num_shards-1)`` bits → cross-shard ids are disjoint (no
    collision can span shards) while each shard's ids still cover the full
    [0, 2^63) range (required by ``range_salt``'s ordered sub-lists).
    """
    h = hash64_strings(urls)
    if num_shards <= 1:
        return (h >> np.uint64(1)).astype(np.int64)
    b = int(num_shards - 1).bit_length()
    return (((h >> np.uint64(1 + b)) << np.uint64(b)) | np.uint64(shard_index)).astype(np.int64)


def term_bucket(terms, num_buckets: int) -> np.ndarray:
    """Shuffle/file-layout bucket for a term: hash64(term) % num_buckets."""
    return (hash64_strings(terms) % np.uint64(num_buckets)).astype(np.int32)


def range_salt(doc_ids: np.ndarray, num_salts: int) -> np.ndarray:
    """Order-preserving salt: floor(doc_id / (2^63 / S)).

    Salting a head term by *docid range* keeps each per-salt sub-list sorted
    and the ranges disjoint & ordered, so the segment reader concatenates the
    sub-rows in salt order instead of k-way merging (SURVEY.md §4 skew row).
    """
    if num_salts <= 1:
        return np.zeros(len(doc_ids), dtype=np.int32)
    width = np.int64(2**63 // num_salts)
    out = (doc_ids.astype(np.int64) // width).astype(np.int32)
    # doc_ids in the top (2^63 mod S) sliver would yield salt == S; clip so
    # salts stay in [0, S) (ordering is preserved — the sliver maps to S-1)
    return np.minimum(out, np.int32(num_salts - 1))
