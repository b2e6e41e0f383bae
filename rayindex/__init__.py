"""rayindex — a brand-new Ray-Data-native inverted-index build + BM25 query
engine with the query/data-processing capabilities of the reference
crawler-search-engine at /root/reference (Spring Boot + MySQL, lemma-based).

Not a port: the reference's execution engine (per-site threads + ForkJoinPool
+ MySQL shared state) is replaced by ray.data.Dataset pipelines —
``map_batches`` over zero-copy Arrow batches, actor pools for the stateful
lemmatizer, an explicitly skew-salted ``groupby(term)`` shuffle for posting
construction, delta+varbyte compressed segments with block-max metadata, and
per-shard lineage manifests for checkpoint/resume.

See SURVEY.md for the full operator inventory and reference citations.
"""

__version__ = "0.1.0"

from .analyze import make_analyzer, simple_analyzer  # noqa: E402,F401
from .audit import audit_index  # noqa: E402,F401
from .build import build_all, build_index  # noqa: E402,F401
from .incremental import incremental_update, index_page, purge_site  # noqa: E402,F401
from .publish import current_record, publish_index, resolve_current  # noqa: E402,F401
from .query import QueryEngine  # noqa: E402,F401
from .sources import (ingest_warc, read_pages_jsonl, read_warc,  # noqa: E402,F401
                      write_pages_jsonl, write_warc)
