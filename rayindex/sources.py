"""WARC source/sink: ingest Common-Crawl-style archives into the PAGES table.

The reference fetches pages live over HTTP (S2,
``dto/indexing/PageIndexer.java:75-88``); at crawl scale the corpus instead
arrives as WARC archives (ISO 28500 — the format Common Crawl publishes).
``read_warc`` is a Ray Data ``FileBasedDatasource``: each archive (or
``.warc.gz`` with per-record gzip members, Common Crawl's layout) is one
streaming read task that parses records incrementally and yields Arrow
blocks in the PAGES_SCHEMA — no file is ever materialized whole, so a
1 GB archive costs one task's buffer, not one block of RAM.

Scale notes:
- parallelism = number of archive files (Common Crawl segments are ~1 GB ×
  tens of thousands per crawl — far more files than cores on any cluster);
- records stream through a bounded line buffer; blocks are cut every
  ``batch_rows`` pages so downstream ``map_batches`` stages see normal-sized
  Arrow batches;
- the sink (``write_warc``) is a side-effect batch writer like the doc
  store's: one archive member per block, distributed, no driver funnel.

``ingest_warc`` is the bridge to the build: WARC → Parquet pages directory
(hive layout the planner's metadata passes expect) → ``build_index``.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from datetime import datetime, timezone
from typing import Iterator, List, Union

import pyarrow as pa
import pyarrow.compute as pc

from .schema import PAGES_SCHEMA

_CRLF = b"\r\n"
_DEFAULT_BATCH_ROWS = 1024
# WARC-Types whose block carries page content.  "response" wraps an HTTP
# message; "resource"/"conversion" carry the payload directly (WET-style).
_CONTENT_TYPES = (b"response", b"resource", b"conversion")


class _ByteLines:
    """Minimal buffered reader over a pyarrow NativeFile / file object:
    CRLF-terminated header lines + exact-length block reads, bounded buffer."""

    def __init__(self, f, chunk: int = 1 << 16):
        self._f = f
        self._buf = bytearray()
        self._chunk = chunk
        self._eof = False

    def _fill(self) -> None:
        data = self._f.read(self._chunk)
        if not data:
            self._eof = True
        else:
            self._buf += data

    def readline(self) -> bytes:
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                line = bytes(self._buf[: i + 1])
                del self._buf[: i + 1]
                return line
            if self._eof:
                line = bytes(self._buf)
                self._buf.clear()
                return line
            self._fill()

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n and not self._eof:
            self._fill()
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def _parse_warc_ts(value: bytes):
    """WARC-Date (ISO 8601, UTC) → naive-UTC python datetime (µs), or None."""
    s = value.decode("ascii", "replace").strip()
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body (robust: returns the
    raw body if the chunk framing is malformed — one bad record must not kill
    an archive's read task)."""
    out, pos = [], 0
    try:
        while True:
            eol = body.index(b"\r\n", pos)
            size = int(body[pos:eol].split(b";")[0], 16)
            if size == 0:
                break
            start = eol + 2
            out.append(body[start : start + size])
            pos = start + size + 2  # skip chunk-data CRLF
    except (ValueError, IndexError):
        return body
    return b"".join(out)


def _parse_http_response(block: bytes) -> tuple[bytes, int]:
    """HTTP response message → (body bytes, status code)."""
    sep = block.find(b"\r\n\r\n")
    if sep >= 0:
        head, body = block[:sep], block[sep + 4 :]
    else:
        sep = block.find(b"\n\n")
        if sep >= 0:
            head, body = block[:sep], block[sep + 2 :]
        else:
            return block, 200
    lines = head.split(b"\n")
    status = 200
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            pass
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"transfer-encoding" and b"chunked" in v.lower():
            body = _dechunk(body)
            break
    return body, status


def _extensions_for(paths, extensions: list) -> "list | None":
    """Directory reads keep the extension filter (a leftover ``part-*.tmp``
    from a crashed sink, or any stray file, would otherwise kill the whole
    read task with 'not a WARC record header'); explicit single-file paths
    stay unfiltered so any filename can be read directly."""
    plist = [paths] if isinstance(paths, str) else list(paths)
    if any(os.path.isdir(p) for p in plist):
        return extensions
    return None


def _iter_warc_records(stream) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers lower-cased, raw block bytes) per WARC record."""
    rd = _ByteLines(stream)
    while True:
        line = rd.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record header: {line[:40]!r}")
        headers: dict[bytes, bytes] = {}
        while True:
            h = rd.readline()
            if h in (_CRLF, b"\n", b""):
                break
            k, _, v = h.partition(b":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers.get(b"content-length", b"0"))
        block = rd.read_exact(n)
        if len(block) < n:
            # truncated archive (e.g. an interrupted download): read_exact
            # drained the stream short of Content-Length — indexing the
            # partial body as valid html would be silent corruption, so
            # drop the record and flag the archive
            import logging

            logging.getLogger(__name__).warning(
                "truncated WARC record: expected %d body bytes, got %d — "
                "dropping the partial record and stopping this archive",
                n, len(block),
            )
            return
        yield headers, block


def _records_to_rows(stream, keep_http_errors: bool):
    for headers, block in _iter_warc_records(stream):
        rtype = headers.get(b"warc-type", b"")
        if rtype not in _CONTENT_TYPES:
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        if not url:
            continue
        if rtype == b"response" and headers.get(b"content-type", b"").lower().startswith(
            b"application/http"
        ):
            body, status = _parse_http_response(block)
            if status >= 400 and not keep_http_errors:
                continue
        else:
            body = block
        yield url, _parse_warc_ts(headers.get(b"warc-date", b"")), body


try:  # Ray is a hard dependency of the package, but keep the import explicit
    import ray.data as _rd
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """Streaming WARC reader → PAGES_SCHEMA blocks (S2 analog)."""

        _FILE_EXTENSIONS = ["warc", "warc.gz", "arc.gz"]

        def __init__(self, paths, *, batch_rows: int = _DEFAULT_BATCH_ROWS,
                     keep_http_errors: bool = False, **kwargs):
            kwargs.setdefault("file_extensions", _extensions_for(paths, self._FILE_EXTENSIONS))
            super().__init__(paths, **kwargs)
            self._batch_rows = batch_rows
            self._keep_http_errors = keep_http_errors

        def _read_stream(self, f, path: str):
            # .gz arrives already decompressed: FileBasedDatasource detects
            # the codec from the path and wraps the stream (Arrow's gzip
            # reader handles Common Crawl's concatenated members)
            stream = f
            urls: list[str] = []
            tss: list = []
            htmls: list[bytes] = []

            def cut() -> pa.Table:
                t = pa.table(
                    {
                        "url": pa.array(urls, pa.string()),
                        "warc_ts": pa.array(tss, pa.timestamp("us")),
                        "html": pa.array(htmls, pa.binary()),
                        "text": pa.array([""] * len(urls), pa.string()),
                        "lang": pa.array([""] * len(urls), pa.string()),
                    },
                    schema=PAGES_SCHEMA,
                )
                urls.clear()
                tss.clear()
                htmls.clear()
                return t

            for url, ts, body in _records_to_rows(stream, self._keep_http_errors):
                urls.append(url)
                tss.append(ts)
                htmls.append(body)
                if len(urls) >= self._batch_rows:
                    yield cut()
            if urls:
                yield cut()

    def read_warc(paths: Union[str, List[str]], *, batch_rows: int = _DEFAULT_BATCH_ROWS,
                  keep_http_errors: bool = False, **kwargs) -> "_rd.Dataset":
        """``ray.data``-native WARC source: one streaming read task per
        archive, yielding PAGES_SCHEMA blocks.  ``text``/``lang`` are empty —
        extraction is the pipeline's job (byte-identity invariant)."""
        return _rd.read_datasource(
            WarcDatasource(paths, batch_rows=batch_rows,
                           keep_http_errors=keep_http_errors, **kwargs)
        )

except ImportError:  # pragma: no cover - ray is always present in this env
    read_warc = None  # type: ignore[assignment]


def pages_to_warc_bytes(table: pa.Table, gzip_members: bool = False) -> bytes:
    """PAGES rows → one WARC archive (response records wrapping an HTTP 200).
    ``gzip_members=True`` emits Common Crawl's member-per-record gzip layout."""
    out = io.BytesIO()
    urls = table.column("url").to_pylist()
    tss = table.column("warc_ts").to_pylist()
    htmls = table.column("html").to_pylist()
    for url, ts, html in zip(urls, tss, htmls):
        if url is None:
            continue
        body = html if isinstance(html, bytes) else (html or "").encode()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
            + str(len(body)).encode()
            + b"\r\n\r\n"
            + body
        )
        # WARC/1.0 dates are second-resolution; keep sub-second timestamps
        # lossless via the WARC/1.1 fractional form when needed.  A null
        # warc_ts omits the header entirely (the reader returns None for a
        # missing WARC-Date), keeping the write→read roundtrip lossless for
        # null timestamps instead of aliasing them to 1970-01-01.
        date_hdr = b""
        if ts is not None:
            fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if ts.microsecond else "%Y-%m-%dT%H:%M:%SZ"
            date_hdr = b"WARC-Date: " + ts.strftime(fmt).encode() + b"\r\n"
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:" + uuid.uuid5(uuid.NAMESPACE_URL, url).hex.encode() + b">\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            + date_hdr +
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n" + http + b"\r\n\r\n"
        )
        out.write(gzip.compress(rec) if gzip_members else rec)
    return out.getvalue()


class _WarcBatchWriter:
    """Side-effect sink stage: one WARC member file per Arrow batch (the doc
    store's writer pattern — distributed, no driver funnel)."""

    def __init__(self, out_dir: str, gzip_members: bool):
        self.out_dir = out_dir
        self.gzip_members = gzip_members

    def __call__(self, batch: pa.Table) -> pa.Table:
        # null-url rows are unrepresentable as WARC records (no target URI)
        # and are skipped by pages_to_warc_bytes — count what was written
        written = batch.num_rows - batch.column("url").null_count
        if written:
            ext = "warc.gz" if self.gzip_members else "warc"
            path = os.path.join(self.out_dir, f"part-{uuid.uuid4().hex}.{ext}")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(pages_to_warc_bytes(batch, self.gzip_members))
            os.rename(tmp, path)
        return pa.table({"n": pa.array([written], pa.int64())})


def write_warc(ds, out_dir: str, *, gzip_members: bool = False) -> int:
    """Distributed WARC sink over a PAGES dataset; returns rows written."""
    os.makedirs(out_dir, exist_ok=True)
    counts = ds.map_batches(
        _WarcBatchWriter(out_dir, gzip_members),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    return int(counts["n"].sum()) if len(counts) else 0


def ingest_warc(warc_paths: Union[str, List[str]], pages_dir: str, *,
                keep_http_errors: bool = False) -> str:
    """WARC archives → Parquet pages directory in PAGES_SCHEMA (the build's
    input contract: ``build_index`` plans its dup census and docs stream
    from parquet metadata, so ingest materializes once, build reads many).

    Idempotent: a completed ingest leaves an ``_INGESTED`` marker and is
    skipped on re-run (the resumable-build story); a crashed partial ingest
    has no marker, so the rerun clears the stale fragments first."""
    marker = os.path.join(pages_dir, "_INGESTED")
    if os.path.exists(marker):
        return pages_dir
    if os.path.isdir(pages_dir):
        for name in os.listdir(pages_dir):
            if name.endswith(".parquet"):
                os.unlink(os.path.join(pages_dir, name))
    os.makedirs(pages_dir, exist_ok=True)
    read_warc(warc_paths, keep_http_errors=keep_http_errors).write_parquet(pages_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return pages_dir


# --- JSONL pages connector (the LLM-data-pipeline interchange format) ------
#
# One JSON object per line: {"url", "warc_ts", "html_b64", "text", "lang"}.
# html travels base64-encoded (JSON cannot carry raw bytes); warc_ts travels
# as int64 epoch-MICROSECONDS (unambiguous — no timezone/precision inference).
# The reader also accepts "html" as a plain UTF-8 string and ISO-8601 warc_ts
# strings, the shapes other tools emit.


def _jsonl_normalize(batch: pa.Table) -> pa.Table:
    """Any JSONL field shape → PAGES_SCHEMA."""
    import base64

    n = batch.num_rows
    names = set(batch.column_names)

    def col(name):
        return batch.column(name) if name in names else pa.nulls(n)

    url = col("url").cast(pa.string())
    ts_raw = col("warc_ts")
    if pa.types.is_timestamp(ts_raw.type):
        ts = ts_raw.cast(pa.timestamp("us"))
    elif pa.types.is_integer(ts_raw.type):
        ts = ts_raw.cast(pa.int64()).cast(pa.timestamp("us"))
    elif pa.types.is_string(ts_raw.type):
        ts = pa.array(
            [_parse_warc_ts(s.encode()) if s is not None else None
             for s in ts_raw.to_pylist()],
            pa.timestamp("us"),
        )
    else:
        ts = pa.nulls(n, pa.timestamp("us"))
    if "html_b64" in names:
        html = pa.array(
            [base64.b64decode(s) if s is not None else None
             for s in batch.column("html_b64").to_pylist()],
            pa.binary(),
        )
    elif "html" in names:
        html = pa.array(
            [s.encode() if isinstance(s, str) else s
             for s in batch.column("html").to_pylist()],
            pa.binary(),
        )
    else:
        html = pa.nulls(n, pa.binary())
    text = pc.fill_null(col("text").cast(pa.string()), "")
    lang = pc.fill_null(col("lang").cast(pa.string()), "")
    return pa.table(
        {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang},
        schema=PAGES_SCHEMA,
    )


def read_pages_jsonl(paths: Union[str, List[str]]):
    """JSONL pages → PAGES_SCHEMA Dataset (``ray.data.read_json`` under the
    hood: one streaming read task per file, blocks normalized per batch)."""
    return _rd.read_json(
        paths, file_extensions=_extensions_for(paths, ["jsonl"])
    ).map_batches(_jsonl_normalize, batch_format="pyarrow", zero_copy_batch=True)


class _JsonlBatchWriter:
    """Side-effect sink stage: one .jsonl file per Arrow batch."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import base64
        import json as _json

        if batch.num_rows:
            urls = batch.column("url").to_pylist()
            tss = batch.column("warc_ts").cast(pa.int64()).to_pylist()
            htmls = batch.column("html").to_pylist()
            texts = batch.column("text").to_pylist()
            langs = batch.column("lang").to_pylist()
            path = os.path.join(self.out_dir, f"part-{uuid.uuid4().hex}.jsonl")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                for u, t, h, x, lg in zip(urls, tss, htmls, texts, langs):
                    f.write(_json.dumps({
                        "url": u,
                        "warc_ts": t,
                        "html_b64": base64.b64encode(h).decode() if h is not None else None,
                        "text": x,
                        "lang": lg,
                    }) + "\n")
            os.rename(tmp, path)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})


def write_pages_jsonl(ds, out_dir: str) -> int:
    """Distributed JSONL sink over a PAGES dataset; returns rows written."""
    os.makedirs(out_dir, exist_ok=True)
    counts = ds.map_batches(
        _JsonlBatchWriter(out_dir), batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return int(counts["n"].sum()) if len(counts) else 0
