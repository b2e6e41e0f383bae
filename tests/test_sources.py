"""WARC source/sink (rayindex/sources.py): roundtrip, record filtering,
HTTP parsing quirks, and build-from-WARC ≡ build-from-Parquet digests."""

from __future__ import annotations

import gzip

import pyarrow as pa
import pyarrow.dataset as pads
import pytest


def _pages_sorted(t: pa.Table) -> pa.Table:
    t = t.select(["url", "warc_ts", "html"])
    return t.sort_by("url")


@pytest.mark.parametrize("gzip_members", [False, True])
def test_warc_roundtrip(ray_session, fixture_corpus, tmp_path, gzip_members):
    from rayindex.sources import read_warc, write_warc
    import ray.data as rd

    pages = fixture_corpus.pages
    # a null-url row is unrepresentable in WARC: skipped, not counted
    null_row = pa.table(
        {"url": pa.array([None], pa.string()),
         "warc_ts": pa.array([None], pa.timestamp("us")),
         "html": pa.array([b"<p>orphan</p>"], pa.binary()),
         "text": pa.array([""], pa.string()),
         "lang": pa.array([""], pa.string())},
        schema=pages.schema,
    )
    out = tmp_path / ("w_gz" if gzip_members else "w")
    n = write_warc(rd.from_arrow(pa.concat_tables([pages, null_row])),
                   str(out), gzip_members=gzip_members)
    assert n == pages.num_rows
    got = read_warc(str(out)).to_arrow_refs()
    import ray as _ray

    got = pa.concat_tables([_ray.get(r) for r in got])
    assert got.schema.equals(pages.schema)
    assert (got.column("text").to_pylist() == [""] * got.num_rows)
    assert _pages_sorted(got).equals(_pages_sorted(pages))


def test_warc_parsing_quirks(ray_session, tmp_path):
    """Hand-crafted archive: chunked transfer-encoding is dechunked, 404s are
    dropped by default (kept with keep_http_errors), non-content records
    (warcinfo/request) are skipped, resource records carry the raw block."""
    from rayindex.sources import read_warc

    def rec(rtype: bytes, url: bytes, block: bytes, ctype=b"application/http; msgtype=response"):
        h = (
            b"WARC/1.0\r\nWARC-Type: " + rtype + b"\r\n"
            b"WARC-Target-URI: " + url + b"\r\n"
            b"WARC-Date: 2024-05-06T07:08:09Z\r\n"
            b"Content-Type: " + ctype + b"\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
        )
        return h + block + b"\r\n\r\n"

    chunked_http = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\n<p>he\r\n6\r\nllo</p\r\n1\r\n>\r\n0\r\n\r\n"
    )
    plain_http = b"HTTP/1.1 200 OK\r\nContent-Length: 8\r\n\r\n<p>b</p>"
    err_http = b"HTTP/1.1 404 Not Found\r\n\r\ngone"
    info_block = b"software: test\r\n"
    arc = (
        rec(b"warcinfo", b"", info_block, ctype=b"application/warc-fields")
        + rec(b"request", b"https://x.example/a", b"GET /a HTTP/1.1\r\n\r\n",
              ctype=b"application/http; msgtype=request")
        + rec(b"response", b"https://x.example/chunked", chunked_http)
        + rec(b"response", b"https://x.example/plain", plain_http)
        + rec(b"response", b"https://x.example/missing", err_http)
        + rec(b"resource", b"https://x.example/raw", b"raw bytes here",
              ctype=b"text/html")
    )
    p = tmp_path / "quirks.warc"
    p.write_bytes(arc)
    t = read_warc(str(p)).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(t["url"]) == [
        "https://x.example/chunked",
        "https://x.example/plain",
        "https://x.example/raw",
    ]
    by_url = dict(zip(t["url"], t["html"]))
    assert by_url["https://x.example/chunked"] == b"<p>hello</p>"
    assert by_url["https://x.example/plain"] == b"<p>b</p>"
    assert by_url["https://x.example/raw"] == b"raw bytes here"
    assert str(t["warc_ts"][0]) == "2024-05-06 07:08:09"

    kept = read_warc(str(p), keep_http_errors=True).to_pandas()
    assert "https://x.example/missing" in set(kept["url"])

    # concatenated gzip members (Common Crawl layout) parse identically
    gz = tmp_path / "quirks.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(chunk) for chunk in [arc[: len(arc) // 2], arc[len(arc) // 2 :]]))
    # NB: members split mid-record still form one logical stream
    t2 = read_warc(str(gz)).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(t2["url"]) == list(t["url"])


def test_build_from_warc_digest_equal(ray_session, fixture_corpus, tmp_path):
    """ingest_warc → build_index produces a byte-identical index to building
    over the same pages written as Parquet directly."""
    import ray.data as rd

    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.segments import segments_digest
    from rayindex.sources import ingest_warc, write_warc

    pages = fixture_corpus.pages
    warc_dir = tmp_path / "warc"
    write_warc(rd.from_arrow(pages), str(warc_dir), gzip_members=True)

    pq_a = str(tmp_path / "pages_a")
    ingest_warc(str(warc_dir), pq_a)
    pq_b = str(tmp_path / "pages_b")
    write_pages(pages, pq_b, 4)

    # ingest preserved every page byte-for-byte
    ta = pads.dataset(pq_a).to_table(columns=["url", "warc_ts", "html"])
    tb = pads.dataset(pq_b).to_table(columns=["url", "warc_ts", "html"])
    assert _pages_sorted(ta).equals(_pages_sorted(tb))

    kw = dict(num_buckets=4, salt_df_threshold=40, salt_target=48)
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(pq_a, ia, fixture_corpus.analyzer_spec, **kw)
    build_index(pq_b, ib, fixture_corpus.analyzer_spec, **kw)
    assert segments_digest(f"{ia}/shard=0") == segments_digest(f"{ib}/shard=0")


def test_ingest_warc_idempotent(ray_session, fixture_corpus, tmp_path):
    """A completed ingest is skipped on re-run (marker); a partial ingest
    (no marker, stale fragments) is cleared and redone — never duplicated."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rayindex.sources import ingest_warc, write_warc

    pages = fixture_corpus.pages
    warc_dir = tmp_path / "w"
    write_warc(rd.from_arrow(pages), str(warc_dir))
    out = tmp_path / "pq"

    def rows():
        return sum(
            pq.ParquetFile(p).metadata.num_rows for p in out.glob("*.parquet")
        )

    ingest_warc(str(warc_dir), str(out))
    assert rows() == pages.num_rows
    ingest_warc(str(warc_dir), str(out))  # marker short-circuits
    assert rows() == pages.num_rows
    # simulate a crashed partial ingest: marker gone, stale fragment present
    (out / "_INGESTED").unlink()
    ingest_warc(str(warc_dir), str(out))
    assert rows() == pages.num_rows
    # the build's readers ignore the marker file
    import pyarrow.dataset as pads

    assert pads.dataset(str(out)).count_rows() == pages.num_rows


def test_jsonl_roundtrip_and_shapes(ray_session, fixture_corpus, tmp_path):
    """PAGES → JSONL (html base64, epoch-µs ts) → PAGES is lossless including
    text/lang; the reader also accepts the shapes other tools emit (plain
    string html, ISO warc_ts, missing optional fields)."""
    import json

    import ray.data as rd

    from rayindex.sources import read_pages_jsonl, write_pages_jsonl

    pages = fixture_corpus.pages
    out = tmp_path / "jl"
    n = write_pages_jsonl(rd.from_arrow(pages), str(out))
    assert n == pages.num_rows
    got = read_pages_jsonl(str(out)).to_arrow_refs()
    import ray as _ray

    got = pa.concat_tables([_ray.get(r) for r in got])
    assert got.schema.equals(pages.schema)
    assert got.sort_by("url").equals(pages.sort_by("url"))

    # foreign shape: string html, ISO ts, no text/lang fields
    alt = tmp_path / "alt.jsonl"
    with open(alt, "w") as f:
        f.write(json.dumps({"url": "https://a.example/x",
                            "warc_ts": "2024-05-06T07:08:09Z",
                            "html": "<p>hi</p>"}) + "\n")
        f.write(json.dumps({"url": "https://a.example/y",
                            "warc_ts": "2024-05-06T07:08:10Z",
                            "html": "<p>yo</p>"}) + "\n")
    t = read_pages_jsonl(str(alt)).to_pandas().sort_values("url").reset_index(drop=True)
    assert t["html"][0] == b"<p>hi</p>"
    assert str(t["warc_ts"][0]) == "2024-05-06 07:08:09"
    assert list(t["text"]) == ["", ""] and list(t["lang"]) == ["", ""]
