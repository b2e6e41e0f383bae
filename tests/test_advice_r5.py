"""Regression tests for the round-5 ADVICE batch (all three lows live in
``rayindex/sources.py``): truncated-archive detection, null-timestamp WARC
roundtrip, and directory-read extension filtering."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pytest

from rayindex.schema import PAGES_SCHEMA


def _pages_table(urls, tss, htmls):
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([None] * len(urls), pa.string()),
            "lang": pa.array([""] * len(urls), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def test_truncated_warc_drops_partial_record_and_warns(caplog):
    """ADVICE r5 #1: a record cut short of Content-Length must not be
    indexed as valid html — it is dropped and the archive flagged."""
    import io
    import logging

    from rayindex.sources import _records_to_rows, pages_to_warc_bytes

    t = _pages_table(
        ["https://a.example/x", "https://a.example/y"],
        [datetime(2020, 1, 1), datetime(2020, 1, 2)],
        [b"<html>first full record</html>", b"<html>second gets truncated</html>"],
    )
    raw = pages_to_warc_bytes(t)
    cut = raw[: len(raw) - 12]  # chop into the last record's body
    with caplog.at_level(logging.WARNING, logger="rayindex.sources"):
        rows = list(_records_to_rows(io.BytesIO(cut), keep_http_errors=False))
    assert [u for u, _, _ in rows] == ["https://a.example/x"]
    assert any("truncated WARC record" in r.message for r in caplog.records)


def test_null_warc_ts_roundtrips_as_null():
    """ADVICE r5 #2: a null warc_ts omits the WARC-Date header and reads
    back as None, not 1970-01-01."""
    import io

    from rayindex.sources import _records_to_rows, pages_to_warc_bytes

    t = _pages_table(
        ["https://a.example/null-ts", "https://a.example/real-ts"],
        [None, datetime(2021, 6, 1, 12, 0, 0, 250000)],
        [b"<html>no date</html>", b"<html>dated</html>"],
    )
    raw = pages_to_warc_bytes(t)
    assert raw.count(b"WARC-Date:") == 1  # only the dated record
    rows = {u: ts for u, ts, _ in _records_to_rows(io.BytesIO(raw), False)}
    assert rows["https://a.example/null-ts"] is None
    assert rows["https://a.example/real-ts"] == datetime(2021, 6, 1, 12, 0, 0, 250000)


def test_directory_read_skips_stray_files(ray_session, tmp_path):
    """ADVICE r5 #3: a leftover part-*.tmp (or any stray file) in a sink
    directory must not kill a directory read; explicit single-file paths of
    any name still read."""
    from rayindex.sources import read_pages_jsonl, read_warc, pages_to_warc_bytes

    t = _pages_table(
        ["https://a.example/p"], [datetime(2020, 1, 1)], [b"<html>ok</html>"]
    )
    d = tmp_path / "warcdir"
    d.mkdir()
    (d / "part-abc.warc").write_bytes(pages_to_warc_bytes(t))
    (d / "part-dead.tmp").write_bytes(b"half-written garbage")
    got = read_warc(str(d)).to_pandas()
    assert list(got["url"]) == ["https://a.example/p"]

    # explicit file path with a non-standard name still reads
    odd = tmp_path / "archive.bin"
    odd.write_bytes(pages_to_warc_bytes(t))
    assert read_warc(str(odd)).count() == 1

    # jsonl directory read gets the same filter
    jd = tmp_path / "jsonldir"
    jd.mkdir()
    (jd / "part-1.jsonl").write_text(
        '{"url": "https://a.example/j", "warc_ts": null, "html_b64": null,'
        ' "text": "hello", "lang": ""}\n'
    )
    (jd / "part-dead.tmp").write_text("{broken json")
    got = read_pages_jsonl(str(jd)).to_pandas()
    assert list(got["url"]) == ["https://a.example/j"]
