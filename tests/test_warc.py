"""WARC/WET source (sources/warc.py) — reader pinned by the writer."""

import gzip
import os

import pytest

from feast_ray.sources.warc import (
    parse_warc_stream,
    read_wet,
    strip_http_headers,
    write_wet,
)


RECS = [
    {"url": "https://a.example/x", "date": "2026-01-01T00:00:00Z",
     "text": "hello world"},
    {"url": "https://b.example/y", "date": "2026-01-02T00:00:00Z",
     "text": "unicode éß中文 \U0001f600 text"},
    {"url": "https://c.example/z", "date": "2026-01-03T00:00:00Z",
     "text": ""},
]


def test_wet_round_trip(tmp_path):
    for gz in (True, False):
        p = str(tmp_path / (f"f{int(gz)}.wet" + (".gz" if gz else "")))
        write_wet(RECS, p, gzipped=gz)
        got = parse_warc_stream(open(p, "rb").read(), gzipped=gz)
        assert len(got) == 3
        for r, g in zip(RECS, got):
            assert g["warc_type"] == "conversion"
            assert g["url"] == r["url"]
            assert g["date"] == r["date"]
            assert g["payload"].decode() == r["text"]

    # writer output is byte-stable (mtime pinned)
    p1, p2 = str(tmp_path / "s1.gz"), str(tmp_path / "s2.gz")
    write_wet(RECS, p1)
    write_wet(RECS, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_wet_dataset(tmp_path):
    # two files -> two blocks -> one dataset, order-insensitive
    write_wet(RECS[:2], str(tmp_path / "a.wet.gz"))
    write_wet(RECS[2:], str(tmp_path / "b.wet.gz"))
    df = read_wet([str(tmp_path / "a.wet.gz"), str(tmp_path / "b.wet.gz")]) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df["url"]) == [r["url"] for r in RECS]
    assert list(df["text"]) == [r["text"] for r in RECS]
    assert list(df["warc_date"]) == [r["date"] for r in RECS]


def test_warc_response_and_errors(tmp_path):
    # response records: HTTP headers are stripped
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi</html>"
    assert strip_http_headers(http) == b"<html>hi</html>"
    rec = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: https://r.example/\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode() + http + b"\r\n\r\n"
    p = str(tmp_path / "r.warc.gz")
    open(p, "wb").write(gzip.compress(rec, 6, mtime=0))
    df = read_wet(p, types=("response",)).to_pandas()
    assert list(df["text"]) == ["<html>hi</html>"]
    # conversion-only read skips the response record
    assert len(read_wet(p).to_pandas()) == 0

    # malformed inputs fail loudly
    with pytest.raises(ValueError):
        parse_warc_stream(gzip.compress(b"NOPE\r\n\r\n"), gzipped=True)
    with pytest.raises(ValueError):
        parse_warc_stream(gzip.compress(rec)[:20], gzipped=True)
    trunc = rec[: len(rec) - 20]
    with pytest.raises(ValueError):
        parse_warc_stream(trunc, gzipped=False)
