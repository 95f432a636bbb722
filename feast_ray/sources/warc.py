"""WARC / WET source — the native Common-Crawl wire format.

The north-star input is "Common-Crawl-style web pages"; upstream of
any parquet lake those live as WARC (raw HTTP responses) and WET
(extracted-text "conversion" records) files: concatenated GZIP
MEMBERS, one per record, each member holding a ``WARC/1.0`` header
block, a blank line, ``Content-Length`` bytes of payload, and two
trailing CRLFs (ISO 28500). Reference parity surface: the reference's
FileSource reads only columnar files
(/root/reference/sdk/python/feast/infra/offline_stores/file_source.py:1);
this source brings the crawl format itself into the engine.

Ray-Data shape: ``ray.data.read_binary_files`` over the ``.warc.gz``
/ ``.wet.gz`` paths (one crawl file -> one block — the natural
100-TB partition unit; Common Crawl ships ~1 GB members-compressed
files), then ONE ``map_batches`` parse per file batch. Parsing is a
single pass per file with ``zlib.decompressobj(wbits=31)`` chained
through ``unused_data`` — no temp files, no per-record Python
subprocesses. A deterministic writer pins the reader in tests.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data

_CRLF = "\r\n"


def _warc_record(headers: "list[tuple[str, str]]", payload: bytes) -> bytes:
    head = "WARC/1.0" + _CRLF
    for k, v in headers:
        head += f"{k}: {v}" + _CRLF
    head += f"Content-Length: {len(payload)}" + _CRLF + _CRLF
    return head.encode("utf-8") + payload + b"\r\n\r\n"


def write_wet(
    records: "list[dict]",
    path: str,
    *,
    gzipped: bool = True,
) -> None:
    """Deterministic WET writer: one record per dict with keys
    ``url``, ``date`` (ISO-8601 string) and ``text``. Each record is
    its own gzip member (``mtime=0`` so output is byte-stable), the
    Common-Crawl layout that lets a reader split members without
    decompressing the whole file."""
    import gzip

    out = bytearray()
    for r in records:
        payload = (r["text"] or "").encode("utf-8")
        rec = _warc_record(
            [
                ("WARC-Type", "conversion"),
                ("WARC-Target-URI", r["url"]),
                ("WARC-Date", r["date"]),
            ],
            payload,
        )
        out += gzip.compress(rec, 6, mtime=0) if gzipped else rec
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def parse_warc_stream(data: bytes, gzipped: "bool | None" = None) -> "list[dict]":
    """Parse one WARC/WET file's bytes into records. Gzip members are
    walked via ``decompressobj(wbits=31)`` + ``unused_data``; the
    plain concatenated layout is a single pass over the same record
    grammar. ``gzipped=None`` auto-detects by the gzip magic — the
    robust default because ``ray.data.read_binary_files`` already
    inflates ``.gz`` paths via the pyarrow filesystem layer. Raises
    ValueError on malformed headers — crawl files are untrusted input
    and silent truncation would drop documents."""
    if gzipped is None:
        gzipped = data[:2] == b"\x1f\x8b"
    chunks: "list[bytes]" = []
    if gzipped:
        rest = data
        while rest:
            d = zlib.decompressobj(wbits=31)
            chunks.append(d.decompress(rest))
            if not d.eof:
                raise ValueError("truncated gzip member in WARC stream")
            rest = d.unused_data
        raw = b"".join(chunks)
    else:
        raw = data

    records = []
    i, n = 0, len(raw)
    while i < n:
        # tolerate inter-record CRLF padding
        while i < n and raw[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        end = raw.find(b"\r\n\r\n", i)
        if end < 0:
            raise ValueError("WARC header block missing terminator")
        head = raw[i:end].decode("utf-8", "replace").split(_CRLF)
        if not head[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {head[0]!r}")
        fields = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        body = raw[end + 4 : end + 4 + length]
        if len(body) != length:
            raise ValueError("truncated WARC payload")
        records.append(
            {
                "warc_type": fields.get("warc-type", ""),
                "url": fields.get("warc-target-uri", ""),
                "date": fields.get("warc-date", ""),
                "payload": body,
            }
        )
        i = end + 4 + length
    return records


def strip_http_headers(payload: bytes) -> bytes:
    """For WARC ``response`` records the payload is an HTTP message;
    the body starts after the first blank line."""
    sep = payload.find(b"\r\n\r\n")
    return payload if sep < 0 else payload[sep + 4 :]


def read_wet(
    paths: "str | list[str]",
    *,
    types: "tuple[str, ...]" = ("conversion",),
) -> ray.data.Dataset:
    """WET/WARC files -> Dataset(url, warc_date, text). ``conversion``
    records carry extracted text verbatim; ``response`` records are
    included when requested, with HTTP headers stripped. Compression
    is auto-detected per blob (read_binary_files may have inflated
    ``.gz`` paths already)."""

    def _parse(batch: "dict[str, np.ndarray]") -> pa.Table:
        urls, dates, texts = [], [], []
        for blob in batch["bytes"]:
            for rec in parse_warc_stream(bytes(blob)):
                if rec["warc_type"] not in types:
                    continue
                body = rec["payload"]
                if rec["warc_type"] == "response":
                    body = strip_http_headers(body)
                urls.append(rec["url"])
                dates.append(rec["date"])
                texts.append(body.decode("utf-8", "replace"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_date": pa.array(dates, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ray.data.read_binary_files(paths).map_batches(
        _parse, batch_format="numpy"
    )
