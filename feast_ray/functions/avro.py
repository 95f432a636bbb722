"""Avro binary codec for the stream path.

The reference's Kafka processor decodes json OR avro message payloads
(infra/contrib/spark_kafka_processor.py:6,51-57 via spark-avro's
``from_avro``). No avro library exists in this sandbox, so the binary
encoding is implemented directly from the Avro 1.11 spec (zigzag
varint longs, length-prefixed strings/bytes, IEEE little-endian
float/double, fields in schema order, unions as index+value, arrays/
maps as counted blocks). Supported schema subset: primitives, records,
arrays, maps, [null, X] unions, and timestamp-micros/millis logical
types — the shapes event streams actually use. Unsupported schema
features raise, never mis-decode.

The encoder exists so tests and fixtures can produce real Avro bytes
without a library; both directions round-trip.
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta, timezone
from typing import Any

_EPOCH = datetime(1970, 1, 1)


# ------------------------------------------------------------- decoding


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        n = self.read_long()
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out


def _norm_schema(schema) -> dict:
    if isinstance(schema, str):
        return {"type": schema}
    if isinstance(schema, list):
        return {"type": "union", "branches": schema}
    return schema


def _decode(schema, r: _Reader) -> Any:
    s = _norm_schema(schema)
    t = s["type"]
    if t == "null":
        return None
    if t == "boolean":
        b = r.buf[r.pos]
        r.pos += 1
        return bool(b)
    if t in ("int", "long"):
        v = r.read_long()
        lt = s.get("logicalType")
        if lt == "timestamp-micros":
            return _EPOCH + timedelta(microseconds=v)
        if lt == "timestamp-millis":
            return _EPOCH + timedelta(milliseconds=v)
        return v
    if t == "float":
        v = struct.unpack_from("<f", r.buf, r.pos)[0]
        r.pos += 4
        return v
    if t == "double":
        v = struct.unpack_from("<d", r.buf, r.pos)[0]
        r.pos += 8
        return v
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "bytes":
        return r.read_bytes()
    if t == "record":
        return {f["name"]: _decode(f["type"], r) for f in s["fields"]}
    if t == "union":
        idx = r.read_long()
        return _decode(s["branches"][idx], r)
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                r.read_long()  # block byte size — unused when parsing all
                n = -n
            for _ in range(n):
                out.append(_decode(s["items"], r))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(s["values"], r)
    raise NotImplementedError(f"avro type not supported: {t!r}")


def decode_record(payload: bytes, schema: dict) -> dict:
    """One schema-framed Avro binary datum → dict."""
    r = _Reader(payload)
    out = _decode(schema, r)
    if r.pos != len(payload):
        raise ValueError(
            f"trailing bytes after avro datum ({len(payload) - r.pos})"
        )
    return out


def decode_records(payloads: "list[bytes]", schema: dict) -> "list[dict]":
    return [decode_record(p, schema) for p in payloads]


# ------------------------------------------------------------- encoding


def _zigzag(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema, val) -> bytes:
    s = _norm_schema(schema)
    t = s["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if val else b"\x00"
    if t in ("int", "long"):
        lt = s.get("logicalType")
        if lt == "timestamp-micros":
            if isinstance(val, datetime):
                if val.tzinfo is not None:
                    val = val.astimezone(timezone.utc).replace(tzinfo=None)
                val = int((val - _EPOCH).total_seconds() * 1_000_000)
        elif lt == "timestamp-millis":
            if isinstance(val, datetime):
                if val.tzinfo is not None:
                    val = val.astimezone(timezone.utc).replace(tzinfo=None)
                val = int((val - _EPOCH).total_seconds() * 1_000)
        return _zigzag(int(val))
    if t == "float":
        return struct.pack("<f", val)
    if t == "double":
        return struct.pack("<d", val)
    if t == "string":
        b = val.encode("utf-8")
        return _zigzag(len(b)) + b
    if t == "bytes":
        return _zigzag(len(val)) + val
    if t == "record":
        return b"".join(_encode(f["type"], val[f["name"]]) for f in s["fields"])
    if t == "union":
        for i, br in enumerate(s["branches"]):
            brt = _norm_schema(br)["type"]
            if val is None and brt == "null":
                return _zigzag(i)
            if val is not None and brt != "null":
                return _zigzag(i) + _encode(br, val)
        raise ValueError("no union branch matches value")
    if t == "array":
        if not val:
            return _zigzag(0)
        return (
            _zigzag(len(val))
            + b"".join(_encode(s["items"], v) for v in val)
            + _zigzag(0)
        )
    if t == "map":
        if not val:
            return _zigzag(0)
        body = b"".join(
            _zigzag(len(k.encode())) + k.encode() + _encode(s["values"], v)
            for k, v in val.items()
        )
        return _zigzag(len(val)) + body + _zigzag(0)
    raise NotImplementedError(f"avro type not supported: {t!r}")


def encode_record(val: dict, schema: dict) -> bytes:
    return _encode(schema, val)


# ------------------------------------- object container files (OCF)

AVRO_MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}
# deterministic marker: no RNG in library code; uniqueness per file is
# a corruption tripwire we don't need for first-party files
_DEFAULT_SYNC = b"feast-ray-avro-s"


def write_container(
    path: str,
    records: "list[dict]",
    schema: dict,
    *,
    codec: str = "null",
    records_per_block: int = 1000,
    sync: bytes = _DEFAULT_SYNC,
) -> None:
    """Avro Object Container File writer (spec 1.11.1 container
    format): magic, file-metadata map (``avro.schema`` JSON +
    ``avro.codec``), 16-byte sync marker, then blocks of
    (count, byte-length, data, sync). ``codec``: ``null`` or
    ``deflate`` (raw DEFLATE, no zlib wrapper — the spec's framing).
    Exists so the Iceberg-shaped source has real manifest files
    without an avro library in the sandbox."""
    import json as _json
    import zlib as _zlib

    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    meta = {"avro.schema": _json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out = bytearray()
    out += AVRO_MAGIC
    out += _encode(_META_SCHEMA, meta)
    out += sync
    for i in range(0, len(records), records_per_block):
        chunk = records[i:i + records_per_block]
        body = b"".join(encode_record(r, schema) for r in chunk)
        if codec == "deflate":
            body = _zlib.compress(body)[2:-4]
        out += _zigzag(len(chunk)) + _zigzag(len(body)) + body + sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_container(path: str) -> "tuple[list[dict], dict]":
    """Read an Avro OCF: returns (records, schema). Verifies magic and
    per-block sync markers; supports null and deflate codecs."""
    import json as _json
    import zlib as _zlib

    buf = open(path, "rb").read()
    if buf[:4] != AVRO_MAGIC:
        raise ValueError(f"not an avro container file: {path}")
    r = _Reader(buf)
    r.pos = 4
    meta = _decode(_META_SCHEMA, r)
    schema = _json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = buf[r.pos:r.pos + 16]
    r.pos += 16
    records: list[dict] = []
    while r.pos < len(buf):
        count = r.read_long()
        size = r.read_long()
        body = buf[r.pos:r.pos + size]
        r.pos += size
        if buf[r.pos:r.pos + 16] != sync:
            raise ValueError(f"avro block sync mismatch in {path}")
        r.pos += 16
        if codec == "deflate":
            body = _zlib.decompress(body, wbits=-15)
        br = _Reader(body)
        for _ in range(count):
            records.append(_decode(schema, br))
        if br.pos != len(body):
            raise ValueError(f"avro block trailing bytes in {path}")
    return records, schema
