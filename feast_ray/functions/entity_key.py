"""Stable binary entity-key encoding.

Semantics reproduced: the reference's serialized entity keys for its
KV plane — join keys sorted by name, each encoded with a type tag and
length prefix, versioned, so the same logical key always produces the
same bytes on any machine/process (feast/infra/key_encoding_utils.py:
123-190, serialization version 3's sorted stable layout).

Used wherever the engine needs a process-stable identity for an
entity-key dict (online rows, dedup identities, cache keys).
"""

from __future__ import annotations

import struct

ENCODING_VERSION = 1

_TYPE_TAGS = {
    int: b"i",
    str: b"s",
    bytes: b"b",
    float: b"f",
    bool: b"o",
}


def serialize_entity_key(entity_key: dict) -> bytes:
    """dict of join_key → value ⇒ stable bytes. Keys sorted by name;
    values type-tagged + length-prefixed; little-endian fixed widths."""
    out = [b"v", struct.pack("<B", ENCODING_VERSION)]
    for name in sorted(entity_key):
        value = entity_key[name]
        nb = name.encode("utf-8")
        out.append(struct.pack("<H", len(nb)))
        out.append(nb)
        tag = _TYPE_TAGS.get(type(value))
        if tag is None:
            raise TypeError(f"unsupported entity key value type {type(value)!r}")
        out.append(tag)
        if tag == b"i":
            out.append(struct.pack("<q", value))
        elif tag == b"f":
            out.append(struct.pack("<d", value))
        elif tag == b"o":
            out.append(struct.pack("<?", value))
        else:
            vb = value.encode("utf-8") if tag == b"s" else value
            out.append(struct.pack("<I", len(vb)))
            out.append(vb)
    return b"".join(out)


def deserialize_entity_key(data: bytes) -> dict:
    """Inverse of :func:`serialize_entity_key`."""
    assert data[0:1] == b"v"
    version = data[1]
    if version != ENCODING_VERSION:
        raise ValueError(f"unsupported encoding version {version}")
    pos = 2
    out: dict = {}
    while pos < len(data):
        (nlen,) = struct.unpack_from("<H", data, pos)
        pos += 2
        name = data[pos : pos + nlen].decode("utf-8")
        pos += nlen
        tag = data[pos : pos + 1]
        pos += 1
        if tag == b"i":
            (val,) = struct.unpack_from("<q", data, pos)
            pos += 8
        elif tag == b"f":
            (val,) = struct.unpack_from("<d", data, pos)
            pos += 8
        elif tag == b"o":
            (val,) = struct.unpack_from("<?", data, pos)
            pos += 1
        else:
            (vlen,) = struct.unpack_from("<I", data, pos)
            pos += 4
            raw = data[pos : pos + vlen]
            pos += vlen
            val = raw.decode("utf-8") if tag == b"s" else raw
        out[name] = val
    return out
