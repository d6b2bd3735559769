"""Minimal Avro Object Container File codec in pure Python.

Closes the last ``COPY ... TO`` format gap (GAPS.md): DF40's COPY
accepts avro, Spark needs the external spark-avro jar (unobtainable
offline) — so the engine writes the container format itself.  Scope is
the COPY-result shape: flat records of ``long | double | string``
(nullable via the standard ``["null", T]`` union), null codec.  That is
exactly what an aggregate result needs; nested/logical types stay on
the parquet path.

Format (Avro 1.11 spec, public): magic ``Obj\\x01``, file-metadata map
(``avro.schema`` JSON, ``avro.codec`` null) encoded as an Avro map,
16-byte sync marker, then data blocks of ``<count><byte-size><records>``
followed by the sync marker.  Integers are zigzag varints; doubles are
little-endian IEEE 8 bytes; strings are length-prefixed UTF-8.
"""

from __future__ import annotations

import json
import struct
from typing import Any

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic marker: files are reproducible


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift, u = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _encode_value(v: Any, typ: str) -> bytes:
    # nullable union ["null", typ]: branch index first
    if v is None:
        return _zigzag_encode(0)
    out = _zigzag_encode(1)
    if typ == "long":
        return out + _zigzag_encode(int(v))
    if typ == "double":
        return out + struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return out + _zigzag_encode(len(raw)) + raw
    raise ValueError(f"unsupported avro type {typ}")


def _decode_value(buf: bytes, pos: int, typ: str) -> tuple[Any, int]:
    branch, pos = _zigzag_decode(buf, pos)
    if branch == 0:
        return None, pos
    if typ == "long":
        return _zigzag_decode(buf, pos)
    if typ == "double":
        return struct.unpack("<d", buf[pos:pos + 8])[0], pos + 8
    if typ == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    raise ValueError(f"unsupported avro type {typ}")


def make_schema(fields: list[tuple[str, str]],
                name: str = "copy_result") -> dict:
    return {"type": "record", "name": name,
            "fields": [{"name": n, "type": ["null", t]}
                       for n, t in fields]}


def write_avro(path: str, fields: list[tuple[str, str]],
               rows: list[tuple]) -> None:
    """Write one Avro OCF with a single data block (COPY results are
    small by contract; multi-block needs only a loop here)."""
    schema = make_schema(fields)
    body = bytearray()
    for row in rows:
        for v, (_, typ) in zip(row, fields):
            body += _encode_value(v, typ)
    meta_entries = [("avro.schema", json.dumps(schema).encode()),
                    ("avro.codec", b"null")]
    out = bytearray(MAGIC)
    out += _zigzag_encode(len(meta_entries))
    for k, v in meta_entries:
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)  # end of metadata map
    out += SYNC
    if rows:
        out += _zigzag_encode(len(rows))
        out += _zigzag_encode(len(body))
        out += body
        out += SYNC
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_avro(path: str) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Parse an OCF written by any conforming writer (null codec,
    flat nullable long/double/string records)."""
    buf = open(path, "rb").read()
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos, meta = 4, {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            _, pos = _zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            kl, pos = _zigzag_decode(buf, pos)
            k = buf[pos:pos + kl].decode()
            pos += kl
            vl, pos = _zigzag_decode(buf, pos)
            meta[k] = buf[pos:pos + vl]
            pos += vl
    if meta.get("avro.codec", b"null") != b"null":
        raise ValueError("only the null codec is supported")
    schema = json.loads(meta["avro.schema"])
    fields = [(f["name"], [t for t in f["type"] if t != "null"][0])
              for f in schema["fields"]]
    sync = buf[pos:pos + 16]
    pos += 16
    rows: list[tuple] = []
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        _size, pos = _zigzag_decode(buf, pos)
        for _ in range(count):
            vals = []
            for _, typ in fields:
                v, pos = _decode_value(buf, pos, typ)
                vals.append(v)
            rows.append(tuple(vals))
        if buf[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
    return fields, rows
