"""Minimal Apache Avro container-file codec (read + write), from the
PUBLIC Avro 1.11 specification — the subset Apache Iceberg's metadata
files use (records, unions-with-null, arrays, maps, all primitives,
fixed, enum; ``null`` and ``deflate`` codecs). No avro dependency
exists in this container, and Iceberg's manifest files ARE Avro — this
module is what makes :mod:`.iceberg` possible.

Schema-driven generic decoding: values come back as plain Python
(records → dicts, bytes → bytes, unions resolved). The writer exists
as the test/interop fixture half (spec-conformant container layout:
magic, metadata map with embedded schema JSON, sync-marker-delimited
blocks) so the reader is exercised against real files.

Long/int use zigzag varints; float/double little-endian IEEE;
string/bytes length-prefixed; arrays/maps are blocked with 0
terminator (negative block counts with byte size are accepted on
read, never written).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# primitive binary encoding
# ---------------------------------------------------------------------------
def _zz_enc(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zz_dec(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_varint(out: io.BytesIO, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_long(out: io.BytesIO, n: int) -> None:
    _write_varint(out, _zz_enc(n) & 0xFFFFFFFFFFFFFFFF)


def _read_varint(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        c = buf.read(1)
        if not c:
            raise AvroError("truncated varint")
        b = c[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")


def _read_long(buf: io.BytesIO) -> int:
    return _zz_dec(_read_varint(buf))


def _read_n(buf: io.BytesIO, n: int) -> bytes:
    # totality: a corrupt zig-zag length can decode negative or beyond
    # Py_ssize_t (e.g. 2^63, hypothesis-found) — BytesIO.read would raise
    # OverflowError, leaking a foreign exception type from the reader
    if n < 0 or n > 0x7FFFFFFFFFFFFFFF - 1:
        raise AvroError(f"invalid length {n}")
    b = buf.read(n)
    if len(b) != n:
        raise AvroError("truncated data")
    return b


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------
def _norm_schema(s):
    """Accept the JSON forms: a type string, a dict, or a union list."""
    if isinstance(s, str):
        return {"type": s}
    if isinstance(s, list):
        return {"type": "union", "branches": s}
    return s


def write_value(out: io.BytesIO, schema, v) -> None:
    s = _norm_schema(schema)
    t = s["type"] if not isinstance(s.get("type"), (dict, list)) else s["type"]
    if isinstance(t, (dict, list)):
        write_value(out, t, v)
        return
    if t == "null":
        if v is not None:
            raise AvroError("null schema, non-null value")
    elif t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(v))
    elif t == "float":
        out.write(struct.pack("<f", float(v)))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out.write(b)
    elif t == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif t == "fixed":
        b = bytes(v)
        if len(b) != s["size"]:
            raise AvroError("fixed size mismatch")
        out.write(b)
    elif t == "enum":
        _write_long(out, s["symbols"].index(v))
    elif t == "record":
        for f in s["fields"]:
            write_value(out, f["type"], v.get(f["name"]))
    elif t == "array":
        items = list(v or [])
        if items:
            _write_long(out, len(items))
            for it in items:
                write_value(out, s["items"], it)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(v or {})
        if entries:
            _write_long(out, len(entries))
            for k, val in entries.items():
                write_value(out, "string", k)
                write_value(out, s["values"], val)
        _write_long(out, 0)
    elif t == "union":
        branches = s["branches"]
        idx = _union_branch(branches, v)
        _write_long(out, idx)
        write_value(out, branches[idx], v)
    else:
        raise AvroError(f"unsupported schema type {t!r}")


def _union_branch(branches, v) -> int:
    for i, b in enumerate(branches):
        bt = _norm_schema(b)["type"]
        if v is None and bt == "null":
            return i
        if v is not None and bt != "null":
            return i
    raise AvroError("no union branch matches value")


def read_value(buf: io.BytesIO, schema):
    s = _norm_schema(schema)
    t = s["type"]
    if isinstance(t, (dict, list)):
        return read_value(buf, t)
    if t == "null":
        return None
    if t == "boolean":
        return _read_n(buf, 1) != b"\x00"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", _read_n(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _read_n(buf, 8))[0]
    if t == "bytes":
        return _read_n(buf, _read_long(buf))
    if t == "string":
        return _read_n(buf, _read_long(buf)).decode("utf-8")
    if t == "fixed":
        return _read_n(buf, s["size"])
    if t == "enum":
        return s["symbols"][_read_long(buf)]
    if t == "record":
        return {
            f["name"]: read_value(buf, f["type"]) for f in s["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size (spec): skip the size
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(read_value(buf, s["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = read_value(buf, "string")
                out[k] = read_value(buf, s["values"])
    if t == "union":
        idx = _read_long(buf)
        branches = s["branches"]
        if not 0 <= idx < len(branches):
            raise AvroError("union index out of range")
        return read_value(buf, branches[idx])
    raise AvroError(f"unsupported schema type {t!r}")


# ---------------------------------------------------------------------------
# container files
# ---------------------------------------------------------------------------
def write_container(
    schema: dict,
    records: list,
    codec: str = "null",
    sync: bytes = b"\x00" * 16,
    block_size: int = 1000,
) -> bytes:
    """Spec-conformant Avro object container file."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    hdr = io.BytesIO()
    write_value(
        hdr, {"type": "map", "values": "bytes"}, meta
    )
    out.write(hdr.getvalue())
    out.write(sync)
    for i in range(0, max(len(records), 1), block_size):
        chunk = records[i : i + block_size]
        if not chunk and records:
            break
        if not chunk and not records:
            break
        body = io.BytesIO()
        for r in chunk:
            write_value(body, schema, r)
        data = body.getvalue()
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate per spec
        _write_long(out, len(chunk))
        _write_long(out, len(data))
        out.write(data)
        out.write(sync)
    return out.getvalue()


def read_container(data: bytes) -> tuple[dict, list]:
    """(writer schema, records) from container bytes."""
    buf = io.BytesIO(data)
    if _read_n(buf, 4) != _MAGIC:
        raise AvroError("not an Avro container (bad magic)")
    meta = read_value(buf, {"type": "map", "values": "bytes"})
    try:
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
    except (KeyError, ValueError) as e:
        raise AvroError(f"bad avro.schema metadata: {e}") from e
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    sync = _read_n(buf, 16)
    records = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, os.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        block = _read_n(buf, size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bb = io.BytesIO(block)
        for _ in range(n):
            records.append(read_value(bb, schema))
        if bb.read(1):
            raise AvroError("trailing bytes in block")
        if _read_n(buf, 16) != sync:
            raise AvroError("sync marker mismatch")
    return schema, records


def read_container_file(path: str, io=None) -> tuple[dict, list]:
    """``io``: the FileIO serving the read (executor-side callers
    pass the driver-resolved instance); default POSIX/scheme lookup.
    One whole-object GET either way — Avro containers decode from
    bytes."""
    if io is None:
        from .fileio import io_for

        io = io_for(path)
    return read_container(io.read_bytes(path))
