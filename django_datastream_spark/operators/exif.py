"""EXIF metadata — parse and STRIP (the privacy pass an image corpus
runs before training: camera GPS coordinates are PII).

Pure-struct implementation of the public formats: EXIF is a TIFF
container (Exif\\x00\\x00 + byte-order mark + IFD chains) inside a
JPEG APP1 segment. Implemented:

- IFD walk, both byte orders (II/MM), inline and offset values
- types BYTE/ASCII/SHORT/LONG/RATIONAL/UNDEFINED/SLONG/SRATIONAL
- IFD0 tags of pipeline interest (Make, Model, Orientation,
  DateTime), the Exif sub-IFD pointer, and the GPS sub-IFD
  (lat/lon refs + degree-minute-second rationals -> signed decimal)
- ``strip_exif``: remove every APP1/Exif segment, leaving the image
  bit-identical otherwise (segment surgery, no re-encode)
- ``build_exif_app1``: serialize a real APP1 from a tag dict — the
  test/oracle ground truth AND the write half for provenance tagging

Spark stages are Arrow-batched flat maps with per-row quarantine,
matching the other multimodal extractors.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
GPS_LAT_REF, GPS_LAT = 0x0001, 0x0002
GPS_LON_REF, GPS_LON = 0x0003, 0x0004


# ---------------------------------------------------------------------------
# building
# ---------------------------------------------------------------------------
def _ifd_bytes(entries, e, base_off):
    """entries: [(tag, type, values)] -> (ifd bytes, tail data bytes).
    ``base_off`` is the TIFF offset where this IFD starts."""
    tail = bytearray()
    tail_base = base_off + 2 + 12 * len(entries) + 4
    out = struct.pack(e + "H", len(entries))
    for tag, typ, vals in sorted(entries):
        if typ == 2:  # ASCII with NUL
            raw = vals.encode("ascii") + b"\x00"
            cnt = len(raw)
        elif typ == 5:  # RATIONAL pairs
            raw = b"".join(
                struct.pack(e + "II", n, d) for n, d in vals
            )
            cnt = len(vals)
        elif typ == 3:
            raw = b"".join(struct.pack(e + "H", v) for v in vals)
            cnt = len(vals)
        elif typ == 4:
            raw = b"".join(struct.pack(e + "I", v) for v in vals)
            cnt = len(vals)
        else:
            raise ValueError(f"builder: unsupported type {typ}")
        if len(raw) <= 4:
            val = raw + b"\x00" * (4 - len(raw))
        else:
            val = struct.pack(e + "I", tail_base + len(tail))
            tail += raw
        out += struct.pack(e + "HHI", tag, typ, cnt) + val
    out += struct.pack(e + "I", 0)  # next-IFD pointer
    return out, bytes(tail)


def build_exif_app1(
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Serialize a genuine APP1/Exif segment (marker + length +
    payload). ``gps``: (lat, lon) signed decimal degrees, stored the
    real way — hemisphere refs + D/M/S rationals (seconds scaled by
    100 for two decimals)."""
    e = "<" if byte_order == "II" else ">"
    ifd0 = []
    if make is not None:
        ifd0.append((TAG_MAKE, 2, make))
    if model is not None:
        ifd0.append((TAG_MODEL, 2, model))
    if orientation is not None:
        ifd0.append((TAG_ORIENTATION, 3, [orientation]))
    if datetime is not None:
        ifd0.append((TAG_DATETIME, 2, datetime))

    gps_block = b""
    if gps is not None:
        # IFD0 first, then the GPS IFD right after it; compute IFD0
        # size with the pointer entry included
        ifd0_probe = ifd0 + [(TAG_GPS_IFD, 4, [0])]
        probe, probe_tail = _ifd_bytes(ifd0_probe, e, 8)
        gps_off = 8 + len(probe) + len(probe_tail)
        lat, lon = gps

        def dms(v):
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 100)
            return [(d, 1), (m, 1), (s, 100)]

        gps_entries = [
            (GPS_LAT_REF, 2, "N" if lat >= 0 else "S"),
            (GPS_LAT, 5, dms(lat)),
            (GPS_LON_REF, 2, "E" if lon >= 0 else "W"),
            (GPS_LON, 5, dms(lon)),
        ]
        gps_ifd, gps_tail = _ifd_bytes(gps_entries, e, gps_off)
        gps_block = gps_ifd + gps_tail
        ifd0 = ifd0 + [(TAG_GPS_IFD, 4, [gps_off])]

    ifd0_bytes, tail = _ifd_bytes(ifd0, e, 8)
    tiff = (
        (b"II" if e == "<" else b"MM")
        + struct.pack(e + "HI", 42, 8)
        + ifd0_bytes
        + tail
        + gps_block
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (before APP0, which is
    where real cameras put it)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]


# ---------------------------------------------------------------------------
# parsing / stripping
# ---------------------------------------------------------------------------
def _iter_segments(jpeg: bytes):
    """Yield (marker, start, seg_len) for JPEG header segments up to
    SOS (entropy data is opaque to segment surgery)."""
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0xD9) or marker == 0xDA:
            return
        (ln,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        yield marker, pos, 2 + ln
        pos += 2 + ln


def _read_value(tiff: bytes, e: str, typ: int, cnt: int, val_raw: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * cnt
    if total <= 4:
        raw = val_raw[:total]
    else:
        (off,) = struct.unpack(e + "I", val_raw)
        raw = tiff[off : off + total]
        if len(raw) < total:
            raise ValueError("EXIF value offset out of bounds")
    if typ == 2:
        return raw.split(b"\x00", 1)[0].decode("ascii", errors="replace")
    if typ == 3:
        return list(struct.unpack(e + "H" * cnt, raw))
    if typ in (4, 9):
        f = "I" if typ == 4 else "i"
        return list(struct.unpack(e + f * cnt, raw))
    if typ in (5, 10):
        f = "II" if typ == 5 else "ii"
        flat = struct.unpack(e + f * cnt, raw)
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(cnt)]
    return raw


def _parse_ifd(tiff: bytes, e: str, off: int) -> dict[int, object]:
    if off + 2 > len(tiff):
        raise ValueError("IFD offset out of bounds")
    (n,) = struct.unpack(e + "H", tiff[off : off + 2])
    out = {}
    for i in range(n):
        ent = tiff[off + 2 + 12 * i : off + 2 + 12 * (i + 1)]
        if len(ent) < 12:
            raise ValueError("truncated IFD entry")
        tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
        out[tag] = _read_value(tiff, e, typ, cnt, ent[8:12])
    return out


def _dms_to_decimal(dms, ref) -> float | None:
    if not dms or len(dms) != 3:
        return None
    try:
        d = dms[0][0] / dms[0][1]
        m = dms[1][0] / dms[1][1]
        s = dms[2][0] / dms[2][1]
    except ZeroDivisionError:
        return None
    v = d + m / 60 + s / 3600
    return -v if ref in ("S", "W") else v


def parse_exif(jpeg: bytes) -> dict:
    """Extract pipeline-relevant EXIF from a JPEG -> dict with keys
    make/model/orientation/datetime/gps_lat/gps_lon (None when
    absent). Total: malformed structures raise ValueError."""
    try:
        return _parse_exif_inner(jpeg)
    except (struct.error, IndexError) as ex:
        raise ValueError(f"malformed EXIF structure: {ex}") from ex


def _parse_exif_inner(jpeg: bytes) -> dict:
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    out = {
        "make": None, "model": None, "orientation": None,
        "datetime": None, "gps_lat": None, "gps_lon": None,
    }
    for marker, start, seg_len in _iter_segments(jpeg):
        if marker != 0xE1:
            continue
        body = jpeg[start + 4 : start + seg_len]
        if not body.startswith(b"Exif\x00\x00"):
            continue
        tiff = body[6:]
        bom = tiff[:2]
        if bom == b"II":
            e = "<"
        elif bom == b"MM":
            e = ">"
        else:
            raise ValueError("bad TIFF byte order mark")
        magic, ifd0_off = struct.unpack(e + "HI", tiff[2:8])
        if magic != 42:
            raise ValueError("bad TIFF magic")
        ifd0 = _parse_ifd(tiff, e, ifd0_off)
        if TAG_MAKE in ifd0:
            out["make"] = ifd0[TAG_MAKE]
        if TAG_MODEL in ifd0:
            out["model"] = ifd0[TAG_MODEL]
        if TAG_ORIENTATION in ifd0:
            v = ifd0[TAG_ORIENTATION]
            out["orientation"] = int(v[0]) if v else None
        if TAG_DATETIME in ifd0:
            out["datetime"] = ifd0[TAG_DATETIME]
        if TAG_GPS_IFD in ifd0 and ifd0[TAG_GPS_IFD]:
            gps = _parse_ifd(tiff, e, int(ifd0[TAG_GPS_IFD][0]))
            out["gps_lat"] = _dms_to_decimal(
                gps.get(GPS_LAT), gps.get(GPS_LAT_REF)
            )
            out["gps_lon"] = _dms_to_decimal(
                gps.get(GPS_LON), gps.get(GPS_LON_REF)
            )
        break
    return out


def strip_exif(jpeg: bytes) -> bytes:
    """Remove every APP1/Exif segment; all other bytes (including the
    entropy-coded image) are untouched — segment surgery, no
    re-encode, so pixels stay bit-identical."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    drops = []
    for marker, start, seg_len in _iter_segments(jpeg):
        if marker == 0xE1 and jpeg[start + 4 : start + 10] == b"Exif\x00\x00":
            drops.append((start, start + seg_len))
    if not drops:
        return jpeg
    out = bytearray()
    pos = 0
    for a, b in drops:
        out += jpeg[pos:a]
        pos = b
    out += jpeg[pos:]
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------
EXIF_SCHEMA = (
    "media_id long, make string, model string, orientation int, "
    "taken_at string, gps_lat double, gps_lon double, exif_err string"
)


def extract_exif(media: DataFrame) -> DataFrame:
    """(media_id, content) -> EXIF rows; Arrow-batched, per-row
    quarantine."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["content"]):
                try:
                    r = parse_exif(bytes(p or b""))
                    rows.append(
                        {
                            "media_id": mid, "make": r["make"],
                            "model": r["model"],
                            "orientation": r["orientation"],
                            "taken_at": r["datetime"],
                            "gps_lat": r["gps_lat"],
                            "gps_lon": r["gps_lon"], "exif_err": None,
                        }
                    )
                except ValueError as ex:
                    rows.append(
                        {
                            "media_id": mid, "make": None, "model": None,
                            "orientation": None, "taken_at": None,
                            "gps_lat": None, "gps_lon": None,
                            "exif_err": str(ex)[:200],
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, EXIF_SCHEMA)


def strip_exif_column(media: DataFrame) -> DataFrame:
    """(media_id, content) -> same rows with EXIF removed (the privacy
    scrub before corpus export); un-parseable payloads pass through
    UNCHANGED with ``strip_err`` set — a scrubber must fail closed on
    its own bugs, never drop media silently."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            outs, errs = [], []
            for p in pdf["content"]:
                try:
                    outs.append(strip_exif(bytes(p or b"")))
                    errs.append(None)
                except ValueError as ex:
                    outs.append(bytes(p or b""))
                    errs.append(str(ex)[:200])
            out = pdf.copy()
            out["content"] = outs
            out["strip_err"] = errs
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in media.schema.fields
    )
    return media.mapInPandas(run, schema + ", strip_err string")
