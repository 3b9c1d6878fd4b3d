"""WARC ingest source — the Common Crawl shard format a real LLM
training-data pipeline reads at 100 TB scale.

Pure-stdlib parsing (the WARC/1.0 framing is CRLF headers +
Content-Length body + CRLF CRLF, ISO 28500), including the two layouts
crawls actually ship:

- **plain** concatenated records, and
- **per-record gzip members** (Common Crawl's ``.warc.gz``: each record
  is its own gzip member, concatenated — decompressed by looping a
  ``zlib.decompressobj(wbits=31)`` over ``unused_data``, which is also
  what makes the format range-seekable at scale).

For ``WARC-Type: response`` records with an ``application/http``
content type, the embedded HTTP response is split too (status code,
headers' Content-Type, payload body) — the part a text pipeline wants.

Scale design: shards are opaque ``binary`` cells; parsing runs as an
Arrow-batched ``mapInPandas`` flat-map (one shard row -> N record
rows), so the corpus-sized work is embarrassingly parallel over
whatever splits the shard table already has — no shuffle, no driver
involvement. Corrupt shards quarantine as error rows (PERMISSIVE
policy, same as sources/files.py); a torn shard never kills the job.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame

#: output row contract of :func:`read_warc_records`
WARC_RECORD_SCHEMA = (
    "shard_id long, rec_seq int, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_type string, "
    "http_status int, http_content_type string, body binary, "
    "body_len long, parse_err string"
)


# ---------------------------------------------------------------------------
# pure parsing
# ---------------------------------------------------------------------------
def split_gzip_members(payload: bytes) -> list[bytes]:
    """Decompress a stream of concatenated gzip members into one blob
    per member (the .warc.gz layout)."""
    out = []
    rest = payload
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            blob = d.decompress(rest)
        except zlib.error as e:
            raise ValueError(f"bad gzip member: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member")
        out.append(blob + d.flush())
        rest = d.unused_data
    return out


def _parse_one(block: bytes, offset: int) -> tuple[dict, int]:
    """Parse a single WARC record starting at ``offset``; returns
    (record dict, next offset)."""
    hdr_end = block.find(b"\r\n\r\n", offset)
    if hdr_end < 0:
        raise ValueError("record header not terminated")
    head = block[offset:hdr_end].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    if not lines or not lines[0].startswith("WARC/"):
        raise ValueError(f"missing WARC version line at {offset}")
    fields: dict[str, str] = {}
    for ln in lines[1:]:
        if not ln:
            continue
        k, sep, v = ln.partition(":")
        if not sep:
            raise ValueError(f"malformed header line {ln!r}")
        fields[k.strip().lower()] = v.strip()
    try:
        clen = int(fields["content-length"])
    except (KeyError, ValueError) as e:
        raise ValueError("missing/invalid Content-Length") from e
    body_start = hdr_end + 4
    body = block[body_start : body_start + clen]
    if len(body) < clen:
        raise ValueError("truncated record body")
    tail = block[body_start + clen : body_start + clen + 4]
    if tail[:4] != b"\r\n\r\n":
        raise ValueError("record not terminated by CRLF CRLF")
    rec = {
        "warc_type": fields.get("warc-type"),
        "target_uri": fields.get("warc-target-uri"),
        "warc_date": fields.get("warc-date"),
        "record_id": fields.get("warc-record-id"),
        "content_type": fields.get("content-type"),
        "http_status": None,
        "http_content_type": None,
        "body": body,
    }
    ctype = (rec["content_type"] or "").lower()
    if rec["warc_type"] == "response" and ctype.startswith(
        "application/http"
    ):
        rec.update(_split_http(body))
    return rec, body_start + clen + 4


def _split_http(body: bytes) -> dict:
    """Split an embedded HTTP/1.x response into status, Content-Type,
    and payload."""
    he = body.find(b"\r\n\r\n")
    if he < 0:
        raise ValueError("HTTP block not terminated")
    head = body[:he].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {lines[0]!r}")
    try:
        status = int(parts[1])
    except ValueError as e:
        raise ValueError(f"bad HTTP status {parts[1]!r}") from e
    hct = None
    for ln in lines[1:]:
        k, sep, v = ln.partition(":")
        if sep and k.strip().lower() == "content-type":
            hct = v.strip()
            break
    return {
        "http_status": status,
        "http_content_type": hct,
        "body": body[he + 4 :],
    }


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC shard (plain or per-record-gzip) -> record dicts.
    Total: every malformed input raises ValueError."""
    if payload[:2] == b"\x1f\x8b":
        blocks = split_gzip_members(payload)
    else:
        blocks = [payload]
    out = []
    for block in blocks:
        offset = 0
        while offset < len(block):
            rec, offset = _parse_one(block, offset)
            out.append(rec)
    if not out:
        raise ValueError("no WARC records")
    return out


# ---------------------------------------------------------------------------
# building (tests / synthesis / re-sharding sink)
# ---------------------------------------------------------------------------
def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize record dicts (keys as in :func:`parse_warc`, plus
    optional http_* to wrap the body in an HTTP response) back into a
    WARC shard — the write half a re-sharding pipeline needs, and the
    ground-truth generator for the tests/oracle."""
    shard = bytearray()
    for r in records:
        body = r["body"]
        if r.get("http_status") is not None:
            http_head = (
                f"HTTP/1.1 {r['http_status']} OK\r\n"
                f"Content-Type: {r.get('http_content_type') or 'text/plain'}\r\n"
                f"\r\n"
            ).encode()
            body = http_head + body
        head = ["WARC/1.0"]
        head.append(f"WARC-Type: {r.get('warc_type', 'response')}")
        if r.get("target_uri"):
            head.append(f"WARC-Target-URI: {r['target_uri']}")
        head.append(
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}"
        )
        head.append(
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}"
        )
        ct = r.get("content_type") or (
            "application/http; msgtype=response"
            if r.get("http_status") is not None
            else "application/octet-stream"
        )
        head.append(f"Content-Type: {ct}")
        head.append(f"Content-Length: {len(body)}")
        rec = (
            "\r\n".join(head).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"
        )
        if gzip_members:
            co = zlib.compressobj(wbits=31)
            rec = co.compress(rec) + co.flush()
        shard += rec
    return bytes(shard)


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------
def read_warc_records(shards: DataFrame) -> DataFrame:
    """Shard table (``shard_id long, content binary``) -> one row per
    WARC record (:data:`WARC_RECORD_SCHEMA`). Arrow-batched flat-map;
    corrupt shards yield ONE quarantine row carrying ``parse_err``
    instead of failing the task."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["content"]):
                try:
                    recs = parse_warc(bytes(payload or b""))
                except ValueError as e:
                    rows.append(
                        {
                            "shard_id": sid, "rec_seq": -1,
                            "warc_type": None, "target_uri": None,
                            "warc_date": None, "record_id": None,
                            "content_type": None, "http_status": None,
                            "http_content_type": None, "body": None,
                            "body_len": None,
                            "parse_err": str(e)[:200],
                        }
                    )
                    continue
                for i, r in enumerate(recs):
                    rows.append(
                        {
                            "shard_id": sid, "rec_seq": i,
                            "warc_type": r["warc_type"],
                            "target_uri": r["target_uri"],
                            "warc_date": r["warc_date"],
                            "record_id": r["record_id"],
                            "content_type": r["content_type"],
                            "http_status": r["http_status"],
                            "http_content_type": r["http_content_type"],
                            "body": r["body"],
                            "body_len": len(r["body"]),
                            "parse_err": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return shards.mapInPandas(run, WARC_RECORD_SCHEMA)


def read_warc_dir(spark, path: str) -> DataFrame:
    """Directory (or glob) of .warc / .warc.gz shard FILES -> record
    rows, via Spark's built-in ``binaryFile`` source: file listing and
    reads happen on the cluster, one shard per task, filename kept as
    the shard key (xxhash64 of the path — stable across runs, no
    driver-side listing). This is the deployment entry point; the
    DataFrame overload :func:`read_warc_records` stays the composable
    core."""
    from pyspark.sql import functions as F

    shards = (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.xxhash64("path").alias("shard_id"),
            F.col("content"),
            F.col("path").alias("shard_path"),
        )
    )
    recs = read_warc_records(shards.select("shard_id", "content"))
    return recs.join(
        F.broadcast(shards.select("shard_id", "shard_path")), "shard_id"
    )
