"""Tar / WebDataset shard source — the multimodal twin of the WARC
text-crawl source.

WebDataset is the de-facto layout for image/audio training corpora at
100 TB: a plain POSIX tar whose members are grouped into SAMPLES by
their path stem — ``000123.jpg`` + ``000123.txt`` + ``000123.json``
form one sample keyed ``000123``. Reading it needs no index: tars
stream, so a shard maps to one task and the corpus parallelizes over
shards (exactly the WARC scale shape).

Parsing uses the stdlib ``tarfile`` module over an in-memory shard
(the format is POSIX ustar; re-implementing 512-byte header math by
hand would add bugs, not fidelity). Grouping into samples follows the
WebDataset rule: key = member path up to the FIRST dot of the
basename, extension = the rest; members with the same key are one
sample, in-order. Optional gzip (.tar.gz shards) is handled with
stdlib zlib.

Spark stage: ``read_webdataset`` is an Arrow-batched flat-map emitting
one row per member (sample key, ext, bytes, size) — downstream either
consumes members directly or reassembles samples with a groupBy(key)
whose width is bounded by members-per-sample, not corpus size.
Corrupt shards quarantine as error rows.
"""

from __future__ import annotations

import io
import tarfile
import zlib
from typing import Iterator

from pyspark.sql import DataFrame

WDS_MEMBER_SCHEMA = (
    "shard_id long, sample_key string, ext string, member_bytes binary, "
    "member_len long, parse_err string"
)


def split_sample_key(name: str) -> tuple[str, str]:
    """WebDataset key rule: directory + basename-up-to-first-dot is the
    sample key; everything after the first dot is the extension."""
    d, _, base = name.rpartition("/")
    stem, _, ext = base.partition(".")
    key = f"{d}/{stem}" if d else stem
    return key, ext


def parse_webdataset(payload: bytes) -> list[dict]:
    """Tar shard (plain, .gz, .bz2, or .xz — all stdlib) -> ordered
    member dicts. Total: malformed inputs raise ValueError."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = zlib.decompress(payload, wbits=31)
        except zlib.error as e:
            raise ValueError(f"bad gzip shard: {e}") from e
    elif payload[:3] == b"BZh":
        import bz2

        try:
            payload = bz2.decompress(payload)
        except OSError as e:
            raise ValueError(f"bad bz2 shard: {e}") from e
    elif payload[:6] == b"\xfd7zXZ\x00":
        import lzma

        try:
            payload = lzma.decompress(payload)
        except lzma.LZMAError as e:
            raise ValueError(f"bad xz shard: {e}") from e
    try:
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:")
    except tarfile.TarError as e:
        raise ValueError(f"not a tar shard: {e}") from e
    out = []
    try:
        for m in tf:
            if not m.isfile():
                continue
            f = tf.extractfile(m)
            data = f.read() if f is not None else b""
            key, ext = split_sample_key(m.name)
            out.append(
                {"sample_key": key, "ext": ext, "member_bytes": data}
            )
    except tarfile.TarError as e:
        raise ValueError(f"corrupt tar member: {e}") from e
    finally:
        tf.close()
    if not out:
        raise ValueError("no members in shard")
    return out


def build_webdataset(
    members: list[tuple[str, bytes]], gzipped: bool = False
) -> bytes:
    """Serialize (name, bytes) members into a tar shard — the write
    half for re-sharding pipelines and the tests' ground truth."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0  # deterministic shards
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if gzipped:
        co = zlib.compressobj(wbits=31)
        return co.compress(raw) + co.flush()
    return raw


def read_webdataset(shards: DataFrame) -> DataFrame:
    """Shard table (``shard_id long, content binary``) -> one row per
    member (:data:`WDS_MEMBER_SCHEMA`), Arrow-batched flat-map with
    per-shard quarantine."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["content"]):
                try:
                    members = parse_webdataset(bytes(payload or b""))
                except ValueError as e:
                    rows.append(
                        {
                            "shard_id": sid, "sample_key": None,
                            "ext": None, "member_bytes": None,
                            "member_len": None,
                            "parse_err": str(e)[:200],
                        }
                    )
                    continue
                for m in members:
                    rows.append(
                        {
                            "shard_id": sid,
                            "sample_key": m["sample_key"],
                            "ext": m["ext"],
                            "member_bytes": m["member_bytes"],
                            "member_len": len(m["member_bytes"]),
                            "parse_err": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return shards.mapInPandas(run, WDS_MEMBER_SCHEMA)


def read_webdataset_dir(spark, path: str) -> DataFrame:
    """Directory (or glob) of .tar / .tar.{gz,bz2,xz} shard FILES ->
    member rows via the built-in ``binaryFile`` source (cluster-side
    listing + reads, one shard per task); shard key = xxhash64(path)."""
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
    members = read_webdataset(shards.select("shard_id", "content"))
    return members.join(
        F.broadcast(shards.select("shard_id", "shard_path")), "shard_id"
    )


def parse_zip_shard(payload: bytes) -> list[dict]:
    """ZIP shard -> ordered member dicts (same contract as
    :func:`parse_webdataset` — document dumps ship as zips as often
    as tars; stdlib ``zipfile`` handles stored and deflate members).
    Total: malformed inputs raise ValueError."""
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except (zipfile.BadZipFile, OSError) as e:
        raise ValueError(f"not a zip shard: {e}") from e
    out = []
    try:
        for info in zf.infolist():
            if info.is_dir():
                continue
            try:
                data = zf.read(info.filename)
            except (zipfile.BadZipFile, OSError, RuntimeError) as e:
                raise ValueError(
                    f"corrupt zip member {info.filename!r}: {e}"
                ) from e
            key, ext = split_sample_key(info.filename)
            out.append(
                {"sample_key": key, "ext": ext, "member_bytes": data}
            )
    finally:
        zf.close()
    if not out:
        raise ValueError("no members in shard")
    return out


def build_zip_shard(
    members: list[tuple[str, bytes]], compress: bool = True
) -> bytes:
    """Serialize (name, bytes) members into a ZIP shard (deflate or
    stored), deterministic timestamps."""
    import zipfile

    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, data)
    return buf.getvalue()


def read_zip_shards(shards: DataFrame) -> DataFrame:
    """Shard table (``shard_id long, content binary``) -> one row per
    ZIP member (:data:`WDS_MEMBER_SCHEMA`), Arrow-batched flat-map
    with per-shard quarantine — the zip twin of
    :func:`read_webdataset`."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["content"]):
                try:
                    members = parse_zip_shard(bytes(payload or b""))
                except ValueError as e:
                    rows.append(
                        {
                            "shard_id": sid, "sample_key": None,
                            "ext": None, "member_bytes": None,
                            "member_len": None,
                            "parse_err": str(e)[:200],
                        }
                    )
                    continue
                for m in members:
                    rows.append(
                        {
                            "shard_id": sid,
                            "sample_key": m["sample_key"],
                            "ext": m["ext"],
                            "member_bytes": m["member_bytes"],
                            "member_len": len(m["member_bytes"]),
                            "parse_err": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return shards.mapInPandas(run, WDS_MEMBER_SCHEMA)
