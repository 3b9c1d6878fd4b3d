"""Tar/WebDataset source: round trips, key grouping rule, quarantine,
totality."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from django_datastream_spark.sources import tar as wds


def _members(n=3):
    out = []
    for i in range(n):
        out.append((f"{i:06d}.txt", f"caption number {i}".encode()))
        out.append((f"{i:06d}.json", b'{"idx": %d}' % i))
        out.append((f"{i:06d}.img.ppm", bytes([i, 255, 0]) * (i + 1)))
    return out


@pytest.mark.parametrize("gz", [False, True])
def test_webdataset_roundtrip(gz):
    members = _members(3)
    shard = wds.build_webdataset(members, gzipped=gz)
    got = wds.parse_webdataset(shard)
    assert len(got) == 9
    for (name, data), g in zip(members, got):
        key, ext = wds.split_sample_key(name)
        assert (g["sample_key"], g["ext"]) == (key, ext)
        assert g["member_bytes"] == data
    # WebDataset key rule: first dot splits, so .img.ppm keeps a
    # compound extension under the same sample key
    assert got[2]["sample_key"] == "000000" and got[2]["ext"] == "img.ppm"


def test_webdataset_bz2_and_xz_shards():
    import bz2
    import lzma

    members = _members(2)
    plain = wds.build_webdataset(members)
    for comp in (bz2.compress, lzma.compress):
        got = wds.parse_webdataset(comp(plain))
        assert len(got) == 6
        assert got[0]["member_bytes"] == members[0][1]
    with pytest.raises(ValueError, match="bz2"):
        wds.parse_webdataset(b"BZh" + b"\x01" * 20)
    with pytest.raises(ValueError, match="xz"):
        wds.parse_webdataset(b"\xfd7zXZ\x00" + b"\x02" * 20)


def test_split_sample_key_with_directories():
    assert wds.split_sample_key("a/b/000.x.y") == ("a/b/000", "x.y")
    assert wds.split_sample_key("plain") == ("plain", "")


def test_webdataset_malformed_raises():
    with pytest.raises(ValueError, match="tar"):
        wds.parse_webdataset(b"definitely not a tar shard" * 40)
    with pytest.raises(ValueError, match="gzip"):
        wds.parse_webdataset(b"\x1f\x8b" + b"\x00" * 30)
    with pytest.raises(ValueError, match="no members"):
        wds.parse_webdataset(b"\x00" * 1024)  # just end-of-archive


@settings(max_examples=30, deadline=None)
@given(data=hst.binary(max_size=1200))
def test_webdataset_total_on_garbage(data):
    try:
        wds.parse_webdataset(data)
    except ValueError:
        pass


def test_webdataset_spark_flatmap_and_quarantine(spark):
    shards = [
        (0, wds.build_webdataset(_members(2))),
        (1, wds.build_webdataset(_members(1), gzipped=True)),
        (2, b"junk" * 200),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in shards],
        "shard_id long, content binary",
    )
    rows = wds.read_webdataset(df).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert len(by_shard[0]) == 6 and len(by_shard[1]) == 3
    assert by_shard[2][0]["parse_err"] is not None
    got = {
        (r["sample_key"], r["ext"]): bytes(r["member_bytes"])
        for r in by_shard[0]
    }
    for name, data in _members(2):
        assert got[wds.split_sample_key(name)] == data


@settings(max_examples=25, deadline=None)
@given(
    payloads=hst.lists(hst.binary(max_size=300), min_size=1, max_size=5),
    gz=hst.booleans(),
)
def test_webdataset_roundtrip_adversarial_payloads(payloads, gz):
    """Member bytes containing tar magic, NULs, or 512-byte-aligned
    padding patterns must round-trip exactly (size-framed, like WARC)."""
    members = [
        (f"{i:05d}.bin", b"ustar\x00" + b"\x00" * 100 + p)
        for i, p in enumerate(payloads)
    ]
    got = wds.parse_webdataset(wds.build_webdataset(members, gzipped=gz))
    assert len(got) == len(members)
    for (name, data), g in zip(members, got):
        assert g["member_bytes"] == data


def test_read_webdataset_dir_binary_file_source(spark, tmp_path):
    d = tmp_path / "wds"
    d.mkdir()
    (d / "s0.tar").write_bytes(wds.build_webdataset(_members(2)))
    (d / "s1.tar.gz").write_bytes(
        wds.build_webdataset(_members(1), gzipped=True)
    )
    rows = wds.read_webdataset_dir(spark, str(d)).collect()
    assert len(rows) == 9  # 6 + 3 members
    assert {r["shard_path"].rsplit("/", 1)[-1] for r in rows} == {
        "s0.tar", "s1.tar.gz"
    }
    assert all(r["parse_err"] is None for r in rows)


@pytest.mark.parametrize("compress", [False, True])
def test_zip_shard_roundtrip(compress):
    members = _members(3)
    shard = wds.build_zip_shard(members, compress=compress)
    got = wds.parse_zip_shard(shard)
    assert len(got) == 9
    for (name, data), g in zip(members, got):
        assert g["member_bytes"] == data
        assert (g["sample_key"], g["ext"]) == wds.split_sample_key(name)


def test_zip_shard_malformed_and_spark(spark):
    with pytest.raises(ValueError, match="zip"):
        wds.parse_zip_shard(b"PK\x03\x04 nope")
    with pytest.raises(ValueError, match="no members"):
        wds.parse_zip_shard(_empty_zip())
    df = spark.createDataFrame(
        [
            (0, bytearray(wds.build_zip_shard(_members(2)))),
            (1, bytearray(b"not a zip")),
        ],
        "shard_id long, content binary",
    )
    rows = wds.read_zip_shards(df).collect()
    ok = [r for r in rows if r["shard_id"] == 0]
    assert len(ok) == 6 and all(r["parse_err"] is None for r in ok)
    (bad,) = [r for r in rows if r["shard_id"] == 1]
    assert bad["parse_err"] is not None


def _empty_zip():
    import io as _io
    import zipfile as _zf

    buf = _io.BytesIO()
    _zf.ZipFile(buf, "w").close()
    return buf.getvalue()
