"""WARC source: framing round trips (plain + per-record gzip), HTTP
splitting, quarantine, and totality."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from django_datastream_spark.sources import warc


def _recs(n=3, http=True):
    out = []
    for i in range(n):
        out.append(
            {
                "warc_type": "response" if http else "resource",
                "target_uri": f"http://example.org/doc/{i}",
                "warc_date": "2024-03-01T12:00:00Z",
                "record_id": f"<urn:uuid:{i:032x}>",
                "http_status": 200 if http else None,
                "http_content_type": "text/plain; charset=utf-8"
                if http
                else None,
                "content_type": None
                if http
                else "application/octet-stream",
                "body": (f"payload {i} " * (i + 1)).encode()
                + bytes([i, 0, 255]),
            }
        )
    return out


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    recs = _recs(4)
    shard = warc.build_warc(recs, gzip_members=gz)
    if gz:
        assert shard[:2] == b"\x1f\x8b"
        # every record is its own gzip member
        assert len(warc.split_gzip_members(shard)) == 4
    got = warc.parse_warc(shard)
    assert len(got) == 4
    for r, g in zip(recs, got):
        assert g["target_uri"] == r["target_uri"]
        assert g["warc_type"] == r["warc_type"]
        assert g["body"] == r["body"]
        assert g["http_status"] == r["http_status"]
        if r["http_status"]:
            assert g["http_content_type"].startswith("text/plain")


def test_warc_non_http_records_pass_body_through():
    recs = _recs(2, http=False)
    got = warc.parse_warc(warc.build_warc(recs))
    assert got[0]["http_status"] is None
    assert got[0]["body"] == recs[0]["body"]


def test_warc_malformed_raises():
    good = warc.build_warc(_recs(2))
    with pytest.raises(ValueError, match="version line"):
        warc.parse_warc(b"NOTWARC/1.0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="truncated record body"):
        warc.parse_warc(good[:-10])
    with pytest.raises(ValueError, match="Content-Length"):
        warc.parse_warc(
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
        )
    # torn gzip member
    gz = warc.build_warc(_recs(1), gzip_members=True)
    with pytest.raises(ValueError, match="gzip"):
        warc.parse_warc(gz[: len(gz) - 6])


@settings(max_examples=40, deadline=None)
@given(data=hst.binary(max_size=300))
def test_warc_parse_total_on_garbage(data):
    for payload in (data, b"WARC/1.0\r\n" + data, b"\x1f\x8b" + data):
        try:
            warc.parse_warc(payload)
        except ValueError:
            pass


def test_warc_spark_flatmap_and_quarantine(spark):
    shards = [
        (0, warc.build_warc(_recs(3))),
        (1, warc.build_warc(_recs(2), gzip_members=True)),
        (2, b"garbage shard"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in shards],
        "shard_id long, content binary",
    )
    rows = warc.read_warc_records(df).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert len(by_shard[0]) == 3 and len(by_shard[1]) == 2
    assert all(r["parse_err"] is None for r in by_shard[0] + by_shard[1])
    assert sorted(r["rec_seq"] for r in by_shard[0]) == [0, 1, 2]
    ref = _recs(3)
    got0 = {r["rec_seq"]: r for r in by_shard[0]}
    for i in range(3):
        assert bytes(got0[i]["body"]) == ref[i]["body"]
        assert got0[i]["body_len"] == len(ref[i]["body"])
        assert got0[i]["http_status"] == 200
    (bad,) = by_shard[2]
    assert bad["parse_err"] is not None and bad["rec_seq"] == -1


@settings(max_examples=25, deadline=None)
@given(
    bodies=hst.lists(hst.binary(max_size=200), min_size=1, max_size=6),
    gz=hst.booleans(),
)
def test_warc_roundtrip_adversarial_bodies(bodies, gz):
    """Content-Length framing must survive bodies that CONTAIN the
    framing: CRLF pairs, fake 'WARC/1.0' version lines, gzip magic."""
    recs = [
        {
            "warc_type": "resource",
            "target_uri": f"http://x/{i}",
            "content_type": "application/octet-stream",
            "body": b"\r\n\r\nWARC/1.0\r\n\x1f\x8b" + b,
        }
        for i, b in enumerate(bodies)
    ]
    got = warc.parse_warc(warc.build_warc(recs, gzip_members=gz))
    assert len(got) == len(recs)
    for r, g in zip(recs, got):
        assert g["body"] == r["body"]


def test_read_warc_dir_binary_file_source(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    (d / "a.warc").write_bytes(warc.build_warc(_recs(2)))
    (d / "b.warc.gz").write_bytes(
        warc.build_warc(_recs(3), gzip_members=True)
    )
    rows = warc.read_warc_dir(spark, str(d)).collect()
    assert len(rows) == 5
    by_file = {}
    for r in rows:
        by_file.setdefault(r["shard_path"].rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["a.warc"]) == 2
    assert len(by_file["b.warc.gz"]) == 3
    assert all(r["parse_err"] is None for r in rows)
