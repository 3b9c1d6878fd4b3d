"""EXIF: build/parse round trips (both byte orders), GPS DMS math,
strip surgery leaves pixels bit-identical, totality."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from django_datastream_spark.operators import exif as ex
from django_datastream_spark.operators import jpeg_codec as jc


def _jpeg():
    rng = np.random.default_rng(3)
    return jc.encode_jpeg(rng.integers(0, 256, (8, 16), np.uint8))


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_exif_roundtrip_both_byte_orders(bo):
    app1 = ex.build_exif_app1(
        make="TestCam",
        model="X100 Ultra",
        orientation=6,
        datetime="2024:03:01 12:34:56",
        gps=(37.7749, -122.4194),
        byte_order=bo,
    )
    tagged = ex.insert_app1(_jpeg(), app1)
    r = ex.parse_exif(tagged)
    assert r["make"] == "TestCam" and r["model"] == "X100 Ultra"
    assert r["orientation"] == 6
    assert r["datetime"] == "2024:03:01 12:34:56"
    # DMS storage keeps 2 decimal places of seconds
    assert r["gps_lat"] == pytest.approx(37.7749, abs=2e-5)
    assert r["gps_lon"] == pytest.approx(-122.4194, abs=2e-5)


def test_exif_absent_and_partial():
    plain = _jpeg()
    r = ex.parse_exif(plain)
    assert all(v is None for v in r.values())
    only_orient = ex.insert_app1(
        plain, ex.build_exif_app1(orientation=3)
    )
    r2 = ex.parse_exif(only_orient)
    assert r2["orientation"] == 3 and r2["gps_lat"] is None


def test_strip_exif_is_segment_surgery():
    base = _jpeg()
    tagged = ex.insert_app1(
        base, ex.build_exif_app1(make="M", gps=(1.5, 2.5))
    )
    stripped = ex.strip_exif(tagged)
    assert stripped == base  # bit-identical to the untagged original
    assert ex.parse_exif(stripped)["gps_lat"] is None
    # pixels decode identically
    assert (jc.parse_jpeg(stripped) == jc.parse_jpeg(tagged)).all()
    # idempotent, and a no-op on untagged files
    assert ex.strip_exif(stripped) == stripped


@settings(max_examples=40, deadline=None)
@given(data=hst.binary(max_size=200))
def test_exif_total_on_garbage(data):
    for payload in (data, b"\xff\xd8" + data):
        try:
            ex.parse_exif(payload)
        except ValueError:
            pass
        try:
            ex.strip_exif(payload)
        except ValueError:
            pass


def test_exif_spark_stages(spark):
    base = _jpeg()
    rows = [
        (0, bytearray(ex.insert_app1(
            base, ex.build_exif_app1(
                make="A", orientation=1, gps=(10.25, -20.5)
            )
        ))),
        (1, bytearray(base)),
        (2, bytearray(b"not a jpeg")),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in ex.extract_exif(media).collect()}
    assert got[0]["make"] == "A"
    assert got[0]["gps_lat"] == pytest.approx(10.25, abs=2e-5)
    assert got[1]["make"] is None and got[1]["exif_err"] is None
    assert got[2]["exif_err"] is not None

    scrubbed = {
        r["media_id"]: r for r in ex.strip_exif_column(media).collect()
    }
    assert bytes(scrubbed[0]["content"]) == base
    assert scrubbed[0]["strip_err"] is None
    assert bytes(scrubbed[2]["content"]) == b"not a jpeg"
    assert scrubbed[2]["strip_err"] is not None  # fails closed, kept
