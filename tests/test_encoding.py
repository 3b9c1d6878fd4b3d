"""Mojibake repair: inverse round trips, fixed points, idempotence."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from django_datastream_spark.functions.encoding import (
    fix_mojibake,
    repair_text_encoding,
)


def _corrupt(s: str) -> str:
    b = s.encode("utf-8")
    try:
        return b.decode("cp1252")
    except UnicodeDecodeError:
        return b.decode("latin-1")  # bytes cp1252 leaves undefined


@pytest.mark.parametrize(
    "clean",
    [
        "café au lait",
        "déjà vu — em dash and € sign",  # cp1252 0x80-0x9F range
        "naïve œuvre ©2024",
        "中文 and русский mixed",
    ],
)
def test_single_and_double_mojibake_repair(clean):
    once = _corrupt(clean)
    assert fix_mojibake(once) == clean
    # doubly-encoded: corrupt the corruption
    try:
        twice = _corrupt(once)
    except UnicodeDecodeError:
        twice = None
    if twice is not None:
        assert fix_mojibake(twice) == clean


def test_clean_text_is_a_fixed_point():
    for s in ("plain ascii", "café already fine?", "", "中文"):
        # NOTE: pure-ASCII strings round-trip to themselves and stop;
        # genuine non-ASCII cleans stop because re-encoding them yields
        # invalid-UTF-8 byte sequences (é alone is C3A9 -> 'é' only if
        # it WAS mojibake). 'café already fine?' contains é whose
        # cp1252 bytes E9 are NOT valid UTF-8 -> unchanged.
        assert fix_mojibake(s) == s


@settings(max_examples=60, deadline=None)
@given(s=hst.text(max_size=80))
def test_repair_is_idempotent(s):
    f = fix_mojibake(s)
    assert fix_mojibake(f) == f


def test_repair_spark_stage(spark):
    clean = "résumé — €99"
    rows = [(0, _corrupt(clean)), (1, "untouched ascii"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repair_text_encoding(df).collect()}
    assert got[0]["text_fixed"] == clean and got[0]["was_fixed"]
    assert got[1]["text_fixed"] == "untouched ascii"
    assert got[1]["was_fixed"] is False
    assert got[2]["text_fixed"] is None and got[2]["was_fixed"] is None
