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


# ---------------------------------------------------------------------------
# tolerant JSON repair
# ---------------------------------------------------------------------------
def test_repair_json_cases():
    import json

    from django_datastream_spark.functions.encoding import repair_json

    cases = [
        ("{'a': 1, 'b': [2, 3,],}", {"a": 1, "b": [2, 3]}),
        ("{key: 'val', flag: True, x: None}",
         {"key": "val", "flag": True, "x": None}),
        ('{"clean": "already", "n": 1.5}', {"clean": "already", "n": 1.5}),
        ("{'s': 'it\\'s, [not] a } bracket'}",
         {"s": "it's, [not] a } bracket"}),
        ("{'u': '\\u00e9', 'nl': 'a\\nb'}", {"u": "é", "nl": "a\nb"}),
        ("[1, 2, 3,]", [1, 2, 3]),
        # scientific notation must survive the tokenizer — the 'e' is
        # an exponent, not a bare identifier (r7 ADVICE: 1.5e3 was
        # being split into 1.5"e3" and quarantined)
        ('{"n": 1e3}', {"n": 1000.0}),
        ('{"n": 1.5e3}', {"n": 1500.0}),
        ("{'big': 2E+10, 'small': 4e-2}", {"big": 2e10, "small": 0.04}),
        ("[1e5, 1.25E-1,]", [100000.0, 0.125]),
        # but a bare identifier that merely STARTS with e still quotes
        ("{e3: 1, ex: 2}", {"e3": 1, "ex": 2}),
    ]
    for raw, want in cases:
        assert json.loads(repair_json(raw)) == want, raw
    # canonical: sorted keys, deterministic string
    assert repair_json("{'b': 1, 'a': 2}") == '{"a": 2, "b": 1}'


def test_repair_json_rejects_garbage():
    from django_datastream_spark.functions.encoding import repair_json

    for bad in ("{'a': }", "not json at all", "{]", "{'x': 'unterminated}"):
        with pytest.raises(ValueError):
            repair_json(bad)


@settings(max_examples=40, deadline=None)
@given(s=hst.text(max_size=120))
def test_repair_json_total_and_idempotent(s):
    from django_datastream_spark.functions.encoding import repair_json

    try:
        fixed = repair_json(s)
    except ValueError:
        return
    assert repair_json(fixed) == fixed  # canonical form is a fixed point


def test_repair_json_spark_stage(spark):
    from django_datastream_spark.functions.encoding import (
        repair_json_column,
    )

    rows = [
        (0, "{'id': 7, 'tags': ['a', 'b',], 'ok': True,}"),
        (1, "utter garbage {{{"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, meta string")
    got = {r["doc_id"]: r for r in repair_json_column(df).collect()}
    assert got[0]["meta_fixed"] == '{"id": 7, "ok": true, "tags": ["a", "b"]}'
    assert got[1]["meta_fixed"] is None and got[1]["json_err"]
    assert got[2]["json_err"] == "null json"
