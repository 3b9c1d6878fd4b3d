"""Declarative constraint checking (operators/quality.py)."""

from __future__ import annotations

import pytest

from django_datastream_spark.operators.quality import check_constraints


def test_rules_one_pass_and_null_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "id long, v double"
    )
    out = {
        r["rule"]: (r["violations"], r["checked"])
        for r in check_constraints(
            df, {"v_positive": "v > 0", "id_small": "id < 100"}
        ).collect()
    }
    # NULL v -> predicate is NULL -> counted as a violation
    assert out == {"v_positive": (2, 3), "id_small": (0, 3)}


def test_referential_rule_counts_missing_fks(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = {
        r["rule"]: (r["violations"], r["checked"])
        for r in check_constraints(
            fact, {}, references={"fk_exists": (dim, "fk", "pk")}
        ).collect()
    }
    assert out == {"fk_exists": (2, 4)}  # both 9-rows are violations


def test_no_rules_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="no rules"):
        check_constraints(df, {})


def test_empty_batch_has_zero_violations_not_null(spark):
    df = spark.createDataFrame([], "id long, v double")
    out = {
        r["rule"]: (r["violations"], r["checked"])
        for r in check_constraints(df, {"v_positive": "v > 0"}).collect()
    }
    assert out == {"v_positive": (0, 0)}  # zero, never NULL


def test_hostile_rule_names_do_not_collide(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    out = {
        r["rule"]: r["violations"]
        for r in check_constraints(
            df, {"_checked": "v > 0", "a.b": "v < 0", "__r0": "id = 1"}
        ).collect()
    }
    assert out == {"_checked": 0, "a.b": 1, "__r0": 0}
