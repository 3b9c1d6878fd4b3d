from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Slow-test gate (r12, VERDICT r11 "Next round" #1): the full suite outgrew
# the verification driver's window (~64 min for 1047 tests), so every
# driver verify truncated mid-run and reported tests_ok=false regardless of
# health. Tests marked @pytest.mark.slow (long soaks, churn loops,
# many-commit scale exercises) are SKIPPED by default and run when
# SPARK_GRAFT_FULL_TESTS=1 is set — full coverage stays one env var away
# (the builder's end-of-round full runs set it; committed PYTEST logs record
# the result). The default run keeps at least one representative of every
# operator/feature family, so the driver's `pytest tests/ -x -q` still
# exercises the whole surface, just not the soak depth.
# ---------------------------------------------------------------------------
RUN_SLOW = bool(os.environ.get("SPARK_GRAFT_FULL_TESTS"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long soak/scale test, skipped unless SPARK_GRAFT_FULL_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_SLOW:
        return
    skip = pytest.mark.skip(
        reason="slow: set SPARK_GRAFT_FULL_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from django_datastream_spark.session import get_spark

    spark = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
