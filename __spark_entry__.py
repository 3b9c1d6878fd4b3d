"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (Q08 hourly downsamplers, the soul of
  the reference's downsample path) on sf0.001.
- ``queries()`` — every implemented operator from SURVEY.md §2 / §2b as a
  ``(spark, sf_dir) -> DataFrame`` callable.
- ``oracle_sql()`` — matching DuckDB SQL per query (column names aligned;
  driver hashes values with columns sorted by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from django_datastream_spark.plans import declared  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return declared.QUERIES["q08_downsamplers"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(declared.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(declared.ORACLES)
