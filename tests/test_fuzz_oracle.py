"""Randomized Spark-vs-DuckDB oracle fuzzing: build random-but-seeded
aggregation queries (time window x type filter x group keys x agg set)
as BOTH a DataFrame plan and the equivalent DuckDB SQL, and require
frame equality on every draw. The fixed q01-q100 registry pins known
shapes; this fuzzes the combinatorial neighborhood between them (the
reference's own test strategy per SURVEY §5: parity over generated
parameter grids, not just goldens)."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from django_datastream_spark.sources.testdata import load_table

from .conftest import SF_SMOKE

AGGS = {
    # name -> (spark expr builder, duckdb sql fragment)
    "n": (
        lambda: F.count(F.lit(1)).alias("n"),
        "CAST(COUNT(*) AS BIGINT) n",
    ),
    "v_sum": (
        lambda: (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("v_sum"),
        "ROUND(SUM(value), 4) + 0 v_sum",
    ),
    "v_avg": (
        lambda: (F.round(F.avg("value"), 4) + F.lit(0.0)).alias("v_avg"),
        "ROUND(AVG(value), 4) + 0 v_avg",
    ),
    "v_min": (
        lambda: F.min("value").alias("v_min"),
        "MIN(value) v_min",
    ),
    "v_max": (
        lambda: F.max("value").alias("v_max"),
        "MAX(value) v_max",
    ),
    "u_dist": (
        lambda: F.countDistinct("user_id").alias("u_dist"),
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) u_dist",
    ),
}

TYPES = ["click", "view", "purchase", "signup", "error"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sorted, row-sorted by a float-tolerant key: floats enter
    the sort key rounded (so ulp-level summation-order differences
    can't reorder rows), and the caller compares float columns with a
    tolerance rather than string equality."""
    df = df[sorted(df.columns)].copy()
    key = df.copy()
    for c in key.columns:
        if key[c].dtype.kind == "f":
            key[c] = key[c].round(6)
        key[c] = key[c].astype(str)
    order = key.sort_values(list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def _assert_frames_close(a: pd.DataFrame, b: pd.DataFrame, case: str) -> None:
    a, b = _canon(a), _canon(b)
    assert sorted(a.columns) == sorted(b.columns), case
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            av = a[c].astype(float)
            bv = b[c].astype(float)
            assert ((av - bv).abs().fillna(0) < 1e-6).all(), (case, c)
            assert (av.isna() == bv.isna()).all(), (case, c)
        else:
            assert a[c].astype(str).equals(b[c].astype(str)), (case, c)


def test_random_agg_queries_match_duckdb(spark):
    rng = random.Random(0xF00D)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    )
    t0 = dt.datetime(2024, 1, 1)
    for trial in range(15):
        # random window inside the fixture's range
        a = rng.randint(0, 40_000)
        b = a + rng.randint(600, 200_000)
        lo = t0 + dt.timedelta(seconds=a)
        hi = t0 + dt.timedelta(seconds=b)
        types = rng.sample(TYPES, rng.randint(1, len(TYPES)))
        group_time = rng.choice([None, "hour", "day"])
        group_type = rng.choice([True, False])
        aggs = rng.sample(sorted(AGGS), rng.randint(1, 3))

        ev = load_table(spark, SF_SMOKE, "events", ts_filters=[
            ("ts", ">=", lo.strftime("%Y-%m-%d %H:%M:%S")),
            ("ts", "<", hi.strftime("%Y-%m-%d %H:%M:%S")),
        ]).filter(F.col("event_type").isin(types))
        keys, sql_keys = [], []
        if group_type:
            keys.append(F.col("event_type"))
            sql_keys.append("event_type")
        if group_time:
            keys.append(
                F.unix_timestamp(F.date_trunc(group_time, "ts")).alias("bucket_s")
            )
            sql_keys.append(
                f"CAST(floor(epoch(date_trunc('{group_time}', ts))) AS BIGINT) bucket_s"
            )
        agged = (
            ev.groupBy(*keys) if keys else ev.groupBy()
        ).agg(*[AGGS[a_][0]() for a_ in aggs])
        sdf = agged.toPandas()

        tlist = ", ".join(f"'{t}'" for t in types)
        sql = (
            f"SELECT {', '.join(sql_keys + [AGGS[a_][1] for a_ in aggs])} "
            f"FROM events WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}' "
            f"AND event_type IN ({tlist}) "
        )
        if sql_keys:
            sql += f"GROUP BY {', '.join(str(i + 1) for i in range(len(sql_keys)))}"
        odf = con.execute(sql).df()

        case = f"trial={trial} win=({a},{b}) types={types} g=({group_type},{group_time}) aggs={aggs}"
        assert len(sdf) == len(odf), case
        _assert_frames_close(sdf, odf, case)
