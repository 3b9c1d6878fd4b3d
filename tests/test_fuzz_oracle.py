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


WINDOW_FNS = {
    # name -> (spark expr over window w, duckdb OVER fragment)
    "rn": (
        lambda w: F.row_number().over(w).alias("rn"),
        "CAST(ROW_NUMBER() OVER w AS BIGINT) rn",
    ),
    "lag_v": (
        lambda w: F.lag("value").over(w).alias("lag_v"),
        "LAG(value) OVER w lag_v",
    ),
    "lead_v": (
        lambda w: F.lead("value").over(w).alias("lead_v"),
        "LEAD(value) OVER w lead_v",
    ),
    "run_sum": (
        lambda w: (
            F.round(
                F.sum("value").over(
                    w.rowsBetween(
                        __import__(
                            "pyspark.sql.window", fromlist=["Window"]
                        ).Window.unboundedPreceding,
                        0,
                    )
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("run_sum"),
        "ROUND(SUM(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW), 4) + 0 run_sum",
    ),
    "run_max": (
        lambda w: F.max("value").over(
            w.rowsBetween(
                __import__(
                    "pyspark.sql.window", fromlist=["Window"]
                ).Window.unboundedPreceding,
                0,
            )
        ).alias("run_max"),
        "MAX(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) run_max",
    ),
}


def test_random_window_queries_match_duckdb(spark):
    """Fuzz the analytic-function surface: random partition keys ×
    window-function subsets, evaluated row-level on a bounded slice so
    every draw's full output frame is compared."""
    from pyspark.sql import Window

    rng = random.Random(0xBEEF)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    )
    for trial in range(10):
        mod = rng.choice([7, 11, 13])
        keep = rng.randrange(mod)
        part_type = rng.choice([True, False])
        fns = rng.sample(sorted(WINDOW_FNS), rng.randint(1, 3))

        parts = ["user_id"] + (["event_type"] if part_type else [])
        w = Window.partitionBy(*parts).orderBy("ts", "event_id")
        ev = load_table(spark, SF_SMOKE, "events").filter(
            (F.col("user_id") % mod) == keep
        )
        sdf = ev.select(
            "event_id",
            "user_id",
            *[WINDOW_FNS[f][0](w) for f in fns],
        ).toPandas()

        over = (
            f"PARTITION BY {', '.join(parts)} ORDER BY ts, event_id"
        )
        sql = (
            f"SELECT event_id, user_id, "
            f"{', '.join(WINDOW_FNS[f][1] for f in fns)} "
            f"FROM events WHERE user_id % {mod} = {keep} "
            f"WINDOW w AS ({over})"
        )
        odf = con.execute(sql).df()
        case = f"trial={trial} mod={mod} keep={keep} parts={parts} fns={fns}"
        assert len(sdf) == len(odf), case
        _assert_frames_close(sdf, odf, case)


def test_random_join_queries_match_duckdb(spark):
    """Fuzz the join surface: two join templates (fact⨝dim on part,
    orders⨝customer) × random dim filters × agg subsets × grouping —
    the equi-join neighborhood around q21/q23/q102-q107."""
    rng = random.Random(0xCAFE)
    con = duckdb.connect()
    for t in ("lineitem", "part", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    brands = [f"Brand#{i}" for i in range(1, 6)]
    segs = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1"
        ).fetchall()
    ]
    for trial in range(10):
        template = rng.choice(["part", "cust"])
        if template == "part":
            bs = rng.sample(brands, rng.randint(1, 3))
            group = rng.choice([True, False])
            li = load_table(spark, SF_SMOKE, "lineitem")
            pt = load_table(spark, SF_SMOKE, "part").filter(
                F.col("p_brand").isin(bs)
            )
            j = li.join(
                F.broadcast(pt),
                li.l_partkey == pt.p_partkey,
            )
            keys = [F.col("p_brand")] if group else []
            sdf = (
                (j.groupBy(*keys) if keys else j.groupBy())
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    (
                        F.round(F.sum("l_extendedprice"), 2) + F.lit(0.0)
                    ).alias("rev"),
                )
                .toPandas()
            )
            blist = ", ".join(f"'{b}'" for b in bs)
            sel = ("p_brand, " if group else "") + (
                "CAST(COUNT(*) AS BIGINT) n, "
                "ROUND(SUM(l_extendedprice), 2) + 0 rev"
            )
            sql = (
                f"SELECT {sel} FROM lineitem JOIN part "
                f"ON l_partkey = p_partkey WHERE p_brand IN ({blist})"
                + (" GROUP BY p_brand" if group else "")
            )
        else:
            ss = rng.sample(segs, rng.randint(1, max(1, len(segs) - 1)))
            group = rng.choice([True, False])
            o = load_table(spark, SF_SMOKE, "orders")
            c = load_table(spark, SF_SMOKE, "customer").filter(
                F.col("c_mktsegment").isin(ss)
            )
            j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            keys = [F.col("o_orderpriority")] if group else []
            sdf = (
                (j.groupBy(*keys) if keys else j.groupBy())
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    (
                        F.round(F.avg("o_totalprice"), 4) + F.lit(0.0)
                    ).alias("avg_price"),
                )
                .toPandas()
            )
            slist = ", ".join(f"'{s}'" for s in ss)
            sel = ("o_orderpriority, " if group else "") + (
                "CAST(COUNT(*) AS BIGINT) n, "
                "ROUND(AVG(o_totalprice), 4) + 0 avg_price"
            )
            sql = (
                f"SELECT {sel} FROM orders JOIN customer "
                f"ON o_custkey = c_custkey "
                f"WHERE c_mktsegment IN ({slist})"
                + (" GROUP BY o_orderpriority" if group else "")
            )
        odf = con.execute(sql).df()
        case = f"trial={trial} template={template}"
        assert len(sdf) == len(odf), case
        _assert_frames_close(sdf, odf, case)
