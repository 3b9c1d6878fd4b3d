"""SURVEY.md §2b declared conformance queries — the t2 oracle contract.

Each query exists twice:

- ``QUERIES[name]`` — a PySpark DataFrame builder ``(spark, sf_dir) -> DF``
  expressing the operator the Spark-native way (declarative plan, Catalyst
  optimizes; broadcast hints where a dim side is known-small).
- ``ORACLES[name]`` — the equivalent DuckDB SQL over the pre-registered
  views (region nation customer supplier part orders lineitem events
  documents embeddings).

Conventions (SURVEY §2b): UTC everywhere; every float ROUND(x,4); counts
CAST AS BIGINT; `EPOCHS(ts)` = integer epoch seconds floored
(`unix_timestamp` in Spark, `CAST(floor(epoch(ts)) AS BIGINT)` in DuckDB);
aliases identical on both sides — the driver sorts columns by name before
hashing.

Reference parity notes cite SURVEY.md §2 rows (e.g. A1–A14 downsamplers ←
`«ds»/datastream/backends/mongodb.py` ValueDownsampler hierarchy, W1–W4
derive operators — see SURVEY §0 citation caveat).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _declare(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def build(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return QUERIES[name](spark, sf_dir)


def _epochs(c) -> F.Column:
    """EPOCHS(ts): integer epoch seconds, floored (SURVEY §2b convention)."""
    return F.unix_timestamp(c)


# --------------------------------------------------------------------------
# Q01 ingest/scan sanity (S1/S2 append paths land here)
# --------------------------------------------------------------------------
@_declare(
    "q01_scan_sanity",
    "SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(event_id) AS BIGINT) ck FROM events",
)
def q01(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n"),
        F.sum("event_id").cast("long").alias("ck"),
    )


# --------------------------------------------------------------------------
# Q02 plain range scan (S3 get_data)
# --------------------------------------------------------------------------
@_declare(
    "q02_range_scan",
    """
    SELECT event_id, user_id, event_type, ROUND(value,4) v FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
    ORDER BY event_id
    """,
)
def q02(spark, sf_dir):
    # range predicates applied pre-conversion → parquet row-group pushdown
    ev = load_table(
        spark,
        sf_dir,
        "events",
        ts_filters=[
            ("ts", ">=", "2024-01-10 00:00:00"),
            ("ts", "<", "2024-01-11 00:00:00"),
        ],
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 4).alias("v"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q03 inclusive/exclusive bound matrix (P3)
# --------------------------------------------------------------------------
@_declare(
    "q03_bounds",
    """
    SELECT CAST(COUNT(*) AS BIGINT) n_incl,
           CAST(SUM(CASE WHEN ts > TIMESTAMP '2024-01-10 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) n_excl
    FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def q03(spark, sf_dir):
    ev = load_table(
        spark,
        sf_dir,
        "events",
        ts_filters=[
            ("ts", ">=", "2024-01-10 00:00:00"),
            ("ts", "<=", "2024-01-20 00:00:00"),
        ],
    )
    lo = F.lit("2024-01-10 00:00:00").cast("timestamp")
    return ev.agg(
        F.count("*").alias("n_incl"),
        F.sum(F.when(F.col("ts") > lo, 1).otherwise(0)).cast("long").alias("n_excl"),
    )


# --------------------------------------------------------------------------
# Q04 downsampler projection (P1/P2): hourly mean+max only
# --------------------------------------------------------------------------
@_declare(
    "q04_projection",
    """
    SELECT user_id, event_type, date_trunc('hour', ts) b,
           ROUND(AVG(value),4) m, ROUND(MAX(value),4) u
    FROM events GROUP BY 1,2,3 ORDER BY 1,2,3
    """,
)
def q04(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type", F.date_trunc("hour", "ts").alias("b"))
        .agg(
            F.round(F.avg("value"), 4).alias("m"),
            F.round(F.max("value"), 4).alias("u"),
        )
        .orderBy("user_id", "event_type", "b")
    )


# --------------------------------------------------------------------------
# Q05 reverse + pagination (O1/O2, S7)
# --------------------------------------------------------------------------
@_declare(
    "q05_reverse_page",
    """
    SELECT event_id, ROUND(value,4) v FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 50 OFFSET 100
    """,
)
def q05(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select("event_id", F.round("value", 4).alias("v"))
        .offset(100)
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q06 tag/stream discovery (S4/P4 find_streams)
# --------------------------------------------------------------------------
@_declare(
    "q06_find_streams",
    """
    SELECT DISTINCT user_id, event_type FROM events
    WHERE event_type IN ('purchase','signup') ORDER BY 1,2
    """,
)
def q06(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# Q07 null semantics (P5)
# --------------------------------------------------------------------------
@_declare(
    "q07_nulls",
    "SELECT CAST(COUNT(*) AS BIGINT) c_all, CAST(COUNT(value) AS BIGINT) c_val FROM events",
)
def q07(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("c_all"),
        F.count("value").alias("c_val"),
    )


# --------------------------------------------------------------------------
# Q08 core numeric downsamplers per hourly bucket (A1–A4, A7, A14)
# --------------------------------------------------------------------------
@_declare(
    "q08_downsamplers",
    """
    SELECT user_id, event_type, date_trunc('hour', ts) b,
           ROUND(AVG(value),4) m, ROUND(SUM(value),4) s,
           ROUND(MIN(value),4) l, ROUND(MAX(value),4) u,
           CAST(COUNT(*) AS BIGINT) c
    FROM events GROUP BY 1,2,3 ORDER BY 1,2,3
    """,
)
def q08(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type", F.date_trunc("hour", "ts").alias("b"))
        .agg(
            F.round(F.avg("value"), 4).alias("m"),
            F.round(F.sum("value"), 4).alias("s"),
            F.round(F.min("value"), 4).alias("l"),
            F.round(F.max("value"), 4).alias("u"),
            F.count("*").alias("c"),
        )
        .orderBy("user_id", "event_type", "b")
    )


# --------------------------------------------------------------------------
# Q09 sum_squares + population std_dev, formula-exact (A5, A6)
# --------------------------------------------------------------------------
@_declare(
    "q09_sumsq_stddev",
    """
    SELECT user_id, date_trunc('day', ts) b,
           ROUND(SUM(value*value),4) q,
           ROUND(SQRT((SUM(value*value) - SUM(value)*SUM(value)/COUNT(*))/COUNT(*)),4) d
    FROM events GROUP BY 1,2 ORDER BY 1,2
    """,
)
def q09(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    q = F.sum(F.col("value") * F.col("value"))
    s = F.sum("value")
    c = F.count("*")
    return (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("b"))
        .agg(
            F.round(q, 4).alias("q"),
            F.round(F.sqrt((q - s * s / c) / c), 4).alias("d"),
        )
        .orderBy("user_id", "b")
    )


# --------------------------------------------------------------------------
# Q10 nominal downsamplers: most_often / least_often (A8–A10)
# --------------------------------------------------------------------------
@_declare(
    "q10_nominal",
    """
    WITH f AS (SELECT user_id, date_trunc('day', ts) b, event_type v, CAST(COUNT(*) AS BIGINT) n
               FROM events GROUP BY 1,2,3),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, b ORDER BY n DESC, v ASC) rme,
                 ROW_NUMBER() OVER (PARTITION BY user_id, b ORDER BY n ASC,  v ASC) rle
          FROM f)
    SELECT user_id, b,
           MAX(CASE WHEN rme=1 THEN v END) most_often,
           MAX(CASE WHEN rle=1 THEN v END) least_often
    FROM r GROUP BY 1,2 ORDER BY 1,2
    """,
)
def q10(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy(
        "user_id",
        F.date_trunc("day", "ts").alias("b"),
        F.col("event_type").alias("v"),
    ).agg(F.count("*").alias("n"))
    w_me = Window.partitionBy("user_id", "b").orderBy(F.col("n").desc(), F.col("v").asc())
    w_le = Window.partitionBy("user_id", "b").orderBy(F.col("n").asc(), F.col("v").asc())
    r = f.withColumn("rme", F.row_number().over(w_me)).withColumn(
        "rle", F.row_number().over(w_le)
    )
    return (
        r.groupBy("user_id", "b")
        .agg(
            F.max(F.when(F.col("rme") == 1, F.col("v"))).alias("most_often"),
            F.max(F.when(F.col("rle") == 1, F.col("v"))).alias("least_often"),
        )
        .orderBy("user_id", "b")
    )


# --------------------------------------------------------------------------
# Q11 time downsamplers first/last/mean (A11–A13)
# --------------------------------------------------------------------------
@_declare(
    "q11_time_downsamplers",
    """
    SELECT user_id, event_type, date_trunc('hour', ts) b,
           CAST(MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) a,
           CAST(MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) z,
           CAST(FLOOR(AVG(CAST(floor(epoch(ts)) AS BIGINT))) AS BIGINT) m
    FROM events GROUP BY 1,2,3 ORDER BY 1,2,3
    """,
)
def q11(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    e = _epochs(F.col("ts"))
    return (
        ev.groupBy("user_id", "event_type", F.date_trunc("hour", "ts").alias("b"))
        .agg(
            F.min(e).alias("a"),
            F.max(e).alias("z"),
            F.floor(F.avg(e)).cast("long").alias("m"),
        )
        .orderBy("user_id", "event_type", "b")
    )


# --------------------------------------------------------------------------
# Q12 10-second epoch-aligned buckets + completed-bucket rule (T2/T3, A14)
# --------------------------------------------------------------------------
@_declare(
    "q12_buckets_10s",
    """
    SELECT CAST(FLOOR(CAST(floor(epoch(ts)) AS BIGINT)/10)*10 AS BIGINT) b10,
           CAST(COUNT(*) AS BIGINT) c, ROUND(SUM(value),4) s
    FROM events
    WHERE ts < TIMESTAMP '2024-01-30 00:00:00'
    GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1
    """,
)
def q12(spark, sf_dir):
    """10-second epoch-aligned buckets under the completed-bucket cutoff.
    Buckets are global (not per-user): the testdata's per-user event rate
    is ~1/hour, so a per-user 10 s grouping returned 0 rows at every SF —
    a vacuous hash match that couldn't distinguish correct bucketing from
    an empty plan (flagged in r4 ADVICE). Global 10 s buckets keep the
    HAVING path live (174 rows at sf0.01)."""
    ev = load_table(
        spark, sf_dir, "events", ts_filters=[("ts", "<", "2024-01-30 00:00:00")]
    )
    b10 = (F.floor(_epochs(F.col("ts")) / 10) * 10).cast("long")
    return (
        ev.groupBy(b10.alias("b10"))
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 4).alias("s"))
        .filter(F.col("c") > 1)
        .orderBy("b10")
    )


# --------------------------------------------------------------------------
# Q13 distinct aggregation (A15 — beyond reference, free in Spark)
# --------------------------------------------------------------------------
@_declare(
    "q13_distinct",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) u
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q13(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Q14 rollup (A16)
# --------------------------------------------------------------------------
@_declare(
    "q14_rollup",
    """
    SELECT COALESCE(event_type,'ALL') et, CAST(COUNT(*) AS BIGINT) c
    FROM events GROUP BY ROLLUP(event_type) ORDER BY 1
    """,
)
def q14(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(F.count("*").alias("c"))
        .select(F.coalesce("event_type", F.lit("ALL")).alias("et"), "c")
        .orderBy("et")
    )


# --------------------------------------------------------------------------
# Q15 derive op 'sum' across streams (W1)
# --------------------------------------------------------------------------
@_declare(
    "q15_derive_sum",
    """
    SELECT user_id, date_trunc('minute', ts) b, ROUND(SUM(value),4) s
    FROM events GROUP BY 1,2 HAVING COUNT(*) > 1 ORDER BY 1,2
    """,
)
def q15(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.date_trunc("minute", "ts").alias("b"))
        .agg(F.round(F.sum("value"), 4).alias("s"), F.count("*").alias("_c"))
        .filter(F.col("_c") > 1)
        .drop("_c")
        .orderBy("user_id", "b")
    )


# --------------------------------------------------------------------------
# Q16 derive op 'derivative' (W2)
# --------------------------------------------------------------------------
@_declare(
    "q16_derivative",
    """
    WITH o AS (SELECT user_id, event_type, ts, event_id, value,
                      LAG(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) pv,
                      LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) pt
               FROM events)
    SELECT user_id, event_type, CAST(CAST(floor(epoch(ts)) AS BIGINT) AS BIGINT) t,
           ROUND((value-pv)/NULLIF(CAST(floor(epoch(ts)) AS BIGINT)-pt,0),4) + 0 d
    FROM o WHERE pv IS NOT NULL ORDER BY 1,2,3
    """,
)
def q16(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    e = _epochs(F.col("ts"))
    o = ev.select(
        "user_id",
        "event_type",
        e.alias("t"),
        "value",
        F.lag("value").over(w).alias("pv"),
        F.lag(e).over(w).alias("pt"),
    )
    dt = F.col("t") - F.col("pt")
    return (
        o.filter(F.col("pv").isNotNull())
        .select(
            "user_id",
            "event_type",
            "t",
            # + 0.0 canonicalizes IEEE -0.0 → +0.0 (matches the oracle's
            # `+ 0`; a repr-based hash would otherwise see two zeros)
            (
                F.round((F.col("value") - F.col("pv")) / F.when(dt != 0, dt), 4)
                + F.lit(0.0)
            ).alias("d"),
        )
        .orderBy("user_id", "event_type", "t")
    )


# --------------------------------------------------------------------------
# Q17 derive op 'counter_reset' (W3)
# --------------------------------------------------------------------------
@_declare(
    "q17_counter_reset",
    """
    WITH o AS (SELECT user_id, event_type, ts, event_id, value,
                      LAG(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) pv
               FROM events)
    SELECT user_id, event_type, event_id, 1 AS reset
    FROM o WHERE pv IS NOT NULL AND value < pv ORDER BY 1,2,3
    """,
)
def q17(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = ev.withColumn("pv", F.lag("value").over(w))
    return (
        o.filter(F.col("pv").isNotNull() & (F.col("value") < F.col("pv")))
        .select("user_id", "event_type", "event_id", F.lit(1).alias("reset"))
        .orderBy("user_id", "event_type", "event_id")
    )


# --------------------------------------------------------------------------
# Q18 derive op 'counter_derivative' with wraparound max_value=1000 (W4)
# --------------------------------------------------------------------------
@_declare(
    "q18_counter_derivative",
    """
    WITH o AS (SELECT user_id, ts, event_id, value,
                      LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) pv,
                      LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) pt
               FROM events WHERE event_type='view')
    SELECT user_id, event_id,
           ROUND((CASE WHEN value >= pv THEN value-pv ELSE 1000-pv+value END)
                 / NULLIF(CAST(floor(epoch(ts)) AS BIGINT)-pt,0), 4) + 0 cd
    FROM o WHERE pv IS NOT NULL ORDER BY 1,2
    """,
)
def q18(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _epochs(F.col("ts"))
    o = ev.select(
        "user_id",
        "event_id",
        e.alias("t"),
        "value",
        F.lag("value").over(w).alias("pv"),
        F.lag(e).over(w).alias("pt"),
    )
    dt = F.col("t") - F.col("pt")
    delta = F.when(F.col("value") >= F.col("pv"), F.col("value") - F.col("pv")).otherwise(
        F.lit(1000) - F.col("pv") + F.col("value")
    )
    return (
        o.filter(F.col("pv").isNotNull())
        .select(
            "user_id",
            "event_id",
            (F.round(delta / F.when(dt != 0, dt), 4) + F.lit(0.0)).alias("cd"),
        )
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# Q19 general window functions (W5 — beyond reference)
# --------------------------------------------------------------------------
@_declare(
    "q19_windows",
    """
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) rn,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),4) mv
    FROM events ORDER BY user_id, rn
    """,
)
def q19(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.round(F.sum("value").over(w.rowsBetween(-2, 0)), 4).alias("mv"),
        )
        .orderBy("user_id", "rn")
    )


# --------------------------------------------------------------------------
# Q20 top-k (O3)
# --------------------------------------------------------------------------
@_declare(
    "q20_topk",
    """
    SELECT event_id, ROUND(value,4) v FROM events
    ORDER BY value DESC, event_id ASC LIMIT 20
    """,
)
def q20(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .select("event_id", F.round("value", 4).alias("v"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q21 join on star schema (§2.6)
# --------------------------------------------------------------------------
@_declare(
    "q21_join",
    """
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) n, ROUND(SUM(o.o_totalprice),2) s
    FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey GROUP BY 1 ORDER BY 1
    """,
)
def q21(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # customer is the dim side: broadcast — no shuffle of the fact table.
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q22 multi-way join with small dims (broadcast)
# --------------------------------------------------------------------------
@_declare(
    "q22_multijoin",
    """
    SELECT r.r_name, CAST(COUNT(*) AS BIGINT) n
    FROM customer c JOIN nation n2 ON c.c_nationkey=n2.n_nationkey
    JOIN region r ON n2.n_regionkey=r.r_regionkey GROUP BY 1 ORDER BY 1
    """,
)
def q22(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n"))
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Q23 bucket-aligned as-of-style join (the W1/W4 alignment idiom)
# --------------------------------------------------------------------------
@_declare(
    "q23_bucket_join",
    """
    WITH a AS (SELECT date_trunc('hour', ts) b, CAST(COUNT(*) AS BIGINT) c FROM events WHERE event_type='view' GROUP BY 1),
         d AS (SELECT date_trunc('hour', ts) b, CAST(COUNT(*) AS BIGINT) c FROM events WHERE event_type='click' GROUP BY 1)
    SELECT a.b, a.c AS views, COALESCE(d.c,0) AS clicks FROM a LEFT JOIN d ON a.b=d.b ORDER BY a.b
    """,
)
def q23(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    b = F.date_trunc("hour", "ts").alias("b")
    a = ev.filter(F.col("event_type") == "view").groupBy(b).agg(F.count("*").alias("c"))
    d = ev.filter(F.col("event_type") == "click").groupBy(b).agg(F.count("*").alias("c"))
    return (
        a.alias("a")
        .join(d.alias("d"), on="b", how="left")
        .select(
            F.col("b"),
            F.col("a.c").alias("views"),
            F.coalesce(F.col("d.c"), F.lit(0)).alias("clicks"),
        )
        .orderBy("b")
    )


# --------------------------------------------------------------------------
# Q24 set ops
# --------------------------------------------------------------------------
@_declare(
    "q24_setops",
    """
    SELECT user_id FROM events WHERE event_type='purchase'
    INTERSECT SELECT user_id FROM events WHERE event_type='error' ORDER BY 1
    """,
)
def q24(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b).orderBy("user_id")


# --------------------------------------------------------------------------
# Q25 granularity rounding for all 7 granularities (§2.7)
# --------------------------------------------------------------------------
@_declare(
    "q25_granularities",
    """
    SELECT CAST(floor(epoch(ts)) AS BIGINT)                                  g_s,
           CAST(FLOOR(CAST(floor(epoch(ts)) AS BIGINT)/10)*10 AS BIGINT)     g_10s,
           CAST(FLOOR(CAST(floor(epoch(ts)) AS BIGINT)/60)*60 AS BIGINT)     g_min,
           CAST(FLOOR(CAST(floor(epoch(ts)) AS BIGINT)/600)*600 AS BIGINT)   g_10min,
           CAST(FLOOR(CAST(floor(epoch(ts)) AS BIGINT)/3600)*3600 AS BIGINT) g_h,
           CAST(FLOOR(CAST(floor(epoch(ts)) AS BIGINT)/21600)*21600 AS BIGINT) g_6h,
           CAST(FLOOR(CAST(floor(epoch(ts)) AS BIGINT)/86400)*86400 AS BIGINT) g_d
    FROM events ORDER BY g_s LIMIT 100
    """,
)
def q25(spark, sf_dir):
    from ..granularity import GRANULARITIES

    ev = load_table(spark, sf_dir, "events")
    names = ["g_s", "g_10s", "g_min", "g_10min", "g_h", "g_6h", "g_d"]
    cols = [
        g.bucket_epoch_col(F.col("ts")).alias(n)
        for g, n in zip(GRANULARITIES, names)
    ]
    return ev.select(*cols).orderBy("g_s").limit(100)


# --------------------------------------------------------------------------
# Q26 JSON tag extraction (P4, §2.7)
# --------------------------------------------------------------------------
@_declare(
    "q26_json",
    """
    SELECT event_id, CAST(json_extract(props,'$.k') AS BIGINT) k FROM events
    WHERE event_id < 100 ORDER BY event_id
    """,
)
def q26(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") < 100)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Q27 monotonic-append violation detector (T1)
# --------------------------------------------------------------------------
@_declare(
    "q27_monotonic",
    """
    WITH o AS (SELECT user_id, event_type, event_id, ts,
                      LAG(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) pts
               FROM events)
    SELECT CAST(COUNT(*) AS BIGINT) violations FROM o WHERE ts <= pts
    """,
)
def q27(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = ev.withColumn("pts", F.lag("ts").over(w))
    return o.filter(F.col("ts") <= F.col("pts")).agg(
        F.count("*").alias("violations")
    )


# --------------------------------------------------------------------------
# Q28 pandas GROUPED_AGG std_dev — engine-side procedure, oracle == Q09.
# Pins §2.9: a custom downsampler as an Arrow-vectorized grouped aggregate
# reproduces the native formula.
# --------------------------------------------------------------------------
@_declare("q28_pandas_stddev", ORACLES["q09_sumsq_stddev"])
def q28(spark, sf_dir):
    import numpy as np

    # Scale note: applyInPandas keyed by a bounded hash bucket, with a
    # vectorized pandas groupby over the fine key inside — one Python call
    # per bucket (≈ one per core), not one per group. A grouped-agg pandas
    # UDF over (user, day) costs ~40k interpreter round-trips at sf0.1
    # (measured 60s); per-user grouping still pays 1500 tiny groupbys.
    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.assign(vv=pdf["value"] * pdf["value"])
        g = pdf.groupby(["user_id", "b"], sort=False)
        agg = g.agg(s=("value", "sum"), q=("vv", "sum"), n=("value", "count"))
        var = (agg["q"] - agg["s"] * agg["s"] / agg["n"]) / agg["n"]
        agg["d"] = np.sqrt(np.where(var >= 0, var, np.nan))
        out = agg.reset_index()[["user_id", "b", "q", "d"]]
        return out

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("b"), "value"
    )
    res = ev.groupBy(F.pmod(F.hash("user_id"), F.lit(64)).alias("_bk")).applyInPandas(
        per_bucket, "user_id long, b timestamp, q double, d double"
    )
    return res.select(
        "user_id",
        "b",
        F.round("q", 4).alias("q"),
        F.round("d", 4).alias("d"),
    ).orderBy("user_id", "b")


# --------------------------------------------------------------------------
# Q29 exact dedup (extension §2.10)
# --------------------------------------------------------------------------
@_declare(
    "q29_exact_dedup",
    "SELECT CAST(COUNT(*) AS BIGINT) total, CAST(COUNT(DISTINCT text) AS BIGINT) uniq FROM documents",
)
def q29(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("total"),
        F.countDistinct("text").alias("uniq"),
    )


# --------------------------------------------------------------------------
# Q30 brute-force cosine top-1 neighbor (extension §2.10)
# Engine: broadcast the 20 query vectors against all candidates; dot/norm in
# float64 with a sequential fold so FP order matches the DuckDB oracle's
# list_inner_product loop exactly.
# --------------------------------------------------------------------------
@_declare(
    "q30_cosine_top1",
    """
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
         p AS (SELECT q.vec_id, c.vec_id nn,
                      list_inner_product(q.e, c.e)
                      / sqrt(list_inner_product(q.e, q.e) * list_inner_product(c.e, c.e)) sim
               FROM q, c WHERE q.vec_id <> c.vec_id),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn ASC) rk FROM p)
    SELECT vec_id, nn, ROUND(sim,4) sim FROM r WHERE rk=1 ORDER BY vec_id
    """,
)
def q30(spark, sf_dir):
    # scatter (guide §2): the brute-force fold runs in the scan stage;
    # a single-row-group fixture otherwise serializes it on one core
    emb = load_table(spark, sf_dir, "embeddings", scatter=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id"), F.col("e").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("nn"), F.col("e").alias("ce"))
    p = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("vec_id") != F.col("nn"))
        .select(
            "vec_id",
            "nn",
            (
                dot(F.col("qe"), F.col("ce"))
                / F.sqrt(dot(F.col("qe"), F.col("qe")) * dot(F.col("ce"), F.col("ce")))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("nn").asc())
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "nn", F.round("sim", 4).alias("sim"))
        .orderBy("vec_id")
    )
