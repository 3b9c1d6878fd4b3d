"""Derived-stream operators (SURVEY §2.4 W1–W4).

Reference (`«ds»/backends/mongodb.py` DERIVE_OPERATORS registry — §0
caveat): a derived stream is declared at ``ensure_stream`` time with
``derive_from`` (source stream ids), ``derive_op`` and ``derive_args``;
the backend maintains its datapoints incrementally on each source append.

Spark-first: each operator is a *batch recompute plan* over the sources —
a lag window or a bucket aggregation — executed by ``backprocess_streams``
(full rebuild) and reused incrementally by the append path (recompute from
the derived stream's tail; the plans are identical, only the input range
differs — FIXTURES B3.4 pins incremental == batch).

All operators here process EVERY derived stream of a kind in one job
(window partitioned by stream), never a per-stream driver loop.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..granularity import BY_NAME


def source_roles(meta: dict) -> list[tuple[str, str]]:
    """(source_id, role) pairs for one derived stream, resolved from
    derive_args stream roles (default 'data'). The single source of truth
    for role mapping — shared by the batch rebuild (build_derive_plan) and
    the incremental ingest path, so the two can never disagree about which
    sources carry data."""
    args = json.loads(meta.get("derive_args") or "{}")
    srcs = meta["derived_from"] or []
    stream_roles = args.get("streams")  # e.g. [{'name':'reset','stream':id},...]
    out = []
    for i, s in enumerate(srcs):
        r = "data"
        if stream_roles and i < len(stream_roles):
            r = stream_roles[i].get("name", "data") or "data"
        out.append((s, r))
    return out


def derivative(points: DataFrame) -> DataFrame:
    """W2: (v_i − v_{i−1}) / (t_i − t_{i−1} sec); first point emits nothing.

    ``points``: rows of (derived_id, ts, value) — already mapped from the
    source stream. Window per derived stream.
    """
    w = Window.partitionBy("derived_id").orderBy("ts")
    e = F.unix_timestamp("ts")
    o = points.select(
        "derived_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("_pv"),
        F.lag(e).over(w).alias("_pt"),
    )
    dt = e - F.col("_pt")
    return o.filter(F.col("_pv").isNotNull()).select(
        "derived_id",
        "ts",
        ((F.col("value") - F.col("_pv")) / F.when(dt != 0, dt)).alias("value"),
    )


def counter_reset(points: DataFrame) -> DataFrame:
    """W3: emit 1 at each point where the value decreases vs previous."""
    w = Window.partitionBy("derived_id").orderBy("ts")
    o = points.withColumn("_pv", F.lag("value").over(w))
    return o.filter(F.col("_pv").isNotNull() & (F.col("value") < F.col("_pv"))).select(
        "derived_id", "ts", F.lit(1.0).alias("value")
    )


def counter_derivative(
    points: DataFrame, max_value: float | None = None, resets: DataFrame | None = None
) -> DataFrame:
    """W4: derivative of a monotonically-increasing counter.

    - wraparound: if cur < prev and ``max_value`` given, delta =
      max_value − prev + cur; without max_value the point is skipped
      (unexplained decrease).
    - ``resets``: optional (derived_id, ts) rows from a paired reset
      stream; a counter point at or before which a reset occurred (since
      the previous point) does not emit (the delta spans a reset).
    """
    w = Window.partitionBy("derived_id").orderBy("ts")
    e = F.unix_timestamp("ts")
    o = points.select(
        "derived_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("_pv"),
        F.lag(e).over(w).alias("_pt"),
        F.lag("ts").over(w).alias("_pts"),
    )
    o = o.filter(F.col("_pv").isNotNull())
    if resets is not None:
        # bucket-aligned as-of idiom (SURVEY §2.6 / Q23): a reset falls in
        # the (prev_ts, ts] interval → suppress that delta. Range-join via
        # left join on derived_id + interval predicate; the reset side is
        # tiny relative to points, so broadcast it.
        r = resets.select(
            F.col("derived_id").alias("_rid"), F.col("ts").alias("_rts")
        ).distinct()
        o = (
            o.join(
                F.broadcast(r),
                (F.col("derived_id") == F.col("_rid"))
                & (F.col("_rts") > F.col("_pts"))
                & (F.col("_rts") <= F.col("ts")),
                "left",
            )
            .filter(F.col("_rid").isNull())
            .drop("_rid", "_rts")
        )
    dt = e - F.col("_pt")
    inc = F.col("value") >= F.col("_pv")
    if max_value is not None:
        delta = F.when(inc, F.col("value") - F.col("_pv")).otherwise(
            F.lit(max_value) - F.col("_pv") + F.col("value")
        )
        keep = F.lit(True)
    else:
        delta = F.col("value") - F.col("_pv")
        keep = inc
    return o.filter(keep).select(
        "derived_id", "ts", (delta / F.when(dt != 0, dt)).alias("value")
    )


def stream_sum(points: DataFrame, granularity_name: str) -> DataFrame:
    """W1: point-wise sum of N source streams, timestamps aligned by
    rounding to the derived stream's granularity; sums whatever arrived
    per rounded slot (SURVEY W1 semantics, pinned by Q15).
    """
    g = BY_NAME[granularity_name]
    bucket = g.bucket_col(F.col("ts"))
    return (
        points.groupBy("derived_id", bucket.alias("ts"))
        .agg(F.sum("value").alias("value"))
    )


def build_derive_plan(
    derived_meta: list[dict],
    source_points: DataFrame,
) -> DataFrame | None:
    """Compute datapoints for a set of derived streams in bulk.

    ``derived_meta``: dicts with stream_id, derive_op, derive_args (json
    str), derived_from (list), highest_granularity.
    ``source_points``: (stream_id, ts, value) raw numeric points of all
    source streams involved.

    Returns (stream_id, ts, value) rows for all derived streams, or None.
    """
    spark = source_points.sparkSession
    out: list[DataFrame] = []

    # mapping (source stream -> derived stream) as a small broadcast dim
    def mapping_df(metas: list[dict], role: str = "data") -> DataFrame:
        rows = []
        for m in metas:
            for s, r in source_roles(m):
                if r == role:
                    rows.append((s, m["stream_id"]))
        if not rows:
            from .. import storage as _st

            return _st.local_rows_df(spark, [], "stream_id string, derived_id string")
        from .. import storage as _storage

        return _storage.local_rows_df(spark, rows, "stream_id string, derived_id string")

    by_op: dict[str, list[dict]] = {}
    for m in derived_meta:
        by_op.setdefault(m["derive_op"], []).append(m)

    for op, metas in by_op.items():
        data_map = mapping_df(metas, "data")
        pts = source_points.join(F.broadcast(data_map), "stream_id").select(
            "derived_id", "ts", "value"
        )
        if op == "derivative":
            out.append(derivative(pts))
        elif op == "counter_reset":
            out.append(counter_reset(pts))
        elif op == "counter_derivative":
            # group by distinct max_value so each variant is one job
            by_max: dict[float | None, list[dict]] = {}
            for m in metas:
                args = json.loads(m.get("derive_args") or "{}")
                by_max.setdefault(args.get("max_value"), []).append(m)
            for max_value, ms in by_max.items():
                dmap = mapping_df(ms, "data")
                rmap = mapping_df(ms, "reset")
                p = source_points.join(F.broadcast(dmap), "stream_id").select(
                    "derived_id", "ts", "value"
                )
                resets = None
                if rmap.limit(1).count() > 0:
                    resets = source_points.join(F.broadcast(rmap), "stream_id").select(
                        "derived_id", "ts"
                    )
                out.append(counter_derivative(p, max_value=max_value, resets=resets))
        elif op == "sum":
            by_gran: dict[str, list[dict]] = {}
            for m in metas:
                by_gran.setdefault(m["highest_granularity"], []).append(m)
            for gran, ms in by_gran.items():
                dmap = mapping_df(ms, "data")
                p = source_points.join(F.broadcast(dmap), "stream_id").select(
                    "derived_id", "ts", "value"
                )
                out.append(stream_sum(p, gran))
        else:
            raise ValueError(f"unknown derive_op: {op}")

    if not out:
        return None
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.select(
        F.col("derived_id").alias("stream_id"), "ts", "value"
    )
