"""Downsampling — the reference's materialization path (SURVEY §2.3 A1–A14,
§3.3), re-expressed as a declarative Spark aggregation cascade.

Reference semantics (`«ds»/backends/mongodb.py` ValueDownsampler hierarchy,
`downsample_streams(until=)` — §0 caveat): per (stream, granularity,
epoch-aligned bucket), compute

    value: mean, sum, min, max, sum_squares, std_dev (population), count,
           frequencies / most_often / least_often (nominal; tie → value asc)
    time:  first, last, mean (floored to seconds)

Only *completed* buckets (bucket_end <= until) are emitted.

Spark-first design:
- one ``groupBy(stream_id, bucket)`` over raw points for the finest coarser
  granularity, then each coarser level **merges the next-finer aggregates**
  (all downsamplers are algebraic: sum-of-sums, min-of-mins, map-merge for
  frequencies, t_sum_epoch carrier for mean-ts). Raw data is scanned once
  regardless of how many granularities exist — at 100 TB this is the
  difference between 1 scan and 6.
- no per-stream driver loops: every step is a single DataFrame job over
  all streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..granularity import Granularity

# presentation keys the reference exposes, per value type
NUMERIC_DOWNSAMPLERS = (
    "mean",
    "sum",
    "min",
    "max",
    "sum_squares",
    "std_dev",
    "count",
)
NOMINAL_DOWNSAMPLERS = ("count", "frequencies", "most_often", "least_often")
GRAPH_DOWNSAMPLERS = ("count",)
TIME_DOWNSAMPLERS = ("first", "last", "mean")


def _finish_v(
    s: Column, q: Column, c: Column, mn: Column, mx: Column, freqs: Column
) -> Column:
    """Assemble the presentation struct from algebraic carriers."""
    mean = F.when(c > 0, s / c)
    var = F.when(c > 0, (q - s * s / c) / c)
    # negative-epsilon variance clamps to 0; null (nominal/graph) stays null
    std = F.when(var >= 0, F.sqrt(var)).when(var < 0, F.lit(0.0))
    # most/least often from the merged frequency map; tie-break value asc
    # (FIXTURES B2 fx_nominal). map_entries preserves no order — sort.
    entries = F.array_sort(F.map_entries(freqs))  # sorted by key asc
    most = F.when(
        F.size(entries) > 0,
        F.aggregate(
            entries,
            entries[0],
            lambda acc, e: F.when(e["value"] > acc["value"], e).otherwise(acc),
        )["key"],
    )
    least = F.when(
        F.size(entries) > 0,
        F.aggregate(
            entries,
            entries[0],
            lambda acc, e: F.when(e["value"] < acc["value"], e).otherwise(acc),
        )["key"],
    )
    return F.struct(
        mean.alias("mean"),
        s.alias("sum"),
        mn.alias("min"),
        mx.alias("max"),
        q.alias("sum_squares"),
        std.alias("std_dev"),
        c.alias("count"),
        freqs.alias("frequencies"),
        most.alias("most_often"),
        least.alias("least_often"),
    )


def _finish_t(first: Column, last: Column, t_sum: Column, c: Column) -> Column:
    mean_ts = F.when(c > 0, F.timestamp_seconds(F.floor(t_sum / c)))
    return F.struct(first.alias("first"), last.alias("last"), mean_ts.alias("mean"))


def downsample_raw(
    points_raw: DataFrame, granularity: Granularity, until_epoch: int | None = None
) -> DataFrame:
    """Aggregate raw points into ``granularity`` buckets (schema of
    points_agg). Handles numeric, nominal and graph rows in one pass —
    numeric carriers are null for nominal streams and vice versa.
    """
    bucket = granularity.bucket_col(F.col("ts"))
    df = points_raw
    if until_epoch is not None:
        # completed-bucket rule (SURVEY T3): bucket_end <= until
        df = df.filter(
            (granularity.bucket_epoch_col(F.col("ts")) + granularity.duration_s)
            <= F.lit(until_epoch)
        )
    e = F.unix_timestamp(F.col("ts"))
    agg = df.groupBy("stream_id", bucket.alias("bucket_ts")).agg(
        F.sum("value").alias("_s"),
        F.sum(F.col("value") * F.col("value")).alias("_q"),
        F.count("*").alias("_c"),
        F.min("value").alias("_mn"),
        F.max("value").alias("_mx"),
        # nominal: per-bucket frequency map, built without a second shuffle
        F.map_from_entries(
            F.array_sort(
                F.map_entries(
                    F.aggregate(
                        F.collect_list("value_nominal"),
                        F.create_map().cast("map<string,bigint>"),
                        lambda acc, x: F.map_zip_with(
                            acc,
                            F.create_map(x, F.lit(1).cast("long")),
                            lambda k, v1, v2: F.coalesce(v1, F.lit(0))
                            + F.coalesce(v2, F.lit(0)),
                        ),
                    )
                )
            )
        ).alias("_f"),
        F.min("ts").alias("_first"),
        F.max("ts").alias("_last"),
        F.sum(e).alias("t_sum_epoch"),
    )
    return _assemble(agg, granularity.name)


def cap_frequencies(freqs: Column, max_entries: int) -> Column:
    """Bound a frequency map to its ``max_entries`` most frequent values
    (ties → value asc), folding the tail into an ``__other__`` count.

    SURVEY §7 risk: nominal `frequencies` maps are unbounded per bucket in
    the reference; at 100 TB a high-cardinality stream would blow bucket
    rows. Opt-in (engine extension, off by default for reference parity);
    count/most_often/least_often remain exact because they're computed
    before capping."""
    entries = F.map_entries(freqs)  # array<struct<key,value>>
    ranked = F.array_sort(
        F.transform(
            entries, lambda e: F.struct(e["value"].alias("n"), e["key"].alias("k"))
        ),
        lambda a, b: F.when(a["n"] > b["n"], F.lit(-1))
        .when(a["n"] < b["n"], F.lit(1))
        .when(a["k"] < b["k"], F.lit(-1))
        .when(a["k"] > b["k"], F.lit(1))
        .otherwise(F.lit(0)),
    )  # count desc, value asc — matches the documented tie-break
    top = F.slice(ranked, 1, max_entries)
    tail = F.slice(ranked, max_entries + 1, 2_000_000_000)
    tail_sum = F.aggregate(tail, F.lit(0).cast("long"), lambda a, e: a + e["n"])
    capped = F.map_from_entries(
        F.array_sort(F.transform(top, lambda e: F.struct(e["k"].alias("key"), e["n"].alias("value"))))
    )
    return F.when(F.size(entries) <= max_entries, freqs).otherwise(
        F.map_concat(
            capped, F.create_map(F.lit("__other__"), tail_sum)
        )
    )


def _assemble(agg: DataFrame, gran_name: str) -> DataFrame:
    freqs = F.when(F.size("_f") > 0, F.col("_f"))
    return agg.select(
        "stream_id",
        F.lit(gran_name).alias("granularity"),
        "bucket_ts",
        _finish_v(
            F.col("_s"), F.col("_q"), F.col("_c"), F.col("_mn"), F.col("_mx"), freqs
        ).alias("v"),
        _finish_t(
            F.col("_first"), F.col("_last"), F.col("t_sum_epoch"), F.col("_c")
        ).alias("t"),
        "t_sum_epoch",
    )


def rollup_agg(
    finer_agg: DataFrame, granularity: Granularity, until_epoch: int | None = None
) -> DataFrame:
    """Merge next-finer aggregates into coarser buckets (algebraic merge —
    the init/update/finish contract of SURVEY §2.3, applied to partials).
    """
    bucket = granularity.bucket_col(F.col("bucket_ts"))
    df = finer_agg
    if until_epoch is not None:
        df = df.filter(
            (granularity.bucket_epoch_col(F.col("bucket_ts")) + granularity.duration_s)
            <= F.lit(until_epoch)
        )
    merged_freq = F.map_from_entries(
        F.array_sort(
            F.map_entries(
                F.aggregate(
                    F.collect_list(F.col("v.frequencies")),
                    F.create_map().cast("map<string,bigint>"),
                    lambda acc, m: F.map_zip_with(
                        acc,
                        m,
                        lambda k, v1, v2: F.coalesce(v1, F.lit(0))
                        + F.coalesce(v2, F.lit(0)),
                    ),
                )
            )
        )
    )
    agg = df.groupBy("stream_id", bucket.alias("bucket_ts")).agg(
        F.sum("v.sum").alias("_s"),
        F.sum("v.sum_squares").alias("_q"),
        F.sum("v.count").alias("_c"),
        F.min("v.min").alias("_mn"),
        F.max("v.max").alias("_mx"),
        merged_freq.alias("_f"),
        F.min("t.first").alias("_first"),
        F.max("t.last").alias("_last"),
        F.sum("t_sum_epoch").alias("t_sum_epoch"),
    )
    return _assemble(agg, granularity.name)
