"""Time-series alignment operators: as-of join and regular-grid
resampling with forward fill (reference: SURVEY §2.6 join family /
§2.7 granularity surface — the reference aligns streams only at bucket
boundaries; these give the point-wise alignment a time-series engine is
expected to have, e.g. "last sensor reading at each trade time").

Scale notes (the 100 TB case):

* ``asof_join`` is the classic *union trick*: tag both sides, union,
  one shuffle on (key), per-key sort, ``last(..., ignorenulls)`` window.
  Cost = one exchange + one sort — identical shape to any windowed agg
  over the same key, and immune to the range-join blowup a naive
  ``l.ts >= r.ts`` theta-join produces (Spark would nested-loop it).
  Skewed keys behave exactly like any window over that key.
* ``resample_ffill`` materializes each key's bucket grid with
  ``sequence``/``explode`` — output-proportional, no driver loop — then
  joins bucketed last-values and forward-fills with an ignore-nulls
  window. One shuffle on (key, bucket) for the agg + one on key for the
  fill; both co-partitioned so AQE coalesces them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` (``direction="backward"``, inclusive) or
    the earliest right row with ``right.ts >= left.ts``
    (``direction="forward"``) on the same ``key``.

    Right must be unique per (key, ts) — pre-aggregate it if not (the
    match would otherwise be ambiguous; DuckDB's ASOF JOIN has the same
    precondition). Adds ``<value>_asof`` per value col plus
    ``ts_asof`` (the matched right timestamp, null when no match or
    outside ``tolerance_seconds``).

    Both directions are the same single-shuffle union trick: tag the
    sides, sort by (ts, side) within the key partition so the eligible
    right row is adjacent, and propagate it with ``last``/``first``
    over a one-sided frame — never a range self-join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    lcols = left.columns
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(r.schema[f"__v_{c}"].dataType).alias(f"__v_{c}")
          for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # right rows sort before left rows at equal ts → inclusive match
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

        def pick(c):
            return F.last(
                F.when(F.col("__side") == 0, c), ignorenulls=True
            ).over(w)
    else:
        # forward: left rows sort before right rows at equal ts, and
        # the nearest eligible right row is the FIRST in the frame ahead
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )

        def pick(c):
            return F.first(
                F.when(F.col("__side") == 0, c), ignorenulls=True
            ).over(w)

    filled = u.select(
        "*",
        pick(F.col("__ts")).alias("__mts"),
        *[
            pick(F.col(f"__v_{c}")).alias(f"__m_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # NTZ-safe epoch seconds: TIMESTAMP_NTZ has no direct cast to
        # double in Spark 4 — bridge through TIMESTAMP (session tz is
        # pinned UTC by harden_session), which keeps sub-second parts
        def _secs(c: str) -> F.Column:
            return F.col(c).cast("timestamp").cast("double")

        gap = (
            _secs("__ts") - _secs("__mts")
            if direction == "backward"
            else _secs("__mts") - _secs("__ts")
        )
        in_tol = gap <= F.lit(float(tolerance_seconds))
    else:
        in_tol = F.lit(True)
    keep = F.col("__mts").isNotNull() & in_tol
    return filled.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.when(keep, F.col("__mts")).alias(f"{left_ts}{suffix}"),
        *[
            F.when(keep, F.col(f"__m_{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
    order_col: str | None = None,
) -> DataFrame:
    """Resample each key's series onto a regular ``step_seconds`` grid
    (from its first to its last observed bucket), carrying the last
    value forward across empty buckets.

    Bucket value = value of the greatest ``order_col`` row in the bucket
    (a deterministic "last wins"; defaults to the value column itself).
    Returns (key, bucket_start long epoch-seconds, value, filled bool —
    true where the bucket had no observation and the value was carried).
    """
    order_col = order_col or value_col
    step = int(step_seconds)
    b = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast("long")
    per_bucket = (
        df.select(F.col(key).alias("k"), b.alias("b"),
                  F.col(value_col).alias("v"), F.col(order_col).alias("o"))
        .groupBy("k", "b")
        .agg(F.max_by("v", "o").alias("v"))
    )
    grid = (
        per_bucket.groupBy("k")
        .agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
        .select(
            "k",
            F.explode(
                F.sequence(F.col("b0"), F.col("b1"), F.lit(step).cast("long"))
            ).alias("b"),
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, ["k", "b"], "left")
        .select(
            F.col("k").alias(key),
            F.col("b").alias("bucket_start"),
            F.last("v", ignorenulls=True).over(w).alias(value_col),
            F.col("v").isNull().alias("filled"),
        )
    )


def ewma(
    df: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    alpha: float = 0.3,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Exponentially-weighted moving average per key:
    ``y_0 = x_0;  y_i = (1−α)·y_{i−1} + α·x_i`` in ``order_cols`` order —
    the classic smoothing derived-stream (the same family as the
    reference's derive operators, datastream.backends.mongodb derive
    ``sum``/``derivative`` §2.5, which are likewise per-stream
    incremental recurrences).

    A first-order linear recurrence has no shuffle-free closed form that
    is numerically safe (the (1−α)^{-j} prefix-product overflows for
    long series), so the key is the parallelism unit: one Arrow batch
    per key via applyInPandas, everything around it declarative. At
    100 TB keys are streams — millions of independent, individually
    bounded groups. The recurrence is evaluated with the explicit
    ``(1−α)·y + α·x`` expression shape so an external oracle replaying
    the same recurrence (e.g. a recursive CTE) is bit-identical.
    Returns (key, *order_cols, value, ewma).
    """
    import pandas as pd

    beta = 1.0 - alpha
    cols = [key, *[c for c in order_cols if c != key], value_col]
    base = df.select(*dict.fromkeys(cols))
    fields = {f.name: f.dataType.simpleString() for f in base.schema}
    out_schema = ", ".join(
        [f"{n} {t}" for n, t in fields.items()] + ["ewma double"]
    )
    ocols = list(order_cols)

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ocols, kind="mergesort").reset_index(drop=True)
        xs = pdf[value_col].to_numpy(dtype="float64")
        ys = xs.copy()
        for i in range(1, len(ys)):
            ys[i] = beta * ys[i - 1] + alpha * xs[i]
        pdf["ewma"] = ys
        return pdf

    return base.groupBy(key).applyInPandas(_ewma, out_schema)


def detect_gaps(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    min_gap_seconds: int = 28_800,
    order_col: str = "event_id",
) -> DataFrame:
    """Find silences: per-key consecutive-event gaps of at least
    ``min_gap_seconds`` — the monitoring query a TSDB runs to detect
    dead sensors / stalled streams (the operational complement of the
    reference's downsample cascade: a bucket that never arrives).

    One lag window per key (single hash shuffle, no self-join); emits
    (key, gap_start_s, gap_end_s, gap_seconds) per gap. At 100 TB this
    is the same shape as every derive operator: shuffle by stream key,
    sort within, one pass."""
    w = Window.partitionBy(key).orderBy(ts_col, order_col)
    e = F.unix_timestamp(ts_col)
    prev = F.lag(e).over(w)
    return (
        df.select(
            F.col(key),
            prev.alias("gap_start_s"),
            e.alias("gap_end_s"),
            (e - prev).alias("gap_seconds"),
        )
        .filter(F.col("gap_seconds") >= F.lit(min_gap_seconds))
    )


def build_profile(
    df: DataFrame,
    keys: tuple[str, ...],
    value_col: str = "value",
) -> DataFrame:
    """Baseline profile per key tuple: mean + population σ from the
    explicit (s, q, c) formula (engine-portable, merge-law-safe).
    Output is |key-domain| rows — broadcastable at any corpus size."""
    v = F.col(value_col)
    s, c, q = F.sum(v), F.count(v), F.sum(v * v)
    return (
        df.filter(v.isNotNull())
        .groupBy(*keys)
        .agg((s / c).alias("m"), F.sqrt((q - s * s / c) / c).alias("sd"))
    )


def score_against_profile(
    df: DataFrame,
    profile: DataFrame,
    keys: tuple[str, ...],
    value_col: str = "value",
    n_sigma: float = 2.0,
) -> DataFrame:
    """Flag rows deviating more than ``n_sigma``·σ from their key's
    profile mean. ONE definition serves batch and streaming: with a
    static ``profile`` and a streaming ``df`` this is a stream-static
    broadcast join + row-local flag — no state store, no second
    codebase for the online path (the lambda-architecture seam without
    the lambda)."""
    j = df.join(F.broadcast(profile), on=list(keys), how="left")
    flag = (
        F.abs(F.col(value_col) - F.col("m"))
        > F.lit(float(n_sigma)) * F.col("sd")
    )
    return j.withColumn("is_anomaly", F.coalesce(flag, F.lit(False)))


def range_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Interval-overlap equi-key join (the range join Spark lacks
    natively; Databricks exposes it as a RANGE_JOIN hint, Postgres as
    && on ranges — reference queries over validity windows need it).

    Pairs (l, r) sharing ``keys`` whose HALF-OPEN day intervals
    [l_start, l_end) and [r_start, r_end) overlap
    (``l_start < r_end AND r_start < l_end``).

    Scale shape — never a non-equi shuffle and never a per-key
    cross join:

    1. each side explodes its interval into the ``bucket_days``-wide
       day buckets it covers (fan-out = ⌈len/bucket⌉, bounded by the
       interval length — choose bucket ≈ median interval length);
    2. candidates come from ONE hash equi-join on (keys…, bucket) —
       co-partitioned, AQE-skew-splittable like any equi-join;
    3. the exact overlap predicate filters candidates, and each
       overlapping pair is kept EXACTLY ONCE — only in the bucket
       containing ``greatest(l_start, r_start)`` (the "stab" bucket:
       both sides provably cover it, and it is unique per pair) — so
       no distinct/dedup pass is ever needed.

    Columns: all left columns + all right columns except ``keys``
    (right's start/end stay, callers may rename beforehand to avoid
    collisions). Date columns; for timestamps pass pre-truncated day
    columns alongside and filter on the exact bounds afterwards.
    """
    if bucket_days <= 0:
        raise ValueError("bucket_days must be positive")
    epoch = F.lit("1970-01-01").cast("date")

    def day(c):
        return F.datediff(F.col(c), epoch)

    def with_buckets(df, s, e):
        # half-open [s, e): last covered day is e-1; empty intervals
        # (e <= s) produce no buckets and therefore no candidates
        return df.filter(F.col(e) > F.col(s)).withColumn(
            "_b",
            F.explode(
                F.sequence(
                    (day(s) / bucket_days).cast("long"),
                    ((day(e) - 1) / bucket_days).cast("long"),
                )
            ),
        )

    lb = with_buckets(left, l_start, l_end)
    rb = with_buckets(right, r_start, r_end)
    joined = lb.join(rb, on=[*keys, "_b"])
    overlap = (F.col(l_start) < F.col(r_end)) & (
        F.col(r_start) < F.col(l_end)
    )
    stab = F.col("_b") == (
        F.datediff(F.greatest(F.col(l_start), F.col(r_start)), epoch)
        / bucket_days
    ).cast("long")
    return joined.filter(overlap & stab).drop("_b")
