"""Stream-stream joins — correlating two live streams with bounded state.

Joining two unbounded streams requires both sides to buffer rows until
the other side's matching rows can no longer arrive. Structured
Streaming bounds that buffer with (a) a watermark on each side and
(b) an event-time range condition in the join predicate: a buffered
row is dropped once the other side's watermark passes the far end of
its match window. Without BOTH, state grows forever — the classic
stream-join production incident.

State cost: each side keeps ~rate x window rows. At 100 TB/day rates
the window bound is the knob that keeps this running; the key-equality
part shuffles both streams to co-locate keys, exactly like a batch
shuffle join but incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window: str = "10 minutes",
    lateness: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    [left_ts, left_ts + window] — the "response follows stimulus"
    shape (view->click attribution, request->error correlation).

    Both sides get ``lateness`` watermarks; the range predicate lets
    the engine evict buffered rows as the watermarks advance, so state
    is bounded by rate x (window + lateness) per side. Column names
    are disambiguated with l_/r_ prefixes.
    """
    lw = left.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (key, left_ts)
        ],
    ).withWatermark("l_ts", lateness)
    rw = right.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    ).withWatermark("r_ts", lateness)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {window}"))
    )
    return lw.join(rw, cond, how)
