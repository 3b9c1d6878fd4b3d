"""The reference's 7 granularities + epoch-aligned bucket rounding.

Reference: `«ds»/datastream/api.py:~100 class Granularity` (SURVEY.md §1.1):
Seconds, Seconds10, Minutes, Minutes10, Hours, Hours6, Days — ordered
finest→coarsest, each with ``round_timestamp`` flooring a timestamp to the
bucket start. All are fixed multiples of a second and epoch-aligned
(``Days`` == UTC midnight), so the Spark expression is plain integer math
on epoch seconds — `floor(unix_ts / dur) * dur` — NOT calendar
`window()`, which drags in month/DST machinery we don't need (SURVEY §4).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Granularity:
    name: str
    duration_s: int  # bucket width in seconds

    def round_timestamp(self, ts: _dt.datetime) -> _dt.datetime:
        """Python-side reference implementation (property-test oracle)."""
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        epoch = int(ts.timestamp())
        floored = (epoch // self.duration_s) * self.duration_s
        return _dt.datetime.fromtimestamp(floored, tz=_dt.timezone.utc)

    def bucket_col(self, ts: Column | str) -> Column:
        """Bucket start as TIMESTAMP — epoch-aligned tumbling window."""
        c = F.col(ts) if isinstance(ts, str) else ts
        d = self.duration_s
        if d == 1:
            # already second-precision floor
            return F.timestamp_seconds(F.unix_timestamp(c))
        # floor (not cast-truncation) so pre-1970 timestamps agree with
        # bucket_epoch_col and the Python round_timestamp oracle
        return F.timestamp_seconds(F.floor(F.unix_timestamp(c) / d) * d)

    def bucket_epoch_col(self, ts: Column | str) -> Column:
        """Bucket start as BIGINT epoch seconds (oracle spelling of Q25)."""
        c = F.col(ts) if isinstance(ts, str) else ts
        d = self.duration_s
        e = F.unix_timestamp(c)
        if d == 1:
            return e
        return F.floor(e / d).cast("long") * d

    def bucket_end(self, bucket_start: Column) -> Column:
        return F.timestamp_seconds(F.unix_timestamp(bucket_start) + self.duration_s)


SECONDS = Granularity("seconds", 1)
SECONDS10 = Granularity("seconds10", 10)
MINUTES = Granularity("minutes", 60)
MINUTES10 = Granularity("minutes10", 600)
HOURS = Granularity("hours", 3600)
HOURS6 = Granularity("hours6", 21600)
DAYS = Granularity("days", 86400)

#: finest → coarsest (reference order)
GRANULARITIES: tuple[Granularity, ...] = (
    SECONDS,
    SECONDS10,
    MINUTES,
    MINUTES10,
    HOURS,
    HOURS6,
    DAYS,
)

BY_NAME: dict[str, Granularity] = {g.name: g for g in GRANULARITIES}


def coarser_than(g: Granularity) -> tuple[Granularity, ...]:
    """Granularities strictly coarser than ``g`` (downsample targets)."""
    idx = GRANULARITIES.index(g)
    return GRANULARITIES[idx + 1 :]
