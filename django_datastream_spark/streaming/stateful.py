"""Custom stateful streaming operators (SURVEY §2.8 T4 — the
applyInPandasWithState surface, beyond what windowed aggregation covers).

Reference parity note: the reference has no session concept (its only
stateful behavior is downsample watermarks, SURVEY T2–T4); sessionization
is part of the engine's windowing EXTENSION surface (batch form: Q43).
This module is the true Structured Streaming form: per-stream session
state lives in the state store, sessions close either data-driven (a gap
larger than ``gap_s`` arrives) or by event-time timeout once the
watermark passes the open session's gap horizon.

Scale shape: state is one tiny tuple per stream (not per session), keyed
by stream_id — the state store shards across executors with the shuffle,
and each micro-batch touches only streams with new data plus timed-out
groups. No driver-side anything.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

#: state: session_start_us, last_ts_us, n_points, value_sum
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("vsum", T.DoubleType()),
    ]
)


def _make_session_fn(gap_s: int):
    """Build the per-group state function. Captures only ``gap_s`` (a
    plain int) so the closure is executor-safe without this package on
    PYTHONPATH."""
    import pandas as pd  # re-import inside closure for executor safety

    gap_us = gap_s * 1_000_000

    def fn(
        key: Tuple[str], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            closed.append((start_us, last_us, n, vsum))
            state.remove()
        else:
            cur = state.get if state.exists else None
            rows = []
            for pdf in pdf_iter:
                for ts, v in zip(pdf["ts"], pdf["value"]):
                    rows.append((int(ts.value // 1000), float(v)))
            rows.sort()
            for ts_us, v in rows:
                if cur is not None and ts_us - cur[1] > gap_us:
                    closed.append(cur)
                    cur = None
                if cur is None:
                    cur = (ts_us, ts_us, 1, v)
                else:
                    cur = (cur[0], max(cur[1], ts_us), cur[2] + 1, cur[3] + v)
            if cur is not None:
                state.update(cur)
                # close by timeout once the watermark passes the horizon
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "stream_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_points": [c[2] for c in closed],
                    "value_sum": [c[3] for c in closed],
                }
            )

    return fn


def stateful_sessionize(
    source: DataFrame, gap_s: int = 30, lateness: str | None = None
) -> DataFrame:
    """Session windows with inactivity gap ``gap_s`` over a streaming
    (stream_id, ts, value) DataFrame — `applyInPandasWithState` with
    event-time timeout. Emits one row per CLOSED session; the open tail
    session stays in the state store until a later batch's watermark (or
    a gap-exceeding point) closes it.

    The watermark is GLOBAL across every stream in the source, but
    streams pace independently: rows of a stream lagging more than
    ``lateness`` behind the fastest stream's event time are dropped as
    late and its sessions silently lost. ``lateness`` must therefore
    cover the worst expected inter-stream skew. Default: ``2 * gap_s``
    seconds — nonzero so moderate skew is survivable out of the box;
    raise it for sources with badly skewed producers (cost: session
    timeouts close later, state lives longer).
    """
    if lateness is None:
        lateness = f"{2 * gap_s} seconds"
    return (
        source.select("stream_id", "ts", "value")
        .withWatermark("ts", lateness)
        .groupBy("stream_id")
        .applyInPandasWithState(
            _make_session_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _make_ewma_fn(alpha: float):
    """Per-group online EWMA. Captures only ``alpha`` (a float) so the
    closure is executor-safe without this package on PYTHONPATH."""
    import pandas as pd  # re-import inside closure for executor safety

    def fn(
        key: Tuple[str], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            state.remove()
            return
        last_us, ewma, n = state.get if state.exists else (-1, 0.0, 0)
        rows = []
        for pdf in pdf_iter:
            for ts, v in zip(pdf["ts"], pdf["value"]):
                rows.append((int(ts.value // 1000), float(v)))
        rows.sort()
        out_ts, out_v, out_e = [], [], []
        for ts_us, v in rows:
            ewma = v if n == 0 else alpha * v + (1.0 - alpha) * ewma
            n += 1
            last_us = ts_us
            out_ts.append(pd.Timestamp(ts_us, unit="us"))
            out_v.append(v)
            out_e.append(ewma)
        if rows:
            state.update((last_us, ewma, n))
            yield pd.DataFrame(
                {
                    "stream_id": [key[0]] * len(rows),
                    "ts": out_ts,
                    "value": out_v,
                    "ewma": out_e,
                }
            )

    return fn


def stateful_ewma(
    source: DataFrame, alpha: float = 0.3, lateness: str = "0 seconds"
) -> DataFrame:
    """Online per-stream EWMA over a stream — the streaming twin of the
    batch operator (operators/timeseries.ewma, q69): each point emits
    immediately with the smoothed value, and the recurrence state (one
    tuple per stream — last ts, current ewma, count) carries across
    micro-batches and restarts via the state store. Within a batch,
    rows apply in (ts) order regardless of arrival order; across
    batches, ordering holds whenever the watermark does (late rows
    beyond ``lateness`` are dropped, same policy as sessionize).

    State size is O(streams) — three scalars each — so this runs
    forever at any stream count; contrast with the batch form, which
    needs the full history (or a checkpoint) to resume exactly.
    """
    return (
        source.select("stream_id", "ts", "value")
        .withWatermark("ts", lateness)
        .groupBy("stream_id")
        .applyInPandasWithState(
            _make_ewma_fn(alpha),
            outputStructType=EWMA_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Running per-key aggregates whose state genuinely SURVIVES micro-batch
# boundaries (the cross-batch continuation q162 hash-matches to batch SQL).
#
# API note: Spark 4's successor surface, transformWithStateInPandas
# (typed value/list/map state, TTL, timers), exists in this PySpark but
# its Python state-server protocol needs the `protobuf` package, which
# this container does not ship (verified: the worker dies with
# "cannot import name 'descriptor' from 'google.protobuf'").  The
# operator is therefore pinned on the stable applyInPandasWithState
# API, whose GroupState carries the identical per-key state contract;
# swapping to TWS later changes only the handler registration, not the
# operator semantics.
# ---------------------------------------------------------------------------

RUNNING_SCHEMA = (
    "user_id long, event_id long, seq_no long, running_value double"
)

_RUNNING_STATE = "n long, total double"


def _running_fn(
    key, pdf_iter, state: GroupState
):
    """Per-user handler: continue (row count, value sum) from GroupState,
    emit one output row per input event.  Rows within a batch are
    ordered by (ts, event_id) IN the handler: the engine hands each
    key's batch rows unordered, and a running aggregate is only
    well-defined under a total order, so imposing it here is part of
    the operator, not a test convenience."""
    import pandas as pd  # executor-safe

    n0, t0 = state.get if state.exists else (0, 0.0)
    # CONCAT FIRST, sort once: a key with more rows than the Arrow
    # batch size arrives as SEVERAL chunks in engine order — sorting
    # per chunk would interleave seq_no/cumsum across out-of-order
    # chunks and silently diverge from the batch-window oracle
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        state.update((n0, t0))
        return iter(())
    pdf = pd.concat(chunks, ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    run = pdf["value"].cumsum() + t0
    out = pd.DataFrame(
        {
            "user_id": int(key[0]),
            "event_id": pdf["event_id"].to_numpy(),
            "seq_no": n0 + 1 + pd.RangeIndex(len(pdf)).to_numpy(),
            "running_value": run.to_numpy(),
        }
    )
    state.update((n0 + len(pdf), float(run.iloc[-1])))
    return iter([out])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (seq_no, value sum) over an event stream —
    arbitrary stateful processing with one tiny (long, double) state
    row per user in the sharded state store; each micro-batch touches
    only users with new rows; work is Arrow-batched pandas per
    key-batch.  The batch-mode oracle is a plain SQL window
    (SUM() OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED
    PRECEDING)), so a MULTI-batch streaming replay can be hash-matched
    against batch SQL — the state handoff between batches is exactly
    what the equivalence proves (q162)."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_fn,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_RUNNING_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
