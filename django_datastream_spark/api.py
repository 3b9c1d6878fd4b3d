"""The Datastream facade — reference-API-compatible entry points
(SURVEY §2.1 S1–S8, §3) over the Spark tables of storage.py.

Reference surface (`«ds»/datastream/api.py class Datastream` — §0 caveat):
``ensure_stream / find_streams / append / append_multiple / get_data /
delete_streams / downsample_streams / backprocess_streams``.

Spark-first design decisions (vs the reference's per-stream loops):

- Streams are ROWS in a metadata table, never Python objects holding data.
- ``append_multiple`` is the native path (micro-batch); ``append`` wraps it.
- Monotonicity validation (SURVEY T1) is a join against ``latest_ts`` +
  a within-batch window — one Spark job per batch, not per point.
- Derived streams are *computed views* over their sources (lag windows /
  bucket aggs, operators/derive.py): ``get_data`` and ``downsample_streams``
  materialize them on demand. The reference maintains them eagerly on
  append; observable datapoints are identical (FIXTURES B3.4), and the
  view form is idiomatic Spark (Phase 2 adds incremental materialization).
- ``downsample_streams`` is a 6-level aggregation cascade where each level
  merges the previous level's algebraic partials — raw data is scanned
  once (operators/downsample.py).
"""

from __future__ import annotations

import datetime as _dt
import json
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import exceptions as exc
from .granularity import BY_NAME, GRANULARITIES, Granularity
from .operators import derive as derive_ops
from .operators import downsample as ds_ops
from .storage import Tables

_UTC = _dt.timezone.utc


def _now() -> _dt.datetime:
    return _dt.datetime.now(tz=_UTC).replace(microsecond=0)


def _flatten_tags(tags: dict, prefix: str = "") -> dict[str, object]:
    out: dict[str, object] = {}
    for k, v in tags.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tags(v, path))
        else:
            out[path] = v
    return out


class Datapoints:
    """Lazy result of get_data — reference-shaped iteration
    (each item ``{'t': ..., 'v': ...}``) plus the underlying DataFrame."""

    def __init__(self, df: DataFrame, raw: bool, reverse: bool, nominal: bool = False):
        self.df = df
        self._raw = raw
        self._reverse = reverse
        self._nominal = nominal

    def __iter__(self):
        for row in self.df.toLocalIterator():
            d = row.asDict(recursive=True)
            if self._raw:
                v = d["value"]
                if self._nominal and isinstance(v, str):
                    v = json.loads(v)
                yield {"t": d["ts"], "v": v}
            else:
                v = d.get("v") or {}
                t = d.get("t") or {}
                yield {
                    "t": {k: x for k, x in t.items() if x is not None} or d["bucket_ts"],
                    "v": {k: x for k, x in v.items() if x is not None},
                    "bucket": d["bucket_ts"],
                }

    def __len__(self) -> int:
        return self.df.count()


class Datastream:
    """Engine facade over one storage root."""

    VALUE_TYPES = ("numeric", "nominal", "graph")
    DERIVE_OPERATORS = ("sum", "derivative", "counter_reset", "counter_derivative")

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.tables = Tables(spark, root)

    # ------------------------------------------------------------------
    # stream discovery / creation (S4, ensure_stream)
    # ------------------------------------------------------------------
    def _streams(self) -> DataFrame:
        return self.tables.read_streams()

    def _match(self, streams: DataFrame, query_tags: dict | None) -> DataFrame:
        if not query_tags:
            return streams
        cond = F.lit(True)
        for path, val in _flatten_tags(query_tags).items():
            jp = "$." + path
            expected = val if isinstance(val, str) else json.dumps(val)
            cond = cond & (F.get_json_object("tags", jp) == F.lit(str(expected)))
        return streams.filter(cond)

    def find_streams(self, query_tags: dict | None = None) -> list[dict]:
        rows = self._match(self._streams(), query_tags).collect()
        out = []
        for r in rows:
            d = r.asDict(recursive=True)
            d["tags"] = json.loads(d["tags"]) if d["tags"] else {}
            out.append(d)
        return sorted(out, key=lambda d: d["stream_id"])

    def ensure_stream(
        self,
        query_tags: dict,
        tags: dict | None = None,
        value_downsamplers: list[str] | None = None,
        highest_granularity: str | Granularity = "seconds",
        *,
        value_type: str = "numeric",
        time_downsamplers: list[str] | None = None,
        derive_from: list[str] | None = None,
        derive_op: str | None = None,
        derive_args: dict | None = None,
    ) -> str:
        """Create-or-get a stream identified by ``query_tags`` (S4/§1.1).
        Idempotent; conflicting respecification raises
        InconsistentStreamConfiguration."""
        if value_type not in self.VALUE_TYPES:
            raise exc.UnsupportedValueType(value_type)
        if derive_op is not None and derive_op not in self.DERIVE_OPERATORS:
            raise exc.DatastreamError(f"unknown derive operator: {derive_op}")
        gran = (
            highest_granularity
            if isinstance(highest_granularity, Granularity)
            else BY_NAME[highest_granularity]
        )
        if value_type == "numeric":
            default_v = list(ds_ops.NUMERIC_DOWNSAMPLERS)
        elif value_type == "nominal":
            default_v = list(ds_ops.NOMINAL_DOWNSAMPLERS)
        else:
            default_v = list(ds_ops.GRAPH_DOWNSAMPLERS)
        v_ds = list(value_downsamplers) if value_downsamplers is not None else default_v
        t_ds = (
            list(time_downsamplers)
            if time_downsamplers is not None
            else list(ds_ops.TIME_DOWNSAMPLERS)
        )
        unknown = set(v_ds) - set(default_v)
        if unknown:
            raise exc.UnsupportedDownsampler(sorted(unknown))

        existing = self._match(self._streams(), query_tags).collect()
        if len(existing) > 1:
            raise exc.MultipleStreamsReturned(query_tags)
        if existing:
            row = existing[0]
            if (
                row["value_type"] != value_type
                or row["highest_granularity"] != gran.name
                or sorted(row["value_downsamplers"]) != sorted(v_ds)
                or (row["derive_op"] or None) != derive_op
            ):
                raise exc.InconsistentStreamConfiguration(query_tags)
            return row["stream_id"]

        merged_tags = dict(query_tags)
        if tags:
            merged_tags.update(tags)
        stream_id = uuid.uuid4().hex
        new_row = {
            "stream_id": stream_id,
            "value_type": value_type,
            "highest_granularity": gran.name,
            "value_downsamplers": v_ds,
            "time_downsamplers": t_ds,
            "derived_from": list(derive_from) if derive_from else None,
            "derive_op": derive_op,
            "derive_args": json.dumps(derive_args) if derive_args else None,
            "tags": json.dumps(merged_tags, sort_keys=True),
            "earliest_ts": None,
            "latest_ts": None,
            "downsampled_until": None,
        }
        streams = self._streams().unionByName(
            self.spark.createDataFrame([new_row], self.tables.read_streams().schema)
        )
        self.tables.write_streams(streams)
        return stream_id

    def _get_stream(self, stream_id: str) -> dict:
        rows = self._streams().filter(F.col("stream_id") == stream_id).collect()
        if not rows:
            raise exc.StreamNotFound(stream_id)
        return rows[0].asDict(recursive=True)

    # ------------------------------------------------------------------
    # ingest (S1 append, S2 append_multiple)
    # ------------------------------------------------------------------
    def append(
        self,
        stream_id: str,
        value,
        timestamp: _dt.datetime | None = None,
        check_timestamp: bool = True,
    ) -> None:
        self.append_multiple(
            [{"stream_id": stream_id, "value": value, "timestamp": timestamp}],
            check_timestamp=check_timestamp,
        )

    def append_multiple(
        self, datapoints: list[dict], check_timestamp: bool = True
    ) -> None:
        """Batch ingest across streams — the Spark-native path (micro-batch).

        Validates stream existence, derived-stream protection, value types
        and (optionally) per-stream timestamp monotonicity, then appends to
        points_raw and advances earliest/latest_ts — all as bulk operations.
        """
        if not datapoints:
            return
        streams = {s["stream_id"]: s for s in self.find_streams(None)}
        rows = []
        for dp in datapoints:
            sid = dp["stream_id"]
            meta = streams.get(sid)
            if meta is None:
                raise exc.StreamNotFound(sid)
            if meta["derive_op"]:
                raise exc.AppendToDerivedStreamNotAllowed(sid)
            ts = dp.get("timestamp") or _now()
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_UTC)
            value = dp["value"]
            vt = meta["value_type"]
            row = {
                "stream_id": sid,
                "ts": ts,
                "seq": None,  # assigned below
                "value": None,
                "value_nominal": None,
                "value_graph": None,
            }
            if vt == "numeric":
                if value is not None and not isinstance(value, (int, float)):
                    raise exc.UnsupportedValueType(
                        f"numeric stream {sid} got {type(value).__name__}"
                    )
                row["value"] = float(value) if value is not None else None
            elif vt == "nominal":
                row["value_nominal"] = json.dumps(value, sort_keys=True)
            else:  # graph
                if not isinstance(value, dict) or "v" not in value or "e" not in value:
                    raise exc.UnsupportedValueType(
                        f"graph stream {sid} expects {{'v': [...], 'e': [...]}}"
                    )
                row["value_graph"] = {
                    "v": [{"i": str(x["i"])} for x in value.get("v", [])],
                    "e": [
                        {"f": str(x["f"]), "t": str(x["t"])}
                        for x in value.get("e", [])
                    ],
                }
            rows.append(row)

        # insertion sequence: time-based base + in-batch offset (unique,
        # increasing across batches without any coordination point)
        import time as _time

        base = _time.time_ns()
        for i, row in enumerate(rows):
            row["seq"] = base + i

        batch = self.spark.createDataFrame(
            rows, self.tables.read_points_raw().drop("p_date").schema
        )

        if check_timestamp:
            # per-stream strict monotonicity: within-batch (lag window) and
            # vs the stored latest_ts (broadcast join) — one job, no loops.
            w = Window.partitionBy("stream_id").orderBy("ts")
            latest = self.spark.createDataFrame(
                [
                    (sid, m["latest_ts"])
                    for sid, m in streams.items()
                    if m["latest_ts"] is not None
                ]
                or [("__none__", _now())],
                "stream_id string, latest_ts timestamp",
            )
            bad = (
                batch.withColumn("_prev", F.lag("ts").over(w))
                .join(F.broadcast(latest), "stream_id", "left")
                .filter(
                    (F.col("ts") <= F.col("latest_ts"))
                    | (F.col("ts") <= F.col("_prev"))
                )
                .limit(1)
                .collect()
            )
            if bad:
                raise exc.InvalidTimestamp(
                    f"stream {bad[0]['stream_id']}: ts {bad[0]['ts']} is not "
                    "strictly after the previous datapoint"
                )

        self.tables.append_points_raw(batch)

        # advance earliest/latest in metadata (small table, snapshot write)
        bounds = {
            r["stream_id"]: (r["mn"], r["mx"])
            for r in batch.groupBy("stream_id")
            .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
            .collect()
        }
        updated = []
        for s in streams.values():
            if s["stream_id"] in bounds:
                mn, mx = bounds[s["stream_id"]]
                s = dict(s)
                s["earliest_ts"] = (
                    mn if s["earliest_ts"] is None else min(s["earliest_ts"], mn)
                )
                s["latest_ts"] = (
                    mx if s["latest_ts"] is None else max(s["latest_ts"], mx)
                )
            updated.append(s)
        self._write_streams_dicts(updated)

    def _write_streams_dicts(self, dicts: list[dict]) -> None:
        rows = []
        for d in dicts:
            d = dict(d)
            d["tags"] = (
                json.dumps(d["tags"], sort_keys=True)
                if isinstance(d["tags"], dict)
                else d["tags"]
            )
            rows.append(d)
        df = self.spark.createDataFrame(rows, self.tables.read_streams().schema)
        self.tables.write_streams(df)

    # ------------------------------------------------------------------
    # derived streams as computed views (W1–W4)
    # ------------------------------------------------------------------
    def _derived_points(
        self, streams: list[dict], exclude_materialized: bool = False
    ) -> DataFrame | None:
        derived = [s for s in streams if s.get("derive_op")]
        if exclude_materialized and derived:
            mat = {
                r["stream_id"]
                for r in self.tables.read_points_raw()
                .filter(F.col("stream_id").isin([s["stream_id"] for s in derived]))
                .select("stream_id")
                .distinct()
                .collect()
            }
            derived = [s for s in derived if s["stream_id"] not in mat]
        if not derived:
            return None
        raw = self.tables.read_points_raw().select("stream_id", "ts", "value")
        return derive_ops.build_derive_plan(derived, raw)

    def backprocess_streams(self, query_tags: dict | None = None) -> DataFrame | None:
        """Recompute derived-stream datapoints (reference: backfill job).
        Returns the derived (stream_id, ts, value) rows."""
        return self._derived_points(self.find_streams(query_tags))

    # ------------------------------------------------------------------
    # query (S3 get_data)
    # ------------------------------------------------------------------
    def get_data(
        self,
        stream_id: str,
        granularity: str | Granularity,
        start: _dt.datetime | None = None,
        end: _dt.datetime | None = None,
        start_exclusive: _dt.datetime | None = None,
        end_exclusive: _dt.datetime | None = None,
        reverse: bool = False,
        value_downsamplers: list[str] | None = None,
        time_downsamplers: list[str] | None = None,
    ) -> Datapoints:
        if start is not None and start_exclusive is not None:
            raise ValueError("start and start_exclusive are mutually exclusive")
        if end is not None and end_exclusive is not None:
            raise ValueError("end and end_exclusive are mutually exclusive")
        meta = self._get_stream(stream_id)
        gran = (
            granularity
            if isinstance(granularity, Granularity)
            else BY_NAME[granularity]
        )
        highest = BY_NAME[meta["highest_granularity"]]
        if gran.duration_s < highest.duration_s:
            raise exc.UnsupportedGranularity(
                f"{gran.name} is finer than highest granularity {highest.name}"
            )

        if gran.name == highest.name:
            if meta["derive_op"]:
                # materialized-first: the streaming path appends derived
                # points into points_raw incrementally; fall back to the
                # computed view when nothing is materialized (batch mode).
                mat = self.tables.read_points_raw().filter(
                    F.col("stream_id") == stream_id
                )
                if mat.head(1):
                    df = mat
                else:
                    pts = self._derived_points([meta])
                    df = pts.filter(F.col("stream_id") == stream_id)
            else:
                df = self.tables.read_points_raw().filter(
                    F.col("stream_id") == stream_id
                )
            ts_col, raw = "ts", True
            if meta["value_type"] == "nominal":
                df = df.withColumn("value", F.col("value_nominal"))
            elif meta["value_type"] == "graph":
                df = df.withColumn("value", F.col("value_graph"))
        else:
            df = self.tables.read_points_agg().filter(
                (F.col("stream_id") == stream_id)
                & (F.col("granularity") == gran.name)
            )
            ts_col, raw = "bucket_ts", False
            v_keys = value_downsamplers or meta["value_downsamplers"]
            bad = set(v_keys) - set(meta["value_downsamplers"])
            if bad:
                raise exc.UnsupportedDownsampler(sorted(bad))
            t_keys = time_downsamplers or meta["time_downsamplers"]
            bad_t = set(t_keys) - set(meta["time_downsamplers"])
            if bad_t:
                raise exc.UnsupportedDownsampler(sorted(bad_t))
            # struct-field projection → parquet nested-schema pruning (P1/P2)
            df = df.select(
                "stream_id",
                "bucket_ts",
                F.struct(*[F.col(f"v.{k}").alias(k) for k in v_keys]).alias("v"),
                F.struct(*[F.col(f"t.{k}").alias(k) for k in t_keys]).alias("t"),
            )

        c = F.col(ts_col)
        if start is not None:
            df = df.filter(c >= F.lit(start))
        if start_exclusive is not None:
            df = df.filter(c > F.lit(start_exclusive))
        if end is not None:
            df = df.filter(c <= F.lit(end))
        if end_exclusive is not None:
            df = df.filter(c < F.lit(end_exclusive))
        order = [c, F.col("seq")] if (raw and "seq" in df.columns) else [c]
        if reverse:
            order = [o.desc() for o in order]
        df = df.orderBy(*order)
        return Datapoints(
            df, raw=raw, reverse=reverse, nominal=meta["value_type"] == "nominal"
        )

    # ------------------------------------------------------------------
    # delete (S5)
    # ------------------------------------------------------------------
    def delete_streams(self, query_tags: dict | None = None) -> int:
        streams = self.find_streams(None)
        targets = {s["stream_id"] for s in self.find_streams(query_tags)}
        if not targets:
            return 0
        for s in streams:
            if s["stream_id"] in targets:
                continue
            deps = set(s.get("derived_from") or [])
            if deps & targets:
                raise exc.OutstandingDependenciesError(
                    f"stream {s['stream_id']} derives from {sorted(deps & targets)}"
                )
        remaining = [s for s in streams if s["stream_id"] not in targets]
        self._write_streams_dicts(remaining)
        # datapoints of deleted streams become unreachable (metadata is the
        # source of truth); vacuum() reclaims the storage at leisure.
        return len(targets)

    def vacuum(self) -> None:
        """Physically drop datapoints of deleted streams (the deferred half
        of S5). Rewrite-and-swap per table; on Delta/Iceberg this becomes a
        plain DELETE + OPTIMIZE."""
        import shutil

        live = [s["stream_id"] for s in self.find_streams(None)]
        for path, part_cols in (
            (self.tables.points_raw_path, ["p_date"]),
            (self.tables.points_agg_path, ["granularity"]),
        ):
            if not self.tables._exists(path):
                continue
            df = self.spark.read.parquet(path).filter(F.col("stream_id").isin(live))
            tmp = path + "__vacuum"
            df.write.mode("overwrite").partitionBy(*part_cols).parquet(tmp)
            shutil.rmtree(path)
            shutil.move(tmp, path)

    # ------------------------------------------------------------------
    # downsampling (A14, §3.3) — hierarchical cascade
    # ------------------------------------------------------------------
    def downsample_streams(
        self,
        query_tags: dict | None = None,
        until: _dt.datetime | None = None,
        return_datapoints: bool = False,
    ):
        """Materialize completed buckets for every granularity coarser than
        each stream's highest granularity, incrementally past each stream's
        ``downsampled_until`` watermark.

        Level k is computed from level k−1's aggregates (algebraic merge);
        only streams whose highest granularity IS level k−1 read raw points
        at level k. Raw data is therefore scanned once per run.
        """
        all_streams = self.find_streams(None)
        selected = (
            {s["stream_id"] for s in self.find_streams(query_tags)}
            if query_tags
            else {s["stream_id"] for s in all_streams}
        )
        until = until or _now()
        if until.tzinfo is None:
            until = until.replace(tzinfo=_UTC)
        until_epoch = int(until.timestamp())

        raw = self.tables.read_points_raw().select(
            "stream_id", "ts", "value", "value_nominal"
        )
        # incremental scan bound: every bucket starting before a stream's
        # watermark is already materialized, and appends are monotonic, so
        # raw data older than the stream's COARSEST watermark (the smallest
        # — a new `days` bucket may straddle the finer watermarks) can be
        # skipped. The global min across selected streams is a conservative
        # single filter that reaches the parquet scan and prunes p_date
        # partitions — incremental runs scan at most ~1 coarsest-bucket of
        # history instead of the whole table.
        wms: list[_dt.datetime] = []
        complete = True
        for s in all_streams:
            if s["stream_id"] not in selected:
                continue
            per_g = s.get("downsampled_until") or {}
            applicable = [
                g.name
                for g in GRANULARITIES[1:]
                if g.duration_s > BY_NAME[s["highest_granularity"]].duration_s
            ]
            if not applicable:
                continue
            if not all(g in per_g for g in applicable):
                complete = False
                break
            wms.append(min(per_g[g] for g in applicable))
        if complete and wms:
            low = min(wms)
            if low.tzinfo is None:
                low = low.replace(tzinfo=_UTC)
            raw = raw.filter(F.col("ts") >= F.lit(low))
        # derived streams materialized by the streaming path are already in
        # points_raw; only pure views need computing here
        derived = self._derived_points(all_streams, exclude_materialized=True)
        if derived is not None:
            raw = raw.unionByName(
                derived.withColumn("value_nominal", F.lit(None).cast("string"))
            )

        gran_index = {g.name: i for i, g in enumerate(GRANULARITIES)}
        meta_by_id = {s["stream_id"]: s for s in all_streams}
        emitted = []
        prev_level: DataFrame | None = None

        for i, g in enumerate(GRANULARITIES[1:], start=1):
            # streams downsampled at this level: highest strictly finer,
            # selected by query_tags, and not already past the watermark
            from_raw_ids = [
                sid
                for sid, m in meta_by_id.items()
                if sid in selected and gran_index[m["highest_granularity"]] == i - 1
            ]
            roll_ids = [
                sid
                for sid, m in meta_by_id.items()
                if sid in selected and gran_index[m["highest_granularity"]] < i - 1
            ]
            parts = []
            if from_raw_ids:
                parts.append(
                    ds_ops.downsample_raw(
                        raw.filter(F.col("stream_id").isin(from_raw_ids)),
                        g,
                        until_epoch,
                    )
                )
            if roll_ids and prev_level is not None:
                parts.append(
                    ds_ops.rollup_agg(
                        prev_level.filter(F.col("stream_id").isin(roll_ids)),
                        g,
                        until_epoch,
                    )
                )
            if not parts:
                prev_level = None
                continue
            level = parts[0]
            for p in parts[1:]:
                level = p.unionByName(level)
            # keep the full level for the next rollup; persist only buckets
            # past each stream's watermark
            level = level.persist()
            watermarks = self.spark.createDataFrame(
                [
                    (
                        sid,
                        (meta_by_id[sid].get("downsampled_until") or {}).get(g.name),
                    )
                    for sid in set(from_raw_ids) | set(roll_ids)
                ],
                "stream_id string, _wm timestamp",
            )
            new_rows = level.join(F.broadcast(watermarks), "stream_id", "left").filter(
                F.col("_wm").isNull() | (F.col("bucket_ts") >= F.col("_wm"))
            )
            # idempotence: a re-run with the same until re-emits the same
            # buckets; drop rows already materialized for (stream, g, bucket)
            existing = (
                self.tables.read_points_agg()
                .filter(F.col("granularity") == g.name)
                .select("stream_id", "bucket_ts")
            )
            new_rows = new_rows.join(
                existing, ["stream_id", "bucket_ts"], "left_anti"
            ).drop("_wm")
            self.tables.append_points_agg(new_rows)
            if return_datapoints:
                emitted.append(new_rows)
            prev_level = level

            # advance watermarks: first incomplete bucket start
            wm_ts = _dt.datetime.fromtimestamp(
                (until_epoch // g.duration_s) * g.duration_s, tz=_UTC
            )
            for sid in set(from_raw_ids) | set(roll_ids):
                m = meta_by_id[sid]
                wm = dict(m.get("downsampled_until") or {})
                wm[g.name] = wm_ts
                m["downsampled_until"] = wm

        self._write_streams_dicts(list(meta_by_id.values()))
        if return_datapoints:
            if not emitted:
                return None
            out = emitted[0]
            for e in emitted[1:]:
                out = out.unionByName(e)
            return out
        return None
