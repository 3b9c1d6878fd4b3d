"""HTTP-layer parity facade (SURVEY §2.1 S6/S7, §2.5 O2, §2.7 serializer).

The reference's Django/tastypie layer (`«dds»/django_datastream/
resources.py StreamResource`, `serializers.py DatastreamSerializer` — §0
caveat) is a thin adapter: parse query params → call the engine → ISO-8601
JSON with limit/offset pagination. This module is that adapter without the
web framework — a host app mounts these functions behind any HTTP server;
the engine contract is what's tested.

Param spellings follow the reference's documented query string:
``granularity/g, start/s, end/e, reverse/r, value_downsamplers/v,
time_downsamplers/t`` plus tastypie's ``limit/offset``.
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any

from .api import Datastream
from .granularity import BY_NAME

_GRANULARITY_ALIASES = {g: g for g in BY_NAME}
_GRANULARITY_ALIASES.update({g[0]: g for g in ("days", "hours", "minutes", "seconds")})


def _iso(ts: _dt.datetime | None) -> str | None:
    if ts is None:
        return None
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_ts(v: str | None) -> _dt.datetime | None:
    if v is None:
        return None
    try:
        # epoch seconds or ISO-8601 (both accepted by the reference)
        return _dt.datetime.fromtimestamp(float(v), tz=_dt.timezone.utc)
    except ValueError:
        return _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))


def list_streams(
    engine: Datastream,
    query_tags: dict | None = None,
    limit: int = 100,
    offset: int = 0,
) -> dict[str, Any]:
    """GET /api/v1/stream/ — paginated stream list with tag filter."""
    streams = engine.find_streams(query_tags)
    total = len(streams)
    page = streams[offset : offset + limit]
    objects = [
        {
            "stream_id": s["stream_id"],
            "value_type": s["value_type"],
            "highest_granularity": s["highest_granularity"],
            "value_downsamplers": s["value_downsamplers"],
            "time_downsamplers": s["time_downsamplers"],
            "tags": s["tags"],
            "earliest_datapoint": _iso(s["earliest_ts"]),
            "latest_datapoint": _iso(s["latest_ts"]),
        }
        for s in page
    ]
    return {
        "meta": {
            "limit": limit,
            "offset": offset,
            "total_count": total,
            "next": (
                f"?limit={limit}&offset={offset + limit}"
                if offset + limit < total
                else None
            ),
            "previous": (
                f"?limit={limit}&offset={max(0, offset - limit)}"
                if offset > 0
                else None
            ),
        },
        "objects": objects,
    }


def aggregate_streams(
    engine: Datastream,
    query_tags: dict | None = None,
    params: dict[str, str] | None = None,
    limit: int = 100,
    offset: int = 0,
) -> dict[str, Any]:
    """GET /api/v1/aggregate/ — engine extension endpoint over
    ``Datastream.aggregate`` (automatic materialized-aggregate routing).
    Params: ``bucket`` (seconds, required), ``start``/``s``, ``end``/``e``
    (end exclusive, both bucket-aligned), plus ``limit``/``offset``."""
    p = params or {}
    if "bucket" not in p:
        raise ValueError("bucket (seconds) is required")
    df = engine.aggregate(
        query_tags,
        bucket_seconds=int(p["bucket"]),
        start=_parse_ts(p.get("start", p.get("s"))),
        end=_parse_ts(p.get("end", p.get("e"))),
    )
    rows = df.offset(offset).limit(limit).collect()
    objects = []
    for r in rows:
        d = r.asDict(recursive=True)
        objects.append(
            {
                "stream_id": d["stream_id"],
                "bucket": _iso(d["bucket_ts"]),
                "v": {k: x for k, x in (d["v"] or {}).items() if x is not None},
                "t": {k: _iso(x) for k, x in (d["t"] or {}).items() if x is not None},
            }
        )
    return {
        "meta": {"limit": limit, "offset": offset, "bucket": int(p["bucket"])},
        "objects": json.loads(json.dumps(objects)),
    }


def stream_datapoints(
    engine: Datastream,
    stream_id: str,
    params: dict[str, str] | None = None,
    limit: int = 100,
    offset: int = 0,
) -> dict[str, Any]:
    """GET /api/v1/stream/<uuid>/ — datapoints with the reference's query
    params, serialized ISO-8601."""
    p = params or {}
    gran_param = p.get("granularity", p.get("g", "seconds"))
    if gran_param not in _GRANULARITY_ALIASES:
        from .exceptions import UnsupportedGranularity

        raise UnsupportedGranularity(gran_param)
    gran = _GRANULARITY_ALIASES[gran_param]
    dps = engine.get_data(
        stream_id,
        gran,
        start=_parse_ts(p.get("start", p.get("s"))),
        end=_parse_ts(p.get("end", p.get("e"))),
        start_exclusive=_parse_ts(p.get("start_exclusive", p.get("sx"))),
        end_exclusive=_parse_ts(p.get("end_exclusive", p.get("ex"))),
        reverse=p.get("reverse", p.get("r", "")) in ("1", "true", "True"),
        value_downsamplers=(
            p["value_downsamplers"].split(",") if "value_downsamplers" in p
            else (p["v"].split(",") if "v" in p else None)
        ),
        time_downsamplers=(
            p["time_downsamplers"].split(",") if "time_downsamplers" in p
            else (p["t"].split(",") if "t" in p else None)
        ),
    )
    # LIMIT/OFFSET evaluated engine-side (Spark offset+limit → one job)
    page_df = dps.df.offset(offset).limit(limit)
    paged = type(dps)(page_df, dps._raw, dps._reverse, dps._nominal)
    datapoints = []
    for d in paged:
        t = d["t"]
        out_t = _iso(t) if isinstance(t, _dt.datetime) else {
            k: _iso(v) for k, v in t.items()
        }
        v = d["v"]
        datapoints.append({"t": out_t, "v": v})
    return {
        "meta": {"limit": limit, "offset": offset},
        "stream_id": stream_id,
        "granularity": gran,
        "datapoints": json.loads(json.dumps(datapoints)),  # ensure JSON-safe
    }


def list_tables(
    engine: Datastream,
    limit: int = 100,
    offset: int = 0,
) -> dict[str, Any]:
    """GET /api/v1/table/ — the EXTERNAL-TABLE catalog (engine
    extension): every registered lakehouse table, with its detected
    format, served by name alongside the stream endpoints."""
    tables = engine.external_tables()
    total = len(tables)
    page = tables[offset : offset + limit]
    return {
        "meta": {"limit": limit, "offset": offset, "total_count": total},
        "objects": page,
    }


def table_rows(
    engine: Datastream,
    name: str,
    params: dict[str, str] | None = None,
    limit: int = 100,
    offset: int = 0,
) -> dict[str, Any]:
    """GET /api/v1/table/<name>/ — rows of a registered external
    table (arbitrary schema → JSON with ISO timestamps), deterministic
    limit/offset pagination over the table's sorted column order.
    ``version`` / ``snapshot_id`` / ``as_of`` (epoch ms) pin time
    travel, exactly like the library calls."""
    p = params or {}
    df = engine.external_table(
        name,
        version=int(p["version"]) if "version" in p else None,
        snapshot_id=(
            int(p["snapshot_id"]) if "snapshot_id" in p else None
        ),
        as_of_timestamp_ms=int(p["as_of"]) if "as_of" in p else None,
    )
    cols = df.columns
    # deterministic pagination over ORDERABLE columns only — Spark
    # cannot sort by map-typed expressions at ANY nesting depth, and
    # legal Delta/Iceberg schemas carry them. Stateless offset
    # pagination re-sorts per request by construction (a cursor-based
    # API is the scale path; this endpoint mirrors the reference's
    # tastypie limit/offset contract).
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    sortable = [
        f.name for f in df.schema.fields if _orderable(f.dataType)
    ]
    page_df = df.orderBy(*sortable) if sortable else df
    rows = page_df.offset(offset).limit(limit).collect()
    objects = [
        json.loads(
            json.dumps(r.asDict(recursive=True), default=_json_default)
        )
        for r in rows
    ]
    return {
        "meta": {
            "limit": limit,
            "offset": offset,
            "columns": cols,
            "name": name,
        },
        "objects": objects,
    }


def _json_default(v):
    if isinstance(v, _dt.datetime):
        return _iso(v)
    if isinstance(v, (bytes, bytearray)):
        import base64

        return base64.b64encode(bytes(v)).decode("ascii")
    return str(v)
