"""HTTP-parity facade tests (S6/S7): param parsing, pagination, ISO-8601
serialization — the behaviors of the reference's tastypie resources."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from django_datastream_spark.api import Datastream
from django_datastream_spark.http_api import (
    aggregate_streams,
    list_streams,
    stream_datapoints,
)

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 3, 1, tzinfo=UTC)


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Datastream(spark, str(tmp_path / "store"))
    sid = eng.ensure_stream({"title": "api"}, tags={"unit": "C"})
    eng.append_multiple(
        [
            {
                "stream_id": sid,
                "value": float(i),
                "timestamp": T0 + dt.timedelta(seconds=i),
            }
            for i in range(180)
        ]
    )
    eng.downsample_streams(until=T0 + dt.timedelta(seconds=180))
    return eng, sid


def test_list_streams_pagination_and_meta(engine):
    eng, sid = engine
    res = list_streams(eng, {"title": "api"}, limit=10, offset=0)
    assert res["meta"]["total_count"] == 1
    assert res["meta"]["next"] is None
    obj = res["objects"][0]
    assert obj["stream_id"] == sid
    assert obj["tags"]["unit"] == "C"
    assert obj["earliest_datapoint"] == "2024-03-01T00:00:00Z"
    assert obj["latest_datapoint"] == "2024-03-01T00:02:59Z"
    json.dumps(res)  # fully serializable


def test_datapoints_params_projection_pagination(engine):
    eng, sid = engine
    res = stream_datapoints(
        eng,
        sid,
        {"g": "seconds", "s": "2024-03-01T00:00:10Z", "e": "2024-03-01T00:00:20Z"},
    )
    assert [d["v"] for d in res["datapoints"]] == [float(i) for i in range(10, 21)]
    assert res["datapoints"][0]["t"] == "2024-03-01T00:00:10Z"

    # coarser granularity + downsampler projection + reverse + paging
    res = stream_datapoints(
        eng,
        sid,
        {"g": "seconds10", "r": "1", "v": "mean,count", "t": "first"},
        limit=5,
        offset=2,
    )
    dps = res["datapoints"]
    assert len(dps) == 5
    assert set(dps[0]["v"].keys()) == {"mean", "count"}
    assert set(dps[0]["t"].keys()) == {"first"}
    # reverse order: first page entry after offset 2 is the 3rd-last bucket
    assert dps[0]["t"]["first"] == "2024-03-01T00:02:30Z"
    json.dumps(res)


def test_aggregate_endpoint_routes_and_serializes(engine):
    eng, sid = engine
    res = aggregate_streams(eng, {"title": "api"}, {"bucket": "60"})
    assert res["meta"]["bucket"] == 60
    objs = res["objects"]
    assert [o["bucket"] for o in objs] == [
        "2024-03-01T00:00:00Z",
        "2024-03-01T00:01:00Z",
        "2024-03-01T00:02:00Z",
    ]
    assert objs[0]["v"]["count"] == 60
    assert objs[0]["v"]["sum"] == sum(range(60))
    assert objs[0]["t"]["first"] == "2024-03-01T00:00:00Z"
    json.dumps(res)
    with pytest.raises(ValueError):
        aggregate_streams(eng, None, {})


def test_datapoints_epoch_param_spelling(engine):
    eng, sid = engine
    epoch = str(int(T0.timestamp()) + 30)
    res = stream_datapoints(eng, sid, {"granularity": "seconds", "start": epoch})
    assert res["datapoints"][0]["v"] == 30.0
