"""Property-test invariants (FIXTURES.md B3).

- granularity rounding: Spark formula == pure-datetime reference
  (hypothesis, many examples — pure Python, cheap)
- partial-aggregation law: hierarchical rollup through any intermediate
  level == direct aggregation from raw (seeded random data, Spark jobs)
- std_dev identity vs stddev_pop
"""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from django_datastream_spark.granularity import BY_NAME, GRANULARITIES
from django_datastream_spark.operators.downsample import downsample_raw, rollup_agg

UTC = dt.timezone.utc


@given(
    epoch=st.integers(min_value=0, max_value=4102444800),  # 1970..2100
)
@settings(max_examples=300, deadline=None)
def test_round_timestamp_matches_floor_formula(epoch):
    t = dt.datetime.fromtimestamp(epoch, tz=UTC)
    for g in GRANULARITIES:
        expected = (epoch // g.duration_s) * g.duration_s
        got = g.round_timestamp(t)
        assert int(got.timestamp()) == expected, g.name
        # Days == UTC midnight; Hours6 etc. epoch-aligned
        if g.name == "days":
            assert got.hour == got.minute == got.second == 0


@pytest.fixture(scope="module")
def raw_points(spark):
    rnd = random.Random(42)
    t0 = int(dt.datetime(2024, 3, 1, tzinfo=UTC).timestamp())
    rows = []
    # 3 streams, irregular gaps (fx_numeric_sparse shape), ~2h span
    for s in range(3):
        t = t0
        for i in range(500):
            t += (i * i + s) % 29 + 1
            rows.append(
                (
                    f"s{s}",
                    dt.datetime.fromtimestamp(t, tz=UTC),
                    rnd.uniform(-100, 100),
                    None,
                    None,
                )
            )
    return spark.createDataFrame(
        rows,
        "stream_id string, ts timestamp, value double, value_nominal string, "
        "value_graph struct<v:array<struct<i:string>>, e:array<struct<f:string,t:string>>>",
    )


@pytest.mark.parametrize("mid", ["seconds10", "minutes", "minutes10"])
def test_partial_aggregation_law(spark, raw_points, mid):
    """finish(merge(partials)) == finish(whole): aggregating raw → HOURS
    directly must equal rolling up through any intermediate granularity."""
    direct = downsample_raw(raw_points, BY_NAME["hours"]).orderBy(
        "stream_id", "bucket_ts"
    )
    via = rollup_agg(
        downsample_raw(raw_points, BY_NAME[mid]), BY_NAME["hours"]
    ).orderBy("stream_id", "bucket_ts")
    a, b = direct.collect(), via.collect()
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["stream_id"] == rb["stream_id"]
        assert ra["bucket_ts"] == rb["bucket_ts"]
        va, vb = ra["v"].asDict(), rb["v"].asDict()
        assert va["count"] == vb["count"]
        for k in ("sum", "sum_squares", "mean", "std_dev"):
            assert va[k] == pytest.approx(vb[k], rel=1e-9, abs=1e-9), k
        for k in ("min", "max"):
            assert va[k] == vb[k]
        ta, tb = ra["t"].asDict(), rb["t"].asDict()
        assert ta == tb  # first/last/mean timestamps merge exactly
        assert ra["t_sum_epoch"] == rb["t_sum_epoch"]


def test_std_dev_identity_vs_stddev_pop(spark, raw_points):
    agg = downsample_raw(raw_points, BY_NAME["minutes"])
    ref = raw_points.groupBy(
        "stream_id", BY_NAME["minutes"].bucket_col(F.col("ts")).alias("bucket_ts")
    ).agg(F.stddev_pop("value").alias("sp"), F.count("*").alias("c"))
    joined = agg.join(ref, ["stream_id", "bucket_ts"]).collect()
    assert len(joined) > 0
    for r in joined:
        sp = r["sp"] if r["sp"] is not None else 0.0
        if r["c"] == 1:
            # stddev_pop of a single value is 0; our formula agrees
            assert r["v"]["std_dev"] == pytest.approx(0.0, abs=1e-9)
        else:
            assert r["v"]["std_dev"] == pytest.approx(sp, rel=1e-7, abs=1e-9)


def test_cap_frequencies(spark):
    from django_datastream_spark.operators.downsample import cap_frequencies

    df = spark.createDataFrame(
        [({"a": 5, "b": 3, "c": 2, "d": 1},), ({"x": 1},)], "m map<string,bigint>"
    )
    out = df.select(cap_frequencies(F.col("m"), 2).alias("c")).collect()
    assert out[0]["c"] == {"a": 5, "b": 3, "__other__": 3}
    assert out[1]["c"] == {"x": 1}  # under the cap → untouched


def test_salted_agg_equals_direct_groupby(spark, raw_points):
    from django_datastream_spark.operators.skew import salted_agg

    direct = {
        (r["stream_id"],): (r["s"], r["c"], r["mn"], r["mx"])
        for r in raw_points.groupBy("stream_id")
        .agg(
            F.sum("value").alias("s"),
            F.count("value").alias("c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["stream_id"],): (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_agg(
            raw_points,
            ["stream_id"],
            [
                ("value", "sum", "s"),
                ("value", "count", "c"),
                ("value", "min", "mn"),
                ("value", "max", "mx"),
            ],
        ).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        ds, dc, dmn, dmx = direct[k]
        ss, sc, smn, smx = salted[k]
        assert dc == sc and dmn == smn and dmx == smx
        assert ds == pytest.approx(ss, rel=1e-12)


def test_nominal_frequency_merge_law(spark):
    rows = []
    rnd = random.Random(7)
    t0 = dt.datetime(2024, 3, 1, tzinfo=UTC)
    for i in range(400):
        rows.append(
            (
                "n0",
                t0 + dt.timedelta(seconds=i * 7),
                None,
                f'"{rnd.choice("abcde")}"',
                None,
            )
        )
    df = spark.createDataFrame(
        rows,
        "stream_id string, ts timestamp, value double, value_nominal string, "
        "value_graph struct<v:array<struct<i:string>>, e:array<struct<f:string,t:string>>>",
    )
    direct = downsample_raw(df, BY_NAME["minutes10"]).orderBy("bucket_ts").collect()
    via = (
        rollup_agg(downsample_raw(df, BY_NAME["minutes"]), BY_NAME["minutes10"])
        .orderBy("bucket_ts")
        .collect()
    )
    assert len(direct) == len(via) > 0
    for ra, rb in zip(direct, via):
        assert ra["v"]["frequencies"] == rb["v"]["frequencies"]
        assert ra["v"]["most_often"] == rb["v"]["most_often"]
        assert ra["v"]["least_often"] == rb["v"]["least_often"]


# ---------------------------------------------------------------------------
# aggregate-routing law: served-from-aggregates == pure raw recompute,
# regardless of where the downsample watermark sits (FIXTURES B3 spirit)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "cut,bucket_s,n_after",
    [(67, 60, 50), (240, 600, 123), (555, 3600, 0)],
)
@pytest.mark.slow
def test_aggregate_routing_equals_raw_recompute(spark, tmp_path, cut, bucket_s, n_after):
    from django_datastream_spark.api import Datastream

    rnd = random.Random(1000 + cut)
    t0 = dt.datetime(2024, 5, 1, tzinfo=UTC)
    eng = Datastream(spark, str(tmp_path / f"store{cut}"))
    sid = eng.ensure_stream({"title": f"p{cut}"})
    # irregular pre-cut points, a downsample at the cut, then more appends
    times, t = [], 0
    while t < 600:
        times.append(t)
        t += rnd.randint(1, 13)
    vals = {i: rnd.uniform(-50, 50) for i in times}
    eng.append_multiple(
        [
            {"stream_id": sid, "value": vals[i], "timestamp": t0 + dt.timedelta(seconds=i)}
            for i in times
        ]
    )
    eng.downsample_streams(until=t0 + dt.timedelta(seconds=cut))
    extra = [600 + rnd.randint(0, 3) + 4 * j for j in range(n_after)]
    for i in extra:
        vals[i] = rnd.uniform(-50, 50)
    if extra:
        eng.append_multiple(
            [
                {"stream_id": sid, "value": vals[i], "timestamp": t0 + dt.timedelta(seconds=i)}
                for i in extra
            ]
        )
    got = {
        int((r["bucket_ts"].replace(tzinfo=UTC) - t0).total_seconds()): r
        for r in eng.aggregate(bucket_seconds=bucket_s).collect()
    }
    expected: dict[int, list[float]] = {}
    for i, v in vals.items():
        expected.setdefault(i // bucket_s * bucket_s, []).append(v)
    assert set(got) == set(expected)
    for b, vs in expected.items():
        assert got[b]["v"]["count"] == len(vs)
        assert got[b]["v"]["sum"] == pytest.approx(math.fsum(vs), rel=1e-9)
        assert got[b]["v"]["min"] == pytest.approx(min(vs))
        assert got[b]["v"]["max"] == pytest.approx(max(vs))
