"""Format auto-detection (sources/detect.py open_table): every layout
this engine reads opens through ONE entry point, adopted tables
resolve to the maintained txn view, and pins a format cannot express
raise instead of being ignored."""

import pytest

from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import detect as DT
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import iceberg as IB


def _df(spark, ids):
    return spark.createDataFrame(
        [(int(i), float(i) * 0.5) for i in ids], "doc_id long, val double"
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_open_table_all_formats(spark, tmp_path):
    # txn
    t = str(tmp_path / "t")
    TL.txn_append(spark, _df(spark, range(4)), t, [])
    assert DT.detect_table_format(t) == "txn"
    assert _ids(DT.open_table(spark, t)) == [0, 1, 2, 3]
    # delta (sink-written)
    d = str(tmp_path / "d")
    DL.delta_streaming_sink(d, "a")(_df(spark, range(3)), 0)
    assert DT.detect_table_format(d) == "delta"
    assert _ids(DT.open_table(spark, d)) == [0, 1, 2]
    # iceberg (sink-written)
    i = str(tmp_path / "i")
    IB.iceberg_streaming_sink(i, "a")(_df(spark, range(2)), 0)
    assert DT.detect_table_format(i) == "iceberg"
    assert _ids(DT.open_table(spark, i)) == [0, 1]
    # plain parquet
    p = str(tmp_path / "p")
    _df(spark, range(5)).write.parquet(p)
    assert DT.detect_table_format(p) == "parquet"
    assert _ids(DT.open_table(spark, p)) == [0, 1, 2, 3, 4]
    # nothing
    import os

    os.makedirs(str(tmp_path / "empty"), exist_ok=True)
    with pytest.raises(ValueError, match="no table here"):
        DT.detect_table_format(str(tmp_path / "empty"))


def test_open_table_adopted_prefers_txn_view(spark, tmp_path):
    """An adopted Delta table carries BOTH logs; the engine's txn view
    (which later engine commits extend) wins detection."""
    d = str(tmp_path / "d")
    DL.delta_streaming_sink(d, "a")(_df(spark, range(3)), 0)
    DL.adopt_delta(spark, d, d)
    assert DT.detect_table_format(d) == "txn"
    TL.txn_append(spark, _df(spark, [10]), d, [])
    assert _ids(DT.open_table(spark, d)) == [0, 1, 2, 10]


def test_open_table_rejects_wrong_pins(spark, tmp_path):
    d = str(tmp_path / "d")
    DL.delta_streaming_sink(d, "a")(_df(spark, range(2)), 0)
    with pytest.raises(ValueError, match="Iceberg pin"):
        DT.open_table(spark, d, snapshot_id=7)
    i = str(tmp_path / "i")
    IB.iceberg_streaming_sink(i, "a")(_df(spark, range(2)), 0)
    with pytest.raises(ValueError, match="snapshot_id"):
        DT.open_table(spark, i, version=1)
    p = str(tmp_path / "p")
    _df(spark, range(2)).write.parquet(p)
    with pytest.raises(ValueError, match="no versions"):
        DT.open_table(spark, p, version=1)


def test_open_stream_all_formats(spark, tmp_path):
    def _drain(df, cp, out):
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        return spark.read.parquet(out)

    t = str(tmp_path / "t")
    TL.txn_append(spark, _df(spark, range(3)), t, [])
    got = _drain(
        DT.open_stream(spark, t),
        str(tmp_path / "tc"), str(tmp_path / "to"),
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2]
    d = str(tmp_path / "d")
    DL.delta_streaming_sink(d, "a")(_df(spark, range(2)), 0)
    got = _drain(
        DT.open_stream(spark, d, maxFilesPerTrigger=5),
        str(tmp_path / "dc"), str(tmp_path / "do"),
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1]
    i = str(tmp_path / "i")
    IB.iceberg_streaming_sink(i, "a")(_df(spark, range(2)), 0)
    got = _drain(
        DT.open_stream(spark, i),
        str(tmp_path / "ic"), str(tmp_path / "io"),
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1]
    p = str(tmp_path / "p")
    _df(spark, range(2)).write.parquet(p)
    with pytest.raises(ValueError, match="no commit log"):
        DT.open_stream(spark, p)
