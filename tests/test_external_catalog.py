"""The engine catalog over external tables — lakehouse interop served
BY NAME through the Datastream facade (register → external_table /
external_stream / SQL views / HTTP), instead of path-oriented library
calls. VERDICT r9 item 6."""

import pytest
from pyspark.sql import functions as F

from django_datastream_spark import exceptions as exc
from django_datastream_spark import http_api, txnlog as TL
from django_datastream_spark.api import Datastream
from django_datastream_spark.sources import delta as DL
from tests.test_delta import _build_hive_table
from tests.test_iceberg import _build_nonmonotonic_table


def _mkds(spark, tmp_path):
    return Datastream(spark, str(tmp_path / "store"))


def test_register_detects_and_persists(spark, tmp_path):
    ds = _mkds(spark, tmp_path)
    droot = str(tmp_path / "d")
    _build_hive_table(droot)
    iroot = str(tmp_path / "i")
    _build_nonmonotonic_table(iroot)
    troot = str(tmp_path / "t")
    TL.txn_append(
        spark,
        spark.createDataFrame([(1, 1.0)], "doc_id long, val double"),
        troot, [],
    )
    assert ds.register_external_table("d", droot)["format"] == "delta"
    assert ds.register_external_table("i", iroot)["format"] == "iceberg"
    assert ds.register_external_table("t", troot)["format"] == "txn"
    # persisted: a fresh facade over the same store sees all three
    ds2 = Datastream(spark, ds.tables.root)
    assert [e["name"] for e in ds2.external_tables()] == ["d", "i", "t"]
    # by-name read == direct read, for each format
    a = sorted(map(tuple, ds2.external_table("d").collect()))
    b = sorted(map(tuple, DL.read_delta(spark, droot).collect()))
    assert a == b
    assert ds2.external_table("t").count() == 1
    assert ds2.external_table("i").count() > 0


def test_register_conflicts_and_unregister(spark, tmp_path):
    ds = _mkds(spark, tmp_path)
    droot = str(tmp_path / "d")
    _build_hive_table(droot)
    ds.register_external_table("d", droot)
    # idempotent same spec
    ds.register_external_table("d", droot)
    other = str(tmp_path / "other")
    _build_hive_table(other)
    with pytest.raises(exc.DatastreamError, match="already registered"):
        ds.register_external_table("d", other)
    assert ds.unregister_external_table("d") is True
    assert ds.unregister_external_table("d") is False
    with pytest.raises(exc.StreamNotFound):
        ds.external_table("d")
    with pytest.raises(ValueError, match="no table here"):
        ds.register_external_table("x", str(tmp_path / "empty"))


def test_time_travel_pins_pass_through(spark, tmp_path):
    ds = _mkds(spark, tmp_path)
    droot = str(tmp_path / "d")
    _build_hive_table(droot)
    ds.register_external_table("d", droot)
    v0 = sorted(
        r["doc_id"] for r in ds.external_table("d", version=0).collect()
    )
    assert v0 == list(range(10))
    # a wrong-format pin raises instead of being ignored
    with pytest.raises(ValueError, match="Iceberg"):
        ds.external_table("d", snapshot_id=123)


def test_external_stream_by_name(spark, tmp_path):
    ds = _mkds(spark, tmp_path)
    droot = str(tmp_path / "d")
    _build_hive_table(droot)
    ds.register_external_table("d", droot)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        ds.external_stream("d", ignoreChanges="true")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert "_commit_version" in got.columns


def test_http_table_endpoints(spark, tmp_path):
    ds = _mkds(spark, tmp_path)
    droot = str(tmp_path / "d")
    _build_hive_table(droot)
    ds.register_external_table("docs", droot)
    listing = http_api.list_tables(ds)
    assert listing["meta"]["total_count"] == 1
    assert listing["objects"][0]["name"] == "docs"
    assert listing["objects"][0]["format"] == "delta"
    page = http_api.table_rows(ds, "docs", limit=5, offset=0)
    assert len(page["objects"]) == 5
    assert page["meta"]["columns"] == ds.external_table("docs").columns
    page2 = http_api.table_rows(ds, "docs", limit=5, offset=5)
    assert page["objects"] != page2["objects"]
    pinned = http_api.table_rows(
        ds, "docs", params={"version": "0"}, limit=100
    )
    assert len(pinned["objects"]) == 10


def test_attach_external_views_sql(spark, tmp_path):
    ds = _mkds(spark, tmp_path)
    droot = str(tmp_path / "d")
    _build_hive_table(droot)
    ds.register_external_table("docs", droot)
    assert ds.attach_external_views(prefix="ext_") == ["ext_docs"]
    n = spark.sql("SELECT COUNT(*) AS n FROM ext_docs").collect()[0]["n"]
    assert n == ds.external_table("docs").count()


def test_http_table_rows_with_map_column(spark, tmp_path):
    """Legal Delta/Iceberg schemas carry map columns — pagination must
    order by the orderable columns only, not 500."""
    ds = _mkds(spark, tmp_path)
    root = str(tmp_path / "m")
    df = spark.createDataFrame(
        [(1, {"a": "x"}), (2, {"b": "y"})],
        "doc_id long, tags map<string,string>",
    )
    TL.txn_append(spark, df, root, [])
    ds.register_external_table("m", root)
    page = http_api.table_rows(ds, "m", limit=10)
    assert [o["doc_id"] for o in page["objects"]] == [1, 2]


def test_format_pin_decides_the_view_on_dual_log_roots(spark, tmp_path):
    """adopt/publish leave several views over ONE file set; the
    registered format must pick the view (detection order would
    always serve txn/Delta first) — and a pin without its marker
    raises at registration."""
    from django_datastream_spark.sources import iceberg as IB

    root = str(tmp_path / "t")
    TL.txn_append(
        spark,
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "doc_id long, val double"
        ),
        root, [],
    )
    IB.publish_iceberg(spark, root)
    ds = _mkds(spark, tmp_path)
    ds.register_external_table("ice", root, format="iceberg")
    ds.register_external_table("txn", root, format="txn")
    # the iceberg pin serves iceberg pins (snapshot_id works)
    sid = IB.iceberg_snapshots(root)[-1]["snapshot_id"]
    got = ds.external_table("ice", snapshot_id=sid)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(6))
    # the txn name serves txn pins on the same root
    assert ds.external_table("txn", version=1).count() == 6
    # a pin without its marker refuses registration
    with pytest.raises(ValueError, match="no delta marker"):
        ds.register_external_table("nope", root, format="delta")


def test_register_rejects_non_identifier_names(spark, tmp_path):
    ds = _mkds(spark, tmp_path)
    root = str(tmp_path / "d")
    _build_hive_table(root)
    with pytest.raises(ValueError, match="SQL identifier"):
        ds.register_external_table("my-table", root)


def test_http_table_rows_with_nested_map(spark, tmp_path):
    ds = _mkds(spark, tmp_path)
    root = str(tmp_path / "m")
    df = spark.createDataFrame(
        [(1, [{"a": "x"}]), (2, [{"b": "y"}])],
        "doc_id long, tags array<map<string,string>>",
    )
    TL.txn_append(spark, df, root, [])
    ds.register_external_table("m", root)
    page = http_api.table_rows(ds, "m", limit=10)
    assert [o["doc_id"] for o in page["objects"]] == [1, 2]


def test_external_stream_ships_fileio_for_custom_schemes(
    spark, tmp_path
):
    """A registered object-store table streams through the facade:
    open_stream ships the resolved FileIO to the DataSource worker
    processes automatically."""
    import os

    from django_datastream_spark.sources import fileio as FIO
    from tests.test_delta import _build_hive_table as _bht

    scheme = f"cat{os.getpid()}"
    backing = str(tmp_path / "bucket")
    posix = os.path.join(backing, "t")
    _bht(posix)
    store = FIO.FakeObjectStore(scheme, backing)
    FIO.register_fileio(scheme, store)
    try:
        ds = _mkds(spark, tmp_path)
        ds.register_external_table("obj", f"{scheme}://t")
        out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
        q = (
            ds.external_stream("obj", ignoreChanges="true")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        assert spark.read.parquet(out).count() > 0
    finally:
        FIO.unregister_fileio(scheme)


def test_views_attach_on_construction(spark, tmp_path):
    """VERDICT r10 item 5: a FRESH engine over an existing store
    serves SELECT * FROM ext_<name> with no manual attach."""
    ds = _mkds(spark, tmp_path)
    droot = str(tmp_path / "d")
    _build_hive_table(droot)
    ds.register_external_table("docs", droot)
    # new engine, same store, opt-in flag — views come up by themselves
    ds2 = Datastream(spark, str(tmp_path / "store"), attach_views=True)
    got = spark.sql("SELECT count(*) AS n FROM ext_docs").collect()[0]["n"]
    assert got == ds2.external_table("docs").count()
    spark.catalog.dropTempView("ext_docs")


def test_external_table_view_time_travel(spark, tmp_path):
    """Time travel reachable from the SQL surface, pinned at attach
    time (the library call's contract through spark.sql)."""
    ds = _mkds(spark, tmp_path)
    droot = str(tmp_path / "d")
    _build_hive_table(droot)
    ds.register_external_table("docs", droot)
    v0 = ds.external_table_view("docs", version=0)
    assert v0 == "docs_v0"
    n0 = spark.sql("SELECT count(*) AS n FROM docs_v0").collect()[0]["n"]
    assert n0 == ds.external_table("docs", version=0).count()
    head = ds.external_table("docs").count()
    assert n0 != head  # the pin really froze an older era
    custom = ds.external_table_view("docs", version=0, view="docs_old")
    assert custom == "docs_old"
    assert (
        spark.sql("SELECT count(*) AS n FROM docs_old").collect()[0]["n"]
        == n0
    )
    for v in ("docs_v0", "docs_old"):
        spark.catalog.dropTempView(v)
