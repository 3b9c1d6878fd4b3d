"""SparkSession factory.

Defaults are chosen for correctness-parity with the DuckDB oracle
(UTC everywhere — the reference stores UTC epoch seconds, SURVEY.md §1.2)
and for scale (AQE on, Arrow on, partition counts sized from cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "django-datastream-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster only the SQL confs matter; master/local settings are
    for the local[] test harness.
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata ships TIMESTAMP(NANOS) parquet which the Spark
        # vectorized reader rejects; read as long + convert (sources.testdata)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT64 micros, not the deprecated INT96: INT96 columns carry NO
        # footer min/max statistics, which would blind the txn log's
        # data skipping (txnlog.collect_file_stats) and every engine's
        # row-group pruning on timestamp predicates
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    return spark


def harden_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-created session.

    The verification driver owns its own SparkSession; timezone and the
    parquet-NANOS legacy flag are runtime SQL confs, so we can still pin
    them for oracle parity. Also ships this package to executor Python
    workers (addPyFile) so UDF closures resolve regardless of the
    session's original PYTHONPATH.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:
            pass  # non-runtime conf on this build; loader has a pyarrow fallback
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    if getattr(spark, "_dds_pkg_shipped", False):
        return
    try:
        import tempfile
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zip_path = os.path.join(
            tempfile.gettempdir(), "django_datastream_spark_pkg.zip"
        )
        with zipfile.ZipFile(zip_path, "w") as zf:
            for dirpath, _dirnames, filenames in os.walk(pkg_dir):
                for fn in filenames:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
        spark.sparkContext.addPyFile(zip_path)
        spark._dds_pkg_shipped = True
    except Exception:
        pass  # closures are written self-contained; this is extra insurance
