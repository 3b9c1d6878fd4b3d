"""Z-order layout tests: the point of the feature is measurable file
pruning, so the test measures it — parquet footer min/max stats must
let a single-stream predicate skip most files under the z-order layout
while the time-sorted layout skips none."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from django_datastream_spark.layout import write_zordered, zorder_key

N_FILES = 16


def _overlapping_files(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] for col overlaps [lo,hi], total files)."""
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cc = md.row_group(rg).column(ci)
                if cc.path_in_schema == col and cc.statistics is not None:
                    s = cc.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {f}"
        if fmax >= lo and fmin <= hi:
            hit += 1
    return hit, len(files)


@pytest.fixture(scope="module")
def points(spark):
    # 100k rows, 1000 streams interleaved in time — the points_raw shape
    return spark.range(100_000).select(
        (F.col("id") % 1000).alias("stream"),
        F.col("id").alias("seq"),
        (F.col("id") * 7 % 100_000).cast("double").alias("value"),
    )


def test_zorder_prunes_stream_predicates(spark, points, tmp_path):
    time_dir = str(tmp_path / "time_sorted")
    z_dir = str(tmp_path / "zordered")
    (
        points.repartitionByRange(N_FILES, "seq")
        .sortWithinPartitions("seq")
        .write.mode("overwrite")
        .parquet(time_dir)
    )
    write_zordered(points, z_dir, ["stream", "seq"], n_files=N_FILES)

    # single-stream range predicate: stream BETWEEN 100 AND 110
    t_hit, t_all = _overlapping_files(time_dir, "stream", 100, 110)
    z_hit, z_all = _overlapping_files(z_dir, "stream", 100, 110)
    assert t_all == N_FILES and z_all == N_FILES
    # time-sorted layout: every file spans all streams -> zero pruning
    assert t_hit == N_FILES
    # z-order: most files pruned by footer stats alone
    assert z_hit <= N_FILES // 2, f"z-order pruned only to {z_hit} files"

    # the time dimension must still prune under z-order (both dims share
    # the key): a narrow seq-range must not touch every file
    zt_hit, _ = _overlapping_files(z_dir, "seq", 0, 6_250)
    assert zt_hit <= N_FILES // 2


def test_zorder_preserves_rows(spark, points, tmp_path):
    out = str(tmp_path / "z2")
    write_zordered(points, out, ["stream", "seq"], n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 100_000
    assert back.agg(F.sum("seq")).first()[0] == sum(range(100_000))
    assert set(back.columns) == {"stream", "seq", "value"}


def test_zorder_key_builds_without_jobs(spark, points):
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    joined, z = zorder_key(points, ["stream", "seq"])
    _ = joined.withColumn("_z", z).columns
    assert tracker.getJobIdsForGroup(None) == before
