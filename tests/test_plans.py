"""Physical-plan assertions — the 100 TB checklist (SURVEY §4, task brief):
filters reach the parquet scan, small dims broadcast, aggregate scans
prune columns, and no unbounded cartesian products hide in the plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from django_datastream_spark.plans import declared

from .conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    df = declared.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_scan_pushes_filters(spark):
    plan = plan_of(spark, "q02_range_scan")
    # the ns-long predicate must reach PushedFilters (row-group pruning);
    # a timestamp_micros(...)-wrapped filter would not be pushable
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThan(ts" in pushed


def test_projection_prunes_columns(spark):
    plan = plan_of(spark, "q05_reverse_page")
    # scan must read only the 3 needed columns, not the full events schema
    scan = plan.split("FileScan parquet ", 1)[1].split("]", 1)[0]
    assert "props" not in scan and "user_id" not in scan


def test_small_dims_broadcast(spark):
    for name in ("q21_join", "q22_multijoin"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "q20_topk")
    assert "TakeOrderedAndProject" in plan


@pytest.mark.slow
def test_no_unbounded_cartesian(spark):
    # cross joins are only allowed with a broadcast side (bounded query set)
    for name, fn in declared.QUERIES.items():
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


@pytest.mark.slow
def test_declaring_queries_runs_no_jobs(spark):
    """Building a declared query must be pure plan construction — zero
    Spark jobs until an action runs it. A count()/collect() inside a
    builder means a hidden extra corpus scan per declaration (the q60
    r4 regression: tf-idf ran a full count at plan-build time).

    Exceptions (algorithms, not plans): q42 builds a persisted ANN
    index on first use (corpus fingerprint count + cold kmeans fit);
    q45/q65 run the connected-components fixpoint — Spark has no
    recursive SQL, so the driver convergence loop IS the operator;
    q155/q160/q161/q162/q167 EXECUTE a bounded Structured Streaming job by
    design (the point of those queries is streaming execution inside
    the gate)."""
    exempt = {"q42_ann_ivf_topk", "q45_dedup_clusters",
              "q65_fuzzy_cluster_survivors",
              "q155_streaming_downsample_gate",
              "q160_stream_stream_join", "q161_streaming_dedup",
              "q162_stateful_running_totals",
              "q167_stream_static_enrich",
              # q170-q172 WRITE the txn table they read/stream (the
              # point is lakehouse execution inside the gate)
              "q170_txn_data_skipping", "q171_txn_stream_replay",
              "q172_txn_delete_vectors", "q173_txn_update_vectors",
              "q174_txn_stream_sink", "q175_txn_restore",
              "q176_txn_schema_evolution",
              "q177_txn_optimize_vacuum",
              "q178_txn_metadata_count", "q179_txn_time_travel",
              "q180_txn_bloom_lookup", "q181_txn_replace_where",
              "q182_engine_on_txn",
              # q184 TRAINS the BPE tokenizer (word-count shuffle +
              # collect) and asserts compression before returning;
              # q189's distributed prefix sum collects partition
              # totals (two-pass algorithm, O(#partitions) rows)
              "q184_bpe_roundtrip_md5", "q189_token_block_packing",
              "q193_crawl_to_training_blocks",
              # q190 runs the k-core peel fixpoint (q45 family)
              "q190_k_core",
              # q198/q199 collect the BOUNDED query side (ADC LUTs are
              # built driver-side by API contract, like the ANN family)
              "q198_pq_adc_topk", "q199_ivfpq_topk",
              "q200_block_dedup",
              # q204-q206 BUILD the persisted ANN index (txn commits)
              # then serve from it — lakehouse execution in the gate,
              # same family as q170-q182
              "q204_ann_index_reload", "q205_ann_index_time_travel",
              "q206_embedding_capstone",
              # q207-q209 WRITE the Delta fixture tree (+ q209 adopts
              # it into a txn table) before reading it
              "q207_delta_read", "q208_delta_time_travel",
              "q209_delta_adopt", "q210_delta_changes",
              # q211-q212 write the Iceberg fixture tree (metadata
              # JSON + avro manifests) before reading it
              "q211_iceberg_read", "q212_iceberg_time_travel",
              "q213_iceberg_adopt", "q214_ann_index_remove",
              "q215_iceberg_changes",
              # q216/q217 write Delta fixture trees (DV / columnMapping)
              "q216_delta_dv_read", "q217_delta_column_mapping",
              # q218 runs txn commits + the Iceberg publish
              "q218_publish_iceberg",
              # q219/q220 run bounded external-stream replays
              "q219_delta_stream_ingest", "q220_iceberg_stream_ingest",
              # q221 builds the persisted ANN index (q204 family)
              "q221_ann_distributed_query",
              # q222/q223 run txn commits + lakehouse publishes
              "q222_publish_delta", "q223_iceberg_position_deletes",
              # q224/q225 write Delta fixture trees (id-mapping / CDF)
              "q224_delta_column_mapping_id", "q225_delta_cdf",
              # q226 writes the equality-delete Iceberg fixture tree
              "q226_iceberg_equality_deletes",
              # q227 writes the DV fixture + runs the adopt
              "q227_delta_dv_adopt",
              # q228 writes the CDF fixture + runs paced stream jobs
              "q228_delta_cdf_stream",
              # q229 streams the q219 fixture into the Delta sink
              "q229_delta_stream_sink",
              # q230 runs the sink + optimize/vacuum maintenance cycle
              "q230_delta_maintenance",
              # q231 streams the q219 fixture into the Iceberg sink
              "q231_iceberg_stream_sink",
              # q232 runs the Iceberg sink + optimize/expire cycle
              "q232_iceberg_maintenance",
              # q233 runs txn commits + the CDF publish
              "q233_publish_cdf",
              # q234 builds the Delta fixture + the catalog store
              "q234_catalog_external_table",
              # q235/q236 build Delta fixtures read through FileIO
              "q235_fileio_object_store", "q236_fileio_hadoop_uri",
              # q237 runs q230's maintenance cycle on the fake object
              # store (write-side FileIO seam); q238 builds the Delta
              # fixture read through PyArrowFileIO
              "q237_fileio_write_chain", "q238_fileio_pyarrow",
              # q239 creates + publishes a txn table on the fake
              # object store (write-side seam through the txn tier)
              "q239_txn_object_store_publish",
              # q240/q241 build + CONVERT format trees (adopt/refresh
              # + publish both run Spark jobs at build)
              "q240_convert_delta_to_iceberg",
              "q241_convert_iceberg_to_delta"}
    sc = spark.sparkContext
    # warm the per-process parquet schema cache (one footer-inference
    # job per table, ever) so the check loop sees steady-state builds
    for name, fn in declared.QUERIES.items():
        if name not in exempt:
            fn(spark, SF_SMOKE)
    for name, fn in declared.QUERIES.items():
        if name in exempt:
            continue
        group = f"build-{name}"
        sc.setJobGroup(group, "plan-build purity check")
        try:
            fn(spark, SF_SMOKE)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert list(jobs) == [], f"{name} ran Spark jobs while building: {jobs}"


@pytest.mark.slow
def test_incremental_downsample_bounds_raw_scan(spark, tmp_path):
    """After a first downsample run, subsequent runs must filter the raw
    scan at the coarsest watermark (pushed to parquet) instead of
    rescanning history."""
    import datetime as dt

    from django_datastream_spark.api import Datastream
    from django_datastream_spark.operators import downsample as ds_ops

    eng = Datastream(spark, str(tmp_path / "store"))
    sid = eng.ensure_stream({"title": "w"})
    t0 = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    eng.append_multiple(
        [
            {"stream_id": sid, "value": 1.0, "timestamp": t0 + dt.timedelta(seconds=i)}
            for i in range(200)
        ]
    )
    eng.downsample_streams(until=t0 + dt.timedelta(days=2))
    meta = eng.find_streams()[0]
    # all six coarser watermarks recorded at the first-incomplete-bucket start
    assert set(meta["downsampled_until"]) == {
        "seconds10", "minutes", "minutes10", "hours", "hours6", "days",
    }
    # second run: captured raw plan must carry a pushed ts lower bound.
    # (Assert via the same filter expression downsample_streams builds.)
    low = min(meta["downsampled_until"].values())
    raw = eng.tables.read_points_raw().filter(F.col("ts") >= F.lit(low))
    plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(ts" in plan


@pytest.mark.slow
def test_agg_table_scan_prunes_partitions_and_struct_fields(spark, tmp_path):
    """get_data on points_agg: partition pruning on granularity + nested
    schema pruning down to the projected downsampler keys."""
    import datetime as dt

    from django_datastream_spark.api import Datastream

    eng = Datastream(spark, str(tmp_path / "store"))
    sid = eng.ensure_stream({"title": "p"})
    t0 = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    eng.append_multiple(
        [
            {"stream_id": sid, "value": float(i), "timestamp": t0 + dt.timedelta(seconds=i)}
            for i in range(300)
        ]
    )
    eng.downsample_streams(until=t0 + dt.timedelta(seconds=300))
    dp = eng.get_data(
        sid, "minutes", value_downsamplers=["mean"], time_downsamplers=["first"]
    )
    plan = dp.df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "granularity" in plan.split("PartitionFilters", 1)[1][:200]
    # nested pruning: ReadSchema carries only the projected struct fields
    read_schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "mean" in read_schema
    assert "sum_squares" not in read_schema and "frequencies" not in read_schema


def test_tpch_q1_pushes_date_and_prunes_columns(spark):
    plan = plan_of(spark, "q75_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter at the scan
    scan = plan.split("FileScan parquet ", 1)[1].split("]", 1)[0]
    # only the 7 needed columns, not the full 11-column lineitem schema
    assert "l_partkey" not in scan and "l_suppkey" not in scan
    assert plan.count("HashAggregate") == 2  # partial + final


def test_tpch_q3_broadcasts_dims_and_takes_ordered(spark):
    plan = plan_of(spark, "q76_shipping_priority")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-10, never a full sort
    assert "LessThan(o_orderdate" in plan and "GreaterThan(l_shipdate" in plan


def fplan_of(spark, name: str) -> str:
    """Formatted explain — unlike ``toString`` it never truncates the
    PushedFilters list, so filter-pushdown assertions are reliable."""
    df = declared.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_tpch_q6_all_predicates_reach_scan(spark):
    plan = fplan_of(spark, "q80_forecast_revenue")
    # date bounds, discount range, and quantity all pushed to parquet
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    read_schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "l_orderkey" not in read_schema and "l_returnflag" not in read_schema
    assert "partial_sum" in plan  # map-side partial agg before the 1-row exchange


def test_tpch_q5_broadcasts_dim_chain(spark):
    plan = fplan_of(spark, "q81_local_supplier_volume")
    # nation |><| region (and the region filter) never shuffle
    assert "EqualTo(r_name,ASIA)" in plan
    assert "BroadcastHashJoin" in plan
    # the orders date window is pushed before the fact join
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_tpch_q18_two_phase_agg_and_takeordered(spark):
    plan = fplan_of(spark, "q82_large_orders")
    # whale detection aggregates with map-side partials
    assert "partial_sum" in plan
    assert "TakeOrderedAndProject" in plan  # top-100, never a full sort
    assert "CartesianProduct" not in plan


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Co-located join: both sides bucketed on the join key with the
    same bucket count -> sort-merge join with NO Exchange on either
    side. The 100 TB pattern: pay the shuffle once at write time."""
    from django_datastream_spark.plans.bucketing import write_bucketed

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    dim = (
        ev.groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n_events")
    )
    try:
        # force the merge-join path: this test is about the co-located
        # SMJ two big tables would use, so take broadcast off the table
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        write_bucketed(ev, "t_fact_b", ["user_id"], n_buckets=8)
        write_bucketed(dim, "t_dim_b", ["user_id"], n_buckets=8)
        joined = spark.table("t_fact_b").join(spark.table("t_dim_b"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # neither side re-shuffles
        # and the result is the plain join's result
        assert joined.count() == ev.count()
        # disabling bucketing brings the shuffles back — proves the
        # bucketed layout (not AQE luck) removed them
        spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
        plan_off = (
            spark.table("t_fact_b")
            .join(spark.table("t_dim_b"), "user_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan_off
    finally:
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_fact_b")
        spark.sql("DROP TABLE IF EXISTS t_dim_b")


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """AQE skew-join: a 95%-hot join key whose shuffle partition
    exceeds the skew threshold is SPLIT at runtime — the executed plan
    shows SortMergeJoin(skew=true) with a skewed AQEShuffleRead — and
    the result is still the exact join result. This is the automatic
    complement to the explicit salted_join (q83): salting changes the
    plan up front, AQE re-plans from runtime statistics.

    Payloads are md5-derived so shuffle compression can't shrink the
    hot partition under the detection threshold (a plain repeated
    filler compresses ~100x and hides the skew from AQE's byte-based
    stats — found the hard way)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(120_000).select(
            F.when(F.col("id") % 20 < 19, F.lit(1))
            .otherwise(F.col("id") % 11)
            .alias("k"),
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 7).cast("string")),
            ).alias("p"),
        )
        dim = spark.range(0, 11, 1, 4).select(
            F.col("id").alias("dk"), F.lit("d").alias("lbl")
        )
        j = fact.join(dim, fact["k"] == dim["dk"]).select("k", "p", "lbl")
        rows = j.collect()  # same QueryExecution -> finalized AQE plan
        assert len(rows) == 120_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k in confs:
            spark.conf.unset(k)


def test_runtime_bloom_filter_reduces_probe_side(spark):
    """Spark 4's runtime bloom-filter join (on by default): a selective
    filter on one join side injects bloom_filter_agg there and a
    might_contain predicate into the OTHER side's scan, cutting probe
    shuffle volume before the join. At 100 TB the defaults gate it to
    small-creation-side/huge-probe-side joins (creationSideThreshold /
    applicationSideScanSizeThreshold); here we drop the probe-size gate
    to prove our dim-filtered fact joins are ELIGIBLE shapes — the
    physical plan must carry the filter, and results must be identical
    with it on and off."""
    from django_datastream_spark.sources.testdata import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    sf = "/root/testdata/sf0.001"

    def shape():
        li = load_table(spark, sf, "lineitem")
        od = load_table(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey")
        return li.join(
            od, li["l_orderkey"] == od["o_orderkey"]
        ).agg(F.sum("l_extendedprice").alias("s"), F.count(F.lit(1)).alias("n"))

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = shape()
        ex = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in ex, "runtime bloom filter not injected"
        with_bloom = j.collect()[0]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        without = shape().collect()[0]
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    assert with_bloom["n"] == without["n"]
    assert abs(with_bloom["s"] - without["s"]) < 1e-6


def test_dynamic_partition_pruning_inserts_runtime_filter(spark, tmp_path):
    """Joining a day-partitioned fact to a filtered dim on the
    partition column must insert a DPP filter (dynamicpruning
    subquery) so the fact scan reads only the dim-selected partitions
    — the optimization that makes star-schema queries cheap at 100 TB.
    Note the dim predicate must be 'likely selective' (equality/IN/
    comparison); a bare boolean attribute does NOT qualify under
    Spark's isLikelySelective, which is itself worth pinning."""
    from pyspark.sql import functions as F

    fact = spark.range(0, 200_000).select(
        (F.col("id") % 100).cast("int").alias("d"),
        (F.col("id") * 2.0).alias("v"),
    )
    fact.write.partitionBy("d").parquet(str(tmp_path / "fact"))
    spark.createDataFrame(
        [(i, "a" if i == 3 else "b") for i in range(100)],
        "d int, grp string",
    ).write.parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    dm = spark.read.parquet(str(tmp_path / "dim")).filter(
        F.col("grp") == "a"
    )
    j = f.join(dm, "d").agg(F.sum("v").alias("s"))
    opt = j._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in opt.lower()
    # and the pruned result is right: only d == 3 rows contribute
    expect = sum(i * 2.0 for i in range(200_000) if i % 100 == 3)
    assert abs(j.collect()[0]["s"] - expect) < 1e-6


def test_pagerank_iterations_reuse_edge_exchange(spark):
    """q145 references the edge/out-weight frame in all three
    iterations: the executed plan must contain ReusedExchange nodes
    (Spark dedups the identical shuffle subtrees) rather than
    recomputing the co-occurrence join per iteration."""
    from django_datastream_spark.plans import declared

    from .conftest import SF_SMOKE

    df = declared.QUERIES["q145_token_pagerank"](spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_observation_metrics_ride_the_job(spark):
    """`df.observe` collects pipeline metrics (row counts, sums) as a
    side-channel of the SAME job — the zero-extra-scan observability
    hook an ingest pipeline attaches to every batch (vs. a separate
    count() that doubles the read)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE
    from django_datastream_spark.sources.testdata import load_table

    obs = Observation("ingest_metrics")
    ev = load_table(spark, SF_SMOKE, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_values"),
        F.count_if(F.col("value").isNull()).alias("n_null"),
    )
    agged = ev.groupBy("event_type").count()
    result = {r["event_type"]: r["count"] for r in agged.collect()}
    m = obs.get
    assert m["n_rows"] == sum(result.values()) and m["n_rows"] > 0
    assert m["n_values"] + m["n_null"] == m["n_rows"]


def _each_window_is_bounded_below(plan: str, name: str) -> None:
    """Every rank Window in ``plan`` must be fed by a bounding node
    (TakeOrderedAndProject via LimitPushDownThroughWindow, or
    WindowGroupLimit) BEFORE any single-partition exchange — i.e. the
    window's sort input is top-k-bounded, never the full relation
    funneled to one reducer."""
    idx = 0
    found = 0
    while True:
        w = plan.find("Window [", idx)
        if w < 0:
            break
        found += 1
        below = plan[w:]
        cands = [
            p
            for p in (
                below.find("TakeOrderedAndProject"),
                below.find("WindowGroupLimit"),
            )
            if p >= 0
        ]
        assert cands, f"{name}: Window at {w} has no bounding node below"
        bound = min(cands)
        seg = below[:bound]
        assert "Exchange SinglePartition" not in seg, (
            f"{name}: global single-partition funnel feeds the window"
        )
        idx = w + 8
    if found == 0:
        # no rank window at all — acceptable only because the top-k
        # bound is enforced directly (the strictly stronger plan)
        assert "TakeOrderedAndProject" in plan, (
            f"{name}: neither a bounded Window nor a TakeOrdered top-k"
        )


def test_rank_windows_are_bounded_not_global_sorts(spark):
    """Plan-pin for the bounded-window guarantees (VERDICT r5 #6):
    the doc-claims 'top-200 TakeOrdered feeds the BM25/RRF rank
    window' and 'initial_centroids' rank is limit-bounded' become
    plan assertions, so a Catalyst regression or a refactor dropping
    the rank<=k filter adjacency can't silently reintroduce a
    single-partition corpus sort."""
    for name in ("q110_zipf_slope", "q137_bm25_search", "q148_hybrid_rrf"):
        _each_window_is_bounded_below(plan_of(spark, name), name)


def test_initial_centroids_rank_is_limit_bounded(spark):
    from django_datastream_spark.operators import clustering as cl

    vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    plan = (
        cl.initial_centroids(vecs, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    _each_window_is_bounded_below(plan, "initial_centroids")
    assert "TakeOrderedAndProject(limit=5" in plan


def test_runtime_bloom_filter_injects_on_shuffle_join(spark):
    """Spark's runtime bloom-filter injection is the engine's
    large-large join prefilter at 100 TB (the dim side's selective
    filter becomes a might_contain() on the fact side's scan, killing
    most probe rows before the shuffle).  Pin that it actually fires
    under this session's config when the thresholds are met — a
    silently-disabled optimizer flag would cost an order of magnitude
    on selective fact-dim shuffle joins and nothing would fail.
    Requirements pinned implicitly: a SELECTIVE predicate on the
    creation side (bare scans don't qualify) and a shuffle join
    (broadcast joins use their own pruning)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        big = spark.range(0, 200_000).withColumn("k", F.col("id") % 50_000)
        small = spark.range(0, 100).withColumn("k", F.col("id") * 7)
        j = big.join(small.filter(F.col("id") % 3 == 0), "k")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_triangle_counting_reuses_oriented_exchange(spark):
    """q163's oriented-edge subtree feeds three consumers; the wedge
    self-join's two sides must collapse via ReuseExchange (same key,
    same subtree) rather than recomputing the whole orientation chain
    per reference."""
    df = declared.QUERIES["q163_triangle_counts"](spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_q130_dedup_and_selfjoin_share_one_exchange(spark):
    """q130's (l_orderkey, l_partkey) dedup rides an orderkey-keyed
    repartition so the dropDuplicates and both self-join sides share
    ONE exchange per side (r11; the redundant scatter fan-out under the
    keyed repartition was dropped in r12 — VERDICT r11 #3): the
    pre-execution plan must show no extra ENSURE_REQUIREMENTS exchange
    below the join and no RoundRobin fan-out, and at runtime the b-side
    must collapse to a ReusedExchange of the a-side's repartition."""
    plan = fplan_of(spark, "q130_copurchase_pairs")
    assert plan.count("REPARTITION_BY_COL") == 2  # one per join side
    # the only ENSURE_REQUIREMENTS exchange is the final (pa, pb) agg's
    assert plan.count("ENSURE_REQUIREMENTS") == 1
    assert "RoundRobinPartitioning" not in plan  # scatter collapsed

    df = declared.QUERIES["q130_copurchase_pairs"](spark, SF_SMOKE)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_q166_scalar_broadcast_and_anti_join(spark):
    """TPC-H Q22 shape: the global-average threshold must be a 1-row
    broadcast onto the customer scan (never a correlated per-row
    subquery) and NOT EXISTS must lower to a hash LEFT ANTI join with
    the orders scan pruned to the custkey/date columns."""
    plan = plan_of(spark, "q166_dormant_rich_customers")
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "o_comment" not in plan  # orders scan pruned


def test_scatter_width_derives_from_input_bytes(spark):
    """r12 (VERDICT r11 #4): the compute fan-out sizes itself from input
    bytes (ceil(bytes / split), capped at parallelism) instead of a flat
    defaultParallelism, and stays a no-op above the scale guard."""
    from django_datastream_spark.sources.testdata import (
        scatter_for_compute,
    )

    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000)
    # tiny input: ~594 KB at the default 64 KB split -> 10 ways (not par)
    w = scatter_for_compute(df, 594_000).rdd.getNumPartitions()
    assert w == min(par, 10), w
    # sub-split input never over-fans
    assert scatter_for_compute(df, 1_000).rdd.getNumPartitions() == 1
    # at-scale input: guard short-circuits, no exchange added
    big = scatter_for_compute(df, par * 128 * 1024 * 1024)
    assert big is df
    # unknown size keeps the full fan-out (legacy behavior)
    assert scatter_for_compute(df).rdd.getNumPartitions() == par
