"""Distributed graph operators on edge DataFrames.

Graph surface so far lives where its consumers are: PageRank as a
declared plan (plans/extensions q145), connected components as the
dedup fixpoint (operators/dedup.py).  This module holds the
general-purpose pieces, starting with triangle counting — the
canonical "make a quadratic join scale" pattern.

Triangle counting (``triangle_counts``) uses DEGREE ORIENTATION
(Cohen 2009 / the MapReduce "node-iterator++"): orient every
undirected edge from its lower-(degree, id) endpoint to its higher
one.  Each triangle then has exactly ONE wedge rooted at its
lowest-rank vertex, so

- the wedge self-join on ``src`` emits each candidate exactly once
  (no 3x overcount, no dedup pass), and
- per-key join fan-out is bounded by the maximum ORIENTED out-degree,
  which is O(sqrt(m)) for any graph — a power-law hub with degree
  100k contributes wedges by its sqrt(m)-bounded out-neighbourhood,
  not its full neighbourhood.  That bound is what makes the shape
  survive skewed graphs at 100 TB.

All steps are hash equi-joins and aggregations — no driver loops, no
broadcast requirement (AQE may still choose broadcast for a small
degree table).

Plan-shape note: the oriented-edge subtree feeds three consumers
(both wedge sides + the closing probe). The wedge self-join's two
sides shuffle on the SAME key over the SAME subtree, so Catalyst's
ReuseExchange collapses them (pinned in tests/test_plans.py); the
closing join shuffles on a different key and re-derives the subtree
once more. Total work is therefore a small constant number of passes
over the edge list — linear in m, never exponential in the number of
plan references.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orient_edges(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Undirected (a, b) edges -> degree-oriented (src, dst, dst_deg)
    with src the lower-(degree, id) endpoint. Input must be canonical
    (one row per undirected edge); self-loops are dropped."""
    e = edges.select(a, b).filter(F.col(a) != F.col(b))
    deg = (
        e.select(F.col(a).alias("n"))
        .unionAll(e.select(F.col(b).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    j = (
        e.join(deg.withColumnRenamed("n", a).withColumnRenamed("d", "da"), a)
        .join(deg.withColumnRenamed("n", b).withColumnRenamed("d", "db"), b)
    )
    a_first = F.struct(F.col("da"), F.col(a)) < F.struct(F.col("db"), F.col(b))
    return j.select(
        F.when(a_first, F.col(a)).otherwise(F.col(b)).alias("src"),
        F.when(a_first, F.col(b)).otherwise(F.col(a)).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )


def triangle_counts(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation counts over undirected canonical
    (a, b) edges -> (node, n_triangles), nodes in >= 1 triangle.

    wedges: oriented edges self-joined on src, ordered by the same
    (deg, id) rank so each unordered out-pair appears once; closed by
    one more equi-join against the oriented edges (the closing edge is
    necessarily oriented lower-rank -> higher-rank, so no OR-of-two
    probes).  Triangle corners then explode to nodes and hash-agg."""
    o = orient_edges(edges, a, b)
    o1 = o.select(
        F.col("src").alias("w_src"),
        F.col("dst").alias("v"),
        F.col("dst_deg").alias("v_deg"),
    )
    o2 = o.select(
        F.col("src").alias("w_src"),
        F.col("dst").alias("w"),
        F.col("dst_deg").alias("w_deg"),
    )
    wedges = o1.join(o2, "w_src").filter(
        F.struct(F.col("v_deg"), F.col("v"))
        < F.struct(F.col("w_deg"), F.col("w"))
    )
    closing = o.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"])
    nodes = tri.select(
        F.explode(F.array("w_src", "v", "w")).alias("node")
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def k_core(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Core decomposition over undirected canonical (a, b) edges ->
    (node, core) for every node with >= 1 edge (isolated nodes are
    core 0 and never appear in an edge list).

    Distributed peeling: repeatedly drop nodes whose remaining degree
    is < k (each drop assigns core = k-1), until the node set empties.
    Like connected components (q45 family), the convergence loop is
    driver-side BY NECESSITY — Spark has no recursive SQL — but every
    round is one degree hash-agg plus anti-joins, each round's edge
    set is lineage-truncated with an eager localCheckpoint (the CC
    fixpoint's discipline — a growing logical plan, not the data, is
    what kills iterative jobs), and the round count is bounded by the
    peel-wave count (<= degeneracy + chain depth of the graph — tiny
    for real corpora: web graphs ~ hundreds), never by node count.

    Optimization r11 (guide §1.2 — fewer driver-orchestrated jobs per
    round): ONE materialization per peel wave. Each round checkpoints
    the surviving nodes' degree table once and reads both the stage
    jump and the peel set from it: dmin >= k means stages (k, dmin]
    would peel nothing, so jump straight to k = dmin + 1 (the first
    stage that removes anything — every round now peels at least one
    node); low = degree < k is a cheap filter over the persisted
    degrees. The pre-r11 shape ran an inner fixpoint per stage whose
    last iteration always peeled nothing and re-aggregated degrees a
    third time for the jump probe — ~6 jobs per stage vs 4 per wave
    now, with identical peel order (k only advances once nothing
    remains below it, the same invariant; pinned by test_graph and the
    q190 closed-form oracle). Peeling removes nodes in NON-INCREASING
    edge volume, so per-round cost shrinks monotonically."""
    e = (
        edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    # the surviving NODE set is tracked separately from the edge set: a
    # node whose last edge disappears mid-peel still exists and must be
    # assigned core k-1 at the stage that isolated it (star centers,
    # tree roots — the easy-to-lose case)
    nodes = (
        e.select(F.col("x").alias("n"))
        .unionAll(e.select(F.col("y").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cores = []
    k = 1
    empty = nodes.isEmpty()
    while not empty:
        deg = (
            e.select(F.col("x").alias("n"))
            .unionAll(e.select(F.col("y").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        degs = (
            nodes.join(deg, "n", "left")
            .select("n", F.coalesce(F.col("d"), F.lit(0)).alias("d"))
            .localCheckpoint(eager=True)
        )
        # ONE driver read per wave: the (tiny — <= max degree + 1 rows)
        # degree histogram yields the stage jump, the peel size, AND the
        # termination test, replacing the separate min-probe and
        # isEmpty jobs of the stepwise shape
        hist = {
            r["d"]: r["c"]
            for r in degs.groupBy("d")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        dmin = min(hist)
        if dmin >= k:
            # no surviving node is below any stage in (k, dmin] — jump
            # to the first stage that peels (exact: all degrees >= dmin)
            k = int(dmin) + 1
        low = degs.filter(F.col("d") < k).select("n")
        cores.append(
            low.select(
                F.col("n").alias("node"),
                F.lit(k - 1).cast("int").alias("core"),
            )
        )
        n_low = sum(c for d, c in hist.items() if d < k)
        empty = n_low == sum(hist.values())
        if empty:
            break  # last wave peels everyone — no survivor state to build
        # survivors derive from the PERSISTED degree table (a filter,
        # not a new checkpoint); only the edge set needs materializing
        nodes = degs.filter(F.col("d") >= k).select("n")
        e = (
            e.join(low.withColumnRenamed("n", "x"), "x", "left_anti")
            .join(low.withColumnRenamed("n", "y"), "y", "left_anti")
            .select("x", "y")
            .localCheckpoint(eager=True)
        )
    if not cores:
        # empty graph: node type must still follow the edge columns
        # (string ids etc.), not a hardcoded long (r7 ADVICE)
        node_t = edges.schema[a].dataType.simpleString()
        return spark.createDataFrame([], f"node {node_t}, core int")
    from functools import reduce

    return reduce(lambda p, q: p.unionByName(q), cores)
