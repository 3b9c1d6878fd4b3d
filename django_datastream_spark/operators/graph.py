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
