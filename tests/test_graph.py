"""Graph operators (operators/graph.py): degree-oriented triangle
counting against hand-enumerable graphs, including the hub-skew case
the orientation exists for."""

from __future__ import annotations

from itertools import combinations

from django_datastream_spark.operators.graph import (
    orient_edges,
    triangle_counts,
)


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


def test_k4_every_node_in_three_triangles(spark):
    # K4 has 4 triangles; each node participates in C(3,2) = 3
    edges = [(a, b) for a, b in combinations(range(4), 2)]
    assert _counts(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_plus_tail_and_square(spark):
    # one triangle {0,1,2}, a tail 2-3, and a triangle-free square 4-7
    edges = [(0, 1), (1, 2), (0, 2), (2, 3),
             (4, 5), (5, 6), (6, 7), (4, 7)]
    assert _counts(spark, edges) == {0: 1, 1: 1, 2: 1}


def test_hub_skew_counts_exactly_once(spark):
    # star hub 0 connected to 1..12, plus a ring among the leaves:
    # triangles are exactly (0, i, i+1) for each ring edge
    leaves = list(range(1, 13))
    ring = [(i, i + 1) for i in leaves[:-1]] + [(1, 12)]
    edges = [(0, i) for i in leaves] + ring
    got = _counts(spark, edges)
    assert got[0] == len(ring)
    assert all(got[i] == 2 for i in leaves)  # each leaf: two ring edges
    # orientation bounds the hub's fan-out: the hub has max degree, so
    # every star edge points TOWARD it and its oriented out-degree is 0
    o = orient_edges(spark.createDataFrame(edges, "a long, b long"))
    assert o.filter("src = 0").count() == 0


def test_orientation_drops_self_loops_and_is_total(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3)], "a long, b long"
    )
    o = orient_edges(df).collect()
    assert len(o) == 2
    assert all(r["src"] != r["dst"] for r in o)


def test_k_core_matches_naive_peeling(spark):
    import random

    from django_datastream_spark.operators.graph import k_core

    rng = random.Random(11)
    nodes = list(range(30))
    edges = set()
    # random graph + one planted 5-clique to force a >=4 core
    for _ in range(45):
        u, v = rng.sample(nodes, 2)
        edges.add((min(u, v), max(u, v)))
    for i in range(5):
        for j in range(i + 1, 5):
            edges.add((100 + i, 100 + j))
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    got = {r["node"]: r["core"] for r in k_core(df).collect()}

    # naive reference peeling: peel nodes with remaining degree < k
    # (including nodes isolated by earlier peels) until none remain
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    k = 1
    while adj:
        while True:
            low = [n for n, ns in adj.items() if len(ns) < k]
            if not low:
                break
            for n in low:
                want[n] = k - 1
                for m in adj.pop(n):
                    adj[m].discard(n)
        k += 1
        if k > 100:
            raise AssertionError("naive peeling did not converge")
    assert got == want
    assert all(got[100 + i] == 4 for i in range(5))  # planted clique


def test_k_core_empty_graph_keeps_node_type_of_edges(spark):
    from django_datastream_spark.operators.graph import k_core

    # string node ids, no edges survive the self-loop filter: the
    # empty result must carry the EDGE column's type, not long
    df = spark.createDataFrame([("u", "u")], "a string, b string")
    out = k_core(df)
    assert out.schema["node"].dataType.simpleString() == "string"
    assert out.count() == 0
