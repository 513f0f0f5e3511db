"""Fixed-point PageRank (operators/graph.py): matches a float reference
within fixed-point truncation error, and is bit-identical across parallelism
(the property floating-point PageRank lacks). The sf0.01 DuckDB parity runs
via tests/test_entry_contract.py (query ``pagerank_fixed_point``)."""

import pytest

from suckit_spark.operators import graph

SCALE = 10**12

# a small digraph with a hub (0), a cycle (1->2->3->1) and a dangling node 4
EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 1), (3, 4)]


def _float_pagerank(edges, iters, d=0.85, r0=1.0):
    import math

    nodes = sorted({u for e in edges for u in e})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {v: r0 for v in nodes}
    for _ in range(iters):
        nxt = {v: (1 - d) * r0 for v in nodes}
        for u, v in edges:
            nxt[v] += d * r[u] / out[u]
        r = nxt
    return r


def test_matches_float_reference_within_truncation(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in
           graph.pagerank_fixed_point(e, iters=4).collect()}
    want = _float_pagerank(EDGES, iters=4)
    assert set(got) == set(want)
    for v in want:
        # truncating division loses < 1 unit per edge per iteration
        assert abs(got[v] / SCALE - want[v]) < 1e-9


def test_dangling_node_keeps_teleport_rank(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in
           graph.pagerank_fixed_point(e, iters=3).collect()}
    # node 4 has an in-edge but no out-edges: it accumulates rank and leaks
    # its mass (documented simplification); node 0 has no in-edges at all,
    # so after round 1 it sits exactly at the teleport base.
    assert got[0] == (SCALE * 15) // 100


def test_bit_identical_across_parallelism(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted((r.node, r.rank) for r in
                   graph.pagerank_fixed_point(e, iters=5).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted((r.node, r.rank) for r in
                   graph.pagerank_fixed_point(e.repartition(7),
                                              iters=5).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_checkpoint_every_flattens_lineage(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    out = graph.pagerank_fixed_point(e, iters=4, checkpoint_every=2)
    base = graph.pagerank_fixed_point(e, iters=4)
    assert sorted((r.node, r.rank) for r in out.collect()) == \
        sorted((r.node, r.rank) for r in base.collect())
