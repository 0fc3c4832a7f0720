"""Vertex reordering (algos/order.py): bijection, BFS validity,
parallelism invariance, and the density win the ordering exists for."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import random_graph
from webgraph_spark.algos.order import (
    bfs_levels,
    bfs_order,
    degree_order,
    permute_edges,
)


@pytest.fixture(scope="module")
def graph(spark):
    src, dst = random_graph(120, 400, seed=17)
    # add a second, disconnected component (ids 200..219 in a ring)
    ring_src = np.arange(200, 220)
    ring_dst = np.concatenate([np.arange(201, 220), [200]])
    src = np.concatenate([src, ring_src])
    dst = np.concatenate([dst, ring_dst])
    e = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    return e.persist()


def _assert_bijection(mapping_rows, n):
    new_ids = sorted(r["new_id"] for r in mapping_rows)
    assert new_ids == list(range(n))
    assert len({r["vertex_id"] for r in mapping_rows}) == n


class TestDegreeOrder:
    def test_bijection_and_monotone_degree(self, spark, graph):
        m = degree_order(graph).collect()
        und = graph.unionAll(graph.select("dst", "src"))
        deg = {
            r["v"]: r["d"]
            for r in und.groupBy(F.col("src").alias("v"))
            .agg(F.count("*").alias("d"))
            .collect()
        }
        _assert_bijection(m, len(deg))
        by_new = sorted(m, key=lambda r: r["new_id"])
        degs = [deg[r["vertex_id"]] for r in by_new]
        assert degs == sorted(degs, reverse=True)
        # ties broken by ascending old id
        for a, b in zip(by_new, by_new[1:]):
            if deg[a["vertex_id"]] == deg[b["vertex_id"]]:
                assert a["vertex_id"] < b["vertex_id"]

    def test_parallelism_invariance(self, spark, graph):
        """dense_ids ranking is identical at any partition count —
        the property that makes the ordering safe to recompute on a
        different cluster size."""
        base = sorted(
            (r["vertex_id"], r["new_id"]) for r in degree_order(graph).collect()
        )
        was = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            alt = sorted(
                (r["vertex_id"], r["new_id"])
                for r in degree_order(graph).collect()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", was)
        assert base == alt


class TestBfsOrder:
    def test_levels_are_bfs_distances(self, spark, graph):
        lv = {r["v"]: (r["root"], r["dist"]) for r in bfs_levels(graph).collect()}
        und = {}
        for r in graph.collect():
            und.setdefault(r["src"], set()).add(r["dst"])
            und.setdefault(r["dst"], set()).add(r["src"])
        # reference BFS per component (driver-side, test-only)
        comps = {}
        for v in sorted(und):
            if v in comps:
                continue
            frontier, d = [v], 0
            seen = {v: d}
            while frontier:
                nxt = []
                for u in frontier:
                    for w in und[u]:
                        if w not in seen:
                            seen[w] = d + 1
                            nxt.append(w)
                frontier, d = nxt, d + 1
            for u, dist in seen.items():
                comps[u] = (v, dist)
        assert lv == comps

    def test_order_contiguous_components_and_layers(self, spark, graph):
        m = bfs_order(graph).collect()
        lv = {r["v"]: (r["root"], r["dist"]) for r in bfs_levels(graph).collect()}
        _assert_bijection(m, len(lv))
        by_new = sorted(m, key=lambda r: r["new_id"])
        keys = [lv[r["vertex_id"]] + (r["vertex_id"],) for r in by_new]
        assert keys == sorted(keys)  # (root, dist, old id) ascending


class TestPermute:
    def test_roundtrip_through_inverse(self, spark, graph):
        m = degree_order(graph)
        inv = m.select(
            F.col("new_id").alias("vertex_id"), F.col("vertex_id").alias("new_id")
        )
        back = permute_edges(permute_edges(graph, m), inv)
        orig = sorted((r["src"], r["dst"]) for r in graph.collect())
        got = sorted((r["src"], r["dst"]) for r in back.collect())
        assert got == orig

    def test_broadcast_matches_shuffle(self, spark, graph):
        m = degree_order(graph)
        a = sorted(map(tuple, permute_edges(graph, m, broadcast=True).collect()))
        b = sorted(map(tuple, permute_edges(graph, m, broadcast=False).collect()))
        assert a == b


def test_degree_order_improves_bv_density(spark):
    """The win the operator exists for: a hub whose leaves are scattered
    over the id space compresses badly (large ζ residual gaps); degree
    order gives the hub id 0 and its leaves a contiguous range, which
    the BV intervalizer collapses. Deterministic construction, exact
    bit counts via encode_graph."""
    from webgraph_spark.bvgraph import encode_graph

    rng = np.random.default_rng(7)
    leaves = np.sort(rng.choice(np.arange(1, 5000), size=200, replace=False))
    hub = 2500
    leaves = leaves[leaves != hub]
    edges = [(hub, int(x)) for x in leaves] + [
        (int(x), hub) for x in leaves[::4]
    ]
    e = spark.createDataFrame(edges, "src long, dst long")

    def bits(edge_rows):
        adj = {}
        for s, d in edge_rows:
            adj.setdefault(s, []).append(d)
        n = max(max(s, d) for s, d in edge_rows) + 1
        it = ((v, sorted(adj.get(v, []))) for v in range(n))
        _, offs, _ = encode_graph(it, n)
        return offs[-1]

    before = bits([(r["src"], r["dst"]) for r in e.collect()])
    permuted = permute_edges(e, degree_order(e), broadcast=True)
    after = bits([(r["src"], r["dst"]) for r in permuted.collect()])
    assert after < before * 0.6
