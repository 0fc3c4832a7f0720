"""Graph algorithms vs numpy per-vertex fixtures (north-rule parity:
PageRank allclose 1e-6, components/labels/triangles exact)."""

import numpy as np
import pytest

from tests.reference_impls import (
    components_np,
    label_prop_np,
    pagerank_np,
    triangles_np,
)
from webgraph_spark.algos import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_counts,
)


def _vertices(spark, n):
    return spark.range(n).selectExpr("id as vertex_id")


def test_pagerank_matches_fixture(spark, small_graph):
    edges, n, src, dst = small_graph
    ranks, info = pagerank(edges, vertices=_vertices(spark, n), tol=1e-6)
    assert info["converged"]
    got = np.zeros(n)
    for r in ranks.collect():
        got[r.vertex_id] = r.rank
    exp = pagerank_np(n, src, dst, tol=1e-6)
    np.testing.assert_allclose(got, exp, atol=1e-6, rtol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-6  # probability mass conserved


def test_pagerank_salted_identical(spark, skew_graph):
    edges, n, src, dst = skew_graph
    plain, _ = pagerank(edges, vertices=_vertices(spark, n), tol=1e-6)
    salted, _ = pagerank(
        edges, vertices=_vertices(spark, n), tol=1e-6, salt_threshold=20
    )
    a = {r.vertex_id: r.rank for r in plain.collect()}
    b = {r.vertex_id: r.rank for r in salted.collect()}
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9


def test_connected_components_exact(spark, small_graph):
    edges, n, src, dst = small_graph
    comps, info = connected_components(edges, vertices=_vertices(spark, n))
    assert info["converged"]
    got = {r.vertex_id: r.component_id for r in comps.collect()}
    exp = components_np(n, src, dst)
    assert len(got) == n
    for v in range(n):
        assert got[v] == exp[v], f"vertex {v}"


def test_connected_components_two_islands(spark):
    # two disjoint chains + one isolated vertex
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (6, 7)], "src long, dst long"
    )
    comps, _ = connected_components(e, vertices=_vertices(spark, 9))
    got = {r.vertex_id: r.component_id for r in comps.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5, 3: 3, 4: 4, 8: 8}


def test_label_propagation_matches_fixture(spark, small_graph):
    edges, n, src, dst = small_graph
    labels, _ = label_propagation(edges, vertices=_vertices(spark, n), max_iter=10)
    got = {r.vertex_id: r.label for r in labels.collect()}
    exp = label_prop_np(n, src, dst, max_iter=10)
    assert len(got) == n
    mismatches = [v for v in range(n) if got[v] != exp[v]]
    assert mismatches == []


def test_triangles_match_fixture(spark, small_graph):
    edges, n, src, dst = small_graph
    per_v, total = triangle_counts(edges, vertices=_vertices(spark, n))
    exp_counts, exp_total = triangles_np(n, src, dst)
    assert total.first()["n_triangles"] == exp_total
    got = {r.vertex_id: r.tri_count for r in per_v.collect()}
    for v in range(n):
        assert got[v] == exp_counts[v], f"vertex {v}"


def test_triangles_known_clique(spark):
    # K4 = 4 triangles, each vertex in 3
    e = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(e, "src long, dst long")
    per_v, total = triangle_counts(edges)
    assert total.first()["n_triangles"] == 4
    assert {r.tri_count for r in per_v.collect()} == {3}


@pytest.mark.parametrize("algo_seed", [101, 202])
def test_permutation_invariance_pagerank(spark, algo_seed):
    """Relabeling vertices permutes scores identically (analog of the
    reference's permuted cnr-2000 test, src/ascii_graph/tests.rs:125-163)."""
    from tests.conftest import random_graph

    n = 120
    src, dst = random_graph(n, 600, seed=algo_seed)
    rng = np.random.default_rng(algo_seed)
    perm = rng.permutation(n)
    e1 = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst)], "src long, dst long"
    )
    e2 = spark.createDataFrame(
        [(int(perm[a]), int(perm[b])) for a, b in zip(src, dst)], "src long, dst long"
    )
    r1, _ = pagerank(e1, vertices=_vertices(spark, n), tol=1e-9, max_iter=60)
    r2, _ = pagerank(e2, vertices=_vertices(spark, n), tol=1e-9, max_iter=60)
    a = np.zeros(n)
    b = np.zeros(n)
    for r in r1.collect():
        a[r.vertex_id] = r.rank
    for r in r2.collect():
        b[r.vertex_id] = r.rank
    np.testing.assert_allclose(a, b[perm], atol=1e-9)


def test_permutation_invariance_components_and_triangles(spark):
    """Relabeling preserves component partitions and triangle totals
    (analog of the reference's permuted cnr-2000 iteration checks,
    src/ascii_graph/tests.rs:125-163)."""
    from tests.conftest import random_graph
    from webgraph_spark.algos.triangles_csr import triangle_total_csr

    n = 150
    src, dst = random_graph(n, 700, seed=77)
    rng = np.random.default_rng(77)
    perm = rng.permutation(n)
    e1 = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst)], "src long, dst long"
    )
    e2 = spark.createDataFrame(
        [(int(perm[a]), int(perm[b])) for a, b in zip(src, dst)], "src long, dst long"
    )
    # components: the PARTITION must map through perm (ids differ — the
    # min-id representative changes under relabeling)
    c1, _ = connected_components(e1)
    c2, _ = connected_components(e2)
    m1 = {r.vertex_id: r.component_id for r in c1.collect()}
    m2 = {r.vertex_id: r.component_id for r in c2.collect()}
    groups1 = {}
    for v, c in m1.items():
        groups1.setdefault(c, set()).add(int(perm[v]))
    groups2 = {}
    for v, c in m2.items():
        groups2.setdefault(c, set()).add(v)
    assert sorted(map(sorted, groups1.values())) == sorted(map(sorted, groups2.values()))
    # triangle totals are permutation-invariant, on both implementations
    _, t1 = triangle_counts(e1)
    _, t2 = triangle_counts(e2)
    assert t1.first()["n_triangles"] == t2.first()["n_triangles"]
    assert (
        triangle_total_csr(e2).first()["n_triangles"]
        == t1.first()["n_triangles"]
    )
