"""Checkpoint/resume: truncate after iteration k, relaunch, identical
final scores, earlier supersteps not recomputed (FIXTURES.md F5)."""

import numpy as np

from webgraph_spark.algos.pagerank import pagerank
from webgraph_spark.checkpoint import CheckpointManager


def test_pagerank_resume_identical(spark, small_graph, tmp_path):
    edges, n, src, dst = small_graph
    verts = spark.range(n).selectExpr("id as vertex_id")

    full_ck = CheckpointManager(str(tmp_path / "full"), run_id="full")
    full, info_full = pagerank(edges, vertices=verts, tol=1e-6, ckpt=full_ck)
    assert info_full["converged"]
    total_iters = info_full["iterations"]
    assert total_iters > 5

    # second run into its own dir, truncated after iteration k
    ck = CheckpointManager(str(tmp_path / "resume"), run_id="r1")
    _, _ = pagerank(edges, vertices=verts, tol=1e-6, ckpt=ck)
    k = total_iters // 2
    ck.truncate_after("pagerank", k)
    assert ck.latest("pagerank")[0] == k

    n_metrics_before = len([m for m in ck.metrics() if m["algo"] == "pagerank"])
    resumed, info_res = pagerank(
        edges, vertices=verts, tol=1e-6, ckpt=ck, resume=True
    )
    assert info_res["converged"]
    # resumed run only executed the remaining supersteps
    new_metrics = [m for m in ck.metrics() if m["algo"] == "pagerank"]
    recomputed = len(new_metrics) - n_metrics_before
    assert recomputed <= total_iters - k
    assert min(m["iteration"] for m in new_metrics[n_metrics_before:]) > k

    a = np.zeros(n)
    b = np.zeros(n)
    for r in full.collect():
        a[r.vertex_id] = r.rank
    for r in resumed.collect():
        b[r.vertex_id] = r.rank
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_metrics_have_partition_lineage(spark, small_graph, tmp_path):
    edges, n, src, dst = small_graph
    verts = spark.range(n).selectExpr("id as vertex_id")
    ck = CheckpointManager(str(tmp_path / "m"), run_id="m1")
    pagerank(edges, vertices=verts, tol=1e-4, max_iter=5, ckpt=ck)
    ms = ck.metrics()
    assert ms
    for m in ms:
        assert m["run_id"] == "m1"
        assert "wall_ms" in m and m["wall_ms"] > 0
        assert "partitions" in m and len(m["partitions"]) >= 1
        assert sum(p["rows"] for p in m["partitions"]) == m["rows"] == n
