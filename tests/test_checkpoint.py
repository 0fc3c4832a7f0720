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


def test_cc_and_lp_resume_identical(spark, small_graph, tmp_path):
    """CC and LP resumed mid-run finish with identical results and do
    not recompute completed rounds."""
    from webgraph_spark.algos.components import connected_components
    from webgraph_spark.algos.labelprop import label_propagation
    from webgraph_spark.checkpoint import CheckpointManager

    edges, n, src, dst = small_graph

    # --- connected components -----------------------------------------
    want = {
        (r.vertex_id, r.component_id)
        for r in connected_components(edges)[0].collect()
    }
    ck = CheckpointManager(str(tmp_path / "cc"))
    connected_components(edges, max_iter=2, ckpt=ck)          # partial run
    n_before = len(ck.metrics())
    comps, info = connected_components(edges, ckpt=ck, resume=True)
    got = {(r.vertex_id, r.component_id) for r in comps.collect()}
    assert got == want
    new = ck.metrics()[n_before:]
    assert new and min(m["iteration"] for m in new if m["algo"] == "cc") >= 2

    # --- label propagation --------------------------------------------
    want_lp = {
        (r.vertex_id, r.label)
        for r in label_propagation(edges, max_iter=6)[0].collect()
    }
    ck2 = CheckpointManager(str(tmp_path / "lp"))
    label_propagation(edges, max_iter=3, ckpt=ck2)            # partial run
    n_before = len(ck2.metrics())
    labels, _ = label_propagation(edges, max_iter=6, ckpt=ck2, resume=True)
    got_lp = {(r.vertex_id, r.label) for r in labels.collect()}
    assert got_lp == want_lp
    new = ck2.metrics()[n_before:]
    assert new and min(m["iteration"] for m in new if m["algo"] == "lp") >= 3


def test_converged_state_durable_with_sparse_ckpt(spark, small_graph, tmp_path):
    """ADVICE r01: with ckpt_every > 1 an early convergence break used
    to leave the terminal ranks only locally checkpointed; the save on
    the break must make latest() report the converged iteration."""
    from webgraph_spark.algos.pagerank import pagerank
    from webgraph_spark.checkpoint import CheckpointManager

    edges, n, src, dst = small_graph
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ranks, info = pagerank(
        edges, tol=1e-3, max_iter=50, ckpt=ckpt, ckpt_every=7
    )
    assert info["converged"]
    last = ckpt.latest("pagerank")
    assert last is not None
    assert last[0] == info["iterations"] - 1  # terminal superstep durable
    reloaded = ckpt.load(spark, "pagerank", last[0])
    got = {r.vertex_id: r.rank for r in reloaded.select("vertex_id", "rank").collect()}
    want = {r.vertex_id: r.rank for r in ranks.collect()}
    assert got == want


def test_checkpoint_uri_requires_active_session(tmp_path):
    # a URI checkpoint dir routes bookkeeping through the Hadoop
    # FileSystem API, which needs the JVM gateway of a live session
    import pytest as _pytest
    from pyspark.sql import SparkSession

    from webgraph_spark.checkpoint import CheckpointManager

    if SparkSession.getActiveSession() is None:
        with _pytest.raises(ValueError):
            CheckpointManager("s3a://bucket/ckpt")


def test_resume_from_file_uri_checkpoint_dir(spark, small_graph, tmp_path):
    """VERDICT r02 'do this' #9: a scheme-bearing checkpoint dir
    (file:// here — same code path as s3a://hdfs://, resolved by the
    Hadoop FileSystem API) must resume from iteration k, record
    metrics, and truncate."""
    edges, n, src, dst = small_graph
    verts = spark.range(n).selectExpr("id as vertex_id")
    base = f"file://{tmp_path}/uri_ck"
    ck = CheckpointManager(base, run_id="uri1")

    full, info_full = pagerank(edges, vertices=verts, tol=1e-6, ckpt=ck)
    assert info_full["converged"]
    # materialize now: `full` is lazily backed by the terminal snapshot,
    # which the truncate below deletes
    want = {r.vertex_id: r.rank for r in full.collect()}
    total_iters = info_full["iterations"]
    k = total_iters // 2
    ck.truncate_after("pagerank", k)
    assert ck.latest("pagerank")[0] == k

    n_before = len([m for m in ck.metrics() if m["algo"] == "pagerank"])
    assert n_before > 0  # metrics written through the Hadoop FS backend
    resumed, info_res = pagerank(
        edges, vertices=verts, tol=1e-6, ckpt=ck, resume=True
    )
    assert info_res["converged"]
    new_metrics = [m for m in ck.metrics() if m["algo"] == "pagerank"]
    assert len(new_metrics) - n_before <= total_iters - k
    assert all("partitions" in m for m in new_metrics)

    got = {r.vertex_id: r.rank for r in resumed.collect()}
    for v, rank in want.items():
        assert abs(got[v] - rank) < 1e-12


def test_truncate_after_clears_partial_snapshots(tmp_path):
    """A crash mid-write leaves an iter= dir with no _SUCCESS; the
    truncation sweep must remove it too, not just completed snapshots
    (ADVICE r3 — the _SUCCESS filter is for latest()/resume only)."""
    import os

    base = tmp_path / "ck"
    ck = CheckpointManager(str(base), run_id="t")
    algo_dir = base / "pagerank"
    for k, complete in [(1, True), (2, True), (3, False), (4, True)]:
        d = algo_dir / f"iter={k:05d}"
        os.makedirs(d)
        (d / "part-00000.parquet").write_bytes(b"x")
        if complete:
            (d / "_SUCCESS").write_bytes(b"")
    ck.truncate_after("pagerank", 2)
    left = sorted(os.listdir(algo_dir))
    assert left == ["iter=00001", "iter=00002"]
    assert ck.latest("pagerank")[0] == 2
