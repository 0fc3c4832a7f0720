"""Connected components: small-star / large-star hash-min (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).

Treats the digraph as undirected (components of the underlying
undirected graph; component id = min vertex id — FIXTURES.md F4).
Alternates:
    large-star: for every node u, hang strictly-larger neighbors onto
                m = min(N(u) ∪ {u}):  emit (v, m) for v in N(u), v > u
    small-star: orient edges (u, v) with v <= u; hang u and its
                smaller neighbors onto m = min(N<=(u) ∪ {u})
until the edge set reaches a fixpoint — O(log n) rounds on real graphs
versus O(diameter) for naive min propagation. Each round is two
shuffles (groupBy u; join back). Rounds are checkpointed.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.checkpoint import CheckpointManager


def _large_star(e: DataFrame) -> DataFrame:
    # symmetric neighborhoods
    nbrs = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = nbrs.groupBy("src").agg(F.min("dst").alias("_mn")).select(
        "src", F.least(F.col("_mn"), F.col("src")).alias("m")
    )
    return (
        nbrs.filter(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient so src >= dst, group smaller neighbors under each node
    oriented = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    hang_nbrs = (
        oriented.join(m, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    hang_self = m.select("src", F.col("m").alias("dst"))
    return (
        hang_nbrs.unionAll(hang_self)
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    ckpt: CheckpointManager | None = None,
    resume: bool = False,
) -> tuple[DataFrame, dict]:
    """Returns (components(vertex_id, component_id), info). Exact.

    resume: restart from the last durably checkpointed round's edge
    set (the algorithm state IS the contracted edge set)."""
    start_iter = 0
    e = None
    if ckpt is not None and resume:
        last = ckpt.latest("cc")
        if last is not None:
            start_iter = last[0] + 1
            e = ckpt.load(edges.sparkSession, "cc", last[0])
    if e is None:
        e = (
            edges.filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .dropDuplicates(["src", "dst"])
        )
        e = e.localCheckpoint() if ckpt is None else ckpt.save("cc", -1, e)
    info = {"iterations": 0, "converged": False, "superstep_secs": []}
    prev_sig = None
    for it in range(start_iter, max_iter):
        t0 = time.time()
        e2 = _small_star(_large_star(e))
        # lazy checkpoint: the fixpoint-signature action below
        # materializes the snapshot — ONE job per round
        e2 = (
            e2.localCheckpoint(eager=False) if ckpt is None
            else ckpt.save("cc", it, e2)
        )
        # fixpoint: edge multiset unchanged (order-insensitive signature)
        sig = e2.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).first()
        info["iterations"] = it + 1
        info["superstep_secs"].append(time.time() - t0)
        if prev_sig is not None and (sig["n"], sig["h"]) == prev_sig:
            info["converged"] = True
            e = e2
            break
        prev_sig = (sig["n"], sig["h"])
        e = e2
    # fixpoint edge set is a star forest: (child -> root)
    roots = e.select(F.col("src").alias("vertex_id"), F.col("dst").alias("component_id"))
    in_edges = roots
    self_roots = (
        e.select(F.col("dst").alias("vertex_id"))
        .dropDuplicates(["vertex_id"])
        .join(in_edges.select("vertex_id"), "vertex_id", "left_anti")
        .select("vertex_id", F.col("vertex_id").alias("component_id"))
    )
    comps = in_edges.unionAll(self_roots)
    if vertices is not None:
        isolated = (
            vertices.select("vertex_id")
            .join(comps.select("vertex_id"), "vertex_id", "left_anti")
            .select("vertex_id", F.col("vertex_id").alias("component_id"))
        )
        comps = comps.unionAll(isolated)
    return comps, info
