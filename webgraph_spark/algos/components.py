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
versus O(diameter) for naive min propagation.

Scale design (the PageRank-loop treatment, BENCH.md optimization
table): each round is exactly THREE hash exchanges, no joins, and no
vertex-relation sorts —
  * each star attaches the per-node min with a WINDOW over src (one
    hash exchange + within-partition sort on the 8-byte key), not a
    groupBy+self-join: the join formulation costs two exchanges AND
    re-executes the whole neighbor subtree per reference, since Spark
    does not share non-materialized subplans;
  * small-star's two emissions per row are fused into one explode so
    its windowed relation is scanned once;
  * the round-final dropDuplicates(['src','dst']) runs AFTER a
    repartition(p, 'src') — HashPartitioning(src) already clusters
    (src,dst), so the distinct adds no exchange and the round output
    lands hash(p, src)-partitioned for the next round;
  * AQE is disabled inside the loop (it re-plans the checkpointed
    partitioning to Unknown and reinstates exchanges — same rationale
    as pagerank.py) and restored after;
  * the fixpoint signature (count + order-insensitive xxhash) rides
    the SAME action that materializes the round's lazy checkpoint.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webgraph_spark.checkpoint import CheckpointManager


def _large_star(e: DataFrame) -> DataFrame:
    """Input: dedup'd edges. Output: (v, m) for v in N(u), v > u.

    The per-node min is attached with a window over src — ONE hash
    exchange, no self-join, and the neighbor relation is scanned once
    (a groupBy+join formulation re-executes the whole nbrs subtree for
    each reference; Spark does not share non-materialized subplans).
    Output is NOT dedup'd (duplicates are min-insensitive and the
    round-final distinct removes them) — saves one exchange.
    """
    nbrs = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    w = Window.partitionBy("src")
    with_m = nbrs.withColumn(
        "m", F.least(F.min("dst").over(w), F.col("src"))
    )
    return (
        with_m.filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def _small_star(e: DataFrame, p: int) -> DataFrame:
    """Orient src >= dst, hang node + smaller neighbors on the min.

    Same single-exchange window shape as _large_star. The two emissions
    per row — (neighbor -> m) when neighbor != m, and (node -> m) —
    are fused into ONE explode so the windowed relation is scanned once
    (a union of two selects over it would re-execute the window).
    The round-final distinct runs AFTER repartition(p, 'src'):
    HashPartitioning(src) clusters (src, dst), so it stays map-side and
    the round output lands hash(p, src)-partitioned for the next round.
    """
    oriented = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    w = Window.partitionBy("src")
    with_m = oriented.withColumn("m", F.min("dst").over(w))
    pairs = F.array(
        F.when(
            F.col("dst") != F.col("m"),
            F.struct(F.col("dst").alias("s"), F.col("m").alias("d")),
        ),
        F.struct(F.col("src").alias("s"), F.col("m").alias("d")),
    )
    return (
        with_m.select(F.explode(pairs).alias("x"))
        .filter(F.col("x").isNotNull())
        .select(F.col("x.s").alias("src"), F.col("x.d").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .repartition(p, "src")
        .dropDuplicates(["src", "dst"])
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    ckpt: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (components(vertex_id, component_id), info). Exact.

    resume: restart from the last durably checkpointed round's edge
    set (the algorithm state IS the contracted edge set)."""
    spark = edges.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _run(edges, vertices, max_iter, ckpt, resume, p)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)


def _run(edges, vertices, max_iter, ckpt, resume, p):
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
            .repartition(p, "src")
            .dropDuplicates(["src", "dst"])
        )
        e = e.localCheckpoint() if ckpt is None else ckpt.save("cc", -1, e)
    info = {"iterations": 0, "converged": False, "superstep_secs": []}
    prev_sig = None
    for it in range(start_iter, max_iter):
        t0 = time.time()
        e2 = _small_star(_large_star(e), p)
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
