"""PageRank: power iteration with dangling-mass redistribution.

Semantics (north rule; fixture oracle in tests/reference_impls.py):
    r_{t+1}(v) = (1-a)/n + a * ( sum_{u->v} r_t(u)/outdeg(u)
                                 + dangling_mass_t / n )
    dangling_mass_t = sum of r_t over vertices with outdeg 0
    converged when L1(r_{t+1} - r_t) <= tol.

Superstep = exactly two shuffles: the ranks->edges join on src (the
edge side is pre-hash-partitioned on src and persisted, so only the
small ranks side moves), then groupBy(dst) partial+final aggregation.
Dangling mass + L1 delta are computed in ONE scalar action per
iteration off the materialized new-ranks frame. Each superstep is
checkpointed (parquet/Iceberg) for lineage truncation + resume.

Scale posture: contributions aggregate map-side before the dst
shuffle; hub dst skew is handled by AQE skew hints plus optional
explicit salting (two-stage aggregation) when a degree histogram pass
flags hubs — see salt_threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.checkpoint import CheckpointManager
from webgraph_spark.graph import out_degrees


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    ckpt: CheckpointManager | None = None,
    resume: bool = False,
    salt_threshold: int | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (ranks(vertex_id, rank), info).

    vertices: optional (vertex_id) frame; defaults to ids present in edges.
    salt_threshold: if set, dst vertices with indegree > threshold are
    aggregated in two stages (salted partial then final) to break
    reducer hot spots on hub vertices.
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("vertex_id"))
            .unionAll(edges.select(F.col("dst").alias("vertex_id")))
            .dropDuplicates(["vertex_id"])
        )
    verts = vertices.select("vertex_id")
    n = verts.count()
    deg = out_degrees(edges)

    # static edge side: weight = 1/outdeg, pre-partitioned on src, cached
    edges_w = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg").cast("double")).alias("w"))
        .repartition(p, "src")
        .persist()
    )
    n_edges = edges_w.count()  # materialize cache

    # optional hub-salting plan for the dst aggregation
    hubs = None
    if salt_threshold is not None:
        hubs = (
            edges.groupBy("dst").count().filter(F.col("count") > salt_threshold)
            .select("dst").persist()
        )
        hubs.count()

    start_iter = 0
    ranks = None
    if ckpt is not None and resume:
        last = ckpt.latest("pagerank")
        if last is not None:
            start_iter = last[0] + 1
            ranks = ckpt.load(spark, "pagerank", last[0])
    if ranks is None:
        ranks = verts.select(
            "vertex_id", F.lit(1.0 / n).alias("rank")
        ).join(
            deg.select(F.col("src").alias("vertex_id"), F.lit(False).alias("is_dangling")),
            "vertex_id",
            "left",
        ).select(
            "vertex_id", "rank", F.coalesce("is_dangling", F.lit(True)).alias("is_dangling")
        )
        if ckpt is not None:
            ranks = ckpt.save("pagerank", -1, ranks) if start_iter == 0 else ranks
        else:
            ranks = ranks.localCheckpoint()

    # dangling mass of the current ranks (one scalar agg; afterwards it is
    # fused into the per-iteration delta action)
    dang = (
        ranks.filter("is_dangling").agg(F.sum("rank").alias("s")).first()["s"] or 0.0
    )

    info = {"iterations": 0, "converged": False, "deltas": [], "n": n, "n_edges": n_edges}
    for it in range(start_iter, max_iter):
        r_src = ranks.select(F.col("vertex_id").alias("src"), "rank")
        contribs = edges_w.join(r_src, "src").select(
            "dst", (F.col("rank") * F.col("w")).alias("c")
        )
        if hubs is not None:
            # two-stage salted aggregation for hub dst keys
            hub_c = contribs.join(F.broadcast(hubs), "dst", "left_semi")
            cold_c = contribs.join(F.broadcast(hubs), "dst", "left_anti")
            hub_partial = (
                hub_c.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(p)))
                .groupBy("dst", "_salt").agg(F.sum("c").alias("c"))
                .groupBy("dst").agg(F.sum("c").alias("contrib"))
            )
            cold = cold_c.groupBy("dst").agg(F.sum("c").alias("contrib"))
            contrib = cold.unionAll(hub_partial)
        else:
            contrib = contribs.groupBy("dst").agg(F.sum("c").alias("contrib"))

        base = (1.0 - alpha) / n + alpha * dang / n
        joined = (
            ranks.join(contrib, ranks.vertex_id == contrib.dst, "left")
            .select(
                "vertex_id",
                F.col("rank").alias("_old"),
                (F.lit(base) + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
                "is_dangling",
            )
        )
        if ckpt is not None:
            joined = ckpt.save("pagerank", it, joined)
        else:
            joined = joined.localCheckpoint()
        # ONE action: L1 delta + next iteration's dangling mass
        stats = joined.agg(
            F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("delta"),
            F.sum(F.when(F.col("is_dangling"), F.col("rank")).otherwise(0.0)).alias("dang"),
        ).first()
        delta, dang = float(stats["delta"]), float(stats["dang"] or 0.0)
        ranks = joined.select("vertex_id", "rank", "is_dangling")
        info["iterations"] = it + 1
        info["deltas"].append(delta)
        if delta <= tol:
            info["converged"] = True
            break

    edges_w.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return ranks.select("vertex_id", "rank"), info
