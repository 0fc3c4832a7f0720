"""Synchronous label propagation.

Each round, every vertex adopts the most frequent label among its
(undirected) neighbors; ties break to the MIN label (deterministic —
the engine's answer to the float-grouping-order hazard flagged in
SURVEY.md §7); isolated vertices keep their own label. Labels start as
vertex ids. Runs a fixed maximum of rounds, stopping early at a
fixpoint; the numpy fixture applies the identical rule, so results are
exact-comparable.

Superstep plan shape (the PageRank-loop treatment): the symmetric edge
relation is cached hash(p, dst)-partitioned and sorted, labels live
hash(p, vertex_id) with the same p, so the neighbor-label join needs no
exchange on either side (SHUFFLE_HASH, no sorts); the only exchanges
per superstep are the two aggregation shuffles — (vertex,label)
frequency counting and the per-vertex argmax — plus nothing else. AQE
is disabled inside the loop (same checkpointed-partitioning rationale
as pagerank.py). Deterministic tie-break is encoded in the max_by
struct ordering, not in row order.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.checkpoint import CheckpointManager


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 10,
    ckpt: CheckpointManager | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (labels(vertex_id, label), info).

    resume: restart from the last durably checkpointed labels."""
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
    spark = edges.sparkSession
    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .unionAll(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .repartition(p, "dst")
        .dropDuplicates(["src", "dst"])
        .sortWithinPartitions("dst")
        .persist()
    )
    sym.count()
    if vertices is None:
        vertices = sym.select(F.col("src").alias("vertex_id")).dropDuplicates(["vertex_id"])
    verts = vertices.select("vertex_id")
    start_iter = 0
    labels = None
    if ckpt is not None and resume:
        last = ckpt.latest("lp")
        if last is not None:
            start_iter = last[0] + 1
            labels = (
                ckpt.load(spark, "lp", last[0])
                .select("vertex_id", "label")
                .repartition(p, "vertex_id")
            )
    if labels is None:
        labels = verts.select(
            "vertex_id", F.col("vertex_id").alias("label")
        ).repartition(p, "vertex_id")
        labels = (
            labels.localCheckpoint() if ckpt is None else ckpt.save("lp", -1, labels)
        )

    info = {"iterations": 0, "converged": False, "superstep_secs": []}
    for it in range(start_iter, max_iter):
        t0 = time.time()
        # labels carry hash(p, vertex_id); renamed to dst the hash
        # matches the cached sym side — no exchange, hash join
        nbr_labels = sym.join(
            labels.select(F.col("vertex_id").alias("dst"), "label").hint(
                "SHUFFLE_HASH"
            ),
            "dst",
        ).select(F.col("src").alias("vertex_id"), "label")
        freq = nbr_labels.groupBy("vertex_id", "label").agg(F.count("*").alias("cnt"))
        # argmax by count, tie -> min label: max_by over (cnt, -label)
        best = freq.groupBy("vertex_id").agg(
            F.max_by(
                F.col("label"), F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
            ).alias("new_label")
        )
        # best lands hash(p, vertex_id) from its aggregation; labels
        # already there — join needs no exchange either
        new_labels = (
            labels.join(best.hint("SHUFFLE_HASH"), "vertex_id", "left")
            .select(
                "vertex_id",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("_changed"),
            )
        )
        # lazy checkpoint; the changed-count action materializes it
        new_labels = (
            new_labels.localCheckpoint(eager=False) if ckpt is None
            else ckpt.save("lp", it, new_labels)
        )
        changed = new_labels.agg(
            F.sum(F.col("_changed").cast("long")).alias("c")
        ).first()["c"] or 0
        labels = new_labels.select("vertex_id", "label")
        info["iterations"] = it + 1
        info["superstep_secs"].append(time.time() - t0)
        if changed == 0:
            info["converged"] = True
            break
    sym.unpersist()
    return labels, info
