"""Profile PageRank superstep scaling variants at local[8] vs local[32].

Isolates where the N->4N efficiency loss comes from:
  v_current : pagerank() as-is (localCheckpoint + stats action per iter)
  v_nockpt  : persist-based iteration, single action per superstep
  v_parts   : same but shuffle partitions fixed at 64 for both levels
"""

from __future__ import annotations

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import synth_edges
from webgraph_spark.session import get_spark

N_NODES = 1_200_000
N_EDGES = 12_000_000
STEPS = 3


def run_variant(master: str, variant: str, parts: int):
    spark = get_spark(master=master, app_name=f"prof-{variant}",
                      shuffle_partitions=parts)
    edges = synth_edges(spark, N_NODES, N_EDGES, 32).persist()
    m = edges.count()

    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_w = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition(parts, "src")
        .persist()
    )
    edges_w.count()
    verts = (
        edges.select(F.col("src").alias("vertex_id"))
        .unionAll(edges.select(F.col("dst").alias("vertex_id")))
        .dropDuplicates(["vertex_id"])
    )
    n = verts.count()
    ranks = verts.select("vertex_id", F.lit(1.0 / n).alias("rank")).persist()
    ranks.count()

    # warmup one superstep
    def superstep(r):
        contrib = (
            edges_w.join(r.withColumnRenamed("vertex_id", "src"), "src")
            .groupBy("dst").agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        return r.join(contrib, r.vertex_id == contrib.dst, "left").select(
            "vertex_id",
            (F.lit(0.15 / n) + 0.85 * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
        )

    nxt = superstep(ranks)
    if variant == "nockpt":
        nxt = nxt.persist(); nxt.count()
    else:
        nxt = nxt.localCheckpoint()
        nxt.agg(F.sum("rank")).collect()
    prev, ranks = ranks, nxt

    t0 = time.time()
    for _ in range(STEPS):
        nxt = superstep(ranks)
        if variant == "nockpt":
            nxt = nxt.persist()
            nxt.count()
            ranks.unpersist()
        else:
            nxt = nxt.localCheckpoint()
            nxt.agg(F.sum("rank")).collect()
        ranks = nxt
    dt = time.time() - t0
    spark.stop()
    return m, dt, m * STEPS / dt


def main():
    results = {}
    for variant, parts8, parts32 in [
        ("current", 8, 32),
        ("nockpt", 8, 32),
        ("parts64", 64, 64),
    ]:
        m, dt8, th8 = run_variant("local[8]", variant.replace("parts64", "nockpt"), parts8)
        _, dt32, th32 = run_variant("local[32]", variant.replace("parts64", "nockpt"), parts32)
        eff = th32 / (4 * th8)
        results[variant] = (round(th8), round(th32), round(eff, 3), round(dt8, 1), round(dt32, 1))
        print(variant, results[variant], flush=True)


if __name__ == "__main__":
    main()
