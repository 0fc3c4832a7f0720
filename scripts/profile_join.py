"""Compare superstep join strategies at local[8] vs local[32].

Variants over the co-partitioned loop (24M edges):
  smj        : plain join (SMJ re-sorts the 24M edge side each superstep)
  sorted     : edges cached sortWithinPartitions('src') -> SMJ sort skipped
  hash       : SHUFFLE_HASH hint, ranks build side (no sorts at all)
  hash_sorted: both
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import synth_edges
from webgraph_spark.session import get_spark

N_NODES = 2_400_000
N_EDGES = 24_000_000
STEPS = 6


def run(master: str, variant: str, parts: int):
    spark = get_spark(master=master, app_name=f"pj-{variant}", shuffle_partitions=parts)
    edges = synth_edges(spark, N_NODES, N_EDGES, 32)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).repartition(parts, "src")
    if "sorted" in variant:
        ew = ew.sortWithinPartitions("src")
    ew = ew.persist()
    m = ew.count()
    verts = (
        edges.select(F.col("src").alias("vertex_id"))
        .unionAll(edges.select(F.col("dst").alias("vertex_id")))
        .dropDuplicates(["vertex_id"])
    )
    n = verts.count()
    ranks = (
        verts.select("vertex_id", F.lit(1.0 / n).alias("rank"))
        .repartition(parts, "vertex_id")
        .localCheckpoint()
    )

    times = []
    for it in range(STEPS):
        t0 = time.time()
        r_src = ranks.select(F.col("vertex_id").alias("src"), "rank")
        if variant.startswith("hash"):
            r_src = r_src.hint("SHUFFLE_HASH")
        contrib = (
            ew.join(r_src, "src")
            .groupBy("dst").agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        joined = ranks.join(contrib, ranks.vertex_id == contrib.dst, "left").select(
            "vertex_id",
            (F.lit(0.15 / n) + 0.85 * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
        ).localCheckpoint(eager=False)
        joined.agg(F.sum("rank")).collect()
        ranks = joined
        times.append(time.time() - t0)
    spark.stop()
    steps = sorted(times[1:])
    med = steps[len(steps) // 2]
    return m, med, m / med


def main():
    for variant in ["smj", "sorted", "hash", "hash_sorted"]:
        _, med8, th8 = run("local[8]", variant, 8)
        _, med32, th32 = run("local[32]", variant, 32)
        print(
            variant,
            f"med8={med8:.2f}s th8={th8/1e6:.2f}M",
            f"med32={med32:.2f}s th32={th32/1e6:.2f}M",
            f"eff={th32/(4*th8):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
