"""Parallel file-family export scaling probe (r4 VERDICT #4).

Times the single-writer (driver toLocalIterator) export against the
num_ranges parallel export for all three file families on the
cnr-2000-scale synthetic graph (325,557 nodes / 3,216,152 arcs), and
records the density delta the boundary window resets cost. Run under
taskset pinning for the N-vs-4N core comparison:

  taskset -c 0,1     python scripts/export_scaling_probe.py 2
  taskset -c 0-7     python scripts/export_scaling_probe.py 8

Prints one JSON document; results recorded in BENCH.md (round 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from cnr_scale_validation import synth_edges  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    num_ranges = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(cores * 4, 8)))
        .config("spark.driver.memory", os.environ.get("WGS_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    src, dst = synth_edges()
    import pandas as pd

    edges = (
        spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst}))
        .repartition(max(cores * 4, 8))
        .persist()
    )
    edges.count()

    from webgraph_spark.bvgraph import edges_to_bvgraph
    from webgraph_spark.bvgraph_huffman import edges_to_huffgraph
    from webgraph_spark.zuckerli import edges_to_zuckerli

    out = {"cores": cores, "num_ranges": num_ranges,
           "n_nodes": 325_557, "n_arcs": int(len(src))}
    for name, fn in [
        ("bvgraph", edges_to_bvgraph),
        ("huffgraph", edges_to_huffgraph),
        ("zuckerli", edges_to_zuckerli),
    ]:
        base_s = f"/tmp/exp_probe_{name}_single"
        base_p = f"/tmp/exp_probe_{name}_par"
        t0 = time.time()
        fn(edges, base_s)
        t_single = time.time() - t0
        t0 = time.time()
        fn(edges, base_p, num_ranges=num_ranges)
        t_par = time.time() - t0
        sz_s = os.path.getsize(base_s + ".graph")
        sz_p = os.path.getsize(base_p + ".graph")
        out[name] = {
            "single_writer_sec": round(t_single, 1),
            "parallel_sec": round(t_par, 1),
            "speedup": round(t_single / t_par, 2),
            "single_bytes": sz_s,
            "parallel_bytes": sz_p,
            "density_delta_pct": round(100.0 * (sz_p - sz_s) / sz_s, 2),
        }
        print(name, out[name], file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
