"""Benchmark harness (driver contract + north-rule scaling evidence).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank": {"edges": M, "supersteps": K,
                "throughput_local8": e/s, "throughput_local32": e/s,
                "scaling_efficiency": eff}}

North-rule evidence protocol (BASELINE.md): no multi-node cluster in
this sandbox, so the SAME PageRank superstep job runs on the SAME
deterministic synthetic edge table at two parallelism levels —
local[8] (N) and local[32] (4N) — and we report per-superstep
edges/sec at both plus efficiency = th(4N) / (4 * th(N)).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     WGS_BENCH_SUPERSTEPS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from webgraph_spark.algos.pagerank import pagerank  # noqa: E402
from webgraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SUPERSTEPS = int(os.environ.get("WGS_BENCH_SUPERSTEPS", "5"))

BENCH_QUERIES = [
    "graph_edges",
    "graph_out_degrees",
    "csr_roundtrip_edges",
    "pagerank_top20",
    "connected_components",
    "dedup_exact_groups",
    "token_stats",
    "quality_scores",
    "minhash_dedup_pairs",
    "ann_brute_topk",
    "agg_pushdown",
    "join_broadcast",
    "events_window",
]


def synth_edges(spark, n_nodes: int, n_edges: int, parts: int):
    """Deterministic Zipf-skewed edge table, generated distributed;
    identical content at any parallelism (pure function of row id)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0).to_numpy().astype(np.uint64)
            src = ((ids * np.uint64(2654435761)) % np.uint64(n_nodes)).astype(np.int64)
            u = (((ids ^ np.uint64(0x9E3779B97F4A7C15)) * np.uint64(6364136223846793005))
                 % np.uint64(1 << 32)).astype(np.float64) / float(1 << 32)
            dst = (n_nodes * u * u * u).astype(np.int64)  # cubic skew -> hubs
            keep = src != dst
            yield pa.RecordBatch.from_arrays(
                [pa.array(src[keep]), pa.array(dst[keep])], names=["src", "dst"]
            )

    return (
        spark.range(0, n_edges, numPartitions=parts)
        .mapInArrow(gen, schema="src long, dst long")
        .dropDuplicates(["src", "dst"])
    )


def measure_supersteps(master: str, n_nodes: int, n_edges: int, parts: int):
    """Per-superstep throughput: setup (degree join, caching, vertex
    count) is excluded; the first timed superstep is treated as warmup
    (codegen/JIT) and dropped. Metric = edges / median superstep sec."""
    spark = get_spark(master=master, app_name=f"wgs-bench-{master}")
    edges = synth_edges(spark, n_nodes, n_edges, parts).persist()
    m = edges.count()
    _, info = pagerank(edges, tol=0.0, max_iter=SUPERSTEPS + 1)
    spark.stop()
    steps = sorted(info["superstep_secs"][1:])  # drop warmup superstep
    med = steps[len(steps) // 2]
    dt = sum(steps)
    return m, dt, m / med


def main():
    t_start = time.time()

    # --- scaling evidence: N vs 4N cores on the identical input --------
    # size the graph off the SF dir so bench cost tracks the data scale
    probe = get_spark(master="local[4]", app_name="wgs-bench-probe")
    li_rows = probe.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    probe.stop()
    n_edges = max(200_000, li_rows * 40)
    n_nodes = max(20_000, n_edges // 10)

    m8, dt8, th8 = measure_supersteps("local[8]", n_nodes, n_edges, 32)
    m32, dt32, th32 = measure_supersteps(f"local[{CPUS}]", n_nodes, n_edges, 32)
    assert m8 == m32, "synthetic graph must be identical at both levels"
    eff = th32 / (4.0 * th8)

    # --- headline queries at SF_DIR ------------------------------------
    import __spark_entry__ as entry_mod

    spark = get_spark(master=f"local[{CPUS}]", app_name="wgs-bench-queries")
    qmap = entry_mod.queries()
    timings = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qmap[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "pagerank_superstep_edges_per_sec_local32",
        "value": round(time.time() - t_start, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "pagerank": {
            "edges": int(m32),
            "supersteps": SUPERSTEPS,
            "throughput_local8": round(th8, 1),
            "throughput_local32": round(th32, 1),
            "scaling_efficiency": round(eff, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
