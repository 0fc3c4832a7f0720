"""cnr-2000-scale validation (VERDICT r3 'do this' #9).

The reference pins golden counts for cnr-2000 — 325,557 nodes and
3,216,152 arcs (ref ascii_graph/tests.rs:15-16) — but the fixture files
were stripped from the snapshot. This script SYNTHESIZES a web-like
graph at exactly that scale (power-law out-degrees, strong locality,
consecutive runs, shared hub lists — the structural regime BV-style
codecs exploit), then:

  1. encodes it through the full block-codec stack (varint CSR, BVGraph,
     hybrid-Huffman, Zuckerli) and records B/edge per codec,
  2. records the BVGraph per-section bit breakdown (outdegrees /
     references / blocks / intervals / residuals) to compare with the
     reference README's qualitative claims (residuals dominant),
  3. re-encodes after degree ordering (hubs-first renumbering),
  4. runs PageRank (mass conservation), connected components and
     HyperBall on the same graph,
  5. times the vectorized block decode at this scale.

Deterministic: every random draw comes from seeded numpy generators.
Prints one JSON document; results are recorded in BENCH.md.

Run: python scripts/cnr_scale_validation.py   (~5 min on local[32])
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NODES = 325_557
N_ARCS = 3_216_152


def synth_edges(overshoot: float = 1.3) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic web-like edge list: exactly N_ARCS arcs.

    Candidate arcs are over-generated (dedup + self-loop removal shrink
    the multiset); the overshoot factor grows until the unique count
    covers the golden total, then uniform thinning trims exactly."""
    rng = np.random.default_rng(20000)
    # power-law-ish degrees, calibrated to overshoot
    raw = np.minimum(rng.pareto(1.25, N_NODES) * 4.0 + 1.0, 20_000.0)
    deg = np.maximum(
        (raw * (N_ARCS * overshoot / raw.sum())).astype(np.int64), 1
    )
    src = np.repeat(np.arange(N_NODES, dtype=np.int64), deg)
    m = src.size
    kind = rng.random(m)
    dst = np.empty(m, dtype=np.int64)
    # 55% local links: geometric-ish forward offsets (gap locality)
    loc = kind < 0.55
    dst[loc] = src[loc] + 1 + rng.geometric(0.02, int(loc.sum()))
    # 25% consecutive runs: short ranges anchored near the source
    run = (kind >= 0.55) & (kind < 0.80)
    anchors = src[run] + rng.integers(1, 2000, int(run.sum()))
    dst[run] = anchors + (rng.integers(0, 12, int(run.sum())))
    # 10% shared hubs (navigation bars): tiny global target set
    hub = (kind >= 0.80) & (kind < 0.90)
    hubs = rng.integers(0, N_NODES, 200)
    dst[hub] = hubs[rng.integers(0, hubs.size, int(hub.sum()))]
    # 10% global uniform
    glo = kind >= 0.90
    dst[glo] = rng.integers(0, N_NODES, int(glo.sum()))
    dst %= N_NODES
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedup (src, dst)
    key = src * N_NODES + dst
    key = np.unique(key)
    src, dst = key // N_NODES, key % N_NODES
    if src.size < N_ARCS:
        if overshoot > 4.0:
            raise RuntimeError(f"undershoot: {src.size} < {N_ARCS}")
        return synth_edges(overshoot * 1.25)
    # trim to the exact golden arc count with a deterministic stride
    # (uniform thinning keeps the structure; trimming a suffix would
    # drop whole high-id nodes)
    drop = src.size - N_ARCS
    drop_idx = (np.arange(drop) * (src.size // drop)).astype(np.int64)
    mask = np.ones(src.size, dtype=bool)
    mask[drop_idx] = False
    return src[mask], dst[mask]


def main() -> None:
    from pyspark.sql import functions as F

    from webgraph_spark.algos.components import connected_components
    from webgraph_spark.algos.hyperball import distance_distribution
    from webgraph_spark.algos.order import degree_order, permute_edges
    from webgraph_spark.algos.pagerank import pagerank
    from webgraph_spark.bvdecode import decode_block
    from webgraph_spark.bvgraph import encode_graph
    from webgraph_spark.csr import (
        build_csr,
        build_csr_bv,
        build_csr_huff,
        build_csr_zuck,
    )
    from webgraph_spark.session import get_spark

    t_all = time.time()
    out: dict = {"nodes": N_NODES, "arcs": N_ARCS}

    t0 = time.time()
    src, dst = synth_edges()
    assert src.size == N_ARCS
    out["synth_sec"] = round(time.time() - t0, 1)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="wgs-cnr-scale")
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst})
    ).persist()
    assert edges.count() == N_ARCS

    # --- codec densities (distributed per-partition block encode) ----
    dens = {}
    for name, builder in [
        ("varint", build_csr),
        ("bvgraph", build_csr_bv),
        ("huffman", build_csr_huff),
        ("zuckerli", build_csr_zuck),
    ]:
        t0 = time.time()
        nbytes = builder(edges, 32).agg(F.sum("bytes")).first()[0]
        dens[name] = {
            "bytes_per_edge": round(nbytes / N_ARCS, 3),
            "bits_per_edge": round(8 * nbytes / N_ARCS, 2),
            "encode_sec_wall": round(time.time() - t0, 1),
        }
    out["codec_density_natural_order"] = dens

    # degree-ordered re-encode (hubs-first renumbering)
    t0 = time.time()
    e2 = edges.localCheckpoint(eager=True)
    permuted = permute_edges(e2, degree_order(e2)).persist()
    permuted.count()
    nbytes = build_csr_bv(permuted, 32).agg(F.sum("bytes")).first()[0]
    out["codec_density_degree_order"] = {
        "bvgraph_bits_per_edge": round(8 * nbytes / N_ARCS, 2),
        "wall_sec": round(time.time() - t0, 1),
    }
    permuted.unpersist()

    # --- BV per-section bit breakdown (single-writer full encode) ----
    t0 = time.time()
    cut = np.flatnonzero(np.diff(src)) + 1
    starts = np.concatenate([[0], cut])
    ends = np.concatenate([cut, [src.size]])

    def adj():
        for s, e in zip(starts, ends):
            yield int(src[s]), dst[s:e].tolist()

    stats: dict = {}
    stream, offs, params = encode_graph(adj(), N_NODES, section_bits=stats)
    total_bits = 8 * len(stream)
    out["bv_section_breakdown"] = {
        k: {
            "bits": int(v),
            "pct": round(100.0 * v / total_bits, 1),
            "bits_per_edge": round(v / N_ARCS, 3),
        }
        for k, v in sorted(stats.items(), key=lambda kv: -kv[1])
    }
    out["bv_single_stream_bits_per_edge"] = round(total_bits / N_ARCS, 2)
    out["bv_encode_sec_single_writer"] = round(time.time() - t0, 1)

    # --- vectorized decode at this scale -----------------------------
    best = None
    for _ in range(3):
        t0 = time.time()
        s_, d_ = decode_block(stream, offs, 0, N_NODES, params)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    assert d_.size == N_ARCS and (s_ == src).all() and (d_ == dst).all()
    out["decode_vectorized_edges_per_sec_core"] = round(N_ARCS / best, 0)

    # --- algorithms ---------------------------------------------------
    t0 = time.time()
    ranks, info = pagerank(edges, tol=0.0, max_iter=5)
    mass = ranks.agg(F.sum("rank")).first()[0]
    out["pagerank"] = {
        "iterations": info["iterations"],
        "rank_mass": round(float(mass), 9),  # must be 1.0 (dangling redist)
        "wall_sec": round(time.time() - t0, 1),
    }
    t0 = time.time()
    comps, cinfo = connected_components(edges)
    out["components"] = {
        "n_components": comps.select("component_id").distinct().count(),
        "rounds": cinfo["iterations"],
        "wall_sec": round(time.time() - t0, 1),
    }
    t0 = time.time()
    dd = {int(r["round"]): int(r["nf_e4"]) for r in
          distance_distribution(edges, t=3, m=16).collect()}
    nf = [dd[i] for i in range(4)]
    assert all(a <= b for a, b in zip(nf, nf[1:])), "NF must be monotone"
    out["hyperball"] = {
        "nf_curve_e4": nf,
        "avg_ball_3_est": round(nf[3] / 1e4 / N_NODES, 1),
        "wall_sec": round(time.time() - t0, 1),
    }

    out["total_wall_sec"] = round(time.time() - t_all, 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
