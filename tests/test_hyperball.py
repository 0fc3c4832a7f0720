"""HyperBall (algos/hyperball.py): exact sketch-state checks against a
pure-Python HLL union over exact BFS balls, estimate accuracy vs exact
ball sizes, parallelism invariance, and harmonic centrality."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import random_graph
from webgraph_spark.algos.hyperball import (
    _alpha,
    harmonic_centrality,
    hyperball,
)


def _py_register(v: int, m: int):
    """Python twin of _init_registers: (reg, rho) for vertex v."""
    hx = hashlib.md5(str(v).encode()).hexdigest()
    h1 = int(hx[0:15], 16)
    h2 = int(hx[15:30], 16)
    reg = h1 % m
    if h2 == 0:
        rho = 61
    else:
        rho = ((h2 & -h2) - 1).bit_count() + 1
    return reg, rho


def _py_estimate(regs: dict, m: int) -> float:
    a = _alpha(m)
    s = (m - len(regs)) * 1.0 + sum(2.0 ** -r for r in regs.values())
    raw = a * m * m / s
    v_zero = m - len(regs)
    if raw <= 2.5 * m and v_zero > 0:
        return m * math.log(m / v_zero)
    return raw


def _adj(rows, directed=False):
    adj = {}
    for s, d in rows:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set())
        if not directed:
            adj[d].add(s)
            adj.setdefault(s, set())
    return adj


def _ball(adj, v, t):
    seen, frontier = {v}, {v}
    for _ in range(t):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        frontier = nxt - seen
        seen |= nxt
    return seen


@pytest.fixture(scope="module")
def graph(spark):
    src, dst = random_graph(150, 500, seed=23)
    e = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    return e.persist()


class TestSketchExactness:
    def test_state_matches_python_ball_union(self, spark, graph):
        """The decisive check: after t rounds the per-vertex sketch must
        equal the HLL union of the singleton sketches of the EXACT BFS
        ball — register-for-register (digested as sum_rho, n_regs)."""
        t, m = 3, 16
        rows = [(r["src"], r["dst"]) for r in graph.collect()]
        adj = _adj(rows)
        got = {
            r["vertex_id"]: (r["sum_rho"], r["n_regs"], r["nf_est"])
            for r in hyperball(graph, t=t, m=m).collect()
        }
        assert set(got) == set(adj)
        for v in adj:
            regs: dict = {}
            for u in _ball(adj, v, t):
                reg, rho = _py_register(u, m)
                regs[reg] = max(regs.get(reg, 0), rho)
            assert got[v][0] == sum(regs.values()), f"sum_rho mismatch at {v}"
            assert got[v][1] == len(regs), f"n_regs mismatch at {v}"
            assert got[v][2] == pytest.approx(
                round(_py_estimate(regs, m), 4), abs=1e-4
            )

    def test_directed_balls(self, spark):
        """directed=True estimates OUT-reachability: on a chain
        0->1->2->3, B(0,2) = {0,1,2} but B(3,2) = {3}."""
        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "src long, dst long"
        )
        m = 64
        got = {
            r["vertex_id"]: (r["sum_rho"], r["n_regs"])
            for r in hyperball(e, t=2, m=m, directed=True).collect()
        }
        adj = _adj([(0, 1), (1, 2), (2, 3)], directed=True)
        for v in adj:
            regs: dict = {}
            for u in _ball(adj, v, 2):
                reg, rho = _py_register(u, m)
                regs[reg] = max(regs.get(reg, 0), rho)
            assert got[v] == (sum(regs.values()), len(regs))

    def test_parallelism_invariance(self, spark, graph):
        base = sorted(map(tuple, hyperball(graph, t=2, m=16).collect()))
        was = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            alt = sorted(map(tuple, hyperball(graph, t=2, m=16).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", was)
        assert base == alt


class TestEstimateAccuracy:
    def test_nf_tracks_exact_ball_sizes(self, spark, graph):
        """m=256 registers -> ~6.5% theoretical rse; assert mean
        relative error < 10% against exact BFS ball sizes."""
        t, m = 3, 256
        rows = [(r["src"], r["dst"]) for r in graph.collect()]
        adj = _adj(rows)
        got = {r["vertex_id"]: r["nf_est"] for r in hyperball(graph, t=t, m=m).collect()}
        errs = [
            abs(got[v] - len(_ball(adj, v, t))) / len(_ball(adj, v, t))
            for v in adj
        ]
        assert float(np.mean(errs)) < 0.10

    def test_harmonic_tracks_exact(self, spark, graph):
        """Harmonic centrality within t hops vs the exact truncated
        harmonic sum; mean relative error < 15% at m=256."""
        t, m = 3, 256
        rows = [(r["src"], r["dst"]) for r in graph.collect()]
        adj = _adj(rows)
        got = {
            r["vertex_id"]: r["harm_est"]
            for r in harmonic_centrality(graph, t=t, m=m).collect()
        }
        errs = []
        for v in adj:
            prev = {v}
            exact = 0.0
            for k in range(1, t + 1):
                cur = _ball(adj, v, k)
                exact += (len(cur) - len(prev)) / k
                prev = cur
            if exact > 0:
                errs.append(abs(got[v] - exact) / exact)
        assert float(np.mean(errs)) < 0.15


class TestDistanceDistribution:
    def test_matches_python_per_round_sums(self, spark, graph):
        from webgraph_spark.algos.hyperball import distance_distribution

        t, m = 3, 16
        rows = [(r["src"], r["dst"]) for r in graph.collect()]
        adj = _adj(rows)
        got = {
            r["round"]: r["nf_e4"]
            for r in distance_distribution(graph, t=t, m=m).collect()
        }
        assert set(got) == set(range(t + 1))
        for k in range(t + 1):
            want = 0
            for v in adj:
                regs: dict = {}
                for u in _ball(adj, v, k):
                    reg, rho = _py_register(u, m)
                    regs[reg] = max(regs.get(reg, 0), rho)
                want += round(_py_estimate(regs, m) * 10000)
            assert got[k] == want, f"round {k}"
        # NF(k) is non-decreasing in k
        assert all(got[k] <= got[k + 1] for k in range(t))


class TestCheckpointResume:
    def test_resume_is_bit_identical(self, spark, graph, tmp_path):
        """Run 2 rounds checkpointed, resume to 4: identical output to
        an uninterrupted 4-round run (max-merge idempotence), resumed
        rounds start after the last snapshot (no recompute)."""
        from webgraph_spark.checkpoint import CheckpointManager

        ck = str(tmp_path / "hb")
        c1 = CheckpointManager(ck)
        hyperball(graph, t=2, m=16, ckpt=c1).collect()
        assert c1.latest("hyperball")[0] == 2
        n_metrics = len([m for m in c1.metrics() if m["algo"] == "hyperball"])
        assert n_metrics == 3  # rounds 0..2 snapshotted

        c2 = CheckpointManager(ck)
        resumed = sorted(
            map(tuple, hyperball(graph, t=4, m=16, ckpt=c2, resume=True).collect())
        )
        fresh = sorted(map(tuple, hyperball(graph, t=4, m=16).collect()))
        assert resumed == fresh
        assert c2.latest("hyperball")[0] == 4
        new = [m for m in c2.metrics() if m["algo"] == "hyperball"][n_metrics:]
        assert sorted(m["round"] for m in new) == [3, 4]  # only new rounds


class TestEffectiveDiameter:
    def test_path_graph_matches_exact_interpolation(self, spark):
        """12-node path: the merge fixpoints after exactly diameter=11
        rounds, and the interpolated 90% effective diameter tracks the
        exact NF curve (m=256 keeps linear counting nearly exact at
        these ball sizes)."""
        from webgraph_spark.algos.hyperball import effective_diameter

        n = 12
        e = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )
        got = effective_diameter(e, alpha=0.9, m=256, max_t=32)
        assert got["rounds"] == n - 1  # fixpoint at the true diameter

        # exact NF curve + same interpolation
        adj = _adj([(i, i + 1) for i in range(n - 1)])
        nf = []
        for t in range(n):
            nf.append(sum(len(_ball(adj, v, t)) for v in adj))
        target = 0.9 * nf[-1]
        for t, val in enumerate(nf):
            if val >= target:
                exact = (t - 1) + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
                break
        assert abs(got["effective_diameter"] - exact) < 0.5
        # NF estimates track the exact curve within a few percent
        rel = [abs(a - b) / b for a, b in zip(got["nf"], nf)]
        assert max(rel) < 0.05
