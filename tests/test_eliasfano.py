"""Elias–Fano offsets (reference O13 --ef option, bvgraph.rs:173-185):
structure roundtrips + the EF-backed CsrLocalIndex equals the plain one.
No Spark needed — blocks are built directly with the codec."""

import numpy as np
import pytest

from webgraph_spark.codec import adjacency_byte_offsets, encode_adjacency
from webgraph_spark.eliasfano import EliasFano
from webgraph_spark.local_index import CsrLocalIndex


class TestEliasFano:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(5)
        for _ in range(10):
            n = int(rng.integers(1, 3000))
            v = np.cumsum(rng.integers(0, 100, size=n)).astype(np.int64)
            ef = EliasFano(v)
            assert np.array_equal(ef.to_array(), v)
            q = rng.integers(0, n, size=500)
            assert np.array_equal(ef.get_many(q), v[q])

    def test_edge_cases(self):
        for v in [[0], [5], [0, 0, 0], [7, 7, 8], list(range(64)),
                  [10**12, 10**12 + 5]]:
            arr = np.array(v, dtype=np.int64)
            assert np.array_equal(EliasFano(arr).to_array(), arr)

    def test_rejects_decreasing(self):
        with pytest.raises(ValueError):
            EliasFano(np.array([3, 2], dtype=np.int64))

    def test_compression_ratio(self):
        # offset-like sequence: ~9x smaller than int64
        v = np.cumsum(np.random.default_rng(0).integers(0, 30, 50_000))
        ef = EliasFano(v.astype(np.int64))
        assert ef.nbytes * 6 < v.astype(np.int64).nbytes


def _mk_blocks(n_nodes=500, seed=2, n_blocks=4):
    rng = np.random.default_rng(seed)
    counts = rng.poisson(6, size=n_nodes).astype(np.int64)
    rows = []
    bounds = np.linspace(0, n_nodes, n_blocks + 1).astype(int)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        c = counts[lo:hi]
        nodes = np.arange(lo, hi, dtype=np.int64)
        # per-node sorted-unique successor segments
        segs = [np.unique(rng.integers(0, n_nodes, size=ci)) for ci in c]
        c = np.array([s.size for s in segs], dtype=np.int64)
        dst = np.concatenate(segs) if segs else np.empty(0, dtype=np.int64)
        buf = encode_adjacency(nodes, c, dst)
        boffs = adjacency_byte_offsets(nodes, c, dst)
        indptr = np.zeros(c.size + 1, dtype=np.int64)
        np.cumsum(c, out=indptr[1:])
        rows.append({
            "node_lo": int(lo), "node_hi": int(hi - 1),
            "indptr": indptr, "byte_offsets": boffs,
            "indices": buf, "n_edges": int(c.sum()),
        })
    return rows


class TestEfLocalIndex:
    def test_ef_index_matches_plain(self):
        rows = _mk_blocks()
        plain = CsrLocalIndex(rows)
        ef = CsrLocalIndex(rows, ef_offsets=True)
        assert ef.offset_bytes * 4 < plain.offset_bytes  # real RAM cut
        rng = np.random.default_rng(9)
        xs = rng.integers(0, plain.num_nodes, size=400).astype(np.int64)
        for x in xs[:60].tolist():
            assert np.array_equal(ef.successors(x), plain.successors(x))
            assert ef.outdegree(x) == plain.outdegree(x)
            assert np.array_equal(
                ef.successors_cached(x), plain.successors_cached(x)
            )
        c1, f1 = plain.batch_successors(xs)
        c2, f2 = ef.batch_successors(xs)
        assert np.array_equal(c1, c2) and np.array_equal(f1, f2)
