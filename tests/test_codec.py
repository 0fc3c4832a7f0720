"""Codec tests — roundtrips + scalar/vectorized differential.

Mirrors the reference's codec test strategy: exhaustive roundtrips
(src/bitstreams/tests.rs:144-196) and the differential LUT-vs-plain
decoder equivalence (src/bitstreams/tests.rs:267-359).
"""

import numpy as np
import pytest

from webgraph_spark.codec import (
    decode_adjacency,
    encode_adjacency,
    scalar_encode_adjacency,
    scalar_varint_decode,
    scalar_varint_encode,
    varint_decode,
    varint_encode,
    zigzag_decode,
    zigzag_encode,
)


def test_zigzag_roundtrip_edges():
    x = np.array(
        [0, 1, -1, 2, -2, 2**62, -(2**62), 2**63 - 1, -(2**63)], dtype=np.int64
    )
    assert (zigzag_decode(zigzag_encode(x)) == x).all()


def test_varint_roundtrip_exhaustive_small():
    v = np.arange(0, 100_000, dtype=np.uint64)
    assert (varint_decode(varint_encode(v)) == v).all()


def test_varint_roundtrip_large_values():
    rng = np.random.default_rng(42)
    exps = rng.integers(0, 64, size=10_000)
    v = (rng.integers(0, 2**32, size=10_000).astype(np.uint64) << exps.astype(np.uint64))
    assert (varint_decode(varint_encode(v)) == v).all()


def test_varint_differential_vs_scalar():
    rng = np.random.default_rng(7)
    v = rng.integers(0, 2**62, size=5_000).astype(np.uint64)
    vec = varint_encode(v).tobytes()
    ref = scalar_varint_encode(v.tolist())
    assert vec == ref
    assert scalar_varint_decode(vec) == v.tolist()
    assert (varint_decode(np.frombuffer(ref, dtype=np.uint8)) == v).all()


def test_varint_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)).size == 0
    assert varint_decode(b"").size == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_adjacency_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n_nodes = 500
    src_ids = np.sort(rng.choice(10_000, size=n_nodes, replace=False)).astype(np.int64)
    counts = rng.integers(0, 30, size=n_nodes).astype(np.int64)
    dsts = []
    for c in counts:
        dsts.append(np.sort(rng.choice(10_000, size=c, replace=False)))
    flat = np.concatenate(dsts).astype(np.int64) if counts.sum() else np.empty(0, np.int64)
    buf = encode_adjacency(src_ids, counts, flat)
    out = decode_adjacency(buf, src_ids, counts)
    assert (out == flat).all()


def test_adjacency_differential_vs_scalar():
    rng = np.random.default_rng(3)
    lists = {}
    src_ids, counts, flat = [], [], []
    for src in sorted(rng.choice(1000, size=50, replace=False).tolist()):
        lst = sorted(rng.choice(2000, size=int(rng.integers(0, 12)), replace=False).tolist())
        lists[src] = lst
        src_ids.append(src)
        counts.append(len(lst))
        flat.extend(lst)
    vec = encode_adjacency(
        np.array(src_ids, np.int64), np.array(counts, np.int64), np.array(flat, np.int64)
    )
    assert vec == scalar_encode_adjacency(lists)


def test_adjacency_empty_lists_interleaved():
    src_ids = np.array([5, 6, 7, 8], dtype=np.int64)
    counts = np.array([2, 0, 0, 3], dtype=np.int64)
    flat = np.array([1, 9, 2, 7, 100], dtype=np.int64)
    buf = encode_adjacency(src_ids, counts, flat)
    assert (decode_adjacency(buf, src_ids, counts) == flat).all()


def test_adjacency_first_gap_negative():
    # successor below the source node exercises the zig-zag signed path
    src_ids = np.array([100], dtype=np.int64)
    counts = np.array([3], dtype=np.int64)
    flat = np.array([2, 99, 101], dtype=np.int64)
    buf = encode_adjacency(src_ids, counts, flat)
    assert (decode_adjacency(buf, src_ids, counts) == flat).all()
