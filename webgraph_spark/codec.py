"""Vectorized gap + zig-zag + varint codec for CSR successor buffers.

This is the engine's analog of the reference's compressed adjacency
sections (gap coding of sorted successor lists at
/root/reference/src/webgraph/bvgraph.rs:1248-1260, zig-zag int<->nat at
/root/reference/src/utils/mod.rs:13-23). We replace the bit-granular
gamma/delta/zeta universal codes (src/utils/encodings.rs:82-201) with a
byte-aligned LEB128 varint, because varints vectorize with numpy while
bit codes do not — the decode path must run inside Arrow UDF kernels at
full columnar speed.

Encoding of one node's sorted, duplicate-free successor list
[d0, d1, ... dk] with source node s (mirrors the reference layout):
    first  = zigzag(d0 - s)          (signed gap vs the source node)
    rest_i = d_i - d_{i-1} - 1       (strictly ascending => >= 0)
All lists of a CSR block are concatenated into a single byte buffer;
per-node element counts live in the block's indptr array, so decode is
one vectorized varint pass + one segmented cumsum — no per-list loops.

Scalar reference implementations are provided for differential testing
(analog of the reference's LUT-vs-arithmetic decoder equivalence tests,
src/bitstreams/tests.rs:267-359).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_I64 = np.int64

# ---------------------------------------------------------------------------
# zig-zag (signed gap -> natural), identical trick to utils/mod.rs:13-23
# ---------------------------------------------------------------------------


def zigzag_encode(x: np.ndarray) -> np.ndarray:
    """int64 -> uint64 via (x << 1) ^ (x >> 63)."""
    x = x.astype(_I64, copy=False)
    return ((x.astype(_U64) << _U64(1)) ^ (x >> np.int64(63)).astype(_U64)).astype(_U64)


def zigzag_decode(n: np.ndarray) -> np.ndarray:
    """uint64 -> int64 via (n >> 1) ^ -(n & 1)."""
    n = n.astype(_U64, copy=False)
    return ((n >> _U64(1)) ^ (~(n & _U64(1)) + _U64(1))).astype(_I64)


# ---------------------------------------------------------------------------
# LEB128 varint, fully vectorized
# ---------------------------------------------------------------------------


def varint_encode(values: np.ndarray) -> np.ndarray:
    """Encode a uint64 array into a flat uint8 LEB128 buffer."""
    v = values.astype(_U64, copy=False)
    n = v.size
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    # byte length per value: 1 + number of 7-bit shifts that stay nonzero
    lens = np.ones(n, dtype=np.int64)
    tmp = v >> _U64(7)
    while True:
        nz = tmp != 0
        if not nz.any():
            break
        lens[nz] += 1
        tmp = tmp >> _U64(7)
    ends = np.cumsum(lens)
    starts = ends - lens
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_len = int(lens.max())
    for k in range(max_len):
        mask = lens > k
        idx = starts[mask] + k
        byte = ((v[mask] >> _U64(7 * k)) & _U64(0x7F)).astype(np.uint8)
        cont = (lens[mask] - 1) > k  # continuation bit on all but last byte
        out[idx] = byte | (cont.astype(np.uint8) << 7)
    return out


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a flat uint8 LEB128 buffer into a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    term = b < 128  # terminator bytes (no continuation bit)
    # group id for every byte: increments after each terminator
    gid_starts = np.empty(b.size, dtype=bool)
    gid_starts[0] = True
    gid_starts[1:] = term[:-1]
    group_start_idx = np.flatnonzero(gid_starts)
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(
        group_start_idx, np.diff(np.append(group_start_idx, b.size))
    )
    contrib = (b.astype(_U64) & _U64(0x7F)) << (_U64(7) * pos.astype(_U64))
    return np.add.reduceat(contrib, group_start_idx).astype(_U64)


# ---------------------------------------------------------------------------
# adjacency-list gap codec (block level)
# ---------------------------------------------------------------------------


def encode_adjacency(
    src_ids: np.ndarray, counts: np.ndarray, dsts: np.ndarray
) -> bytes:
    """Pack concatenated sorted successor lists into one varint buffer.

    src_ids: int64[num_nodes]   source node id per list
    counts:  int64[num_nodes]   list length per node (may be 0)
    dsts:    int64[sum(counts)] concatenated ascending successor ids
    """
    src_ids = np.asarray(src_ids, dtype=_I64)
    counts = np.asarray(counts, dtype=_I64)
    dsts = np.asarray(dsts, dtype=_I64)
    if dsts.size == 0:
        return b""
    ends = np.cumsum(counts)
    starts = ends - counts
    nonempty = counts > 0
    start_idx = starts[nonempty]
    # gaps-1 everywhere, then overwrite list heads with zigzag(d0 - src)
    gaps = np.empty(dsts.size, dtype=_U64)
    gaps[1:] = (dsts[1:] - dsts[:-1] - 1).astype(_U64)  # fixed up at heads below
    gaps[0] = _U64(0)
    heads = zigzag_encode(dsts[start_idx] - src_ids[nonempty])
    gaps[start_idx] = heads
    return varint_encode(gaps).tobytes()


def decode_adjacency(
    buf: bytes | np.ndarray, src_ids: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Inverse of encode_adjacency: returns the concatenated dst array."""
    src_ids = np.asarray(src_ids, dtype=_I64)
    counts = np.asarray(counts, dtype=_I64)
    raw = varint_decode(np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, bytes) else buf)
    if raw.size == 0:
        return np.empty(0, dtype=_I64)
    ends = np.cumsum(counts)
    starts = ends - counts
    nonempty = counts > 0
    start_idx = starts[nonempty]
    vals = raw.astype(_I64) + 1  # gap+1 for non-heads
    vals[start_idx] = zigzag_decode(raw[start_idx]) + src_ids[nonempty]
    # segmented cumsum: global cumsum minus the running total before each list
    csum = np.cumsum(vals)
    base = csum[start_idx] - vals[start_idx]
    out = csum - np.repeat(base, counts[nonempty])
    return out.astype(_I64)


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (1..10)."""
    v = values.astype(_U64, copy=False)
    lens = np.ones(v.size, dtype=_I64)
    tmp = v >> _U64(7)
    while True:
        nz = tmp != 0
        if not nz.any():
            break
        lens[nz] += 1
        tmp = tmp >> _U64(7)
    return lens


def adjacency_byte_offsets(
    src_ids: np.ndarray, counts: np.ndarray, dsts: np.ndarray
) -> np.ndarray:
    """Per-node byte offset of each list's segment inside the buffer
    produced by encode_adjacency — the engine analog of the reference's
    per-node offsets array (.offsets file, bit-granular there:
    /root/reference/src/webgraph/bvgraph.rs:171-201; byte-granular here
    because the codec is byte-aligned varint). int64[num_nodes + 1];
    offsets[i+1] - offsets[i] = encoded bytes of node i's list (0 for
    empty lists)."""
    src_ids = np.asarray(src_ids, dtype=_I64)
    counts = np.asarray(counts, dtype=_I64)
    dsts = np.asarray(dsts, dtype=_I64)
    offsets = np.zeros(counts.size + 1, dtype=_I64)
    if dsts.size == 0:
        return offsets
    ends = np.cumsum(counts)
    starts = ends - counts
    nonempty = counts > 0
    start_idx = starts[nonempty]
    gaps = np.empty(dsts.size, dtype=_U64)
    gaps[1:] = (dsts[1:] - dsts[:-1] - 1).astype(_U64)
    gaps[0] = _U64(0)
    gaps[start_idx] = zigzag_encode(dsts[start_idx] - src_ids[nonempty])
    lens = varint_lengths(gaps)
    per_node = np.zeros(counts.size, dtype=_I64)
    per_node[nonempty] = np.add.reduceat(lens, start_idx)
    np.cumsum(per_node, out=offsets[1:])
    return offsets


def decode_one_list(
    buf: bytes | np.ndarray, byte_start: int, byte_end: int, src_id: int, count: int
) -> np.ndarray:
    """Random-access decode of ONE node's successor list — the analog
    of the reference's successors(x) hot path (bvgraph.rs:732-978),
    without touching the rest of the buffer."""
    if count == 0:
        return np.empty(0, dtype=_I64)
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    raw = varint_decode(b[byte_start:byte_end])
    vals = raw.astype(_I64) + 1
    vals[0] = zigzag_decode(raw[:1])[0] + src_id
    return np.cumsum(vals)


# ---------------------------------------------------------------------------
# scalar reference implementations (differential-test oracles only)
# ---------------------------------------------------------------------------


def scalar_varint_encode(values) -> bytes:
    out = bytearray()
    for v in values:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def scalar_varint_decode(buf: bytes) -> list[int]:
    out, cur, shift = [], 0, 0
    for b in buf:
        cur |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            out.append(cur)
            cur, shift = 0, 0
    return out


def scalar_encode_adjacency(lists: dict[int, list[int]]) -> bytes:
    """lists: {src: sorted successor list} in ascending src order."""
    vals = []
    for src in sorted(lists):
        lst = lists[src]
        if not lst:
            continue
        first = lst[0] - src
        vals.append((first << 1) ^ (first >> 63) if first >= 0 else ((-first) << 1) - 1)
        for a, b in zip(lst, lst[1:]):
            vals.append(b - a - 1)
    return scalar_varint_encode(vals)
