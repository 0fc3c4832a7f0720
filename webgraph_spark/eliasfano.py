"""Elias–Fano quasi-succinct encoding of monotone sequences.

The reference stores BVGraph offsets Elias–Fano-compressed behind the
`--ef` flag (via the `sucds` crate: /root/reference/src/webgraph/
bvgraph.rs:173-185 write, :1653-1660 load). This is the engine's
equivalent for the driver-side serving index: `CsrLocalIndex` holds
per-node byte offsets and indptr in RAM; plain int64 costs 64 bits per
node, Elias–Fano costs ~(2 + log2(u/n)) bits per node — typically an
~6-10x reduction for offset-like sequences.

Layout (classic): each value v_i splits into l = floor(log2(u/n)) low
bits (packed contiguously) and a high part h_i = v_i >> l stored as a
unary-gap bitmap with a set bit at position h_i + i. access(i) =
(select1(i) - i) << l | low_i. Select uses a per-64-bit-word popcount
prefix (one uint32 per word, ~0.5 bit/value overhead) + an in-word
byte-LUT walk — O(log #words) per query via searchsorted, fully
vectorized for query arrays.

Independent numpy implementation; nothing shared with the reference's
Rust/sucds code.
"""

from __future__ import annotations

import numpy as np

_SB = 16  # superblock size in bitmap bytes for the select index

# popcount of every byte value
_BYTE_POP = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.uint8)

# _BYTE_SELECT[b, k] = position (0 = MSB) of the (k+1)-th set bit of
# byte b, or 8 if absent
_BYTE_SELECT = np.full((256, 8), 8, dtype=np.uint8)
for _b in range(256):
    _pos = np.flatnonzero(np.unpackbits(np.array([_b], dtype=np.uint8)))
    _BYTE_SELECT[_b, : _pos.size] = _pos


class EliasFano:
    """Monotone non-decreasing uint sequence with O(log) random access."""

    def __init__(self, values) -> None:
        v = np.asarray(values, dtype=np.uint64)
        if v.size == 0:
            raise ValueError("empty sequence")
        if np.any(np.diff(v.astype(np.int64)) < 0):
            raise ValueError("sequence must be non-decreasing")
        n = v.size
        u = int(v[-1]) + 1
        l = max(0, int(np.floor(np.log2(max(u / n, 1)))))
        self.n = n
        self.l = l

        # low halves, packed l bits each (MSB-first inside the stream)
        if l > 0:
            lows = (v & np.uint64((1 << l) - 1)).astype(np.uint64)
            bitmat = (
                (lows[:, None] >> np.arange(l - 1, -1, -1, dtype=np.uint64))
                & np.uint64(1)
            ).astype(np.uint8)
            self._low = np.packbits(bitmat.ravel())
        else:
            self._low = np.empty(0, dtype=np.uint8)

        # high halves as a unary-gap bitmap: bit at h_i + i
        highs = (v >> np.uint64(l)).astype(np.int64)
        nbits = int(highs[-1]) + n
        bitmap = np.zeros((nbits + 7) // 8 * 8, dtype=np.uint8)
        bitmap[highs + np.arange(n, dtype=np.int64)] = 1
        self._high = np.packbits(bitmap)

        # select index: cumulative popcount per 16-byte superblock
        # (int32 per 128 bitmap bits ~ 0.25 bit/value overhead)
        pad = (-self._high.size) % _SB
        if pad:
            self._high = np.concatenate(
                [self._high, np.zeros(pad, dtype=np.uint8)]
            )
        pops = _BYTE_POP[self._high].astype(np.int64).reshape(-1, _SB)
        if n >= 2**31:
            raise ValueError("driver-side EF index capped at 2^31 values")
        self._sb = np.cumsum(pops.sum(axis=1)).astype(np.int32)

    @property
    def nbytes(self) -> int:
        return int(self._low.nbytes + self._high.nbytes + self._sb.nbytes)

    def _select1(self, ks: np.ndarray) -> np.ndarray:
        """Positions of the (k+1)-th set bits, vectorized."""
        sb_idx = np.searchsorted(self._sb, ks, side="right")
        prev = np.where(sb_idx > 0, self._sb[sb_idx - 1], 0)
        rem = (ks - prev).astype(np.int64)
        block = self._high[sb_idx[:, None] * _SB + np.arange(_SB)]
        cum = np.cumsum(_BYTE_POP[block].astype(np.int64), axis=1)
        byte_in_sb = (cum <= rem[:, None]).sum(axis=1)
        before = np.where(
            byte_in_sb > 0,
            np.take_along_axis(
                cum, np.maximum(byte_in_sb - 1, 0)[:, None], axis=1
            )[:, 0],
            0,
        )
        in_byte = rem - before
        byte_idx = sb_idx * _SB + byte_in_sb
        return byte_idx * 8 + _BYTE_SELECT[self._high[byte_idx], in_byte]

    def _low_bits(self, idx: np.ndarray) -> np.ndarray:
        l = self.l
        if l == 0:
            return np.zeros(idx.size, dtype=np.int64)
        start = idx.astype(np.int64) * l
        # gather l consecutive bits per query from the packed stream
        bitpos = start[:, None] + np.arange(l, dtype=np.int64)
        bytes_ = self._low[bitpos >> 3]
        bits = (bytes_ >> (7 - (bitpos & 7)).astype(np.uint8)) & 1
        weights = (1 << np.arange(l - 1, -1, -1, dtype=np.int64))
        return (bits.astype(np.int64) * weights).sum(axis=1)

    def get_many(self, idx) -> np.ndarray:
        idx = np.asarray(idx, dtype=np.int64)
        highs = self._select1(idx) - idx
        return (highs << self.l) | self._low_bits(idx)

    def get(self, i: int) -> int:
        return int(self.get_many(np.array([i]))[0])

    def to_array(self) -> np.ndarray:
        return self.get_many(np.arange(self.n, dtype=np.int64))


# ---------------------------------------------------------------------------
# .offsets.ef file serialization
# ---------------------------------------------------------------------------
#
# The reference persists EF offsets as `basename.offsets.ef` and, when
# present, prefers them over `.offsets` at load (ref bvgraph.rs:173-185
# write, :1653-1660 load). Its payload is sux/sucds' serialize_into —
# the in-memory layout of a Rust crate, not a published format — so the
# engine mirrors the ROLE (an EF-compressed offsets sidecar chosen by
# filename) with its own versioned little-endian layout:
#
#   magic 'WGEF' | version u8 | n u64 | l u8 | len_low u64 | len_high
#   u64 | low bytes | high bytes
#
# The select superblock index is rebuilt at load (it is derivable from
# the high bitmap and would only bloat the file).

_EF_MAGIC = b"WGEF"
_EF_VERSION = 1


def serialize_ef(ef: EliasFano) -> bytes:
    import struct

    head = _EF_MAGIC + struct.pack(
        "<BQBQQ", _EF_VERSION, ef.n, ef.l, ef._low.size, ef._high.size
    )
    return head + ef._low.tobytes() + ef._high.tobytes()


def deserialize_ef(data: bytes) -> EliasFano:
    import struct

    if data[:4] != _EF_MAGIC:
        raise ValueError("not a WGEF Elias-Fano offsets payload")
    ver, n, l, n_low, n_high = struct.unpack("<BQBQQ", data[4:30])
    if ver != _EF_VERSION:
        raise ValueError(f"unsupported WGEF version {ver}")
    ef = EliasFano.__new__(EliasFano)
    ef.n = n
    ef.l = l
    ef._low = np.frombuffer(data, dtype=np.uint8, count=n_low, offset=30).copy()
    ef._high = np.frombuffer(
        data, dtype=np.uint8, count=n_high, offset=30 + n_low
    ).copy()
    # rebuild the select superblock index (load-time only)
    pad = (-ef._high.size) % _SB
    if pad:
        ef._high = np.concatenate([ef._high, np.zeros(pad, dtype=np.uint8)])
    pops = _BYTE_POP[ef._high].astype(np.int64).reshape(-1, _SB)
    ef._sb = np.cumsum(pops.sum(axis=1)).astype(np.int32)
    return ef
