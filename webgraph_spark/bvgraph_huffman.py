"""Hybrid Huffman-BVGraph codec (reference O29): WebGraph list
structure (windowed reference chains + copy blocks + intervals +
residuals) with the VALUE sections entropy-coded by per-context
canonical Huffman over Zuckerli hybrid-int tokens.

Faithful to the reference's hybrid
(`src/webgraph/bvgraph_huffman_out.rs`, `bvgraph_huffman_in.rs`):

  * context layout (NUM_CONTEXTS = 211, bvgraph_huffman_out.rs:8-19):
    outdegrees 32, blocks 3, residuals 112 (32 first-by-count + 80
    chained-on-previous), interval-lefts 32, interval-lens 32
  * context formulas (bvgraph_huffman_in.rs:692-695,767,811-823,
    836-850): outdegree ctx 0 at x%32==0 else 1+min(token(x%32+1),30);
    block ctx 0 / i%2+1; first residual ctx min(token(extra_count),31),
    chained ctx 32+min(token(prev coded value),79); interval left/len
    ctx 0 first, then 1+min(token(prev coded value),30)
  * structural fields stay universal codes: reference unary, block
    count γ, interval count γ (bvgraph_huffman_in.rs:746,757,795)
  * two-pass compression (bvgraph_huffman_out.rs:990-1124): pass 1
    selects each node's reference with the universal-code bit cost
    (same greedy window walk as bvgraph.encode_graph — our exact
    closed-form `_encode_cost`) and collects every value into its
    context; the Huffman headers are then written, and pass 2 replays
    the recorded choices through the entropy coder.

The two passes and the decoder share ONE stream walker
(`_node_stream`) that yields the exact (kind, context, value) sequence
of a node record, so encoder and decoder cannot drift apart.
"""

from __future__ import annotations

import numpy as np

from webgraph_spark.bvgraph import (
    BitReader,
    BitWriter,
    BVGraphParams,
    I_ZUCK,
    J_ZUCK,
    K_ZUCK,
    _diff_blocks,
    _encode_cost,
    _intervalize,
    int2nat,
    nat2int,
    zuck_split,
)
from webgraph_spark.huffman import HuffmanDecoder, HuffmanEncoder

OUTD_IDX_BEGIN = 0
OUTD_IDX_LEN = 32
BLOCKS_IDX_BEGIN = OUTD_IDX_BEGIN + OUTD_IDX_LEN
BLOCKS_IDX_LEN = 3
RESIDUALS_IDX_BEGIN = BLOCKS_IDX_BEGIN + BLOCKS_IDX_LEN
RESIDUALS_IDX_LEN = 112
INTERVALS_LEFT_IDX_BEGIN = RESIDUALS_IDX_BEGIN + RESIDUALS_IDX_LEN
INTERVALS_LEFT_IDX_LEN = 32
INTERVALS_LEN_IDX_BEGIN = INTERVALS_LEFT_IDX_BEGIN + INTERVALS_LEFT_IDX_LEN
INTERVALS_LEN_IDX_LEN = 32
NUM_CONTEXTS = INTERVALS_LEN_IDX_BEGIN + INTERVALS_LEN_IDX_LEN


def _token(v: int) -> int:
    return zuck_split(v, K_ZUCK, I_ZUCK, J_ZUCK)[0]


def _outd_ctx(x: int) -> int:
    if x % 32 == 0:
        return OUTD_IDX_BEGIN
    return OUTD_IDX_BEGIN + 1 + min(_token((x % 32) + 1), 30)


def _node_stream(x, succ, reference, ref_list, params):
    """Yield the (kind, ctx, value) sequence of one node's record.
    kind: 'huff' (entropy-coded, ctx meaningful), 'unary' or 'gamma'
    (structural universal codes, ctx ignored). This single walker
    drives pass-1 collection, pass-2 encoding, and cost accounting."""
    yield ("huff", _outd_ctx(x), len(succ))
    if not succ:
        return
    if params.window_size > 0:
        yield ("unary", 0, reference)
    if reference == 0:
        blocks, extras = [], list(succ)
    else:
        blocks, extras = _diff_blocks(list(succ), ref_list)
        yield ("gamma", 0, len(blocks))
        for i, b in enumerate(blocks):
            ctx = BLOCKS_IDX_BEGIN + (0 if i == 0 else i % 2 + 1)
            yield ("huff", ctx, b if i == 0 else b - 1)
    if extras:
        if params.min_interval_len != 0:
            left, length, residuals = _intervalize(extras, params.min_interval_len)
            yield ("gamma", 0, len(left))
            prev = 0
            prev_left_coded = prev_len_coded = 0
            for i in range(len(left)):
                if i == 0:
                    lv = int2nat(left[0] - x)
                    lctx = INTERVALS_LEFT_IDX_BEGIN
                else:
                    lv = left[i] - prev - 1
                    lctx = INTERVALS_LEFT_IDX_BEGIN + 1 + min(
                        _token(prev_left_coded), 30
                    )
                yield ("huff", lctx, lv)
                prev_left_coded = lv
                nv = length[i] - params.min_interval_len
                nctx = (
                    INTERVALS_LEN_IDX_BEGIN
                    if i == 0
                    else INTERVALS_LEN_IDX_BEGIN + 1 + min(_token(prev_len_coded), 30)
                )
                yield ("huff", nctx, nv)
                prev_len_coded = nv
                prev = left[i] + length[i]
        else:
            residuals = extras
        if residuals:
            ctx = RESIDUALS_IDX_BEGIN + min(_token(len(residuals)), 31)
            rv = int2nat(residuals[0] - x)
            yield ("huff", ctx, rv)
            prev_coded = rv
            prev = residuals[0]
            for r in residuals[1:]:
                ctx = RESIDUALS_IDX_BEGIN + 32 + min(_token(prev_coded), 79)
                rv = r - prev - 1
                yield ("huff", ctx, rv)
                prev_coded = rv
                prev = r
    return


def _pass1_huffman(adj: dict, n_nodes: int, p: BVGraphParams,
                   node_base: int):
    """Greedy reference selection + per-context value collection.
    Deterministic in (adj, p, node_base) — the parallel export replays
    it in both stages instead of shipping the choices."""
    cbs = p.window_size + 1
    choices: dict[int, int] = {}
    win_list: list[list[int]] = [[] for _ in range(cbs)]
    win_ref_count = [0] * cbs
    values: list[list[int]] = [[] for _ in range(NUM_CONTEXTS)]
    for node in range(node_base, node_base + n_nodes):
        succ = adj.get(node, [])
        idx = node % cbs
        win_list[idx] = succ
        if not succ:
            win_ref_count[idx] = 0
            choices[node] = 0
            # pass 2 still emits the outdegree-0 symbol for this node
            # (_node_stream yields it before returning) — collect it or
            # the header omits token 0 from this context and write_next
            # fails on replay (caught by the tiny-graph file-family test)
            values[_outd_ctx(node)].append(0)
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
        choices[node] = best_r
        ref_list = win_list[(node - best_r) % cbs] if best_r else []
        for kind, ctx, v in _node_stream(node, succ, best_r, ref_list, p):
            if kind == "huff":
                values[ctx].append(v)
    return choices, values


def _pass2_huffman(adj: dict, n_nodes: int, p: BVGraphParams,
                   node_base: int, choices, enc: HuffmanEncoder,
                   w: BitWriter):
    """Entropy-coded emission with prebuilt tables; headers are the
    caller's concern (inline for the single writer, a separate driver
    segment for the parallel export)."""
    cbs = p.window_size + 1
    offsets = []
    arcs = 0
    win_list: list[list[int]] = [[] for _ in range(cbs)]
    for node in range(node_base, node_base + n_nodes):
        succ = adj.get(node, [])
        arcs += len(succ)
        offsets.append(w.written_bits)
        r = choices[node]
        ref_list = win_list[(node - r) % cbs] if r else []
        for kind, ctx, v in _node_stream(node, succ, r, ref_list, p):
            if kind == "huff":
                enc.write_next(v, w, ctx)
            elif kind == "unary":
                w.write_unary(v)
            else:
                w.write_gamma(v)
        win_list[node % cbs] = succ
    offsets.append(w.written_bits)
    return offsets, arcs


def encode_graph_huffman(
    adjacency, n_nodes: int, params: BVGraphParams | None = None, node_base: int = 0
):
    """Two-pass hybrid compression. adjacency: iterable of
    (node, sorted successors) in increasing node order. Returns
    (stream_bytes, bit_offsets[n+1], params): bit_offsets[0] is the end
    of the Huffman headers == start of node 0's record."""
    p = params or BVGraphParams()
    adj = {node: list(succ) for node, succ in adjacency}
    choices, values = _pass1_huffman(adj, n_nodes, p, node_base)
    w = BitWriter()
    enc = HuffmanEncoder()
    enc.init(values, w)
    offsets, arcs = _pass2_huffman(adj, n_nodes, p, node_base, choices, enc, w)
    from dataclasses import replace

    return w.to_bytes(), offsets, replace(p, nodes=n_nodes, arcs=arcs)


def range_histograms_huffman(adjacency, n_nodes, p, node_base):
    """Parallel-export stage 1: this node range's per-context token
    histograms (window reset at the range boundary) as an int64
    [NUM_CONTEXTS, 256] array (merged by elementwise sum), plus the
    reference choices as a uint8 array (r <= window_size < 256) so
    stage 2 never replays the quadratic selection pass."""
    adj = {node: list(succ) for node, succ in adjacency}
    choices, values = _pass1_huffman(adj, n_nodes, p, node_base)
    ch = np.fromiter(
        (choices[node] for node in range(node_base, node_base + n_nodes)),
        dtype=np.uint8,
        count=n_nodes,
    )
    return np.asarray(HuffmanEncoder.histograms(values), dtype=np.int64), ch


def encode_range_huffman(adjacency, n_nodes, p, node_base, histograms,
                         choices=None):
    """Parallel-export stage 2: emit this range's headerless stream
    with the GLOBAL tables rebuilt from the merged histograms. Returns
    (stream_bytes, bit_offsets rel. 0, arcs). choices: uint8 array of
    stage-1 reference selections for [node_base, node_base+n) — when
    None the (deterministic) pass 1 is replayed instead."""
    adj = {node: list(succ) for node, succ in adjacency}
    if choices is None:
        ch, _ = _pass1_huffman(adj, n_nodes, p, node_base)
    else:
        ch = {node_base + i: int(choices[i]) for i in range(n_nodes)}
    enc = HuffmanEncoder()
    enc.build_tables(histograms)
    w = BitWriter()
    offsets, arcs = _pass2_huffman(adj, n_nodes, p, node_base, ch, enc, w)
    return w.to_bytes(), offsets, arcs


def headers_huffman(histograms):
    """Parallel-export driver step: the header segment for the merged
    histograms, as a (bytes, nbits) bitstream part."""
    enc = HuffmanEncoder()
    enc.build_tables(histograms)
    w = BitWriter()
    enc.write_headers(w)
    return w.to_bytes(), w.written_bits


class HuffBVGraphReader:
    """Random-access + sequential decoder of the hybrid stream
    (mirror of bvgraph_huffman_in.rs decode_list)."""

    def __init__(self, stream: bytes, offsets, params: BVGraphParams,
                 node_base: int = 0):
        self.reader = BitReader(stream)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.p = params
        self.node_base = node_base
        self.huff = HuffmanDecoder()
        self.huff.decode_headers(self.reader, NUM_CONTEXTS)

    @property
    def num_nodes(self) -> int:
        return self.p.nodes

    @property
    def num_arcs(self) -> int:
        return self.p.arcs

    def outdegree(self, x: int) -> int:
        r = self.reader.fork()
        r.position(self.offsets[x - self.node_base])
        return self.huff.read_next(r, _outd_ctx(x))

    def successors(self, x: int) -> list[int]:
        return self._decode(x, self.reader.fork())

    def _decode(self, x: int, r: BitReader) -> list[int]:
        r.position(self.offsets[x - self.node_base])

        def resolve(y: int) -> list[int]:
            return self._decode(y, r.fork())

        return self._read_list(x, r, resolve)

    def iter_lists(self, start: int | None = None, stop: int | None = None):
        base = self.node_base
        lo = base if start is None else start
        hi = base + self.p.nodes if stop is None else stop
        w = self.p.window_size
        window: dict[int, list[int]] = {}
        for x in range(max(base, lo - w), lo):
            window[x] = self.successors(x)
        r = self.reader.fork()
        r.position(int(self.offsets[lo - base]))

        def resolve(y: int) -> list[int]:
            return window[y]

        for x in range(lo, hi):
            succ = self._read_list(x, r, resolve)
            window[x] = succ
            window.pop(x - w - 1, None)
            yield x, succ

    def _read_list(self, x: int, r: BitReader, resolve_ref) -> list[int]:
        p = self.p
        huff = self.huff
        degree = huff.read_next(r, _outd_ctx(x))
        if degree == 0:
            return []
        reference = r.read_unary() if p.window_size > 0 else 0

        blocks: list[int] = []
        extra_count = degree
        ref_list: list[int] = []
        if reference > 0:
            block_count = r.read_gamma()
            for i in range(block_count):
                ctx = BLOCKS_IDX_BEGIN + (0 if i == 0 else i % 2 + 1)
                b = huff.read_next(r, ctx) + (0 if i == 0 else 1)
                blocks.append(b)
            ref_list = resolve_ref(x - reference)
            total = sum(blocks)
            copied = sum(b for i, b in enumerate(blocks) if i % 2 == 0)
            if block_count % 2 == 0:
                copied += len(ref_list) - total
            extra_count = degree - copied

        left: list[int] = []
        length: list[int] = []
        if extra_count > 0 and p.min_interval_len != 0:
            interval_count = r.read_gamma()
            if interval_count:
                prev_left_coded = huff.read_next(r, INTERVALS_LEFT_IDX_BEGIN)
                prev_len_coded = huff.read_next(r, INTERVALS_LEN_IDX_BEGIN)
                first_left = nat2int(prev_left_coded) + x
                first_len = prev_len_coded + p.min_interval_len
                left.append(first_left)
                length.append(first_len)
                prev = first_left + first_len
                extra_count -= first_len
                for _ in range(1, interval_count):
                    lctx = INTERVALS_LEFT_IDX_BEGIN + 1 + min(
                        _token(prev_left_coded), 30
                    )
                    prev_left_coded = huff.read_next(r, lctx)
                    l = prev + prev_left_coded + 1
                    nctx = INTERVALS_LEN_IDX_BEGIN + 1 + min(_token(prev_len_coded), 30)
                    prev_len_coded = huff.read_next(r, nctx)
                    ln = prev_len_coded + p.min_interval_len
                    left.append(l)
                    length.append(ln)
                    prev = l + ln
                    extra_count -= ln

        residuals: list[int] = []
        if extra_count > 0:
            ctx = RESIDUALS_IDX_BEGIN + min(_token(extra_count), 31)
            prev_coded = huff.read_next(r, ctx)
            v = x + nat2int(prev_coded)
            residuals.append(v)
            for _ in range(extra_count - 1):
                ctx = RESIDUALS_IDX_BEGIN + 32 + min(_token(prev_coded), 79)
                prev_coded = huff.read_next(r, ctx)
                v = v + prev_coded + 1
                residuals.append(v)

        extra = residuals
        if left:
            ivals = [l + i for l, ln in zip(left, length) for i in range(ln)]
            extra = sorted(ivals + residuals) if residuals else ivals

        if reference > 0:
            copy_mask: list[bool] = []
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
            return sorted(block_list + extra)
        return extra


# ---------------------------------------------------------------------------
# file family I/O (.graph / .offsets[.ef] / .properties)
# ---------------------------------------------------------------------------
#
# Mirrors the reference's hybrid-Huffman binaries (src/bin/
# compress_huff.rs store, decompress_huff.rs:35-38 load): the BVGraph
# trio with HUFFMAN compressionflags. The reference's Zuckerli family
# emits the SAME flags (its binaries both check the same tuple), so as
# there the caller chooses the decoder; the shared flag check lives in
# zuckerli._check_huffman_family.


def store_huffgraph(adjacency, n_nodes: int, basename: str,
                    params=None, ef_offsets: bool = False):
    """Write basename.{graph,offsets[.ef],properties} in the hybrid
    Huffman-BVGraph format (headers + stream; ref bvgraph_huffman_out.rs
    store:160-189)."""
    from dataclasses import replace

    from webgraph_spark.bvgraph import write_offsets, write_properties
    from webgraph_spark.zuckerli import _HUFF_SECTIONS

    stream, offsets, out = encode_graph_huffman(adjacency, n_nodes, params)
    out = replace(out, **_HUFF_SECTIONS)
    with open(basename + ".graph", "wb") as f:
        f.write(stream)
    write_offsets(offsets, basename, out, ef=ef_offsets)
    write_properties(out, basename)
    return out


def load_huffgraph(basename: str) -> "HuffBVGraphReader":
    """Random-access reader over basename.{graph,offsets[.ef],properties}."""
    from webgraph_spark.bvgraph import read_offsets, read_properties
    from webgraph_spark.zuckerli import _check_huffman_family

    params = read_properties(basename)
    _check_huffman_family(params, basename)
    with open(basename + ".graph", "rb") as f:
        stream = f.read()
    offsets = read_offsets(basename, params)
    return HuffBVGraphReader(stream, offsets, params)


def edges_to_huffgraph(edges, basename: str, params=None,
                       ef_offsets: bool = False,
                       num_ranges: int | None = None):
    """Edge DataFrame -> hybrid-Huffman files.

    num_ranges=None: driver-streamed single-writer encode (small-graph
    path; aggregation/sorting distributed). num_ranges=R>1: the
    two-stage parallel export (bvgraph.parallel_entropy_export) —
    distributed per-range histograms, one GLOBAL header from the merged
    statistics, distributed per-range emission, driver bit-rebase."""
    from webgraph_spark.bvgraph import (
        driver_adjacency,
        parallel_entropy_export,
    )
    from webgraph_spark.zuckerli import _HUFF_SECTIONS

    if num_ranges and num_ranges > 1:
        out = parallel_entropy_export(
            edges, basename, params, ef_offsets, num_ranges,
            range_histograms_huffman, encode_range_huffman,
            headers_huffman, _HUFF_SECTIONS,
        )
        if out is not None:
            return out
    it, n_nodes = driver_adjacency(edges)
    return store_huffgraph(it, n_nodes, basename, params,
                           ef_offsets=ef_offsets)


def huffgraph_to_edges(spark, basename: str, num_slices: int | None = None):
    """Hybrid-Huffman files -> edges(src, dst), decoded DISTRIBUTED via
    bvgraph.distributed_decode_edges."""
    from webgraph_spark.bvgraph import (
        distributed_decode_edges,
        read_offsets,
        read_properties,
    )
    from webgraph_spark.zuckerli import _check_huffman_family

    params = read_properties(basename)
    _check_huffman_family(params, basename)
    with open(basename + ".graph", "rb") as f:
        stream = f.read()
    offsets = read_offsets(basename, params)
    return distributed_decode_edges(
        spark, stream, offsets, params, HuffBVGraphReader, num_slices
    )
