"""Zuckerli context-modeled graph compression (reference O27 + O28).

The full Zuckerli format of the reference (`src/webgraph/zuckerli_out.rs`,
`zuckerli_in.rs`; Versari et al., IEEE Access 2020), distinct from both
plain BVGraph and the hybrid coder:

  * residuals are NOT gap-coded against each other alone — each delta
    is shrunk by the number of COPIED successors falling inside the
    gap (zuckerli_out.rs:1349-1378), so a list that interleaves with
    its reference produces runs of ZERO deltas;
  * zero runs >= min_interval_len collapse via RLE: the first
    min_interval_len zeros are emitted, the rest are replaced by one
    RLE_CTX count (zuckerli_out.rs:1379-1404, decode
    zuckerli_in.rs:857-887) — Zuckerli's replacement for BVGraph's
    explicit interval section;
  * every value is Huffman-coded in one of 214 contexts
    (zuckerli_in.rs:8-23): degree contexts keyed by node mod 32, block
    contexts by position parity, first-residual by residual count,
    chained residual contexts by the previous delta's token, one RLE
    context; the reference gap stays a universal (unary) code, exactly
    as the reference implementation does;
  * two-pass compression with a COST MODEL (O28,
    zuckerli_out.rs:981-1135,1190-1211): pass 1 scores every window
    candidate as sum(1 + tail_bits) per coded value (the reference's
    sym_cost table initialized to 1.0) — no trial encoding — records
    the choice, and collects per-context histograms; pass 2 writes the
    Huffman headers and replays the choices.

Blocks are computed by the Zuckerli variant of the diff
(compute_blocks_and_residuals, zuckerli_out.rs:1047-1100: leading
zero-length copy block, trailing block dropped when the reference is
exhausted or the scan ends mid-skip).

Encoder, cost model, and decoder share the single `_node_values`
walker + `_read_list` pair, roundtrip-tested on graphs engineered to
exercise the RLE/interleave machinery.
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
    int2nat,
    nat2int,
    zuck_split,
)
from webgraph_spark.huffman import HuffmanDecoder, HuffmanEncoder

# context layout — zuckerli_in.rs:8-23 (the reference-gap contexts are
# reserved in the layout but the reference codes the gap with a
# universal code; we mirror that)
FIRST_DEGREE_CTX = 0
DEGREE_BASE_CTX = 1
NUM_DEGREE_CTX = 32
REFERENCE_BASE_CTX = DEGREE_BASE_CTX + NUM_DEGREE_CTX
NUM_REFERENCE_CTX = 64
BLOCK_COUNT_CTX = REFERENCE_BASE_CTX + NUM_REFERENCE_CTX
BLOCK_CTX = BLOCK_COUNT_CTX + 1
BLOCK_CTX_EVEN = BLOCK_CTX + 1
BLOCK_CTX_ODD = BLOCK_CTX_EVEN + 1
FIRST_RESIDUAL_BASE_CTX = BLOCK_CTX_ODD + 1
NUM_FIRST_RESIDUAL_CTX = 32
RESIDUALS_BASE_CTX = FIRST_RESIDUAL_BASE_CTX + NUM_FIRST_RESIDUAL_CTX
NUM_RESIDUAL_CTX = 80
RLE_CTX = RESIDUALS_BASE_CTX + NUM_RESIDUAL_CTX
NUM_CONTEXTS = RLE_CTX + 1


def _token(v: int) -> int:
    return zuck_split(v, K_ZUCK, I_ZUCK, J_ZUCK)[0]


def _degree_ctx(x: int) -> int:
    if x % 32 == 0:
        return FIRST_DEGREE_CTX
    return DEGREE_BASE_CTX + min(_token(x % 32), NUM_DEGREE_CTX - 1)


def compute_blocks_and_residuals(curr: list[int], ref: list[int]):
    """Zuckerli diff (zuckerli_out.rs:1047-1100): alternating copy/skip
    block lengths starting with a (possibly zero-length) copy block;
    the trailing block is dropped when the reference is exhausted or
    the merge ends mid-skip. Returns (blocks, residuals sorted)."""
    blocks = [0]
    residuals: list[int] = []
    ipos = rpos = 0
    is_same = True
    while ipos < len(curr) and rpos < len(ref):
        a, b = curr[ipos], ref[rpos]
        if a == b:
            ipos += 1
            rpos += 1
            if not is_same:
                blocks.append(0)
            blocks[-1] += 1
            is_same = True
        elif a < b:
            ipos += 1
            residuals.append(a)
        else:
            if is_same:
                blocks.append(0)
            blocks[-1] += 1
            is_same = False
            rpos += 1
    residuals.extend(curr[ipos:])
    residuals.sort()
    if rpos == len(ref) or not is_same:
        blocks.pop()
    return blocks, residuals


def _adj_block(blocks: list[int], ref: list[int]) -> list[int]:
    """The copied successor values (even blocks + implicit copy tail),
    zuckerli_out.rs process_blocks:1103-1135."""
    out: list[int] = []
    copy = True
    pos = 0
    for blk in blocks:
        if copy:
            out.extend(ref[pos:pos + blk])
        pos += blk
        copy = not copy
    if copy:
        out.extend(ref[pos:])
    return out


def _node_values(x, succ, reference, ref_list, min_interval_len):
    """The (kind, ctx, value) sequence of one node record AFTER the
    degree: reference gap (unary), blocks, residual deltas with
    copy-shrinking + RLE (mirror of zuckerli_out.rs diff_comp)."""
    out: list[tuple[str, int, int]] = [("unary", 0, reference)]
    if reference != 0:
        blocks, residuals = compute_blocks_and_residuals(succ, ref_list)
        adj = _adj_block(blocks, ref_list)
        out.append(("huff", BLOCK_COUNT_CTX, len(blocks)))
        for j, blk in enumerate(blocks):
            ctx = BLOCK_CTX if j == 0 else (BLOCK_CTX_EVEN if j % 2 == 0 else BLOCK_CTX_ODD)
            out.append(("huff", ctx, blk if j == 0 else blk - 1))
    else:
        residuals = list(succ)
        adj = []

    res_items: list[tuple[int, int]] = []
    r = x
    last_delta = 0
    adj_pos = 0
    zero_run = 0
    for j, res in enumerate(residuals):
        if j == 0:
            ctx = FIRST_RESIDUAL_BASE_CTX + min(
                _token(len(residuals)), NUM_FIRST_RESIDUAL_CTX - 1
            )
            last_delta = int2nat(res - r)
        else:
            ctx = RESIDUALS_BASE_CTX + min(_token(last_delta), NUM_RESIDUAL_CTX - 1)
            last_delta = res - r
            while adj_pos < len(adj) and adj[adj_pos] < r:
                adj_pos += 1
            while adj_pos < len(adj) and adj[adj_pos] < res:
                last_delta -= 1
                adj_pos += 1
        if last_delta != 0:
            if zero_run >= min_interval_len:
                del res_items[len(res_items) - (zero_run - min_interval_len):]
                res_items.append((RLE_CTX, zero_run - min_interval_len))
            zero_run = 0
        if last_delta == 0:
            zero_run += 1
        res_items.append((ctx, last_delta))
        r = res + 1
    if zero_run >= min_interval_len:
        del res_items[len(res_items) - (zero_run - min_interval_len):]
        res_items.append((RLE_CTX, zero_run - min_interval_len))
    out.extend(("huff", ctx, v) for ctx, v in res_items)
    return out


def _cost(items) -> float:
    """O28 cost model (zuckerli_out.rs:981-996 with sym_cost == 1.0):
    each Huffman value costs 1 + tail_bits; structural unary excluded
    exactly like the reference's candidate scoring."""
    c = 0.0
    for kind, _ctx, v in items:
        if kind == "huff":
            c += 1 + zuck_split(v, K_ZUCK, I_ZUCK, J_ZUCK)[1]
    return c


def encode_graph_zuckerli(
    adjacency, n_nodes: int, params: BVGraphParams | None = None, node_base: int = 0
):
    """Two-pass Zuckerli compression (O28). adjacency: iterable of
    (node, sorted successors). Returns (stream, bit_offsets[n+1],
    params); bit_offsets[0] = end of the Huffman headers."""
    p = params or BVGraphParams()
    adj = {node: list(succ) for node, succ in adjacency}
    choices, values = _pass1_zuckerli(adj, n_nodes, p, node_base)
    w = BitWriter()
    enc = HuffmanEncoder()
    enc.init(values, w)
    offsets, arcs = _pass2_zuckerli(adj, n_nodes, p, node_base, choices, enc, w)
    from dataclasses import replace

    return w.to_bytes(), offsets, replace(p, nodes=n_nodes, arcs=arcs)


def _pass1_zuckerli(adj: dict, n_nodes: int, p: BVGraphParams,
                    node_base: int):
    """Cost-model reference selection + per-context value collection
    (deterministic; the parallel export replays it in both stages)."""
    if p.min_interval_len < 1:
        # min_interval_len doubles as the RLE zero-run threshold; at 0
        # the reference's encoder/decoder check orderings diverge — the
        # format is only defined for thresholds >= 1
        raise ValueError("zuckerli requires min_interval_len >= 1")
    cbs = p.window_size + 1
    win_list: list[list[int]] = [[] for _ in range(cbs)]
    win_ref_count = [0] * cbs
    choices: dict[int, int] = {}
    values: list[list[int]] = [[] for _ in range(NUM_CONTEXTS)]
    for node in range(node_base, node_base + n_nodes):
        succ = adj.get(node, [])
        idx = node % cbs
        win_list[idx] = succ
        values[_degree_ctx(node)].append(len(succ))
        if not succ:
            win_ref_count[idx] = 0
            choices[node] = 0
            continue
        win_ref_count[idx] = -1
        best_r, best_cand = 0, idx
        base_items = _node_values(node, succ, 0, [], p.min_interval_len)
        best_cost = _cost(base_items)
        for r in range(1, min(cbs, node - node_base + 1)):
            cand = (node - r) % cbs
            if win_ref_count[cand] < p.max_ref_count and len(win_list[cand]) > 0:
                c = _cost(
                    _node_values(node, succ, r, win_list[cand], p.min_interval_len)
                )
                if c + 1e-6 < best_cost:
                    best_cost, best_r, best_cand = c, r, cand
        win_ref_count[idx] = win_ref_count[best_cand] + 1 if best_r else 0
        choices[node] = best_r
        ref_list = win_list[(node - best_r) % cbs] if best_r else []
        for kind, ctx, v in _node_values(node, succ, best_r, ref_list, p.min_interval_len):
            if kind == "huff":
                values[ctx].append(v)
    return choices, values


def _pass2_zuckerli(adj: dict, n_nodes: int, p: BVGraphParams,
                    node_base: int, choices, enc: HuffmanEncoder,
                    w: BitWriter):
    """Emission with prebuilt tables; headers are the caller's concern."""
    cbs = p.window_size + 1
    offsets = []
    arcs = 0
    win_list: list[list[int]] = [[] for _ in range(cbs)]
    for node in range(node_base, node_base + n_nodes):
        succ = adj.get(node, [])
        arcs += len(succ)
        offsets.append(w.written_bits)
        enc.write_next(len(succ), w, _degree_ctx(node))
        if succ:
            r = choices[node]
            ref_list = win_list[(node - r) % cbs] if r else []
            for kind, ctx, v in _node_values(node, succ, r, ref_list, p.min_interval_len):
                if kind == "huff":
                    enc.write_next(v, w, ctx)
                else:
                    w.write_unary(v)
        win_list[node % cbs] = succ
    offsets.append(w.written_bits)
    return offsets, arcs


def range_histograms_zuckerli(adjacency, n_nodes, p, node_base):
    """Parallel-export stage 1: per-context token histograms for this
    node range (window reset at the boundary), int64 [NUM_CONTEXTS,
    256], plus the uint8 reference choices so stage 2 skips pass 1."""
    adj = {node: list(succ) for node, succ in adjacency}
    choices, values = _pass1_zuckerli(adj, n_nodes, p, node_base)
    ch = np.fromiter(
        (choices[node] for node in range(node_base, node_base + n_nodes)),
        dtype=np.uint8,
        count=n_nodes,
    )
    return np.asarray(HuffmanEncoder.histograms(values), dtype=np.int64), ch


def encode_range_zuckerli(adjacency, n_nodes, p, node_base, histograms,
                          choices=None):
    """Parallel-export stage 2: headerless range stream with the global
    tables rebuilt from the merged histograms. Returns
    (stream_bytes, bit_offsets rel. 0, arcs); choices as in
    encode_range_huffman."""
    adj = {node: list(succ) for node, succ in adjacency}
    if choices is None:
        ch, _ = _pass1_zuckerli(adj, n_nodes, p, node_base)
    else:
        ch = {node_base + i: int(choices[i]) for i in range(n_nodes)}
    enc = HuffmanEncoder()
    enc.build_tables(histograms)
    w = BitWriter()
    offsets, arcs = _pass2_zuckerli(adj, n_nodes, p, node_base, ch, enc, w)
    return w.to_bytes(), offsets, arcs


class ZuckerliReader:
    """Random-access + sequential decoder (O27; mirror of
    zuckerli_in.rs decode_list:727-907)."""

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
        return self.huff.read_next(r, _degree_ctx(x))

    def successors(self, x: int) -> list[int]:
        r = self.reader.fork()
        r.position(self.offsets[x - self.node_base])
        return self._read_list(x, r, self._resolve)

    def _resolve(self, y: int) -> tuple[int, list[int]]:
        r = self.reader.fork()
        r.position(self.offsets[y - self.node_base])
        lst = self._read_list(y, r, self._resolve)
        return len(lst), lst

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

        def resolve(y: int) -> tuple[int, list[int]]:
            return len(window[y]), window[y]

        for x in range(lo, hi):
            succ = self._read_list(x, r, resolve)
            window[x] = succ
            window.pop(x - w - 1, None)
            yield x, succ

    def _read_list(self, x: int, r: BitReader, resolve) -> list[int]:
        huff = self.huff
        degree = huff.read_next(r, _degree_ctx(x))
        if degree == 0:
            return []
        reference = r.read_unary()

        block_lengths: list[int] = []
        num_to_copy = 0
        ref_list: list[int] = []
        if reference > 0:
            block_count = huff.read_next(r, BLOCK_COUNT_CTX)
            block_end = 0
            for i in range(block_count):
                ctx = BLOCK_CTX if i == 0 else (
                    BLOCK_CTX_EVEN if i % 2 == 0 else BLOCK_CTX_ODD
                )
                blk = huff.read_next(r, ctx) + (0 if i == 0 else 1)
                block_end += blk
                block_lengths.append(blk)
            ref_outd, ref_list = resolve(x - reference)
            block_lengths.append(ref_outd - block_end)
            num_to_copy = sum(block_lengths[::2])

        num_residuals = degree - num_to_copy
        last_dest_plus_one = 0
        last_residual_delta = 0
        ref_pos = 0
        num_to_copy_from_current_block = block_lengths[0] if block_lengths else 0
        next_block = 1
        if num_to_copy_from_current_block == 0 and len(block_lengths) > 2:
            ref_pos = block_lengths[1]
            num_to_copy_from_current_block = block_lengths[2]
            next_block = 3

        contiguous_zeros = 0
        num_zeros_to_skip = 0
        out: list[int] = []
        min_il = self.p.min_interval_len

        for j in range(num_residuals):
            if j == 0:
                ctx = FIRST_RESIDUAL_BASE_CTX + min(
                    _token(num_residuals), NUM_FIRST_RESIDUAL_CTX - 1
                )
                last_residual_delta = huff.read_next(r, ctx)
                destination = x + nat2int(last_residual_delta)
            elif num_zeros_to_skip > 0:
                last_residual_delta = 0
                destination = last_dest_plus_one
            else:
                ctx = RESIDUALS_BASE_CTX + min(
                    _token(last_residual_delta), NUM_RESIDUAL_CTX - 1
                )
                last_residual_delta = huff.read_next(r, ctx)
                destination = last_dest_plus_one + last_residual_delta

            if last_residual_delta == 0 and num_zeros_to_skip == 0:
                contiguous_zeros += 1
            else:
                contiguous_zeros = 0
            if num_zeros_to_skip > 0:
                num_zeros_to_skip -= 1

            while (
                num_to_copy_from_current_block > 0
                and ref_list[ref_pos] <= destination
            ):
                num_to_copy_from_current_block -= 1
                out.append(ref_list[ref_pos])
                if j != 0 and ref_list[ref_pos] >= last_dest_plus_one:
                    destination += 1
                ref_pos += 1
                if (
                    num_to_copy_from_current_block == 0
                    and next_block + 1 < len(block_lengths)
                ):
                    ref_pos += block_lengths[next_block]
                    num_to_copy_from_current_block = block_lengths[next_block + 1]
                    next_block += 2

            if contiguous_zeros >= min_il:
                num_zeros_to_skip = huff.read_next(r, RLE_CTX)
                contiguous_zeros = 0

            out.append(destination)
            last_dest_plus_one = destination + 1

        while num_to_copy_from_current_block > 0:
            num_to_copy_from_current_block -= 1
            out.append(ref_list[ref_pos])
            ref_pos += 1
            if (
                num_to_copy_from_current_block == 0
                and next_block + 1 < len(block_lengths)
            ):
                ref_pos += block_lengths[next_block]
                num_to_copy_from_current_block = block_lengths[next_block + 1]
                next_block += 2

        return out


# ---------------------------------------------------------------------------
# file family I/O (.graph / .offsets[.ef] / .properties)
# ---------------------------------------------------------------------------
#
# Mirrors the reference's Zuckerli binaries (src/bin/compress_zuckerli.rs
# :1-61 store, decompress_zuckerli.rs:33-93 load): the same
# .graph/.offsets/.properties trio as BVGraph, with the entropy-coded
# sections declared as HUFFMAN compressionflags. Note the reference's
# Zuckerli and hybrid-Huffman families emit IDENTICAL flags — both its
# binaries check the same (HUFFMAN, GAMMA, HUFFMAN, GAMMA, UNARY,
# HUFFMAN, HUFFMAN) tuple — so, exactly as there, the caller picks the
# decoder; load_bvgraph redirects here loudly on those flags.

_HUFF_SECTIONS = dict(
    outdegree_coding="huffman",
    block_coding="huffman",
    interval_coding="huffman",
    residual_coding="huffman",
    reference_coding="unary",
    block_count_coding="gamma",
    offset_coding="gamma",
)


def _check_huffman_family(params: BVGraphParams, basename: str) -> None:
    bad = [k for k, v in _HUFF_SECTIONS.items() if getattr(params, k) != v]
    if bad:
        raise ValueError(
            f"{basename}.properties does not declare the Zuckerli / "
            f"hybrid-Huffman section codings (mismatched: {bad}); "
            "load plain BVGraph families with bvgraph.load_bvgraph"
        )


def store_zuckerli(adjacency, n_nodes: int, basename: str,
                   params: BVGraphParams | None = None,
                   ef_offsets: bool = False) -> BVGraphParams:
    """Write basename.{graph,offsets[.ef],properties} in the Zuckerli
    format (full headers + bitstream; ref zuckerli_out.rs:164-189)."""
    from dataclasses import replace

    from webgraph_spark.bvgraph import write_offsets, write_properties

    stream, offsets, out = encode_graph_zuckerli(adjacency, n_nodes, params)
    out = replace(out, **_HUFF_SECTIONS)
    with open(basename + ".graph", "wb") as f:
        f.write(stream)
    write_offsets(offsets, basename, out, ef=ef_offsets)
    write_properties(out, basename)
    return out


def load_zuckerli(basename: str) -> "ZuckerliReader":
    """Random-access reader over basename.{graph,offsets[.ef],properties}."""
    from webgraph_spark.bvgraph import read_offsets, read_properties

    params = read_properties(basename)
    _check_huffman_family(params, basename)
    with open(basename + ".graph", "rb") as f:
        stream = f.read()
    offsets = read_offsets(basename, params)
    return ZuckerliReader(stream, offsets, params)


def edges_to_zuckerli(edges, basename: str,
                      params: BVGraphParams | None = None,
                      ef_offsets: bool = False,
                      num_ranges: int | None = None) -> BVGraphParams:
    """Export an edge DataFrame to Zuckerli files.

    num_ranges=None: single-writer encode streamed through the driver
    (like the reference's single-threaded compressor; aggregation/
    sorting stays distributed). num_ranges=R>1: the two-stage parallel
    export (bvgraph.parallel_entropy_export) — distributed per-range
    histograms, one GLOBAL header, distributed per-range emission."""
    from webgraph_spark.bvgraph import (
        driver_adjacency,
        parallel_entropy_export,
    )
    from webgraph_spark.huffman import HuffmanEncoder

    def _headers(histograms):
        enc = HuffmanEncoder()
        enc.build_tables(histograms)
        w = BitWriter()
        enc.write_headers(w)
        return w.to_bytes(), w.written_bits

    if num_ranges and num_ranges > 1:
        out = parallel_entropy_export(
            edges, basename, params, ef_offsets, num_ranges,
            range_histograms_zuckerli, encode_range_zuckerli,
            _headers, _HUFF_SECTIONS,
        )
        if out is not None:
            return out
    it, n_nodes = driver_adjacency(edges)
    return store_zuckerli(it, n_nodes, basename, params, ef_offsets=ef_offsets)


def zuckerli_to_edges(spark, basename: str, num_slices: int | None = None):
    """Zuckerli files -> edges(src, dst) DataFrame, decoded DISTRIBUTED:
    broadcast bytes + driver-side offsets, one windowed node-range scan
    per task (bvgraph.distributed_decode_edges)."""
    from webgraph_spark.bvgraph import (
        distributed_decode_edges,
        read_offsets,
        read_properties,
    )

    params = read_properties(basename)
    _check_huffman_family(params, basename)
    with open(basename + ".graph", "rb") as f:
        stream = f.read()
    offsets = read_offsets(basename, params)
    return distributed_decode_edges(
        spark, stream, offsets, params, ZuckerliReader, num_slices
    )
