"""Canonical Huffman (O24-O26) + hybrid Huffman-BVGraph codec (O29):
package-merge properties, header roundtrips, full-graph roundtrips
(random access, sequential, mid-stream), density vs the plain BV codec,
and the engine-side CSR block option."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.bvgraph import BitReader, BitWriter, BVGraphParams, encode_graph
from webgraph_spark.bvgraph_huffman import (
    NUM_CONTEXTS,
    HuffBVGraphReader,
    encode_graph_huffman,
)
from webgraph_spark.huffman import (
    K_MAX_HUFFMAN_BITS,
    HuffmanDecoder,
    HuffmanEncoder,
    compute_symbol_bits,
    compute_symbol_num_bits,
)


class TestCanonicalHuffman:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_package_merge_kraft_and_cap(self, seed):
        rng = np.random.default_rng(seed)
        histo = [0] * 256
        for s in rng.integers(0, 256, 40).tolist():
            histo[s] += int(rng.zipf(1.4))
        nbits = compute_symbol_num_bits(histo)
        present = [s for s in range(256) if histo[s] > 0]
        assert all(1 <= nbits[s] <= K_MAX_HUFFMAN_BITS for s in present)
        assert all(nbits[s] == 0 for s in range(256) if histo[s] == 0)
        # Kraft equality — the code is complete
        assert sum(2 ** (K_MAX_HUFFMAN_BITS - nbits[s]) for s in present) == 256

    def test_skewed_distribution_gets_short_code_for_heavy_symbol(self):
        histo = [0] * 256
        histo[7] = 10_000
        for s in range(20, 36):
            histo[s] = 1
        nbits = compute_symbol_num_bits(histo)
        assert nbits[7] == min(n for n in nbits if n > 0)
        assert nbits[7] < max(nbits)

    def test_canonical_bits_are_prefix_free(self):
        histo = [0] * 256
        for s, c in [(0, 50), (1, 30), (2, 10), (3, 5), (9, 5), (100, 1), (255, 1)]:
            histo[s] = c
        nbits = compute_symbol_num_bits(histo)
        bits = compute_symbol_bits(nbits)
        codes = [(nbits[s], bits[s]) for s in range(256) if nbits[s] > 0]
        for ln_a, c_a in codes:
            for ln_b, c_b in codes:
                if (ln_a, c_a) == (ln_b, c_b):
                    continue
                if ln_a <= ln_b:
                    assert (c_b >> (ln_b - ln_a)) != c_a, "prefix collision"

    @pytest.mark.parametrize("dist", ["zipf", "uniform", "constant", "two"])
    def test_stream_roundtrip(self, dist):
        rng = np.random.default_rng(11)
        vals = {
            "zipf": np.minimum(rng.zipf(1.3, 4000), 1 << 30).astype(int).tolist(),
            "uniform": rng.integers(0, 1 << 20, 4000).astype(int).tolist(),
            "constant": [42] * 500,
            "two": [0, 1] * 300,
        }[dist]
        w = BitWriter()
        enc = HuffmanEncoder()
        enc.init([vals], w)
        for v in vals:
            enc.write_next(v, w, 0)
        r = BitReader(w.to_bytes())
        dec = HuffmanDecoder()
        dec.decode_headers(r, 1)
        assert [dec.read_next(r, 0) for _ in vals] == vals

    def test_multi_context_streams_are_independent(self):
        rng = np.random.default_rng(4)
        ctxs = [rng.integers(0, 10, 500).tolist(), rng.zipf(2.0, 500).astype(int).tolist(), []]
        w = BitWriter()
        enc = HuffmanEncoder()
        enc.init(ctxs, w)
        seq = [(c, v) for c, vals in enumerate(ctxs) for v in vals]
        rng.shuffle(seq)
        for c, v in seq:
            enc.write_next(v, w, c)
        r = BitReader(w.to_bytes())
        dec = HuffmanDecoder()
        dec.decode_headers(r, len(ctxs))
        assert [dec.read_next(r, c) for c, _ in seq] == [v for _, v in seq]


def _weblike_adj(n, seed, share=True):
    rng = np.random.default_rng(seed)
    base = sorted(rng.integers(0, n * 3, 40).tolist())
    adj = []
    for x in range(n):
        succ = set(base if (share and x % 3) else [])
        succ |= set(range((x * 3) % (n * 2), (x * 3) % (n * 2) + 6))
        succ |= {int(v) for v in rng.integers(0, n * 3, 4)}
        adj.append((x, sorted(succ)))
    return adj


class TestHybridCodec:
    @pytest.mark.parametrize("params", [
        BVGraphParams(),
        BVGraphParams(window_size=0),
        BVGraphParams(min_interval_len=0),
        BVGraphParams(window_size=1, max_ref_count=1),
    ])
    def test_roundtrip(self, params):
        adj = _weblike_adj(600, seed=7)
        stream, offsets, out = encode_graph_huffman(iter(adj), 600, params)
        r = HuffBVGraphReader(stream, offsets, out)
        expect = dict(adj)
        order = np.random.default_rng(1).permutation(600)
        for x in order.tolist():
            assert r.successors(x) == expect.get(x, []), f"node {x}"
            assert r.outdegree(x) == len(expect.get(x, []))
        assert dict(r.iter_lists()) == {x: expect.get(x, []) for x in range(600)}
        assert dict(r.iter_lists(200, 350)) == {
            x: expect[x] for x in range(200, 350)
        }

    def test_denser_than_plain_bv_on_weblike_graph(self):
        # the entropy coder is the hybrid's reason to exist: on a
        # web-like graph it must beat the fixed instantaneous codes
        adj = _weblike_adj(1500, seed=5)
        m = sum(len(s) for _, s in adj)
        hstream, _, _ = encode_graph_huffman(iter(adj), 1500)
        bstream, _, _ = encode_graph(iter(adj), 1500)
        assert len(hstream) < len(bstream), (
            len(hstream) / m, len(bstream) / m,
        )

    def test_node_base_blocks(self):
        # engine CSR-block mode: absolute ids, window within the block
        adj = [(x, sorted({(x * 7) % 900 + 1000, x + 1001})) for x in range(500, 700)]
        stream, offsets, out = encode_graph_huffman(iter(adj), 200, node_base=500)
        r = HuffBVGraphReader(stream, offsets, out, node_base=500)
        expect = dict(adj)
        for x in range(500, 700):
            assert r.successors(x) == expect.get(x, [])

    def test_context_count_matches_reference_layout(self):
        # bvgraph_huffman_out.rs:8-19: 32+3+112+32+32 = 211
        assert NUM_CONTEXTS == 211


class TestHybridCsrBlocks:
    def test_csr_huff_roundtrip(self, spark, small_graph):
        from webgraph_spark.csr import build_csr_huff, decode_csr_huff

        edges, n, src, dst = small_graph
        blocks = build_csr_huff(edges, num_blocks=4)
        back = {(r.src, r.dst) for r in decode_csr_huff(blocks).collect()}
        want = {(int(a), int(b)) for a, b in zip(src, dst)}
        assert back == want
