"""Full Zuckerli format (O27/O28): copy-shrunk residual deltas, RLE
zero-runs, 214-context entropy coding, cost-model reference selection.
Roundtrips engineered to hit the interleave/RLE paths hard."""

from __future__ import annotations

import numpy as np
import pytest

from webgraph_spark.bvgraph import BVGraphParams
from webgraph_spark.zuckerli import (
    NUM_CONTEXTS,
    RLE_CTX,
    ZuckerliReader,
    compute_blocks_and_residuals,
    encode_graph_zuckerli,
    _node_values,
)


def _roundtrip(adj, n, params=None, node_base=0):
    stream, offsets, out = encode_graph_zuckerli(iter(adj), n, params, node_base)
    r = ZuckerliReader(stream, offsets, out, node_base=node_base)
    expect = dict(adj)
    for x in range(node_base, node_base + n):
        got = r.successors(x)
        assert got == expect.get(x, []), f"node {x}: {got[:6]} != {expect.get(x, [])[:6]}"
        assert r.outdegree(x) == len(expect.get(x, []))
    assert dict(r.iter_lists()) == {
        x: expect.get(x, []) for x in range(node_base, node_base + n)
    }
    return stream, r


class TestDiff:
    def test_blocks_start_with_copy_and_drop_trailing(self):
        # identical lists: one full copy block, trailing dropped -> []
        blocks, res = compute_blocks_and_residuals([1, 2, 3], [1, 2, 3])
        assert blocks == [] and res == []
        # disjoint: leading zero-length copy block, skip tail dropped
        blocks, res = compute_blocks_and_residuals([5, 6], [1, 2])
        assert blocks == [0] and res == [5, 6]
        # interleaved
        blocks, res = compute_blocks_and_residuals([1, 3, 5], [1, 2, 5])
        assert res == [3]
        assert blocks[0] == 1  # copy [1], skip [2], copy [5] implied/dropped

    def test_zero_deltas_from_interleaved_copies(self):
        # curr = ref evens + odd residuals between them -> every
        # residual gap is fully covered by copies -> zero deltas + RLE
        ref = list(range(0, 40, 2))
        curr = sorted(set(ref) | set(range(1, 40, 2)))
        items = _node_values(100, curr, 1, ref, 4)
        huff_vals = [(c, v) for k, c, v in items if k == "huff"]
        assert any(c == RLE_CTX for c, _ in huff_vals), "RLE context unused"
        zero_deltas = [v for c, v in huff_vals if v == 0 and c != RLE_CTX]
        assert len(zero_deltas) >= 4


class TestRoundtrip:
    def test_rle_heavy_graph(self):
        # consecutive nodes share an arithmetic backbone and add
        # interleaved extras -> references + copy-shrunk zero runs
        adj = []
        for x in range(300):
            backbone = list(range(0, 120, 2))
            extras = list(range(1, 120, 2)) if x % 2 else [121, 125]
            adj.append((x, sorted(set(backbone) | set(extras))))
        stream, r = _roundtrip(adj, 300)

    @pytest.mark.parametrize("seed", [3, 9])
    def test_random_weblike(self, seed):
        rng = np.random.default_rng(seed)
        base = sorted(rng.integers(0, 3000, 50).tolist())
        adj = []
        for x in range(800):
            succ = set(base if x % 4 else []) | {
                int(v) for v in rng.integers(0, 3000, rng.integers(0, 12))
            }
            succ |= set(range((x * 5) % 2000, (x * 5) % 2000 + int(rng.integers(0, 7))))
            if succ:
                adj.append((x, sorted(succ)))
        _roundtrip(adj, 800)

    def test_sparse_and_empty_nodes(self):
        adj = [(0, [5]), (7, [0, 1, 2, 3, 4, 5, 6, 8]), (31, [31 + 1]),
               (32, [40]), (33, [40, 41])]
        _roundtrip(adj, 64)

    def test_node_base_block_mode(self):
        adj = [(x, sorted({x + 1, (x * 3) % 400 + 500})) for x in range(200, 320)]
        _roundtrip(adj, 120, node_base=200)

    def test_window_zero_no_references(self):
        adj = [(x, sorted({(x * 7) % 90, (x * 11) % 90 + 90})) for x in range(100)]
        _roundtrip(adj, 100, BVGraphParams(window_size=0))

    def test_mid_stream_iteration(self):
        adj = [(x, sorted(set(range(x % 20, x % 20 + 15)))) for x in range(400)]
        stream, offsets, out = encode_graph_zuckerli(iter(adj), 400)
        r = ZuckerliReader(stream, offsets, out)
        expect = dict(adj)
        assert dict(r.iter_lists(150, 260)) == {
            x: expect[x] for x in range(150, 260)
        }

    def test_rle_threshold_guard(self):
        with pytest.raises(ValueError):
            encode_graph_zuckerli(iter([(0, [1])]), 2, BVGraphParams(min_interval_len=0))


class TestFormatShape:
    def test_context_layout_matches_reference(self):
        # zuckerli_in.rs:8-23: 1+32+64+1+3+32+80+1 = 214
        assert NUM_CONTEXTS == 214

    def test_denser_than_hybrid_on_interleaved_graph(self):
        # the copy-shrunk + RLE machinery is Zuckerli's edge over the
        # hybrid on graphs whose lists interleave with their reference
        from webgraph_spark.bvgraph_huffman import encode_graph_huffman

        adj = []
        for x in range(600):
            backbone = list(range(0, 160, 2))
            extras = list(range(1, 160, 2)) if x % 2 else [161]
            adj.append((x, sorted(set(backbone) | set(extras))))
        z, _, _ = encode_graph_zuckerli(iter(adj), 600)
        h, _, _ = encode_graph_huffman(iter(adj), 600)
        assert len(z) < len(h), (len(z), len(h))
