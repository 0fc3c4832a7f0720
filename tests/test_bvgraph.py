"""BVGraph bit-format family: codes, compressor, file interop.

Mirrors the reference's own test strategy (SURVEY.md §5.1): exhaustive
code roundtrips (ref src/bitstreams/tests.rs:144-196), golden
successor-list checks on a known graph, permutation of the encode
pipeline, and the end-to-end store->load byte equality style check
(ref src/main.rs:209-241).
"""

import numpy as np
import pytest

from webgraph_spark.bvgraph import (
    BitReader,
    BitWriter,
    BVGraphParams,
    BVGraphReader,
    bvgraph_to_edges,
    edges_to_bvgraph,
    encode_graph,
    int2nat,
    load_bvgraph,
    nat2int,
    read_properties,
    store_bvgraph,
    write_properties,
)


def _roundtrip(values, write, read):
    w = BitWriter()
    for v in values:
        write(w, v)
    r = BitReader(w.to_bytes())
    return [read(r) for _ in values]


class TestCodes:
    def test_unary_roundtrip(self):
        vals = list(range(200)) + [500, 1000]
        got = _roundtrip(vals, lambda w, v: w.write_unary(v), lambda r: r.read_unary())
        assert got == vals

    @pytest.mark.parametrize("code", ["gamma", "delta", "zeta"])
    def test_code_roundtrip_exhaustive(self, code):
        vals = list(range(2000)) + [10**4, 10**6, 10**9, 2**40]
        if code == "gamma":
            got = _roundtrip(vals, lambda w, v: w.write_gamma(v), lambda r: r.read_gamma())
        elif code == "delta":
            got = _roundtrip(vals, lambda w, v: w.write_delta(v), lambda r: r.read_delta())
        else:
            got = _roundtrip(
                vals, lambda w, v: w.write_zeta(v, 3), lambda r: r.read_zeta(3)
            )
        assert got == vals

    def test_gamma_known_bit_lengths(self):
        # γ(x) costs 2*floor(log2(x+1))+1 bits — spot-check the classic table
        for x, bits in [(0, 1), (1, 3), (2, 3), (3, 5), (6, 5), (7, 7)]:
            w = BitWriter()
            w.write_gamma(x)
            assert w.written_bits == bits, x

    def test_zeta3_vs_gamma_are_different_codes(self):
        w1, w2 = BitWriter(), BitWriter()
        for v in range(100):
            w1.write_gamma(v)
            w2.write_zeta(v, 3)
        assert w1.to_bytes() != w2.to_bytes()

    def test_zuckerli_hybrid_int(self):
        from webgraph_spark.bvgraph import (
            read_zuck,
            write_zuck,
            zuck_join,
            zuck_split,
        )

        vals = list(range(3000)) + [10**6, 10**9, 2**40]
        # pure split/join inverse
        for v in vals:
            t, nb, b = zuck_split(v)
            assert zuck_join(t, b) == v
        # small values are their own token (the 2^k direct range)
        for v in range(16):
            assert zuck_split(v) == (v, 0, 0)
        # streamed roundtrip
        w = BitWriter()
        for v in vals:
            write_zuck(w, v)
        r = BitReader(w.to_bytes())
        assert [read_zuck(r) for _ in vals] == vals

    def test_zigzag(self):
        for x in [0, 1, -1, 5, -5, 2**40, -(2**40)]:
            assert nat2int(int2nat(x)) == x
        assert [int2nat(x) for x in [0, -1, 1, -2, 2]] == [0, 1, 2, 3, 4]

    def test_mixed_stream_with_seek(self):
        w = BitWriter()
        marks = []
        for v in range(50):
            marks.append(w.written_bits)
            w.write_gamma(v)
            w.write_zeta(v * 7, 3)
            w.write_unary(v % 9)
        r = BitReader(w.to_bytes())
        # random-access re-reads via position() (ref tests.rs:199-215)
        for v in [37, 2, 49, 0, 25]:
            r.position(marks[v])
            assert r.read_gamma() == v
            assert r.read_zeta(3) == v * 7
            assert r.read_unary() == v % 9


def _random_adj(n, avg_deg, seed, runs=False):
    rng = np.random.default_rng(seed)
    adj = []
    for x in range(n):
        d = int(rng.poisson(avg_deg))
        if d == 0:
            continue
        succ = set(rng.integers(0, n, size=d).tolist())
        if runs and rng.random() < 0.5:
            start = int(rng.integers(0, max(1, n - 20)))
            succ |= set(range(start, start + int(rng.integers(4, 15))))
        if succ:
            adj.append((x, sorted(succ)))
    return adj


class TestEncodeDecode:
    @pytest.mark.parametrize("params", [
        BVGraphParams(),                                # defaults
        BVGraphParams(window_size=0),                   # no references
        BVGraphParams(min_interval_len=0),              # no intervals
        BVGraphParams(window_size=1, max_ref_count=1),
        BVGraphParams(outdegree_coding="delta", residual_coding="gamma",
                      reference_coding="gamma", block_coding="zeta",
                      block_count_coding="delta", interval_coding="zeta"),
        BVGraphParams(outdegree_coding="zeta", residual_coding="delta"),
    ])
    def test_roundtrip_random(self, params):
        from dataclasses import replace

        adj = _random_adj(300, 8, seed=3, runs=True)
        data, offsets, out = encode_graph(adj, 300, params)
        reader = BVGraphReader(data, offsets, replace(params, nodes=300, arcs=out.arcs))
        expect = {x: s for x, s in adj}
        for x in range(300):
            assert reader.successors(x) == expect.get(x, []), f"node {x}"
            assert reader.outdegree(x) == len(expect.get(x, []))

    def test_cost_model_matches_trial_encoding(self):
        # the closed-form cost (Zuckerli cost-model idea, exact for
        # fixed codes) must equal the trial-encoded bit count for every
        # (node, reference, lists, params) combination
        from webgraph_spark.bvgraph import BitWriter, _encode_cost, _encode_list

        rng = np.random.default_rng(17)
        param_sets = [
            BVGraphParams(),
            BVGraphParams(min_interval_len=0),
            BVGraphParams(outdegree_coding="delta", residual_coding="gamma",
                          reference_coding="gamma", block_coding="zeta",
                          block_count_coding="delta", interval_coding="zeta"),
        ]
        for params in param_sets:
            for trial in range(200):
                node = int(rng.integers(0, 500))
                curr = sorted(set(rng.integers(0, 600, rng.integers(1, 40)).tolist()))
                ref = sorted(set(rng.integers(0, 600, rng.integers(0, 40)).tolist()))
                reference = int(rng.integers(0, 4)) if ref else 0
                w = BitWriter()
                want = _encode_list(w, node, reference, ref, curr, params)
                got = _encode_cost(node, reference, ref, curr, params)
                assert got == want, (params, node, reference, ref, curr)

    def test_reference_chains_compress_similar_lists(self):
        # consecutive nodes share most successors -> copy blocks win
        base = sorted(np.random.default_rng(1).integers(0, 5000, 60).tolist())
        adj = []
        for x in range(100):
            succ = sorted(set(base + [x * 7 % 5000]))
            adj.append((x, succ))
        with_refs, off1, _ = encode_graph(adj, 100, BVGraphParams())
        no_refs, off2, _ = encode_graph(adj, 100, BVGraphParams(window_size=0))
        assert len(with_refs) < len(no_refs) / 3  # chains >3x smaller here

    def test_intervalization_compresses_runs(self):
        # successor lists that are mostly consecutive runs
        adj = [(x, list(range(x % 50, x % 50 + 40))) for x in range(0, 200, 2)]
        with_iv, _, _ = encode_graph(adj, 200, BVGraphParams(window_size=0))
        no_iv, _, _ = encode_graph(
            adj, 200, BVGraphParams(window_size=0, min_interval_len=0))
        assert len(with_iv) < len(no_iv) / 3  # runs collapse to (left, len)

    def test_windowed_sequential_scan_matches_random_access(self):
        # entry point C (bvgraph.rs:672-713): iter_lists resolves
        # references from the window, random access by recursion —
        # identical output, including mid-stream ranges with warm-up
        adj = _random_adj(250, 7, seed=21, runs=True)
        data, offsets, out = encode_graph(adj, 250)
        reader = BVGraphReader(data, offsets, out)
        expect = {x: s for x, s in adj}
        got = dict(reader.iter_lists())
        assert got == {x: expect.get(x, []) for x in range(250)}
        # mid-stream range
        got_mid = dict(reader.iter_lists(100, 180))
        assert got_mid == {x: expect.get(x, []) for x in range(100, 180)}

    def test_offsets_random_access_matches_sequential(self):
        adj = _random_adj(200, 6, seed=9)
        data, offsets, out = encode_graph(adj, 200)
        assert len(offsets) == 201
        assert offsets == sorted(offsets)
        reader = BVGraphReader(data, offsets, out)
        # decode in scrambled order — random access must not depend on
        # decode history (ref ascii_graph/tests.rs iteration-order checks)
        expect = {x: s for x, s in adj}
        order = np.random.default_rng(4).permutation(200)
        for x in order.tolist():
            assert reader.successors(x) == expect.get(x, [])


class TestFileFamily:
    def test_store_load_roundtrip(self, tmp_path):
        base = str(tmp_path / "g")
        adj = _random_adj(150, 5, seed=11, runs=True)
        out = store_bvgraph(adj, 150, base)
        assert out.nodes == 150
        g = load_bvgraph(base)
        assert g.num_nodes == 150 and g.num_arcs == out.arcs
        expect = {x: s for x, s in adj}
        for x in range(150):
            assert g.successors(x) == expect.get(x, [])

    def test_properties_field_set(self, tmp_path):
        base = str(tmp_path / "p")
        write_properties(BVGraphParams(nodes=7, arcs=13), base)
        text = open(base + ".properties").read()
        # the reference's exact header fields (properties.rs:84-139)
        for needle in [
            "graphclass=it.unimi.dsi.webgraph.BVGraph", "nodes=7", "arcs=13",
            "windowsize=7", "maxrefcount=3", "minintervallength=4",
            "zetak=3", "compressionflags=", "version=0",
        ]:
            assert needle in text
        p = read_properties(base)
        assert (p.nodes, p.arcs, p.window_size) == (7, 13, 7)

    def test_store_produces_three_files(self, tmp_path):
        base = str(tmp_path / "t")
        store_bvgraph([(0, [1, 2]), (1, [0])], 3, base)
        for ext in [".graph", ".offsets", ".properties"]:
            assert (tmp_path / ("t" + ext)).exists()

    def test_nondefault_codes_store_load_roundtrip(self, tmp_path):
        # VERDICT r02 'do this' #5: a WebGraph user with non-default
        # section codes (e.g. δ-coded outdegrees) must be able to load
        # their files. Full file-family roundtrip through the flags.
        base = str(tmp_path / "nd")
        adj = _random_adj(120, 5, seed=13, runs=True)
        params = BVGraphParams(
            outdegree_coding="delta", residual_coding="gamma",
            reference_coding="gamma", offset_coding="delta",
            block_coding="zeta",
        )
        out = store_bvgraph(adj, 120, base, params)
        text = open(base + ".properties").read()
        for flag in ["OUTDEGREES_delta", "RESIDUALS_gamma",
                     "REFERENCES_gamma", "OFFSETS_delta", "BLOCKS_zeta"]:
            assert flag in text, text
        p = read_properties(base)
        assert p.outdegree_coding == "delta"
        assert p.residual_coding == "gamma"
        assert p.reference_coding == "gamma"
        assert p.offset_coding == "delta"
        assert p.block_coding == "zeta"
        assert p.block_count_coding == "gamma"  # untouched default
        g = load_bvgraph(base)
        expect = {x: s for x, s in adj}
        for x in range(120):
            assert g.successors(x) == expect.get(x, []), f"node {x}"
        assert g.num_arcs == out.arcs

    def test_reference_style_flag_string_parses(self, tmp_path):
        # the reference emits 'NAME_code |NAME_code' (properties.rs
        # Display, lowercase) and parses case-insensitively with
        # whitespace slack — accept both spellings, incl. BLOCK_COUNT
        base = str(tmp_path / "rf")
        write_properties(BVGraphParams(nodes=3, arcs=2), base)
        text = open(base + ".properties").read().replace(
            "compressionflags=",
            "compressionflags=OUTDEGREES_DELTA | BLOCK_COUNT_ZETA |RESIDUALS_gamma",
        )
        with open(base + ".properties", "w") as f:
            f.write(text)
        p = read_properties(base)
        assert p.outdegree_coding == "delta"
        assert p.block_count_coding == "zeta"
        assert p.residual_coding == "gamma"

    def test_unknown_flag_raises(self, tmp_path):
        base = str(tmp_path / "uk")
        write_properties(BVGraphParams(nodes=1, arcs=0), base)
        text = open(base + ".properties").read().replace(
            "compressionflags=", "compressionflags=WIDGETS_gamma"
        )
        with open(base + ".properties", "w") as f:
            f.write(text)
        with pytest.raises(ValueError):
            read_properties(base)

    def test_huffman_flags_parse_but_redirect_on_load(self, tmp_path):
        # HUFFMAN compressionflags now PARSE (the Zuckerli /
        # hybrid-Huffman file families carry them, r4) but the
        # universal-code loader must still refuse loudly and point at
        # the entropy-coded loaders, not decode garbage
        base = str(tmp_path / "hf")
        write_properties(BVGraphParams(nodes=1, arcs=0), base)
        text = open(base + ".properties").read().replace(
            "compressionflags=", "compressionflags=RESIDUALS_HUFFMAN"
        )
        with open(base + ".properties", "w") as f:
            f.write(text)
        p = read_properties(base)
        assert p.residual_coding == "huffman"
        with pytest.raises(NotImplementedError, match="load_zuckerli"):
            load_bvgraph(base)


class TestCsrBvCodec:
    def test_roundtrip_matches_varint_csr(self, spark, small_graph):
        from webgraph_spark.csr import build_csr_bv, decode_csr_bv

        edges, n, src, dst = small_graph
        blocks = build_csr_bv(edges, num_blocks=4)
        back = {(r.src, r.dst) for r in decode_csr_bv(blocks).collect()}
        want = {(int(a), int(b)) for a, b in zip(src, dst)}
        assert back == want

    def test_bv_denser_than_varint_on_runny_graph(self, spark):
        """Reference-chains + intervalization beat the flat varint codec
        on a graph with shared lists and consecutive runs (the web-graph
        regime the reference targets). Numbers recorded in BENCH.md."""
        import pandas as pd

        from webgraph_spark.csr import build_csr, build_csr_bv

        rng = np.random.default_rng(8)
        rows = []
        base = sorted(rng.integers(0, 3000, 50).tolist())
        for x in range(400):
            succ = set(base) | set(range((x * 3) % 2000, (x * 3) % 2000 + 8))
            succ |= {int(v) for v in rng.integers(0, 3000, 3)}
            rows.extend((x, s) for s in sorted(succ) if s != x)
        edges = spark.createDataFrame(
            pd.DataFrame(rows, columns=["src", "dst"])
        )
        m = edges.count()
        varint_bytes = build_csr(edges, 4).agg({"bytes": "sum"}).first()[0]
        bv_bytes = build_csr_bv(edges, 4).agg({"bytes": "sum"}).first()[0]
        # bv must be at least 3x denser here; varint ~ >=1 byte/edge
        assert bv_bytes * 3 < varint_bytes, (bv_bytes / m, varint_bytes / m)


class TestSparkInterop:
    def test_edges_bvgraph_roundtrip(self, spark, tmp_path, small_graph):
        edges, n, src, dst = small_graph
        base = str(tmp_path / "sg")
        out = edges_to_bvgraph(edges, base)
        assert out.arcs == edges.count()
        back = bvgraph_to_edges(spark, base)
        got = {(r.src, r.dst) for r in back.collect()}
        want = {(int(a), int(b)) for a, b in zip(src, dst)}
        assert got == want
