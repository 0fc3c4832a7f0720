"""CSR block layer: roundtrip, point lookup, degrees, kernel PageRank.

Roundtrip = the engine analog of the reference's compress->reload
byte-equality check (src/main.rs:209-241); the DF-vs-CSR PageRank
equality is the differential-implementation test style of
src/bitstreams/tests.rs:267-359.
"""

import numpy as np

from webgraph_spark.algos.pagerank import pagerank
from webgraph_spark.algos.pagerank_csr import pagerank_csr
from webgraph_spark.csr import (
    build_csr,
    csr_out_degrees,
    csr_successors,
    decode_csr,
)
from webgraph_spark.graph import out_degrees


def test_csr_roundtrip_exact(spark, small_graph):
    edges, n, src, dst = small_graph
    blocks = build_csr(edges, num_blocks=6)
    back = decode_csr(blocks)
    exp = sorted(zip(src.tolist(), dst.tolist()))
    got = sorted((r.src, r.dst) for r in back.collect())
    assert got == exp


def test_csr_block_invariants(spark, small_graph):
    edges, n, src, dst = small_graph
    rows = build_csr(edges, num_blocks=6).collect()
    assert len(rows) <= 6
    # disjoint, ordered ranges; indptr consistent with edge counts
    rows = sorted(rows, key=lambda r: r.node_lo)
    for a, b in zip(rows, rows[1:]):
        assert a.node_hi < b.node_lo
    for r in rows:
        assert r.indptr[0] == 0
        assert r.indptr[-1] == r.n_edges
        assert len(r.indptr) == r.n_nodes + 1
        assert r.bytes == len(r.indices)
    assert sum(r.n_edges for r in rows) == len(src)


def test_csr_compresses(spark, small_graph):
    edges, n, src, dst = small_graph
    rows = build_csr(edges, num_blocks=4).collect()
    raw_bytes = 8 * len(src)  # int64 dst per edge
    packed = sum(r.bytes for r in rows)
    assert packed < raw_bytes  # gap+varint beats raw int64


def test_csr_point_successors(spark, small_graph):
    edges, n, src, dst = small_graph
    blocks = build_csr(edges, num_blocks=6).persist()
    for node in (int(src[0]), int(src[len(src) // 2]), int(src[-1])):
        exp = sorted(int(d) for s, d in zip(src, dst) if s == node)
        got = sorted(r.dst for r in csr_successors(blocks, node).collect())
        assert got == exp
    blocks.unpersist()


def test_csr_out_degrees_match(spark, small_graph):
    edges, n, src, dst = small_graph
    blocks = build_csr(edges, num_blocks=6)
    a = {r.src: r.outdeg for r in csr_out_degrees(blocks).collect()}
    b = {r.src: r.outdeg for r in out_degrees(edges).collect()}
    assert a == b


def test_pagerank_csr_matches_dataframe(spark, small_graph):
    edges, n, src, dst = small_graph
    verts = spark.range(n).selectExpr("id as vertex_id")
    df_ranks, info1 = pagerank(edges, vertices=verts, tol=1e-8, max_iter=60)
    csr_ranks, info2 = pagerank_csr(edges, vertices=verts, tol=1e-8, max_iter=60,
                                    num_blocks=5)
    a = np.zeros(n)
    b = np.zeros(n)
    for r in df_ranks.collect():
        a[r.vertex_id] = r.rank
    for r in csr_ranks.collect():
        b[r.vertex_id] = r.rank
    np.testing.assert_allclose(a, b, atol=1e-12)
