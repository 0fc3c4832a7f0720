"""ASCII source/sink roundtrip (reference O1/O15) and CSR-kernel
triangle differential test (reference merge-scan analog)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from webgraph_spark.algos.triangles import triangle_counts
from webgraph_spark.algos.triangles_csr import triangle_total_csr
from webgraph_spark.ascii_graph import ascii_lines, read_ascii_graph, write_ascii_graph
from webgraph_spark.graph import suggest_salt_threshold


def test_ascii_roundtrip(spark, small_graph, tmp_path):
    edges, n, src, dst = small_graph
    path = str(tmp_path / "ascii")
    write_ascii_graph(edges, path)
    back = read_ascii_graph(spark, path)
    a = {(r.src, r.dst) for r in edges.collect()}
    b = {(r.src, r.dst) for r in back.collect()}
    assert a == b


def test_ascii_bare_lines_for_sinkless_nodes(spark, tmp_path):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(0,), (1,), (2,), (7,)], "vertex_id long")
    lines = {r.line for r in ascii_lines(edges, verts).collect()}
    assert "0\t1" in lines and "1\t2" in lines
    assert "2" in lines and "7" in lines  # successor-less nodes kept
    path = str(tmp_path / "ascii2")
    write_ascii_graph(edges, path, verts)
    back = read_ascii_graph(spark, path)
    assert {(r.src, r.dst) for r in back.collect() if r.dst is not None} == {
        (0, 1), (1, 2)
    }


def test_ascii_parse_matches_reference_format(spark, tmp_path):
    # exact reference layout: "node\tsucc\tsucc..." in node order
    # (ascii_graph/mod.rs:289-339)
    p = tmp_path / "g.txt"
    p.write_text("0\t1\t2\n1\t2\n2\n3\t0\n")
    back = read_ascii_graph(spark, str(p))
    got = {(r.src, r.dst) for r in back.collect()}
    assert got == {(0, 1), (0, 2), (1, 2), (3, 0)}


def test_triangles_csr_matches_dataframe(spark, small_graph):
    edges, n, src, dst = small_graph
    _, total_df = triangle_counts(edges)
    want = total_df.first()["n_triangles"]
    got = triangle_total_csr(edges).first()["n_triangles"]
    assert got == want


def test_triangles_csr_known_clique(spark):
    # K4 has exactly 4 triangles
    pairs = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    assert triangle_total_csr(edges).first()["n_triangles"] == 4


def test_suggest_salt_threshold(spark):
    # hub graph: vertex 0 has 5000 in-edges, everyone else <= 2
    rows = [(i, 0) for i in range(1, 5001)] + [(i, i + 1) for i in range(1, 200)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    thr = suggest_salt_threshold(edges, quantile=0.9999, floor=1000)
    assert thr is not None and thr >= 1000
    flat = spark.createDataFrame([(i, i + 1) for i in range(500)], "src long, dst long")
    assert suggest_salt_threshold(flat) is None
