"""ASCII adjacency-list source/sink — the reference's native text format.

The reference's primary input is a tab-separated adjacency file
(`node\tsucc\tsucc...`, one line per node in id order), parsed by
`AsciiGraphBuilder::load_ascii` (/root/reference/src/ascii_graph/
mod.rs:289-339) into CSR; `decompress_to_ascii` is the inverse sink
(/root/reference/src/bin/decompress_to_ascii.rs:15-60).

Spark-first equivalents:
  read : spark.read.text -> split -> posexplode, all JVM-side; scales
         as a normal distributed text scan (no driver parsing).
  write: adjacency aggregation (groupBy src, sort_array(collect_list))
         -> concat_ws -> text sink.

Nodes with no successors appear as a bare `node` line, matching the
reference (a line holds at least the node id; successors optional).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ascii_graph(spark: SparkSession, path: str) -> DataFrame:
    """Parse `node\\tsucc...` lines -> edges(src, dst). Distributed.

    Analog of load_ascii (ascii_graph/mod.rs:289-339); unlike the
    reference we do not require lines in node order — ids are explicit
    per line, so the scan parallelizes with no sequential dependency.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.element_at(parts, 1).cast("long").alias("src"),
            F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))).alias("succs"),
        )
        .select("src", F.explode_outer("succs").alias("dst_s"))
        .filter(F.col("dst_s").isNotNull() & (F.col("dst_s") != ""))
        .select("src", F.col("dst_s").cast("long").alias("dst"))
    )


def ascii_lines(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """edges -> (src, line) rows in the reference's text layout.

    vertices (optional) adds bare lines for successor-less nodes so a
    roundtrip preserves the vertex set, like the reference's offsets
    cover every node id.
    """
    adj = edges.groupBy("src").agg(
        F.concat_ws(
            "\t",
            F.transform(
                F.sort_array(F.collect_list("dst")), lambda x: x.cast("string")
            ),
        ).alias("succs")
    )
    lines = adj.select(
        "src", F.concat_ws("\t", F.col("src").cast("string"), F.col("succs")).alias("line")
    )
    if vertices is not None:
        bare = (
            vertices.select(F.col("vertex_id").alias("src"))
            .join(adj.select("src"), "src", "left_anti")
            .select("src", F.col("src").cast("string").alias("line"))
        )
        lines = lines.unionAll(bare)
    return lines


def write_ascii_graph(
    edges: DataFrame, path: str, vertices: DataFrame | None = None
) -> None:
    """Sink edges as sorted ASCII adjacency text (decompress_to_ascii
    analog). Output is partitioned text; a single totally-ordered file
    would serialize through one task, which the reference tolerates
    (single-threaded) but a cluster engine should not."""
    ascii_lines(edges, vertices).orderBy("src").select("line").write.mode(
        "overwrite"
    ).text(path)
