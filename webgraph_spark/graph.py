"""Graph construction: deterministic dense vertex ids, edge table, degrees.

The reference assumes dense contiguous node ids 0..n-1
(/root/reference/src/ascii_graph/mod.rs:314 indexes offsets[node]
directly). We reproduce that with a deterministic, shuffle-scalable
dictionary encoding: global rank of the sorted key — computed WITHOUT a
single-partition window (range-partition, rank within partition, add
broadcast per-partition offsets). The result is identical at any
parallelism level, which the engine's reproducibility tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webgraph_spark.ingest import derive_edges


def dense_ids(
    keys: DataFrame, key_cols: list[str], id_col: str = "vertex_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign dense ids 0..n-1 = global rank of the (distinct) sorted key.

    Scale notes: avoids monotonically_increasing_id (non-dense) and a
    global-orderBy row_number (single reducer). The per-partition window
    only shuffles by partition id; the offset table is tiny (one row per
    partition) and broadcast.
    """
    distinct = keys.select(*key_cols).dropDuplicates(key_cols)
    p = num_partitions or int(
        distinct.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parted = (
        distinct.repartitionByRange(p, *[F.col(c) for c in key_cols])
        .withColumn("_pid", F.spark_partition_id())
        # materialize once: `parted` is consumed by BOTH the offsets
        # collect and the returned plan, and repartitionByRange adds a
        # sampling pass — without this the whole upstream derivation
        # executes three times (Spark re-runs non-materialized subplans
        # per reference)
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("_pid").count().collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    off_df = parted.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in key_cols])
    return (
        parted.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "_pid")
        .select(*key_cols, (F.col("_rn") + F.col("_off")).alias(id_col))
    )


def build_graph(sources: DataFrame) -> tuple[DataFrame, DataFrame]:
    """sources -> (vertices(vertex_id, repo, path), edges(src, dst)).

    Edge direction: importer -> imported (a link graph over files, the
    analog of the reference's ImmutableGraph adjacency,
    src/lib.rs:8-16). Vertices cover every file, including isolated ones.
    """
    raw = derive_edges(sources)
    vertices = dense_ids(
        sources.select("repo", "path").dropDuplicates(["repo", "path"]),
        ["repo", "path"],
    )
    src_v = vertices.select(
        F.col("repo").alias("src_repo"), F.col("path").alias("src_path"),
        F.col("vertex_id").alias("src"),
    )
    dst_v = vertices.select(
        F.col("repo").alias("dst_repo"), F.col("path").alias("dst_path"),
        F.col("vertex_id").alias("dst"),
    )
    edges = (
        raw.join(src_v, ["src_repo", "src_path"])
        .join(dst_v, ["dst_repo", "dst_path"])
        .select("src", "dst")
    )
    return vertices, edges


def out_degrees(edges: DataFrame) -> DataFrame:
    """(src, outdeg) — the reference's outdegree() O5, as one partial agg."""
    return edges.groupBy("src").agg(F.count("*").alias("outdeg"))


def suggest_salt_threshold(
    edges: DataFrame, quantile: float = 0.9999, floor: int = 1000
) -> int | None:
    """Two-pass stats (the Zuckerli collect-then-encode pattern,
    /root/reference/src/webgraph/zuckerli_out.rs:1165-1237, repurposed
    for skew detection): one in-degree histogram pass picks the hub
    threshold for salted aggregation. Returns None when the extreme
    in-degree quantile stays below `floor` (no salting worth the extra
    shuffle stage)."""
    q = edges.groupBy("dst").agg(F.count("*").alias("indeg")).approxQuantile(
        "indeg", [quantile], 0.001
    )
    thr = int(q[0]) if q else 0
    return thr if thr >= floor else None


def successors(edges: DataFrame, node: int) -> DataFrame:
    """Point successor query (reference O6, bvgraph.rs:143-146).

    At scale this is served by partition/file pruning on a src-sorted
    edge table — the filter pushes to the parquet scan.
    """
    return edges.filter(F.col("src") == node).select("dst").orderBy("dst")


# ---------------------------------------------------------------------------
# deterministic graph over the driver's TPC-H-ish testdata (oracle-checkable)
# ---------------------------------------------------------------------------

# Same derivation in Spark and ANSI SQL so every downstream graph query
# can be oracle-checked by DuckDB on the driver's parquet views.
TESTDATA_GRAPH_SQL = """
SELECT DISTINCT src, dst FROM (
  SELECT l_partkey % 997 AS src, l_suppkey % 997 AS dst FROM lineitem
  UNION ALL
  SELECT o_custkey % 997 AS src, o_orderkey % 997 AS dst FROM orders
) t WHERE src <> dst
"""


def testdata_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges(src,dst) derived deterministically from lineitem+orders."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    e1 = li.select(
        (F.col("l_partkey") % 997).alias("src"), (F.col("l_suppkey") % 997).alias("dst")
    )
    e2 = od.select(
        (F.col("o_custkey") % 997).alias("src"), (F.col("o_orderkey") % 997).alias("dst")
    )
    return (
        e1.unionAll(e2)
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
