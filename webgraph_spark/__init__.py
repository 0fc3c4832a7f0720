"""webgraph_spark — a from-scratch PySpark-native link-graph analytics engine.

Capability target: everything caba5/WebGraph (Rust WebGraph + Zuckerli,
see /root/reference) provides — compressed adjacency storage with
random-access successor queries — re-expressed Spark-first, plus the
iterative link-graph algorithms the WebGraph ecosystem serves
(PageRank, connected components, label propagation, triangle counting)
and large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design (see SURVEY.md):
- DataFrame/SQL-first; Catalyst plans everything relational.
- Adjacency stored as per-partition CSR blocks with WebGraph-style
  gap + zig-zag + varint compaction inside Arrow binary buffers
  (reference analog: src/webgraph/bvgraph.rs:1248-1260), built and
  decoded with vectorized numpy inside mapInArrow — zero per-row Python.
- Iterative algorithms are batch supersteps (1-2 shuffles each) with
  parquet/Iceberg checkpoints for lineage truncation + resume.
"""

__version__ = "0.1.0"

from webgraph_spark.session import get_spark  # noqa: F401
