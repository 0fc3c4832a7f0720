"""Similarity search over an embedding column (array<float>).

  - brute_force_topk: exact cosine top-k, all JVM-side (zip_with +
    aggregate for the dot product, window top-k per query). The
    baseline and the verifier.
  - lsh_topk: random-hyperplane LSH — signatures from one vectorized
    numpy matmul kernel (Arrow-batched), candidates bucketed by
    signature band, exact cosine re-rank inside buckets. The scale
    path: cost linear in corpus + bucket sizes. An IVF variant would
    swap the bucketer for nearest-centroid assignment; the bucket-join
    + re-rank skeleton is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(vec):
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _dot_col(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k.

    emb:     (vec_id, embedding array<float>)
    queries: (query_id, q_embedding array<float>) — small side, broadcast.
    Returns (query_id, rank, neighbor_id, cos_sim) with rank 1..k,
    self-matches excluded, ties broken by neighbor_id.
    """
    e = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("e_vec"),
        _norm_col(F.col("embedding")).alias("e_norm"),
    )
    q = queries.select(
        "query_id", F.col("q_embedding").alias("q_vec"),
        _norm_col(F.col("q_embedding")).alias("q_norm"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_col(F.col("q_vec"), F.col("e_vec"))
                / (F.col("q_norm") * F.col("e_norm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def lsh_signatures(
    emb: DataFrame, dim: int, n_planes: int = 16, seed: int = 7
) -> DataFrame:
    """(vec_id, sig) — sign pattern of n_planes random projections,
    packed into one long. One matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (m @ planes) > 0
            weights = (1 << np.arange(n_planes)).astype(np.int64)
            sig = (bits * weights).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "sig": sig})

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, sig long"
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k: union of n_tables LSH bucket probes,
    exact cosine re-rank over the candidate set."""
    cand_parts = []
    for t in range(n_tables):
        s_emb = lsh_signatures(emb, dim, n_planes, seed + t)
        s_q = lsh_signatures(
            queries.select(
                F.col("query_id").alias("vec_id"),
                F.col("q_embedding").alias("embedding"),
            ),
            dim,
            n_planes,
            seed + t,
        ).select(F.col("vec_id").alias("query_id"), F.col("sig"))
        cand_parts.append(
            s_emb.join(F.broadcast(s_q), "sig").select("query_id", "vec_id")
        )
    cands = cand_parts[0]
    for c in cand_parts[1:]:
        cands = cands.unionAll(c)
    cands = cands.filter(F.col("query_id") != F.col("vec_id")).dropDuplicates(
        ["query_id", "vec_id"]
    )
    e = emb.select("vec_id", F.col("embedding").alias("e_vec"),
                   _norm_col(F.col("embedding")).alias("e_norm"))
    q = queries.select("query_id", F.col("q_embedding").alias("q_vec"),
                       _norm_col(F.col("q_embedding")).alias("q_norm"))
    scored = (
        cands.join(e, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot_col(F.col("q_vec"), F.col("e_vec"))
                / (F.col("q_norm") * F.col("e_norm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
    )
