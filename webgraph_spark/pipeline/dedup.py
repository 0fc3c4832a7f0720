"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes:
  - exact: one hash-groupBy on sha2(text) — partial agg, single shuffle.
  - n-gram Jaccard: shingle-explode + shingle self-join; exact but
    O(sum of pair co-occurrences) — the verifier for candidate pairs.
  - MinHash+LSH: signatures and band buckets computed entirely with
    JVM-side xxhash64/groupBy (no Python); candidates = band-bucket
    self-join; candidates are then verified with exact Jaccard. This is
    the 100 TB path: cost is linear in corpus + bucket collisions.
  - SimHash: 64-bit signature from token hashes via one Arrow kernel;
    near-dup candidates via 16-bit band buckets (Hamming <= 3 over 4
    bands catches all pairs with <= 3 differing bits).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(text_sha, n_docs, min_doc_id) per distinct content."""
    return (
        docs.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep one representative (min doc_id) per distinct text."""
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, lowercased."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        docs.select("doc_id", F.explode(grams).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .dropDuplicates(["doc_id", "shingle"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 5, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded
    to 6dp, filtered to >= threshold.
    """
    sh = _shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame, n: int = 5, num_hashes: int = 64
) -> DataFrame:
    """(doc_id, seed, minhash) — num_hashes independent min-hashes,
    all JVM-side: xxhash64(shingle, seed) then groupBy min."""
    sh = _shingles(docs, n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        sh.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "seed",
            F.xxhash64(F.col("shingle"), F.col("seed")).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) that share >= 1 LSH band bucket."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes)
    band_sig = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.xxhash64(F.sort_array(F.collect_list("minhash"))).alias("bucket"))
    )
    l = band_sig.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    r = band_sig.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard >= threshold.

    Verification is restricted to candidate docs (semi-join pushdown),
    so the exact pass costs O(candidate pairs), not O(corpus^2) — the
    property that keeps this runnable at 100 TB.
    """
    cand = minhash_lsh_candidates(docs, n, num_hashes, bands).persist()
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionAll(cand.select(F.col("doc_b").alias("doc_id")))
        .dropDuplicates(["doc_id"])
    )
    exact = ngram_jaccard_pairs(
        docs.join(cand_docs, "doc_id", "left_semi"), n, threshold=0.0
    )
    out = (
        cand.join(exact, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def near_dedup_clusters(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Transitive near-dup clustering: MinHash+LSH candidate pairs,
    exact-Jaccard verified, closed under transitivity with the engine's
    own connected-components operator (small-star/large-star — the
    same kernel that serves the link graph). Returns
    (doc_id, cluster_id, is_representative) where cluster_id = min
    doc_id of the cluster and the representative is that minimum.

    This is the full 100 TB dedup shape: candidates linear in corpus,
    verification linear in candidate pairs, clustering O(log n) rounds.
    """
    from webgraph_spark.algos.components import connected_components

    pairs = minhash_dedup_pairs(docs, threshold=threshold)
    comps, _ = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    clustered = comps.select(
        F.col("vertex_id").alias("doc_id"), F.col("component_id").alias("cluster_id")
    )
    singletons = (
        docs.select("doc_id")
        .join(clustered.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    return clustered.unionAll(singletons).select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
    )


def embedding_neardup_exact(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (doc_a < doc_b, cos >= t).

    All-pairs cosine via a self-join — the exact baseline/verifier.
    All arithmetic JVM-side (zip_with/aggregate). At corpus scale the
    LSH variant below supplies candidates and this exact predicate
    runs only on them.
    """
    from webgraph_spark.pipeline.similarity import _dot_col, _norm_col

    a = emb.select(
        F.col("vec_id").alias("doc_a"),
        F.col("embedding").alias("va"),
        _norm_col(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("doc_b"),
        F.col("embedding").alias("vb"),
        _norm_col(F.col("embedding")).alias("nb"),
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (_dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "_cs"
            ),
        )
        .filter(F.col("_cs") >= threshold)
        .select("doc_a", "doc_b", F.round("_cs", 6).alias("cos_sim"))
    )


def embedding_neardup_lsh(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets supply candidate pairs
    (union over n_tables), then the exact cosine predicate verifies.
    Cost is linear in corpus + bucket collisions, never O(n^2)."""
    from webgraph_spark.pipeline.similarity import _dot_col, _norm_col, lsh_signatures

    cand = None
    for t in range(n_tables):
        sig = lsh_signatures(emb, dim, n_planes, seed + t)
        l = sig.select(F.col("vec_id").alias("doc_a"), "sig")
        r = sig.select(F.col("vec_id").alias("doc_b"), "sig")
        part = l.join(r, "sig").filter(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b"
        )
        cand = part if cand is None else cand.unionAll(part)
    cand = cand.dropDuplicates(["doc_a", "doc_b"])
    a = emb.select(
        F.col("vec_id").alias("doc_a"),
        F.col("embedding").alias("va"),
        _norm_col(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("doc_b"),
        F.col("embedding").alias("vb"),
        _norm_col(F.col("embedding")).alias("nb"),
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (_dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "_cs"
            ),
        )
        .filter(F.col("_cs") >= threshold)
        .select("doc_a", "doc_b", F.round("_cs", 6).alias("cos_sim"))
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over whitespace tokens.

    One vectorized Arrow kernel: per doc, sum +-1 per bit over
    deterministic 64-bit token hashes, sign -> bit.
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf["text"].astype(str)):
                toks = text.lower().split()
                if not toks:
                    continue
                hs = np.array(
                    [
                        int.from_bytes(
                            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                        )
                        for t in toks
                    ],
                    dtype=np.uint64,
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
                votes = bits.astype(np.int64) * 2 - 1
                sig = (votes.sum(axis=0) > 0).astype(np.uint64)
                out[i] = int((sig << np.arange(64, dtype=np.uint64)).sum()) - (1 << 63)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id long, simhash long"
    )


def simhash_candidates(docs: DataFrame) -> DataFrame:
    """Near-dup candidates: equal 16-bit band of the SimHash (4 bands —
    catches every pair within Hamming distance 3)."""
    sig = simhash_signatures(docs)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "bc.band", "bc.chunk")
    l = banded.select(F.col("doc_id").alias("doc_a"), "band", "chunk")
    r = banded.select(F.col("doc_id").alias("doc_b"), "band", "chunk")
    return (
        l.join(r, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
