"""Physical-plan audit: capture .explain('formatted') for key queries
and check the properties that matter at 100 TB:

  - parquet scans carry PushedFilters + pruned ReadSchema
  - small dimensions broadcast (BroadcastHashJoin)
  - aggregations are partial+final (HashAggregate x2)
  - the PageRank superstep has exactly ONE exchange (the contribution
    shuffle) and no Sort over the cached edge relation
  - hot expressions sit inside WholeStageCodegen spans

Writes PLANS.md with the evidence (grep-style excerpts + verdicts).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from webgraph_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name, plan, requirements, notes, out):
    verdicts = []
    for desc, pattern, want in requirements:
        hit = re.search(pattern, plan) is not None
        ok = hit == want
        verdicts.append((ok, desc, pattern, hit))
    out.append((name, plan, verdicts, notes))


def main():
    # AQE off to match the iterative-loop configuration (pagerank.py
    # disables it for the loop so checkpointed partitioning survives)
    spark = get_spark(
        master="local[8]", shuffle_partitions=8, app_name="plan-audit",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    import __spark_entry__ as entry

    out = []

    # 1. filter + projection pushdown to parquet
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_returnflag", "l_quantity")
    check(
        "scan pushdown (filter + column pruning)",
        plan_of(q),
        [
            ("filters pushed to scan", r"PushedFilters: \[.*LessThanOrEqual", True),
            ("only 3 columns read",
             r"ReadSchema: struct<(?:[^,>]+,){2}[^,>]+>", True),
        ],
        "A 2-column projection must not read all 16 lineitem columns.",
        out,
    )

    # 2. broadcast join for small dims
    q2 = entry.queries()["join_broadcast"](spark, SF)
    check(
        "broadcast join (orders x customer x nation)",
        plan_of(q2),
        [
            ("BroadcastHashJoin used", r"BroadcastHashJoin", True),
            ("no sort-merge join", r"SortMergeJoin", False),
        ],
        "Both dimension joins must broadcast; the fact side streams.",
        out,
    )

    # 3. partial aggregation
    q3 = entry.queries()["agg_pushdown"](spark, SF)
    check(
        "two-phase hash aggregation",
        plan_of(q3),
        [
            ("partial+final HashAggregate", r"HashAggregate", True),
            ("whole-stage codegen spans", r"codegen id", True),
        ],
        "groupBy must map-side combine before the shuffle.",
        out,
    )

    # 4. PageRank superstep plan: one exchange, no edge-side sort
    from bench import synth_edges

    edges = synth_edges(spark, 50_000, 500_000, 8)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition(8, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    ew.count()
    verts = edges.select(F.col("src").alias("vertex_id")).unionAll(
        edges.select(F.col("dst").alias("vertex_id"))
    ).dropDuplicates(["vertex_id"])
    ranks = verts.select("vertex_id", F.lit(0.1).alias("rank")) \
        .repartition(8, "vertex_id").localCheckpoint()

    def superstep(r):
        r_src = r.select(F.col("vertex_id").alias("src"), "rank").hint("SHUFFLE_HASH")
        contrib = (
            ew.join(r_src, "src")
            .groupBy("dst").agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
            .hint("SHUFFLE_HASH")
        )
        return r.join(contrib, r.vertex_id == contrib.dst, "left").select(
            "vertex_id",
            (F.lit(0.01) + 0.85 * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
        )

    # materialize one superstep so the plan below is loop steady state
    # (ranks = checkpointed RDD carrying hash(vertex_id) partitioning)
    s1 = superstep(ranks).localCheckpoint(eager=False)
    s1.agg(F.sum("rank")).collect()
    step = superstep(s1.select("vertex_id", "rank"))
    plan = plan_of(step)
    # executed exchanges = Exchange nodes in the tree that are NOT part
    # of a cached relation's display lineage (explain prints the
    # InMemoryRelation build plan, but it never re-executes)
    tree = plan.split("\n\n")[0].splitlines()

    def indent_of(line: str) -> int:
        m = re.search(r"(InMemoryRelation|Exchange|\w)", line)
        return m.start() if m else 0

    n_exchanges = 0
    cache_indent = None
    for line in tree:
        ind = indent_of(line)
        if cache_indent is not None and ind <= cache_indent:
            cache_indent = None
        if cache_indent is None and "InMemoryRelation" in line:
            cache_indent = ind
            continue
        if cache_indent is None and re.search(r"\bExchange\b", line):
            n_exchanges += 1
    out.append(
        (
            "pagerank superstep (exchange count)",
            plan,
            [
                (n_exchanges == 1,
                 f"exactly 1 executed exchange outside the cached edge "
                 f"relation (found {n_exchanges})"),
                (re.search(r"ShuffledHashJoin", plan) is not None,
                 "ShuffledHashJoin on both joins (no SMJ sorts)"),
                (re.search(r"^\s*:?[+\-* ]*Exchange[^\n]*\n\s*:?[+\-* ]*\+- \* Scan ExistingRDD",
                           plan, re.M) is None,
                 "checkpointed ranks RDD keeps its hash partitioning "
                 "(no exchange above Scan ExistingRDD)"),
            ],
            "The only data movement per superstep is the contribution "
            "shuffle; both joins reuse existing hash partitioning.",
        )
    )

    # 5. connected-components round: 3 exchanges, zero joins, no SMJ
    from webgraph_spark.algos.components import _large_star, _small_star

    e0 = (
        edges.filter("src != dst").select("src", "dst")
        .repartition(8, "src").dropDuplicates(["src", "dst"]).localCheckpoint()
    )
    cc_round = _small_star(_large_star(e0), 8)
    cc_plan = plan_of(cc_round)
    # formatted explain: tree shows "+- Exchange (n)", details show
    # "(n) Exchange" with the hashpartitioning arguments
    cc_exchanges = len(re.findall(r"^\(\d+\) Exchange", cc_plan, re.M))
    out.append(
        (
            "connected-components round (small-star ∘ large-star)",
            cc_plan,
            [
                (cc_exchanges == 3,
                 f"exactly 3 hash exchanges per round (found {cc_exchanges})"),
                (re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
                           cc_plan) is None,
                 "zero joins — per-node minima via window over src"),
                (re.search(r"\bWindow\b", cc_plan) is not None,
                 "window computes the per-src min in one pass"),
            ],
            "Each star = one window exchange; the round-final distinct "
            "rides the repartition(src) exchange (HashPartitioning(src) "
            "already clusters (src,dst)).",
        )
    )

    # 6. embedding near-dup contract query: the LSH path, never O(n^2)
    plan6 = plan_of(entry.all_queries()["embedding_neardup_pairs"](spark, SF))
    check(
        "embedding_neardup_pairs (banded-LSH contract path)",
        plan6,
        [
            ("no BroadcastNestedLoopJoin", r"BroadcastNestedLoopJoin", False),
            ("no CartesianProduct", r"CartesianProduct", False),
        ],
        "VERDICT r02 #3: the contract query must run the scale-safe "
        "banded-LSH candidate join + exact verify, not the all-pairs "
        "BNLJ (which remains a pytest verifier only).",
        out,
    )

    # 7. ann_lsh_topk: one-pass banded signatures -> bounded corpus scans
    plan7 = plan_of(entry.all_queries()["ann_lsh_topk"](spark, SF))
    n_emb_scans = len(re.findall(r"embeddings\.parquet", plan7))
    out.append(
        (
            "ann_lsh_topk (one-pass banded signatures)",
            plan7,
            [
                (n_emb_scans <= 4,
                 f"embeddings scanned <= 4 times: banded corpus + "
                 f"banded queries + re-rank both sides (found {n_emb_scans}; "
                 f"round-2 looped n_tables=8 signature scans)"),
                (re.search(r"BroadcastNestedLoopJoin|CartesianProduct",
                           plan7) is None,
                 "candidate generation is an equi-join on (band, chunk)"),
            ],
            "VERDICT r02 #4: all n_tables plane matrices are concatenated "
            "into one matmul kernel — one corpus scan produces every "
            "(band, chunk) row.",
        )
    )

    # 8. HyperBall merge round: one exchange, co-partitioned SHUFFLE_HASH
    from webgraph_spark.algos.hyperball import _init_registers

    e8 = edges.filter("src != dst").select("src", "dst")
    sym8 = e8.unionAll(
        e8.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    verts8 = (
        e8.select(F.col("src").alias("v"))
        .unionAll(e8.select(F.col("dst").alias("v")))
        .dropDuplicates(["v"])
    )
    arcs8 = sym8.unionAll(
        verts8.select(F.col("v").alias("src"), F.col("v").alias("dst"))
    ).repartition(8, "src").persist()
    arcs8.count()
    st8 = _init_registers(verts8, 16).repartition(8, "v").localCheckpoint()
    round8 = (
        arcs8.join(st8.withColumnRenamed("v", "src").hint("SHUFFLE_HASH"), "src")
        .select(F.col("dst").alias("v"), "reg", "rho")
        .repartition(8, "v")
        .groupBy("v", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    plan8 = plan_of(round8)
    tree8 = plan8.split("\n\n")[0].splitlines()
    n_ex8 = 0
    cache_indent = None
    for line in tree8:
        ind = indent_of(line)
        if cache_indent is not None and ind <= cache_indent:
            cache_indent = None
        if cache_indent is None and "InMemoryRelation" in line:
            cache_indent = ind
            continue
        if cache_indent is None and re.search(r"\bExchange\b", line):
            n_ex8 += 1
    out.append(
        (
            "hyperball merge round (register max-union)",
            plan8,
            [
                (n_ex8 == 1,
                 f"exactly 1 executed exchange outside the cached arc "
                 f"relation (found {n_ex8}) — the groupBy(v, reg) reuses "
                 f"the hash(v) repartition (Hash(v) satisfies "
                 f"ClusteredDistribution(v, reg))"),
                (re.search(r"ShuffledHashJoin", plan8) is not None,
                 "state join is ShuffledHashJoin (checkpointed hash(v) "
                 "partitioning, no sorts)"),
                (re.search(r"SortMergeJoin", plan8) is None,
                 "no sort-merge join in the loop"),
                (re.search(r"partial_max|HashAggregate", plan8) is not None,
                 "max-merge map-side combines before the exchange"),
            ],
            "Per HyperBall round the only data movement is the register "
            "message shuffle; hub fan-in is capped by partial aggregation.",
        )
    )

    # 9. degree-order permute: equi-joins only, never a cross product
    plan9 = plan_of(entry.queries()["degree_order_edges"](spark, SF))
    check(
        "degree_order_edges (permutation joins)",
        plan9,
        [
            ("no BroadcastNestedLoopJoin", r"BroadcastNestedLoopJoin", False),
            ("no CartesianProduct", r"CartesianProduct", False),
            ("no global single-partition sort (SinglePartition)",
             r"Exchange SinglePartition", False),
        ],
        "Renumbering at 10^9 vertices must stay an equi-join pipeline; "
        "the rank itself comes from range-partitioned dense_ids, never "
        "a one-reducer row_number window.",
        out,
    )

    # 10. per-user sessionization: the window parallelizes across keys
    plan10 = plan_of(entry.queries()["user_sessions"](spark, SF))
    check(
        "user_sessions (keyed gap sessionization)",
        plan10,
        [
            ("window partitioned by the session key (no single-partition "
             "global window)", r"Exchange SinglePartition", False),
            ("session fold is a hash aggregation", r"HashAggregate|ObjectHashAggregate|SortAggregate", True),
        ],
        "Sessionization must scale with key cardinality: the lag/sum "
        "windows and the final fold all hash-partition on user_id.",
        out,
    )

    # render
    lines = ["# PLANS — physical-plan audit (scripts/audit_plans.py)\n"]
    lines.append(
        "Evidence that the engine's plans have the shape required at "
        "100 TB: pushdown, broadcast, partial agg, minimal exchanges.\n"
    )
    for item in out:
        name, plan, verdicts, notes = item[0], item[1], item[2], item[3]
        lines.append(f"## {name}\n")
        if notes:
            lines.append(notes + "\n")
        for v in verdicts:
            ok, desc = (v[0], v[1]) if len(v) == 2 else (v[0], v[1])
            lines.append(f"- {'PASS' if ok else 'FAIL'}: {desc}")
        excerpt = "\n".join(
            l for l in plan.splitlines()
            if re.search(
                r"Exchange|Join|HashAggregate|PushedFilters|ReadSchema|Sort |WholeStageCodegen",
                l,
            )
        )
        lines.append("\n```\n" + excerpt[:3000] + "\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
