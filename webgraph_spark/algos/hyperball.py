"""HyperBall: approximate neighborhood function + harmonic centrality.

The reference engine's lineage (WebGraph) exists largely to feed this
algorithm — Boldi–Vigna's HyperBall ("In-core computation of geometric
centralities with HyperBall", 2013) runs HyperLogLog counter unions
along the arcs of a compressed graph to estimate, for every vertex v,
the ball size |B(v, t)| = #vertices within distance <= t, and from the
per-round deltas the harmonic centrality sum_{u != v} 1/d(v, u). The
caba5/WebGraph reference provides the storage/access layer only; this
module supplies the analytic on top, Spark-first.

Design — exactly oracle-checkable approximation:
  The sketch is DETERMINISTIC cross-engine. Register index and rank
  derive from the md5 hashing module (pipeline/hashing.py) that the
  MinHash family already shares with DuckDB:
    h1, h2 = 60-bit ints from md5(vertex id) hex chars [1,15], [16,30]
    register j = h1 % m
    rank rho  = (#trailing zeros of h2) + 1  — geometric(1/2), computed
                as bit_count((h2 & -h2) - 1) + 1: pure int64 arithmetic
                that is bit-identical in Spark and DuckDB (no log2 /
                leading-zero floating hazard).
  A superstep is an idempotent max-merge, so the whole t-round run is
  reproducible at any parallelism and the driver's DuckDB gate can
  replay it as t unrolled CTE rounds and match value hashes exactly
  (estimates rounded to 4dp; the 2^-rho sums are exact in binary64 for
  any realistic rank range, so both engines compute identical sums).

Scale design (the 100 TB shape):
  State is the EXPLODED register relation (v, reg, rho) — at most m
  rows per vertex — the HADI/distributed-HyperBall layout: the merge
  becomes a plain co-partitioned join + hash aggregation, all JVM, and
  partial aggregation (map-side combine) caps shuffle volume per round
  at |distinct (dst, reg) per map partition| regardless of fan-in, the
  same property that makes the PageRank contribution shuffle safe under
  hub skew. Self-retention is folded into the arc set as identity arcs
  so the state relation is referenced ONCE per round (Spark re-executes
  non-materialized subplans referenced twice — components.py lesson).
  Per round: ONE co-partitioned SHUFFLE_HASH join + ONE hash exchange
  on v (the groupBy(v, reg) reuses the hash(v) repartition: Hash(v)
  satisfies ClusteredDistribution(v, reg)). AQE stays off inside the
  loop (checkpointed-partitioning rationale, pagerank.py) and is
  restored in finally. m and t are knobs: shuffle bytes scale as
  m x |E| per round, error as 1.04/sqrt(m).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webgraph_spark.pipeline.hashing import md5_long, sql_md5_long

# Flajolet et al. bias-correction constants
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    if m in _ALPHA:
        return _ALPHA[m]
    return 0.7213 / (1.0 + 1.079 / m)


def _init_registers(vertices: DataFrame, m: int) -> DataFrame:
    """(v, reg, rho): the singleton-{v} HLL sketch, one row per vertex."""
    vs = F.col("v").cast("string")
    hashed = vertices.select(
        "v",
        md5_long(vs, 1, 15).alias("_h1"),
        md5_long(vs, 16, 15).alias("_h2"),
    )
    rho = F.when(F.col("_h2") == 0, F.lit(61)).otherwise(
        F.expr("bit_count((_h2 & -_h2) - 1) + 1")
    )
    return hashed.select(
        "v",
        (F.col("_h1") % m).cast("int").alias("reg"),
        rho.cast("int").alias("rho"),
    )


def _estimate_cols(m: int):
    """HLL estimate columns over a (v, reg, rho) group: n_regs, sum_rho
    (exact ints — the float-free sketch digest) and the bias-corrected
    estimate with small-range (linear-counting) correction.

    Cross-engine caveat (ADVICE r3): the linear-counting branch takes
    m*ln(m/V) in both engines, and ln is only ulp-accurate (Java
    Math.log vs DuckDB libm) — an estimate whose true value straddles a
    4dp rounding boundary could in principle flip the rounded digit and
    fail an oracle hash. The integer columns (sum_rho, n_regs) are the
    exact digest; the float estimates have matched bit-for-bit on every
    observed run but are best treated as tolerance-checked."""
    a = _alpha(m)
    n_regs = F.count("*")
    s = F.sum(F.pow(F.lit(2.0), -F.col("rho")))
    raw = F.lit(a * m * m) / ((F.lit(float(m)) - n_regs) + s)
    v_zero = F.lit(m) - n_regs
    est = F.when(
        (raw <= 2.5 * m) & (v_zero > 0), F.lit(float(m)) * F.log(m / v_zero)
    ).otherwise(raw)
    return n_regs, est


def hyperball(
    edges: DataFrame,
    t: int = 3,
    m: int = 16,
    directed: bool = False,
    ckpt=None,
    resume: bool = False,
) -> DataFrame:
    """Per-vertex neighborhood-function estimates after t merge rounds.

    Returns (vertex_id, nf_est, sum_rho, n_regs): nf_est ~ |B(v, t)|
    (4dp), sum_rho / n_regs the exact integer digest of the final
    sketch. directed=False (default) runs on the symmetrized graph;
    directed=True estimates out-reachability balls (counters flow
    AGAINST the arcs: B(v) absorbs B(w) for w in successors(v)).

    ckpt (CheckpointManager): durably snapshot each round's register
    state (north-rule checkpoint discipline); resume=True restarts the
    merge from the last completed round — the max-merge is idempotent,
    so a resumed run is bit-identical to an uninterrupted one.
    """
    # eager=False (no ckpt): only the final round is consumed, and every
    # intermediate state is referenced exactly once in its chain, so
    # the whole t-round merge runs as ONE job (lazy checkpoints still
    # truncate lineage for any later reuse)
    return _run(
        edges, t, m, directed, eager=ckpt is not None, ckpt=ckpt, resume=resume
    )[-1].drop("_est_raw")


def harmonic_centrality(
    edges: DataFrame,
    t: int = 3,
    m: int = 16,
    directed: bool = False,
) -> DataFrame:
    """(vertex_id, harm_est): HyperBall harmonic centrality — the
    telescoping sum over rounds k=1..t of (|B(k)| - |B(k-1)|)/k, each
    ball size taken from the round-k sketch (negative deltas clamp to
    0: estimates are monotone up to estimator noise)."""
    rounds = _run(edges, t, m, directed)
    per_round = None
    for k, df in enumerate(rounds):
        step = df.select(
            "vertex_id", F.lit(k).alias("k"), F.col("_est_raw").alias("est")
        )
        per_round = step if per_round is None else per_round.unionAll(step)
    w = Window.partitionBy("vertex_id").orderBy("k")
    deltas = per_round.withColumn("prev", F.lag("est").over(w)).filter(
        F.col("k") >= 1
    )
    return (
        deltas.groupBy("vertex_id")
        .agg(
            F.round(
                F.sum(
                    F.greatest(F.col("est") - F.col("prev"), F.lit(0.0))
                    / F.col("k")
                ),
                4,
            ).alias("harm_est")
        )
    )


def _run(
    edges: DataFrame,
    t: int,
    m: int,
    directed: bool,
    eager: bool = True,
    ckpt=None,
    resume: bool = False,
) -> list[DataFrame]:
    """The shared t-round merge loop; returns one estimate DataFrame per
    round 0..t (each carries `_est_raw` for harmonic's telescoping).

    eager=True materializes every round (required when MULTIPLE rounds'
    estimates will be consumed — harmonic — since a non-materialized
    state referenced by both its estimate and the next round would
    re-execute); eager=False defers everything to the caller's single
    action (hyperball's final-round-only path). With ckpt, every round's
    (v, reg, rho) state is a durable parquet snapshot (iter=k) with
    per-partition lineage metrics; resume reloads rounds 0..last and
    merges onward from there."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # AQE off only for the EAGER (multi-action) loop, where it would
    # re-plan checkpointed partitioning to Unknown between actions
    # (pagerank.py rationale). The lazy path compiles ONE plan — AQE
    # cannot break explicit repartition requirements there, and the
    # conf must not be flipped back before the caller's action anyway.
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true") if eager else None
    if eager:
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    e = edges.select("src", "dst")
    if not directed:
        arcs = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    else:
        # counters flow against the arcs: state(dst) -> v=src
        arcs = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .dropDuplicates(["v"])
    )
    # identity arcs fold self-retention into the join so state is
    # referenced exactly once per round
    arcs = arcs.unionAll(verts.select(F.col("v").alias("src"), F.col("v").alias("dst")))
    arcs = arcs.repartition(p, "src").persist()
    try:
        states: list[DataFrame] = []
        start = 0
        if ckpt is not None and resume:
            last = ckpt.latest("hyperball")
            if last is not None:
                # max-merge is idempotent: reloading round `start` and
                # merging onward is bit-identical to the full run
                start = min(last[0], t)
                states = [
                    ckpt.load(spark, "hyperball", k) for k in range(start + 1)
                ]
        if not states:
            st0 = _init_registers(verts, m).repartition(p, "v")
            st0 = (
                ckpt.save("hyperball", 0, st0, m=m, round=0)
                if ckpt is not None
                else st0.localCheckpoint(eager=eager)
            )
            states, start = [st0], 0
        state = states[-1]
        out = [_round_estimate(s, m) for s in states]
        for k in range(start, t):
            new_state = (
                arcs.join(
                    state.withColumnRenamed("v", "src").hint("SHUFFLE_HASH"),
                    "src",
                )
                .select(F.col("dst").alias("v"), "reg", "rho")
                .repartition(p, "v")
                .groupBy("v", "reg")
                .agg(F.max("rho").alias("rho"))
            )
            state = (
                ckpt.save("hyperball", k + 1, new_state, m=m, round=k + 1)
                if ckpt is not None
                else new_state.localCheckpoint(eager=eager)
            )
            out.append(_round_estimate(state, m))
        return out
    finally:
        if eager:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
            # eager mode materialized every round — the arc cache is
            # done. Lazy mode must LEAVE it cached: the caller's single
            # action references arcs t+1 times (computed once, reused
            # from cache within the job; freed by clearCache/GC).
            arcs.unpersist()


def _round_estimate(state: DataFrame, m: int) -> DataFrame:
    n_regs, est = _estimate_cols(m)
    return state.groupBy(F.col("v").alias("vertex_id")).agg(
        F.round(est, 4).alias("nf_est"),
        F.sum("rho").cast("long").alias("sum_rho"),
        n_regs.cast("long").alias("n_regs"),
        est.alias("_est_raw"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (unrolled CTE rounds over the same md5 registers)
# ---------------------------------------------------------------------------


def _sql_init(m: int) -> list[str]:
    h1 = sql_md5_long("CAST(v AS VARCHAR)", 1, 15)
    h2 = sql_md5_long("CAST(v AS VARCHAR)", 16, 15)
    return [
        "sym AS (SELECT src, dst FROM e UNION ALL"
        " SELECT dst AS src, src AS dst FROM e)",
        "verts AS (SELECT DISTINCT src AS v FROM sym)",
        "arcs AS (SELECT src, dst FROM sym UNION ALL"
        " SELECT v AS src, v AS dst FROM verts)",
        f"""st0 AS (
  SELECT v, CAST(({h1}) % {m} AS INT) AS reg,
         CAST(CASE WHEN ({h2}) = 0 THEN 61
              ELSE bit_count((({h2}) & -({h2})) - 1) + 1 END AS INT) AS rho
  FROM verts)""",
    ]


def _sql_round(k: int) -> str:
    return (
        f"st{k} AS (SELECT a.dst AS v, s.reg, max(s.rho) AS rho"
        f" FROM arcs a JOIN st{k - 1} s ON s.v = a.src GROUP BY 1, 2)"
    )


def _sql_est(k: int, m: int) -> str:
    a = _alpha(m)
    return f"""est{k} AS (
  SELECT v, count(*) AS n_regs, CAST(sum(rho) AS BIGINT) AS sum_rho,
         sum(power(2.0, -rho)) AS s
  FROM st{k} GROUP BY v
), fin{k} AS (
  SELECT v, n_regs, sum_rho,
         CASE WHEN ({a * m * m}) / (({m}.0 - n_regs) + s) <= {2.5 * m}
                   AND ({m} - n_regs) > 0
              THEN {m}.0 * ln({m}.0 / ({m} - n_regs))
              ELSE ({a * m * m}) / (({m}.0 - n_regs) + s) END AS est
  FROM est{k})"""


def hyperball_sql(t: int = 3, m: int = 16) -> str:
    """Oracle body (no leading WITH): joins onto a CTE `e(src, dst)`."""
    ctes = _sql_init(m)
    for k in range(1, t + 1):
        ctes.append(_sql_round(k))
    ctes.append(_sql_est(t, m))
    body = ",\n".join(ctes)
    return (
        f"{body}\n"
        f"SELECT v AS vertex_id, round(est, 4) AS nf_est, sum_rho,\n"
        f"       CAST(n_regs AS BIGINT) AS n_regs\nFROM fin{t}"
    )


def harmonic_sql(t: int = 3, m: int = 16) -> str:
    """Oracle body for harmonic_centrality: per-round estimates, clamped
    telescoping deltas."""
    ctes = _sql_init(m)
    ctes.append(_sql_est(0, m))
    for k in range(1, t + 1):
        ctes.append(_sql_round(k))
        ctes.append(_sql_est(k, m))
    deltas = " UNION ALL ".join(
        f"SELECT a.v, greatest(a.est - b.est, 0.0) / {k}.0 AS d"
        f" FROM fin{k} a JOIN fin{k - 1} b USING (v)"
        for k in range(1, t + 1)
    )
    body = ",\n".join(ctes)
    return (
        f"{body},\ndeltas AS ({deltas})\n"
        f"SELECT v AS vertex_id, round(sum(d), 4) AS harm_est"
        f" FROM deltas GROUP BY v"
    )


# ---------------------------------------------------------------------------
# distance distribution (the analytic HyperBall was built for)
# ---------------------------------------------------------------------------


def distance_distribution(
    edges: DataFrame, t: int = 3, m: int = 16, directed: bool = False
) -> DataFrame:
    """(round, nf_e4): the neighborhood function NF(k) = sum over v of
    |B(v, k)| for k = 0..t — the curve whose saturation point is the
    effective diameter and whose increments give the distance
    distribution (Boldi–Vigna's four-degrees-of-separation analytic).

    nf_e4 = sum of per-vertex estimates scaled by 1e4 and rounded to
    integers BEFORE summing: the cross-engine digest stays exact
    integer arithmetic (a float sum over all vertices would be
    order-dependent in its last ulp and could flip a rounded total).
    """
    rounds = _run(edges, t, m, directed, eager=True)
    out = None
    for k, df in enumerate(rounds):
        step = df.agg(
            F.sum(
                F.round(F.col("_est_raw") * 10000, 0).cast("long")
            ).alias("nf_e4")
        ).select(F.lit(k).cast("long").alias("round"), "nf_e4")
        out = step if out is None else out.unionAll(step)
    return out


def distance_distribution_sql(t: int = 3, m: int = 16) -> str:
    """Oracle body (no leading WITH): per-round integer-digest sums."""
    ctes = _sql_init(m)
    ctes.append(_sql_est(0, m))
    for k in range(1, t + 1):
        ctes.append(_sql_round(k))
        ctes.append(_sql_est(k, m))
    selects = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS round,"
        f" CAST(sum(CAST(round(est * 10000, 0) AS BIGINT)) AS BIGINT) AS nf_e4"
        f" FROM fin{k}"
        for k in range(t + 1)
    )
    body = ",\n".join(ctes)
    return f"{body}\n{selects}"


def effective_diameter_fixed(
    edges: DataFrame,
    t: int = 3,
    m: int = 16,
    alpha: float = 0.9,
    directed: bool = False,
) -> DataFrame:
    """Contract-friendly effective diameter at a FIXED horizon t:
    smallest interpolated x with NF(x) >= alpha * NF(t), derived from
    the same integer nf_e4 curve distance_distribution emits (ref
    WebGraph's HyperBall effective-diameter readout; the open-ended
    fixpoint variant is effective_diameter()).

    Returns one row (t_horizon, eff_diam_e4, nf_final_e4) — all BIGINT:
    eff_diam_e4 = floor(eff*1e4 + 0.5) so the cross-engine digest is
    exact integer arithmetic. The distributed work is the t-round
    sketch merge in distance_distribution; the interpolation is a
    scalar postprocess over t+1 collected integers (driver-sized by
    construction). The oracle (effective_diameter_fixed_sql) replays
    the identical interpolation over the identical unrolled-CTE curve.
    """
    dd = {int(r["round"]): int(r["nf_e4"]) for r in
          distance_distribution(edges, t=t, m=m, directed=directed).collect()}
    nf = [dd[k] for k in range(t + 1)]
    tgt = alpha * float(nf[t])
    k = next(i for i in range(t + 1) if nf[i] >= tgt)
    if k == 0:
        eff = 0.0
    else:
        # first crossing: nf[k-1] < tgt <= nf[k] so the denominator > 0
        eff = (k - 1) + (tgt - nf[k - 1]) / (nf[k] - nf[k - 1])
    eff_e4 = int(math.floor(eff * 10000 + 0.5))
    return edges.sparkSession.createDataFrame(
        [(t, eff_e4, nf[t])],
        schema="t_horizon bigint, eff_diam_e4 bigint, nf_final_e4 bigint",
    )


def effective_diameter_fixed_sql(
    t: int = 3, m: int = 16, alpha: float = 0.9
) -> str:
    """Oracle body (no leading WITH) for effective_diameter_fixed:
    the distance-distribution CTE chain wrapped as dd, then the same
    first-crossing linear interpolation in pure SQL."""
    ctes = _sql_init(m)
    ctes.append(_sql_est(0, m))
    for k in range(1, t + 1):
        ctes.append(_sql_round(k))
        ctes.append(_sql_est(k, m))
    selects = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS round,"
        f" CAST(sum(CAST(round(est * 10000, 0) AS BIGINT)) AS BIGINT) AS nf_e4"
        f" FROM fin{k}"
        for k in range(t + 1)
    )
    body = ",\n".join(ctes)
    return f"""{body},
dd AS ({selects}),
tgt AS (SELECT {alpha!r} * CAST((SELECT nf_e4 FROM dd WHERE round = {t}) AS DOUBLE) AS tv),
lagged AS (SELECT round, nf_e4, lag(nf_e4) OVER (ORDER BY round) AS prev_nf FROM dd),
crossing AS (
  SELECT l.round, l.nf_e4, l.prev_nf FROM lagged l, tgt
  WHERE l.nf_e4 >= tgt.tv ORDER BY l.round LIMIT 1
)
SELECT CAST({t} AS BIGINT) AS t_horizon,
       CAST(floor((CASE WHEN c.round = 0 THEN 0.0
            ELSE (c.round - 1) + (tgt.tv - c.prev_nf) / (c.nf_e4 - c.prev_nf)
            END) * 10000 + 0.5) AS BIGINT) AS eff_diam_e4,
       (SELECT nf_e4 FROM dd WHERE round = {t}) AS nf_final_e4
FROM crossing c, tgt"""


def effective_diameter(
    edges: DataFrame,
    alpha: float = 0.9,
    m: int = 64,
    max_t: int = 64,
    directed: bool = False,
) -> dict:
    """The HyperANF headline number: the interpolated smallest t at
    which NF(t) >= alpha * NF(inf) (Boldi-Rosa-Vigna's four-degrees
    methodology). Runs merge rounds until the global sketch digest
    reaches its fixpoint (every ball saturated its component), then
    interpolates linearly inside the crossing round.

    Returns {"effective_diameter", "rounds", "nf": [NF(0)..NF(T)]}.
    One extra scalar aggregation per round (rides the materialized
    round state); the fixpoint stop means diameter+1 rounds total.
    """
    spark = edges.sparkSession
    rounds_nf: list[float] = []
    prev_digest = None
    # reuse the eager loop one round at a time: resume-free manual loop
    # mirroring _run's merge step, with a per-round NF + digest action
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    e = edges.select("src", "dst")
    if not directed:
        arcs = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        arcs = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .dropDuplicates(["v"])
    )
    arcs = arcs.unionAll(
        verts.select(F.col("v").alias("src"), F.col("v").alias("dst"))
    ).repartition(p, "src").persist()
    try:
        state = _init_registers(verts, m).repartition(p, "v").localCheckpoint()
        for _ in range(max_t + 1):
            _, est = _estimate_cols(m)
            row = (
                state.groupBy("v").agg(est.alias("e"))
                .agg(
                    F.sum("e").alias("nf"),
                    F.expr("bit_xor(xxhash64(v))").alias("h"),
                ).collect()[0]
            )
            # digest: per-round global sketch fingerprint — when no
            # register changed, every ball is saturated (fixpoint)
            dig = state.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(v, reg, rho))").alias("h"),
            ).collect()[0]
            rounds_nf.append(float(row["nf"]))
            cur = (dig["n"], dig["h"])
            if cur == prev_digest:
                rounds_nf.pop()  # the repeat adds no information
                break
            prev_digest = cur
            state = (
                arcs.join(
                    state.withColumnRenamed("v", "src").hint("SHUFFLE_HASH"),
                    "src",
                )
                .select(F.col("dst").alias("v"), "reg", "rho")
                .repartition(p, "v")
                .groupBy("v", "reg")
                .agg(F.max("rho").alias("rho"))
                .localCheckpoint()
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        arcs.unpersist()

    target = alpha * rounds_nf[-1]
    eff = float(len(rounds_nf) - 1)
    for t in range(len(rounds_nf)):
        if rounds_nf[t] >= target:
            if t == 0:
                eff = 0.0
            else:
                lo, hi = rounds_nf[t - 1], rounds_nf[t]
                eff = (t - 1) + (target - lo) / (hi - lo) if hi > lo else float(t)
            break
    return {
        "effective_diameter": round(eff, 4),
        "rounds": len(rounds_nf) - 1,
        "nf": [round(x, 2) for x in rounds_nf],
    }
