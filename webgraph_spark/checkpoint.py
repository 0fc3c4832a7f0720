"""Iteration checkpointing with per-partition lineage + metrics, and resume.

North-rule requirement: every superstep checkpointed so runs resume from
the last completed iteration, carrying per-partition lineage and
iteration metrics. Implemented over a directory of parquet tables (the
Iceberg path is the same API — `df.writeTo(tbl)` — behind a catalog;
this sandbox has no Iceberg jars, so the parquet layout stands in, one
directory per (algo, iteration) = one atomic snapshot).

Checkpoints double as lineage truncation for iterative DataFrame plans
(without them Catalyst plans grow per iteration and planning time blows
up — the driver loop is the only reference-style 'engine' code we own,
SURVEY.md §3.4).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, base_dir: str, run_id: str = "run0"):
        # snapshot DATA goes through Spark writers, but latest()/resume
        # and metrics.jsonl use driver-local filesystem calls — a URI
        # scheme (hdfs://, s3a://) would silently break resume, so
        # reject it loudly. The dir must be a filesystem mounted on the
        # driver AND reachable by executors (NFS etc.); routing the
        # bookkeeping through the Hadoop FileSystem API is the lift
        # needed for object stores.
        if "://" in base_dir:
            raise ValueError(
                "CheckpointManager requires a driver-mounted filesystem "
                f"path; URI schemes are not supported: {base_dir!r}"
            )
        self.base_dir = base_dir
        self.run_id = run_id
        os.makedirs(base_dir, exist_ok=True)

    def _iter_dir(self, algo: str, iteration: int) -> str:
        return os.path.join(self.base_dir, algo, f"iter={iteration:05d}")

    def save(self, algo: str, iteration: int, df: DataFrame, **metrics) -> DataFrame:
        """Write one superstep snapshot; return the reloaded (lineage-free)
        DataFrame. Also records per-partition lineage rows."""
        spark = df.sparkSession
        path = self._iter_dir(algo, iteration)
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        reloaded = spark.read.parquet(path)
        wall_ms = (time.time() - t0) * 1000.0
        part_rows = [
            {"partition_id": int(r["_pid"]), "rows": int(r["rows"])}
            for r in reloaded.groupBy(F.spark_partition_id().alias("_pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        ]
        rec = {
            "run_id": self.run_id,
            "algo": algo,
            "iteration": iteration,
            "wall_ms": wall_ms,
            "rows": sum(p["rows"] for p in part_rows),
            "partitions": part_rows,
            **metrics,
        }
        with open(os.path.join(self.base_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        return reloaded

    def latest(self, algo: str) -> tuple[int, str] | None:
        """(iteration, path) of the newest completed snapshot, or None."""
        d = os.path.join(self.base_dir, algo)
        if not os.path.isdir(d):
            return None
        iters = sorted(
            int(name.split("=")[1])
            for name in os.listdir(d)
            if name.startswith("iter=")
            and os.path.exists(os.path.join(d, name, "_SUCCESS"))
        )
        if not iters:
            return None
        k = iters[-1]
        return k, self._iter_dir(algo, k)

    def load(self, spark: SparkSession, algo: str, iteration: int) -> DataFrame:
        return spark.read.parquet(self._iter_dir(algo, iteration))

    def metrics(self) -> list[dict]:
        p = os.path.join(self.base_dir, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    def truncate_after(self, algo: str, iteration: int) -> None:
        """Drop snapshots with iter > iteration (used by resume tests)."""
        d = os.path.join(self.base_dir, algo)
        if not os.path.isdir(d):
            return
        for name in os.listdir(d):
            if name.startswith("iter=") and int(name.split("=")[1]) > iteration:
                shutil.rmtree(os.path.join(d, name))
