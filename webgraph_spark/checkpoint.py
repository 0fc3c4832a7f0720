"""Iteration checkpointing with per-partition lineage + metrics, and resume.

North-rule requirement: every superstep checkpointed so runs resume from
the last completed iteration, carrying per-partition lineage and
iteration metrics. Implemented over a directory of parquet tables (the
Iceberg path is the same API — `df.writeTo(tbl)` — behind a catalog;
this sandbox has no Iceberg jars, so the parquet layout stands in, one
directory per (algo, iteration) = one atomic snapshot).

Storage backends for the BOOKKEEPING (snapshot data always flows
through Spark writers, which handle any Hadoop-supported URI):
  * plain path      -> driver-local os/file APIs (single box, NFS)
  * scheme://...    -> the Hadoop FileSystem API via the JVM gateway
    (hdfs://, s3a://, file://, ...), so --resume and metrics work on a
    real cluster against an object store. Metrics are one immutable
    JSON file per superstep under <base>/metrics/ (object stores have
    no append), read back merged+sorted; the local backend keeps the
    appendable metrics.jsonl layout.

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


class _LocalFS:
    """Driver-local filesystem bookkeeping (plain paths)."""

    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def list_success_iters(self, algo: str) -> list[int]:
        d = os.path.join(self.base, algo)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(name.split("=")[1])
            for name in os.listdir(d)
            if name.startswith("iter=")
            and os.path.exists(os.path.join(d, name, "_SUCCESS"))
        )

    def list_all_iters(self, algo: str) -> list[int]:
        """Every iter= directory, including partial (no _SUCCESS) ones —
        the truncate_after sweep needs to clear crash leftovers."""
        d = os.path.join(self.base, algo)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(name.split("=")[1])
            for name in os.listdir(d)
            if name.startswith("iter=")
        )

    def append_metrics(self, rec: dict) -> None:
        with open(os.path.join(self.base, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read_metrics(self) -> list[dict]:
        p = os.path.join(self.base, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    def remove_iter(self, algo: str, iteration: int) -> None:
        d = os.path.join(self.base, algo, f"iter={iteration:05d}")
        if os.path.isdir(d):
            shutil.rmtree(d)


class _HadoopFS:
    """Bookkeeping through org.apache.hadoop.fs.FileSystem (URI paths).

    Uses the active SparkSession's JVM gateway; works for any scheme the
    cluster's Hadoop conf can resolve (hdfs://, s3a://, file://, ...).
    """

    def __init__(self, base_dir: str, spark: SparkSession):
        self.base = base_dir.rstrip("/")
        self._jvm = spark._jvm
        self._jpath = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._jpath(self.base).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        self._fs.mkdirs(self._jpath(self.base))
        self._seq = 0

    def list_success_iters(self, algo: str) -> list[int]:
        d = self._jpath(f"{self.base}/{algo}")
        if not self._fs.exists(d):
            return []
        out = []
        for st in self._fs.listStatus(d):
            name = st.getPath().getName()
            if name.startswith("iter=") and self._fs.exists(
                self._jpath(f"{self.base}/{algo}/{name}/_SUCCESS")
            ):
                out.append(int(name.split("=")[1]))
        return sorted(out)

    def list_all_iters(self, algo: str) -> list[int]:
        """Every iter= directory, _SUCCESS or not (truncation sweep)."""
        d = self._jpath(f"{self.base}/{algo}")
        if not self._fs.exists(d):
            return []
        return sorted(
            int(st.getPath().getName().split("=")[1])
            for st in self._fs.listStatus(d)
            if st.getPath().getName().startswith("iter=")
        )

    def append_metrics(self, rec: dict) -> None:
        # one immutable file per record: append() is unsupported on
        # object stores, and create-new is atomic enough for metrics
        self._seq += 1
        p = self._jpath(
            f"{self.base}/metrics/{rec['algo']}-i{rec['iteration']:05d}"
            f"-{rec['run_id']}-{self._seq:04d}.json"
        )
        out = self._fs.create(p, True)
        try:
            out.write(bytearray(json.dumps(rec).encode("utf-8")))
        finally:
            out.close()

    def read_metrics(self) -> list[dict]:
        d = self._jpath(f"{self.base}/metrics")
        if not self._fs.exists(d):
            return []
        recs = []
        for st in self._fs.listStatus(d):
            stream = self._fs.open(st.getPath())
            try:
                text = self._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            finally:
                stream.close()
            recs.append((st.getPath().getName(), json.loads(text)))
        # filename embeds (algo, iteration, seq) -> stable replay order
        return [r for _, r in sorted(recs)]

    def remove_iter(self, algo: str, iteration: int) -> None:
        p = self._jpath(f"{self.base}/{algo}/iter={iteration:05d}")
        if self._fs.exists(p):
            self._fs.delete(p, True)


class CheckpointManager:
    def __init__(self, base_dir: str, run_id: str = "run0"):
        self.base_dir = base_dir
        self.run_id = run_id
        if "://" in base_dir:
            spark = SparkSession.getActiveSession()
            if spark is None:
                raise ValueError(
                    "CheckpointManager with a URI checkpoint dir requires an "
                    f"active SparkSession (got {base_dir!r} with no session)"
                )
            self._fs: _LocalFS | _HadoopFS = _HadoopFS(base_dir, spark)
        else:
            self._fs = _LocalFS(base_dir)

    def _iter_dir(self, algo: str, iteration: int) -> str:
        return f"{self.base_dir.rstrip('/')}/{algo}/iter={iteration:05d}"

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
        self._fs.append_metrics(rec)
        return reloaded

    def latest(self, algo: str) -> tuple[int, str] | None:
        """(iteration, path) of the newest completed snapshot, or None."""
        iters = self._fs.list_success_iters(algo)
        if not iters:
            return None
        k = iters[-1]
        return k, self._iter_dir(algo, k)

    def load(self, spark: SparkSession, algo: str, iteration: int) -> DataFrame:
        return spark.read.parquet(self._iter_dir(algo, iteration))

    def metrics(self) -> list[dict]:
        return self._fs.read_metrics()

    def truncate_after(self, algo: str, iteration: int) -> None:
        """Drop snapshots with iter > iteration (used by resume tests).

        Sweeps ALL iter= directories, not just _SUCCESS-complete ones:
        a crash mid-write leaves a partial snapshot with no _SUCCESS,
        and truncation must clear it too or a later resume could sit
        next to stale partial data (ADVICE r3). The _SUCCESS filter
        remains authoritative for latest()/resume only."""
        for k in self._fs.list_all_iters(algo):
            if k > iteration:
                self._fs.remove_iter(algo, k)
