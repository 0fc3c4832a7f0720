"""Deterministic synthetic source-code table generator.

Produces the north-star input table
    sources(repo string, path string, commit string, lang string, content string)
(BASELINE.json input_hint) with embedded import/include statements
referencing other generated files, drawn Zipf-heavy so hub files exist
(exercises skew salting). Generation is DISTRIBUTED (mapInPandas over
spark.range) and every row derives solely from (seed, global file id),
so the table is identical at any parallelism level — the same property
the engine needs for reproducible dictionary encoding at cluster scale.

The reference's golden fixture (cnr-2000 web graph,
src/ascii_graph/tests.rs:15-16) was stripped from the snapshot, so all
fixtures are synthesized (FIXTURES.md F1).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LANGS = ["python", "java", "c", "js"]
_EXT = {"python": "py", "java": "java", "c": "c", "js": "js"}

SOURCES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)


def _file_meta(fid: int, n_repos: int, files_per_repo: int) -> tuple[str, str, str]:
    """(repo, stem, lang) for a global file id — pure function of fid."""
    repo_i, file_j = divmod(fid, files_per_repo)
    repo = f"org{repo_i % 7}/repo{repo_i}"
    stem = f"src/pkg{file_j % 10}/mod{file_j}"
    lang = LANGS[(fid * 2654435761) % 4]
    return repo, stem, lang


def _import_stmt(lang: str, repo: str, stem: str, tgt_lang: str) -> str:
    """One import line in lang's syntax targeting (repo, stem)."""
    if lang == "python":
        mod = (repo + "/" + stem).replace("/", ".")
        return f"from {mod} import api"
    if lang == "java":
        mod = (repo + "/" + stem).replace("/", ".")
        return f"import {mod};"
    if lang == "c":
        return f'#include "{repo}/{stem}.h"'
    return f'const m = require("{repo}/{stem}");'


def _gen_batch(
    fids: np.ndarray, n_files: int, n_repos: int, files_per_repo: int, seed: int
) -> pd.DataFrame:
    rows = []
    for fid in fids:
        fid = int(fid)
        repo, stem, lang = _file_meta(fid, n_repos, files_per_repo)
        ext = _EXT[lang]
        rng = np.random.default_rng((seed << 32) ^ fid)
        n_imports = int(rng.integers(0, 12))
        # Zipf-heavy targets => low fids become hub files (in-degree skew)
        raw = rng.zipf(1.35, size=n_imports * 2) - 1
        targets = [int(t) for t in raw if t < n_files and t != fid][:n_imports]
        lines = [f"// synthetic {lang} module fid={fid}"]
        for t in dict.fromkeys(targets):  # dedup, keep order
            t_repo, t_stem, t_lang = _file_meta(t, n_repos, files_per_repo)
            lines.append(_import_stmt(lang, t_repo, t_stem, t_lang))
        body_n = int(rng.integers(3, 20))
        lines += [f"x_{i} = {int(rng.integers(0, 1 << 30))}" for i in range(body_n)]
        content = "\n".join(lines)
        commit = hashlib.sha1(f"{seed}:{fid}".encode()).hexdigest()
        rows.append((repo, f"{stem}.{ext}", commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synth_sources(
    spark: SparkSession,
    n_repos: int = 20,
    files_per_repo: int = 10,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic source table; identical at any parallelism."""
    n_files = n_repos * files_per_repo
    parts = num_partitions or max(4, min(64, n_files // 2000 + 4))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), n_files, n_repos, files_per_repo, seed)

    return (
        spark.range(0, n_files, numPartitions=parts)
        .mapInPandas(gen, schema=SOURCES_SCHEMA)
    )


def expected_sha256(spark: SparkSession, sources: DataFrame) -> DataFrame:
    """Driver-side oracle for the content-sha256 row invariant (F1)."""
    rows = sources.select("repo", "path", "commit", "content").collect()
    data = [
        (r.repo, r.path, r.commit, hashlib.sha256(r.content.encode()).hexdigest())
        for r in rows
    ]
    return spark.createDataFrame(data, "repo string, path string, commit string, sha string")
