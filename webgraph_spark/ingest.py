"""Ingest stage: sha-256 row invariant + import parsing -> raw edge pairs.

Pipeline (SURVEY.md §7 Stage 1):
    sources(repo, path, commit, lang, content)
      -> with_sha()      adds content_sha (per-row invariant, input_hint)
      -> derive_edges()  regexp-extracts per-lang import targets, resolves
                         them against the file dictionary -> (src,dst) file
                         pairs, dedup'd, self-loops dropped.

All parsing is JVM-side (regexp_extract_all / explode) — no Python in
the hot path. The reference's only "parser" is its ASCII adjacency
loader (/root/reference/src/ascii_graph/mod.rs:289-339); import parsing
is engine-side per the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-lang import-target extraction patterns (match synth.py's syntax,
# which mirrors real python/java/c/js import forms)
_PATTERNS = {
    "python": r"from ([\w.]+) import",
    "java": r"import ([\w.]+);",
    "c": r'#include "([^"]+)"',
    "js": r'require\("([^"]+)"\)',
}


def with_sha(sources: DataFrame) -> DataFrame:
    """Attach the content sha-256 invariant column."""
    return sources.withColumn("content_sha", F.sha2(F.col("content"), 256))


def file_key(repo_col, path_col):
    """Canonical extension-less key 'repo/dir/stem' used for resolution."""
    return F.concat_ws(
        "/", repo_col, F.regexp_replace(path_col, r"\.[A-Za-z0-9]+$", "")
    )


def extract_import_targets(sources: DataFrame) -> DataFrame:
    """(repo, path, target_key) — one row per import statement."""
    pat = F.when(F.col("lang") == "python", F.lit(_PATTERNS["python"]))
    for lang in ("java", "c", "js"):
        pat = pat.when(F.col("lang") == lang, F.lit(_PATTERNS[lang]))
    raw = (
        sources.select(
            "repo",
            "path",
            "lang",
            F.explode(F.regexp_extract_all(F.col("content"), pat, F.lit(1))).alias("raw_target"),
        )
    )
    # normalize to the slash-form extension-less key:
    #   python/java dotted module -> slashes; c include -> strip .h
    target = (
        F.when(
            F.col("lang").isin("python", "java"),
            F.regexp_replace(F.col("raw_target"), r"\.", "/"),
        )
        .when(F.col("lang") == "c", F.regexp_replace(F.col("raw_target"), r"\.h$", ""))
        .otherwise(F.col("raw_target"))
    )
    return raw.select("repo", "path", target.alias("target_key"))


def derive_edges(sources: DataFrame) -> DataFrame:
    """Resolve imports to file pairs.

    Returns (src_repo, src_path, dst_repo, dst_path), duplicate-free and
    self-loop-free — mirroring the reference's hard invariants (sorted,
    duplicate-free successor sets, src/webgraph/bvgraph.rs:1253-1255).
    """
    files = sources.select(
        F.col("repo").alias("dst_repo"),
        F.col("path").alias("dst_path"),
        file_key(F.col("repo"), F.col("path")).alias("target_key"),
    ).dropDuplicates(["target_key"])
    imports = extract_import_targets(sources)
    return (
        imports.join(files, "target_key")  # unresolved imports drop (inner)
        .select(
            F.col("repo").alias("src_repo"),
            F.col("path").alias("src_path"),
            "dst_repo",
            "dst_path",
        )
        .filter(
            (F.col("src_repo") != F.col("dst_repo"))
            | (F.col("src_path") != F.col("dst_path"))
        )
        .dropDuplicates(["src_repo", "src_path", "dst_repo", "dst_path"])
    )
