"""Text analysis operators for training-data pipelines.

All hot-path logic is JVM-side pyspark.sql.functions (codegen'd),
including the rolling-hash document fingerprint (md5-prefix token
hashes folded with F.aggregate). Each operator has an ANSI-SQL twin
used as its DuckDB oracle in __spark_entry__.py, so the implementations
deliberately stick to engine-portable semantics (replace/length
counting over regexp dialects, md5-derived hashing — see
pipeline/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.pipeline.hashing import WS_RE

# languages scored by the occurrence count of their marker stopwords
# (padded with spaces; counted via length arithmetic so Spark and any
# SQL oracle agree byte-for-byte — no regexp dialect drift)
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " y "],
}


def _occurrences(col, needle: str):
    """Number of non-overlapping occurrences of needle via replace()."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / len(needle)


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the coarse shape GPT-style byte-pair pre-splitting produces.
# Deliberately uses only constructs whose semantics agree between Java
# regex (Spark) and RE2-ish engines (DuckDB) so the oracle is exact.
# The whitespace set is an EXPLICIT class, not \s: Java's \s includes
# vertical tab \x0B, RE2's does not — \s here would silently desync the
# engine from its oracle on \x0B-bearing text (ADVICE r02).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_tokens_bpe, n_chars_norm) — whitespace
    tokenization plus a BPE-ish regex token count (letter runs, digit
    runs, individual symbols)."""
    t = F.trim(F.col("text"))
    return docs.select(
        "doc_id",
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, WS_RE)))
        .cast("long")
        .alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), F.lit(0)))
        .cast("long")
        .alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars_norm"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, alpha_ratio, space_ratio, stop_ratio, quality) — cheap
    heuristic quality scoring; ratios rounded to 6dp for stable
    cross-engine comparison."""
    text = F.col("text")
    n = F.greatest(F.length(text), F.lit(1)).cast("double")
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    spaces = F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit("")))
    stops = sum(_occurrences(padded, f" {w} ") for w in ["the", "and", "of", "a"])
    toks = F.when(F.length(F.trim(text)) == 0, F.lit(1)).otherwise(
        F.size(F.split(F.trim(text), WS_RE))
    ).cast("double")
    alpha_ratio = alpha / n
    space_ratio = spaces.cast("double") / n
    stop_ratio = stops.cast("double") / toks
    quality = F.least(
        F.lit(1.0),
        alpha_ratio * 0.5 + F.least(stop_ratio * 2.0, F.lit(0.5)),
    )
    return docs.select(
        "doc_id",
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(space_ratio, 6).alias("space_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — marker-stopword language heuristic.
    Deterministic argmax, tie -> lexicographically first language,
    all-zero -> 'und'."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    scores = [
        (lang, sum(_occurrences(padded, m) for m in markers))
        for lang, markers in sorted(_LANG_MARKERS.items())
    ]
    best = F.lit("und")
    best_score = F.lit(0.0)
    for lang, score in scores:  # first-wins on ties => lexicographic
        take = score > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, score).otherwise(best_score)
    return docs.select("doc_id", best.alias("pred_lang"))


# rolling-hash parameters: MOD < 2^31 keeps acc*BASE + tok_hash < 2^52
# (no int64 overflow in Spark or DuckDB); token hash = 28-bit md5 prefix
FP_MOD = 2147483647
FP_BASE = 1_000_003


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — polynomial rolling hash over whitespace
    tokens, folded entirely JVM-side: token hashes via md5 prefix
    (cross-engine, see pipeline/hashing.py), sequential fold via
    F.aggregate over the token array. Zero Python in the hot path; the
    DuckDB oracle replays the identical fold with list_reduce."""
    from webgraph_spark.pipeline.hashing import md5_long

    t = F.trim(F.col("text"))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, WS_RE)
    )
    tok_hashes = F.transform(toks, lambda tok: md5_long(tok, 1, 7))
    fp = F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_BASE + x) % FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def fingerprints_sql() -> str:
    """DuckDB twin of fingerprints() — byte-identical fold."""
    from webgraph_spark.pipeline.hashing import sql_md5_long

    th = sql_md5_long("tok", 1, 7)
    return f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(
        CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
             ELSE string_split_regex(trim(text), '{WS_RE}') END,
        tok -> {th})),
    (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fingerprint
FROM documents
"""


def corpus_stats(docs: DataFrame) -> DataFrame:
    """(source, n_docs, total_tokens, avg_quality_e4) — per-source
    corpus composition report: the rollup a dataset card / mixture
    designer reads.

    Plan shape: ONE documents scan projecting (source, n_tokens,
    q_micro), then ONE partial+final hash aggregation — no joins.
    The quality column is made order-independent by summing the
    micro-scaled INTEGER quality (floor(q*1e6 + 0.5), deterministic
    per row in both engines) instead of avg() over doubles: a rounded
    float average flips its last digit when the partial-agg summation
    order changes with partitioning (the r3 hash-fail), an int64 sum
    never does. The exported average is a pure-BIGINT e4 digest
    (half-up round of sum_q_micro / (100 * n_docs), i.e. avg*1e4)
    computed by INTEGER division in both engines — no DOUBLE ever
    leaves the plan, so no engine/build can disagree on a last digit
    (the r3/r4 hash-fail was environment-specific double rounding)."""
    text = F.col("text")
    t = F.trim(text)
    n_tokens = (
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, WS_RE)))
        .cast("long")
    )
    # same quality formula as quality_scores(), unrounded
    n = F.greatest(F.length(text), F.lit(1)).cast("double")
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
    stops = sum(_occurrences(padded, f" {w} ") for w in ["the", "and", "of", "a"])
    toks = F.when(F.length(t) == 0, F.lit(1)).otherwise(
        F.size(F.split(t, WS_RE))
    ).cast("double")
    quality = F.least(
        F.lit(1.0),
        (alpha / n) * 0.5 + F.least(stops.cast("double") / toks * 2.0, F.lit(0.5)),
    )
    q_micro = F.floor(quality * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        docs.select(F.col("source"), n_tokens.alias("n_tokens"), q_micro.alias("q_micro"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("q_micro").alias("sum_q_micro"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            # half-up round(sum_q_micro / (100*n_docs)) in pure int64:
            # floor((2*sum + 100*n) / (200*n)); `div` is Spark's
            # integral division, exact for these magnitudes.
            F.expr(
                "(2 * sum_q_micro + 100 * n_docs) div (200 * n_docs)"
            ).alias("avg_quality_e4"),
        )
    )


def vocab_top_terms(docs: DataFrame, k: int = 50) -> DataFrame:
    """(token, n_occurrences, n_docs) — the k most frequent lowercase
    whitespace tokens, ties broken by token ascending. The exact
    top-k heavy-hitter shape: explode -> two-phase hash agg (map-side
    combine absorbs per-partition repetition) -> small global top-k.
    At 100 TB the same plan holds because the aggregated key space
    (vocabulary) is sublinear in the corpus; only the final limit is
    driver-sized."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), WS_RE)
        ).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


CORPUS_STATS_SQL = """
WITH per_doc AS (
  -- q_micro: the engine's unrounded quality formula, micro-scaled to
  -- an exact BIGINT (floor(q*1e6 + 0.5)) so the sum is summation-order
  -- independent; the 4dp average is derived from the integer sum by
  -- one deterministic division (mirrors corpus_stats exactly)
  SELECT source,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END
         AS BIGINT) AS n_tokens,
    CAST(floor(least(1.0,
      (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
         / CAST(greatest(length(text), 1) AS DOUBLE)) * 0.5
      + least(
          (( (length(p) - length(replace(p, ' the ', ''))) / 5.0
           + (length(p) - length(replace(p, ' and ', ''))) / 5.0
           + (length(p) - length(replace(p, ' of ', ''))) / 4.0
           + (length(p) - length(replace(p, ' a ', ''))) / 3.0 ) / toks2) * 2.0,
          0.5)) * 1e6 + 0.5) AS BIGINT) AS q_micro
  FROM (
    SELECT source, text, ' ' || lower(text) || ' ' AS p,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 1
                ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END
                AS DOUBLE) AS toks2
    FROM documents
  )
)
SELECT source, count(*) AS n_docs,
       -- DuckDB sum(BIGINT) is HUGEINT (float64 once in pandas) —
       -- cast back so the column is int64 in both engines
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       -- pure-BIGINT e4 digest: half-up round(sum_q_micro/(100*n_docs))
       -- = floor((2*sum + 100*n) / (200*n)); // is DuckDB's integer
       -- floor division — identical to Spark's `div` for these
       -- non-negative int64s, so the column is engine-exact.
       CAST((2 * sum(q_micro) + 100 * count(*)) // (200 * count(*))
         AS BIGINT) AS avg_quality_e4
FROM per_doc
GROUP BY source
"""

VOCAB_TOP_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
         '[ \\t\\n\\x0B\\f\\r]+')) AS token
  FROM documents WHERE length(trim(text)) > 0
)
SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM toks WHERE token <> ''
GROUP BY token
ORDER BY n_occurrences DESC, token ASC LIMIT 50
"""
