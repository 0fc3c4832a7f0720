"""Cross-engine deterministic hashing primitives.

Every near-dup / fingerprint operator derives its hashes from md5 hex
substrings, because md5 produces byte-identical lowercase hex in both
Spark (JVM codegen, whole-stage) and DuckDB — which makes the whole
MinHash / SimHash / fingerprint family exactly oracle-checkable by the
driver's DuckDB gate. Spark side: `conv(substr(md5(x), a, l), 16, 10)`
— all JVM, zero Python. DuckDB twin: `CAST('0x' || substr(md5(x), a, l)
AS BIGINT)`.

Multiple hash functions are derived from ONE md5 per input via
Kirsch–Mitzenmacher double hashing h_i = (h1 + i*h2) mod P: one digest
feeds 64 MinHash permutations, which is what keeps signature cost
linear in shingle volume at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# prime just below 2^40; h1, h2 are 40-bit so (h1 + 63*h2) < 2^46 — no
# int64 overflow in either engine
KM_PRIME = 999999999989

# Cross-engine whitespace splitter. Java's \s includes vertical tab
# \x0B, RE2's (DuckDB) does not — an implicit \s+ silently desyncs the
# engine from its oracle on \x0B-bearing text (ADVICE r02). Both sides
# therefore use this EXPLICIT class; the raw string reads identically
# as a Java regex (Spark) and as an RE2 pattern inside a SQL literal.
WS_RE = r"[ \t\n\x0B\f\r]+"


def md5_long(col: Column, start: int, length: int) -> Column:
    """Integer from `length` hex chars of md5(col), 1-based `start`.

    length <= 15 keeps the value under 2^60 (safe signed-64 territory).
    """
    assert 1 <= length <= 15
    return F.conv(F.substring(F.md5(col), start, length), 16, 10).cast("long")


def sql_md5_long(expr: str, start: int, length: int) -> str:
    """DuckDB twin of md5_long — same value, bit for bit."""
    assert 1 <= length <= 15
    return f"CAST(concat('0x', substr(md5({expr}), {start}, {length})) AS BIGINT)"


def km_hash(h1: Column, h2: Column, i: Column) -> Column:
    """i-th derived hash (Kirsch–Mitzenmacher): (h1 + i*h2) mod P."""
    return (h1 + i * h2) % F.lit(KM_PRIME)


def sql_km_hash(h1: str, h2: str, i: str) -> str:
    return f"(({h1}) + ({i}) * ({h2})) % {KM_PRIME}"
