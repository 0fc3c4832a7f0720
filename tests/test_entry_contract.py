"""Mirror of the driver's correctness gate: run every queries() entry
and compare row count + column names + order-insensitive values against
the DuckDB oracle on the same parquet tables (sf0.001 for speed; the
driver runs sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(rows, cols):
    """Column-name-sorted, order-insensitive normalized rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


# the driver sees queries()/oracle_sql() (capped at 50 slots); pytest
# verifies the FULL registry including the extra_queries() overflow
ORACLES = entry_mod.all_oracle_sql()
QUERIES = entry_mod.all_queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_driver_registry_fits_the_50_row_window():
    """CORRECTNESS_r03 recorded exactly the first 50 queries() entries;
    the driver-facing registry must never exceed that window again."""
    q = entry_mod.queries()
    assert len(q) <= 50
    assert set(entry_mod.oracle_sql()) <= set(q)
    # extras + driver set = full registry, no overlap
    extras = entry_mod.extra_queries()
    assert set(q).isdisjoint(extras)
    assert set(q) | set(extras) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    assert _norm(s_rows, s_cols) == _norm(d_rows, d_cols), f"{name}: values differ"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 1


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 20
    assert rows[0].rank >= rows[-1].rank
