"""Local replica of the driver's correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` twin on DuckDB at sf0.01, compare
row count, column names, and order-insensitive values."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon(df):
    """Columns sorted by name; all values normalized to strings; rows sorted."""
    import math

    cols = sorted(df.columns)
    df = df[cols]

    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            return f"{v:.6f}"
        try:
            import decimal
            if isinstance(v, decimal.Decimal):
                return f"{float(v):.6f}"
        except Exception:
            pass
        return str(v)

    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    assert len(sdf) >= 0  # runs
    if name not in ORACLES:
        assert len(sdf) > 0, f"rows-only query {name} returned empty"
        return
    con = duck_con()
    ddf = con.sql(ORACLES[name]).df()
    s_cols, s_rows = canon(sdf)
    d_cols, d_rows = canon(ddf)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), \
        f"{name}: {len(s_rows)} rows vs oracle {len(d_rows)}"
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: first mismatches {mismatches}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
