"""Driver-contract invariants for __spark_entry__: every oracle has a
matching query, and oracle column names equal the Spark result columns
(the driver's value-hash sorts by column name, so a mismatch silently
breaks comparison)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"'{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_has_a_query():
    qs = entry.queries()
    extra = set(entry.oracle_sql()) - set(qs)
    assert not extra, f"oracles without queries: {extra}"


def test_oracle_sql_parses_and_columns_match(spark, con):
    qs = entry.queries()
    for name, sql in entry.oracle_sql().items():
        oracle_cols = [d[0] for d in
                       con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
                       .description]
        spark_cols = qs[name](spark, SF_DIR).columns
        assert sorted(oracle_cols) == sorted(spark_cols), \
            f"{name}: oracle {sorted(oracle_cols)} != spark {sorted(spark_cols)}"


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert df.columns == ["tile_x", "tile_y", "n_pages", "n_domains"]
