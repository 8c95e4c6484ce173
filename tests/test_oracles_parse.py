"""Every oracle_sql() string must be valid DuckDB SQL against the
testdata schema. EXPLAIN-only (no execution), so the whole registry
checks in seconds — oracle syntax rot surfaces here instead of in the
driver's correctness gate."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_sql_parses_and_binds(con, name):
    con.execute(f"EXPLAIN {_ORACLES[name]}")
