"""Oracle output-type discipline (r7 root-cause regression guard).

The driver fetches DuckDB oracle results via Arrow, where HUGEINT /
DECIMAL columns hash differently from Spark's int64 / float64 EVEN WHEN
VALUES MATCH (DuckDB ``SUM(BIGINT)`` → HUGEINT → decimal128(38,0) was
exactly the r6 triple-red).  This test ``DESCRIBE``s every declared
oracle — type inference only, nothing executes — and fails if any output
column is decimal-family, so the class cannot be reintroduced.

Fix recipe when this fails: ``CAST(SUM(x) AS BIGINT)`` for integer sums,
``CAST(expr AS DOUBLE)`` for decimal-literal arithmetic (DuckDB division
``/`` already returns DOUBLE and needs no cast).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_emits_decimal_columns(con):
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            f"{col}:{typ}"
            for col, typ, *_ in desc
            if "DECIMAL" in typ.upper() or "HUGEINT" in typ.upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with decimal-family output columns (driver Arrow hash "
        f"will diverge from Spark): {offenders}"
    )


def test_oracle_column_names_are_unique(con):
    """The driver's hash sorts columns by name; duplicate names would
    silently collapse in dict-based fetch paths."""
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        cols = [c for c, *_ in desc]
        if len(cols) != len(set(cols)):
            offenders[name] = cols
    assert not offenders, f"oracles with duplicate column names: {offenders}"
