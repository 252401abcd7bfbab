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


def test_no_oracle_emits_array_columns(con):
    """The driver's canonicalizer sorts result rows in pandas; a list
    cell is unhashable and kills the comparison with ``err`` before any
    rows are compared (the r7/r8 ``text_inverted_index`` red).  Fix
    recipe: ``array_to_string(col, ',')`` in the oracle and
    ``F.array_join`` on the Spark side."""
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            f"{col}:{typ}"
            for col, typ, *_ in desc
            if "[]" in typ or "LIST" in typ.upper() or "MAP" in typ.upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with array/list output columns (driver canonicalizer "
        f"cannot hash list cells): {offenders}"
    )


def test_no_spark_query_emits_array_columns():
    """Spark-side twin of the array ban: every ``queries()`` entry must
    emit only scalar columns.  Checked lazily via the strict gate too
    (scripts/check_correctness.py), but this fails fast in CI without
    running any query — schema inference only at sf0.001."""
    from radohydro_spark import get_spark

    spark = get_spark("oracle-types")
    offenders = {}
    for name, fn in entry.queries().items():
        try:
            schema = fn(spark, SF_DIR).schema
        except Exception:
            continue  # runtime errors are the correctness gate's job
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if f.dataType.typeName() in ("array", "map")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries with array/map output columns (driver canonicalizer "
        f"cannot hash list cells): {offenders}"
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
