"""Local replica of the driver's t2 correctness gate.

Runs every declared query at sf0.001 through Spark AND its DuckDB oracle,
then compares row count, column names, and an order-insensitive canonical
value multiset (floats canonicalized to 9 decimal places).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from iceberg_v2_to_v3_upgrade_spark.io import TABLES
from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)


def _canon(value):
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{round(value, 9):.9f}"
    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in value) + "]"
    return repr(value)


def _row_multiset(rows, columns):
    # order-insensitive: sort columns by name, then sort row tuples
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(row[i]) for i in order) for row in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMALL)
    # Driver-canon contract: the driver hashes results via pandas
    # sort_values, which raises "unhashable type" on array/map/struct cells
    # (round-1 h5_array_agg postmortem). Oracle-backed queries must emit
    # scalar columns only — join arrays to strings before returning.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: oracle-backed query returns complex-typed columns "
        f"{complex_cols}; the driver's pandas canonicalizer cannot hash these"
    )
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)

    rel = duck.execute(q.oracle)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    s_set = _row_multiset(s_rows, s_cols)
    d_set = _row_multiset(d_rows, d_cols)
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
    assert s_set == d_set, f"{name}: value mismatch, first diffs: {mism}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMALL)
    rows = sdf.collect()
    assert rows is not None  # must run; emptiness is operator-specific


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # flagship = part minus {2,4,6} at sf0.001 (200-row part)
    assert len(rows) == 197


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
