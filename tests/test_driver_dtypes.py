"""Driver-canon dtype contract (round-2 postmortem).

The driver hashes query results via pandas after converting the Spark side
with toPandas() and the DuckDB side with .df(). Empirically (cross-
referencing CORRECTNESS_r01/r02 green rows against a full dtype audit):

- int-width differences (int8/int32/int64) are TOLERATED,
- datetime64[ns] vs datetime64[us] and date-object vs datetime64 are
  TOLERATED,
- an int column on one side landing as float64 on the other is a HASH
  MISMATCH even when every value is numerically equal. The usual culprit:
  DuckDB `sum(<integer>)` returns HUGEINT, which .df() converts to
  float64 — all 10 non-green r02 rows traced to exactly this.

This test is PLAN-ONLY (no data execution): Spark schemas come from the
unresolved DataFrame, DuckDB types from the relation planner, so the whole
registry checks in seconds. Fix = CAST(sum(...) AS BIGINT) in the oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from iceberg_v2_to_v3_upgrade_spark.io import TABLES
from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)

_SPARK_INT = {"byte", "short", "integer", "long"}
_SPARK_FLOAT = {"float", "double"}
# pandas-landing class for DuckDB types: HUGEINT (sum-of-int) and DECIMAL
# land as float64 in .df(), so they count as float here.
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "HUGEINT"}


def _spark_class(dt) -> str | None:
    t = dt.typeName()
    if t in _SPARK_INT:
        return "int"
    if t in _SPARK_FLOAT:
        return "float"
    if t.startswith("decimal"):
        return "float"  # lands as object(Decimal) — treat as float-adjacent
    return None


def _duck_class(t: str) -> str | None:
    t = t.upper()
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT or t.startswith("DECIMAL"):
        return "float"
    return None


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
def test_no_int_float_dtype_mismatch(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMALL)
    spark_types = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
    rel = duck.sql(q.oracle)
    duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    for col, s_cls in spark_types.items():
        d_cls = _duck_class(duck_types.get(col, ""))
        if s_cls is None or d_cls is None:
            continue
        assert s_cls == d_cls, (
            f"{name}.{col}: Spark lands as {s_cls} but DuckDB as {d_cls} "
            f"(duck type {duck_types[col]}) — the driver's pandas hash "
            f"treats int64 vs float64 as a mismatch even for equal values; "
            f"CAST the oracle aggregate to BIGINT (or align the Spark type)"
        )
