"""Declared DML-lifecycle query: the mutable-table module end-to-end,
hash-checked against a pure-SQL oracle.

This is the reference's whole demo arc (create V2 MoR table -> insert ->
MoR DELETE -> MoR UPDATE -> upgrade to V3 -> full compaction -> scan,
``internal/create_demo_table.py`` + ``internal/upgrade_table.py``) executed
through ``tables.LocalTable`` on fixture data, so the driver's correctness
gate exercises the *stateful* engine, not just read operators. The oracle
expresses the final state relationally (DELETE ≡ NOT IN, UPDATE ≡ CASE
WHEN — SURVEY.md §7 M3 oracle strategy).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_LIFECYCLE_ORACLE = """
    SELECT p_partkey, p_brand,
           round(CASE WHEN p_type = 'PROMO' THEN p_retailprice * 1.1
                      ELSE p_retailprice END, 2) AS p_retailprice
    FROM part
    WHERE p_partkey NOT IN (2, 4, 6)
    ORDER BY p_partkey
"""


@declare("i3_table_lifecycle", oracle=_LIFECYCLE_ORACLE, tags=("dml", "lifecycle"))
def i3_table_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create -> insert(part) -> MoR DELETE IN (2,4,6) -> MoR UPDATE
    promo*1.1 -> upgrade V2->V3 -> compact -> scan.

    Compaction must be semantically invisible and the upgraded table fully
    readable — the exact invariants the reference verifies cross-engine;
    here the DuckDB oracle hash-check *is* that cross-engine verification.
    """
    from iceberg_v2_to_v3_upgrade_spark.plans.upgrade import execute_upgrade
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="lifecycle_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "life_db",
        "part_mor",
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
        partition_by=["p_brand"],
    )
    t.insert(load_table(spark, sf_dir, "part"))
    t.delete_where("p_partkey IN (2, 4, 6)")
    t.update_set(
        {"p_retailprice": "round(p_retailprice * 1.1, 2)"}, "p_type = 'PROMO'"
    )
    result = execute_upgrade(catalog, "life_db", "part_mor")
    assert result.ok, result.message
    upgraded = catalog.load_table("life_db", "part_mor")
    assert upgraded.format_version == 3
    assert not upgraded.current_snapshot().delete_dirs
    return (
        upgraded.scan()
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )
