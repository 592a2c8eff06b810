from __future__ import annotations

import os

import pytest

from iceberg_v2_to_v3_upgrade_spark.cli import DEMO_ROWS, DEMO_SCHEMA
from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.sources.layout import optimize_layout
from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

from tests.conftest import SF_SMALL


def test_optimize_layout_multiplies_scan_tasks(spark, tmp_path):
    dest = str(tmp_path / "optimized")
    result = optimize_layout(
        spark,
        SF_SMALL,
        dest,
        files_per_table=4,
        sort_by={"lineitem": ["l_shipdate"]},
        tables=("lineitem", "orders"),
    )
    assert result == {"lineitem": 4, "orders": 4}
    raw = load_table(spark, SF_SMALL, "lineitem")
    opt = spark.read.parquet(os.path.join(dest, "lineitem.parquet"))
    assert opt.count() == raw.count()
    # scan parallelism: the optimized layout yields multiple input splits
    assert opt.rdd.getNumPartitions() >= 4
    assert raw.rdd.getNumPartitions() == 1  # the single-row-group pathology


def test_remove_orphan_files(spark, tmp_path):
    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table(
        "db", "t", DEMO_SCHEMA, partition_by=["category"]
    )
    t.insert_values(DEMO_ROWS)
    # simulate a crashed write: a data dir no snapshot references
    orphan = os.path.join(t.root, "data", "snap-99999")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("not really parquet")

    dry = t.remove_orphan_files(dry_run=True)
    assert dry == [orphan] and os.path.exists(orphan)
    removed = t.remove_orphan_files()
    assert removed == [orphan] and not os.path.exists(orphan)
    assert t.count() == 10  # live data untouched

    # SQL surface
    engine = EngineSQL(catalog)
    res = engine.execute_one(
        "CALL system.remove_orphan_files(table => 'db.t')"
    )
    assert res.kind == "remove_orphan_files"
    assert "[]" in res.message  # nothing left to remove
