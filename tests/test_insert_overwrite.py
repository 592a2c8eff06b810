"""INSERT OVERWRITE: dynamic partition overwrite + full-table replace."""

from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL, PermissionDenied
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return LocalCatalog(spark, str(tmp_path / "wh"))


def test_dynamic_partition_overwrite(spark, catalog):
    t = catalog.create_table(
        "ow_db", "sales", "id BIGINT, region STRING, amt DOUBLE",
        partition_by=["region"],
    )
    t.insert_values([(1, "emea", 10.0), (2, "apac", 20.0), (3, "amer", 30.0)])
    dirs_before = list(t.current_snapshot().data_dirs)

    # overwrite ONLY emea (two replacement rows); apac/amer untouched
    t.insert_overwrite(
        spark.createDataFrame(
            [(10, "emea", 1.0), (11, "emea", 2.0)],
            "id BIGINT, region STRING, amt DOUBLE",
        )
    )
    rows = {r.id: (r.region, r.amt) for r in t.scan().collect()}
    assert rows == {
        2: ("apac", 20.0), 3: ("amer", 30.0),
        10: ("emea", 1.0), 11: ("emea", 2.0),
    }
    # untouched partitions' files are still the ORIGINAL dirs (no rewrite)
    snap = t.current_snapshot()
    assert set(dirs_before) <= set(snap.data_dirs)
    assert snap.operation == "overwrite"
    # time travel: the pre-overwrite snapshot still reads old emea rows
    prev = t.snapshots()[-2]
    old = {r.id for r in t.scan(snapshot_id=prev.id).collect()}
    assert old == {1, 2, 3}


def test_unpartitioned_overwrite_is_full_replace(spark, catalog):
    t = catalog.create_table("ow_db", "flat", "id BIGINT, v BIGINT")
    t.insert_values([(1, 1), (2, 2)])
    t.insert_overwrite(
        spark.createDataFrame([(9, 9)], "id BIGINT, v BIGINT")
    )
    assert [(r.id, r.v) for r in t.scan().collect()] == [(9, 9)]
    snap = t.current_snapshot()
    assert len(snap.data_dirs) == 1 and not snap.delete_dirs


def test_insert_overwrite_sql_and_permissions(spark, catalog):
    admin = EngineSQL(catalog)
    admin.execute(
        "CREATE TABLE glue_catalog.ow_db.ev "
        "(id BIGINT, day STRING, n BIGINT) USING iceberg "
        "PARTITIONED BY (day);"
        "INSERT INTO glue_catalog.ow_db.ev VALUES "
        "(1, 'd1', 5), (2, 'd2', 6), (3, 'd2', 7)"
    )
    admin.execute_one(
        "INSERT OVERWRITE ow_db.ev "
        "SELECT id + 100, day, n * 10 FROM ow_db.ev WHERE day = 'd2'"
    )
    rows = sorted(
        (r.id, r.day, r.n)
        for r in admin.execute_one("SELECT * FROM ow_db.ev").df.collect()
    )
    assert rows == [(1, "d1", 5), (102, "d2", 60), (103, "d2", 70)]

    # overwrite deletes rows -> needs DELETE, not just INSERT
    catalog.permissions.enable_enforcement()
    catalog.permissions.grant_table_permissions("bob", "ow_db", "ev", ["SELECT", "INSERT"])
    bob = EngineSQL(catalog, principal="bob")
    with pytest.raises(PermissionDenied):
        bob.execute_one(
            "INSERT OVERWRITE ow_db.ev SELECT id, day, n FROM ow_db.ev"
        )


def test_overwrite_replaces_null_partition(spark, catalog):
    """Iceberg treats NULL as a partition value: incoming NULL-partition
    rows must REPLACE the existing NULL partition (null-safe compare —
    a plain equi-join would never match it)."""
    t = catalog.create_table(
        "ow_db", "nullpart", "id BIGINT, region STRING, amt DOUBLE",
        partition_by=["region"],
    )
    t.insert_values([(1, None, 10.0), (2, "apac", 20.0)])
    t.insert_overwrite(
        spark.createDataFrame(
            [(9, None, 99.0)], "id BIGINT, region STRING, amt DOUBLE"
        )
    )
    rows = {r.id: (r.region, r.amt) for r in t.scan().collect()}
    assert rows == {9: (None, 99.0), 2: ("apac", 20.0)}
