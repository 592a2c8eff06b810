"""V3 default column values (Iceberg V3 spec: initial-default).

The contract under test: ``ADD COLUMN ... DEFAULT <lit>`` is
metadata-only — pre-ALTER files read the default, post-ALTER files store
real values (an explicit NULL stays NULL), V2 tables refuse non-null
defaults, defaults follow renames, and compaction materializes them
without changing scan results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
from iceberg_v2_to_v3_upgrade_spark.tables.table import TableError


@pytest.fixture()
def v3_table(spark, tmp_path):
    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table("db", "t", "id BIGINT, v STRING")
    t.insert(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id BIGINT, v STRING"
        )
    )
    t.set_properties({"format-version": "3"})
    return t


def test_default_refused_on_v2(spark, tmp_path):
    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table("db", "t2", "id BIGINT")
    with pytest.raises(TableError, match="format-version 3"):
        t.add_column("tier", "STRING", default="'x'")
    # plain null-filled ADD COLUMN still works on V2
    t.add_column("note", "STRING")


def test_initial_default_only_for_pre_alter_rows(spark, v3_table):
    t = v3_table
    t.add_column("score", "INT", default="7")
    t.insert(
        spark.createDataFrame(
            [(3, "c", 30), (4, "d", None)],
            "id BIGINT, v STRING, score INT",
        )
    )
    got = {r.id: r.score for r in t.scan().collect()}
    # pre-ALTER rows read the default; post-ALTER explicit NULL stays NULL
    assert got == {1: 7, 2: 7, 3: 30, 4: None}


def test_default_survives_rename_and_compaction(spark, v3_table):
    t = v3_table
    t.add_column("tier", "STRING", default="'standard'")
    t.rename_column("tier", "plan")
    before = sorted(
        tuple(r) for r in t.scan().select("id", "v", "plan").collect()
    )
    assert all(row[2] == "standard" for row in before)
    t.rewrite_data_files()
    after = sorted(
        tuple(r) for r in t.scan().select("id", "v", "plan").collect()
    )
    assert after == before  # compaction materialized, scan invariant


def test_default_sql_surface_numeric(spark, tmp_path):
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL

    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    sql = EngineSQL(catalog)
    sql.execute(
        "CREATE TABLE glue_catalog.db.n (id BIGINT) USING iceberg;"
        "INSERT INTO glue_catalog.db.n VALUES (1), (2)"
    )
    t = catalog.load_table("db", "n")
    t.set_properties({"format-version": "3"})
    sql.execute_one("ALTER TABLE db.n ADD COLUMN weight DOUBLE DEFAULT 1.5")
    rows = sql.execute_one(
        "SELECT id, weight FROM db.n ORDER BY id"
    ).df.collect()
    assert [(r.id, r.weight) for r in rows] == [(1, 1.5), (2, 1.5)]


def test_dropping_defaulted_column_clears_metadata(spark, v3_table):
    t = v3_table
    t.add_column("tier", "STRING", default="'standard'")
    t.drop_column("tier")
    assert "tier" not in t._meta.get("column_defaults", {})
    assert t.scan().columns == ["id", "v"]


def test_schema_at_resolves_historical_schemas(spark, v3_table):
    t = v3_table
    snap1 = t.current_snapshot().id
    t.add_column("tier", "STRING", default="'standard'")
    t.insert(
        spark.createDataFrame(
            [(3, "c", "gold")], "id BIGINT, v STRING, tier STRING"
        )
    )
    snap2 = t.current_snapshot().id
    t.rename_column("v", "label")
    assert t.schema_at(snap1) == "id BIGINT, v STRING"
    assert t.schema_at(snap2) == "id BIGINT, v STRING, tier STRING"
    assert t.schema_ddl == "id bigint, label string, tier string"
