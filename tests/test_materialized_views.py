"""Materialized views through the SQL gateway: CREATE MATERIALIZED VIEW
materializes into a first-class MoR table; REFRESH is INCREMENTAL for
single-table grouped SUM/COUNT aggregates (delta-merge over the base
table's CDC changelog — O(changed rows)) and a full recompute otherwise.
The invariant under test everywhere: after REFRESH, the MV equals the
defining SELECT evaluated from scratch.
"""

from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
from iceberg_v2_to_v3_upgrade_spark.tables.table import TableError


@pytest.fixture()
def engine(spark, tmp_path):
    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    e = EngineSQL(catalog)
    e.execute(
        "CREATE TABLE glue_catalog.db.sales "
        "(region STRING, amount BIGINT) USING iceberg;"
        "INSERT INTO glue_catalog.db.sales VALUES "
        "('emea', 10), ('emea', 20), ('apac', 5), ('amer', 7)"
    )
    return e


def _mv_state(engine):
    return {
        (r.region): (r.total, r.cnt)
        for r in engine.execute_one(
            "SELECT region, total, cnt FROM db.mv"
        ).df.collect()
    }


MV_SQL = (
    "CREATE MATERIALIZED VIEW db.mv AS "
    "SELECT region, SUM(amount) AS total, COUNT(*) AS cnt "
    "FROM db.sales GROUP BY region"
)


def test_mv_create_and_incremental_refresh(engine):
    engine.execute_one(MV_SQL)
    assert _mv_state(engine) == {
        "emea": (30, 2), "apac": (5, 1), "amer": (7, 1)
    }
    # base mutations: new group, growth of an existing group, and a
    # group emptied out entirely
    engine.execute_one(
        "INSERT INTO glue_catalog.db.sales VALUES ('emea', 100), ('latam', 3)"
    )
    engine.execute_one("DELETE FROM db.sales WHERE region = 'apac'")
    res = engine.execute_one("REFRESH MATERIALIZED VIEW db.mv")
    assert "(incremental)" in res.message
    assert _mv_state(engine) == {
        "emea": (130, 3), "amer": (7, 1), "latam": (3, 1)
    }


def test_mv_refresh_noop_when_base_unchanged(engine):
    engine.execute_one(MV_SQL)
    res = engine.execute_one("REFRESH MATERIALIZED VIEW db.mv")
    assert "no base changes" in res.message
    assert _mv_state(engine) == {
        "emea": (30, 2), "apac": (5, 1), "amer": (7, 1)
    }


def test_mv_update_flows_through_incremental_refresh(engine):
    engine.execute_one(MV_SQL)
    engine.execute_one(
        "UPDATE db.sales SET amount = amount + 1 WHERE region = 'emea'"
    )
    res = engine.execute_one("REFRESH MATERIALIZED VIEW db.mv")
    assert "(incremental)" in res.message
    # update = delete+insert in the changelog: count delta 0, sum delta +2
    assert _mv_state(engine)["emea"] == (32, 2)


def test_mv_full_refresh_fallback_without_count(engine):
    # no COUNT(*) column -> a fully-deleted group could not be detected;
    # the refresh must fall back to full recompute (and still be right)
    engine.execute_one(
        "CREATE MATERIALIZED VIEW db.mv2 AS "
        "SELECT region, SUM(amount) AS total FROM db.sales GROUP BY region"
    )
    engine.execute_one("DELETE FROM db.sales WHERE region = 'apac'")
    res = engine.execute_one("REFRESH MATERIALIZED VIEW db.mv2")
    assert "(full)" in res.message
    rows = {
        r.region: r.total
        for r in engine.execute_one(
            "SELECT region, total FROM db.mv2"
        ).df.collect()
    }
    assert rows == {"emea": 30, "amer": 7}


def test_mv_full_refresh_for_join_selects(engine):
    engine.execute(
        "CREATE TABLE glue_catalog.db.dim (region STRING, zone STRING) "
        "USING iceberg;"
        "INSERT INTO glue_catalog.db.dim VALUES ('emea', 'east'), "
        "('apac', 'east'), ('amer', 'west')"
    )
    engine.execute_one(
        "CREATE MATERIALIZED VIEW db.mv3 AS "
        "SELECT d.zone AS zone, SUM(s.amount) AS total, COUNT(*) AS cnt "
        "FROM db.sales s JOIN db.dim d ON s.region = d.region "
        "GROUP BY d.zone"
    )
    engine.execute_one("INSERT INTO glue_catalog.db.sales VALUES ('apac', 50)")
    res = engine.execute_one("REFRESH MATERIALIZED VIEW db.mv3")
    assert "(full)" in res.message  # join shape -> not self-maintainable
    rows = {
        r.zone: (r.total, r.cnt)
        for r in engine.execute_one(
            "SELECT zone, total, cnt FROM db.mv3"
        ).df.collect()
    }
    assert rows == {"east": (85, 4), "west": (7, 1)}


def test_refresh_of_plain_table_refused(engine):
    with pytest.raises(TableError, match="not a materialized view"):
        engine.execute_one("REFRESH MATERIALIZED VIEW db.sales")


def test_mv_refresh_history_is_time_travelable(engine):
    engine.execute_one(MV_SQL)
    t = engine.catalog.load_table("db", "mv")
    snap_before = t.current_snapshot().id
    engine.execute_one("INSERT INTO glue_catalog.db.sales VALUES ('emea', 100)")
    engine.execute_one("REFRESH MATERIALIZED VIEW db.mv")
    was = engine.execute_one(
        f"SELECT total FROM db.mv VERSION AS OF {snap_before} "
        "WHERE region = 'emea'"
    ).df.collect()
    assert was[0].total == 30  # pre-refresh MV state still readable


def test_mv_incremental_refresh_sees_insert_overwrite(engine):
    """INSERT OVERWRITE commits op 'overwrite'; the CDC changelog must
    surface it (full-replace: deletes of all prev-visible rows + inserts
    of the new data), so the incremental MV refresh neither misses it nor
    silently desyncs (round-4 ADVICE high finding)."""
    engine.execute_one(MV_SQL)
    engine.execute_one(
        "INSERT OVERWRITE glue_catalog.db.sales "
        "SELECT * FROM (VALUES ('emea', 9), ('nord', 4)) v(region, amount)"
    )
    res = engine.execute_one("REFRESH MATERIALIZED VIEW db.mv")
    assert "(incremental)" in res.message
    # MV must equal the defining SELECT from scratch after the overwrite
    assert _mv_state(engine) == {"emea": (9, 1), "nord": (4, 1)}
    # and a SECOND refresh from the advanced watermark stays consistent
    engine.execute_one("INSERT INTO glue_catalog.db.sales VALUES ('emea', 1)")
    res = engine.execute_one("REFRESH MATERIALIZED VIEW db.mv")
    assert "(incremental)" in res.message
    assert _mv_state(engine) == {"emea": (10, 2), "nord": (4, 1)}


def test_mv_refresh_denied_for_filtered_or_masked_principal(spark, tmp_path):
    """REFRESH/CREATE MATERIALIZED VIEW must not launder hidden rows or
    masked columns past the row-filter/column-mask read boundary: the
    incremental path reads base.changes() raw (round-4 ADVICE high
    finding). Deny for the MV and for every base table of the SELECT."""
    from iceberg_v2_to_v3_upgrade_spark.tables.permissions import (
        PermissionDenied,
    )

    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    root = EngineSQL(catalog)
    root.execute(
        "CREATE TABLE glue_catalog.db.sales "
        "(region STRING, amount BIGINT) USING iceberg;"
        "INSERT INTO glue_catalog.db.sales VALUES ('emea', 10), ('apac', 5)"
    )
    root.execute_one(MV_SQL)
    catalog.permissions.set_row_filter(
        "analyst", "db", "sales", "region = 'emea'"
    )
    analyst = EngineSQL(catalog, principal="analyst")
    with pytest.raises(PermissionDenied, match="row-filtered"):
        analyst.execute_one("REFRESH MATERIALIZED VIEW db.mv")
    with pytest.raises(PermissionDenied, match="row-filtered"):
        analyst.execute_one(
            "CREATE MATERIALIZED VIEW db.mv9 AS SELECT region, "
            "SUM(amount) AS total, COUNT(*) AS cnt "
            "FROM db.sales GROUP BY region"
        )
    catalog.permissions.set_column_mask("masked", "db", "sales", ["amount"])
    masked = EngineSQL(catalog, principal="masked")
    with pytest.raises(PermissionDenied, match="column-masked"):
        masked.execute_one("REFRESH MATERIALIZED VIEW db.mv")
    # the unrestricted root session still refreshes fine
    root.execute_one("REFRESH MATERIALIZED VIEW db.mv")
