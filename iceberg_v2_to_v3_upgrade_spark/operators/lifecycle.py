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


_TIME_TRAVEL_ORACLE = """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part
    ORDER BY p_partkey
"""


@declare("i4_time_travel", oracle=_TIME_TRAVEL_ORACLE, tags=("dml", "lifecycle"))
def i4_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-pinned time travel (Iceberg VERSION AS OF): insert -> tag ->
    MoR DELETE + UPDATE -> read back *the tag*, which must see the
    pre-mutation state untouched.

    Snapshot reads are the flip side of the reference's upgrade arc —
    `expire_snapshots` (README.md:34-38) only matters because old
    snapshots are addressable; this query proves they are. The oracle is
    simply the unmutated fixture.

    Scale shape: time travel is metadata-only snapshot selection; the
    scan itself is the same pruned parquet read as any other (no extra
    shuffle, no history replay).
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="travel_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "travel_db",
        "part_mor",
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
        partition_by=["p_brand"],
    )
    t.insert(load_table(spark, sf_dir, "part"))
    t.create_tag("pre_mutation")
    t.delete_where("p_partkey IN (2, 4, 6)")
    t.update_set(
        {"p_retailprice": "round(p_retailprice * 1.1, 2)"}, "p_type = 'PROMO'"
    )
    return (
        t.scan(snapshot_id="pre_mutation")
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )


_CDC_ORACLE = """
    WITH deleted AS (
        SELECT p_partkey, p_retailprice, 'delete' AS change_type
        FROM part WHERE p_partkey IN (2, 4, 6)),
    upd_old AS (
        SELECT p_partkey, p_retailprice, 'delete' AS change_type
        FROM part
        WHERE p_type = 'PROMO' AND p_partkey NOT IN (2, 4, 6)),
    upd_new AS (
        SELECT p_partkey, round(p_retailprice * 1.1, 2) AS p_retailprice,
               'insert' AS change_type
        FROM part
        WHERE p_type = 'PROMO' AND p_partkey NOT IN (2, 4, 6))
    SELECT * FROM deleted
    UNION ALL SELECT * FROM upd_old
    UNION ALL SELECT * FROM upd_new
    ORDER BY change_type, p_partkey
"""


@declare("i5_incremental_cdc", oracle=_CDC_ORACLE, tags=("dml", "lifecycle", "cdc"))
def i5_incremental_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental/CDC read between snapshots (Iceberg changelog scan):
    after a MoR DELETE and a MoR UPDATE, `changes(from)` must emit
    exactly the deleted rows (old values, 'delete'), plus the updated
    rows as delete+insert pairs — and nothing for layout-only commits.

    This is the read-side contract that makes MoR mutations streamable
    downstream; the oracle reconstructs the same delta relationally.

    Scale shape: the delta is built from *new* files per commit (O(changed
    rows)); recovering deleted-row values broadcasts the delete ledger
    against the prior snapshot — the data side never shuffles.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="cdc_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "cdc_db",
        "part_mor",
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
        partition_by=["p_brand"],
    )
    base = t.insert(load_table(spark, sf_dir, "part")).id
    t.delete_where("p_partkey IN (2, 4, 6)")
    t.update_set(
        {"p_retailprice": "round(p_retailprice * 1.1, 2)"}, "p_type = 'PROMO'"
    )
    return (
        t.changes(base)
        .select(
            "p_partkey",
            "p_retailprice",
            F.col("_change_type").alias("change_type"),
        )
        .orderBy("change_type", "p_partkey")
    )


_WAP_ORACLE = """
    SELECT p_partkey, p_brand, p_size
    FROM part
    WHERE p_size <= 40
    ORDER BY p_partkey
"""


@declare("i6_wap_publish", oracle=_WAP_ORACLE, tags=("dml", "lifecycle", "wap"))
def i6_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish: stage a MoR DELETE on a branch ref, audit the
    branch while main stays untouched, then fast_forward to publish.
    The returned scan is the published main head.

    WAP is the production pattern the reference's snapshot machinery
    exists to serve (branch refs are Iceberg's recommended gate for
    exactly the kind of risky mutation the demo performs).

    Scale shape: branching and fast_forward are metadata-only pointer
    moves; the staged delete is the same O(deleted rows) ledger write as
    a main-branch delete.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="wap_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "wap_db",
        "part_mor",
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
        partition_by=["p_brand"],
    )
    t.insert(load_table(spark, sf_dir, "part"))
    main_before = t.current_snapshot().id
    t.create_branch("audit_branch")
    t.delete_where("p_size > 40", branch="audit_branch")
    # audit: main head is unmoved until publish
    assert t.current_snapshot().id == main_before
    audited = t.scan(snapshot_id="audit_branch").filter("p_size > 40").count()
    assert audited == 0, f"staged delete left {audited} rows on the branch"
    t.fast_forward("audit_branch")
    return (
        t.scan()
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")
    )


_GATEWAY_ORACLE = """
    SELECT n_name,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
"""


@declare("k3_sql_gateway", oracle=_GATEWAY_ORACLE, tags=("sql", "gateway"))
def k3_sql_gateway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K1 gateway end-to-end as a driver-checked query: catalog
    tables are populated through `LocalTable`, then a catalog-qualified
    join+aggregate SQL string (the shape the reference ships over SSH,
    upgrade_table.py:59-97) goes through `EngineSQL.execute_one` — name
    rewrite, permission gate, full Catalyst path — and the resulting
    DataFrame is hash-checked against DuckDB.

    Scale shape: the router adds zero execution machinery of its own
    (statement routing is driver-side string work; the plan is the same
    broadcast-dim join Catalyst builds for q-family queries).
    """
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="gateway_wh_")
    catalog = LocalCatalog(spark, warehouse)
    cust = catalog.create_table(
        "gw_db",
        "customer",
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING",
    )
    cust.insert(load_table(spark, sf_dir, "customer"))
    nat = catalog.create_table(
        "gw_db", "nation", "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    )
    nat.insert(load_table(spark, sf_dir, "nation"))
    result = EngineSQL(catalog).execute_one(
        """
        SELECT n_name,
               count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_acctbal
        FROM glue_catalog.gw_db.customer
        JOIN glue_catalog.gw_db.nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
        """
    )
    assert result.df is not None, result.message
    return result.df
