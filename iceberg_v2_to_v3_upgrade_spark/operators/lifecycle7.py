"""Declared queries, round 4 lifecycle batch: CDC visibility of INSERT
OVERWRITE.

Round-3 review found that ``changes()`` skipped op 'overwrite' entirely —
a restatement was invisible to every CDC consumer and silently desynced
incremental MV refresh. The fix (table.py ``changes``) emits the replaced
partition's prev-visible rows as deletes plus the new data as inserts;
``i32`` is the driver-facing evidence for exactly that path.

Reference anchor: the reference's incremental story is snapshot-based
(README.md:34-38 expire/rewrite maintenance over snapshot history); a
changelog that misses a whole operation class breaks that story, so this
arc belongs with the i-series lifecycle queries.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- i32


_OVERWRITE_CDC_ORACLE = """
    WITH olds AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS price,
               'delete' AS change_type
        FROM orders
        WHERE o_orderkey <= 2000 AND o_orderpriority = '1-URGENT'
    ),
    news AS (
        SELECT o_orderkey + 5000000 AS o_orderkey,
               round(o_totalprice * 10, 2) AS price,
               'insert' AS change_type
        FROM orders
        WHERE o_orderkey <= 300 AND o_orderpriority = '1-URGENT'
    )
    SELECT * FROM olds
    UNION ALL SELECT * FROM news
    ORDER BY change_type, o_orderkey
"""


@declare(
    "i32_overwrite_cdc",
    oracle=_OVERWRITE_CDC_ORACLE,
    tags=("dml", "lifecycle", "cdc"),
)
def i32_overwrite_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC visibility of dynamic partition overwrite: after INSERT
    OVERWRITE replaces the '1-URGENT' partition, ``changes(base)`` must
    emit exactly that partition's prior rows as deletes (old values) and
    the restated rows as inserts — the other partitions contribute
    NOTHING to the changelog, because only the touched partition's delete
    ledger is new.

    Scale shape: the delta is O(replaced partition), not O(table) — the
    delete side broadcasts the overwrite's row-id ledger against the
    prior snapshot scan, and untouched partitions' dirs are carried
    forward unchanged so they never re-enter the changelog.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="owcdc_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "owcdc_db",
        "orders_ow",
        "o_orderkey BIGINT, o_orderpriority STRING, price DOUBLE",
        partition_by=["o_orderpriority"],
    )
    orders = load_table(spark, sf_dir, "orders")
    base = t.insert(
        orders.filter(F.col("o_orderkey") <= 2000).select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price"),
        )
    ).id
    t.insert_overwrite(
        orders.filter(
            (F.col("o_orderkey") <= 300)
            & (F.col("o_orderpriority") == "1-URGENT")
        ).select(
            (F.col("o_orderkey") + 5000000).alias("o_orderkey"),
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 10, 2).alias("price"),
        )
    )
    return (
        t.changes(base)
        .select(
            "o_orderkey",
            "price",
            F.col("_change_type").alias("change_type"),
        )
        .orderBy("change_type", "o_orderkey")
    )


# --------------------------------------------------------------- i33


_CHANGELOG_VIEW_ORACLE = """
    WITH initial AS (  -- default from = CREATE snapshot: the initial
                       -- load is inside the range, emitted as inserts
        SELECT o_orderkey, round(o_totalprice, 2) AS price,
               'insert' AS change_type
        FROM orders WHERE o_orderkey <= 2000
    ),
    dels AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS price,
               'delete' AS change_type
        FROM orders WHERE o_orderkey <= 2000 AND o_orderkey % 10 = 3
    ),
    upd_old AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS price,
               'delete' AS change_type
        FROM orders
        WHERE o_orderkey <= 2000 AND o_orderkey % 10 <> 3
          AND o_orderpriority = '5-LOW'
    ),
    upd_new AS (
        SELECT o_orderkey, round(round(o_totalprice, 2) * 2, 2) AS price,
               'insert' AS change_type
        FROM orders
        WHERE o_orderkey <= 2000 AND o_orderkey % 10 <> 3
          AND o_orderpriority = '5-LOW'
    ),
    ch AS (
        SELECT * FROM initial
        UNION ALL SELECT * FROM dels
        UNION ALL SELECT * FROM upd_old
        UNION ALL SELECT * FROM upd_new
    )
    SELECT change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(price), 2) AS total_price
    FROM ch GROUP BY change_type ORDER BY change_type
"""


@declare(
    "i33_changelog_view",
    oracle=_CHANGELOG_VIEW_ORACLE,
    tags=("dml", "lifecycle", "cdc"),
)
def i33_changelog_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL system.create_changelog_view — Iceberg's changelog procedure
    through the SQL gateway: after a MoR DELETE and UPDATE, the
    registered view exposes the CDC rows to plain SQL, and the declared
    result aggregates it per change type (the shape a downstream audit
    job consumes). The arc is 100% SQL-gateway statements — no direct
    table-API calls — proving the procedure surface end to end.

    Scale shape: the changelog is built from new files per commit
    (O(changed rows)); the per-type rollup is a metadata-sized frame."""
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="clv_wh_")
    catalog = LocalCatalog(spark, warehouse)
    engine = EngineSQL(catalog)
    t = catalog.create_table(
        "clv_db",
        "orders_clv",
        "o_orderkey BIGINT, o_orderpriority STRING, price DOUBLE",
    )
    orders = load_table(spark, sf_dir, "orders")
    t.insert(
        orders.filter(F.col("o_orderkey") <= 2000).select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("price"),
        )
    )
    engine.execute(
        "DELETE FROM clv_db.orders_clv WHERE o_orderkey % 10 = 3;"
        "UPDATE clv_db.orders_clv SET price = round(price * 2, 2) "
        "WHERE o_orderpriority = '5-LOW';"
        "CALL system.create_changelog_view(table => 'clv_db.orders_clv', "
        "view => 'clv_changes')"
    )
    return engine.execute_one(
        "SELECT _change_type AS change_type, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "round(sum(price), 2) AS total_price "
        "FROM clv_changes GROUP BY _change_type ORDER BY change_type"
    ).df


# --------------------------------------------------------------- i34


_SNAP_MGMT_ORACLE = """
    WITH final AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders WHERE o_orderkey <= 1000
        UNION ALL
        SELECT o_orderkey, round(o_totalprice, 2)
        FROM orders WHERE o_orderkey BETWEEN 2001 AND 2500
    )
    SELECT CAST(o_orderkey // 1000 AS BIGINT) AS key_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(price), 2) AS total_price
    FROM final GROUP BY key_bucket ORDER BY key_bucket
"""


@declare(
    "i34_snapshot_management",
    oracle=_SNAP_MGMT_ORACLE,
    tags=("dml", "lifecycle"),
)
def i34_snapshot_management(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-management procedure arc through the SQL gateway:
    rollback_to_timestamp (latest snapshot at-or-before an instant),
    set_current_snapshot (moving FORWARD — undoing the rollback), a
    second rollback, then cherrypick_snapshot publishing an append
    staged on a WAP branch out of order. Final visible state = the
    first load plus the cherry-picked batch; the second load is rolled
    away and the oracle never sees it.

    Scale shape: every procedure is a metadata-only commit (dir-list
    manipulation); cherry-pick's delta resolution compares dir lists,
    never reads data files."""
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="snapm_wh_")
    catalog = LocalCatalog(spark, warehouse)
    engine = EngineSQL(catalog)
    t = catalog.create_table(
        "snapm_db", "orders_sm", "o_orderkey BIGINT, price DOUBLE"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    first = t.insert(orders.filter(F.col("o_orderkey") <= 1000))
    second = t.insert(
        orders.filter(F.col("o_orderkey").between(1001, 2000))
    )
    # roll back to the first load, prove forward motion, roll back again
    engine.execute_one(
        "CALL system.rollback_to_timestamp(table => 'snapm_db.orders_sm',"
        f" timestamp => '{first.timestamp}')"
    )
    engine.execute_one(
        "CALL system.set_current_snapshot(table => 'snapm_db.orders_sm',"
        f" snapshot_id => {second.id})"
    )
    engine.execute_one(
        "CALL system.rollback_to_timestamp(table => 'snapm_db.orders_sm',"
        f" timestamp => '{first.timestamp}')"
    )
    # WAP: stage a batch on a branch, publish ONLY it via cherry-pick
    t = catalog.load_table("snapm_db", "orders_sm")
    t.create_branch("wap")
    staged = t.insert(
        orders.filter(F.col("o_orderkey").between(2001, 2500)),
        branch="wap",
    )
    engine.execute_one(
        "CALL system.cherrypick_snapshot(table => 'snapm_db.orders_sm',"
        f" snapshot_id => {staged.id})"
    )
    return engine.execute_one(
        "SELECT CAST(o_orderkey DIV 1000 AS BIGINT) AS key_bucket, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "round(sum(price), 2) AS total_price "
        "FROM snapm_db.orders_sm GROUP BY o_orderkey DIV 1000 "
        "ORDER BY key_bucket"
    ).df


# --------------------------------------------------------------- i35


_POSITION_DELETES_ORACLE = """
    WITH base AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey <= 1000
    ),
    d3 AS (SELECT count(*) AS n FROM base WHERE o_orderkey % 3 = 0),
    d5 AS (
        SELECT count(*) AS n FROM base
        WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0
    )
    SELECT CAST(2 AS BIGINT) AS n_delete_files,
           CAST(d3.n + d5.n AS BIGINT) AS n_delete_entries,
           CAST((SELECT count(*) FROM base) - d3.n - d5.n AS BIGINT)
               AS live_rows
    FROM d3, d5
"""


@declare(
    "i35_position_deletes",
    oracle=_POSITION_DELETES_ORACLE,
    tags=("dml", "lifecycle", "metadata"),
)
def i35_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`table.position_deletes` metadata read: after two MoR DELETEs,
    the delete-side metadata alone must account for every masked row —
    2 delete files, entry count equal to the rows each DELETE saw as
    visible (the second delete never re-deletes the first's rows), and
    live_rows + entries = the original insert. This is the input to
    delete-file-threshold compaction decisions (i16): the metadata read
    NEVER touches a data file.

    Scale: the table build is O(inserted rows); the metadata read is
    O(delete entries) — at 100 TB you read delete ledgers, not data."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="posdel_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "pd_db", "pos_del", "o_orderkey BIGINT, o_totalprice DOUBLE"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t.insert(orders.filter(F.col("o_orderkey") <= 1000))
    t.delete_where("o_orderkey % 3 = 0")
    t.delete_where("o_orderkey % 5 = 0")
    pd = t.position_deletes()
    return (
        pd.agg(
            F.countDistinct("delete_dir").alias("n_delete_files"),
            F.count(F.lit(1)).alias("n_delete_entries"),
        )
        .crossJoin(
            t.scan().agg(F.count(F.lit(1)).alias("live_rows"))
        )
        .select("n_delete_files", "n_delete_entries", "live_rows")
    )
