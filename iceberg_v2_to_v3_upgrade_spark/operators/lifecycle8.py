"""Declared queries, round 5 lifecycle batch: the metadata-log trail,
whole-history file accounting, and the zero-copy snapshot procedure.

i36 reads `metadata_log_entries` — the versioned metadata trail
_write_meta leaves (Iceberg writes v{N}.metadata.json per commit and
retains `write.metadata.previous-versions-max` of them) — and proves
each retained version still time-travels to the right visible state.
i37 reads `all_data_files` — every dir ANY retained snapshot references,
live or not — the accounting expire/orphan-GC tooling plans against.
i38 exercises CALL system.snapshot: a zero-copy table referencing the
source's current files, which then takes DML independently while the
source stays untouched (Iceberg's snapshot procedure; the adopted-file
sequence remap is the same scoping machinery as cherry-pick).

Reference anchor: the reference's maintenance story is metadata-file +
snapshot manipulation over S3 (README.md:34-38, upgrade_table.py
metadata_location handling); these are the metadata read/maintenance
surfaces of that story.

Scale shape (100 TB): all three are METADATA-only paths — i36/i37 read
O(retained versions) small JSON files / O(snapshots x dirs) list
entries, never a data file; i38's adopt commit copies dir REFERENCES,
so snapshotting a petabyte table costs the same as snapshotting a
megabyte one. The per-version counts in i36 are real scans, each
pruned to the one snapshot's dir list.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- i36


_METADATA_LOG_ORACLE = """
    WITH a AS (SELECT count(*) AS n FROM orders WHERE o_orderkey <= 500),
         b AS (SELECT count(*) AS n FROM orders WHERE o_orderkey <= 1000),
         c AS (SELECT count(*) AS n FROM orders
               WHERE o_orderkey <= 1000 AND o_orderkey % 10 = 3)
    SELECT CAST(metadata_version AS BIGINT) AS metadata_version,
           CAST(latest_snapshot_id AS BIGINT) AS latest_snapshot_id,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM (
        SELECT 2 AS metadata_version, 3 AS latest_snapshot_id,
               (SELECT n FROM b) AS n_rows
        UNION ALL
        SELECT 3, 4, (SELECT n FROM b) - (SELECT n FROM c)
        UNION ALL
        SELECT 4, 5, (SELECT n FROM a)
        UNION ALL
        SELECT 5, 5, (SELECT n FROM a)
    )
    ORDER BY metadata_version
"""


@declare(
    "i36_metadata_log_entries",
    oracle=_METADATA_LOG_ORACLE,
    tags=("dml", "lifecycle", "metadata"),
)
def i36_metadata_log_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-log arc: two loads, a delete, a rollback, and a
    property change against a table retaining 3 PREVIOUS metadata
    versions plus the current one (`write.metadata.previous-versions-max`
    counts previous versions, Iceberg semantics — the oldest version,
    the first load's, is pruned). Each retained version is
    joined with the row count visible AT ITS pinned snapshot, proving
    the trail supports metadata-file time travel: v2 sees both loads,
    v3 the delete, v4/v5 the rolled-back first load (the property
    change writes metadata without committing a snapshot)."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="mlog_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "mld",
        "orders_ml",
        "o_orderkey BIGINT, price DOUBLE",
        properties={"write.metadata.previous-versions-max": "3"},
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    first = t.insert(orders.filter(F.col("o_orderkey") <= 500))
    t.insert(orders.filter(F.col("o_orderkey").between(501, 1000)))
    t.delete_where("o_orderkey % 10 = 3")
    t.rollback_to_snapshot(first.id)
    t.set_properties({"comment": "audited"})
    rows = [
        (
            int(r.metadata_version),
            int(r.latest_snapshot_id),
            t.scan(snapshot_id=r.latest_snapshot_id).count(),
        )
        for r in t.metadata_log_entries().collect()
    ]
    return spark.createDataFrame(
        rows,
        "metadata_version long, latest_snapshot_id long, n_rows long",
    ).orderBy("metadata_version")


# --------------------------------------------------------------- i37


_ALL_FILES_ORACLE = """
    SELECT * FROM (VALUES
        ('data',       FALSE, CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT)),
        ('data',       TRUE,  CAST(1 AS BIGINT), CAST(6 AS BIGINT), CAST(6 AS BIGINT)),
        ('deletes',    FALSE, CAST(1 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT)),
        ('eq-deletes', FALSE, CAST(1 AS BIGINT), CAST(5 AS BIGINT), CAST(5 AS BIGINT))
    ) AS t(content, is_live, n_dirs, min_first_snapshot, max_first_snapshot)
    ORDER BY content, is_live
"""


@declare(
    "i37_all_data_files",
    oracle=_ALL_FILES_ORACLE,
    tags=("dml", "lifecycle", "metadata"),
)
def i37_all_data_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-history file accounting: two loads (snaps 2-3), a
    positional delete (4), an equality delete (5), then compaction (6).
    `all_data_files` must show the compacted dir as the ONLY live data,
    both original loads plus both delete dirs as historical-but-retained
    — exactly what expire_snapshots would reclaim and what time travel
    still needs. Dir-level metadata walk; no data IO."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="adf_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "adf", "orders_af", "o_orderkey BIGINT, price DOUBLE"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    t.insert(orders.filter(F.col("o_orderkey") <= 1000))
    t.insert(orders.filter(F.col("o_orderkey").between(1001, 2000)))
    t.delete_where("o_orderkey % 10 = 7")
    t.delete_by_keys(
        orders.filter(
            (F.col("o_orderkey") <= 2000) & (F.col("o_orderkey") % 10 == 9)
        ).select("o_orderkey"),
        ["o_orderkey"],
    )
    t.rewrite_data_files()
    return (
        t.all_data_files()
        .groupBy("content", "is_live")
        .agg(
            F.count(F.lit(1)).alias("n_dirs"),
            F.min("first_snapshot_id").cast("long").alias(
                "min_first_snapshot"
            ),
            F.max("first_snapshot_id").cast("long").alias(
                "max_first_snapshot"
            ),
        )
        .orderBy("content", "is_live")
    )


# --------------------------------------------------------------- i38


_SNAPSHOT_TABLE_ORACLE = """
    WITH src AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_orderkey <= 2000 AND o_orderkey % 7 <> 0
    ),
    snap AS (
        SELECT o_orderkey, price FROM src WHERE o_orderkey % 10 >= 3
        UNION ALL
        SELECT o_orderkey, round(o_totalprice * 10, 2) AS price
        FROM orders WHERE o_orderkey BETWEEN 2001 AND 2200
    )
    SELECT side, CAST(n_rows AS BIGINT) AS n_rows, total_price FROM (
        SELECT 'snap' AS side, count(*) AS n_rows,
               round(sum(price), 2) AS total_price
        FROM snap
        UNION ALL
        SELECT 'src', count(*), round(sum(price), 2) FROM src
    )
    ORDER BY side
"""


@declare(
    "i38_snapshot_table",
    oracle=_SNAPSHOT_TABLE_ORACLE,
    tags=("dml", "lifecycle"),
)
def i38_snapshot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL system.snapshot arc: load + equality-delete a source table,
    snapshot it zero-copy, then DELETE and INSERT on the snapshot only.
    The oracle checks both sides: the snapshot diverged (its deletes and
    appends applied — including deletes of ADOPTED rows, which exercises
    the seq remap), the source is byte-identical to pre-snapshot state.
    """
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="snapt_wh_")
    catalog = LocalCatalog(spark, warehouse)
    engine = EngineSQL(catalog)
    src = catalog.create_table(
        "snapd", "orders_src", "o_orderkey BIGINT, price DOUBLE"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    src.insert(orders.filter(F.col("o_orderkey") <= 2000))
    src.delete_by_keys(
        orders.filter(
            (F.col("o_orderkey") <= 2000) & (F.col("o_orderkey") % 7 == 0)
        ).select("o_orderkey"),
        ["o_orderkey"],
    )
    engine.execute_one(
        "CALL system.snapshot(source_table => 'snapd.orders_src', "
        "table => 'snapd2.orders_snap')"
    )
    snap = catalog.load_table("snapd2", "orders_snap")
    snap.delete_where("o_orderkey % 10 < 3")
    snap.insert(
        orders.filter(F.col("o_orderkey").between(2001, 2200)).withColumn(
            "price", F.round(F.col("price") * 10, 2)
        )
    )
    return engine.execute_one(
        "SELECT 'snap' AS side, CAST(count(*) AS BIGINT) AS n_rows, "
        "round(sum(price), 2) AS total_price FROM snapd2.orders_snap "
        "UNION ALL "
        "SELECT 'src', CAST(count(*) AS BIGINT), round(sum(price), 2) "
        "FROM snapd.orders_src ORDER BY side"
    ).df


# --------------------------------------------------------------- i39


_META_TRAVEL_ORACLE = """
    SELECT side, CAST(n_rows AS BIGINT) AS n_rows, total_val,
           CAST(n_snaps AS BIGINT) AS n_snaps
    FROM (
        SELECT 'head' AS side, count(*) AS n_rows,
               round(sum(round(o_totalprice, 2)), 2) AS total_val,
               4 AS n_snaps
        FROM orders
        WHERE o_orderkey <= 2000 AND o_orderkey % 10 <> 0
        UNION ALL
        SELECT 'pinned', count(*), round(sum(round(o_totalprice, 2)), 2), 2
        FROM orders WHERE o_orderkey <= 1000
    )
    ORDER BY side
"""


@declare(
    "i39_metadata_version_travel",
    oracle=_META_TRAVEL_ORACLE,
    tags=("dml", "lifecycle", "metadata"),
)
def i39_metadata_version_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILE time travel — stronger than snapshot time travel:
    instantiating the table at a retained vN.metadata.json restores the
    whole table state as of that write, including SCHEMA interpretation
    and snapshot history. The arc pins the version after the first load,
    then renames the value column, loads more, and deletes; the pinned
    handle must still read under the ORIGINAL column name and see only
    the 2 then-existing snapshots, while the head sees the renamed
    column, 4 snapshots, and the post-delete state. Snapshot-id time
    travel cannot do this: it replays old FILES under the CURRENT
    metadata (one schema, one history).

    Scale: opening a historical version is one small JSON read; the
    scans that follow prune to that version's dir lists as usual."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="mtv_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "mtv", "orders_mv", "o_orderkey BIGINT, price DOUBLE"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    t.insert(orders.filter(F.col("o_orderkey") <= 1000))
    pinned_version = int(t._meta["last_metadata_version"])
    t.rename_column("price", "amount")
    t.insert(
        orders.filter(F.col("o_orderkey").between(1001, 2000)).withColumnRenamed(
            "price", "amount"
        )
    )
    t.delete_where("o_orderkey % 10 = 0")
    pinned = t.at_metadata_version(pinned_version)
    head_df = (
        t.scan()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum("amount"), 2).alias("total_val"),
        )
        .select(
            F.lit("head").alias("side"),
            "n_rows",
            "total_val",
            F.lit(len(t.snapshots())).cast("long").alias("n_snaps"),
        )
    )
    pinned_df = (
        pinned.scan()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum("price"), 2).alias("total_val"),  # OLD name
        )
        .select(
            F.lit("pinned").alias("side"),
            "n_rows",
            "total_val",
            F.lit(len(pinned.snapshots())).cast("long").alias("n_snaps"),
        )
    )
    return head_df.unionByName(pinned_df).orderBy("side")
