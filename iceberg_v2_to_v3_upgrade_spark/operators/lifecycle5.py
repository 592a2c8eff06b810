"""Declared queries, round 3 batch C: partition evolution.

Reference parity: the reference's whole program is metadata-only table
upgrades (`internal/upgrade_table.py` ALTER ... format-version); partition
evolution is the OTHER headline metadata-only Iceberg capability — the
spec changes, no data file is rewritten, and old files keep their layout.
This module proves the full arc: identity-partitioned writes → spec change
to a bucket transform → mixed-layout scans, DML, and pruning that stays
correct across both layouts.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- i23


_EVOLUTION_ORACLE = """
    SELECT p_partkey % 2 AS parity,
           count(*) AS n_rows,
           round(sum(p_retailprice), 2) AS sum_price
    FROM part
    WHERE NOT (p_partkey % 10 = 7)
    GROUP BY 1
    ORDER BY parity
"""


@declare("i23_partition_evolution", oracle=_EVOLUTION_ORACLE, tags=("dml", "lifecycle"))
def i23_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition evolution (Iceberg V2 metadata-only spec change).

    Arc: create a table identity-partitioned by ``p_brand``; insert the
    even-keyed half of ``part``; evolve the spec to ``bucket(4,
    p_partkey)`` (NO data rewritten — the old dir keeps its
    ``p_brand=...`` layout); insert the odd-keyed half under the new
    bucket layout; DELETE across both layouts (MoR positional deletes
    don't care which spec a row was written under); scan and aggregate.
    The oracle states the expected surviving rows directly from the
    fixture — if either layout dropped or duplicated rows during the
    spec change, the parity-level counts and price sums would diverge.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="evo_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "evo_db",
        "part_evo",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
        partition_by=["p_brand"],
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    t.insert(part.filter("p_partkey % 2 = 0"))
    t.evolve_partition_spec(["bucket(4, p_partkey)"])
    t.insert(part.filter("p_partkey % 2 = 1"))
    t.delete_where("p_partkey % 10 = 7")
    return (
        t.scan()
        .groupBy((F.col("p_partkey") % 2).alias("parity"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
        )
        .orderBy("parity")
    )


# --------------------------------------------------------------- i24


_DIFF_ORACLE = """
    SELECT 'added' AS change_type,
           (SELECT count(*) FROM part WHERE p_partkey <= 10) AS n_rows
    UNION ALL
    SELECT 'deleted', count(*) FROM part WHERE p_partkey % 97 = 0
    UNION ALL
    SELECT 'modified', count(*) FROM part
    WHERE p_brand = 'Brand#11' AND NOT p_partkey % 97 = 0
    UNION ALL
    SELECT 'unchanged', count(*) FROM part
    WHERE p_brand <> 'Brand#11' AND NOT p_partkey % 97 = 0
    ORDER BY change_type
"""


@declare("i24_snapshot_diff", oracle=_DIFF_ORACLE, tags=("dml", "lifecycle"))
def i24_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two table states by key and classify
    every row added / deleted / modified / unchanged — the table-diff a
    data-ops team runs to audit a backfill before publishing it. Unlike
    i5's CDC changelog (which replays the COMMITS), this compares the
    STATES: one full outer join on the key between two time-travel scans
    of the same table, value comparison on the payload columns. Both
    sides come from the same MoR table (time travel vs current), so the
    diff also exercises mixed delete-file reads. At 100 TB the join is
    key-partitioned on both sides with identical partitioning — a
    co-located shuffle, and AQE handles the skew."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="diff_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "diff_db",
        "part_diff",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    t.insert(part)
    base_snap = t.current_snapshot().id
    t.update_set(
        {"p_retailprice": "p_retailprice * 1.1"}, "p_brand = 'Brand#11'"
    )
    t.delete_where("p_partkey % 97 = 0")
    t.insert(
        part.filter("p_partkey <= 10").select(
            (F.col("p_partkey") + 1000000).alias("p_partkey"),
            "p_brand",
            "p_retailprice",
        )
    )
    a = t.scan(snapshot_id=base_snap).alias("a")
    b = t.scan().alias("b")
    joined = a.join(
        b, F.col("a.p_partkey") == F.col("b.p_partkey"), "full_outer"
    )
    change = (
        F.when(F.col("a.p_partkey").isNull(), "added")
        .when(F.col("b.p_partkey").isNull(), "deleted")
        .when(
            (F.col("a.p_brand") != F.col("b.p_brand"))
            | (F.col("a.p_retailprice") != F.col("b.p_retailprice")),
            "modified",
        )
        .otherwise("unchanged")
    )
    return (
        joined.groupBy(change.alias("change_type"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("change_type")
    )
