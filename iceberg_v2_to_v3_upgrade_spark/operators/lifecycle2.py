"""Declared lifecycle queries, part 2: MERGE INTO upsert and schema
evolution — the two row-level/table-level mutations the round-1 lifecycle
arc (operators/lifecycle.py) did not yet expose to the correctness gate.

MERGE is the third leg of Iceberg row-level DML next to the reference's
DELETE/UPDATE (``internal/create_demo_table.py:130,133``); schema evolution
is the metadata-only ALTER family that makes format-version upgrades safe
to run on live tables. Oracles express each post-state relationally
(SURVEY.md §7 M3 oracle strategy: MERGE ≡ CASE WHEN + UNION ALL of the
not-matched inserts; ADD COLUMN ≡ NULL literal for pre-existing rows).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_MERGE_ORACLE = """
    SELECT p_partkey, p_brand,
           CASE WHEN p_partkey <= 100 THEN round(p_retailprice * 2, 2)
                ELSE p_retailprice END AS p_retailprice
    FROM part
    UNION ALL
    SELECT p_partkey + 1000000 AS p_partkey, p_brand,
           round(p_retailprice + 1, 2) AS p_retailprice
    FROM part WHERE p_partkey <= 50
    ORDER BY p_partkey
"""


@declare("i7_merge_upsert", oracle=_MERGE_ORACLE, tags=("dml", "lifecycle"))
def i7_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert): matched keys take the source's doubled price,
    unmatched source keys (shifted by 1e6) are inserted — one commit.

    The MoR mechanics under the hood are the reference's own delete-file
    model: matched target rows get positional delete entries, their
    replacements plus the new rows land as one appended data dir
    (tables/table.py merge_into). Scale shape: a single equi-join on the
    merge key between target scan and source, broadcast when the source
    is small (the common upsert case) — everything else is appends.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="merge_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "merge_db",
        "part_upsert",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
        partition_by=["p_brand"],
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    t.insert(part)
    source = part.filter(F.col("p_partkey") <= 100).select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 2, 2).alias("p_retailprice"),
    ).unionByName(
        part.filter(F.col("p_partkey") <= 50).select(
            (F.col("p_partkey") + 1000000).alias("p_partkey"),
            "p_brand",
            F.round(F.col("p_retailprice") + 1, 2).alias("p_retailprice"),
        )
    )
    t.merge_into(
        source, on=["p_partkey"], when_matched="update", when_not_matched="insert"
    )
    return t.scan().select("p_partkey", "p_brand", "p_retailprice").orderBy(
        "p_partkey"
    )


_EVOLUTION_ORACLE = """
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(NULL AS VARCHAR) AS review_note
    FROM nation
    UNION ALL
    SELECT 900 AS n_nationkey, 'ATLANTIS' AS n_name, 0 AS n_regionkey,
           'added post-evolution' AS review_note
    ORDER BY n_nationkey
"""


@declare("i8_schema_evolution", oracle=_EVOLUTION_ORACLE, tags=("ddl", "lifecycle"))
def i8_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD COLUMN schema evolution: rows written before the ALTER read the
    new column as NULL (no file rewrite); rows written after carry values.

    This is Iceberg's metadata-only evolution contract — the property that
    makes in-place format upgrades (the reference's whole purpose) safe on
    tables whose schema has drifted since creation. The scan must stitch
    pre- and post-evolution data dirs into one read schema.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="evolve_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "evolve_db",
        "nation_v",
        "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
    )
    t.insert(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
    )
    t.add_column("review_note", "STRING")
    t.insert(
        spark.createDataFrame(
            [(900, "ATLANTIS", 0, "added post-evolution")],
            "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, "
            "review_note STRING",
        )
    )
    return (
        t.scan()
        .select("n_nationkey", "n_name", "n_regionkey", "review_note")
        .orderBy("n_nationkey")
    )
