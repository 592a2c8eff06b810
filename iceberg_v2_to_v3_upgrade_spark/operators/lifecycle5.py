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
