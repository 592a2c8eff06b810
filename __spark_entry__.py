"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``iceberg_v2_to_v3_upgrade_spark.registry``; this file
just re-exports the registry in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's own arc as one relational query: scan
    the demo-table stand-in (`part`), apply MoR DELETE (anti-join on the
    IN-list) and MoR UPDATE (CASE WHEN amount*1.1) semantics, then the
    final `SELECT * ORDER BY id` display (reference
    internal/create_demo_table.py:117-137).
    """
    from pyspark.sql import functions as F

    from iceberg_v2_to_v3_upgrade_spark.io import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part")
    deletes = spark.createDataFrame([(2,), (4,), (6,)], "p_partkey bigint")
    return (
        part.join(F.broadcast(deletes), "p_partkey", "left_anti")
        .withColumn(
            "p_retailprice",
            F.round(
                F.when(
                    F.col("p_type") == "PROMO", F.col("p_retailprice") * 1.1
                ).otherwise(F.col("p_retailprice")),
                2,
            ),
        )
        .orderBy("p_partkey")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all_operators().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible query; hash-based / approximate
    operators (minhash, simhash, LSH-ANN, HLL) are rows-only by design."""
    return {
        name: q.oracle
        for name, q in load_all_operators().items()
        if q.oracle is not None
    }
