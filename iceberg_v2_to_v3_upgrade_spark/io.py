"""Fixture IO: load the driver-generated parquet tables.

Replaces the reference's S3FileIO + Glue warehouse wiring
(``internal/upgrade_table.py:67-69``) with direct parquet reads. On a real
deployment these would be catalog tables (``spark.read.table``); the loader
is the single seam where that swap happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.session import apply_runtime_confs

#: All driver-generated fixture tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes engine-incompatible types.

    ``events.ts`` has drifted across fixture generations: INT64
    TIMESTAMP(NANOS) footers read as ``bigint`` (nanosAsLong), and
    ``timestamp[us] isAdjustedToUTC=false`` footers read as TIMESTAMP_NTZ.
    Both are normalized to session-TZ TIMESTAMP here — the session TZ is
    pinned UTC (session.py RUNTIME_CONFS), so the wall-clock values are
    unchanged and match what DuckDB reads from the same file.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: float division would lose µs precision on
            # int64 nanosecond values (> 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ -> TIMESTAMP at UTC: same instant, but unlocks the
            # instant-typed functions (unix_micros etc.)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each fixture table as a temp view (analog of the DuckDB
    oracle's pre-registered views, ``__spark_entry__.py`` contract)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
