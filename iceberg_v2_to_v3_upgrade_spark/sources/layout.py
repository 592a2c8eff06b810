"""Landing-zone layout optimization.

The driver fixtures (and most real ingest output) are single-row-group
parquet files — one Spark task per scan no matter how many executors exist.
At 100 TB this is THE throughput killer: compaction/re-layout into
well-sized, optionally sorted multi-file tables is standard table
maintenance (the batch analog of ``LocalTable.rewrite_data_files``).

``optimize_layout`` rewrites a directory of raw tables into N-file layout;
readers then get N-way scan parallelism and, with ``sort_by``, parquet
min/max pruning on range predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from iceberg_v2_to_v3_upgrade_spark.io import TABLES, load_table


def optimize_layout(
    spark: SparkSession,
    sf_dir: str,
    dest_dir: str,
    files_per_table: int | None = None,
    sort_by: dict[str, list[str]] | None = None,
    tables: tuple[str, ...] = TABLES,
) -> dict[str, int]:
    """Rewrite each raw fixture table into a multi-file parquet layout.

    Returns {table: n_files}. ``sort_by`` maps table -> cluster columns
    (within-file sort for stats pruning).
    """
    files_per_table = files_per_table or spark.sparkContext.defaultParallelism
    sort_by = sort_by or {}
    out: dict[str, int] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name).repartition(files_per_table)
        if name in sort_by:
            df = df.sortWithinPartitions(*sort_by[name])
        dest = os.path.join(dest_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(dest)
        out[name] = len(
            [f for f in os.listdir(dest) if f.endswith(".parquet")]
        )
    return out
