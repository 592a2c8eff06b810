"""Source/sink formats (SURVEY.md §2.A5/A6).

The reference binds exactly one storage format (Parquet via Iceberg's
S3FileIO, ``internal/upgrade_table.py:67-69``) and one result sink (the
Databricks REST ``data_array``, ``internal/verify_in_databricks.py:37-54``).
This module generalizes both: parquet/orc/csv/json readers+writers with
identical semantics, and the JSON result sink.

Scale notes: parquet and orc are the data-path formats (columnar,
splittable, predicate-pushdown, self-describing schema); csv/json are
ingest/export edges. Writers
accept ``partition_by`` so identity-partition layout (and thus partition
pruning) survives export.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Schema is REQUIRED for csv/json on data paths — inference scans the
    input twice and guesses types (never acceptable at 100 TB); parquet
    carries its own schema."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} read requires an explicit schema")
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)


def to_json_rows(df: DataFrame, limit: int | None = None) -> list[dict]:
    """Result sink: rows as JSON dicts — the REST ``data_array`` analog
    (A6). ``limit`` caps driver memory like the reference's LIMIT probes."""
    if limit is not None:
        df = df.limit(limit)
    return [json.loads(s) for s in df.toJSON().collect()]
