"""Repro with a DRIVER-LIKE vanilla SparkSession (stock confs, 200 shuffle
partitions, no session.py customizations) to detect env-dependent results.

Usage: python scripts/repro_vanilla.py [sf_dir] [names...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession


def _canon(value):
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return repr(value)
    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in value) + "]"
    return repr(value)


def _row_multiset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(row[i]) for i in order) for row in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    from iceberg_v2_to_v3_upgrade_spark.io import TABLES
    from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

    registry = load_all_operators()
    spark = (
        SparkSession.builder.appName("vanilla").master("local[32]").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name in names:
        q = registry[name]
        try:
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = list(sdf.columns)
            rel = con.execute(q.oracle)
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:300]}", flush=True)
            continue
        s_set = _row_multiset(s_rows, s_cols)
        d_set = _row_multiset(d_rows, d_cols)
        if s_set != d_set or sorted(s_cols) != sorted(d_cols):
            diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:2]
            print(f"{name}: MISMATCH rows {len(s_rows)}/{len(d_rows)} {diffs}", flush=True)
        else:
            print(f"{name}: OK", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
