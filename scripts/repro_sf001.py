"""Reproduce driver-gate mismatches at an arbitrary SF dir.

Usage: python scripts/repro_sf001.py [sf_dir] [query ...]
Compares Spark result vs DuckDB oracle with the same canonicalization as
tests/test_oracle_parity.py and prints the first differing rows.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from iceberg_v2_to_v3_upgrade_spark.io import TABLES
from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators
from iceberg_v2_to_v3_upgrade_spark.session import get_spark


def _canon(value):
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{round(value, 9):.9f}"
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
    registry = load_all_operators()
    if not names:
        names = sorted(n for n, q in registry.items() if q.oracle)
    spark = get_spark(app_name="repro")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name in names:
        q = registry[name]
        if not q.oracle:
            print(f"{name}: rows-only (no oracle), skipping")
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = list(sdf.columns)
            rel = con.execute(q.oracle)
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        s_set = _row_multiset(s_rows, s_cols)
        d_set = _row_multiset(d_rows, d_cols)
        if s_set != d_set:
            diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
            problems.append(f"values: {diffs}")
        print(f"{name}: {'OK' if not problems else 'MISMATCH ' + ' | '.join(problems)}")
    spark.stop()


if __name__ == "__main__":
    main()
