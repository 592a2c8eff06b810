"""Strict float-parity sweep: Spark vs DuckDB with EXACT value comparison.

The driver's correctness gate hashes raw values (no float rounding), so any
ULP-level double divergence between Spark and DuckDB is a hash mismatch.
This sweep finds every oracle-backed query whose values are not exactly
equal, so the query can be hardened (round(x, 6) on both sides).

Usage: python scripts/strict_sweep.py [sf_dir] [names...]
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
        return repr(value)  # STRICT: exact repr, no rounding
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
    spark = get_spark(app_name="strict_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    explicit = bool(sys.argv[2:])
    bad = []
    for name in names:
        q = registry.get(name)
        if q is None:
            # an explicitly-requested unknown name is a failure, not a
            # silent skip — a renamed query must not green the gate
            if explicit:
                print(f"{name}: UNKNOWN QUERY", flush=True)
                bad.append(name)
            continue
        if not q.oracle:
            # rows-only queries self-validate in-query; when named
            # explicitly (the pre-commit gate path), RUN them so their
            # internal assertions fire instead of skipping silently
            if explicit:
                try:
                    n = q.fn(spark, sf_dir).count()
                    print(f"{name}: rows-only smoke rows={n}", flush=True)
                except Exception as exc:  # noqa: BLE001
                    print(
                        f"{name}: ERROR {type(exc).__name__}: "
                        f"{str(exc)[:200]}",
                        flush=True,
                    )
                    bad.append(name)
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = list(sdf.columns)
            rel = con.execute(q.oracle)
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:200]}", flush=True)
            bad.append(name)
            continue
        s_set = _row_multiset(s_rows, s_cols)
        d_set = _row_multiset(d_rows, d_cols)
        if sorted(s_cols) != sorted(d_cols) or len(s_rows) != len(d_rows) or s_set != d_set:
            diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:2]
            print(f"{name}: STRICT-MISMATCH {diffs}", flush=True)
            bad.append(name)
    print(f"\n=== {len(bad)} strict mismatches ===")
    for n in bad:
        print(n)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
