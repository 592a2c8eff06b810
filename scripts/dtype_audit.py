"""Driver-canon dtype audit: the driver hashes results via PANDAS, so a
column that lands as float64 on one side and int64 on the other is a hash
mismatch even when every value is numerically equal. Root cause found in
round 2: DuckDB `sum(<any integer>)` returns HUGEINT, which `.df()`
converts to float64, while Spark's `sum(long)` stays int64 (10 of the 12
non-green rows in CORRECTNESS_r02 trace to exactly this).

Flags every oracle-backed query where Spark's toPandas dtypes differ from
DuckDB's .df() dtypes, column by column.

Usage: python scripts/dtype_audit.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from iceberg_v2_to_v3_upgrade_spark.io import TABLES
from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators
from iceberg_v2_to_v3_upgrade_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    registry = load_all_operators()
    if not names:
        names = [n for n, q in registry.items() if q.oracle]
    spark = get_spark(app_name="dtype_audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name in names:
        q = registry[name]
        if not q.oracle:
            continue
        try:
            sp = q.fn(spark, sf_dir).toPandas()
            dk = con.execute(q.oracle).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:200]}", flush=True)
            bad.append(name)
            continue
        s_dtypes = {c: str(t) for c, t in sp.dtypes.items()}
        d_dtypes = {c: str(t) for c, t in dk.dtypes.items()}
        diffs = {
            c: (s_dtypes.get(c), d_dtypes.get(c))
            for c in set(s_dtypes) | set(d_dtypes)
            if s_dtypes.get(c) != d_dtypes.get(c)
        }
        if diffs:
            print(f"{name}: DTYPE-DIFF {diffs}", flush=True)
            bad.append(name)
    print(f"\n=== {len(bad)} queries with dtype differences ===")
    for n in bad:
        print(n)
    spark.stop()


if __name__ == "__main__":
    main()
