"""sf1 sustained-session soak (SCALING.md annex, repeatable form).

Runs the 10 slowest bench queries back-to-back against the synthetic
~sf1 dataset (/tmp/sfx10, built by scale_x10.py) in ONE session — the
cross-query memory-pressure case per-query isolation hides — sampling
JVM used heap after each query. Round-9: streams drain to parquet file
sinks (SPARK_GRAFT_STREAM_SINK=file) so the driver no longer
accumulates corpus-shaped results; runs at the DEFAULT 8 g driver
unless SPARK_GRAFT_DRIVER_MEM overrides.

Usage: python scripts/soak_sf1.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_STREAM_SINK", "file")

from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators
from iceberg_v2_to_v3_upgrade_spark.session import get_spark

SOAK_QUERIES = [
    "n16_decontamination",
    "l8_stream_cdc_apply",
    "i41_incremental_semdedup",
    "l7_stream_upsert_table",
    "i13_incremental_neardup",
    "l9_stream_neardup_ingest",
    "n54_neardup_degree_histogram",
    "n2f_dedup_clusters",
    "l12_stream_outer_attribution",
    "n92_dedup_threshold_curve",
]


def _used_heap_mb(spark) -> int:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return int((rt.totalMemory() - rt.freeMemory()) / (1024 * 1024))


def main() -> None:
    names = sys.argv[1:] or SOAK_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SOAK_DIR", "/tmp/sfx10")
    spark = get_spark(app_name="soak_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_operators()
    total = 0.0
    peak = 0
    print(f"driver_mem={os.environ.get('SPARK_GRAFT_DRIVER_MEM', '8g')} "
          f"sink={os.environ.get('SPARK_GRAFT_STREAM_SINK')} dir={sf_dir}",
          flush=True)
    for name in names:
        t0 = time.perf_counter()
        try:
            n = registry[name].fn(spark, sf_dir).count()
            err = ""
        except Exception as exc:  # noqa: BLE001
            n, err = -1, f" ERROR {type(exc).__name__}: {str(exc)[:160]}"
        sec = time.perf_counter() - t0
        total += sec
        heap = _used_heap_mb(spark)
        peak = max(peak, heap)
        print(f"{name}: {sec:.1f}s rows={n} heap_mb={heap}{err}", flush=True)
    print(f"TOTAL {total:.1f}s peak_heap_mb={peak}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
