"""Isolated per-query timer for optimization A/Bs: run the named queries
through the exact bench methodology (get_spark session, d1 warmup,
noop sink, min-of-N) without paying for the other ~330 queries.

Usage:
    python scripts/time_query.py n16_decontamination i41_incremental_semdedup
    SPARK_GRAFT_TIMER_PASSES=3 python scripts/time_query.py l9_stream_neardup_ingest

Prints one line per query: `name  min=X.XXX  passes=[...]` plus a final
JSON line for scripting. SPARK_GRAFT_SF_DIR picks the dataset (default
sf0.1, same as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators
from iceberg_v2_to_v3_upgrade_spark.session import get_spark


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_passes = int(os.environ.get("SPARK_GRAFT_TIMER_PASSES", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_query")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_operators()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # same warmups as bench.py: codegen/executors via d1
    try:
        registry["d1_count_star"].fn(spark, sf_dir).count()
    except Exception:  # noqa: BLE001
        pass
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name].fn
        passes: list[float] = []
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        for _ in range(n_passes):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            passes.append(round(time.perf_counter() - start, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(passes), "passes": passes}
        print(f"{name}  min={min(passes):.3f}  passes={passes}", flush=True)
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
