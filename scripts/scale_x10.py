"""10x scale-up measurement: build a synthetic ~sf1 dataset by unioning
sf0.1 ten times with key offsets, then time queries at sf0.1 vs sfX10 and
print the ratio. A ratio near 1 means fixed overhead still dominates; a
ratio near 10 means linear; superlinear ratios flag a stage that would
not survive 100 TB.

Usage: python scripts/scale_x10.py [query ...]   (defaults to the
round-3 additions). Writes the synthetic dataset to /tmp/sfx10 once and
reuses it across runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_v2_to_v3_upgrade_spark.io import TABLES
from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators
from iceberg_v2_to_v3_upgrade_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfx10"
COPIES = 10

# per-table key columns to offset so clones don't collide
OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

DEFAULT_QUERIES = [
    "n75_triangle_count",
    "n76_trigram_perplexity",
    "n77_bloom_decontamination",
    "n78_vocab_coverage",
    "n79_containment_dedup",
    "m9_phash_neardup",
    "e8_cumulative_distinct",
    "d17_referential_integrity",
    "n8b_hll_exact_audit",
]


def build(spark) -> None:
    if os.path.exists(os.path.join(DST, "_SUCCESS_ALL")):
        return
    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        keys = OFFSETS.get(t, [])
        if not keys:  # tiny dims: keep one copy
            src.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
            continue
        max_key = int(
            src.agg(*[F.max(k) for k in keys]).collect()[0][0] or 0
        )
        span = 10 ** len(str(max_key + 1))
        parts = []
        for c in range(COPIES):
            df = src
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(c * span))
            if t == "documents" and "text" in df.columns:
                # vary text per copy so near-dup families stay bounded
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copytag{c}"))
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    open(os.path.join(DST, "_SUCCESS_ALL"), "w").close()


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    # Round-9: the audit loop drains streams to parquet instead of the
    # driver memory sink (results at x10/sf1 are corpus-shaped for l9
    # and accumulated sinks were the whole reason the audit needed a
    # 48 g driver); the default 8 g driver now suffices.
    os.environ.setdefault("SPARK_GRAFT_STREAM_SINK", "file")
    spark = get_spark(app_name="scale_x10")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    registry = load_all_operators()

    def run(name, sf_dir):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in names:
        try:
            small = run(name, SRC)
            big = run(name, DST)
            print(
                f"{name}: sf0.1 {small:.2f}s  sfX10 {big:.2f}s  "
                f"ratio x{big / small:.1f}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:200]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
