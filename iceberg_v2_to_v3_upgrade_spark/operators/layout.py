"""Data-layout maintenance arcs (SURVEY.md §2.I4 family): driver-gating
the OPTIMIZE ZORDER analog that was previously pytest-only
(``tests/test_maintenance_layout.py``).

Reference parity: the reference's compaction is
``CALL rewrite_data_files(... options map('rewrite-all','true'))``
(``internal/upgrade_table.py:124,129``); Iceberg's production variant
adds ``strategy => 'sort', sort_order => 'zorder(a, b)'`` — the
multi-dimensional clustering this arc drives end-to-end.

Scale posture: the Z-value is pure JVM bit arithmetic (no UDF), the
re-layout is one ``repartitionByRange`` on the Z-key (a single shuffle,
exactly what the compaction job would pay at 100 TB), and the
clustering assertions read parquet FOOTERS only — never data.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_I53_ORACLE = """
    SELECT CAST(o_custkey % 8 AS BIGINT) AS cust_band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY cust_band
    ORDER BY cust_band
"""


def _file_bounds(files: list[str], cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from parquet FOOTER statistics —
    the same metadata a scan planner prunes on; no data pages read."""
    import pyarrow.parquet as pq

    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        b: dict = {"path": f, "rows": md.num_rows}
        for c in cols:
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            b[c] = (lo, hi)
        out.append(b)
    return out


@declare(
    "i53_zorder_rewrite",
    oracle=_I53_ORACLE,
    tags=("lifecycle", "maintenance", "layout", "scale"),
)
def i53_zorder_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER driven end-to-end (round-10 driver-gate of the
    pytest-only layout op): orders land key-ordered — each file covers
    a narrow ``o_orderkey`` range but the FULL ``o_custkey`` range, so
    custkey-predicate scans prune nothing. ``rewrite_data_files(
    zorder_by=["o_orderkey", "o_custkey"])`` re-clusters on the Morton
    key; the arc then proves, from parquet footers alone:

    1. the rewrite is semantically invisible (exceptAll both ways on
       the pre/post scans is empty),
    2. per-file custkey spread collapses (avg normalized spread < 0.6
       vs ~1.0 pre-rewrite) while orderkey spread stays bounded —
       multi-dimensional clustering, not a linear sort,
    3. a custkey range predicate now PRUNES files: the fraction of
       files whose footer [min,max] intersects the probe range is
       strictly below the pre-rewrite fraction (which is all of them).

    The returned frame is the post-rewrite MoR scan aggregated per
    custkey band, hash-gated against the relational oracle — layout
    changed, content didn't.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="zorder_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "layout_db",
        "orders_z",
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # key-ordered ingest: the common "append in arrival order" layout
    t.insert(orders.repartitionByRange(8, "o_orderkey"))
    before = t.scan()

    def _dirs_files() -> list[str]:
        files: list[str] = []
        for d in t.current_snapshot().data_dirs:
            files.extend(
                glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
            )
        return sorted(files)

    dims = ["o_orderkey", "o_custkey"]
    pre = _file_bounds(_dirs_files(), dims)

    def _avg_spread(bounds: list[dict], col: str) -> float:
        los = [b[col][0] for b in bounds if b[col][0] is not None]
        his = [b[col][1] for b in bounds if b[col][1] is not None]
        # informative asserts, not ZeroDivision/ValueError — the driver
        # adjudicates failures from a short stdout tail (review finding)
        assert los and his, f"no footer stats for {col} in {bounds}"
        full = max(his) - min(los)
        if full == 0:
            return 0.0
        per = [
            (b[col][1] - b[col][0]) / full
            for b in bounds
            if b[col][0] is not None and b["rows"] > 1
        ]
        assert per, f"every file is single-row/statless for {col}"
        return sum(per) / len(per)

    pre_ck = _avg_spread(pre, "o_custkey")

    t.rewrite_data_files(
        rewrite_all=True,
        zorder_by=dims,
        target_file_partitions=16,
    )
    after_scan = t.scan()
    # (1) semantically invisible — multiset equality as ONE job:
    # +1/-1-weighted union grouped on the row value has every group sum
    # to zero iff the two sides are equal as multisets (round-10: the
    # previous two exceptAll jobs each re-ran both scans)
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    unequal = (
        before.select(*cols)
        .withColumn("_w", F.lit(1))
        .unionByName(after_scan.select(*cols).withColumn("_w", F.lit(-1)))
        .groupBy(*cols)
        .agg(F.sum("_w").alias("_d"))
        .filter(F.col("_d") != 0)
        .count()
    )
    assert unequal == 0, f"{unequal} row groups differ pre/post rewrite"

    post = _file_bounds(_dirs_files(), dims)
    assert len(post) >= 8, len(post)
    # (2) both dims clustered — a linear orderkey sort would leave
    # custkey spread at ~1.0; thresholds are loose because
    # repartitionByRange samples its boundaries. On the fixture layout
    # (custkey uncorrelated with the ingest order, pre-spread ~1.0)
    # this is a real collapse; on pre-clustered inputs (the x10
    # synthetic's offset copies) just require no regression.
    post_ck = _avg_spread(post, "o_custkey")
    assert post_ck < 0.6, post
    assert _avg_spread(post, "o_orderkey") < 0.6, post
    if pre_ck > 0.9:
        assert post_ck < 0.6 * pre_ck, (pre_ck, post_ck)
    # (3) footer-only pruning on a custkey range now skips files
    ck_lo = min(b["o_custkey"][0] for b in post)
    ck_hi = max(b["o_custkey"][1] for b in post)
    probe_lo = ck_lo
    probe_hi = ck_lo + (ck_hi - ck_lo) // 8
    hit = [
        b
        for b in post
        if b["o_custkey"][0] <= probe_hi and b["o_custkey"][1] >= probe_lo
    ]
    assert len(hit) < len(post), "custkey probe pruned nothing"

    return (
        after_scan.groupBy(
            (F.col("o_custkey") % 8).cast("bigint").alias("cust_band")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("cust_band")
    )
