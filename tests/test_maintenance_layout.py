from __future__ import annotations

import os

import pytest

from iceberg_v2_to_v3_upgrade_spark.cli import DEMO_ROWS, DEMO_SCHEMA
from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.sources.layout import optimize_layout
from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

from tests.conftest import SF_SMALL


def test_optimize_layout_multiplies_scan_tasks(spark, tmp_path):
    dest = str(tmp_path / "optimized")
    result = optimize_layout(
        spark,
        SF_SMALL,
        dest,
        files_per_table=4,
        sort_by={"lineitem": ["l_shipdate"]},
        tables=("lineitem", "orders"),
    )
    assert result == {"lineitem": 4, "orders": 4}
    raw = load_table(spark, SF_SMALL, "lineitem")
    opt = spark.read.parquet(os.path.join(dest, "lineitem.parquet"))
    assert opt.count() == raw.count()
    # scan parallelism: the optimized layout yields multiple input splits
    assert opt.rdd.getNumPartitions() >= 4
    assert raw.rdd.getNumPartitions() == 1  # the single-row-group pathology


def test_remove_orphan_files(spark, tmp_path):
    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table(
        "db", "t", DEMO_SCHEMA, partition_by=["category"]
    )
    t.insert_values(DEMO_ROWS)
    # simulate a crashed write: a data dir no snapshot references
    orphan = os.path.join(t.root, "data", "snap-99999")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("not really parquet")

    dry = t.remove_orphan_files(dry_run=True, older_than_seconds=0)
    assert dry == [orphan] and os.path.exists(orphan)
    removed = t.remove_orphan_files(older_than_seconds=0)
    assert removed == [orphan] and not os.path.exists(orphan)
    assert t.count() == 10  # live data untouched

    # SQL surface
    engine = EngineSQL(catalog)
    res = engine.execute_one(
        "CALL system.remove_orphan_files(table => 'db.t')"
    )
    assert res.kind == "remove_orphan_files"
    assert "[]" in res.message  # nothing left to remove


def test_partition_transforms_hidden_partitioning(spark, tmp_path):
    """Iceberg-style hidden partitioning: days()/bucket() derive
    directory-only columns; scans return the declared schema unchanged,
    and a partition_filter prunes directories at the file-index level."""
    import datetime

    catalog = LocalCatalog(spark, str(tmp_path / "wh_t"))
    t = catalog.create_table(
        "db",
        "events_t",
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE",
        partition_by=["days(ts)", "bucket(4, user_id)"],
    )
    d = datetime.datetime
    rows = [
        (i, d(2024, 1, 1 + i % 3, 8 + i % 12), i % 7, float(i))
        for i in range(40)
    ]
    t.insert_values(rows)

    # layout: ts_day=YYYY-MM-DD / user_id_bucket=N directories
    data_dir = t.current_snapshot().data_dirs[0]
    days = sorted(p for p in os.listdir(data_dir) if p.startswith("ts_day="))
    assert days == ["ts_day=2024-01-01", "ts_day=2024-01-02",
                    "ts_day=2024-01-03"]
    buckets = os.listdir(os.path.join(data_dir, days[0]))
    assert all(b.startswith("user_id_bucket=") for b in buckets)

    # scan: declared schema only (hidden columns stay hidden), all rows
    got = t.scan()
    assert got.columns == ["event_id", "ts", "user_id", "value"]
    assert got.count() == 40

    # partition_filter reaches the scan node as a PartitionFilter —
    # directory-level pruning, not a post-read filter
    import io
    from contextlib import redirect_stdout

    day1 = t.scan(partition_filter="ts_day = '2024-01-01'")
    buf = io.StringIO()
    with redirect_stdout(buf):
        day1.explain("formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "ts_day" in pf and "2024-01-01" in pf
    assert day1.count() == sum(1 for r in rows if r[1].day == 1)

    # DML still works through the transform spec (rewrite re-derives dirs)
    t.delete_where("event_id < 10")
    assert t.count() == 30
    t.rewrite_data_files(rewrite_all=True)
    assert t.count() == 30

    # partitions metadata table re-derives the transform columns and
    # reports MoR-merged (post-delete) counts per directory tuple
    parts = t.partitions().collect()
    assert set(parts[0].asDict()) >= {"ts_day", "user_id_bucket",
                                      "record_count", "file_count"}
    assert sum(p.record_count for p in parts) == 30
    day_counts: dict[str, int] = {}
    for p in parts:
        day_counts[p.ts_day] = day_counts.get(p.ts_day, 0) + p.record_count
    want: dict[str, int] = {}
    for r in rows:
        if r[0] >= 10:
            k = r[1].strftime("%Y-%m-%d")
            want[k] = want.get(k, 0) + 1
    assert day_counts == want


def test_zorder_compaction_clusters_both_dimensions(spark, tmp_path):
    """OPTIMIZE ZORDER analog: after zorder_by compaction, each file
    covers a narrow range of BOTH columns (multi-dim min/max pruning),
    and the rewrite is semantically invisible."""
    import glob

    catalog = LocalCatalog(spark, str(tmp_path / "z_wh"))
    t = catalog.create_table("db", "zt", "x INT, y INT, v DOUBLE")
    # 32x32 grid: clustering on one dim alone leaves the other at full
    # spread; Z-order bounds both
    rows = [(x, y, float(x * y)) for x in range(32) for y in range(32)]
    t.insert_values(rows)
    before = sorted(map(tuple, t.scan().collect()))

    t.rewrite_data_files(
        rewrite_all=True, zorder_by=["x", "y"], target_file_partitions=16
    )
    after = sorted(map(tuple, t.scan().collect()))
    assert after == before  # invisible

    data_dir = t.current_snapshot().data_dirs[0]
    files = glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                      recursive=True)
    assert len(files) >= 8
    spreads_x, spreads_y = [], []
    for f in files:
        pdf = spark.read.parquet(f).select("x", "y").toPandas()
        if len(pdf) < 2:
            continue
        spreads_x.append(int(pdf.x.max() - pdf.x.min()))
        spreads_y.append(int(pdf.y.max() - pdf.y.min()))
    # global spread is 31 in each dim; z-ordered files must be much
    # narrower ON AVERAGE in BOTH dims (a linear sort on x would leave
    # y's average spread at ~31)
    avg_x = sum(spreads_x) / len(spreads_x)
    avg_y = sum(spreads_y) / len(spreads_y)
    assert avg_x < 16, f"x spread {avg_x}"
    assert avg_y < 16, f"y spread {avg_y}"


def test_compaction_respects_max_records_per_file(spark, tmp_path):
    """target-file-size analog: compaction splits output so no file
    exceeds the record cap (the file-sizing knob of table maintenance)."""
    import glob

    catalog = LocalCatalog(spark, str(tmp_path / "size_wh"))
    t = catalog.create_table("db", "sized", "id INT, v DOUBLE")
    t.insert_values([(i, float(i)) for i in range(1000)])
    t.rewrite_data_files(
        rewrite_all=True,
        target_file_partitions=2,
        max_records_per_file=100,
    )
    assert t.count() == 1000
    files = glob.glob(
        os.path.join(t.current_snapshot().data_dirs[0], "**", "*.parquet"),
        recursive=True,
    )
    assert len(files) >= 10  # 1000 rows / 100-cap
    for f in files:
        assert spark.read.parquet(f).count() <= 100
