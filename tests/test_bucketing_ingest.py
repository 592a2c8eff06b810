from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed_table,
)
from iceberg_v2_to_v3_upgrade_spark.streaming.ingest import stream_into_table
from iceberg_v2_to_v3_upgrade_spark.streaming.jobs import read_event_stream
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed_table(lineitem, "b_lineitem", ["o_orderkey"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a merge join so bucketing (not broadcast) is what's tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # pre-shuffled layout: zero exchanges
        n = joined.count()
        assert n == load_table(spark, SF_SMALL, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_stream_ingest_into_mutable_table(spark, tmp_path):
    landing = str(tmp_path / "landing")
    events = load_table(spark, SF_SMALL, "events")
    events.repartition(4).write.mode("overwrite").parquet(landing)

    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    table = catalog.create_table(
        "stream_db",
        "events_t",
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
        partition_by=["event_type"],
    )
    stream = read_event_stream(spark, landing, max_files_per_trigger=2)
    stream_into_table(stream, table, str(tmp_path / "ckpt"))

    assert table.count() == events.count()
    # multiple micro-batches -> multiple append snapshots
    appends = [s for s in table.snapshots() if s.operation == "append"]
    assert len(appends) >= 2
    # the streamed table is a full citizen: MoR delete + compaction work
    table.delete_where("event_type = 'error'")
    expected = events.filter("event_type <> 'error'").count()
    assert table.count() == expected
    table.rewrite_data_files()
    assert table.count() == expected


def test_stream_upsert_last_writer_wins(spark, tmp_path):
    """Streaming CDC-apply: per micro-batch MERGE keeps one row per key,
    later batches overwrite earlier ones, within-batch winner by ts."""
    import datetime
    import time

    from iceberg_v2_to_v3_upgrade_spark.streaming.ingest import (
        stream_upsert_into_table,
    )
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    d = datetime.datetime
    landing = str(tmp_path / "upsert_landing")
    schema = "user_id long, ts timestamp, value double"
    b1 = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 10), 10.0),
            (2, d(2024, 1, 1, 10), 20.0),
            (2, d(2024, 1, 1, 11), 21.0),  # within-batch dup: later wins
        ],
        schema,
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{landing}/b1")
    time.sleep(1.1)
    b2 = spark.createDataFrame(
        [(2, d(2024, 1, 2, 9), 25.0), (3, d(2024, 1, 2, 9), 30.0)],
        schema,
    )
    b2.coalesce(1).write.mode("overwrite").parquet(f"{landing}/b2")

    catalog = LocalCatalog(spark, str(tmp_path / "upsert_wh"))
    t = catalog.create_table("db", "profiles", schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*")
    )
    stream_upsert_into_table(
        stream, t, keys=["user_id"],
        checkpoint_dir=str(tmp_path / "upsert_ckpt"), order_col="ts",
    )

    final = catalog.load_table("db", "profiles")
    got = {r.user_id: r.value for r in final.scan().collect()}
    assert got == {1: 10.0, 2: 25.0, 3: 30.0}
    # each applied batch is a snapshot: time travel sees the first state
    ops = [s.operation for s in final.snapshots()]
    assert ops.count("merge") == 2


def test_stream_cdc_apply_with_deletes(spark, tmp_path):
    """Op-aware CDC apply: I/U rows merge, D rows become equality
    deletes; last op per key wins within a batch."""
    import datetime
    import time

    from iceberg_v2_to_v3_upgrade_spark.streaming.ingest import (
        stream_cdc_into_table,
    )
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    d = datetime.datetime
    landing = str(tmp_path / "cdc_landing")
    schema = "user_id long, ts timestamp, value double, op string"
    b1 = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 10), 10.0, "I"),
            (2, d(2024, 1, 1, 10), 20.0, "I"),
            (3, d(2024, 1, 1, 10), 30.0, "I"),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{landing}/b1")
    time.sleep(1.1)
    b2 = spark.createDataFrame(
        [
            (1, d(2024, 1, 2, 9), 11.0, "U"),   # update 1
            (2, d(2024, 1, 2, 9), 0.0, "D"),    # delete 2
            (3, d(2024, 1, 2, 8), 31.0, "U"),   # superseded by later D
            (3, d(2024, 1, 2, 9), 0.0, "D"),    # last op for 3 wins
            (4, d(2024, 1, 2, 9), 40.0, "I"),   # new key
        ],
        schema,
    )
    b2.coalesce(1).write.mode("overwrite").parquet(f"{landing}/b2")

    catalog = LocalCatalog(spark, str(tmp_path / "cdc_wh"))
    t = catalog.create_table("db", "cdc", "user_id long, ts timestamp, value double")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{landing}/*")
    )
    stream_cdc_into_table(
        stream, t, keys=["user_id"],
        checkpoint_dir=str(tmp_path / "cdc_ckpt"), order_col="ts",
    )

    final = catalog.load_table("db", "cdc")
    got = {r.user_id: r.value for r in final.scan().collect()}
    assert got == {1: 11.0, 4: 40.0}
