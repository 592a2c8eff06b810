"""Streaming == batch equivalence on the same input (the Structured
Streaming contract), plus the custom stateful operator."""

from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.streaming.jobs import (
    read_event_stream,
    run_to_memory_sink,
    run_update_to_memory_sink,
    sessionize,
    tumbling_value_agg,
    user_running_totals_stream,
)

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def landing_dir(spark, tmp_path_factory):
    """Batch-load events (ns->µs normalized) and write a clean landing zone
    the file stream can tail."""
    d = tmp_path_factory.mktemp("landing")
    load_table(spark, SF_SMALL, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(str(d / "events"))
    return str(d / "events")


def _sorted_rows(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_streaming_tumbling_equals_batch(spark, landing_dir, tmp_path):
    stream = read_event_stream(spark, landing_dir, max_files_per_trigger=2)
    run_to_memory_sink(
        tumbling_value_agg(stream, streaming=True),
        "tumbling_sink",
        str(tmp_path / "ckpt1"),
    )
    got = _sorted_rows(
        spark.table("tumbling_sink"), "window_start", "event_type"
    )
    want = _sorted_rows(
        tumbling_value_agg(load_table(spark, SF_SMALL, "events")),
        "window_start",
        "event_type",
    )
    assert got == want


def test_streaming_sessionize_equals_batch(spark, landing_dir, tmp_path):
    stream = read_event_stream(spark, landing_dir, max_files_per_trigger=2)
    run_to_memory_sink(
        sessionize(stream, streaming=True),
        "session_sink",
        str(tmp_path / "ckpt2"),
    )
    got = _sorted_rows(spark.table("session_sink"), "user_id", "session_start")
    want = _sorted_rows(
        sessionize(load_table(spark, SF_SMALL, "events")),
        "user_id",
        "session_start",
    )
    assert got == want


def test_custom_stateful_running_totals(spark, landing_dir, tmp_path):
    stream = read_event_stream(spark, landing_dir, max_files_per_trigger=2)
    run_update_to_memory_sink(
        user_running_totals_stream(stream),
        "totals_sink",
        str(tmp_path / "ckpt3"),
    )
    # multiple micro-batches emit per-user updates; the LAST per user is the
    # running total after all input was consumed
    from pyspark.sql import functions as F, Window

    sink = spark.table("totals_sink").withColumn(
        "_seq", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("_seq"))
    final = (
        sink.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "n_events", "total_value")
    )
    got = {r.user_id: (r.n_events, r.total_value) for r in final.collect()}

    batch = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )
    want = {r.user_id: (r.n, r.total) for r in batch.collect()}
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        assert got[uid][0] == n
        assert got[uid][1] == pytest.approx(total, abs=0.02)
