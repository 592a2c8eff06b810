"""Streaming == batch equivalence on the same input (the Structured
Streaming contract), plus the custom stateful operator."""

from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.streaming.jobs import (
    click_purchase_attribution,
    dedup_events,
    read_event_stream,
    run_append_to_memory_sink,
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


def test_stream_stream_join_equals_batch(spark, landing_dir, tmp_path):
    """Stream-stream interval join (click -> purchase within 1h per user)
    emits exactly the batch join's rows once the watermark passes."""

    def split(df):
        return (
            df.filter(df.event_type == "click"),
            df.filter(df.event_type == "purchase"),
        )

    stream = read_event_stream(spark, landing_dir, max_files_per_trigger=2)
    joined = click_purchase_attribution(*split(stream), streaming=True)
    # append mode: inner stream-stream join results emit when watermark
    # confirms no more matches can arrive
    run_append_to_memory_sink(
        joined, "attribution_sink", str(tmp_path / "ckpt_ss")
    )
    got = _sorted_rows(
        spark.table("attribution_sink"), "click_id", "purchase_id"
    )
    want = _sorted_rows(
        click_purchase_attribution(
            *split(load_table(spark, SF_SMALL, "events"))
        ),
        "click_id",
        "purchase_id",
    )
    assert len(want) > 0
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Event later than the 2h watermark arrives after its window was
    finalized -> excluded from the append-mode result."""
    import datetime
    import time

    d = datetime.datetime
    landing = str(tmp_path / "late_landing")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batch1 = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 10, 5), 1, "view", 1.0, "{}"),
            (2, d(2024, 1, 1, 10, 10), 1, "view", 1.0, "{}"),
            # advances the watermark to 11:05 > 11:00 -> finalizes 10:00
            (3, d(2024, 1, 1, 13, 5), 1, "view", 1.0, "{}"),
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(f"{landing}/b1")
    ckpt = str(tmp_path / "ckpt_late")

    def run(_sink_name):
        # foreachBatch (not memory sink): supports checkpoint recovery,
        # which this two-run scenario needs
        stream = spark.readStream.schema(schema).parquet(f"{landing}/*")
        rows = []
        q = (
            tumbling_value_agg(stream, streaming=True)
            .writeStream.foreachBatch(
                lambda df, _bid: rows.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.window_start: r.n_events for r in rows}

    # run 1: establishes watermark 13:05 - 2h = 11:05 in the checkpoint
    first = run("late_sink_1")
    assert first == {d(2024, 1, 1, 10, 0): 2, d(2024, 1, 1, 13, 0): 1}

    time.sleep(1.1)  # distinct mod-times
    batch2 = spark.createDataFrame(
        [
            (4, d(2024, 1, 1, 10, 30), 1, "view", 1.0, "{}"),  # LATE
            (5, d(2024, 1, 1, 13, 10), 1, "view", 1.0, "{}"),
        ],
        schema,
    )
    batch2.coalesce(1).write.mode("overwrite").parquet(f"{landing}/b2")

    # run 2 (same checkpoint -> watermark restored): update mode re-emits
    # any changed window, so ACCEPTING the late event would re-emit 10:00
    # with count 3; it must not. The fresh 13:10 event updates 13:00.
    second = run("late_sink_2")
    assert d(2024, 1, 1, 10, 0) not in second  # late event dropped
    assert second == {d(2024, 1, 1, 13, 0): 2}


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


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """At-least-once ingestion replays the whole input; the streaming dedup
    collapses every replayed event_id to one emitted row (== batch dedup),
    with state bounded by the watermark rather than all-keys-forever."""
    ev = load_table(spark, SF_SMALL, "events")
    d = tmp_path / "dup_landing"
    ev.repartition(2).write.mode("overwrite").parquet(str(d))
    ev.repartition(3).write.mode("append").parquet(str(d))  # full replay

    stream = read_event_stream(spark, str(d), max_files_per_trigger=2)
    # watermark far wider than the fixture's time span: every replayed
    # duplicate is within-watermark, so the dedup guarantee is total
    run_append_to_memory_sink(
        dedup_events(stream, streaming=True, watermark="3650 days"),
        "dedup_sink",
        str(tmp_path / "ckpt_dedup"),
    )
    got = spark.table("dedup_sink").count()
    batch = dedup_events(spark.read.parquet(str(d))).count()
    assert got == batch == ev.count()


def test_stream_static_enrichment_equals_batch(spark, landing_dir, tmp_path):
    """Stream-static broadcast join + windowed agg == its batch twin."""
    from iceberg_v2_to_v3_upgrade_spark.streaming.jobs import (
        enrich_with_segment,
        read_event_stream,
        run_to_memory_sink,
    )

    dim = load_table(spark, SF_SMALL, "customer")
    stream = read_event_stream(spark, landing_dir, max_files_per_trigger=2)
    run_to_memory_sink(
        enrich_with_segment(stream, dim, streaming=True),
        "seg_enriched",
        str(tmp_path / "ckpt_seg"),
    )
    got = _sorted_rows(
        spark.table("seg_enriched"), "window_start", "segment"
    )
    want = _sorted_rows(
        enrich_with_segment(
            load_table(spark, SF_SMALL, "events"), dim, streaming=False
        ),
        "window_start",
        "segment",
    )
    assert got == want and len(got) > 0
    # both matched and unmatched users must be represented
    segments = {r[1] for r in got}
    assert "UNKNOWN" in segments or len(segments) > 1


def test_stream_upsert_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Re-starting the upsert stream against the SAME checkpoint with no
    new files must apply nothing: no new table commits, identical rows —
    the exactly-once-per-batch guarantee the checkpoint provides."""
    from pyspark.sql import functions as F

    from iceberg_v2_to_v3_upgrade_spark.streaming.ingest import (
        stream_upsert_into_table,
    )
    from iceberg_v2_to_v3_upgrade_spark.streaming.jobs import (
        read_event_stream,
    )
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    d = tmp_path / "landing"
    load_table(spark, SF_SMALL, "events").repartitionByRange(
        4, "ts"
    ).write.mode("overwrite").parquet(str(d))
    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table(
        "once_db",
        "user_latest",
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = read_event_stream(
            spark, str(d), max_files_per_trigger=2
        ).select("user_id", "ts", "value")
        stream_upsert_into_table(
            stream, t, keys=["user_id"], checkpoint_dir=ckpt, order_col="ts"
        )

    run()
    commits_after_first = t.history().count()
    rows_after_first = sorted(map(tuple, t.scan().collect()))
    run()  # same checkpoint, no new input: must be a no-op
    assert t.history().count() == commits_after_first
    assert sorted(map(tuple, t.scan().collect())) == rows_after_first


def test_last_writer_tiebreak_is_deterministic_under_equal_ts(spark):
    """Round-6 review latent finding: with only ts in the last-writer
    window, equal (key, ts) rows are won ARBITRARILY by both the engine
    and any oracle — order_col now accepts a column list so a unique
    tie-break (event_id) makes the winner deterministic, and the
    tie-break column is dropped before the merge."""
    from iceberg_v2_to_v3_upgrade_spark.streaming.ingest import (
        _dedup_last_writer,
    )

    batch = spark.createDataFrame(
        [
            (1, "2026-01-01 00:00:00", "a", 10),
            (1, "2026-01-01 00:00:00", "b", 11),  # same ts, higher id
            (1, "2025-12-31 23:00:00", "c", 99),  # older ts, highest id
            (2, "2026-01-01 00:00:00", "d", 5),
        ],
        "user_id int, ts string, v string, event_id int",
    )
    out = _dedup_last_writer(
        batch, ["user_id"], ["ts", "event_id"], ["event_id"]
    )
    rows = {r.user_id: r.v for r in out.collect()}
    # ts wins first; event_id breaks the tie; event_id never outranks ts
    assert rows == {1: "b", 2: "d"}
    assert "event_id" not in out.columns
