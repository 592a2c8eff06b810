"""Structured Streaming jobs — streaming twins of the batch event operators
(SURVEY.md §2.L; the reference is batch-only, this is [EXT] north-star
surface).

Spark's unified model means each transformation below is ONE function
applied to either a batch or a streaming DataFrame — the oracle checks the
batch twin, tests check streaming==batch on the same input.

Scale posture: watermarks bound state (late data beyond 2h is dropped);
session/window state lives in the state store keyed by group — partitioned
by user/event_type, so state scales horizontally with executors.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = 8
) -> DataFrame:
    """File-source stream over a directory of (µs-timestamp) event parquet —
    the landing-zone pattern: upstream writes clean files, we tail the dir.
    ``max_files_per_trigger=None`` (or 0) omits the cap: availableNow then
    processes everything in one micro-batch (deterministic single-batch
    mode for stream-stream joins)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


# ---------------------------------------------------------------- twins
# Each takes events (batch OR stream) and returns the transformed frame.


def tumbling_value_agg(events: DataFrame, streaming: bool = False) -> DataFrame:
    """1-hour tumbling window per event type (twin of n6_tumbling_window)."""
    df = events.withWatermark("ts", "2 hours") if streaming else events
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(events: DataFrame, streaming: bool = False) -> DataFrame:
    """30-minute-gap sessions per user (twin of n7_sessionization)."""
    df = events.withWatermark("ts", "2 hours") if streaming else events
    return (
        df.groupBy(
            F.col("user_id"), F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def click_purchase_attribution(
    clicks: DataFrame, purchases: DataFrame, streaming: bool = False
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's click within the preceding hour.

    Both sides carry watermarks and the join condition bounds purchase_ts
    to [click_ts, click_ts + 1h] — that time bound is what lets the state
    store evict rows (an unbounded-condition stream-stream join would
    retain both sides forever). State is keyed by user_id, so it scales
    horizontally. The same function body serves the batch twin.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if streaming:
        c = c.withWatermark("click_ts", "2 hours")
        p = p.withWatermark("purchase_ts", "2 hours")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        )
    )
    return c.join(p, on=cond, how="inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def dedup_events(
    events: DataFrame, streaming: bool = False, watermark: str = "2 hours"
) -> DataFrame:
    """Exact streaming deduplication by event_id (the N1 dedup twin for
    streams — what an at-least-once ingestion pipeline runs first).

    Streaming uses ``dropDuplicatesWithinWatermark``: dedup keys live in
    the state store only until the watermark passes their event time, so
    state is bounded by (arrival rate × watermark delay) — a plain
    ``dropDuplicates`` on a stream retains every key forever and OOMs at
    100 TB. Duplicates arriving within ``watermark`` of each other are
    guaranteed to collapse; the batch twin is plain dropDuplicates.
    """
    if streaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


# -------------------------------------------- custom stateful operator

USER_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful streaming aggregate: running (count, sum) per user —
    the applyInPandasWithState escape hatch for semantics the built-in
    windows can't express (Arrow-batched, state store backed).

    The update function is a nested closure ON PURPOSE: cloudpickle then
    serializes it by value, so executor Python workers don't need this
    package importable (a driver process launched outside the repo root
    pickles module-level functions by reference and every task dies with
    ModuleNotFoundError)."""

    def update_user_totals(
        key: tuple, batches: Iterator, state: GroupState
    ) -> Iterator[Any]:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_user_totals,
        USER_TOTALS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _run_memory_sink(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str, mode: str
):
    """Drain a stream with availableNow into an in-memory table under the
    given output mode; returns the terminated StreamingQuery."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str
):
    """Drain a stream with availableNow into an in-memory table (tests)."""
    return _run_memory_sink(stream_df, query_name, checkpoint_dir, "complete")


def run_append_to_memory_sink(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str
):
    """Append mode: only FINALIZED windows (watermark passed) are emitted —
    the mode where late-data dropping is observable."""
    return _run_memory_sink(stream_df, query_name, checkpoint_dir, "append")


def run_update_to_memory_sink(
    stream_df: DataFrame, query_name: str, checkpoint_dir: str
):
    return _run_memory_sink(stream_df, query_name, checkpoint_dir, "update")


def enrich_with_segment(
    events: DataFrame, dim: DataFrame, streaming: bool = False
) -> DataFrame:
    """Stream-static enrichment join: tag each event with the market
    segment of its user (static dimension, broadcast) and aggregate value
    per 1-hour window x segment — the canonical "enrich the stream with a
    dim table" shape. The static side never needs state: Spark re-plans
    the broadcast per micro-batch, so dimension updates are picked up on
    the next trigger.

    Unmatched users fall into 'UNKNOWN' (left join + coalesce) — an
    enrichment stream must never drop events because the dim is stale."""
    df = events.withWatermark("ts", "2 hours") if streaming else events
    segment = F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN"))
    return (
        df.join(
            F.broadcast(dim.select("c_custkey", "c_mktsegment")),
            df["user_id"] == F.col("c_custkey"),
            "left",
        )
        .select("ts", "value", segment.alias("segment"))
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "total_value",
        )
    )


CEP_MATCH_SCHEMA = (
    "user_id bigint, view_ts timestamp, click_ts timestamp, "
    "purchase_ts timestamp, purchase_id bigint"
)
_CEP_STATE_SCHEMA = "lv bigint, lc bigint, lcv bigint"
_CEP_WINDOW_US = 24 * 3600 * 1_000_000  # 24-hour step window, closed


def cep_pattern_stream(events: DataFrame) -> DataFrame:
    """CEP-style pattern matcher: view -> click -> purchase, each step
    within 24 hours of the previous, per user. The classic complex-
    event-processing shape that neither windows nor a single stream-stream
    join expresses — state per user is three epoch-micro watermarks
    (latest view; latest QUALIFYING click and the view that qualified it),
    updated in event-time order; a purchase emits at most one match (the
    latest qualifying click, and that click's latest preceding view).
    State is O(1) per user regardless of history length — the property
    that keeps the state store bounded at 100 TB/day event volumes."""

    def match_patterns(key, batches, state) -> "Iterator[Any]":
        import pandas as pd

        lv, lc, lcv = state.get if state.exists else (-1, -1, -1)
        chunks = [pdf for pdf in batches]
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # ties broken by pattern stage (view < click < purchase) so an
        # equal-timestamp upstream event still qualifies — matching the
        # oracle's closed '<=' bounds; event_id last for determinism
        stage = pdf["event_type"].map({"view": 0, "click": 1, "purchase": 2})
        pdf = pdf.assign(_stage=stage).sort_values(
            ["ts", "_stage", "event_id"]
        )
        out_rows = []
        for ts, etype, eid in zip(
            pdf["ts"].astype("int64") // 1000, pdf["event_type"], pdf["event_id"]
        ):
            ts = int(ts)
            if etype == "view":
                lv = ts
            elif etype == "click":
                if lv >= 0 and ts - lv <= _CEP_WINDOW_US:
                    lc, lcv = ts, lv
            elif etype == "purchase":
                if lc >= 0 and ts - lc <= _CEP_WINDOW_US:
                    out_rows.append((int(key[0]), lcv, lc, ts, int(eid)))
        state.update((lv, lc, lcv))
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out_rows],
                "view_ts": pd.to_datetime([r[1] for r in out_rows], unit="us"),
                "click_ts": pd.to_datetime([r[2] for r in out_rows], unit="us"),
                "purchase_ts": pd.to_datetime(
                    [r[3] for r in out_rows], unit="us"
                ),
                "purchase_id": [r[4] for r in out_rows],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        match_patterns,
        CEP_MATCH_SCHEMA,
        _CEP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def click_purchase_attribution_outer(
    clicks: DataFrame, purchases: DataFrame, streaming: bool = False
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits — matched
    clicks with their purchase, UNMATCHED clicks with NULLs once the
    watermark closes their 1-hour join window (outer emission is the
    semantics inner joins cannot express: 'which clicks converted, and
    which provably did not').

    Outer stream-stream joins REQUIRE watermarks on both sides plus a
    time-bound join condition — that is what lets Spark prove a left row
    can no longer match and emit its NULL row instead of holding state
    forever. Same body serves the batch twin.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if streaming:
        c = c.withWatermark("click_ts", "2 hours")
        p = p.withWatermark("purchase_ts", "2 hours")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        )
    )
    return c.join(p, on=cond, how="leftOuter").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
