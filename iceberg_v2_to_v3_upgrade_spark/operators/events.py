"""[EXT] Event-stream analytics over ``events`` (SURVEY.md §2.N6-N9).

Batch twins of the streaming jobs in ``streaming/jobs.py`` — identical
logical plans, which is exactly how Structured Streaming treats them; the
DuckDB oracle checks the batch twin, tests check batch==streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare


@declare(
    "n6_tumbling_window",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("ext", "events", "window"),
)
def n6_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per event type (F.window).

    The streaming twin adds withWatermark; the aggregate and window
    assignment are identical. Group-key cardinality = hours x types, so the
    shuffle stays tiny at any input scale.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
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
        .orderBy("window_start", "event_type")
    )


@declare(
    "n6b_sliding_window",
    oracle="""
        WITH grid AS (
            SELECT event_type, value,
                   date_trunc('hour', ts)
                     + CASE WHEN extract(minute FROM ts) >= 30
                            THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
                     AS slot
            FROM events),
        expanded AS (
            SELECT event_type, value,
                   unnest([slot, slot - INTERVAL 30 MINUTE]) AS window_start
            FROM grid)
        SELECT window_start, event_type,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("ext", "events", "window"),
)
def n6b_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1 hour wide, 30-minute slide (each event lands in 2
    windows). Spark assigns via F.window(ts, '1 hour', '30 minutes'); the
    oracle expands each event to its two epoch-aligned window starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
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
        .orderBy("window_start", "event_type")
    )


@declare(
    "n7_sessionization",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events),
        numbered AS (
            SELECT user_id, ts, value,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS session_no
            FROM ordered)
        SELECT user_id, min(ts) AS session_start,
               count(*) AS n_events, round(sum(value), 2) AS session_value
        FROM numbered GROUP BY user_id, session_no
        ORDER BY user_id, session_start
    """,
    tags=("ext", "events", "session"),
)
def n7_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap via F.session_window.

    session_window.start == min(ts) of the session, which is what the
    gap-and-islands oracle computes. One shuffle keyed on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
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
        .orderBy("user_id", "session_start")
    )


@declare("n8_approx_distinct_users", oracle=None, tags=("ext", "events", "approx"))
def n8_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) of users per event type —
    the constant-memory distinct at 100 TB. Approximate by construction,
    so declared rows-only; tests bound its error against the exact count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@declare(
    "n9_json_extract",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("ext", "events", "json"),
)
def n9_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the string `props` column
    (get_json_object — JVM-side JSON path, no UDF) + grouped stats."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
