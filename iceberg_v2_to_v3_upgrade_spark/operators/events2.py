"""[EXT] Event analytics over ``events``, part 2: rate-anomaly detection,
RFM user segmentation, and event-transition (Markov) matrices.

Same contract as operators/events.py: window/grouped aggregations over the
(user_id | event_type)-keyed shuffle, deterministic tie-breaks everywhere a
window order feeds a ranking function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_ANOMALY_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
        FROM events GROUP BY event_type, h),
    scored AS (
        SELECT event_type, h, c,
               (c - avg(c) OVER (PARTITION BY event_type))
                 / stddev_samp(c) OVER (PARTITION BY event_type) AS z
        FROM hourly)
    SELECT event_type, h, c, round(z, 4) AS zscore
    FROM scored WHERE abs(z) >= 2.0
    ORDER BY event_type, h
"""


@declare(
    "n41_hourly_anomaly_zscore",
    oracle=_ANOMALY_ORACLE,
    tags=("ext", "events", "anomaly"),
)
def n41_hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-anomaly detection: hourly event counts per type, z-scored
    against that type's own hourly distribution; emit |z| >= 2 hours.

    Two-level aggregation: the hourly rollup shrinks the data to
    (types x hours) rows before the per-type window runs, so the window
    state is tiny no matter how many raw events feed it. At 100 TB the
    only full-data pass is the first grouped count, with map-side
    partial aggregation on (event_type, hour).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type")
    scored = hourly.withColumn(
        "z",
        (F.col("c") - F.avg("c").over(w)) / F.stddev_samp("c").over(w),
    )
    return (
        scored.filter(F.abs(F.col("z")) >= 2.0)
        .select("event_type", "h", "c", F.round("z", 4).alias("zscore"))
        .orderBy("event_type", "h")
    )


_RFM_ORACLE = """
    WITH u AS (
        SELECT user_id,
               date_diff('day', CAST(max(ts) AS DATE),
                         (SELECT CAST(max(ts) AS DATE) FROM events))
                   AS r_days,
               count(*) AS f,
               round(sum(value), 2) AS m
        FROM events GROUP BY user_id)
    SELECT user_id, r_days, f, m,
           ntile(4) OVER (ORDER BY r_days, user_id) AS r_q,
           ntile(4) OVER (ORDER BY f DESC, user_id) AS f_q,
           ntile(4) OVER (ORDER BY m DESC, user_id) AS m_q
    FROM u ORDER BY user_id
"""


@declare("n42_rfm_segments", oracle=_RFM_ORACLE, tags=("ext", "events"))
def n42_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (days since last event),
    frequency, and monetary value, each cut into quartiles via ntile.

    Monetary is rounded BEFORE it feeds the ntile order so the quartile
    boundary cannot move on sub-cent float drift between engines; every
    ntile order carries a user_id tie-break for the same reason. The
    ntile windows are unpartitioned (a global sort of one row per user) —
    at extreme user counts the quartiles would come from approx_percentile
    instead; the per-user rollup stage is the scalable part either way.
    """
    ev = load_table(spark, sf_dir, "events")
    global_max = ev.agg(F.max(F.to_date("ts")).alias("gmax"))
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("f"),
            F.round(F.sum("value"), 2).alias("m"),
        )
        .crossJoin(F.broadcast(global_max))
        .select(
            "user_id",
            F.datediff(F.col("gmax"), F.col("last_day")).alias("r_days"),
            "f",
            "m",
        )
    )
    return u.select(
        "user_id",
        "r_days",
        "f",
        "m",
        F.ntile(4).over(Window.orderBy("r_days", "user_id")).alias("r_q"),
        F.ntile(4).over(Window.orderBy(F.desc("f"), "user_id")).alias("f_q"),
        F.ntile(4).over(Window.orderBy(F.desc("m"), "user_id")).alias("m_q"),
    ).orderBy("user_id")


_TRANSITIONS_ORACLE = """
    WITH s AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events)
    SELECT prev, event_type AS next, count(*) AS n,
           round(count(*) / sum(count(*)) OVER (PARTITION BY prev), 6) AS p
    FROM s WHERE prev IS NOT NULL
    GROUP BY prev, next ORDER BY prev, next
"""


@declare(
    "n43_event_transitions", oracle=_TRANSITIONS_ORACLE, tags=("ext", "events")
)
def n43_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    counts and row-normalized probabilities for each (prev -> next) pair.

    One shuffle on user_id for the lag window (ordered by (ts, event_id)
    — event_id breaks same-timestamp ties so both engines sequence
    identical streams), then a grouped count whose output is bounded by
    |event_type|^2 regardless of input size.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    counts = s.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy("prev")
    return (
        counts.select(
            "prev",
            "next",
            "n",
            F.round(F.col("n") / F.sum("n").over(total), 6).alias("p"),
        )
        .orderBy("prev", "next")
    )


@declare(
    "e7_rolling_median_ewma",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
            FROM events GROUP BY 1, 2),
        w AS (
            SELECT event_type, h, n,
                   round((median(n) OVER (PARTITION BY event_type ORDER BY h
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                         )::DOUBLE, 4) AS med7,
                   round((n * 0.4
                          + coalesce(lag(n, 1) OVER (PARTITION BY event_type
                                                     ORDER BY h), 0)
                            * 0.4 * 0.6
                          + coalesce(lag(n, 2) OVER (PARTITION BY event_type
                                                     ORDER BY h), 0)
                            * 0.4 * 0.36
                          + coalesce(lag(n, 3) OVER (PARTITION BY event_type
                                                     ORDER BY h), 0)
                            * 0.4 * 0.216)::DOUBLE, 4) AS ewma4
            FROM hourly)
        SELECT event_type, h, n, med7, ewma4 FROM w
        ORDER BY event_type, h
    """,
    tags=("ext", "events", "window", "timeseries"),
)
def e7_rolling_median_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust time-series smoothing over hourly event rates: a 7-point
    rolling MEDIAN (outlier-resistant trend — a single burst hour cannot
    drag it, unlike a rolling mean) and a 4-term truncated EWMA (alpha
    0.4, unrolled as lag terms so it stays a plain window expression —
    the infinite-horizon recurrence is not window-expressible and the
    truncation error is (1-alpha)^4 ≈ 13% of unit weight, fine for a
    trend signal). Steps are per OBSERVED hour (both engines see the
    same row sequence, so gap semantics agree).

    Two-level shape: the corpus collapses to (type × hour) rows first;
    every window runs over that tiny rollup, never the raw events."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_ord = W.partitionBy("event_type").orderBy("h")
    w_frame = w_ord.rowsBetween(-6, 0)
    ewma = (
        F.col("n") * 0.4
        + F.coalesce(F.lag("n", 1).over(w_ord), F.lit(0)) * 0.4 * 0.6
        + F.coalesce(F.lag("n", 2).over(w_ord), F.lit(0)) * 0.4 * 0.36
        + F.coalesce(F.lag("n", 3).over(w_ord), F.lit(0)) * 0.4 * 0.216
    )
    return (
        hourly.select(
            "event_type",
            "h",
            "n",
            F.round(
                F.percentile("n", F.lit(0.5)).over(w_frame).cast("double"), 4
            ).alias("med7"),
            F.round(ewma.cast("double"), 4).alias("ewma4"),
        )
        .orderBy("event_type", "h")
    )
