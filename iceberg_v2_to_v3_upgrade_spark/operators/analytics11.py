"""Declared queries, round 3 batch J: seasonal decomposition and Neyman
sampling allocation.

e9 decomposes the daily event series into trend / weekly seasonality /
residual (the STL-lite every monitoring stack runs before alerting on the
residual); n97 computes the optimal per-stratum sample allocation
(Neyman: n_h ∝ N_h·S_h) that survey-grade data valuation uses instead of
proportional sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- e9


_STL_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1),
    trended AS (
        SELECT day, n_events,
               avg(n_events * 1.0) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
        FROM daily),
    seasonal AS (
        SELECT day, n_events, trend,
               avg(n_events - trend) OVER (
                   PARTITION BY dayofweek(day)) AS season
        FROM trended)
    SELECT day, n_events,
           round(trend, 4) + 0.0 AS trend,
           round(season, 4) + 0.0 AS season,
           round(n_events - trend - season, 4) + 0.0 AS residual
    FROM seasonal ORDER BY day
"""


@declare(
    "e9_seasonal_decomposition",
    oracle=_STL_ORACLE,
    tags=("ext", "events", "timeseries"),
)
def e9_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of the daily event count: trend = centered
    7-day moving average (edges use the available window — both engines
    share the frame, so edge behavior matches), weekly seasonality =
    day-of-week mean of the detrended series, residual = the rest — what
    an alerting pipeline thresholds instead of the raw series. Entirely
    windows over the O(days) frame; one shuffle for the daily count."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w_ma = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn(
        "trend", F.avg(F.col("n_events") * 1.0).over(w_ma)
    )
    # Spark dayofweek() is 1(Sun)..7; DuckDB dayofweek() is 0(Sun)..6 —
    # partitioning keys only need to AGREE on the grouping, and both
    # index the same weekday, so the group means coincide
    w_dow = Window.partitionBy(F.dayofweek("day"))
    seasonal = trended.withColumn(
        "season", F.avg(F.col("n_events") - F.col("trend")).over(w_dow)
    )
    return seasonal.select(
        "day",
        "n_events",
        (F.round("trend", 4) + F.lit(0.0)).alias("trend"),
        (F.round("season", 4) + F.lit(0.0)).alias("season"),
        (
            F.round(
                F.col("n_events") - F.col("trend") - F.col("season"), 4
            )
            + F.lit(0.0)
        ).alias("residual"),
    ).orderBy("day")


# --------------------------------------------------------------- n97


_NEYMAN_ORACLE = """
    WITH strata AS (
        SELECT event_type, count(*) AS n_rows,
               stddev_samp(value) AS s
        FROM events GROUP BY 1),
    alloc AS (
        SELECT event_type, n_rows, s,
               n_rows * s / (SELECT sum(n_rows * s) FROM strata) AS share
        FROM strata)
    SELECT event_type, n_rows,
           round(s, 4) + 0.0 AS stratum_std,
           round(share, 6) + 0.0 AS alloc_share,
           CAST(round(1000 * round(share, 6)) AS BIGINT) AS n_alloc
    FROM alloc ORDER BY event_type
"""


@declare(
    "n97_neyman_allocation",
    oracle=_NEYMAN_ORACLE,
    tags=("ext", "events", "sampling", "stats"),
)
def n97_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: a 1000-row budget
    split across event-type strata proportional to N_h * S_h — minimum-
    variance mean estimation, the survey-sampling upgrade over n11's
    proportional split. One stratum-keyed aggregate; the allocation math
    runs on the 5-row stratum frame. n_alloc derives from the 6-decimal
    ROUNDED share so both engines round the same double."""
    ev = load_table(spark, sf_dir, "events")
    strata = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.stddev_samp("value").alias("s"),
    )
    tot = Window.partitionBy()
    alloc = strata.withColumn(
        "share",
        F.col("n_rows")
        * F.col("s")
        / F.sum(F.col("n_rows") * F.col("s")).over(tot),
    )
    return alloc.select(
        "event_type",
        "n_rows",
        (F.round("s", 4) + F.lit(0.0)).alias("stratum_std"),
        (F.round("share", 6) + F.lit(0.0)).alias("alloc_share"),
        F.round(1000 * F.round(F.col("share"), 6))
        .cast("bigint")
        .alias("n_alloc"),
    ).orderBy("event_type")


# --------------------------------------------------------------- n98


_CONFORMAL_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1),
    resid AS (
        SELECT day,
               n_events - avg(n_events * 1.0) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS r
        FROM daily),
    cal AS (
        SELECT quantile_cont(abs(r), 0.9) AS thr
        FROM resid WHERE day < DATE '2024-01-21'),
    cur AS (SELECT r FROM resid WHERE day >= DATE '2024-01-21')
    SELECT round(c.thr, 4) + 0.0 AS threshold,
           count(*) AS n_current,
           CAST(sum(CASE WHEN abs(cur.r) > c.thr THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           round(sum(CASE WHEN abs(cur.r) > c.thr THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) + 0.0 AS flag_rate
    FROM cur, cal c GROUP BY c.thr
"""


@declare(
    "n98_conformal_outlier_calibration",
    oracle=_CONFORMAL_ORACLE,
    tags=("ext", "events", "monitoring", "stats"),
)
def n98_conformal_outlier_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal outlier gate: the |residual| threshold is the
    exact 90th percentile CALIBRATED on the first 20 fixture days, then
    applied to the held-out tail — so the flag rate has a distribution-
    free ~10% guarantee instead of a hand-tuned z-score (n41/n80's
    parametric siblings). Residuals come from the same centered-7-day
    trend as e9; the threshold is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w_ma = Window.orderBy("day").rowsBetween(-3, 3)
    resid = daily.select(
        "day",
        (F.col("n_events") - F.avg(F.col("n_events") * 1.0).over(w_ma)).alias(
            "r"
        ),
    )
    split = F.lit("2024-01-21").cast("date")
    cal = resid.filter(F.col("day") < split).agg(
        F.expr("percentile(abs(r), 0.9)").alias("thr")
    )
    cur = resid.filter(F.col("day") >= split)
    return (
        cur.crossJoin(F.broadcast(cal))
        .agg(
            (F.round(F.first("thr"), 4) + F.lit(0.0)).alias("threshold"),
            F.count(F.lit(1)).alias("n_current"),
            F.sum(F.when(F.abs("r") > F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            (
                F.round(
                    F.sum(
                        F.when(F.abs("r") > F.col("thr"), 1).otherwise(0)
                    )
                    * 1.0
                    / F.count(F.lit(1)),
                    4,
                )
                + F.lit(0.0)
            ).alias("flag_rate"),
        )
        # the oracle's GROUP BY over an empty held-out period yields 0
        # rows; an ungrouped Spark agg always yields 1 — align the shapes
        # so a fixture whose date range ends before the split stays green
        .where(F.col("n_current") > 0)
    )


# --------------------------------------------------------------- h21


_MAP_HOF_ORACLE = """
    WITH t AS (
        SELECT n_name, MAP {'key': n_nationkey, 'reg': n_regionkey} AS m
        FROM nation)
    SELECT n_name,
           m['reg'][1] AS reg_key,
           len(list_filter(map_entries(m), e -> e.value % 2 = 0))
               AS n_even_vals,
           array_to_string(
               list_sort(list_transform(
                   map_entries(m),
                   e -> e.key || ':' || CAST(e.value * 2 AS VARCHAR))),
               ',') AS doubled_entries
    FROM t ORDER BY n_name
"""


@declare("h21_map_hof", oracle=_MAP_HOF_ORACLE, tags=("scalar", "nested"))
def h21_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map lambda HOFs — transform_values, map_filter, map_entries —
    the map-typed half of the nested-compute surface (h20 covered
    arrays). Entry lists are sorted and joined to strings so the result
    stays driver-hashable; DuckDB's map extraction returns a LIST, hence
    the oracle's [1] (the h12 idiom)."""
    n = load_table(spark, sf_dir, "nation")
    t = n.select(
        "n_name",
        F.create_map(
            F.lit("key"), F.col("n_nationkey"),
            F.lit("reg"), F.col("n_regionkey"),
        ).alias("m"),
    )
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    return t.select(
        "n_name",
        F.element_at("m", "reg").alias("reg_key"),
        F.size(F.map_filter(F.col("m"), lambda k, v: v % 2 == 0)).alias(
            "n_even_vals"
        ),
        F.array_join(
            F.sort_array(
                F.transform(
                    F.map_entries(doubled),
                    lambda e: F.concat_ws(
                        ":", e.key, e.value.cast("string")
                    ),
                )
            ),
            ",",
        ).alias("doubled_entries"),
    ).orderBy("n_name")


# --------------------------------------------------------------- n99


_CUPED_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               sum(CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00'
                        THEN value ELSE 0 END) AS x_pre,
               sum(CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
                        THEN value ELSE 0 END) AS y_post
        FROM events GROUP BY 1),
    stats AS (
        SELECT count(*) AS n_users,
               covar_samp(x_pre, y_post) / var_samp(x_pre) AS theta,
               var_samp(y_post) AS var_y,
               corr(x_pre, y_post) AS rho
        FROM per_user)
    SELECT n_users,
           round(theta, 4) + 0.0 AS theta,
           round(var_y, 2) + 0.0 AS var_raw,
           round(var_y * (1 - rho * rho), 2) + 0.0 AS var_adjusted,
           round(rho * rho, 4) + 0.0 AS var_reduction
    FROM stats
"""


@declare(
    "n99_cuped_variance_reduction",
    oracle=_CUPED_ORACLE,
    tags=("ext", "events", "stats"),
)
def n99_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled pre-period covariate adjustment): theta =
    cov(X_pre, Y_post)/var(X_pre) over per-user week-1 vs post-period
    value sums; the adjusted metric's variance shrinks by rho^2 — the
    experimentation-platform trick that makes n82's z-test detect
    effects with far fewer users. One user-keyed aggregate; the moment
    statistics are single-pass built-in aggregates (covar_samp /
    var_samp / corr, identical definitions in both engines)."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-08 00:00:00").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)).alias(
            "x_pre"
        ),
        F.sum(
            F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)
        ).alias("y_post"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        (
            F.round(
                F.covar_samp("x_pre", "y_post") / F.var_samp("x_pre"), 4
            )
            + F.lit(0.0)
        ).alias("theta"),
        (F.round(F.var_samp("y_post"), 2) + F.lit(0.0)).alias("var_raw"),
        (
            F.round(
                F.var_samp("y_post")
                * (1 - F.corr("x_pre", "y_post") * F.corr("x_pre", "y_post")),
                2,
            )
            + F.lit(0.0)
        ).alias("var_adjusted"),
        (
            F.round(
                F.corr("x_pre", "y_post") * F.corr("x_pre", "y_post"), 4
            )
            + F.lit(0.0)
        ).alias("var_reduction"),
    )
