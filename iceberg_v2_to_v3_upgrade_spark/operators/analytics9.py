"""Declared queries, round 3 batch H: importance resampling to a target
length mixture.

The data-mixture half-sibling of n15 (source mixture) and n27 (quality
weighting): given a TARGET share per length bucket, compute per-bucket
acceptance rates and hash-sample each bucket down to it — one scan, no
second pass, membership a pure function of doc_id (stable under any
cluster size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_TARGETS = (("short", 0.25), ("medium", 0.35), ("long", 0.40))

_RESAMPLE_ORACLE = """
    WITH bucketed AS (
        SELECT doc_id,
               CASE WHEN n_chars < 220 THEN 'short'
                    WHEN n_chars < 380 THEN 'medium'
                    ELSE 'long' END AS bucket,
               (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)
                   / 4294967297.0 AS u
        FROM documents),
    shares AS (
        SELECT bucket, count(*) AS n_docs,
               count(*) * 1.0 / (SELECT count(*) FROM documents)
                   AS actual_share
        FROM bucketed GROUP BY 1),
    targets AS (
        SELECT * FROM (VALUES ('short', 0.25), ('medium', 0.35),
                              ('long', 0.40)) t(bucket, target_share)),
    rated AS (
        SELECT s.bucket, s.n_docs, s.actual_share,
               least(1.0, t.target_share / s.actual_share) AS rate
        FROM shares s JOIN targets t USING (bucket)),
    kept AS (
        SELECT b.bucket, count(*) AS n_kept
        FROM bucketed b JOIN rated r USING (bucket)
        WHERE b.u < r.rate
        GROUP BY 1)
    SELECT r.bucket, r.n_docs,
           coalesce(k.n_kept, 0) AS n_kept,
           round(r.actual_share, 4) AS actual_share,
           round(r.rate, 4) AS accept_rate
    FROM rated r LEFT JOIN kept k USING (bucket)
    ORDER BY r.bucket
"""


@declare(
    "n94_target_mixture_resample",
    oracle=_RESAMPLE_ORACLE,
    tags=("ext", "sampling", "training-data"),
)
def n94_target_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling to a target length mixture: per length
    bucket, acceptance rate = min(1, target_share / actual_share); a doc
    survives iff its md5-derived uniform u < rate. Everything is one
    scan + one bucket-level aggregate (3 rows) broadcast back — no
    rejection loop, no global sort, and membership is reproducible
    across engines and cluster sizes (the n11/n73 hash idiom)."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1
    ) / 4294967297.0
    bucketed = docs.select(
        "doc_id",
        F.when(F.col("n_chars") < 220, "short")
        .when(F.col("n_chars") < 380, "medium")
        .otherwise("long")
        .alias("bucket"),
        u.alias("u"),
    )
    total = Window.partitionBy()
    shares = (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "actual_share",
            F.col("n_docs") * 1.0 / F.sum("n_docs").over(total),
        )
    )
    targets = spark.createDataFrame(
        list(_TARGETS), "bucket string, target_share double"
    )
    rated = shares.join(F.broadcast(targets), "bucket").withColumn(
        "rate",
        F.least(F.lit(1.0), F.col("target_share") / F.col("actual_share")),
    )
    kept = (
        bucketed.join(F.broadcast(rated.select("bucket", "rate")), "bucket")
        .filter(F.col("u") < F.col("rate"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rated.join(kept, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round("actual_share", 4).alias("actual_share"),
            F.round("rate", 4).alias("accept_rate"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------- n95


_QUANTILE_DRIFT_ORACLE = """
    WITH weekly AS (
        SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
               round(quantile_cont(value, 0.5), 4) + 0.0 AS p50,
               round(quantile_cont(value, 0.9), 4) + 0.0 AS p90,
               count(*) AS n_events
        FROM events GROUP BY 1)
    SELECT week_start, n_events, p50, p90,
           round(p50 - lag(p50) OVER (ORDER BY week_start), 4) + 0.0
               AS p50_drift,
           round(p90 - lag(p90) OVER (ORDER BY week_start), 4) + 0.0
               AS p90_drift
    FROM weekly ORDER BY week_start
"""


@declare(
    "n95_quantile_drift_weekly",
    oracle=_QUANTILE_DRIFT_ORACLE,
    tags=("ext", "events", "monitoring"),
)
def n95_quantile_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: weekly P50/P90 of the value column
    with week-over-week deltas — the basic input-drift check an ML-ops
    pipeline runs on every feature. EXACT continuous quantiles
    (percentile, linear interpolation — matches DuckDB quantile_cont
    bit-for-bit on the same doubles), one week-keyed shuffle, drift from
    one lag window over the O(weeks) frame."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(F.date_trunc("week", "ts").alias("week_start")).agg(
        (F.round(F.expr("percentile(value, 0.5)"), 4) + F.lit(0.0)).alias(
            "p50"
        ),
        (F.round(F.expr("percentile(value, 0.9)"), 4) + F.lit(0.0)).alias(
            "p90"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy("week_start")
    return weekly.select(
        "week_start",
        "n_events",
        "p50",
        "p90",
        (F.round(F.col("p50") - F.lag("p50").over(w), 4) + F.lit(0.0)).alias(
            "p50_drift"
        ),
        (F.round(F.col("p90") - F.lag("p90").over(w), 4) + F.lit(0.0)).alias(
            "p90_drift"
        ),
    ).orderBy("week_start")


# --------------------------------------------------------------- n96


_PSI_ORACLE = """
    WITH base AS (
        SELECT value,
               CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                    THEN 'ref' ELSE 'cur' END AS period
        FROM events),
    edges AS (
        SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
                   AS e
        FROM base WHERE period = 'ref'),
    bucketed AS (
        SELECT period,
               1 + len(list_filter(edges.e, x -> x <= value)) AS bucket
        FROM base, edges),
    counts AS (
        SELECT bucket,
               sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS n_cur
        FROM bucketed GROUP BY 1),
    shares AS (
        SELECT bucket,
               greatest(n_ref * 1.0 / (SELECT sum(n_ref) FROM counts),
                        1e-6) AS p_ref,
               greatest(n_cur * 1.0 / (SELECT sum(n_cur) FROM counts),
                        1e-6) AS p_cur
        FROM counts)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) + 0.0 AS psi
    FROM shares
"""


@declare(
    "n96_psi_drift", oracle=_PSI_ORACLE, tags=("ext", "events", "monitoring")
)
def n96_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between a reference period (first two
    fixture weeks) and the current one, over decile buckets of the
    reference distribution — the monitoring metric scorecards use beside
    KL (n21). Bucket edges are EXACT reference deciles (percentile,
    interpolating — bit-identical to DuckDB quantile_cont); shares are
    floored at 1e-6 exactly as the oracle floors them, so empty buckets
    contribute identically. One scan + one 10-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "value",
        F.when(
            F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"),
            "ref",
        )
        .otherwise("cur")
        .alias("period"),
    )
    edges = base.filter(F.col("period") == "ref").agg(
        F.expr(
            "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("e")
    )
    bucketed = base.crossJoin(F.broadcast(edges)).select(
        "period",
        (
            1 + F.size(F.filter("e", lambda x: x <= F.col("value")))
        ).alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("n_cur"),
    )
    tot = Window.partitionBy()
    shares = counts.select(
        "bucket",
        F.greatest(
            F.col("n_ref") * 1.0 / F.sum("n_ref").over(tot), F.lit(1e-6)
        ).alias("p_ref"),
        F.greatest(
            F.col("n_cur") * 1.0 / F.sum("n_cur").over(tot), F.lit(1e-6)
        ).alias("p_cur"),
    )
    return shares.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        (
            F.round(
                F.sum(
                    (F.col("p_cur") - F.col("p_ref"))
                    * F.log(F.col("p_cur") / F.col("p_ref"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("psi"),
    )
