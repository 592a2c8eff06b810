"""Declared queries, round 3 batch E: dynamic partition pruning, the
chi-square independence test, and per-document duplication coverage.

k10 exercises Spark's runtime DPP — the scan-side optimization that makes
star joins viable on date-partitioned 100 TB facts (the dim subquery runs
first and its day list prunes fact partitions before any file is listed).
n88/n89 extend the corpus-diagnostics family with a classic statistical
test and the exact-substring duplication-coverage signal from the
dedup-training-data literature.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- k10


#: day-partitioned copies of events, staged once per (process, sf_dir)
_DPP_STAGE: dict[str, str] = {}


def _stage_events_by_day(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _DPP_STAGE:
        stage = tempfile.mkdtemp(prefix="dpp_events_")
        path = os.path.join(stage, "events_by_day")
        (
            load_table(spark, sf_dir, "events")
            .withColumn("day", F.col("ts").cast("date").cast("string"))
            .write.partitionBy("day")
            .parquet(path)
        )
        _DPP_STAGE[sf_dir] = path
    return _DPP_STAGE[sf_dir]


_DPP_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
        FROM events GROUP BY 1),
    bad_days AS (
        SELECT day FROM daily
        WHERE errs > (SELECT avg(errs) FROM daily))
    SELECT e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 2) AS sum_value
    FROM events e
    JOIN bad_days b ON CAST(e.ts AS DATE) = b.day
    GROUP BY 1 ORDER BY 1
"""


@declare(
    "k10_dynamic_partition_pruning",
    oracle=_DPP_ORACLE,
    tags=("scale", "events"),
)
def k10_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event stats on high-error days, over a DAY-PARTITIONED copy of
    events, with the day list only known at runtime (days whose error
    count exceeds the mean) — the exact shape where Spark's dynamic
    partition pruning fires: the dim aggregate executes first and its
    day list becomes a partition filter on the fact scan
    (``dynamicpruningexpression`` in the plan, pinned by
    tests/test_plan_quality_r3e.py). At 100 TB this is the difference
    between scanning 30 days and scanning the handful that matter."""
    path = _stage_events_by_day(spark, sf_dir)
    fact = spark.read.parquet(path)
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("errs")
        )
    )
    # scalar aggregate collected to a LITERAL on purpose: Spark's
    # PartitionPruning rule wants a likely-selective predicate (literal
    # comparison) on the dim side — an attribute-vs-attribute filter from
    # a crossJoin defeats it. Bit-identical to the oracle's subquery:
    # integer sums are exact in doubles, so both engines compute the
    # same mean.
    mean_errs = float(daily.agg(F.avg("errs")).collect()[0][0])
    bad_days = daily.filter(F.col("errs") > mean_errs).select("day")
    return (
        fact.join(bad_days, "day")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------- n88


_CHI2_ORACLE = """
    WITH cells AS (
        SELECT lang, source, count(*) AS obs
        FROM documents GROUP BY 1, 2),
    margins AS (
        SELECT lang, source, obs,
               sum(obs) OVER (PARTITION BY lang) AS row_total,
               sum(obs) OVER (PARTITION BY source) AS col_total,
               sum(obs) OVER () AS n
        FROM cells)
    SELECT CAST(((SELECT count(DISTINCT lang) FROM documents) - 1)
               * ((SELECT count(DISTINCT source) FROM documents) - 1)
               AS BIGINT) AS dof,
           CAST(max(n) AS BIGINT) AS n_docs,
           round(sum((obs - row_total * col_total * 1.0 / n)
                     * (obs - row_total * col_total * 1.0 / n)
                     / (row_total * col_total * 1.0 / n)), 4) + 0.0
               AS chi2
    FROM margins
"""


@declare(
    "n88_lang_source_chi2", oracle=_CHI2_ORACLE, tags=("ext", "text", "stats")
)
def n88_lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between language and source — the
    standard check that a corpus's language mix is (or is not) uniform
    across sources before mixing them into a training run. Expected
    counts come from the margin windows over the TINY contingency frame
    (|langs| x |sources| cells); only the cell count itself touches the
    full table — one shuffle, map-side combined. Note: cells absent from
    the contingency table (obs=0) contribute their expectation to the
    exact statistic but are omitted identically by both formulations."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    margins = cells.select(
        "obs",
        F.sum("obs").over(Window.partitionBy("lang")).alias("row_total"),
        F.sum("obs").over(Window.partitionBy("source")).alias("col_total"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    dims = docs.agg(
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).alias("dof")
    )
    exp = F.col("row_total") * F.col("col_total") * 1.0 / F.col("n")
    stats = margins.agg(
        F.max("n").alias("n_docs"),
        (
            F.round(F.sum((F.col("obs") - exp) * (F.col("obs") - exp) / exp), 4)
            + F.lit(0.0)
        ).alias("chi2"),
    )
    return F.broadcast(dims).crossJoin(stats).select("dof", "n_docs", "chi2")


# --------------------------------------------------------------- n89


_DUP_COVERAGE_ORACLE = """
    WITH grams AS (
        SELECT doc_id, sub.gram
        FROM (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 7),
                       i -> array_to_string(
                           list_slice(string_split(text, ' '), i, i + 7), ' ')
                   ) AS gs
            FROM documents),
            unnest(gs) AS sub(gram)),
    distinct_grams AS (
        SELECT DISTINCT doc_id, gram FROM grams),
    shared AS (
        SELECT gram FROM distinct_grams
        GROUP BY gram HAVING count(*) >= 2),
    coverage AS (
        SELECT d.doc_id,
               count(*) AS n_grams,
               sum(CASE WHEN s.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
        FROM distinct_grams d LEFT JOIN shared s USING (gram)
        GROUP BY 1)
    SELECT CAST(floor(n_shared * 10.0 / n_grams) AS BIGINT) AS decile,
           count(*) AS n_docs,
           round(avg(n_shared * 1.0 / n_grams), 4) + 0.0 AS avg_coverage
    FROM coverage GROUP BY 1 ORDER BY 1
"""


@declare(
    "n89_duplication_coverage",
    oracle=_DUP_COVERAGE_ORACLE,
    tags=("ext", "dedup", "text"),
)
def n89_duplication_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication coverage: the fraction of a doc's
    distinct word 8-grams that appear in at least one OTHER document —
    the exact-substring duplication signal (Lee et al.'s dedup metric,
    gram-approximated) that complements pairwise containment (n79):
    coverage flags boilerplate-heavy docs even when no single partner
    passes a pairwise threshold.

    Shape: explode 8-grams -> distinct (doc, gram) -> gram-keyed count
    filtered to >=2 docs -> left join back -> per-doc ratio, histogrammed
    by decile. Two keyed shuffles (gram, doc_id), both map-side
    combinable; the gram key space is bounded by total corpus tokens, so
    the plan survives a 1000x scale-up with salting-free uniform keys."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # guard: sequence(0, size-8) runs BACKWARD for docs under 8 tokens
    # (Spark steps -1 when stop < start) and slice(start=0) then throws —
    # short docs must contribute an empty gram array, exactly like the
    # oracle's generate_series(1, len-7)
    gram_idx = F.when(
        F.size(toks) >= 8, F.sequence(F.lit(0), F.size(toks) - 8)
    ).otherwise(F.array().cast("array<int>"))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                gram_idx,
                lambda i: F.array_join(F.slice(toks, i + 1, 8), " "),
            )
        ).alias("gram"),
    ).distinct()
    shared = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    coverage = (
        grams.join(shared.withColumn("hit", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_shared"),
        )
    )
    return (
        coverage.groupBy(
            F.floor(F.col("n_shared") * 10.0 / F.col("n_grams"))
            .cast("bigint")
            .alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.round(F.avg(F.col("n_shared") * 1.0 / F.col("n_grams")), 4)
                + F.lit(0.0)
            ).alias("avg_coverage"),
        )
        .orderBy("decile")
    )
