"""Declared queries, round 4 batch A: bucketed numeric histograms,
period-over-period revenue deltas, positional explode, and token-budget
truncation accounting.

d22 profiles the price distribution as a fixed-width bucket histogram
(the `width_bucket` idiom, expressed as floor division so Spark and
DuckDB agree bit-for-bit); e11 is the month-over-month revenue delta
every BI layer computes (window lag over a month-truncated aggregate);
h23 exercises POSITIONAL explode (posexplode) — element order matters,
unlike the bag semantics of plain explode; n107 budgets documents
against a fixed token limit and accounts the truncation loss per source
— the first question a training-data pipeline asks of a new corpus
("how much do we lose at sequence length L?").

Scale posture (100 TB): d22/e11/n107 are single-scan partial aggregates
onto metadata-sized frames (buckets, months, sources). h23's explode
fans out by words-per-doc and immediately re-aggregates by doc_id — the
same shape as the n4 text family; no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- d22


_HISTOGRAM_ORACLE = """
    SELECT l_returnflag,
           CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY l_returnflag, bucket
    ORDER BY l_returnflag, bucket
"""


@declare("d22_price_histogram", oracle=_HISTOGRAM_ORACLE, tags=("agg", "profile"))
def d22_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width bucket histogram of extended price per return flag —
    the `width_bucket`/`histogram_numeric` profiling idiom, written as
    floor division so both engines bucket identically in IEEE doubles.

    Scale: one scan, partial agg into (flag, bucket) — a few hundred
    groups at any corpus size; the histogram frame is metadata-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") / 10000)
            .cast("long")
            .alias("bucket"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("l_returnflag", "bucket")
    )


# --------------------------------------------------------------- e11


_PERIOD_ORACLE = """
    WITH m AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta,
           round(
               (revenue - lag(revenue) OVER (ORDER BY month))
               / lag(revenue) OVER (ORDER BY month), 6
           ) + 0.0 AS mom_pct
    FROM m ORDER BY month
"""


@declare("e11_period_over_period", oracle=_PERIOD_ORACLE, tags=("window", "bi"))
def e11_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue: month-truncated aggregate, then a lag
    window for the absolute and relative delta (NULL for the first
    month, as in every BI tool).

    Scale: the scan aggregates to O(months) rows; the window runs on
    that metadata-sized frame in a single task regardless of corpus
    size. The `+ 0.0` on the pct normalizes IEEE -0.0 (flat months
    rounding to negative zero hash-differently across engines)."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("mom_delta"),
        (
            F.round((F.col("revenue") - prev) / prev, 6) + F.lit(0.0)
        ).alias("mom_pct"),
    ).orderBy("month")


# --------------------------------------------------------------- h23


_POSEXPLODE_ORACLE = """
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS sp
        FROM documents WHERE doc_id <= 40
    ),
    w AS (
        SELECT doc_id, i AS pos, sp[i] AS word
        FROM d, unnest(range(1, len(sp) + 1)) AS t(i)
    )
    SELECT doc_id,
           min(CASE WHEN pos = 1 THEN word END) AS first_word,
           CAST(sum(pos * length(word)) AS BIGINT) AS pos_weighted_len,
           CAST(max(pos) AS BIGINT) AS n_words
    FROM w GROUP BY doc_id ORDER BY doc_id
"""


@declare("h23_posexplode_positions", oracle=_POSEXPLODE_ORACLE, tags=("functions",))
def h23_posexplode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: posexplode(split(text)) keeps each element's
    index, so order-sensitive reductions (first element, position-
    weighted sums) are expressible — plain explode loses this. The
    oracle reconstructs positions with an unnest over range(len).

    Scale: explode fans out by words-per-doc and re-aggregates by
    doc_id immediately; the doc_id filter is pushed to the scan."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 40)
    words = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "word"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    return (
        words.groupBy("doc_id")
        .agg(
            F.min(F.when(F.col("pos") == 1, F.col("word"))).alias(
                "first_word"
            ),
            F.sum(F.col("pos") * F.length("word")).alias("pos_weighted_len"),
            F.max("pos").alias("n_words"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- n107


_TRUNCATION_ORACLE = """
    WITH t AS (
        SELECT source,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE n_tokens > 256) AS BIGINT)
               AS n_truncated,
           CAST(sum(greatest(n_tokens - 256, 0)) AS BIGINT) AS tokens_lost,
           CAST(sum(least(n_tokens, 256)) AS BIGINT) AS tokens_kept,
           round(sum(greatest(n_tokens - 256, 0)) * 1.0 / sum(n_tokens), 6)
               AS loss_fraction
    FROM t GROUP BY source ORDER BY source
"""


@declare(
    "n107_token_budget_truncation",
    oracle=_TRUNCATION_ORACLE,
    tags=("text", "curation"),
)
def n107_token_budget_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length budget accounting: with a 256-token training
    budget, how many documents truncate, how many tokens are lost vs
    kept, and what fraction of each source's mass the budget discards —
    the first sizing question for any new corpus at a fixed context
    length (and the input to n13's packing decisions).

    Scale: per-doc token count is size(split()) — no explode at all —
    then one partial aggregate to O(sources) rows."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    lost = F.greatest(F.col("n_tokens") - 256, F.lit(0))
    return (
        t.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("n_tokens") > 256, 1)).alias("n_truncated"),
            F.sum(lost).alias("tokens_lost"),
            F.sum(F.least(F.col("n_tokens"), F.lit(256))).alias(
                "tokens_kept"
            ),
            F.round(F.sum(lost) / F.sum("n_tokens"), 6).alias(
                "loss_fraction"
            ),
        )
        .orderBy("source")
    )
