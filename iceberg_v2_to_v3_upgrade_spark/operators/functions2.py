"""Scalar-function breadth, round 2: interval/date arithmetic and bitwise
operations (§2.H extensions), partition-pruned write/read, and dedup
survivorship — rounding out the function surface a reference user reaches
for next.

Engine-portability notes are inline wherever Spark and DuckDB disagree on
names or semantics (dayofweek origin, ^ meaning power vs xor); every
expression used here is pinned to the common subset.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_INTERVAL_ORACLE = """
    WITH d AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
        FROM orders WHERE o_orderkey < 200)
    SELECT o_orderkey, od AS o_orderdate,
           od + 90 AS due_date,
           CAST(od + INTERVAL 3 MONTH AS DATE) AS review_date,
           last_day(od) AS month_end,
           quarter(od) AS q,
           isodow(od) AS iso_weekday,
           date_diff('day', od, DATE '1998-12-31') AS days_to_close
    FROM d ORDER BY o_orderkey
"""


@declare("h13_interval_arithmetic", oracle=_INTERVAL_ORACLE, tags=("functions",))
def h13_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic: +90 days, +3 months (end-of-month
    clamping semantics match across engines), last_day, quarter, ISO
    weekday (Spark weekday() is 0=Monday; +1 == DuckDB isodow), and a
    day-count to a fixed literal. Map-only; predicate pushed to the scan.

    Oracle portability trap pinned here: DuckDB intervals compare with
    1 month == 30 days, so `od + INTERVAL 90 DAY` and `od + INTERVAL 3
    MONTH` in one SELECT are CSE-merged into the SAME expression (90
    days wins); the oracle writes the day-add as `od + 90` to keep the
    two additions structurally distinct."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("o_orderdate"),
        F.date_add(d, 90).alias("due_date"),
        F.add_months(d, 3).alias("review_date"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("q"),
        (F.weekday(d) + 1).alias("iso_weekday"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).alias("days_to_close"),
    ).orderBy("o_orderkey")


_BITWISE_ORACLE = """
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 170) AS xored,
           o_orderkey << 2 AS shifted_left,
           o_orderkey >> 3 AS shifted_right,
           bit_count(o_orderkey) AS popcount
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
"""


@declare("h14_bitwise_ops", oracle=_BITWISE_ORACLE, tags=("functions",))
def h14_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and/or/xor/shifts/popcount on a key column — the hash-
    partitioner's toolbox (band extraction, flag packing, bucket masks).
    Portability trap pinned here: DuckDB's ``^`` is POWER, so the oracle
    uses ``xor()`` while Spark uses the ``^`` operator."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("low_byte"),
        k.bitwiseOR(4096).alias("with_flag"),
        k.bitwiseXOR(170).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_left"),
        F.shiftright(k, 3).alias("shifted_right"),
        F.bit_count(k).alias("popcount"),
    ).orderBy("o_orderkey")


_PRUNE_ORACLE = """
    SELECT date_trunc('hour', ts) AS h, count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY h ORDER BY h
"""


@declare("k5_partition_pruning", oracle=_PRUNE_ORACLE, tags=("dml", "scale"))
def k5_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned read over a partitioned write: events land
    partitioned by event_type (the reference's identity-partition layout,
    ``create_demo_table.py:109``); the filtered read must touch ONLY the
    matching partition directory — PartitionFilters, not a post-scan
    filter (pinned in test_plan_quality.py).

    At 100 TB partition pruning is the first and cheapest I/O lever:
    pruning happens in the driver against directory metadata, before a
    single byte of the other partitions is read.
    """
    out = tempfile.mkdtemp(prefix="events_part_")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return (
        back.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("h")
    )


_SURVIVOR_ORACLE = """
    WITH fp AS (
        SELECT doc_id, source, n_chars,
               md5(substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                          1, 64)) AS fingerprint
        FROM documents),
    sized AS (
        SELECT fingerprint, count(*) OVER (PARTITION BY fingerprint) AS n_dups,
               doc_id, source, n_chars,
               row_number() OVER (PARTITION BY fingerprint
                                  ORDER BY n_chars DESC, doc_id) AS r
        FROM fp)
    SELECT fingerprint, n_dups,
           doc_id AS survivor_doc_id, source AS survivor_source,
           n_dups - 1 AS n_discarded
    FROM sized WHERE r = 1 AND n_dups > 1
    ORDER BY survivor_doc_id
"""


@declare(
    "n49_dedup_survivorship",
    oracle=_SURVIVOR_ORACLE,
    tags=("ext", "dedup", "curation"),
)
def n49_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record selection) for duplicate clusters:
    within each cluster keyed on the md5 of the normalized 64-char text
    prefix (documents sharing an opening are near-exact variants —
    full-content clusters are empty at small SF, so the prefix key keeps
    the operator exercised at every scale), keep the longest document,
    tie-broken by lowest doc_id; report what was kept and discarded.

    One window over the fingerprint-keyed shuffle — same key as the
    dedup itself, so a pipeline doing detect+survive shares one exchange.
    High-entropy key, no skew by construction.
    """
    from iceberg_v2_to_v3_upgrade_spark.functions.hashing import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.substring(normalize_text(F.col("text")), 1, 64)).alias(
            "fingerprint"
        ),
    )
    w_cnt = Window.partitionBy("fingerprint")
    w_rank = Window.partitionBy("fingerprint").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        fp.withColumn("n_dups", F.count(F.lit(1)).over(w_cnt))
        .withColumn("r", F.row_number().over(w_rank))
        .filter((F.col("r") == 1) & (F.col("n_dups") > 1))
        .select(
            "fingerprint",
            "n_dups",
            F.col("doc_id").alias("survivor_doc_id"),
            F.col("source").alias("survivor_source"),
            (F.col("n_dups") - 1).alias("n_discarded"),
        )
        .orderBy("survivor_doc_id")
    )


@declare(
    "h16_regexp_extract_all",
    oracle=r"""
        SELECT source,
               round(avg(len(regexp_extract_all(text, '\b[a-z]{6,}\b'))), 4)
                   AS avg_long_words,
               round(avg(len(regexp_extract_all(text, '\bs[a-z]+'))), 4)
                   AS avg_s_words,
               max(len(regexp_extract_all(text, 'er\b'))) AS max_er_suffixes
        FROM documents GROUP BY source ORDER BY source
    """,
    tags=("functions", "regex"),
)
def h16_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all battery: multi-match extraction per document
    (long words, s-initial words, -er suffixes) rolled up per source —
    the all-occurrences complement of h9's single-match regexp_extract.
    Patterns stay in the Java/RE2 common subset (no backreferences, no
    lookaround) so Spark and DuckDB tokenize identically. Map-only until
    a source-keyed partial aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    # idx=0 = whole-match mode: Spark's default group index is 1 and
    # errors on patterns without capture groups (DuckDB defaults to 0)
    n_matches = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
    )
    return (
        docs.select(
            "source",
            n_matches(r"\b[a-z]{6,}\b").alias("n_long"),
            n_matches(r"\bs[a-z]+").alias("n_s"),
            n_matches(r"er\b").alias("n_er"),
        )
        .groupBy("source")
        .agg(
            F.round(F.avg("n_long"), 4).alias("avg_long_words"),
            F.round(F.avg("n_s"), 4).alias("avg_s_words"),
            F.max("n_er").alias("max_er_suffixes"),
        )
        .orderBy("source")
    )


@declare(
    "h18_try_arithmetic",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN TRY_CAST(l_linenumber::VARCHAR || '0' AS INTEGER)
                             IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_castable,
               CAST(sum(CASE WHEN TRY_CAST(l_returnflag || l_linenumber::VARCHAR
                                      AS INTEGER) IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable,
               round(sum(COALESCE(l_extendedprice / NULLIF(l_discount, 0), 0)),
                     2) AS safe_div_sum
        FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    tags=("functions", "error-handling"),
)
def h18_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression battery: TRY_CAST returning NULL instead of
    failing the job on malformed input, and NULLIF-guarded division — at
    100 TB a single dirty row must never kill a 1000-executor stage, so
    every ingest expression uses the try_/NULLIF forms. Both engines
    agree NULL-for-failure semantics, so the battery hash-checks."""
    li = load_table(spark, sf_dir, "lineitem")

    # try_cast keeps the NULL-for-failure contract, but under ANSI its
    # failure path raises and catches a JVM exception PER ROW — on a
    # column where every value is malformed that was 5.9 s of the 600k
    # rows' 6.3 s at sf0.1 (round-10 measurement). The integer-shape
    # RLIKE gate short-circuits rows that cannot parse, so the
    # exception path only runs for genuinely ambiguous values (e.g.
    # int overflow). Cast's trim is UTF8String.trimAll — it strips ALL
    # control chars <= 0x20, wider than Java's \s — so the gate uses
    # [\x00-\x20]* to stay identical to bare try_cast for ANY input
    # (round-10 ADVICE; results asserted: 0 disagreements over the
    # corpus, and the oracle hash pins it).
    def guarded_try_int(expr: str) -> F.Column:
        return F.expr(
            f"CASE WHEN ({expr}) RLIKE "
            f"'^[\\\\x00-\\\\x20]*[+-]?[0-9]+[\\\\x00-\\\\x20]*$' "
            f"THEN try_cast(({expr}) as int) END"
        )

    castable = guarded_try_int("concat(cast(l_linenumber as string), '0')")
    uncastable = guarded_try_int(
        "concat(l_returnflag, cast(l_linenumber as string))"
    )
    safe_div = F.coalesce(
        F.col("l_extendedprice") / F.nullif(F.col("l_discount"), F.lit(0)),
        F.lit(0),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(
                F.when(castable.isNotNull(), 1).otherwise(0)
            ).alias("n_castable"),
            F.sum(F.when(uncastable.isNull(), 1).otherwise(0)).alias(
                "n_uncastable"
            ),
            F.round(F.sum(safe_div), 2).alias("safe_div_sum"),
        )
        .orderBy("l_returnflag")
    )
