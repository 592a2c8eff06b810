"""Declared queries, round 5: training-data assembly operators (token
chunking, sequence mining, padding-waste batching) and the remaining
AQE runtime-replan demonstration (partition coalescing).

n110 is the chunking step every long-context training pipeline runs
between cleaning and tokenization: fixed-size token windows with a
stride overlap, each chunk carrying provenance (doc_id, chunk index)
and a content hash for downstream chunk-level dedup. n111 mines the
most frequent length-3 event-type sequences (the PrefixSpan-lite
behavioral patterns a curriculum/eval builder consumes). n112
quantifies what length-bucketed batching saves: padding waste of
arrival-order batches vs length-sorted batches at the same batch size
— the number that decides whether a pipeline adds the sort. k13 shows
AQE coalescing 200 tiny shuffle partitions into a few right-sized
reads at runtime — the complement of k12's skew split.

Scale posture (100 TB): n110 is map-only (split -> sequence ->
explode, zero shuffles, no Python); n111 is one window shuffle keyed
by user_id (cardinality grows with data) + a partial-agg'd count;
n112's global row_number windows are the fixture-scale stand-in for
the range-partitioned sort a cluster would use — the waste accounting
itself is one partial-agg'd pass per strategy; k13 is the optimizer
feature that makes "shuffle.partitions sized for the big query" safe
for the small ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.plan_assert import collect_asserting_plan
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- n110

_CHUNK = 64
_STRIDE = 48

_CHUNK_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    sized AS (
        SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) > 0
    ),
    starts AS (
        SELECT doc_id, toks, n, unnest(range(0, n, {_STRIDE})) AS start
        FROM sized
    )
    SELECT doc_id,
           CAST(start // {_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(least(start + {_CHUNK}, n) - start AS BIGINT) AS n_tokens,
           md5(array_to_string(
               list_slice(toks, start + 1, least(start + {_CHUNK}, n)), ' '
           )) AS chunk_hash
    FROM starts
"""


@declare("n110_doc_chunking", oracle=_CHUNK_ORACLE, tags=("ext", "text"))
def n110_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking with overlap — the long-context
    training-data assembly step: 64-token chunks on a 48-token stride
    (16-token overlap so no boundary context is lost), each chunk with
    provenance (doc_id, chunk_idx) and an md5 content hash for
    chunk-level dedup downstream. Tokenization is whitespace split with
    empties filtered, identical in the oracle.

    Scale shape: map-only — split, sequence(), explode, slice are all
    JVM codegen expressions; zero shuffles, zero Python. Output grows
    ~n_tokens/stride per doc; at 100 TB the chunker is scan-bound."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.filter(
                F.split(F.col("text"), r"\s+"), lambda x: x != ""
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    start = F.col("start")
    piece = F.slice(F.col("toks"), start + F.lit(1), F.lit(_CHUNK))
    return (
        toks.select(
            "doc_id",
            "toks",
            "n",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1, F.lit(_STRIDE))
            ).alias("start"),
        )
        .select(
            "doc_id",
            F.floor(start / _STRIDE).cast("bigint").alias("chunk_idx"),
            F.size(piece).cast("bigint").alias("n_tokens"),
            F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
        )
    )


# --------------------------------------------------------------- n111

_TOP_SEQ = 25

_SEQ_ORACLE = f"""
    WITH ordered AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_seq
    FROM ordered WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n_seq DESC, e1, e2, e3
    LIMIT {_TOP_SEQ}
"""


@declare("n111_event_sequence_mining", oracle=_SEQ_ORACLE, tags=("ext", "events"))
def n111_event_sequence_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top length-3 event-type sequences per user timeline (PrefixSpan-
    lite contiguous patterns): the behavioral motifs a funnel designer
    or curriculum builder reads. lead() over (user, time) forms each
    contiguous trigram; the count is grouped on the trigram itself.
    Deterministic under timestamp ties via the event_id tiebreak.

    Scale shape: ONE shuffle keyed by user_id (cardinality grows with
    the data) for the window, then a partial-agg'd count onto the tiny
    (|event_types|^3) trigram space; top-k is a metadata sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_seq"))
        .orderBy(F.desc("n_seq"), "e1", "e2", "e3")
        .limit(_TOP_SEQ)
    )


# --------------------------------------------------------------- n112

_BATCH = 16

_PADDING_ORACLE = f"""
    WITH lens AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '')) AS n
        FROM documents
    ),
    nonempty AS (SELECT * FROM lens WHERE n > 0),
    assigned AS (
        SELECT 'arrival' AS strategy,
               (row_number() OVER (ORDER BY doc_id) - 1) // {_BATCH}
                   AS batch_id,
               n
        FROM nonempty
        UNION ALL
        SELECT 'length_sorted',
               (row_number() OVER (ORDER BY n, doc_id) - 1) // {_BATCH},
               n
        FROM nonempty
    ),
    per_batch AS (
        SELECT strategy, batch_id,
               max(n) * count(*) AS padded, sum(n) AS toks
        FROM assigned GROUP BY strategy, batch_id
    )
    SELECT strategy,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(sum(padded) AS BIGINT) AS padded_tokens,
           round(100.0 * (sum(padded) - sum(toks)) / sum(padded), 2)
               AS waste_pct
    FROM per_batch GROUP BY strategy ORDER BY strategy
"""


@declare("n112_padding_waste_batching", oracle=_PADDING_ORACLE, tags=("ext", "text"))
def n112_padding_waste_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for batch assembly: documents are batched 16
    at a time either in arrival order or sorted by token length, every
    sequence in a batch pads to the batch max, and the result compares
    total padded tokens per strategy — the measured saving that decides
    whether a training pipeline adds the length sort (it routinely
    halves padding waste).

    Scale shape: the waste accounting is a partial-agg'd count per
    (strategy, batch). The global row_number here is the fixture-scale
    stand-in for a range-partitioned sort (sortWithinPartitions after
    repartitionByRange) — batching is per-partition on a cluster, where
    batch boundaries are local anyway."""
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
        ).alias("n"),
    ).filter(F.col("n") > 0)
    arrival = lens.select(
        F.lit("arrival").alias("strategy"),
        F.floor(
            (F.row_number().over(Window.orderBy("doc_id")) - 1) / _BATCH
        ).alias("batch_id"),
        "n",
    )
    by_len = lens.select(
        F.lit("length_sorted").alias("strategy"),
        F.floor(
            (F.row_number().over(Window.orderBy("n", "doc_id")) - 1) / _BATCH
        ).alias("batch_id"),
        "n",
    )
    per_batch = (
        arrival.unionByName(by_len)
        .groupBy("strategy", "batch_id")
        .agg(
            (F.max("n") * F.count(F.lit(1))).alias("padded"),
            F.sum("n").alias("toks"),
        )
    )
    return (
        per_batch.groupBy("strategy")
        .agg(
            F.sum("toks").cast("bigint").alias("total_tokens"),
            F.sum("padded").cast("bigint").alias("padded_tokens"),
            F.round(
                100.0
                * (F.sum("padded") - F.sum("toks"))
                / F.sum("padded"),
                2,
            ).alias("waste_pct"),
        )
        .orderBy("strategy")
    )


# --------------------------------------------------------------- k13

_COALESCE_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
"""


@declare("k13_aqe_partition_coalescing", oracle=_COALESCE_ORACLE, tags=("scale", "plan"))
def k13_aqe_partition_coalescing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE partition coalescing — the runtime replan that makes
    "shuffle.partitions sized for the biggest query" safe for every
    small one: the aggregate shuffles into the session's full partition
    count, AQE observes the tiny map output sizes and coalesces the
    reads into a few advisory-sized partitions (asserted in the
    executed plan: `AQEShuffleRead coalesced`), so a 5-group aggregate
    does not schedule hundreds of near-empty reduce tasks. k12 showed
    AQE splitting a too-big partition; this is the same machinery
    merging too-small ones — together they are why static partition
    tuning per-query is obsolete.

    Scale: at 100 TB the SAME conf serves both this query (coalesced
    down) and the corpus-wide joins (split up) — the assertion pins
    that the mechanism engages, not just the numbers."""
    events = load_table(spark, sf_dir, "events")
    agg = (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )
    # size-guarded collect: O(event types), never fact rows
    return collect_asserting_plan(
        agg,
        {
            "AQEShuffleRead": "AQE shuffle read did not engage",
            "coalesced": (
                "AQE partition coalescing did not engage on the small "
                "aggregate"
            ),
        },
    )


# ---------------------------------------------------------------- k14

_BLOOM_ORACLE = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag ORDER BY l_returnflag
"""


@declare(
    "k14_bloom_filter_join_pruning",
    oracle=_BLOOM_ORACLE,
    tags=("scale", "plan"),
)
def k14_bloom_filter_join_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Runtime bloom-filter join pruning — the third runtime-replan
    demonstration next to k12 (skew split) and k13 (coalescing): a
    bloom filter aggregated over the SELECTIVE dim side (urgent orders)
    is injected into the fact scan as a semi-join probe, so lineitem
    rows that cannot match are dropped BEFORE the join's shuffle. The
    executed plan is asserted in-query: the dim side must build
    `bloom_filter_agg`, the fact side must probe `might_contain`.

    Scale: at 100 TB this is the difference between shuffling the full
    fact table and shuffling only the ~fraction matching the dim
    filter; production thresholds (10 GB application-side scan) engage
    it automatically — the fixture drops the threshold to pin the
    MECHANISM, exactly like k12 forces its skew split."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        agg = (
            li.join(od, li["l_orderkey"] == od["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
            .orderBy("l_returnflag")
        )
        # size-guarded collect: O(return flags), never fact rows
        return collect_asserting_plan(
            agg,
            {
                "bloom_filter_agg": (
                    "runtime bloom filter was not injected on the dim side"
                ),
                ("BloomFilterMightContain", "might_contain"): (
                    "bloom probe did not reach the fact side"
                ),
            },
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
