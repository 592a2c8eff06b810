"""Training-data pipeline operators, part 5 [EXT].

Corpus-filtering rules in the published-web-filter mold (Gopher /
MassiveText-style document quality gates), cross-document boilerplate
detection over shared n-grams, and conversation/sequence assembly from
event logs — the "filter, deboilerplate, and format" layer between raw
corpus and tokenizer.

No reference citation (BASELINE.json north_star mandate); fixtures are
the driver-generated /root/testdata tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare


# --------------------------------------------------------------- n104


_STOPWORDS = ("the", "a", "of", "and", "to", "in")

_GOPHER_ORACLE = """
    WITH w AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    wc AS (
        SELECT doc_id, lang, w, count(*) AS c
        FROM w GROUP BY doc_id, lang, w
    ),
    per_doc AS (
        SELECT doc_id, lang,
               CAST(sum(c) AS BIGINT) AS n_words,
               sum(c * length(w)) * 1.0 / sum(c) AS mean_wl,
               count(*) * 1.0 / sum(c) AS ttr,
               max(c) * 1.0 / sum(c) AS top_frac,
               CAST(count(*) FILTER (
                   WHERE w IN ('the','a','of','and','to','in')
               ) AS BIGINT) AS n_stop
        FROM wc GROUP BY doc_id, lang
    ),
    rules AS (
        SELECT lang,
               (n_words BETWEEN 50 AND 100000) AS ok_wc,
               (mean_wl BETWEEN 3 AND 10) AS ok_mwl,
               (ttr >= 0.3) AS ok_ttr,
               (top_frac <= 0.12) AS ok_top,
               (n_stop >= 2) AS ok_stop
        FROM per_doc
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (
               WHERE ok_wc AND ok_mwl AND ok_ttr AND ok_top AND ok_stop
           ) AS BIGINT) AS n_keep,
           CAST(count(*) FILTER (WHERE NOT ok_wc) AS BIGINT) AS fail_wordcount,
           CAST(count(*) FILTER (WHERE NOT ok_mwl) AS BIGINT) AS fail_meanlen,
           CAST(count(*) FILTER (WHERE NOT ok_ttr) AS BIGINT) AS fail_ttr,
           CAST(count(*) FILTER (WHERE NOT ok_top) AS BIGINT) AS fail_topword,
           CAST(count(*) FILTER (WHERE NOT ok_stop) AS BIGINT) AS fail_stopword,
           round(count(*) FILTER (
               WHERE ok_wc AND ok_mwl AND ok_ttr AND ok_top AND ok_stop
           ) * 1.0 / count(*), 4) AS retention
    FROM rules GROUP BY lang ORDER BY lang
"""


@declare("n104_gopher_quality", oracle=_GOPHER_ORACLE, tags=("text", "curation"))
def n104_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style document quality gate: five per-doc rules
    — word count in [50, 100k], mean word length in [3, 10], type-token
    ratio >= 0.3, most-frequent-word fraction <= 0.12, and >= 2 distinct
    stopwords — reported as per-language keep/fail counts and retention.
    The per-rule fail counts are the tuning surface: a 100 TB filter run
    is judged by which rule is doing the cutting per language.

    Scale: one scan; per-doc word histograms via explode + two grouped
    aggregations keyed by doc_id (hash partition, no skew — doc_id is
    unique) then one tiny per-lang rollup. No UDFs, no driver state."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    wc = words.groupBy("doc_id", "lang", "w").agg(F.count("*").alias("c"))
    per_doc = wc.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n_words"),
        (F.sum(F.col("c") * F.length("w")) / F.sum("c")).alias("mean_wl"),
        (F.count("*") / F.sum("c")).alias("ttr"),
        (F.max("c") / F.sum("c")).alias("top_frac"),
        F.count(F.when(F.col("w").isin(*_STOPWORDS), 1)).alias("n_stop"),
    )
    rules = per_doc.select(
        "lang",
        F.col("n_words").between(50, 100000).alias("ok_wc"),
        F.col("mean_wl").between(3, 10).alias("ok_mwl"),
        (F.col("ttr") >= 0.3).alias("ok_ttr"),
        (F.col("top_frac") <= 0.12).alias("ok_top"),
        (F.col("n_stop") >= 2).alias("ok_stop"),
    )
    keep = (
        F.col("ok_wc") & F.col("ok_mwl") & F.col("ok_ttr")
        & F.col("ok_top") & F.col("ok_stop")
    )
    return (
        rules.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(keep, 1)).alias("n_keep"),
            F.count(F.when(~F.col("ok_wc"), 1)).alias("fail_wordcount"),
            F.count(F.when(~F.col("ok_mwl"), 1)).alias("fail_meanlen"),
            F.count(F.when(~F.col("ok_ttr"), 1)).alias("fail_ttr"),
            F.count(F.when(~F.col("ok_top"), 1)).alias("fail_topword"),
            F.count(F.when(~F.col("ok_stop"), 1)).alias("fail_stopword"),
            F.round(
                F.count(F.when(keep, 1)) / F.count("*"), 4
            ).alias("retention"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------- n105


_BOILERPLATE_ORACLE = """
    WITH d AS (
        SELECT doc_id, source, string_split(text, ' ') AS sp
        FROM documents
    ),
    g AS (
        SELECT doc_id, source,
               unnest(list_transform(
                   range(1, len(sp) - 1),
                   i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2]
               )) AS gram
        FROM d
        WHERE len(sp) >= 3
    ),
    df AS (
        SELECT gram, count(DISTINCT doc_id) AS n_docs_with
        FROM g GROUP BY gram
    )
    SELECT g.source,
           CAST(count(*) AS BIGINT) AS total_grams,
           CAST(count(*) FILTER (WHERE df.n_docs_with >= 5) AS BIGINT)
               AS boilerplate_grams,
           CAST(count(DISTINCT CASE WHEN df.n_docs_with >= 5
                                    THEN g.doc_id END) AS BIGINT)
               AS docs_touched,
           round(count(*) FILTER (WHERE df.n_docs_with >= 5) * 1.0
                 / count(*), 4) AS boilerplate_fraction
    FROM g JOIN df USING (gram)
    GROUP BY g.source ORDER BY g.source
"""


@declare(
    "n105_boilerplate_ngrams", oracle=_BOILERPLATE_ORACLE, tags=("text", "dedup")
)
def n105_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: a word 3-gram appearing in
    >= 5 DISTINCT documents is boilerplate (headers, footers, templated
    spans — the repeated matter line-dedup removes in web corpora);
    reports per-source gram totals and the boilerplate fraction.

    Scale: explode to (gram, doc) pairs, one distinct-count by gram (the
    document-frequency table — same shuffle shape as n2b's inverted
    index), then re-join the pairs to their gram's doc-frequency. The
    doc-frequency side is aggregated BEFORE the join, so the join's build
    side is |vocab|, not |corpus|; at 100 TB both sides hash-partition on
    gram and AQE handles the head-gram skew."""
    docs = load_table(spark, sf_dir, "documents")
    sp = F.split("text", " ")
    grams = (
        docs.select("doc_id", "source", sp.alias("sp"))
        .filter(F.size("sp") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("sp") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("sp", i),
                        F.element_at("sp", i + 1),
                        F.element_at("sp", i + 2),
                    ),
                )
            ).alias("gram"),
        )
    )
    df_tbl = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    joined = grams.join(df_tbl, "gram")
    boiler = F.col("n_docs_with") >= 5
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("total_grams"),
            F.count(F.when(boiler, 1)).alias("boilerplate_grams"),
            F.countDistinct(F.when(boiler, F.col("doc_id"))).alias(
                "docs_touched"
            ),
            F.round(
                F.count(F.when(boiler, 1)) / F.count("*"), 4
            ).alias("boilerplate_fraction"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------- n106


_CHAT_ASSEMBLY_ORACLE = """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_no
        FROM ordered
    ),
    convo AS (
        SELECT user_id, session_no,
               array_to_string(
                   list_slice(
                       list(event_type ORDER BY ts, event_id), 1, 8
                   ), '->'
               ) AS convo,
               least(count(*), 8) AS n_turns
        FROM sess GROUP BY user_id, session_no
    )
    SELECT CAST(n_turns AS BIGINT) AS n_turns,
           CAST(count(*) AS BIGINT) AS n_sequences,
           CAST(count(DISTINCT convo) AS BIGINT) AS n_patterns
    FROM convo GROUP BY n_turns ORDER BY n_turns
"""


@declare(
    "n106_chat_turn_assembly", oracle=_CHAT_ASSEMBLY_ORACLE, tags=("events", "curation")
)
def n106_chat_turn_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation/sequence assembly from an event log: sessionize per
    user (30-min inactivity gap), order turns by (ts, event_id), keep the
    first 8 turns, and render each session as one '->' -joined training
    sequence — the interaction-log-to-SFT-sequence formatting step.
    Reports sequence and distinct-pattern counts per (truncated) length.

    Scale: ONE shuffle by user_id feeds both the gap window and the
    running session counter; assembly is collect_list inside the
    (user, session) group — state bounded by session length, and the
    8-turn cap bounds the output row width regardless of log depth."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "new_sess",
            # microsecond-exact gap compare (a long-cast would truncate
            # sub-second parts and disagree with the oracle's INTERVAL)
            F.when(
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
                > 1800 * 1_000_000,
                1,
            )
            .when(F.lag("ts").over(w).isNull(), 1)
            .otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    convo = (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    8,
                ),
                "->",
            ).alias("convo"),
            F.least(F.count("*"), F.lit(8)).alias("n_turns"),
        )
    )
    return (
        convo.groupBy("n_turns")
        .agg(
            F.count("*").alias("n_sequences"),
            F.countDistinct("convo").alias("n_patterns"),
        )
        .orderBy("n_turns")
    )


# --------------------------------------------------------------- g8


_RECURSIVE_SQL = """
    WITH RECURSIVE edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS src,
                   event_type AS dst
            FROM events
        ) t
        WHERE src IS NOT NULL AND src <> dst
    ),
    reach(node, hops) AS (
        SELECT CAST('view' AS STRING) AS node, 0 AS hops
        UNION ALL
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hops < 3
    )
    SELECT node,
           CAST(min(hops) AS BIGINT) AS min_hops,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM reach
    GROUP BY node
    ORDER BY node
"""


@declare("g8_recursive_cte", oracle=_RECURSIVE_SQL, tags=("sql", "recursive"))
def g8_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (SQL:1999 recursive CTE, new engine surface in
    Spark 4): bounded transitive closure over the event-type transition
    graph — reachable nodes and path counts within 3 hops of 'view'. The
    SAME SQL text runs on DuckDB as the oracle (cross-engine SQL
    portability, like g7's LATERAL). The recursion is driver-coordinated
    iteration over a 5-node graph: each step is one keyed join against
    the (tiny, broadcast) edge list, so depth — not data volume — bounds
    the loop; the 100 TB-scale work (the transition extraction) is a
    single windowed scan, done once before the recursion starts."""
    from iceberg_v2_to_v3_upgrade_spark.io import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RECURSIVE_SQL)


# --------------------------------------------------------------- k12


_AQE_SKEW_ORACLE = """
    WITH fact AS (
        SELECT CASE WHEN l_orderkey % 100 < 99 THEN 0
                    ELSE l_orderkey % 97 END AS k,
               l_extendedprice
        FROM lineitem
    ),
    dim AS (
        SELECT CAST(range AS BIGINT) AS k FROM range(0, 97)
    )
    SELECT CAST(f.k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(f.l_extendedprice), 2) AS total
    FROM fact f JOIN dim d ON f.k = d.k
    GROUP BY f.k ORDER BY k
"""


@declare("k12_aqe_skew_join", oracle=_AQE_SKEW_ORACLE, tags=("scale", "plan"))
def k12_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join handling — the no-hand-salting alternative to k2:
    99% of the fact rows share one join key, and instead of salting,
    AQE's runtime replan splits the oversized shuffle partition into
    advisory-sized reads (duplicating the matching build rows), so the
    straggler task disappears WITHOUT touching the query. The skew
    split is ASSERTED in the executed plan (`skew=true` on the join):
    this query's claim is the mechanism, not just the numbers.

    Three fixture-scale accommodations, each mapping to a real-cluster
    fact (root-caused in round 4 — the round-3 version never engaged):
    1. AQE splits a skewed reduce partition by MAPPER RANGES
       (PartialReducerPartitionSpec), so a single-map-task shuffle can
       never be split. sf0.01 lineitem is ONE parquet file = one map
       task; `repartition(8)` simulates the many input splits any real
       table has. On a 100 TB table this line would be deleted.
    2. OptimizeSkewedJoin pattern-matches SMJ <- Sort <- ShuffleStage
       with shuffleOrigin=ENSURE_REQUIREMENTS on BOTH sides; a
       distinct()'s HashAggregate between the Sort and the stage defeats
       it. The dim is therefore a plain range frame (result identical:
       every fact key is in [0, 96], so the inner join keeps the same
       groups either way — the oracle uses range(0,97) too).
    3. The groupBy(k) downstream reuses the join's partitioning, and the
       skew split breaks that, so Spark reverts the split unless
       forceOptimizeSkewedJoin accepts the one extra shuffle — exactly
       the straggler-vs-shuffle trade a real cluster makes.
    Thresholds are lowered for fixture scale and restored in a finally —
    on a real 100 TB cluster the defaults (256 MB) do the same job."""
    conf = spark.conf
    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
    ]
    saved = {k: conf.get(k) for k in keys}
    conf.set(keys[0], "2KB")
    conf.set(keys[1], "1KB")
    conf.set(keys[2], "2")
    conf.set(keys[3], "true")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        fact = li.repartition(8).select(
            F.when(F.col("l_orderkey") % 100 < 99, F.lit(0).cast("long"))
            .otherwise(F.col("l_orderkey") % 97)
            .alias("k"),
            "l_extendedprice",
        )
        dim = spark.range(0, 97).select(F.col("id").alias("k"))
        agg = (
            fact.hint("MERGE")
            .join(dim.hint("MERGE"), "k")
            .groupBy("k")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("total"),
            )
            .orderBy("k")
        )
        rows = agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE skew-join split did not engage on the hot key"
        )
        return spark.createDataFrame(rows, agg.schema)
    finally:
        for k, v in saved.items():
            conf.set(k, v)
