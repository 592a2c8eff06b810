"""Advanced engine techniques, round 2: incremental aggregate maintenance,
bucketed co-located joins, TF-IDF term scoring, and an unrolled PageRank
iteration — each a scale pattern a 100 TB deployment leans on daily.

All oracle-checked; the bucketed join additionally pins its no-Exchange
plan in tests/test_plan_quality.py (the plan IS the feature).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_INCR_ORACLE = """
    SELECT l_returnflag,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n_rows,
           round(sum(l_quantity) / count(*), 6) AS avg_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

_CUTOVER = "1995-01-01"


@declare(
    "i9_incremental_agg_maintenance",
    oracle=_INCR_ORACLE,
    tags=("ext", "incremental"),
)
def i9_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: a base partial
    aggregate (rows before the cutover) merged with a delta partial
    aggregate (rows after) must equal the full recompute — which is
    exactly what the oracle computes.

    The pattern: keep aggregates in their commutative-monoid form
    (sum, count — never avg) so a CDC delta folds in with a union +
    re-aggregate over |groups| rows instead of a full-table rescan.
    Derived measures (avg) are computed from the merged monoid at read
    time. At 100 TB this is the difference between an O(delta) nightly
    refresh and an O(table) one.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    base = partial(li.filter(F.col("l_shipdate") < _CUTOVER))
    delta = partial(li.filter(F.col("l_shipdate") >= _CUTOVER))
    merged = (
        base.unionByName(delta)
        .groupBy("l_returnflag")
        .agg(
            F.sum("sum_qty").alias("sum_qty"),
            F.round(F.sum("sum_price"), 2).alias("sum_price"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
    return merged.select(
        "l_returnflag",
        "sum_qty",
        "sum_price",
        "n_rows",
        F.round(F.col("sum_qty") / F.col("n_rows"), 6).alias("avg_qty"),
    ).orderBy("l_returnflag")


_BUCKETED_ORACLE = """
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""

_N_BUCKETS = 8


@declare("k4_bucketed_join", oracle=_BUCKETED_ORACLE, tags=("dml", "scale"))
def k4_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free big-big join via bucketing: both sides written
    bucketBy(N, join-key), so the join reads co-located buckets and the
    plan contains NO Exchange above either scan (pinned in
    test_plan_quality.py).

    This is the strategy when neither side broadcasts: pay the shuffle
    once at ingest, then every subsequent join on the bucket key is
    exchange-free. At 100 TB the bucket count scales with data (the
    fixture uses {n}) but the plan shape — scan, sort, merge, no wire —
    is identical.
    """
    db_loc = tempfile.mkdtemp(prefix="bucket_db_")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{db_loc}'"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(_N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bucketdb.orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(_N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bucketdb.lineitem_b")
    )
    # hint("merge"): at fixture scale Catalyst would broadcast the small
    # side, which hides the property under test; at deployment scale
    # neither side broadcasts and SMJ over co-located buckets is the plan.
    o_b = spark.table("bucketdb.orders_b").hint("merge")
    l_b = spark.table("bucketdb.lineitem_b")
    return (
        o_b.join(l_b, o_b.o_orderkey == l_b.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_TFIDF_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               round(tf.tf * ln((n.n_docs + 1) / (df.df + 1)), 6) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term) AS rank
        FROM scored)
    SELECT doc_id, term, tf, df, score, rank
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
"""


@declare("n46_tfidf_topk_terms", oracle=_TFIDF_ORACLE, tags=("ext", "text"))
def n46_tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1)),
    ties broken lexically) — the classic keyword-extraction pass.

    The document-frequency frame is vocab-sized and broadcast back onto
    the term-frequency frame; the corpus-size scalar rides a broadcast
    cross join; the only full-data shuffles are the two keyed grouped
    counts and the per-doc rank window. Nothing in the plan grows faster
    than the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("doc_id", "rank")
    )


_DAMPING = 0.85

_PAGERANK_ORACLE = f"""
    WITH edges AS (
        SELECT prev, event_type AS next,
               count(*) / sum(count(*)) OVER (PARTITION BY prev) AS p
        FROM (SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM events)
        WHERE prev IS NOT NULL GROUP BY prev, next),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    n AS (SELECT count(*) AS n_nodes FROM nodes),
    pr0 AS (SELECT node, 1.0 / n.n_nodes AS pr FROM nodes CROSS JOIN n),
    pr1 AS (
        SELECT nodes.node,
               (1 - {_DAMPING}) / any_value(n.n_nodes)
                 + {_DAMPING} * coalesce(sum(pr0.pr * edges.p), 0) AS pr
        FROM nodes CROSS JOIN n
        LEFT JOIN edges ON edges.next = nodes.node
        LEFT JOIN pr0 ON pr0.node = edges.prev
        GROUP BY nodes.node),
    pr2 AS (
        SELECT nodes.node,
               (1 - {_DAMPING}) / any_value(n.n_nodes)
                 + {_DAMPING} * coalesce(sum(pr1.pr * edges.p), 0) AS pr
        FROM nodes CROSS JOIN n
        LEFT JOIN edges ON edges.next = nodes.node
        LEFT JOIN pr1 ON pr1.node = edges.prev
        GROUP BY nodes.node)
    SELECT node, round(pr, 6) AS pagerank
    FROM pr2 ORDER BY node
"""


@declare(
    "n47_pagerank_transitions",
    oracle=_PAGERANK_ORACLE,
    tags=("ext", "graph", "events"),
)
def n47_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two damped PageRank iterations over the event-transition graph
    (nodes = event types, edge weights = n43's transition probabilities),
    unrolled so the oracle can replay the identical math.

    The iteration body is the canonical distributed shape: rank frame
    joined to edges on the source key, grouped on the destination key —
    no driver-side graph, no collect. Here the node set is small, but
    the same two-join body is what iterates over million-node graphs
    (n2f's connected components already runs it to convergence); the
    fixture's graph just makes the result oracle-checkable.
    """
    ev = load_table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        "event_type", F.lag("event_type").over(w_lag).alias("prev")
    ).filter(F.col("prev").isNotNull())
    w_tot = Window.partitionBy("prev")
    edges = (
        trans.groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "prev", "next", (F.col("cnt") / F.sum("cnt").over(w_tot)).alias("p")
        )
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    pr = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    for _ in range(2):
        contrib = (
            edges.join(pr.withColumnRenamed("node", "prev"), "prev")
            .select("next", (F.col("pr") * F.col("p")).alias("c"))
            .groupBy("next")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(n))
            .join(contrib.withColumnRenamed("next", "node"), "node", "left")
            .select(
                "node",
                (
                    (1 - _DAMPING) / F.col("n_nodes")
                    + _DAMPING * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select("node", F.round("pr", 6).alias("pagerank")).orderBy("node")


_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE orders.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_custkey < 20
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@declare(
    "g7_lateral_topk_per_group",
    oracle=_LATERAL_SQL,
    tags=("sql", "lateral", "subquery"),
)
def g7_lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL:2016 lateral derived table): the
    top-2 orders per customer expressed as a per-row subquery with ORDER
    BY + LIMIT — the declarative form of the top-k-per-group pattern.
    Catalyst decorrelates it into a window/rank plan rather than
    executing per-row, so the shape stays one keyed shuffle at scale; the
    SAME SQL text runs on DuckDB as the oracle (true cross-engine SQL
    portability, not just semantic equivalence)."""
    from iceberg_v2_to_v3_upgrade_spark.io import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)
