"""Advanced relational breadth, part 2: CUBE / GROUPING SETS multi-level
aggregation, value-range window frames, positional window values, and a
winnowing (rolling-hash) document fingerprint operator.

The winnowing op is the classic local-fingerprinting scheme (Schleimer et
al., SIGMOD'03 "Winnowing: Local Algorithms for Document Fingerprinting"):
hash every k-gram, slide a window of w hashes, keep each window's minimum.
Implemented entirely with JVM-side array expressions (transform/slice/
array_min) — no shuffle, no UDF; the hash is substr(md5(k-gram)) so the
DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.operators.relational import _dec
from iceberg_v2_to_v3_upgrade_spark.registry import declare


@declare(
    "d7_cube_aggregate",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(sum(l_quantity::DECIMAL(18,2)), 2)::DOUBLE AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("aggregate", "cube"),
)
def d7_cube_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass (Spark expands to a
    single Expand + hash-aggregate — one shuffle, not 4 separate scans)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(_dec(F.col("l_quantity"))), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@declare(
    "d8_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("aggregate", "grouping-sets", "sql"),
)
def d8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not the full cube): per-status totals,
    per-priority totals, and the grand total, in one Expand pass via the
    SQL surface."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_gs"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST
        """
    )


@declare(
    "e4_range_frame_sum",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(round(sum(o_totalprice::DECIMAL(18,2)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                         AND CURRENT ROW), 2) AS DOUBLE)
                   AS trailing_30d_spend
        FROM orders
        ORDER BY o_orderkey
    """,
    tags=("window", "range-frame"),
)
def e4_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window frame: each order's trailing-30-day customer
    spend. Spark's rangeBetween needs a numeric ordering key, so the
    frame runs over unix seconds with a -30*86400 lower bound — exactly
    the INTERVAL 30 DAYS PRECEDING frame DuckDB evaluates. Peer rows
    (same date) are in-frame for both engines by RANGE semantics."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        o.withColumn(
            "trailing_30d_spend",
            F.round(F.sum(_dec(F.col("o_totalprice"))).over(w), 2).cast(
                "double"
            ),
        )
        .select("o_orderkey", "o_custkey", "trailing_30d_spend")
        .orderBy("o_orderkey")
    )


@declare(
    "e5_window_positional_values",
    oracle="""
        SELECT o_orderkey, o_custkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice)  OVER w AS last_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey
    """,
    tags=("window", "positional"),
)
def e5_window_positional_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an unbounded frame: every order row sees
    its customer's first, latest, and second order price. The ordering
    key includes o_orderkey so date ties are deterministic; raw doubles
    pass through untouched (no summation → no fp drift)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .orderBy("o_orderkey")
    )


@declare(
    "n4f_winnow_fingerprint",
    oracle="""
        WITH h AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(0, (length(text)-8)//4),
                       i -> substr(md5(substr(text, 1 + 4*i, 8)), 1, 8)
                   ) AS hs
            FROM documents WHERE n_chars >= 32),
        m AS (
            SELECT doc_id,
                   list_transform(generate_series(1, len(hs)-3),
                                  j -> list_min(hs[j:j+3])) AS mins
            FROM h)
        SELECT doc_id,
               len(list_distinct(mins)) AS n_fingerprints,
               list_min(mins) AS min_fp
        FROM m ORDER BY doc_id
    """,
    tags=("ext", "text", "fingerprint"),
)
def n4f_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints: k=8-char shingles at stride 4,
    hash = substr(md5(shingle), 1, 8) (hex strings order consistently in
    both engines), sliding window of w=4 hashes, min per window; the
    distinct mins are the document's fingerprint set.

    All array expressions, zero shuffle, zero Python — the per-document
    work is embarrassingly parallel, so the only scale lever is input
    split count (repartition defends against single-row-group inputs).
    The two transform() stages are separate projections: materializing
    `hs` first avoids the no-CSE re-evaluation trap of nested HOFs."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") >= 32)
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    k, stride, w = 8, 4, 4
    n_shingles = (
        F.floor((F.length("text") - k) / stride).cast("int") + 1
    )
    hashed = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), n_shingles - 1),
            lambda i: F.substring(
                F.md5(F.col("text").substr(i * stride + 1, F.lit(k))),
                1,
                8,
            ),
        ).alias("hs"),
    )
    mins = hashed.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - (w - 1)),
            lambda j: F.array_min(F.slice(F.col("hs"), j, w)),
        ).alias("mins"),
    )
    return (
        mins.select(
            "doc_id",
            F.size(F.array_distinct("mins")).alias("n_fingerprints"),
            F.array_min("mins").alias("min_fp"),
        )
        .orderBy("doc_id")
    )
