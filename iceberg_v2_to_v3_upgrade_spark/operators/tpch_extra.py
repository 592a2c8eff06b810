"""Additional TPC-H-style queries adapted to the fixture columns — breadth
for the relational surface (multi-join with self-referenced dims,
conditional aggregates, HAVING-subquery membership, OR-of-ANDs pushdown,
anti-join + scalar subquery).

Numbering follows the TPC-H query each shape derives from; predicates are
adapted to the columns the driver fixtures actually have (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare


@declare(
    "q7_nation_volume_shipping",
    oracle="""
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               year(l.l_shipdate) AS ship_year,
               CAST(round(sum(l.l_extendedprice::DECIMAL(18,2)
                              * (1 - l.l_discount)::DECIMAL(18,2)), 2) AS DOUBLE)
                   AS volume
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE cn.n_name <> sn.n_name
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2, 3
        HAVING sum(l.l_extendedprice::DECIMAL(18,2)
                   * (1 - l.l_discount)::DECIMAL(18,2)) > 100000
        ORDER BY cust_nation, supp_nation, ship_year
    """,
    tags=("join", "aggregate", "tpch"),
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year. The nation dim
    joins twice under different roles (aliased broadcast); HAVING filters
    post-aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    # exact decimal sum: fp money sums land on half-cent boundaries and
    # flip round(.,2) across engines (see relational._money_sum)
    vol = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.round(vol, 2).cast("double").alias("volume"), vol.alias("_raw"))
        .filter(F.col("_raw") > 100000)
        .select("cust_nation", "supp_nation", "ship_year", "volume")
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


@declare(
    "q12_priority_shipmode",
    oracle="""
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_linestatus ORDER BY l.l_linestatus
    """,
    tags=("join", "aggregate", "tpch"),
)
def q12_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (CASE inside SUM) after an
    equi-join — the canonical pivot-without-pivot."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@declare(
    "q14_promo_revenue_ratio",
    oracle="""
        SELECT round(
            100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                             THEN l.l_extendedprice::DECIMAL(18,2)
                                  * (1 - l.l_discount)::DECIMAL(18,2)
                             ELSE 0 END) AS DOUBLE)
            / CAST(sum(l.l_extendedprice::DECIMAL(18,2)
                       * (1 - l.l_discount)::DECIMAL(18,2)) AS DOUBLE), 4)
            AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    tags=("join", "aggregate", "tpch"),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional/total aggregate ratio
    over a broadcast part join."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@declare(
    "q18_large_volume_customers",
    oracle="""
        SELECT c.c_name, o.o_orderkey, o.o_orderdate,
               round(o.o_totalprice, 2) AS o_totalprice,
               round(t.total_qty, 2) AS total_qty
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 150) t
          ON t.l_orderkey = o.o_orderkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    tags=("join", "subquery", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: membership in a HAVING-filtered aggregate subquery.
    Aggregate-below-join: lineitem collapses to per-order quantities
    BEFORE joining orders (shuffle carries one row per order)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 150)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("raw_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@declare(
    "q19_disjunctive_pushdown",
    oracle="""
        SELECT CAST(round(sum(l.l_extendedprice::DECIMAL(18,2)
                              * (1 - l.l_discount)::DECIMAL(18,2)), 2) AS DOUBLE)
                   AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 5 AND l.l_quantity <= 25)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity >= 10 AND l.l_quantity <= 35)
    """,
    tags=("join", "filter", "tpch"),
)
def q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides. Catalyst extracts the
    common sub-predicates per side and pushes them below the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    return joined.filter(cond1 | cond2).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount")).cast("decimal(18,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@declare(
    "q22_global_sales_opportunity",
    oracle="""
        WITH avg_bal AS (
            SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
        SELECT c.c_mktsegment, count(*) AS n_custs,
               round(sum(c.c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT a FROM avg_bal)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    tags=("subquery", "anti", "tpch"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + anti-join (customers
    above average balance with no large orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    # scalar subquery as a broadcast single-row cross join (no driver
    # round-trip; Catalyst plans it exactly like SQL's scalar subquery)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@declare(
    "h9_regexp_extract",
    oracle="""
        SELECT regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               count(*) AS n_parts,
               round(avg(p_retailprice), 2) AS avg_price
        FROM part GROUP BY 1 ORDER BY 1
    """,
    tags=("scalar", "regexp"),
)
def h9_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract with a capture group + grouped aggregate."""
    return (
        load_table(spark, sf_dir, "part")
        .groupBy(
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word")
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
        .orderBy("first_word")
    )
