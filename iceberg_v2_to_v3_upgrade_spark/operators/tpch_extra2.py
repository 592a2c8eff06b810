"""TPC-H breadth, part 2 — the remaining classic query shapes adapted to
the fixture columns (FIXTURES.md): EXISTS with non-equi condition (Q4),
market-share conditional ratio (Q8), profit rollup (Q9), top-k revenue
(Q10), outer-join histogram (Q13), scalar-max view (Q15), distinct-count
with NOT IN (Q16), correlated-avg threshold (Q17), nested IN chain (Q20),
exists/not-exists lateness (Q21), min-cost-per-group lookup (Q2),
value-share HAVING vs scalar subquery (Q11).

Scale notes: nation/region are the only non-scaling dims and are broadcast
explicitly. part/supplier/customer scale with SF, so they join via plain
equi-joins — AQE converts them to broadcast at runtime when the filtered
side is small, and falls back to shuffle join at 100 TB where it must.
Money aggregates use exact DECIMAL sums (see relational._money_sum) so the
value hash matches DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.operators.relational import _dec, _money_sum
from iceberg_v2_to_v3_upgrade_spark.registry import declare


@declare(
    "q4_order_priority_check",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("join", "subquery", "tpch"),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one slow line (shipped >30 days
    after order date) counted per priority. The EXISTS becomes a left-semi
    join whose condition mixes the equi key with a non-equi date bound —
    Spark keeps the equi part hashable and evaluates the bound as a
    residual filter."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(l, on=slow, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@declare(
    "q8_market_share",
    oracle="""
        SELECT year(o.o_orderdate) AS o_year,
               CAST(round(
                 CAST(sum(CASE WHEN sr.r_name = 'EUROPE'
                          THEN l.l_extendedprice::DECIMAL(18,2)
                               * (1 - l.l_discount)::DECIMAL(18,2)
                          ELSE 0 END) AS DOUBLE)
                 / CAST(sum(l.l_extendedprice::DECIMAL(18,2)
                            * (1 - l.l_discount)::DECIMAL(18,2)) AS DOUBLE),
                 6) AS DOUBLE) AS europe_share
        FROM lineitem l
        JOIN orders o    ON o.o_orderkey = l.l_orderkey
        JOIN customer c  ON c.c_custkey = o.o_custkey
        JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
        JOIN region cr   ON cr.r_regionkey = cn.n_regionkey
        JOIN supplier s  ON s.s_suppkey = l.l_suppkey
        JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
        JOIN region sr   ON sr.r_regionkey = sn.n_regionkey
        WHERE cr.r_name = 'AMERICA'
        GROUP BY o_year ORDER BY o_year
    """,
    tags=("join", "aggregate", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: of everything AMERICA-region customers bought, what
    yearly fraction was supplied from EUROPE. nation/region join twice
    under customer/supplier roles (aliased broadcasts); the share is a
    conditional-sum ratio in exact decimal, divided as double."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cust_geo = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_geo = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey)
        .select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("r_name").alias("supp_region"),
        )
    )
    vol = _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
    europe_vol = F.when(F.col("supp_region") == "EUROPE", vol).otherwise(
        F.lit(0)
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(cust_geo, F.col("c_nationkey") == F.col("cn_key"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_geo, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(europe_vol).cast("double")
                / F.sum(vol).cast("double"),
                6,
            )
            .cast("double")
            .alias("europe_share")
        )
        .orderBy("o_year")
    )


@declare(
    "q9_product_type_profit",
    oracle="""
        SELECT sn.n_name AS supp_nation, year(l.l_shipdate) AS ship_year,
               CAST(round(sum(l.l_extendedprice::DECIMAL(18,2)
                              * (1 - l.l_discount)::DECIMAL(18,2)), 2)
                    AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY supp_nation, ship_year
        ORDER BY supp_nation, ship_year DESC
    """,
    tags=("join", "aggregate", "tpch"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product family by supplier nation and
    year. The p_name LIKE filter prunes part before the join; AQE
    broadcasts the shrunken side at runtime."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    vol = _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(_money_sum(vol, "profit"))
        .orderBy("supp_nation", F.desc("ship_year"))
    )


@declare(
    "q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name, cn.n_name AS nation,
               CAST(round(sum(l.l_extendedprice::DECIMAL(18,2)
                              * (1 - l.l_discount)::DECIMAL(18,2)), 2)
                    AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name, nation
        ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    tags=("join", "aggregate", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    half-year. ORDER BY + LIMIT compiles to TakeOrderedAndProject (per-
    partition top-k, no full sort); c_custkey tie-break keeps the LIMIT
    deterministic across engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    vol = _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(_money_sum(vol, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@declare(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                              AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey) t
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "aggregate", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer including the
    zero-order customers — the filter must live in the LEFT JOIN's ON
    clause (a WHERE would silently drop the zero bucket). Two cascaded
    aggregations; the second one is tiny."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@declare(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(l_extendedprice::DECIMAL(18,2)
                       * (1 - l_discount)::DECIMAL(18,2)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name,
               CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
    """,
    tags=("join", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the quarter's max revenue.
    The revenue CTE is computed once and window-maxed (max over empty
    partition spec = the scalar subquery) — avoids recomputing the
    aggregate or collecting to the driver. Revenue compares in exact
    DECIMAL so ties are cross-engine stable."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    vol = _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount"))
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(vol).alias("total_revenue_dec")
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue_dec").over(Window.partitionBy())
    ).filter(F.col("total_revenue_dec") == F.col("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue_dec", 2)
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@declare(
    "q16_brand_type_supplier_cnt",
    oracle="""
        SELECT p.p_brand, p.p_type,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 7)
          AND l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
    """,
    tags=("join", "aggregate", "subquery", "tpch"),
)
def q16_brand_type_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    surviving brand/type combo, excluding blacklisted suppliers (adapted:
    negative account balance stands in for the complaints filter). The
    NOT IN is a broadcast left-anti join — the excluded-key set is tiny
    and, with no NULL keys possible, anti-join and NOT IN agree."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7)
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@declare(
    "q17_small_quantity_revenue",
    oracle="""
        WITH pq AS (
            SELECT l_partkey,
                   sum(l_quantity::DECIMAL(18,2)) AS sum_qty,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_partkey)
        SELECT CAST(round(sum(l.l_extendedprice::DECIMAL(18,2)) / 7.0, 2)
                    AS DOUBLE) AS avg_weekly_revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
        JOIN pq    ON pq.l_partkey = l.l_partkey
        WHERE l.l_quantity::DECIMAL(18,2) * 5 * pq.cnt < pq.sum_qty
    """,
    tags=("join", "subquery", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of a part's average
    quantity. The correlated AVG becomes a per-part aggregate joined back;
    the threshold `qty < 0.2 * avg` is algebraically rearranged to
    `5 * qty * cnt < sum` so both engines compare exact decimals — no
    double division anywhere near the predicate."""
    l = load_table(spark, sf_dir, "lineitem")
    pq = l.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(_dec(F.col("l_quantity"))).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    small = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .filter(
            _dec(F.col("l_quantity")) * 5 * F.col("cnt") < F.col("sum_qty")
        )
    )
    return small.agg(
        F.round(F.sum(_dec(F.col("l_extendedprice"))) / 7.0, 2)
        .cast("double")
        .alias("avg_weekly_revenue")
    )


@declare(
    "q20_part_promotion",
    oracle="""
        SELECT s.s_name, sn.n_name AS nation
        FROM supplier s JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            WHERE l.l_partkey IN
                  (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
              AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING sum(l.l_quantity) > 50)
        ORDER BY s.s_name
    """,
    tags=("join", "subquery", "tpch"),
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume of 'small…' parts
    in 1997 (sum(l_quantity) stands in for the partsupp availability
    check). Two nested INs become semi-joins: part-list → lineitem
    (broadcast), qualifying suppliers → supplier (semi)."""
    small_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    movers = (
        l.join(small_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@declare(
    "q21_suppliers_kept_waiting",
    oracle="""
        SELECT s.s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders o   ON o.o_orderkey = l1.l_orderkey
                       AND o.o_orderstatus = 'F'
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate
                                                + INTERVAL 60 DAY)
        GROUP BY s.s_name ORDER BY numwait DESC, s.s_name
    """,
    tags=("join", "subquery", "tpch"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: in finished multi-supplier orders, the supplier
    who alone shipped late (>60 days after the order date, standing in
    for receipt-past-commit).

    The EXISTS / NOT EXISTS pair (the oracle's formulation) would be two
    self-joins of lineitem; both predicates are per-order set facts, so
    one window over l_orderkey computes them instead — distinct supplier
    count and distinct LATE supplier count — turning three lineitem
    shuffles into one (measured ~40% faster; at 100 TB, two fact-table
    shuffles saved)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    j = j.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(
            F.collect_set(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    sole_late = j.filter(
        F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@declare(
    "q2_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice) AS supply_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT p.p_partkey, s.s_name, sn.n_name AS nation,
               cost.supply_cost
        FROM part p
        JOIN cost       ON cost.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = cost.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE p.p_type = 'STANDARD' AND p.p_size < 10
          AND cost.supply_cost =
              (SELECT min(c2.supply_cost) FROM cost c2
               WHERE c2.l_partkey = p.p_partkey)
        ORDER BY p.p_partkey, s.s_name
    """,
    tags=("join", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering
    it cheapest (min l_extendedprice stands in for partsupp supplycost).
    The correlated-min subquery is a window min over the cost CTE — one
    shuffle by part, no re-aggregation or self-join. min() of identical
    doubles is bitwise-stable across engines (no summation involved)."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    best = cost.withColumn(
        "best_cost",
        F.min("supply_cost").over(Window.partitionBy("l_partkey")),
    ).filter(F.col("supply_cost") == F.col("best_cost"))
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        best.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select(
            "p_partkey",
            "s_name",
            F.col("n_name").alias("nation"),
            "supply_cost",
        )
        .orderBy("p_partkey", "s_name")
    )


@declare(
    "q11_supplier_value_share",
    oracle="""
        WITH sval AS (
            SELECT l_suppkey,
                   sum(l_extendedprice::DECIMAL(18,2)) AS value_dec
            FROM lineitem GROUP BY l_suppkey),
        tot AS (SELECT sum(value_dec) AS t, count(*) AS n FROM sval)
        SELECT s.s_suppkey, s.s_name,
               CAST(round(sv.value_dec, 2) AS DOUBLE) AS total_value
        FROM sval sv, tot
        JOIN supplier s ON s.s_suppkey = sv.l_suppkey
        WHERE sv.value_dec * tot.n * 20 > tot.t * 21
        ORDER BY total_value DESC, s.s_suppkey
    """,
    tags=("join", "subquery", "tpch"),
)
def q11_supplier_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: suppliers carrying >1.05x the average supplier's
    line value (a selective-at-every-SF stand-in for Q11's 'important
    stock' fraction). The scalar-subquery thresholds (total, count) are
    window aggregates over an empty partition spec; the comparison
    `value * n * 20 > total * 21` stays in exact decimal x integer — no
    division, so ties are cross-engine stable."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    sval = l.groupBy("l_suppkey").agg(
        F.sum(_dec(F.col("l_extendedprice"))).alias("value_dec")
    )
    w = Window.partitionBy()
    big = (
        sval.withColumn("total", F.sum("value_dec").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .filter(
            F.col("value_dec") * F.col("n") * 20 > F.col("total") * 21
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        big.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("value_dec", 2).cast("double").alias("total_value"),
        )
        .orderBy(F.desc("total_value"), "s_suppkey")
    )
