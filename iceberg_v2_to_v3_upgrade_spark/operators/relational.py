"""Relational read surface (SURVEY.md §2.A/B/C/D/E/F/G/H).

Reference-parity queries first (each cites the reference statement it
re-expresses), then the relational completion over the star schema (joins,
aggregations, windows, set ops) that the reference's DML surface implies.

Scale notes apply to every query here:
- Filters/projections are expressed declaratively so Catalyst pushes them
  into the parquet scan (check: ``PushedFilters`` in .explain).
- Dimension tables (region/nation/supplier, and customer vs lineitem) are
  broadcast explicitly — at 100 TB the fact side never shuffles for these.
- Aggregations use built-in hash aggregates (map-side partial agg for free).
- Every query ends in an aggregation or a deterministic ORDER BY so results
  are hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------------------
# §2.A / §2.B / §2.F — scans, projections, filters, sort, limit
# --------------------------------------------------------------------------


@declare(
    "a1_scan_order_by",
    oracle="SELECT * FROM part ORDER BY p_partkey",
    tags=("scan", "sort"),
)
def a1_scan_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + total sort: `SELECT * FROM t ORDER BY id`.

    Reference: internal/create_demo_table.py:137, test_v3_mor_deletes.py:48.
    Total sort = range-partitioned exchange; at scale this is the one place
    a global sort is intended, so no repartition tricks here.
    """
    return load_table(spark, sf_dir, "part").orderBy("p_partkey")


@declare(
    "b2_literal_status_count",
    oracle="SELECT 'rows present' AS status, count(*) AS cnt FROM part",
    tags=("projection", "aggregate"),
)
def b2_literal_status_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal projection alongside a scalar aggregate.

    Reference: `SELECT 'Before delete:' as status, COUNT(*) as cnt`
    (internal/test_v3_mor_deletes.py:39). Count-only scan: Catalyst prunes
    to zero columns + parquet row-group counts.
    """
    return (
        load_table(spark, sf_dir, "part")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("rows present").alias("status"), "cnt")
    )


@declare(
    "b3_eq_filter_numeric",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_partkey, l_quantity "
        "FROM lineitem WHERE l_orderkey = 7 ORDER BY l_linenumber"
    ),
    tags=("filter",),
)
def b3_eq_filter_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric equality predicate: `WHERE id = n`.

    Reference: internal/test_v3_mor_deletes.py:42 (`WHERE id = 1`).
    Pushed to the scan (PushedFilters: [EqualTo(l_orderkey,7)]).
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") == 7)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_linenumber")
    )


@declare(
    "b4_eq_filter_string",
    oracle=(
        "SELECT p_partkey, p_name, p_brand FROM part "
        "WHERE p_brand = 'Brand#1' ORDER BY p_partkey"
    ),
    tags=("filter", "partition-pruning"),
)
def b4_eq_filter_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String equality on a categorical (partition-style) column.

    Reference: `WHERE category = 'electronics'`
    (internal/create_demo_table.py:133). On a table partitioned by this
    column the predicate prunes partitions before any IO.
    """
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


@declare(
    "b5_in_list_filter",
    oracle=(
        "SELECT p_partkey, p_name FROM part "
        "WHERE p_partkey IN (2, 4, 6) ORDER BY p_partkey"
    ),
    tags=("filter",),
)
def b5_in_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate: `WHERE id IN (2, 4, 6)`.

    Reference: internal/create_demo_table.py:130 (the MoR DELETE predicate).
    """
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey").isin(2, 4, 6))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@declare(
    "b6_arith_projection",
    oracle=(
        "SELECT p_partkey, p_retailprice, "
        "round(p_retailprice * 1.1, 2) AS boosted_price "
        "FROM part WHERE p_type = 'PROMO' ORDER BY p_partkey"
    ),
    tags=("projection", "expression"),
)
def b6_arith_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression projection: `amount * 1.1`.

    Reference: the MoR UPDATE SET expression
    (internal/create_demo_table.py:133), read-side form.
    """
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select(
            "p_partkey",
            "p_retailprice",
            F.round(F.col("p_retailprice") * 1.1, 2).alias("boosted_price"),
        )
        .orderBy("p_partkey")
    )


@declare(
    "d1_count_star",
    oracle="SELECT count(*) AS cnt FROM lineitem",
    tags=("aggregate",),
)
def d1_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped COUNT(*) — the reference's cardinality probe.

    Reference: internal/verify_in_databricks.py:102,
    test_v3_mor_deletes.py:39,45.
    """
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@declare(
    "f2_order_by_limit",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    tags=("sort", "limit", "topk"),
)
def f2_order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ORDER BY ... LIMIT n (top-k).

    Reference: `SELECT * LIMIT 5/10` probes (verify_in_databricks.py:79,
    test_v3_mor_deletes.py:105) made hash-stable with a total order.
    Spark executes this as TakeOrderedAndProject — no global sort
    materialization, O(k) per partition then driver merge: scale-safe.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# §2.I read-side DML semantics (MoR delete/update as the reference's engine
# evaluates them). The mutable-table module (tables/) does the stateful
# version; these declared twins express the post-state purely relationally
# so the DuckDB oracle can check them.
# --------------------------------------------------------------------------


@declare(
    "i1_mor_delete_scan",
    oracle=(
        "SELECT count(*) AS cnt, round(sum(p_retailprice), 2) AS total_price "
        "FROM part WHERE p_partkey NOT IN (2, 4, 6)"
    ),
    tags=("dml", "anti-join"),
)
def i1_mor_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE scan: data files ANTI JOIN delete file.

    Reference: DELETE FROM ... WHERE id IN (2,4,6)
    (internal/create_demo_table.py:130) and the implicit read-path merge the
    whole tool exists for (README.md:7). Implemented as a genuine left-anti
    join against a (broadcast) deleted-keys ledger — exactly Iceberg's MoR
    read path; at 100 TB the ledger is small relative to data so the
    anti-join is a broadcast, never a shuffle of the fact table.
    """
    data = load_table(spark, sf_dir, "part")
    deletes = spark.createDataFrame([(2,), (4,), (6,)], "p_partkey bigint")
    return (
        data.join(F.broadcast(deletes), "p_partkey", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
        )
    )


@declare(
    "i2_mor_update_scan",
    oracle=(
        "SELECT p_partkey, "
        "round(CASE WHEN p_type = 'PROMO' THEN p_retailprice * 1.1 "
        "ELSE p_retailprice END, 2) AS p_retailprice "
        "FROM part ORDER BY p_partkey"
    ),
    tags=("dml", "expression"),
)
def i2_mor_update_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE read-back: delete matched + reinsert rewritten.

    Reference: UPDATE ... SET amount = amount*1.1 WHERE category='electronics'
    (internal/create_demo_table.py:133). Relational form: CASE WHEN — one
    narrow projection, no shuffle at any scale.
    """
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.round(
                F.when(
                    F.col("p_type") == "PROMO", F.col("p_retailprice") * 1.1
                ).otherwise(F.col("p_retailprice")),
                2,
            ).alias("p_retailprice"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# §2.C joins (explicit), §2.D aggregations, §2.E windows, §2.G set ops
# --------------------------------------------------------------------------


# --- cross-engine determinism for money aggregates -----------------------
# The fixture money columns are 2-decimal values stored as doubles; an fp
# SUM of them is order-dependent, and true sums routinely land exactly on
# half-cent boundaries, where a 1e-9 engine difference flips round(.,2)
# (SURVEY §7 risk 3 — observed: 3/1169 q7 groups). Fix: sum in EXACT
# decimal (cast each 2-dp factor to DECIMAL first) in both engines, then
# cast the rounded result back to double. Identical bit-for-bit.

def _dec(col: Column) -> Column:
    return col.cast("decimal(18,2)")


def _money_sum(expr: Column, alias: str) -> Column:
    return F.round(F.sum(expr), 2).cast("double").alias(alias)


@declare(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(round(sum(l_extendedprice::DECIMAL(18,2)), 2) AS DOUBLE)
                   AS sum_base_price,
               CAST(round(sum(l_extendedprice::DECIMAL(18,2)
                              * (1 - l_discount)::DECIMAL(18,2)), 2) AS DOUBLE)
                   AS sum_disc_price,
               CAST(round(sum(l_extendedprice::DECIMAL(18,2)
                              * (1 - l_discount)::DECIMAL(18,2)
                              * (1 + l_tax)::DECIMAL(18,2)), 2) AS DOUBLE)
                   AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(CAST(sum(l_extendedprice::DECIMAL(18,2)) AS DOUBLE)
                     / count(*), 4) AS avg_price,
               round(CAST(sum(l_discount::DECIMAL(18,2)) AS DOUBLE)
                     / count(*), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary) adapted to fixture columns.

    Pure hash aggregate over 6 groups — map-side partial aggregation means
    the shuffle carries 6 rows per task regardless of input size. Money
    sums are exact-decimal for cross-engine determinism (see _money_sum).
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = _dec(F.col("l_extendedprice"))
    disc_price = price * _dec(1 - F.col("l_discount"))
    charge = disc_price * _dec(1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _money_sum(price, "sum_base_price"),
            _money_sum(disc_price, "sum_disc_price"),
            _money_sum(charge, "sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                F.sum(price).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_price"),
            F.round(
                F.sum(_dec(F.col("l_discount"))).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@declare(
    "q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               CAST(round(sum(l.l_extendedprice::DECIMAL(18,2)
                              * (1 - l.l_discount)::DECIMAL(18,2)), 2) AS DOUBLE)
                   AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    tags=("join", "aggregate", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted: 3-way join + grouped revenue + top-k.

    customer is small relative to lineitem -> broadcast the filtered
    customer side into orders, so only the orders<->lineitem equi-join
    shuffles (both sides keyed on orderkey).
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(
            F.broadcast(c).join(o, F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _money_sum(
                _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount")),
                "revenue",
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@declare(
    "q5_nation_volume",
    oracle="""
        SELECT n.n_name,
               CAST(round(sum(l.l_extendedprice::DECIMAL(18,2)
                              * (1 - l.l_discount)::DECIMAL(18,2)), 2) AS DOUBLE)
                   AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    tags=("join", "aggregate", "bench"),
)
def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adapted: 6-table join, revenue per nation.

    Join order: lineitem (fact) joins orders on orderkey (the only big
    shuffle), then everything else — customer, supplier, nation, region —
    is broadcast. One shuffle total for a 6-table join.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            _money_sum(
                _dec(F.col("l_extendedprice")) * _dec(1 - F.col("l_discount")),
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@declare(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(round(sum(l_extendedprice::DECIMAL(18,2)
                              * l_discount::DECIMAL(18,2)), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("aggregate", "filter", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective multi-predicate scan + scalar aggregate.

    All four predicates push to the parquet scan; the aggregate is a single
    partial+final sum — the cheapest possible shape at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(
                _dec(F.col("l_extendedprice")) * _dec(F.col("l_discount")),
                "revenue",
            )
        )
    )


@declare(
    "c3_broadcast_dim_join",
    oracle="""
        SELECT r.r_name, count(*) AS n_customers,
               round(sum(c.c_acctbal), 2) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
    """,
    tags=("join", "broadcast"),
)
def c3_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup via chained broadcast joins (zero fact shuffles
    until the final 5-group aggregate)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


@declare(
    "c4_semi_join",
    oracle="""
        SELECT c.c_custkey, c.c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000)
        ORDER BY c.c_custkey
    """,
    tags=("join", "semi"),
)
def c4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers having at least one qualifying order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@declare(
    "c5_anti_join",
    oracle="""
        SELECT c.c_custkey, c.c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c.c_custkey
    """,
    tags=("join", "anti"),
)
def c5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders — same physical shape as the
    MoR delete-file merge (C1)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@declare(
    "c6_outer_join_coalesce",
    oracle="""
        SELECT n.n_name, coalesce(s.cnt, 0) AS n_suppliers
        FROM nation n
        LEFT JOIN (SELECT s_nationkey, count(*) AS cnt
                   FROM supplier GROUP BY s_nationkey) s
               ON n.n_nationkey = s.s_nationkey
        ORDER BY n.n_name
    """,
    tags=("join", "outer"),
)
def c6_outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with aggregate-below-join (pre-aggregate the big side
    before joining — the scale-safe order)."""
    n = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        n.join(s, F.col("n_nationkey") == F.col("s_nationkey"), "left")
        .select("n_name", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_suppliers"))
        .orderBy("n_name")
    )


@declare(
    "d4_distinct_count_grouped",
    oracle="""
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("aggregate", "distinct"),
)
def d4_distinct_count_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-column DISTINCT aggregation (expand + two-phase agg)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


@declare(
    "d5_rollup",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("aggregate", "rollup"),
)
def d5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregate (subtotals + grand total)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@declare(
    "e1_window_rank",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn
    """,
    tags=("window", "topk"),
)
def e1_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number window (the scalable
    per-group top-k: one shuffle on the partition key, no global sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@declare(
    "e2_window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_total
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("window",),
)
def e2_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer — rows-frame window with a
    deterministic tiebreaker (o_orderkey) so both engines accumulate in the
    same order."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@declare(
    "e3_window_lag_delta",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(o_totalprice -
                     lag(o_totalprice) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey),
                     2) AS delta_prev
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "lag"),
)
def e3_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window: per-customer order-to-order price delta."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
            ).alias("delta_prev"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@declare(
    "g1_union_all",
    oracle="""
        SELECT r_name AS name, 'region' AS kind FROM region
        UNION ALL
        SELECT n_name AS name, 'nation' AS kind FROM nation
        ORDER BY kind, name
    """,
    tags=("setop",),
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two conformed projections."""
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.lit("region").alias("kind")
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.lit("nation").alias("kind")
    )
    return r.unionAll(n).orderBy("kind", "name")


@declare(
    "g2_except_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    tags=("setop", "except"),
)
def g2_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — also the relational model of MoR DELETE semantics."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s).orderBy("nationkey")


@declare(
    "g3_intersect",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    tags=("setop", "intersect"),
)
def g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


# --------------------------------------------------------------------------
# §2.H scalar function library
# --------------------------------------------------------------------------


@declare(
    "h1_string_functions",
    oracle="""
        SELECT p_partkey,
               lower(p_name)                       AS name_lower,
               upper(p_brand)                      AS brand_upper,
               length(p_name)                      AS name_len,
               substr(p_name, 1, 4)                AS name_prefix,
               concat(p_brand, ':', p_type)        AS brand_type,
               replace(p_name, ' ', '_')           AS name_snake
        FROM part ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def h1_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar library: lower/upper/length/substr/concat/replace."""
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 4).alias("name_prefix"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        )
        .orderBy("p_partkey")
    )


@declare(
    "h2_date_functions",
    oracle="""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    tags=("scalar", "date", "aggregate"),
)
def h2_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc bucketing + grouped aggregate over time."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("order_month")
    )


@declare(
    "h3_conditional_case",
    oracle="""
        SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               o_orderstatus,
               count(*) AS cnt
        FROM orders
        GROUP BY 1, 2
        ORDER BY price_band, o_orderstatus
    """,
    tags=("scalar", "case"),
)
def h3_conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE WHEN bucketing + grouped count."""
    band = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(band.alias("price_band"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("price_band", "o_orderstatus")
    )
