"""Advanced relational operators: as-of join, percentiles, pivot, array
aggregation, arg-min/max, full-outer & cross joins, scalar subqueries, CTEs.

These complete the §2 relational surface beyond what the reference's SQL
exercises (its DML implies them; the star-schema fixtures exercise them) and
add the time-series as-of join — a classic operator Spark lacks natively,
composed here from union + window (SURVEY.md custom-operator policy (a):
composition of built-in DataFrame ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table, register_views
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_ASOF_ORACLE = """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM p ASOF JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
"""


@declare("c7_asof_join", oracle=_ASOF_ORACLE, tags=("join", "asof", "timeseries"))
def c7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase matched to the user's most recent view at
    or before it. Composed as union + window last(ignorenulls) — one shuffle
    keyed on user_id, linear at any scale (vs. the naive range-join which is
    quadratic per user). DuckDB's native ASOF JOIN is the oracle, so the
    composition is verified against a first-class implementation.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_purchase"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.col("event_id"),
        F.lit(1).alias("is_purchase"),
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    # views sort before purchases at identical ts => "at or before" matches
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).withColumn(
        "last_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("is_purchase") == 1) & F.col("last_view_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            (F.unix_micros("ts") - F.unix_micros("last_view_ts")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


@declare(
    "h4_percentiles",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("aggregate", "percentile"),
)
def h4_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL `percentile`) per group. At
    100 TB you'd switch to approx_percentile (sketch-mergeable); the exact
    form is the oracle-checkable twin."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@declare(
    "h5_array_agg",
    oracle="""
        SELECT r.r_name,
               array_to_string(list_sort(list(n.n_name)), ',') AS nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
    """,
    tags=("aggregate", "array"),
)
def h5_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + sort_array: grouped array aggregation, joined to a
    string for the cross-engine hash (the driver's canonicalizer sorts via
    pandas, which cannot hash list cells). The native array<string> form is
    `h5_array_agg_native` below, kept under local pytest parity."""
    return h5_array_agg_native(spark, sf_dir).withColumn(
        "nations", F.array_join("nations", ",")
    )


def h5_array_agg_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-typed variant (sorted for cross-engine determinism)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.sort_array(F.collect_list("n_name")).alias("nations"))
        .orderBy("r_name")
    )


@declare(
    "h6_pivot",
    oracle="""
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("aggregate", "pivot"),
)
def h6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority x status (explicit value list so the
    output schema is static — required for both plan stability and the
    cross-engine comparison)."""
    pivoted = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


@declare(
    "d6_arg_min_max",
    oracle="""
        SELECT o_orderstatus,
               arg_max(o_orderkey, o_totalprice) AS biggest_order,
               round(max(o_totalprice), 2) AS biggest_price,
               arg_min(o_orderkey, o_totalprice) AS smallest_order
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("aggregate", "argminmax"),
)
def d6_arg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max/arg-min) aggregates."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.round(F.max("o_totalprice"), 2).alias("biggest_price"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        )
        .orderBy("o_orderstatus")
    )


@declare(
    "h7_stats_agg",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 2) AS price_stddev,
               round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
               round(avg(l_tax), 4) AS avg_tax
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("aggregate", "stats"),
)
def h7_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev / correlation (single-pass,
    map-side-combinable moments)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_corr"
            ),
            F.round(F.avg("l_tax"), 4).alias("avg_tax"),
        )
        .orderBy("l_returnflag")
    )


@declare(
    "c8_full_outer_join",
    oracle="""
        WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                   FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                   FROM supplier GROUP BY 1)
        SELECT coalesce(c.nk, s.nk) AS nationkey,
               coalesce(c.n_cust, 0) AS n_customers,
               coalesce(s.n_supp, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
        ORDER BY nationkey
    """,
    tags=("join", "outer"),
)
def c8_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated key sets (aggregate-below-join:
    shuffle the small aggregates, never the raw tables)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
            F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@declare(
    "c9_cross_join",
    oracle="""
        SELECT r.r_name, s.o_orderstatus
        FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        ORDER BY r.r_name, s.o_orderstatus
    """,
    tags=("join", "cross"),
)
def c9_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (dimension-grid generation — both sides tiny by
    construction; a guard at scale is that neither input is a fact table)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).orderBy("r_name", "o_orderstatus")


_SCALAR_SUBQ = """
    SELECT count(*) AS n_above_avg,
           round(avg(o_totalprice), 2) AS overall_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
"""


@declare("g4_scalar_subquery", oracle=_SCALAR_SUBQ, tags=("subquery", "sql"))
def g4_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery through the SQL entry point (same text runs on both
    engines — the engine's `spark.sql` surface, reference K1 made local).

    Note: overall_avg aggregates the *filtered* rows in both engines —
    identical semantics, identical result.
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SCALAR_SUBQ)


_CTE_EXISTS = """
    WITH big_customers AS (
        SELECT o_custkey FROM orders
        GROUP BY o_custkey HAVING sum(o_totalprice) > 1500000)
    SELECT c_mktsegment, count(*) AS n_big
    FROM customer
    WHERE EXISTS (SELECT 1 FROM big_customers b WHERE b.o_custkey = c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@declare("g5_cte_exists", oracle=_CTE_EXISTS, tags=("subquery", "cte", "sql"))
def g5_cte_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + correlated EXISTS (planned as a left-semi join by Catalyst)."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_CTE_EXISTS)


@declare(
    "h8_map_construct",
    oracle="""
        SELECT p_partkey, p_brand AS brand_val, 2 AS n_keys
        FROM part ORDER BY p_partkey
    """,
    tags=("scalar", "map"),
)
def h8_map_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map(...) constructor + element_at + map_keys — the H3 scalar surface
    (reference uses map literals for procedure options,
    internal/upgrade_table.py:124). The oracle checks the extracted values
    (DuckDB's map type differs; the *semantics* are the comparable part)."""
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.element_at(m, "brand").alias("brand_val"),
            F.size(F.map_keys(m)).alias("n_keys"),
        )
        .orderBy("p_partkey")
    )
