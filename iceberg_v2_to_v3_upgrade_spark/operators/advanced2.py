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


@declare(
    "h10_null_handling",
    oracle="""
        WITH t AS (
            SELECT o_orderkey,
                   nullif(o_orderstatus, 'O') AS maybe_status,
                   CASE WHEN o_totalprice > 50000 THEN o_totalprice END
                       AS big_price
            FROM orders)
        SELECT coalesce(maybe_status, 'OPEN') AS status_norm,
               count(*) AS n,
               count(maybe_status) AS n_nonnull,
               count(*) - count(big_price) AS n_small,
               CAST(sum(CASE WHEN maybe_status IS NOT DISTINCT FROM NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null
        FROM t GROUP BY status_norm ORDER BY status_norm
    """,
    tags=("scalar", "null"),
)
def h10_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics battery: nullif / coalesce / conditional-NULL
    projection / count-ignores-NULL / null-safe equality (<=>)."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("maybe_status"),
        F.when(F.col("o_totalprice") > 50000, F.col("o_totalprice")).alias(
            "big_price"
        ),
    )
    return (
        t.groupBy(
            F.coalesce("maybe_status", F.lit("OPEN")).alias("status_norm")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("maybe_status").alias("n_nonnull"),
            (F.count(F.lit(1)) - F.count("big_price")).alias("n_small"),
            F.sum(
                F.when(
                    F.col("maybe_status").eqNullSafe(F.lit(None)), 1
                ).otherwise(0)
            ).alias("n_nullsafe_null"),
        )
        .orderBy("status_norm")
    )


@declare(
    "h11_datetime_arithmetic",
    oracle="""
        SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
               count(*) AS n_orders,
               min(day(o_orderdate)) AS first_dom,
               max(datediff('day', TIMESTAMP '1995-01-01 00:00:00',
                            o_orderdate)) AS max_days_since_epoch,
               min(CAST(date_trunc('month', o_orderdate) AS DATE))
                   AS month_start,
               max(CAST(o_orderdate + INTERVAL 30 DAY AS DATE)) AS due_30d
        FROM orders GROUP BY y, q ORDER BY y, q
    """,
    tags=("scalar", "datetime"),
)
def h11_datetime_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime library battery: field extraction (year/quarter/day),
    datediff, date_trunc, interval arithmetic — grouped so the result is
    compact. Spark's datediff(end, start) argument order is the reverse
    of DuckDB's datediff('day', start, end); both forms compute
    end - start here."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.dayofmonth("o_orderdate")).alias("first_dom"),
            F.max(
                F.datediff(
                    F.col("o_orderdate"),
                    F.lit("1995-01-01").cast("timestamp"),
                )
            ).alias("max_days_since_epoch"),
            F.min(F.date_trunc("month", "o_orderdate").cast("date")).alias(
                "month_start"
            ),
            F.max(
                (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast(
                    "date"
                )
            ).alias("due_30d"),
        )
        .orderBy("y", "q")
    )


@declare(
    "h12_nested_types",
    oracle="""
        WITH t AS (
            SELECT r_regionkey,
                   struct_pack(k := r_regionkey, nm := r_name) AS s,
                   MAP {'name': r_name} AS m,
                   [r_regionkey, r_regionkey * 10] AS arr
            FROM region)
        SELECT s.k AS key_from_struct,
               upper(s.nm) AS name_from_struct,
               m['name'][1] AS name_from_map,
               arr[1] AS first_elem,
               arr[2] AS second_elem,
               len(arr) AS arr_len
        FROM t ORDER BY key_from_struct
    """,
    tags=("scalar", "nested"),
)
def h12_nested_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type construction and access: struct field access, map
    lookup, 1-based array indexing, array length — the complex-type
    surface a training-data schema (metadata structs, tag maps, embedding
    arrays) leans on."""
    r = load_table(spark, sf_dir, "region")
    t = r.select(
        "r_regionkey",
        F.struct(
            F.col("r_regionkey").alias("k"), F.col("r_name").alias("nm")
        ).alias("s"),
        F.create_map(F.lit("name"), F.col("r_name")).alias("m"),
        F.array(
            F.col("r_regionkey"), F.col("r_regionkey") * 10
        ).alias("arr"),
    )
    return t.select(
        F.col("s.k").alias("key_from_struct"),
        F.upper(F.col("s.nm")).alias("name_from_struct"),
        F.element_at("m", "name").alias("name_from_map"),
        F.element_at("arr", 1).alias("first_elem"),
        F.element_at("arr", 2).alias("second_elem"),
        F.size("arr").alias("arr_len"),
    ).orderBy("key_from_struct")


@declare(
    "k1_salted_aggregation",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n_rows,
               round(sum(l_quantity::DECIMAL(18,2)), 2)::DOUBLE AS sum_qty,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("skew", "aggregate"),
)
def k1_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe two-phase salted aggregate, oracle-proven equal to a
    plain GROUP BY. l_returnflag has only 3 values — exactly the
    hot-key-per-reducer shape salting exists for: each key spreads over
    16 salt buckets before the merge phase."""
    from iceberg_v2_to_v3_upgrade_spark.functions.skew import salted_agg

    l = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty_dec", _dec(F.col("l_quantity"))
    )
    out = salted_agg(
        l,
        keys=["l_returnflag"],
        aggs={
            "n_rows": ("l_returnflag", "count"),
            "sum_qty_dec": ("qty_dec", "sum"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
        salt=16,
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.round("sum_qty_dec", 2).cast("double").alias("sum_qty"),
        "min_price",
        "max_price",
    ).orderBy("l_returnflag")


@declare(
    "k2_salted_join",
    oracle="""
        SELECT s.s_name,
               count(*) AS n_lines,
               round(sum(l.l_quantity::DECIMAL(18,2)), 2)::DOUBLE
                   AS total_qty
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_name ORDER BY s.s_name
    """,
    tags=("skew", "join"),
)
def k2_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe salted join (dim replicated salt-fold, fact salted),
    oracle-proven equal to the plain equi-join. The shape for a dim too
    big to broadcast when one fact key dominates."""
    from iceberg_v2_to_v3_upgrade_spark.functions.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), _dec(F.col("l_quantity")).alias("qty_dec")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        salted_join(l, s, "s_suppkey", salt=8)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("qty_dec"), 2).cast("double").alias("total_qty"),
        )
        .orderBy("s_name")
    )


_PROFILE_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_quantity",
    "l_discount",
    "l_returnflag",
    "l_shipdate",
)

_PROFILE_ORACLE = "\n        UNION ALL ".join(
    f"SELECT '{c}' AS column_name, count(*) AS n_rows, "
    f"count(*) - count({c}) AS n_nulls, "
    f"count(DISTINCT {c}) AS n_distinct FROM lineitem"
    for c in _PROFILE_COLS
) + "\n        ORDER BY column_name"


@declare(
    "d10_table_profile",
    oracle=_PROFILE_ORACLE,
    tags=("profiling", "metadata"),
)
def d10_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of lineitem — row count, null count,
    exact distinct cardinality per column — in ONE scan: a single
    aggregate computes every column's stats (Spark plans the multi-column
    exact count-distinct as one Expand + aggregate pass), then a stack()
    unpivots the one-row result to long form driver-side for free.

    The oracle spells it as per-column UNION ALL scans; at 100 TB the
    production knob is swapping count(DISTINCT) for
    approx_count_distinct (HLL, n8's path) to drop the Expand factor —
    the operator shape is otherwise unchanged."""
    li = load_table(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return (
        one.select(
            "n_rows",
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) "
                "AS (column_name, n_nulls, n_distinct)"
            ),
        )
        .select("column_name", "n_rows", "n_nulls", "n_distinct")
        .orderBy("column_name")
    )
