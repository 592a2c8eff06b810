"""Declared queries, round 3 batch I: exchange reuse and the WAP
branch-vs-main audit diff.

k11 pins the remaining Catalyst scale feature the plan suite didn't yet
cover: two aggregations over the same key reuse ONE shuffle
(ReusedExchange) instead of scanning and exchanging twice. i25 is the
write-audit-publish workflow's missing middle step — the diff a reviewer
reads between the staged branch and main BEFORE fast-forwarding, i24's
reconciliation applied to the reference's branch arc (README.md:30-38).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- k11


_REUSE_ORACLE = """
    WITH s AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem GROUP BY 1),
    c AS (
        SELECT l_suppkey, count(l_extendedprice) AS n_items
        FROM lineitem GROUP BY 1)
    SELECT s.l_suppkey, s.revenue, c.n_items
    FROM s JOIN c USING (l_suppkey)
    ORDER BY s.revenue DESC, s.l_suppkey
    LIMIT 20
"""


@declare("k11_exchange_reuse", oracle=_REUSE_ORACLE, tags=("scale", "plan"))
def k11_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregations over the same grouping key, joined — the shape
    where Catalyst's ReuseExchange rule matters. Left as two naive
    groupBys the branches DON'T share (partial aggregation sits below
    each exchange, making the subtrees differ — measured, not assumed),
    so the fact is explicitly repartitioned by the key once: that single
    exchange satisfies both aggregations' required distribution, the
    second branch plans as a ReusedExchange, and the downstream join is
    co-partitioned (zero extra shuffles). The trade: map-side combine is
    skipped — worth it when several aggregations share one wide fact.
    Plan pinned in tests/test_plan_quality_r3e.py."""
    l = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_extendedprice")
        .repartition("l_suppkey")
    )
    revenue = l.groupBy("l_suppkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue")
    )
    # count the price column, not lit(1): counting a literal lets column
    # pruning drop l_extendedprice from this branch's subtree, the two
    # exchanges stop being identical, and ReuseExchange can't fire
    counts = l.groupBy("l_suppkey").agg(
        F.count("l_extendedprice").alias("n_items")
    )
    return (
        revenue.join(counts, "l_suppkey")
        .orderBy(F.col("revenue").desc(), "l_suppkey")
        .limit(20)
    )


# --------------------------------------------------------------- i25


_WAP_AUDIT_ORACLE = """
    SELECT 'deleted' AS change_type, count(*) AS n_rows
    FROM part WHERE p_partkey % 101 = 0
    UNION ALL
    SELECT 'modified', count(*) FROM part
    WHERE p_brand = 'Brand#23' AND NOT p_partkey % 101 = 0
    UNION ALL
    SELECT 'unchanged', count(*) FROM part
    WHERE p_brand <> 'Brand#23' AND NOT p_partkey % 101 = 0
    ORDER BY change_type
"""


@declare("i25_wap_branch_audit", oracle=_WAP_AUDIT_ORACLE, tags=("dml", "lifecycle"))
def i25_wap_branch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit step of write-audit-publish: DML staged on a branch,
    then a key-joined diff of BRANCH HEAD vs MAIN — what a reviewer
    approves before the fast-forward publish (i6 covers the publish
    itself). Main must remain untouched while the branch carries the
    staged delete + update (branch isolation), which the oracle pins by
    stating the expected per-class counts straight from the fixture."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="wapaudit_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "wap_db",
        "part_wap",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    t.insert(part)
    t.create_branch("audit")
    t.update_set(
        {"p_retailprice": "p_retailprice * 0.9"},
        "p_brand = 'Brand#23'",
        branch="audit",
    )
    t.delete_where("p_partkey % 101 = 0", branch="audit")
    main = t.scan().alias("m")
    staged = t.scan(snapshot_id="audit").alias("b")
    joined = main.join(
        staged, F.col("m.p_partkey") == F.col("b.p_partkey"), "full_outer"
    )
    change = (
        F.when(F.col("m.p_partkey").isNull(), "added")
        .when(F.col("b.p_partkey").isNull(), "deleted")
        .when(
            (F.col("m.p_brand") != F.col("b.p_brand"))
            | (F.col("m.p_retailprice") != F.col("b.p_retailprice")),
            "modified",
        )
        .otherwise("unchanged")
    )
    return (
        joined.groupBy(change.alias("change_type"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("change_type")
    )
