from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_v2_to_v3_upgrade_spark.functions.skew import salted_agg
from iceberg_v2_to_v3_upgrade_spark.io import load_table

from tests.conftest import SF_SMALL


def test_salted_agg_equals_plain_groupby(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    got = salted_agg(
        li,
        ["l_returnflag"],
        {
            "total_qty": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "max_price": ("l_extendedprice", "max"),
            "min_price": ("l_extendedprice", "min"),
        },
        salt=8,
    )
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.count(F.lit(1)).alias("n"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_extendedprice").alias("min_price"),
    )
    g = {r.l_returnflag: (round(r.total_qty, 6), r.n, r.max_price, r.min_price)
         for r in got.collect()}
    w = {r.l_returnflag: (round(r.total_qty, 6), r.n, r.max_price, r.min_price)
         for r in want.collect()}
    assert g == w


def test_salted_agg_rejects_non_mergeable(spark):
    import pytest

    li = load_table(spark, SF_SMALL, "lineitem")
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_agg(li, ["l_returnflag"], {"bad": ("l_quantity", "avg")})


def test_salted_join_matches_plain_join(spark):
    from iceberg_v2_to_v3_upgrade_spark.functions.skew import salted_join
    from iceberg_v2_to_v3_upgrade_spark.io import load_table
    from tests.conftest import SF_SMALL

    l = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    ).withColumnRenamed("l_suppkey", "s_suppkey")
    s = load_table(spark, SF_SMALL, "supplier")

    plain = l.join(s, "s_suppkey").groupBy("s_name").count()
    salted = salted_join(l, s, "s_suppkey", salt=8).groupBy("s_name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    # left join keeps unmatched fact rows
    l_extra = l.union(
        spark.createDataFrame([(999999, -1, 1.0)], l.schema)
    )
    left = salted_join(l_extra, s, "s_suppkey", salt=8, how="left")
    assert left.filter("s_suppkey = -1").count() == 1
