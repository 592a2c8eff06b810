"""Plan pins for the round-10 batch: the new analytics operators must
stay JVM-side (HOF folds, no Python eval), n119's part-dim join must
broadcast, and n118's fold must not explode the event stream through a
window (the hourly pre-aggregation is the only event-sized shuffle)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def registry():
    return load_all_operators()


def plan(spark, registry, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        registry[name].fn(spark, SF_SMALL).explain("formatted")
    return buf.getvalue()


def test_n118_ewma_stays_jvm_single_event_shuffle(spark, registry):
    p = plan(spark, registry, "n118_ewma_anomaly")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # hourly pre-agg + per-type fold: two HashAggregate pairs, no
    # window over the raw stream
    assert "Window" not in p


def test_n120_kneser_ney_stays_jvm(spark, registry):
    # n120 collects and returns a driver-local frame, so explaining the
    # registry callable's result would pin nothing but a
    # LocalTableScan — rebuild the pre-collect pipeline instead (the
    # same workaround the n117 pin uses)
    from pyspark.sql import functions as F

    from iceberg_v2_to_v3_upgrade_spark.io import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    toks = docs.select(
        F.split(
            F.lower(F.regexp_replace(F.col("text"), "[^a-z ]", "")), " "
        ).alias("ts")
    ).filter(F.size("ts") >= 2)
    bg = (
        toks.select(
            F.explode(F.sequence(F.lit(1), F.size("ts") - 1)).alias("i"),
            "ts",
        )
        .select(
            F.element_at("ts", F.col("i")).alias("w1"),
            F.element_at("ts", F.col("i") + 1).alias("w2"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("ctx"),
        F.count(F.lit(1)).cast("bigint").alias("types_fw"),
    )
    pipe = c12.join(c1, "w1")
    buf = io.StringIO()
    with redirect_stdout(buf):
        pipe.explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Scan parquet" in p or "BatchScan" in p or "FileScan" in p


def test_n117_margin_mining_pairs_stay_vectorized(spark, registry):
    # round-10 optimization: the pairs stage is a broadcast-matrix
    # mapInPandas (n2e's machinery) instead of crossJoin + interpreted
    # HOF dot per pair. The operator's own frame is driver-built (it
    # collects), so pin the SOURCE structure: no crossJoin remains in
    # n117, and the candidate cosines come from mapInPandas.
    import inspect

    from iceberg_v2_to_v3_upgrade_spark.operators.analytics18 import (
        n117_margin_bitext_mining,
    )

    src = inspect.getsource(n117_margin_bitext_mining)
    code = "\n".join(
        ln for ln in src.splitlines() if not ln.lstrip().startswith("#")
    )
    assert "crossJoin" not in code, "n117 pairs went back to per-pair HOF"
    assert "mapInPandas" in code
