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
    p = plan(spark, registry, "n120_kneser_ney_bigram")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_n117_margin_mining_broadcasts_target_pool(spark, registry):
    # the materialized result frame is driver-built (the pairs cache is
    # released before return), so pin the plan of the PAIRS stage via
    # the module internals instead
    from pyspark.sql import functions as F

    from iceberg_v2_to_v3_upgrade_spark.io import load_table
    from iceberg_v2_to_v3_upgrade_spark.operators.analytics16 import _dot

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    emb = emb.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    src = emb.filter("vec_id % 2 = 0")
    tgt = emb.filter("vec_id % 2 = 1")
    pairs = src.crossJoin(F.broadcast(tgt.toDF("tid", "tv", "tnrm")))
    buf = io.StringIO()
    with redirect_stdout(buf):
        pairs.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
