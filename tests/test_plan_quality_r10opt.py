"""Round-10 OPTIMIZATION pins.

The GEMM-style rewrites (n117/n45 broadcast-matrix mapInPandas,
semdedup per-cluster applyInPandas, pandas centroid assignment) all
rest on one property: a numpy PER-DIMENSION accumulation
(``acc = acc + A[:, i] * B[:, i]``) executes exactly the IEEE op
sequence of the sequential Catalyst fold
(``aggregate(zip_with(a, b, *), 0.0, +)``) — separate multiply and
add, no FMA, no reassociation — so every dot, norm, and the
comparisons/rankings derived from them are bit-identical to the HOF
form and to DuckDB's ``list_dot_product``. These tests pin that
equality on the real fixture, plus the structural shape of the n16
fix (the payload lambda must close over a materialized grams column,
not re-evaluate the shingling per element).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_v2_to_v3_upgrade_spark.operators.analytics16 import (
    _assign_to_centroids,
    _dot,
    _fold_gram,
    _normalize_embeddings,
)

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def test_per_dim_fold_bit_equals_hof_fold(spark, emb):
    """Pairwise per-dimension numpy fold == sequential HOF fold,
    bit-for-bit, on real fixture pairs (the exactness contract of
    every round-10 GEMM rewrite)."""
    a = emb.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(
        (F.col("ia") % 7 == 0) & (F.col("ib") % 5 == 0)
    )
    rows = pairs.select(
        "va", "vb", _dot(F.col("va"), F.col("vb")).alias("d")
    ).collect()
    assert rows, "fixture produced no pairs"
    A = np.array([r["va"] for r in rows], dtype=np.float64)
    B = np.array([r["vb"] for r in rows], dtype=np.float64)
    acc = np.zeros(len(rows), dtype=np.float64)
    for i in range(A.shape[1]):
        acc = acc + A[:, i] * B[:, i]
    jvm = np.array([r["d"] for r in rows], dtype=np.float64)
    # bitwise, not approx: the rewrites' correctness argument is exact
    assert (acc.view(np.int64) == jvm.view(np.int64)).all()


def test_fold_gram_bit_equals_hof_fold(spark, emb):
    """_fold_gram (the per-cluster pairwise matrix) == HOF fold on a
    real-fixture slice, bitwise."""
    rows = emb.filter(F.col("vec_id") < 64).orderBy("vec_id").collect()
    M = np.array([r["v"] for r in rows], dtype=np.float64)
    gram = _fold_gram(M)
    sub = emb.filter(F.col("vec_id") < 64)
    a = sub.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = sub.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    jvm = {
        (r["ia"], r["ib"]): r["d"]
        for r in a.crossJoin(F.broadcast(b))
        .select("ia", "ib", _dot(F.col("va"), F.col("vb")).alias("d"))
        .collect()
    }
    ids = [r["vec_id"] for r in rows]
    for x, ia in enumerate(ids):
        for y, ib in enumerate(ids):
            assert gram[x, y] == jvm[(ia, ib)]


def test_pandas_assignment_matches_hof_argmax(spark, emb):
    """The mapInPandas centroid assignment == the original HOF
    array_position(array_max) form, row for row (first-max tie-break,
    original labels)."""
    normed = _normalize_embeddings(
        emb.select("vec_id", F.col("v").alias("x"))
    )
    cents = [
        (int(r["vec_id"]) % 7, r["v"])
        for r in normed.orderBy("vec_id").limit(5).collect()
    ]
    cents.sort(key=lambda cv: cv[0])
    got = {
        r["vec_id"]: r["c"]
        for r in _assign_to_centroids(normed, cents).collect()
    }
    dots = F.array(
        *[
            _dot(F.col("v"), F.array(*[F.lit(x) for x in vec]))
            for _c, vec in cents
        ]
    )
    labels = F.array(*[F.lit(c) for c, _vec in cents])
    want = {
        r["vec_id"]: r["c"]
        for r in normed.withColumn(
            "c",
            F.element_at(
                labels,
                F.array_position(dots, F.array_max(dots)).cast("int"),
            ).cast("int"),
        ).collect()
    }
    assert got == want


def test_n16_payload_closes_over_materialized_grams():
    """The n16 payload lambda must reference the materialized ``grams``
    column — ``F.size(<grams expression>)`` inside the lambda
    re-evaluates the whole shingling per element (measured 16.2 s vs
    0.64 s at sf0.1 for the train explode)."""
    import inspect

    from iceberg_v2_to_v3_upgrade_spark.operators.curation import (
        n16_decontamination,
    )

    src = inspect.getsource(n16_decontamination)
    code = "\n".join(
        ln for ln in src.splitlines() if not ln.lstrip().startswith("#")
    )
    assert 'F.size("grams")' in code
    assert 'grams_arr.alias("grams")' in code
    assert "F.size(grams_arr)" not in code
