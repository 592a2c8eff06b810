"""[EXT] Embedding-column statistics (SURVEY.md §2.N5).

Array math over ``embeddings.embedding`` (array<float>, 64-dim) — all
built-in higher-order functions, fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.functions.arrays import (
    array_mean,
    as_double_array,
    dot,
    l2_norm,
)
from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare


@declare(
    "n5_embedding_stats",
    oracle="""
        WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT label,
               count(*) AS n_vectors,
               min(len(v)) AS dim,
               round(avg(sqrt(list_dot_product(v, v))), 4) AS avg_norm,
               round(avg(list_sum(v) / len(v)), 4) AS avg_mean_component
        FROM e GROUP BY label ORDER BY label
    """,
    tags=("ext", "embeddings", "arrays"),
)
def n5_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics: count, dim, mean L2 norm, mean component.

    Norms computed row-wise with zip_with/aggregate (one codegen stage),
    then a 10-group hash aggregate — the shuffle carries 10 rows/task.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", as_double_array("embedding").alias("v")
    )
    return (
        emb.select(
            "label",
            F.size("v").alias("dim"),
            l2_norm(F.col("v")).alias("norm"),
            array_mean(F.col("v")).alias("mean_comp"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("dim").alias("dim"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.avg("mean_comp"), 4).alias("avg_mean_component"),
        )
        .select("label", "n_vectors", "dim", "avg_norm", "avg_mean_component")
        .orderBy("label")
    )


@declare(
    "n5b_normalized_embeddings",
    oracle="""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT vec_id,
               round(sqrt(list_dot_product(v, v)), 4) AS norm,
               round(list_sum(list_transform(v, x -> x / sqrt(list_dot_product(v, v)))), 4)
                   AS sum_unit_components
        FROM e WHERE vec_id < 50 ORDER BY vec_id
    """,
    tags=("ext", "embeddings", "arrays"),
)
def n5b_normalized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize vectors (F.transform) and checksum the unit vector —
    the preprocessing step every ANN pipeline runs before indexing."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    norm = l2_norm(F.col("v"))
    unit = F.transform(F.col("v"), lambda x: x / norm)
    return (
        emb.filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.round(norm, 4).alias("norm"),
            F.round(
                F.aggregate(unit, F.lit(0.0), lambda acc, x: acc + x), 4
            ).alias("sum_unit_components"),
        )
        .orderBy("vec_id")
    )


@declare(
    "n19_embedding_quantization",
    oracle="""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
            SELECT vec_id, v, list_min(v) AS mn,
                   (list_max(v) - list_min(v)) / 255.0 AS scale
            FROM e),
        q AS (
            SELECT vec_id, v, mn, scale,
                   list_transform(v, x -> floor((x - mn) / scale + 0.5))
                       AS qv
            FROM p WHERE scale > 0),
        d AS (
            SELECT vec_id, v, qv,
                   list_transform(qv, b -> mn + b * scale) AS dv
            FROM q)
        SELECT vec_id,
               list_min(qv)::BIGINT AS q_min,
               list_max(qv)::BIGINT AS q_max,
               round(list_sum(list_transform(
                         generate_series(1, len(v)),
                         i -> (v[i] - dv[i]) * (v[i] - dv[i])))
                     / len(v), 9) AS mse
        FROM d
        WHERE vec_id < 256
        ORDER BY vec_id
    """,
    tags=("ext", "embeddings", "quantization"),
)
def n19_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of embeddings — the compression step
    before building a vector index at scale: per-vector min/max affine
    quantization to 256 levels, dequantize, and report the
    reconstruction MSE (first 256 vectors displayed; the transform is
    corpus-wide).

    Pure array expressions, zero shuffle, bit-identical cross-engine:
    `floor(x + 0.5)` instead of round() (engines disagree on half-even
    vs half-away ties), and the fold order of the MSE sum matches
    DuckDB's sequential list_sum. At 100 TB this is the map-side of an
    index build — 4x storage reduction with per-row work only."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    scaled = emb.select(
        "vec_id",
        "v",
        F.array_min("v").alias("mn"),
        ((F.array_max("v") - F.array_min("v")) / 255.0).alias("scale"),
    ).filter(F.col("scale") > 0)
    quant = scaled.select(
        "vec_id",
        "v",
        "mn",
        "scale",
        F.transform(
            "v",
            lambda x: F.floor((x - F.col("mn")) / F.col("scale") + 0.5),
        ).alias("qv"),
    )
    deq = quant.select(
        "vec_id",
        "v",
        "qv",
        F.transform(
            "qv", lambda b: F.col("mn") + b * F.col("scale")
        ).alias("dv"),
    )
    sq_err = F.aggregate(
        F.zip_with("v", "dv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        deq.filter(F.col("vec_id") < 256)
        .select(
            "vec_id",
            F.array_min("qv").alias("q_min"),
            F.array_max("qv").alias("q_max"),
            F.round(sq_err / F.size("v"), 9).alias("mse"),
        )
        .orderBy("vec_id")
    )
