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
