"""[EXT] Similarity search over the ``embeddings`` table (SURVEY.md §2.N3).

Two paths:
- ``n3_topk_cosine`` — exact brute-force top-k (the baseline, oracle-checked;
  query side is tiny and broadcast, so the 'all pairs' is really
  |queries| x |corpus| with queries broadcast — linear in corpus size).
- ``n3b_lsh_ann`` — random-hyperplane LSH bucketed ANN (the 100 TB path:
  corpus shuffles once on bucket key; per-bucket brute force only).

Plus ``n5`` array statistics in operators/embeddings.py.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.functions.arrays import (
    as_double_array,
    cosine_similarity,
    dot,
)
from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_N_QUERIES = 5
_TOP_K = 5
_DIM = 64

_TOPK_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_dot_product(q.qv, e.v)
                 / (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(e.v, e.v))) AS sim
        FROM q CROSS JOIN e
        WHERE e.vec_id <> q.query_id),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims)
    SELECT query_id, neighbor_id, rank, round(sim, 4) AS sim
    FROM ranked WHERE rank <= {_TOP_K}
    ORDER BY query_id, rank
"""


@declare("n3_topk_cosine", oracle=_TOPK_ORACLE, tags=("ext", "similarity", "bench"))
def n3_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: first {n} vectors as queries.

    Queries are broadcast; the corpus is scanned once; cosine is pure
    zip_with/aggregate (no UDF); per-query ranking via window row_number.
    Cost is O(|corpus| * |queries| * dim) FLOPs with zero corpus shuffle —
    the right exact baseline at any corpus size when |queries| is small.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    sims = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_similarity(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
        .orderBy("query_id", "rank")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (client-side constants,
    like any model weights — not data-dependent)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


@declare("n3b_lsh_ann", oracle=None, tags=("ext", "similarity", "ann", "lsh"))
def n3b_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane (SimHash) LSH buckets.

    8 signed projections -> 8-bit bucket id; queries probe their own bucket
    plus all 1-bit-flip neighbors (multi-probe improves recall). Brute-force
    cosine only inside probed buckets. Approximate -> rows-only check; tests
    audit recall against n3_topk_cosine.

    At 100 TB: corpus is bucketed once (a single keyed shuffle, or a write
    into a bucket-partitioned table) and each query touches 9/256 of it.
    """
    planes = _hyperplanes(8, _DIM)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )

    def bucket_of(vcol):
        bits = [
            F.when(
                dot(vcol, F.array(*[F.lit(x) for x in p])) >= 0, 1 << i
            ).otherwise(0)
            for i, p in enumerate(planes)
        ]
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    corpus = emb.withColumn("bucket", bucket_of(F.col("v")))
    queries = (
        corpus.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(len(planes))
                    ],
                )
            ).alias("bucket"),
        )
    )
    sims = (
        corpus.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_similarity(F.col("qv"), F.col("v")).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
        .orderBy("query_id", "rank")
    )
