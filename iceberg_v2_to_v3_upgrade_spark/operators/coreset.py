"""Declared queries, round 3 batch F: greedy k-center coreset selection.

Farthest-point traversal over the embedding corpus — the diversity-first
sampling used to pick representative training subsets (a coreset with a
2-approximation guarantee on the k-center objective). Spark has no
iterative primitive, so the k-1 rounds are a driver loop over fully
distributed passes: each round broadcasts the newly chosen center (ONE
row) and folds it into the running min-distance column; the corpus is
scanned, never collected. The DuckDB oracle unrolls the same recursion as
chained CTEs — both engines compute cosine distances in double with the
same sequential summation order, so the argmax choices agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.functions.arrays import (
    as_double_array,
    cosine_similarity,
)
from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_K = 4

_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


def _oracle() -> str:
    """Unroll the k=4 farthest-point recursion as chained CTEs."""
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        "c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),",
        "d0 AS (SELECT e.vec_id, e.v, 1 - "
        + _COS.format(a="e.v", b="c0.v")
        + " AS dmin FROM e, c0),",
    ]
    for r in range(1, _K):
        prev = f"d{r - 1}"
        parts.append(
            f"c{r} AS (SELECT vec_id, v, dmin FROM {prev} "
            f"ORDER BY dmin DESC, vec_id LIMIT 1),"
        )
        if r < _K - 1:
            parts.append(
                f"d{r} AS (SELECT p.vec_id, p.v, least(p.dmin, 1 - "
                + _COS.format(a="p.v", b=f"c{r}.v")
                + f") AS dmin FROM {prev} p, c{r}),"
            )
    parts[-1] = parts[-1].rstrip(",")
    selects = ["SELECT 0 AS rank, vec_id, 0.0 AS sel_radius FROM c0"]
    for r in range(1, _K):
        selects.append(
            f"SELECT {r}, vec_id, round(dmin, 6) + 0.0 FROM c{r}"
        )
    return "\n".join(parts) + "\n" + "\nUNION ALL ".join(selects) + "\nORDER BY rank"


@declare(
    "n90_kcenter_coreset", oracle=_oracle(), tags=("ext", "similarity", "sampling")
)
def n90_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) coreset: start from the lowest
    vec_id, then k-1 times pick the point with the LARGEST min cosine
    distance to the chosen set (its distance at selection = the coverage
    radius the previous set failed to achieve). Each round is one
    distributed pass folding a broadcast single-row center into the
    running dmin column; only the argmax row (1 row/round) ever reaches
    the driver. At 100 TB the same loop runs with the dmin frame
    persisted between rounds; k is small by construction."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    c0 = emb.orderBy("vec_id").limit(1)
    first = c0.collect()[0]
    chosen = [(0, int(first.vec_id), 0.0)]
    cvec = F.array(*[F.lit(float(x)) for x in first.v])
    dmin = emb.select(
        "vec_id", "v", (1 - cosine_similarity(F.col("v"), cvec)).alias("dmin")
    )
    for r in range(1, _K):
        pick = dmin.orderBy(F.col("dmin").desc(), "vec_id").limit(1).collect()[0]
        chosen.append((r, int(pick.vec_id), round(float(pick.dmin), 6) + 0.0))
        if r < _K - 1:
            pvec = F.array(*[F.lit(float(x)) for x in pick.v])
            dmin = dmin.select(
                "vec_id",
                "v",
                F.least(
                    F.col("dmin"), 1 - cosine_similarity(F.col("v"), pvec)
                ).alias("dmin"),
            )
    return spark.createDataFrame(
        chosen, "rank int, vec_id bigint, sel_radius double"
    ).orderBy("rank")
