"""Round-9 extras: BM25 retrieval over the documents corpus.

The training-data-pipeline retrieval op the inverted index (h22) feeds
in practice: rank documents for a query set with Okapi BM25 (public
formula, Robertson et al.) — the standard for hard-negative mining,
eval-set retrieval, and dedup-aware sampling at corpus scale.

Scale posture: tokens explode once; tf/df are keyed partial aggregates;
query terms and the vocab-sized df slice BROADCAST onto the tf frame,
so the only corpus-shaped shuffles are the two grouped counts and the
per-query rank window over the (bounded) scored frame — matched docs
per query, never all docs x all queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_K1 = 1.2
_B = 0.75
_TOPK = 5

#: Fixed query set (terms drawn from the corpus vocabulary); ids keep
#: the oracle's VALUES rows aligned with the Spark literals.
_QUERIES: list[tuple[int, str]] = [
    (1, "hash join table"),
    (2, "slow scan filter column"),
    (3, "customer order line"),
    (4, "vector batch merge"),
]

_QUERY_VALUES = ", ".join(f"({i}, '{q}')" for i, q in _QUERIES)

_BM25_ORACLE = f"""
    WITH q(query_id, qtext) AS (VALUES {_QUERY_VALUES}),
    qt AS (
        SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
        FROM q),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               avg(dl) AS avgdl
        FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM tf WHERE term IN (SELECT term FROM qt)
        GROUP BY term),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               sum(
                   ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({_K1} + 1.0)
                   / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
               ) AS score
        FROM qt
        JOIN tf USING (term)
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY qt.query_id, tf.doc_id),
    ranked AS (
        SELECT query_id, doc_id, round(score, 6) AS score,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(score, 6) DESC, doc_id) AS rank
        FROM scored)
    SELECT query_id, doc_id, score, rank
    FROM ranked WHERE rank <= {_TOPK}
    ORDER BY query_id, rank
"""


@declare(
    "n116_bm25_topk",
    oracle=_BM25_ORACLE,
    tags=("ext", "text", "retrieval"),
)
def n116_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-5 documents per query (k1=1.2, b=0.75): idf =
    ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturation with document-
    length normalization against the corpus average, rank on the
    6-dp-rounded score with doc_id tiebreak (the repo's cross-engine
    float-ranking discipline, as n46).

    df is computed ONLY for query terms (semi-join against the
    broadcast query-term frame) — at 100 TB the df frame is
    |query vocab|, not |corpus vocab|.
    """
    docs = load_table(spark, sf_dir, "documents")
    qt = (
        spark.createDataFrame(_QUERIES, "query_id INT, qtext STRING")
        .select(
            "query_id", F.explode(F.split("qtext", " ")).alias("term")
        )
        .distinct()
    )
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        tf.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * F.col("tf") * (_K1 + 1.0) / (
        F.col("tf")
        + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "doc_id", "score", "rank")
        .orderBy("query_id", "rank")
    )
