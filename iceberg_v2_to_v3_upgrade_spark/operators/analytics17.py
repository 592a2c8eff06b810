"""Round-7 addition: DSIR — Data Selection via Importance Resampling.

DSIR (Xie et al. 2023, public: arXiv:2302.03169) is the standard recipe
for selecting pretraining data that *resembles a target distribution*:
featurize documents as hashed n-gram bags, fit two bag-of-words models —
one on the target corpus, one on the raw pool — and weight each raw
document by its log importance ratio ``sum_b n_b(doc) * (ln p_target[b]
- ln p_raw[b])``; resample by weight. The deterministic variant here
ranks by the weight itself (the Gumbel-noise sampling step is RNG by
construction; ranking is the testable core).

Cross-engine determinism: bucketing is md5-based (identical in Spark and
DuckDB), the models are exact integer counts with add-1 smoothing, and
the one float reduction — the per-document sum of bucket log-ratios — is
rounded to 4 decimals on both sides (the n18 precedent: far above double
accumulation error at any corpus size), with ``+ 0.0`` absorbing IEEE
negative zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_B = 256  # hash buckets (md5 first byte)
_TARGET_LANG = "en"

_DSIR_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, source, lang,
               unnest(string_split(text, ' ')) AS tok
        FROM documents),
    b AS (
        SELECT doc_id, source, lang,
               ('0x' || substr(md5(tok), 1, 2))::BIGINT AS bkt
        FROM tok),
    tot AS (
        SELECT count(*) FILTER (lang = '{_TARGET_LANG}') AS nt,
               count(*) AS nr
        FROM b),
    cnt AS (
        SELECT bkt,
               count(*) FILTER (lang = '{_TARGET_LANG}') AS ct,
               count(*) AS cr
        FROM b GROUP BY bkt),
    lr AS (
        SELECT bkt,
               ln((ct + 1) / (tot.nt + {_B}.0))
                   - ln((cr + 1) / (tot.nr + {_B}.0)) AS llr
        FROM cnt, tot),
    scored AS (
        SELECT d.doc_id, d.source,
               round(sum(lr.llr), 4) + 0.0 AS w
        FROM b d JOIN lr USING (bkt)
        GROUP BY d.doc_id, d.source),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY w DESC, doc_id) AS rk
        FROM scored)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(w), 4) + 0.0 AS avg_w,
           CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_targetlike,
           CAST(min(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT)
               AS top_doc
    FROM ranked
    GROUP BY source ORDER BY source
"""


@declare(
    "n115_dsir_importance_resampling",
    oracle=_DSIR_ORACLE,
    tags=("ext", "curation", "sampling", "dsir"),
)
def n115_dsir_importance_resampling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR importance weights against an English-target distribution:
    hashed-unigram (md5 -> {_B} buckets) bag models with add-1 smoothing
    fit on the target slice (lang='en') and the full raw pool; each doc
    scores the summed bucket log-ratio; per source the report carries
    doc count, mean weight, how many docs are target-like (w > 0 — more
    probable under the target model than the raw model), and the argmax
    document (rank by weight desc, doc_id tie-break — the deterministic
    stand-in for DSIR's Gumbel resampling).

    Scale shape: the 'models' are {_B}-row aggregates — broadcast by
    construction — so scoring is one token-stream scan joined to a
    broadcast log-ratio table plus one grouped sum per doc; no shuffle
    ever carries more than O(docs) rows. At 100 TB this is two
    scan+partial-agg passes (fit, score), the same cost profile as
    n18's unigram scorer, and the bucket count grows to DSIR's 10k
    without changing a line of the plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    )
    b = tok.select(
        "doc_id",
        "source",
        "lang",
        F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10)
        .cast("bigint")
        .alias("bkt"),
    )
    is_target = (F.col("lang") == _TARGET_LANG).cast("long")
    cnt = b.groupBy("bkt").agg(
        F.sum(is_target).alias("ct"), F.count(F.lit(1)).alias("cr")
    )
    tot = b.agg(
        F.sum(is_target).alias("nt"), F.count(F.lit(1)).alias("nr")
    )
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "bkt",
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + F.lit(float(_B))))
            - F.log((F.col("cr") + 1) / (F.col("nr") + F.lit(float(_B))))
        ).alias("llr"),
    )
    scored = (
        b.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id", "source")
        .agg((F.round(F.sum("llr"), 4) + F.lit(0.0)).alias("w"))
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("w").desc(), F.col("doc_id")
        )
    )
    ranked = scored.withColumn("rk", rk)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.round(F.avg("w"), 4) + F.lit(0.0)).alias("avg_w"),
            F.sum((F.col("w") > 0).cast("long")).alias("n_targetlike"),
            F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
                "top_doc"
            ),
        )
        .orderBy("source")
    )
