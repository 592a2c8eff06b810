"""[EXT] Deterministic sampling and dataset splitting over ``documents``
(SURVEY.md §2.N — corpus-curation surface; no reference counterpart, the
reference is a table-migration tool).

A training-data pipeline needs REPRODUCIBLE corpus subsets: the keep/split
decision must be a pure function of the row key — not of partitioning,
executor count, or row order (``df.sample()`` is none of those, and its
results change under AQE re-planning). Hash-bucketing the key with md5
gives a uniform, engine-independent bucket per row: Spark and DuckDB
produce identical md5 hex, so both operators are fully oracle-checkable.

Scale posture: one scan, the bucket expression is a pure per-row
projection inside whole-stage codegen (no UDF, no shuffle until the final
small aggregate), and adding executors never changes which rows are
sampled — the property that makes a 100 TB re-run auditable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare


def hash_bucket(key: Column) -> Column:
    """First two md5 hex chars of the key — 256 uniform buckets, ordered
    lexicographically (hex strings compare like their numeric value)."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


@declare(
    "n11_stratified_sample",
    oracle="""
        SELECT lang,
               count(*) AS n_sampled,
               round(avg(n_chars), 2) AS avg_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        GROUP BY lang ORDER BY lang
    """,
    tags=("ext", "sampling"),
)
def n11_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic corpus sample (26/256 hash buckets), reported
    per language. Same rows on every run, every cluster size, and in
    every engine — unlike rand()/df.sample()."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(hash_bucket(F.col("doc_id")) < "1a")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@declare(
    "n12_train_val_test_split",
    oracle="""
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                   THEN 'val'
                 ELSE 'test'
               END AS split,
               lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY split, lang ORDER BY split, lang
    """,
    tags=("ext", "sampling"),
)
def n12_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment by key hash
    (buckets [0,0xcc) / [0xcc,0xe6) / [0xe6,0x100)), summarized per
    split x language. Membership is stable across re-runs and engines,
    so downstream training jobs can recompute the split instead of
    materializing membership tables."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@declare(
    "n13_sequence_packing",
    oracle="""
        WITH sized AS (
            SELECT lang, doc_id,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), offs AS (
            SELECT lang, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) - n_tokens AS start_offset
            FROM sized
        )
        SELECT lang,
               CAST(floor(start_offset / 4096.0) AS BIGINT) AS bin,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM offs
        GROUP BY lang, bin ORDER BY lang, bin
    """,
    tags=("ext", "sampling", "packing"),
)
def n13_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the shard-building step before training: assign
    documents to contiguous 4096-token bins per language (a doc belongs
    to the bin its starting offset falls in, the standard streaming
    packer; a boundary-spanning doc overflows its bin by < 1 doc).

    Deterministic (ordered by doc_id), and ONE window shuffle keyed by
    the stratum — each language packs independently, so at 100 TB the
    cumsum parallelizes across strata instead of serializing the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        sized.withColumn("bin", F.floor(start / F.lit(4096.0)))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("lang", "bin")
    )


# Source-mixture tiers: keep-rate thresholds on the 2-hex-digit bucket.
# 'zz' sorts above every hex pair -> keep all; '80' ~ 50%; '40' ~ 25%;
# '14' ~ 8%. In production these weights come from the data-mixing recipe
# (e.g. upsample curated sources, downsample crawl).
_MIX_THRESHOLDS: dict[str, str] = {
    f"src{i}": ("zz" if i < 5 else "80" if i < 10 else "40" if i < 15 else "14")
    for i in range(20)
}
_MIX_CASE_SQL = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN '{t}'" for s, t in _MIX_THRESHOLDS.items())
    + " ELSE '00' END"
)


@declare(
    "n15_source_mixture",
    oracle=f"""
        SELECT source,
               count(*) AS n_docs,
               count(*) FILTER (
                   WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < {_MIX_CASE_SQL}) AS n_kept,
               round(count(*) FILTER (
                   WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < {_MIX_CASE_SQL})::DOUBLE / count(*), 6)
                   AS keep_rate
        FROM documents GROUP BY source ORDER BY source
    """,
    tags=("ext", "sampling", "mixture"),
)
def n15_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-weighted resampling — the data-mixing step
    that reshapes a raw corpus toward a target source distribution
    (keep-all / 50% / 25% / 8% tiers here). The keep decision is the same
    md5 hash-bucket as n11, so the realized mixture is reproducible
    across engines, re-runs, and cluster sizes, and composes with the
    n12 split (independent hash uses).

    One scan, conditional aggregation only — the mixture report costs a
    single 20-group shuffle regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    expr = None
    for s, t in _MIX_THRESHOLDS.items():
        expr = (F.when if expr is None else expr.when)(F.col("source") == s, t)
    thr = expr.otherwise("00")
    kept = (hash_bucket(F.col("doc_id")) < thr).cast("long")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.round(F.sum(kept) / F.count(F.lit(1)), 6).alias("keep_rate"),
        )
        .orderBy("source")
    )
