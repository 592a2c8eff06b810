"""§2.M UDF-surface completion: Python UDTF and grouped-agg pandas UDF.

Policy reminder (SURVEY §2.M): built-ins first — Python only where the
shape genuinely calls for it. These two queries exist to certify the two
remaining Python extension APIs under the hash gate, on small frames, with
exact DuckDB oracles:

- a table function (UDTF) for generator-shaped row expansion,
- an Arrow grouped-aggregate (pandas_udf GROUPED_AGG) for a kernel that
  needs the whole group as a vector (trimmed mean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_COOC_WINDOW = 3

_UDTF_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE doc_id < 40),
    pairs AS (
        SELECT t[i::INT] AS w1, t[(i + d)::INT] AS w2
        FROM toks,
             unnest(range(1, len(t) + 1)) AS a(i),
             unnest(range(1, {_COOC_WINDOW} + 1)) AS b(d)
        WHERE i + d <= len(t))
    SELECT w1, w2, count(*) AS n
    FROM pairs GROUP BY w1, w2
    ORDER BY n DESC, w1, w2 LIMIT 20
"""


@declare(
    "k8_python_udtf_cooccurrence",
    oracle=_UDTF_ORACLE,
    tags=("ext", "udf", "text"),
)
def k8_python_udtf_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark's table-function API): a generator that yields
    every within-window word co-occurrence pair of a document — the
    row-EXPANDING shape UDTFs exist for — then a plain grouped count on
    top. Bounded to a 40-doc slice: the UDTF is the certified-API demo
    (cf. the codegen'd sequence-explode formulation used for corpus-scale
    pair generation in n28/n58, which this must NOT replace in hot
    paths)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="w1 string, w2 string")
    class CooccurPairs:
        def eval(self, text: str):  # noqa: ANN001 — UDTF protocol
            if not text:
                return
            words = text.split(" ")
            for i, w in enumerate(words):
                for d in range(1, _COOC_WINDOW + 1):
                    if i + d < len(words):
                        yield w, words[i + d]

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("cooccur_pairs", CooccurPairs)
    pairs = spark.sql(
        "SELECT p.w1, p.w2 FROM _udtf_docs, "
        "LATERAL cooccur_pairs(text) AS p"
    )
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(20)
    )


_TRIMMED_ORACLE = """
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents),
    kept AS (
        SELECT source, n_chars, n
        FROM ranked
        WHERE rn > CAST(floor(n * 0.1) AS INT)
          AND rn <= n - CAST(floor(n * 0.1) AS INT))
    SELECT source,
           count(*) AS n_kept,
           round(avg(n_chars), 4) AS trimmed_mean_chars
    FROM kept GROUP BY source ORDER BY source
"""


@declare(
    "k9_pandas_grouped_agg_trimmed_mean",
    oracle=_TRIMMED_ORACLE,
    tags=("ext", "udf", "arrow"),
)
def k9_pandas_grouped_agg_trimmed_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Arrow grouped-aggregate (pandas_udf GROUPED_AGG): 10%-trimmed mean
    of document length per source — a kernel that genuinely needs the
    whole group as a vector (order statistics), the case the grouped-agg
    API exists for. The group arrives as ONE Arrow batch per key; state
    is bounded by group size, and the shuffle is the same single
    hash-partition any grouped aggregate pays."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations` turns
    # the pd.Series hints into strings, which defeats signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(v):
        arr = np.sort(v.to_numpy(dtype=np.float64))
        k = int(len(arr) * 0.1)
        kept = arr[k: len(arr) - k] if len(arr) - 2 * k > 0 else arr
        return float(kept.mean())

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def trimmed_count(v):
        k = int(len(v) * 0.1)
        return int(len(v) - 2 * k) if len(v) - 2 * k > 0 else len(v)

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            trimmed_count(F.col("n_chars")).alias("n_kept"),
            F.round(trimmed_mean(F.col("n_chars")), 4).alias(
                "trimmed_mean_chars"
            ),
        )
        .orderBy("source")
    )
