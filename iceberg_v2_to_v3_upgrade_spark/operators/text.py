"""[EXT] Text analysis over ``documents`` (SURVEY.md §2.N4).

Language-ID (stopword n-gram heuristic), quality scoring, token counting —
all built-in string/array functions, no UDFs, so the whole pipeline stays in
whole-stage codegen and scales linearly with one aggregate shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# Stopword marker sets per language (tiny heuristic lexicons; the fixture
# text is synthetic, so these exercise the operator shape, not linguistics).
_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "les", "des", "et", "est"),
}


def _stop_count(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


@declare(
    "n4_text_stats_by_lang",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               round(avg(n_chars), 2) AS avg_chars,
               round(avg(len(string_split(text, ' '))), 2) AS avg_tokens,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("ext", "text"),
)
def n4_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: doc count, char/token distribution."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", F.size(F.split("text", " ")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


_LANGID_ORACLE = """
    WITH scored AS (
        SELECT lang AS labeled_lang,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','is')))   AS s_en,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('der','die','das','und','ist'))) AS s_de,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('el','la','los','y','es')))    AS s_es,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('le','les','des','et','est'))) AS s_fr
        FROM documents),
    pred AS (
        SELECT labeled_lang,
               CASE WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
                    WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de'
                    WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                    WHEN s_fr > 0 THEN 'fr'
                    ELSE 'unknown' END AS predicted_lang
        FROM scored)
    SELECT predicted_lang, labeled_lang, count(*) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


@declare("n4b_language_id", oracle=_LANGID_ORACLE, tags=("ext", "text", "langid"))
def n4b_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: per-language stopword hit counts -> argmax
    (fixed tie-break order), reported as a confusion table against the
    labeled lang. One projection + one grouped count at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    scored = docs.select(
        F.col("lang").alias("labeled_lang"),
        _stop_count(tokens, _STOPWORDS["en"]).alias("s_en"),
        _stop_count(tokens, _STOPWORDS["de"]).alias("s_de"),
        _stop_count(tokens, _STOPWORDS["es"]).alias("s_es"),
        _stop_count(tokens, _STOPWORDS["fr"]).alias("s_fr"),
    )
    predicted = (
        F.when(
            (F.col("s_en") >= F.greatest("s_de", "s_es", "s_fr"))
            & (F.col("s_en") > 0),
            "en",
        )
        .when(
            (F.col("s_de") >= F.greatest("s_es", "s_fr")) & (F.col("s_de") > 0),
            "de",
        )
        .when((F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") > 0), "es")
        .when(F.col("s_fr") > 0, "fr")
        .otherwise("unknown")
    )
    return (
        scored.select(predicted.alias("predicted_lang"), "labeled_lang")
        .groupBy("predicted_lang", "labeled_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("predicted_lang", "labeled_lang")
    )


_QUALITY_ORACLE = """
    WITH q AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_unique,
               n_chars
        FROM documents),
    s AS (
        SELECT doc_id,
               round(0.5 * least(n_tokens / 64.0, 1.0)
                     + 0.5 * (n_unique * 1.0 / n_tokens), 4) AS quality
        FROM q)
    SELECT CASE WHEN quality >= 0.75 THEN 'high'
                WHEN quality >= 0.5 THEN 'mid'
                ELSE 'low' END AS quality_band,
           count(*) AS n_docs,
           round(avg(quality), 4) AS avg_quality
    FROM s GROUP BY 1 ORDER BY 1
"""


@declare("n4c_quality_score", oracle=_QUALITY_ORACLE, tags=("ext", "text", "quality"))
def n4c_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality score: length saturation + lexical diversity,
    bucketed into bands — the standard pre-training corpus filter shape."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    q = docs.select(
        "doc_id",
        F.size(tokens).alias("n_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_unique"),
    )
    quality = F.round(
        0.5 * F.least(F.col("n_tokens") / 64.0, F.lit(1.0))
        + 0.5 * (F.col("n_unique") / F.col("n_tokens")),
        4,
    )
    band = (
        F.when(F.col("quality") >= 0.75, "high")
        .when(F.col("quality") >= 0.5, "mid")
        .otherwise("low")
    )
    return (
        q.withColumn("quality", quality)
        .groupBy(band.alias("quality_band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("quality_band")
    )


@declare(
    "n4e_top_terms",
    oracle="""
        SELECT t.word, count(*) AS freq
        FROM documents, unnest(string_split(text, ' ')) AS t(word)
        GROUP BY t.word
        ORDER BY freq DESC, t.word
        LIMIT 20
    """,
    tags=("ext", "text", "vocab"),
)
def n4e_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-20 terms by frequency (explode -> count ->
    TakeOrdered). The grouped count is map-side partial on the token key;
    top-k never materializes a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(20)
    )


@declare(
    "n4d_token_counts",
    oracle="""
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT) AS est_bpe_tokens,
               count(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source
    """,
    tags=("ext", "text", "tokens"),
)
def n4d_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting per source: whitespace tokens + a chars/4 BPE
    estimate (the budget metric for training-data pipelines)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.size(F.split("text", " ")).alias("n_tokens"),
            F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("est_bpe"),
        )
        .groupBy("source")
        .agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("est_bpe").alias("est_bpe_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


_CURATION_ORACLE = """
    WITH q AS (
        SELECT doc_id, source,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   AS fingerprint,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_unique,
               n_chars
        FROM documents),
    scored AS (
        SELECT *,
               0.5 * least(n_tokens / 64.0, 1.0)
               + 0.5 * (n_unique * 1.0 / n_tokens) AS quality
        FROM q),
    pass AS (SELECT * FROM scored WHERE quality >= 0.5 AND n_chars >= 100),
    kept AS (
        SELECT * FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS keeper
            FROM pass) WHERE doc_id = keeper)
    SELECT s.source,
           count(DISTINCT s.doc_id) AS n_raw,
           count(DISTINCT p.doc_id) AS n_quality,
           count(DISTINCT k.doc_id) AS n_kept,
           round(count(DISTINCT k.doc_id) * 100.0
                 / count(DISTINCT s.doc_id), 2) AS retention_pct,
           CAST(coalesce(sum(CASE WHEN k.doc_id IS NOT NULL
                             THEN k.n_tokens END), 0) AS BIGINT) AS kept_tokens
    FROM scored s
    LEFT JOIN pass p ON p.doc_id = s.doc_id
    LEFT JOIN kept k ON k.doc_id = s.doc_id
    GROUP BY s.source ORDER BY s.source
"""


@declare(
    "n10_corpus_curation",
    oracle=_CURATION_ORACLE,
    tags=("ext", "text", "pipeline"),
)
def n10_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation funnel as ONE relational query:
    raw -> quality gate (length + lexical-diversity score) -> exact dedup
    (normalized-md5 fingerprint, keep lowest doc_id) -> per-source
    retention accounting.

    Composition of n4c's scorer and n2's fingerprint dedup; one window
    over fingerprint picks keepers, and the funnel stages are counted
    without re-scanning (conditional aggregation over one annotated
    frame — at 100 TB this is a single scan + one window shuffle, not
    three passes)."""
    from iceberg_v2_to_v3_upgrade_spark.functions.hashing import (
        normalize_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    annotated = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
        F.size(tokens).alias("n_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_unique"),
    ).withColumn(
        "quality",
        0.5 * F.least(F.col("n_tokens") / 64.0, F.lit(1.0))
        + 0.5 * (F.col("n_unique") / F.col("n_tokens")),
    )
    passed = (F.col("quality") >= 0.5) & (F.col("n_chars") >= 100)
    w = Window.partitionBy("fingerprint")
    staged = (
        annotated.withColumn("passed", passed)
        .withColumn(
            "keeper",
            F.min(F.when(F.col("passed"), F.col("doc_id"))).over(w),
        )
        .withColumn(
            "kept", F.col("passed") & (F.col("doc_id") == F.col("keeper"))
        )
    )
    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias(
                "n_quality"
            ),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.round(
                F.sum(F.when(F.col("kept"), 1).otherwise(0))
                * 100.0
                / F.count(F.lit(1)),
                2,
            ).alias("retention_pct"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("n_tokens"))), F.lit(0)
            ).alias("kept_tokens"),
        )
        .orderBy("source")
    )


# GPT-2-family pre-tokenizer regex (public: Radford et al. 2019 release),
# simplified to the lookahead-free common subset of Java regex (Spark) and
# RE2 (DuckDB) so both engines tokenize identically: contraction suffixes,
# space-prefixed letter runs, space-prefixed digit runs, space-prefixed
# punctuation runs, residual whitespace.
_BPE_PRETOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?[A-Za-z]+"
    "| ?[0-9]+"
    "| ?[^A-Za-z0-9'\\s]+"
    "|\\s+"
)


@declare(
    "n4i_bpe_pretokenize",
    oracle=f"""
        WITH t AS (
            SELECT source,
                   len(regexp_extract_all(text, '{_BPE_PRETOKEN_RE.replace("'", "''")}'))
                       AS n_pretokens,
                   len(string_split(text, ' ')) AS n_ws_tokens
            FROM documents)
        SELECT source,
               CAST(sum(n_pretokens) AS BIGINT) AS total_pretokens,
               round(avg(n_pretokens), 4) AS avg_pretokens,
               round(sum(n_pretokens) * 1.0 / sum(n_ws_tokens), 4)
                   AS pretoken_per_word
        FROM t GROUP BY source ORDER BY source
    """,
    tags=("ext", "text", "tokens", "bpe"),
)
def n4i_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counts: the GPT-2 pre-tokenizer regex
    (the split that runs before byte-pair merges) applied per document,
    aggregated per source. Tokenizer-true counts are what sequence-packing
    and mixture budgets are denominated in — chars/4 (n4d) is the cheap
    proxy, this is the regex-faithful one. Map-only + one grouped
    aggregate; the regex runs inside codegen (no UDF).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_pre = F.size(F.regexp_extract_all("text", F.lit(_BPE_PRETOKEN_RE), F.lit(0)))
    n_ws = F.size(F.split("text", " "))
    return (
        docs.select("source", n_pre.alias("n_pretokens"), n_ws.alias("n_ws_tokens"))
        .groupBy("source")
        .agg(
            F.sum("n_pretokens").alias("total_pretokens"),
            F.round(F.avg("n_pretokens"), 4).alias("avg_pretokens"),
            F.round(
                F.sum("n_pretokens") / F.sum("n_ws_tokens"), 4
            ).alias("pretoken_per_word"),
        )
        .orderBy("source")
    )


@declare(
    "n28_bigram_pmi",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        uni AS (
            SELECT u.w, count(*) AS c
            FROM toks, unnest(t) AS u(w) GROUP BY u.w),
        n AS (SELECT sum(c)::DOUBLE AS total FROM uni),
        big AS (
            SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c12
            FROM toks, unnest(range(1, len(t))) AS r(i)
            GROUP BY 1, 2),
        b AS (SELECT sum(c12)::DOUBLE AS total FROM big)
        SELECT w1, w2, c12,
               round(ln((c12 / b.total) /
                        ((u1.c / n.total) * (u2.c / n.total))), 6) AS pmi
        FROM big
        JOIN uni u1 ON big.w1 = u1.w
        JOIN uni u2 ON big.w2 = u2.w, n, b
        WHERE c12 >= 5
        ORDER BY pmi DESC, w1, w2
        LIMIT 20
    """,
    tags=("ext", "text", "collocation", "topk"),
)
def n28_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 bigrams by pointwise mutual information
    (PMI = ln(p(w1,w2) / p(w1)p(w2)), Church & Hanks 1990) with a minimum
    pair count — the standard corpus-linguistics signal for multi-word
    expressions, and a tokenizer-vocabulary input (merge candidates).

    Scale shape: bigram generation is map-side (zip of adjacent tokens);
    pair counting is one keyed shuffle; the unigram table is vocabulary-
    sized, joined twice via broadcast (word vocabularies stay broadcast-
    able even at 100 TB corpus scale); the scalar token/bigram totals
    ride in as broadcast 1-row frames; top-20 compiles to
    TakeOrderedAndProject, never a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = uni.agg(F.sum("c").cast("double").alias("n_total"))
    big = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)"),
                    F.expr("slice(t, 2, size(t) - 1)"),
                )
            ).alias("p")
        )
        .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    b_total = big.agg(F.sum("c12").cast("double").alias("b_total"))
    big = big.filter(F.col("c12") >= 5)
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        big.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(b_total))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.col("c12") / F.col("b_total"))
                    / ((F.col("c1") / F.col("n_total")) * (F.col("c2") / F.col("n_total")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )
