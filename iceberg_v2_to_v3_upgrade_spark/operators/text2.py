"""[EXT] Text analysis over ``documents``, part 2: lexical-diversity
stats, PII scrubbing, winnowing-fingerprint near-dup pairs, training-
sequence assembly, and length histograms.

Same design contract as operators/text.py: built-in string/array functions
only (whole-stage codegen end to end), shuffles keyed on doc_id or the
grouping column, every hot path linear in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_TTR_ORACLE = """
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents),
    per AS (
        SELECT doc_id, lang, tok, count(*) AS c
        FROM tok GROUP BY doc_id, lang, tok),
    ds AS (
        SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
               sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
        FROM per GROUP BY doc_id, lang)
    SELECT lang, count(*) AS n_docs,
           round(avg(n_types / n_tokens), 6) AS avg_ttr,
           round(avg(n_hapax / n_tokens), 6) AS avg_hapax_ratio
    FROM ds GROUP BY lang ORDER BY lang
"""


@declare("n29_ttr_hapax", oracle=_TTR_ORACLE, tags=("ext", "text"))
def n29_ttr_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per language: type-token ratio and hapax-legomenon
    ratio (fraction of tokens occurring exactly once in their document).

    Formulated as explode -> per-(doc, token) count -> per-doc rollup
    rather than nested higher-order functions: the HOF form
    (filter(tokens, t -> count(...)) per distinct token) is O(len^2) per
    document and melts on long documents; this shape is O(len) per doc
    with two shuffles both keyed on doc_id, so Spark chains them on one
    exchange. Partial aggregation (map-side combine) absorbs the token
    fan-out before the wire.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    per = tok.groupBy("doc_id", "lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    ds = per.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    return (
        ds.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.col("n_types") / F.col("n_tokens")), 6).alias(
                "avg_ttr"
            ),
            F.round(F.avg(F.col("n_hapax") / F.col("n_tokens")), 6).alias(
                "avg_hapax_ratio"
            ),
        )
        .orderBy("lang")
    )


# Conservative patterns that parse identically under Java regex (Spark) and
# RE2 (DuckDB): plain character classes, no lookaround, no backrefs.
_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
_DIGITS_RE = "[0-9][0-9][0-9][0-9][0-9][0-9]+"  # runs of >= 6 digits

_PII_ORACLE = f"""
    WITH scrubbed AS (
        SELECT source,
               len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{_DIGITS_RE}')) AS n_digit_runs,
               length(text)
                 - length(regexp_replace(regexp_replace(text,
                       '{_EMAIL_RE}', '', 'g'), '{_DIGITS_RE}', '', 'g'))
                 AS chars_redacted
        FROM documents)
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_emails + n_digit_runs > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS docs_with_pii,
           CAST(sum(n_emails) AS BIGINT) AS total_emails,
           CAST(sum(n_digit_runs) AS BIGINT) AS total_digit_runs,
           CAST(sum(chars_redacted) AS BIGINT) AS total_chars_redacted
    FROM scrubbed GROUP BY source ORDER BY source
"""


@declare("n30_pii_scrub", oracle=_PII_ORACLE, tags=("ext", "text", "curation"))
def n30_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: email addresses and long digit runs (phone/account
    number shaped) located and measured per source.

    Map-only — regexp_count/regexp_replace are codegen'd JVM expressions;
    the single shuffle is the per-source rollup. The redaction itself
    (replace with a sentinel) is the same regexp_replace; this query
    reports the audit trail a scrubbing pass would emit, which is the
    driver-checkable artifact.
    """
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = docs.select(
        "source",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_DIGITS_RE)).alias("n_digit_runs"),
        (
            F.length("text")
            - F.length(
                F.regexp_replace(
                    F.regexp_replace("text", _EMAIL_RE, ""), _DIGITS_RE, ""
                )
            )
        ).alias("chars_redacted"),
    )
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("n_emails") + F.col("n_digit_runs") > 0, 1).otherwise(
                    0
                )
            ).alias("docs_with_pii"),
            F.sum("n_emails").alias("total_emails"),
            F.sum("n_digit_runs").alias("total_digit_runs"),
            F.sum("chars_redacted").alias("total_chars_redacted"),
        )
        .orderBy("source")
    )


# Winnowing parameters — must mirror n4f_winnow_fingerprint
# (operators/advanced2.py) so the fingerprint sets are comparable.
_K, _STRIDE, _W = 8, 4, 4
_MAX_DF = 50  # drop fingerprints shared by more than this many docs
_MIN_SHARED = 2

_WINNOW_PAIRS_ORACLE = f"""
    WITH h AS (
        SELECT doc_id,
               list_transform(
                   generate_series(0, (length(text)-{_K})//{_STRIDE}),
                   i -> substr(md5(substr(text, 1 + {_STRIDE}*i, {_K})), 1, 8)
               ) AS hs
        FROM documents WHERE n_chars >= 32),
    m AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(hs)-{_W - 1}),
                   j -> list_min(hs[j:j+{_W - 1}]))) AS fps
        FROM h),
    sizes AS (SELECT doc_id, len(fps) AS n_fp FROM m),
    fp AS (SELECT doc_id, unnest(fps) AS fp FROM m),
    freq AS (SELECT fp, count(*) AS df FROM fp GROUP BY fp),
    good AS (SELECT fp.doc_id, fp.fp FROM fp
             JOIN freq USING (fp) WHERE df <= {_MAX_DF}),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM good a JOIN good b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, shared,
           round(shared / (sa.n_fp + sb.n_fp - shared), 6) AS jaccard_est
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE shared >= {_MIN_SHARED}
    ORDER BY doc_a, doc_b
"""


@declare(
    "n31_winnow_neardup_pairs",
    oracle=_WINNOW_PAIRS_ORACLE,
    tags=("ext", "text", "dedup", "fingerprint"),
)
def n31_winnow_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via shared winnowing fingerprints: docs whose
    fingerprint sets overlap in >= {min} positions, with the fingerprint
    Jaccard estimate.

    The candidate join is keyed on the fingerprint itself (explode ->
    equi-join), the same banding shape as MinHash LSH — never all-pairs.
    Fingerprints shared by more than {df} documents are dropped first
    (stop-fingerprint filter): boilerplate shingles otherwise create hot
    join keys whose bucket is quadratic; dropping them bounds every
    bucket at {df} rows, which is what keeps this plan alive at 100 TB.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") >= 32)
        .select("doc_id", "text")
    )
    n_shingles = F.floor((F.length("text") - _K) / _STRIDE).cast("int") + 1
    hashed = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), n_shingles - 1),
            lambda i: F.substring(
                F.md5(F.col("text").substr(i * _STRIDE + 1, F.lit(_K))), 1, 8
            ),
        ).alias("hs"),
    )
    # Row formulation of the sliding min, NOT nested array HOFs
    # (transform(seq, j -> array_min(slice(hs, j, w)))): Catalyst's
    # InferFiltersFromGenerate plants a size()>0 pre-filter under every
    # explode with the full producing expression inlined, and the nested
    # form re-evaluates the md5 shingle transform once per window index
    # inside that filter — O(len^2) md5s per document, measured 56 s vs
    # 3 s at sf0.1. posexplode once + a 4-row window min is O(len) per
    # document no matter where the optimizer copies the expression.
    shingle_rows = hashed.select(
        "doc_id",
        F.size("hs").alias("n_h"),
        F.posexplode("hs").alias("pos", "h"),
    )
    w_min = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _W - 1)
    )
    fp = (
        shingle_rows.withColumn("fp", F.min("h").over(w_min))
        .filter(F.col("pos") <= F.col("n_h") - _W)
        .select("doc_id", "fp")
        .distinct()
    )
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    freq = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    good = fp.join(freq.filter(F.col("df") <= _MAX_DF), "fp")
    a = good.select(F.col("doc_id").alias("doc_a"), "fp")
    b = good.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= _MIN_SHARED)
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_fp", "n_fp_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("n_fp_a") + F.col("n_fp") - F.col("shared")),
                6,
            ).alias("jaccard_est"),
        )
        .orderBy("doc_a", "doc_b")
    )


_CONCAT_ORACLE = """
    SELECT source, lang, count(*) AS n_docs,
           length(string_agg(text, '<eos>' ORDER BY doc_id)) AS seq_chars,
           md5(string_agg(text, '<eos>' ORDER BY doc_id)) AS seq_md5
    FROM documents GROUP BY source, lang ORDER BY source, lang
"""


@declare(
    "n33_doc_concat_sequences",
    oracle=_CONCAT_ORACLE,
    tags=("ext", "text", "training"),
)
def n33_doc_concat_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence assembly: concatenate each (source, lang) stream
    in doc_id order with an <eos> separator; emit length + content digest
    (the md5 keeps multi-MB sequences out of the result set).

    Deterministic order inside a group without a global sort:
    sort_array(collect_list(struct(doc_id, text))) sorts on the struct's
    leading field. Scale bound: one group's sequence must fit an executor
    — real pipelines cap sequences by token budget first (that operator
    is n13_sequence_packing); this op is the bounded-group tail step.
    """
    docs = load_table(spark, sf_dir, "documents")
    grouped = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sort_array(F.collect_list(F.struct("doc_id", "text"))).alias("arr"),
    )
    seq = F.array_join(F.transform("arr", lambda x: x["text"]), "<eos>")
    return grouped.select(
        "source",
        "lang",
        "n_docs",
        F.length(seq).alias("seq_chars"),
        F.md5(seq).alias("seq_md5"),
    ).orderBy("source", "lang")


_HIST_ORACLE = """
    SELECT lang, CAST(floor(log2(n_chars)) AS INT) AS len_bucket,
           count(*) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents WHERE n_chars > 0
    GROUP BY lang, len_bucket ORDER BY lang, len_bucket
"""


@declare("n34_length_histogram", oracle=_HIST_ORACLE, tags=("ext", "text"))
def n34_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two document-length histogram per language — the standard
    first look at a corpus' length distribution (and the input to length-
    bucketed batching). Map-only bucketing plus one grouped count."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        docs.select(
            "lang",
            F.floor(F.log2("n_chars")).cast("int").alias("len_bucket"),
            "n_chars",
        )
        .groupBy("lang", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "len_bucket")
    )


# --------------------------------------------------------------- h22


_INVINDEX_ORACLE = """
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        FROM documents),
    posting AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df,
               array_to_string(list_sort(list(doc_id)), ',') AS postings
        FROM tok WHERE length(term) >= 3 GROUP BY term)
    SELECT term, df, postings
    FROM posting ORDER BY df DESC, term LIMIT 15
"""


@declare("h22_inverted_index", oracle=_INVINDEX_ORACLE, tags=("ext", "text", "index"))
def h22_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term -> document frequency + the sorted
    posting list (the search-engine core structure; posting lists
    serialized to CSV strings for the hash gate). Explode -> distinct
    (term, doc) -> one term-keyed groupBy; collect_list is bounded by df,
    which is bounded by corpus size per term — at 100 TB the posting
    lists of stop-like terms would be sharded (doc_id range buckets)
    before collect; here the top-15 head terms stay collectable. Term
    shuffle is the only exchange."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("term"),
        )
        .where(F.length("term") >= 3)
        .distinct()
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), ","
            ).alias("postings"),
        )
        .orderBy(F.desc("df"), "term")
        .limit(15)
    )
