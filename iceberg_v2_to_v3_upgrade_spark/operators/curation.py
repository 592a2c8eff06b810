"""[EXT] Training-corpus curation operators (SURVEY.md §2.N follow-ons).

Document chunking, Gopher-style repetition filtering, and numeric-shape
redaction — the preprocessing steps a large-scale LLM data pipeline runs
between raw-corpus ingest and tokenization — plus two relational breadth
ops (broadcast range join, unpivot/melt) the star-schema surface lacked.

Scale posture: chunking is embarrassingly parallel array math (zero
shuffle); repetition scoring shuffles twice but both exchanges are keyed
on (doc_id[, bigram]) so they distribute evenly — per-doc state is bounded
by document length, never corpus size. The range join broadcasts the tiny
band table (BroadcastNestedLoopJoin over 4 rows) instead of shuffling the
fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# Chunking geometry: 64-token chunks every 48 tokens (16-token overlap) —
# the classic sliding-context-window layout for LM pretraining shards.
_CHUNK, _STRIDE = 64, 48


@declare(
    "n14_doc_chunking",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        s AS (
            SELECT doc_id, words,
                   unnest(range(0, greatest(len(words), 1), {_STRIDE})) AS start
            FROM w)
        SELECT doc_id,
               start // {_STRIDE} AS chunk_id,
               len(list_slice(words, start + 1, start + {_CHUNK}))
                   AS n_chunk_tokens,
               md5(array_to_string(
                   list_slice(words, start + 1, start + {_CHUNK}), ' '))
                   AS chunk_hash
        FROM s ORDER BY doc_id, chunk_id
    """,
    tags=("ext", "text", "chunking"),
)
def n14_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking of documents into fixed-size
    token chunks (64 tokens, stride 48) — one output row per chunk with a
    content hash, the shard layout an LM pretraining pipeline feeds to the
    tokenizer.

    Pure array expressions + one posexplode: per-document work only, no
    shuffle, so throughput scales with input splits. The chunk text itself
    is reduced to md5 before leaving the executor — at 100 TB you ship
    hashes to the verifier, not chunks."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("w") - 1, F.lit(0)), F.lit(_STRIDE)
    )
    chunk = F.expr(f"slice(w, start + 1, {_CHUNK})")
    return (
        docs.select("doc_id", "w", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@declare(
    "n4g_repetition_filter",
    oracle="""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        b AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(words)),
                          i -> words[i] || ' ' || words[i + 1])) AS bigram
            FROM w WHERE len(words) >= 2),
        g AS (
            SELECT doc_id, bigram, count(*) AS c
            FROM b GROUP BY doc_id, bigram)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_bigrams,
               count(*) AS distinct_bigrams,
               max(c) AS top_bigram_n,
               round(max(c)::DOUBLE / sum(c), 6) AS top_share,
               (max(c)::DOUBLE / sum(c)) > 0.05 AS is_repetitive
        FROM g GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("ext", "text", "quality"),
)
def n4g_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: per document, the share of
    all word-bigrams taken by the single most frequent bigram; documents
    above 5% are flagged repetitive (boilerplate / template spam).

    Two keyed shuffles — (doc_id, bigram) then doc_id — both bounded by
    per-document length, so no key ever exceeds ~n_tokens rows and the
    plan is skew-safe at corpus scale. The bigram array is built in its
    own projection (materialized `w`) to stay clear of the nested-HOF
    re-evaluation trap."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    bigrams = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("w", i), F.element_at("w", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_bigram = (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    share = F.col("top_bigram_n") / F.col("n_bigrams")
    return (
        per_bigram.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count(F.lit(1)).alias("distinct_bigrams"),
            F.max("c").alias("top_bigram_n"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "distinct_bigrams",
            "top_bigram_n",
            F.round(share, 6).alias("top_share"),
            (share > 0.05).alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


@declare(
    "n4h_numeric_redaction",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_digit_runs,
               sum(list_sum(list_transform(
                   regexp_extract_all(props, '[0-9]+'),
                   x -> x::BIGINT))) :: BIGINT AS digit_value_sum,
               count(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g'))
                   AS distinct_shapes
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("ext", "text", "redaction"),
)
def n4h_numeric_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric redaction / payload-shape analysis over event props: strip
    digit runs to '#', count and sum the redacted values, and count the
    distinct structural shapes that remain — the PII-scrub + schema-drift
    probe a production event pipeline runs before retention.

    `[0-9]+` parses identically under Java regex (Spark) and RE2 (DuckDB),
    keeping the oracle cross-engine exact. One aggregate shuffle keyed on
    event_type; everything else is codegen'd string work at the scan."""
    events = load_table(spark, sf_dir, "events")
    runs = F.expr("regexp_extract_all(props, '[0-9]+', 0)")
    return (
        events.select(
            "event_type",
            F.size(runs).alias("n_runs"),
            F.aggregate(
                runs,
                F.lit(0).cast("long"),
                lambda acc, x: acc + x.cast("long"),
            ).alias("run_sum"),
            F.regexp_replace("props", "[0-9]+", "#").alias("shape"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("n_runs").alias("n_digit_runs"),
            F.sum("run_sum").alias("digit_value_sum"),
            F.countDistinct("shape").alias("distinct_shapes"),
        )
        .orderBy("event_type")
    )


_BANDS = [
    ("1_low", 0.0, 20_000.0),
    ("2_mid", 20_000.0, 40_000.0),
    ("3_high", 40_000.0, 60_000.0),
    ("4_lux", 60_000.0, 1e12),
]
_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)


@declare(
    "c10_range_join",
    oracle=f"""
        SELECT band,
               count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        JOIN (VALUES {_BANDS_SQL}) AS bands(band, lo, hi)
          ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY band ORDER BY band
    """,
    tags=("join", "range"),
)
def c10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: classify every lineitem into a price band via a
    non-equi interval join against a tiny broadcast band table, then
    aggregate per band.

    The band side is 4 rows, so the only sane physical plan is a broadcast
    nested-loop join — the fact table streams through without a shuffle
    and the predicate stays in whole-stage codegen. (A shuffle-based plan
    on a non-equi condition would be a cartesian disaster at scale.)"""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("band")
    )


@declare(
    "d9_unpivot",
    oracle="""
        WITH a AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc
            FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        UNION ALL
        SELECT l_returnflag, 'sum_base_price', sum_base_price FROM a
        UNION ALL
        SELECT l_returnflag, 'avg_disc', avg_disc FROM a
        ORDER BY l_returnflag, metric
    """,
    tags=("agg", "unpivot"),
)
def d9_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide per-flag aggregate → long (flag, metric, value)
    rows, the normalized layout metric stores and plotting layers want.

    The unpivot itself is a zero-shuffle Expand (each input row fans out
    to 3 output rows locally); the only exchange is the 3-group aggregate
    before it."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_base_price", "avg_disc"],
        "metric",
        "value",
    ).orderBy("l_returnflag", "metric")


# Decontamination window: word n-grams of this size define "overlap".
# Production decontamination uses 13-grams (GPT-3 appendix C); the
# synthetic fixture's 31-word vocabulary only collides at n=3, so the
# fixture run exercises nonzero overlap while the operator stays
# parameterized the same way.
_DECON_N = 3
# Held-out "benchmark" membership: every 53rd doc plays the eval set.
_EVAL_MOD = 53


@declare(
    "n16_decontamination",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        g AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, len(words) - {_DECON_N - 2}),
                       i -> md5(array_to_string(
                           list_slice(words, i, i + {_DECON_N - 1}), ' ')))))
                       AS gram
            FROM w),
        e AS (
            SELECT DISTINCT gram FROM g WHERE doc_id % {_EVAL_MOD} = 0),
        t AS (
            SELECT doc_id, gram FROM g WHERE doc_id % {_EVAL_MOD} <> 0),
        n AS (
            SELECT doc_id, count(*) AS n_grams FROM t GROUP BY doc_id)
        SELECT t.doc_id,
               n.n_grams,
               count(*) AS n_hits,
               round(count(*)::DOUBLE / n.n_grams, 6) AS contamination
        FROM t JOIN e USING (gram) JOIN n USING (doc_id)
        GROUP BY t.doc_id, n.n_grams
        ORDER BY t.doc_id
    """,
    tags=("ext", "text", "decontamination"),
)
def n16_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination scan: hash every distinct word n-gram of
    the training split, semi-match against the n-gram set of the held-out
    eval split, and report per-training-doc overlap — the decontamination
    pass every serious pretraining pipeline runs before training.

    The eval n-gram set (benchmarks are tiny relative to the corpus) is
    DISTINCT-ed and broadcast, so the training side streams through one
    hash join with no fact-side shuffle before the per-doc aggregate.
    Grams are hashed to 8-byte xxhash64 before the join — the hash never
    leaves the query (both sides hash identically, counts are over
    hashes), so the cheapest fixed-width key wins: at 100 TB you join on
    8-byte ints, not raw 13-gram strings (measured 19.4 s → 12.3 s at
    sf0.1 vs md5)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    grams_arr = F.when(
        F.size("w") >= _DECON_N,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - (_DECON_N - 1)),
                lambda i: F.xxhash64(
                    F.array_join(F.slice(F.col("w"), i, _DECON_N), " ")
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # n_grams rides inside the exploded payload so only the train split
    # pays for it; the eval split explodes the bare hash array.
    # CRITICAL (round-10 measurement): the payload transform must close
    # over a MATERIALIZED grams column, not the grams expression —
    # ``F.size(grams_arr)`` inside the lambda re-evaluates the ENTIRE
    # shingling per array element (Catalyst does no CSE across HOF
    # lambdas, the same O(d^2) trap as analytics16._norm_round), which
    # measured 16.2 s for the train explode alone at sf0.1 vs 0.64 s
    # with the two-step projection below (the earlier "~4%" note
    # compared the wrong pair of variants). CollapseProject keeps the
    # extra Project because grams is non-cheap and referenced twice.
    payload = F.transform(
        F.col("grams"),
        lambda g: F.struct(
            g.alias("gram"), F.size("grams").alias("n_grams")
        ),
    )
    # eval side never needs n_grams — explode the bare hash array
    eval_grams = (
        docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select(F.explode(grams_arr).alias("gram"))
        .distinct()
    )
    train = (
        docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .select("doc_id", grams_arr.alias("grams"))
        .select("doc_id", F.explode(payload).alias("x"))
        .select("doc_id", "x.gram", "x.n_grams")
    )
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_grams"), 6).alias(
                "contamination"
            ),
        )
        .orderBy("doc_id")
    )


@declare(
    "e6_window_distribution",
    oracle="""
        WITH base AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ntile(4) OVER w AS price_quartile,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cume
            FROM orders
            WHERE o_custkey < 200
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice,
                         o_orderkey))
        SELECT * FROM base ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
    tags=("window", "distribution"),
)
def e6_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile / percent_rank / cume_dist
    per customer, the quantile-assignment shapes behind per-group
    percentile capping and curriculum bucketing.

    One window shuffle keyed on o_custkey; the o_orderkey tiebreak makes
    every rank function deterministic (unordered ties would hash-differ
    across engines)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 200
    )
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.ntile(4).over(w).alias("price_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_custkey", "o_totalprice", "o_orderkey")
    )


@declare(
    "n17_curriculum_buckets",
    oracle="""
        WITH sized AS (
            SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
            FROM documents),
        bucketed AS (
            SELECT lang,
                   CASE WHEN n_tokens < 16 THEN '0_tiny'
                        WHEN n_tokens < 48 THEN '1_short'
                        WHEN n_tokens < 96 THEN '2_medium'
                        ELSE '3_long' END AS bucket,
                   n_tokens
            FROM sized)
        SELECT lang, bucket,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(avg(n_tokens), 2) AS avg_tokens
        FROM bucketed GROUP BY lang, bucket ORDER BY lang, bucket
    """,
    tags=("ext", "sampling", "curriculum"),
)
def n17_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length curriculum binning: assign every document to a
    length bucket (tiny/short/medium/long) and report the per-language
    token budget of each bin — the shard-planning step for length-based
    curriculum training and packing-efficiency estimates.

    Pure projection + one grouped aggregate; the bucket CASE stays in
    whole-stage codegen so this is a single-shuffle full-corpus census."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    bucket = (
        F.when(n_tokens < 16, "0_tiny")
        .when(n_tokens < 48, "1_short")
        .when(n_tokens < 96, "2_medium")
        .otherwise("3_long")
    )
    return (
        docs.select("lang", bucket.alias("bucket"), n_tokens.alias("n_tokens"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
        )
        .orderBy("lang", "bucket")
    )


@declare(
    "n18_unigram_logprob_score",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents),
        freq AS (
            SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        total AS (SELECT sum(c) AS n FROM freq),
        scored AS (
            SELECT t.doc_id, ln(f.c / total.n) AS lp
            FROM tok t JOIN freq f ON t.tok = f.tok, total)
        SELECT doc_id,
               count(*) AS n_tokens,
               round(avg(lp), 4) AS avg_logprob
        FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("ext", "text", "quality", "perplexity"),
)
def n18_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-probability scoring — the perplexity-proxy quality
    filter: estimate a unigram LM from the corpus itself (token relative
    frequencies), then score each document by its mean token log-prob.
    Low scores flag gibberish / rare-token spam; production pipelines cut
    a bottom percentile on exactly this signal.

    The 'language model' is a tiny aggregate (|vocab| rows), so the score
    join is a broadcast hash join against the token stream — at 100 TB
    the corpus is scanned twice (count, score) and shuffled once per
    grouped aggregate, never joined shuffle-side. avg() is rounded to 4
    decimals: float sums are order-sensitive under parallel aggregation,
    and 1e-4 is far above double accumulation error at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    lm = freq.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("c") / F.col("n")).alias("lp")
    )
    return (
        tok.join(F.broadcast(lm), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@declare(
    "n26_chunk_dedup_savings",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, string_split(text, ' ') AS words
            FROM documents),
        s AS (
            SELECT doc_id, source, words,
                   unnest(range(0, greatest(len(words), 1), {_STRIDE}))
                       AS st
            FROM w),
        c AS (
            SELECT doc_id, source,
                   st // {_STRIDE} AS chunk_id,
                   len(list_slice(words, st + 1, st + {_CHUNK})) AS n_tok,
                   md5(array_to_string(
                       list_slice(words, st + 1, st + {_CHUNK}), ' ')) AS h
            FROM s),
        r AS (
            SELECT *, row_number() OVER (PARTITION BY h
                                         ORDER BY doc_id, chunk_id) AS rn
            FROM c)
        SELECT source,
               count(*) AS n_chunks,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
               CAST(sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) AS BIGINT) AS dup_tokens,
               round(sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END)
                     / sum(n_tok), 6) AS savings_pct
        FROM r GROUP BY source ORDER BY source
    """,
    tags=("ext", "text", "dedup", "chunking"),
)
def n26_chunk_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup at chunk granularity (the scalable
    approximation of suffix-array substring dedup): shard the corpus into
    n14's 64-token chunks, keep the first occurrence of each chunk hash,
    and report per-source duplicated-chunk/token counts and the token
    savings from deduplicating shards before tokenization.

    Chunk hashes are md5'd in-executor; the only fact-scale movement is
    ONE shuffle keyed by chunk hash for the keeper window (group size =
    duplicate multiplicity), then a source-keyed rollup that partial-
    aggregates. Ties inside a hash group break on (doc_id, chunk_id), so
    the keeper choice is deterministic under any partitioning."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("w") - 1, F.lit(0)), F.lit(_STRIDE)
    )
    chunk = F.expr(f"slice(w, start + 1, {_CHUNK})")
    chunks = docs.select(
        "doc_id",
        "source",
        F.posexplode(starts).alias("chunk_id", "start"),
        "w",
    ).select(
        "doc_id",
        "source",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_tok"),
        F.md5(F.array_join(chunk, " ")).alias("h"),
    )
    rn = F.row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "chunk_id")
    )
    dup = F.col("rn") > 1
    return (
        chunks.withColumn("rn", rn)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.when(dup, 1).otherwise(0)).alias("dup_chunks"),
            F.sum(F.when(dup, F.col("n_tok")).otherwise(0)).alias(
                "dup_tokens"
            ),
            F.round(
                F.sum(F.when(dup, F.col("n_tok")).otherwise(0))
                / F.sum("n_tok"),
                6,
            ).alias("savings_pct"),
        )
        .orderBy("source")
    )


@declare(
    "n27_quality_weighted_sample",
    oracle="""
        WITH q AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) AS n_unique
            FROM documents),
        s AS (
            SELECT doc_id, source, n_tokens,
                   0.5 * least(n_tokens / 64.0, 1.0)
                   + 0.5 * (n_unique * 1.0 / n_tokens) AS quality,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u01
            FROM q)
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN u01 < quality THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN u01 < quality THEN n_tokens ELSE 0 END)
                   AS BIGINT) AS kept_tokens,
               round(avg(quality), 6) AS target_rate,
               round(sum(CASE WHEN u01 < quality THEN 1 ELSE 0 END)
                     / count(*), 6) AS realized_rate
        FROM s GROUP BY source ORDER BY source
    """,
    tags=("ext", "text", "sampling", "quality"),
)
def n27_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling: keep each document with
    probability equal to its quality score (n4c's length-saturation +
    lexical-diversity scorer) — the DCLM/FineWeb-style soft filter that
    preserves a quality gradient instead of a hard cutoff.

    The keep decision is md5(doc_id)-derived uniform-[0,1) < quality, so
    membership is deterministic, reproducible across engines, cluster
    sizes, and re-partitioning (same property as n11/n12/n15), and the
    realized per-source rate converges to mean quality. Map-side only +
    one source-keyed rollup."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    s = docs.select(
        "doc_id",
        "source",
        F.size(tokens).alias("n_tokens"),
        (
            0.5 * F.least(F.size(tokens) / 64.0, F.lit(1.0))
            + 0.5 * (F.size(F.array_distinct(tokens)) / F.size(tokens))
        ).alias("quality"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            / 4294967296.0
        ).alias("u01"),
    )
    kept = F.col("u01") < F.col("quality")
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias(
                "kept_tokens"
            ),
            F.round(F.avg("quality"), 6).alias("target_rate"),
            F.round(
                F.sum(F.when(kept, 1).otherwise(0)) / F.count(F.lit(1)), 6
            ).alias("realized_rate"),
        )
        .orderBy("source")
    )
