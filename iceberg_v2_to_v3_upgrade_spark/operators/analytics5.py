"""Declared queries, round 3 batch B: refs metadata, orphan cleanup,
TIMESTAMP AS OF time travel, cumulative-distinct growth curve, URL
extraction, and tokenizer vocabulary coverage.

Reference parity: refs/orphans/timestamp-travel complete the Iceberg
catalog-maintenance surface the reference's upgrade workflow sits on
(branch-audit-publish in README.md:30-38 spirit, `remove_orphan_files`,
and the second time-travel form). The rest extend the [EXT]
training-pipeline family mandated by BASELINE.json's north_star.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- i19


_REFS_ORACLE = """
    SELECT 'audit' AS ref, 'branch' AS ref_type,
           (SELECT count(*) FROM part WHERE p_partkey NOT IN (2, 4, 6))
               AS n_rows
    UNION ALL
    SELECT 'main', 'head', (SELECT count(*) FROM part)
    UNION ALL
    SELECT 'v1', 'tag', (SELECT count(*) FROM part)
    ORDER BY ref
"""


@declare("i19_refs_metadata", oracle=_REFS_ORACLE, tags=("dml", "lifecycle"))
def i19_refs_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``table.refs`` metadata: tags, branches, and the main head with the
    LIVE row count at each ref — the audit view of a write-audit-publish
    flow. A branch takes a staged DELETE; the tag and main must keep
    reading the unmutated table (branch isolation), which the oracle pins
    by stating each ref's expected count from the fixture."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="refs_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "refs_db", "part_refs",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
    )
    t.insert(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_retailprice"
        )
    )
    t.create_tag("v1")
    t.create_branch("audit")
    t.delete_where("p_partkey IN (2, 4, 6)", branch="audit")

    def ref_row(name, rtype, df):
        return df.agg(
            F.lit(name).alias("ref"),
            F.lit(rtype).alias("ref_type"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    out = (
        ref_row("audit", "branch", t.scan(snapshot_id="audit"))
        .unionByName(ref_row("main", "head", t.scan()))
        .unionByName(ref_row("v1", "tag", t.scan(snapshot_id="v1")))
    )
    return out.orderBy("ref")


# --------------------------------------------------------------- i20


_ORPHAN_ORACLE = """
    SELECT CAST(1 AS BIGINT) AS n_orphans_removed,
           (SELECT count(*) FROM part) AS n_live_rows
"""


@declare("i20_orphan_cleanup", oracle=_ORPHAN_ORACLE, tags=("dml", "lifecycle"))
def i20_orphan_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``remove_orphan_files``: a crashed write leaves a data dir no
    snapshot references; dry-run must list exactly it, removal must
    delete exactly it, and the table scan must be untouched throughout
    (orphans are invisible to reads by construction — that invariance is
    the whole contract)."""
    import os

    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="orphan_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "orph_db", "part_orph",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
    )
    t.insert(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_retailprice"
        )
    )
    # plant the orphan: an aborted write's leftover dir
    orphan_dir = os.path.join(t.root, "data", "snap-99999-aborted")
    spark.range(5).write.mode("overwrite").parquet(orphan_dir)
    listed = t.remove_orphan_files(dry_run=True)
    assert listed == [orphan_dir], f"dry-run listed {listed}"
    removed = t.remove_orphan_files()
    assert removed == [orphan_dir] and not os.path.exists(orphan_dir)
    return t.scan().agg(
        F.lit(len(removed)).cast("long").alias("n_orphans_removed"),
        F.count(F.lit(1)).alias("n_live_rows"),
    )


# --------------------------------------------------------------- i21


_ASOF_TT_ORACLE = """
    SELECT p_brand, count(*) AS n_rows
    FROM part GROUP BY p_brand ORDER BY p_brand
"""


@declare(
    "i21_time_travel_timestamp", oracle=_ASOF_TT_ORACLE, tags=("dml", "lifecycle")
)
def i21_time_travel_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF time travel (Iceberg's second time-travel form,
    complementing i4's VERSION AS OF): capture the commit instant after
    the insert, DELETE rows, then scan ``as_of`` that instant — the read
    must see the full pre-delete table (the oracle)."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="asof_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "tt_db", "part_tt",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
    )
    t.insert(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_retailprice"
        )
    )
    post_insert_ts = max(s.timestamp for s in t.snapshots())
    t.delete_where("p_partkey IN (2, 4, 6)")
    return (
        t.scan(as_of=post_insert_ts)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("p_brand")
    )


# --------------------------------------------------------------- e8


_CUMDIST_ORACLE = """
    WITH first_seen AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d
        FROM events GROUP BY user_id),
    daily AS (
        SELECT d, count(*) AS n_new_users FROM first_seen GROUP BY d)
    SELECT d, n_new_users,
           CAST(sum(n_new_users) OVER (ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_users
    FROM daily ORDER BY d
"""


@declare(
    "e8_cumulative_distinct", oracle=_CUMDIST_ORACLE, tags=("ext", "events")
)
def e8_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the audience-growth curve.

    The scalable formulation: distinct-inside-a-running-window is
    quadratic state, so reduce each user to their FIRST day (one grouped
    min — the only corpus-wide shuffle), count new users per day, and
    running-sum the (tiny) daily frame. State is O(users) at the groupBy
    and O(days) at the window — never O(users x days)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("n_new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn(
            "cum_distinct_users", F.sum("n_new_users").over(w).cast("long")
        )
        .orderBy("d")
    )


# --------------------------------------------------------------- h19


_URL_ORACLE = """
    WITH urls AS (
        SELECT 'https://' || lower(replace(c_mktsegment, ' ', ''))
               || '.example.com/u/' || c_custkey
               || '?ref=' || c_nationkey AS url
        FROM customer),
    parsed AS (
        SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
               regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, 'ref=([0-9]+)', 1) AS ref
        FROM urls)
    SELECT host,
           count(*) AS n_urls,
           count(DISTINCT path) AS n_paths,
           count(DISTINCT ref) AS n_refs
    FROM parsed GROUP BY host ORDER BY host
"""


@declare("h19_url_extraction", oracle=_URL_ORACLE, tags=("scalar", "text"))
def h19_url_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing via regexp groups (host / path / query param) — the
    log-processing string surface, kept to RE2-compatible patterns so the
    Java-regex (Spark) and RE2 (DuckDB) engines extract identically.
    Everything is codegen'd string work at the scan; one grouped count."""
    cust = load_table(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower(F.regexp_replace("c_mktsegment", " ", "")),
        F.lit(".example.com/u/"),
        F.col("c_custkey").cast("string"),
        F.lit("?ref="),
        F.col("c_nationkey").cast("string"),
    )
    parsed = cust.select(
        F.regexp_extract(url, r"https?://([^/]+)", 1).alias("host"),
        F.regexp_extract(url, r"://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract(url, r"ref=([0-9]+)", 1).alias("ref"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("path").alias("n_paths"),
            F.count_distinct("ref").alias("n_refs"),
        )
        .orderBy("host")
    )


# --------------------------------------------------------------- n78


_VOCAB_K = 1000

_VOCAB_ORACLE = f"""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents),
    vocab AS (
        SELECT w FROM (
            SELECT w, count(*) AS c FROM toks GROUP BY w
            ORDER BY c DESC, w LIMIT {_VOCAB_K})),
    flagged AS (
        SELECT t.source,
               CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
        FROM toks t LEFT JOIN vocab v ON t.w = v.w)
    SELECT source,
           count(*) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(sum(oov) * 1.0 / count(*), 6) AS oov_rate
    FROM flagged GROUP BY source ORDER BY source
"""


@declare(
    "n78_vocab_coverage", oracle=_VOCAB_ORACLE, tags=("ext", "text", "tokenizer")
)
def n78_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage: OOV rate per source against the
    corpus's own top-{_VOCAB_K} unigram vocabulary — the check run before
    committing to a tokenizer (high OOV = wasted UNK mass).

    The vocabulary is a top-k over the unigram counts (TakeOrdered, not a
    global sort) and is broadcast back against the token stream — the
    corpus shuffles once for the counts and never again; deterministic
    tie-break (freq desc, word asc) keeps the k-th slot engine-stable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(_VOCAB_K)
        .select("w")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("_in_vocab", F.lit(1))), "w", "left"
    )
    oov = F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).cast("bigint").alias("n_oov"),
            F.round(F.sum(oov) * 1.0 / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )
