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
    listed = t.remove_orphan_files(dry_run=True, older_than_seconds=0)
    assert listed == [orphan_dir], f"dry-run listed {listed}"
    removed = t.remove_orphan_files(older_than_seconds=0)
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


# --------------------------------------------------------------- i22


_POST_UPGRADE_DELETE_ORACLE = """
    SELECT p_brand,
           count(*) AS n_live,
           round(sum(CASE WHEN p_type = 'PROMO'
                          THEN round(p_retailprice * 1.1, 2)
                          ELSE p_retailprice END), 2) AS price_sum
    FROM part
    WHERE p_partkey NOT IN (2, 4, 6, 8, 10)
    GROUP BY p_brand ORDER BY p_brand
"""


@declare(
    "i22_v3_post_upgrade_delete",
    oracle=_POST_UPGRADE_DELETE_ORACLE,
    tags=("dml", "lifecycle"),
)
def i22_v3_post_upgrade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's post-upgrade readability proof
    (internal/test_v3_mor_deletes.py:42): after the V2->V3 upgrade and
    full compaction, a NEW MoR DELETE must write V3-era delete state and
    the table must stay fully readable — the exact failure mode the
    upgrade's version gate exists to prevent (README.md:41-45). i3 stops
    at compact+scan; this query runs the delete-AFTER-upgrade leg."""
    from iceberg_v2_to_v3_upgrade_spark.plans.upgrade import execute_upgrade
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="pud_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "pud_db", "part_mor",
        "p_partkey BIGINT, p_brand STRING, p_type STRING, "
        "p_retailprice DOUBLE",
    )
    t.insert(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_type", "p_retailprice"
        )
    )
    t.delete_where("p_partkey IN (2, 4, 6)")
    t.update_set(
        {"p_retailprice": "round(p_retailprice * 1.1, 2)"}, "p_type = 'PROMO'"
    )
    result = execute_upgrade(catalog, "pud_db", "part_mor")
    assert result.ok, result.message
    upgraded = catalog.load_table("pud_db", "part_mor")
    assert upgraded.format_version == 3
    assert not upgraded.current_snapshot().delete_dirs  # compacted clean
    # the reference's post-upgrade MoR delete (test_v3_mor_deletes.py:42)
    upgraded.delete_where("p_partkey IN (8, 10)")
    assert len(upgraded.current_snapshot().delete_dirs) == 1  # V3-era MoR
    return (
        upgraded.scan()
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.round(F.sum("p_retailprice"), 2).alias("price_sum"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------- d18


@declare(
    "d18_freq_items_sketch",
    oracle=None,
    tags=("ext", "sketch", "approx"),
)
def d18_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (`DataFrame.stat.freqItems`, the
    count-based Karp/FS sketch) over order priorities — constant-memory
    frequent-item detection at any scale. Approximate by construction ->
    rows-only; SELF-VALIDATING: the sketch's support guarantee (every
    item with frequency > s appears) is asserted in-query against the
    exact grouped counts, so the rows-only row still proves the sketch
    honors its contract."""
    orders = load_table(spark, sf_dir, "orders")
    support = 0.2
    sketch_items = set(
        orders.stat.freqItems(["o_orderpriority"], support=support).collect()[0][0]
    )
    total = orders.count()
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for item, n in exact.items():
        if n > support * total and item not in sketch_items:
            raise AssertionError(
                f"freqItems missed {item!r} with freq {n}/{total}"
            )
    rows = [
        (item, item in sketch_items, exact.get(item, 0))
        for item in sorted(exact)
    ]
    return spark.createDataFrame(
        rows, "o_orderpriority string, in_sketch boolean, exact_n long"
    ).orderBy("o_orderpriority")


# --------------------------------------------------------------- n79


_CONTAINMENT_ORACLE = """
    WITH g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(string_split(text, ' ')) - 3),
                   i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')))
                   AS gram
        FROM documents
        WHERE len(string_split(text, ' ')) >= 5),
    gs AS (SELECT DISTINCT doc_id, gram FROM g),
    sizes AS (SELECT doc_id, count(*) AS n FROM gs GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM gs a JOIN gs b ON a.gram = b.gram AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           round(i.common * 1.0 / sa.n, 6) AS containment
    FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
    WHERE i.common * 1.0 / sa.n >= 0.8
    ORDER BY doc_a, doc_b
"""


@declare(
    "n79_containment_dedup",
    oracle=_CONTAINMENT_ORACLE,
    tags=("ext", "dedup", "text"),
)
def n79_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection: doc A is (near-)contained in doc
    B when >=80% of A's distinct 5-grams also occur in B — the
    quote/excerpt/superset signal Jaccard misses (a short doc embedded in
    a long one has low Jaccard but containment ~1). The directed pair
    (A,B) and (B,A) score differently by design.

    Gram-keyed equi-join (never all-pairs): only docs SHARING a gram meet,
    the same prefix-filter shape as n2b; the denominator frame is
    O(docs) and joins broadcast."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 5)
    gs = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 4),
                lambda i: F.concat_ws(" ", F.slice("w", i, 5)),
            )
        ).alias("gram"),
    ).distinct()
    sizes = gs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        gs.alias("a")
        .join(
            gs.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"),
                                     F.col("n").alias("na"))),
            "doc_a",
        )
        .withColumn("containment", F.round(F.col("common") / F.col("na"), 6))
        .filter(F.col("common") / F.col("na") >= 0.8)
        .select("doc_a", "doc_b", "containment")
    )
    return out.orderBy("doc_a", "doc_b")


# --------------------------------------------------------------- m8


_SCENE_FRAME = 64  # bytes per synthetic frame
_SCENE_CUT = 24.0  # mean-intensity jump that counts as a scene cut

_SCENE_ORACLE = f"""
    WITH v AS (
        SELECT doc_id, source, text, n_chars,
               CAST(floor(n_chars / {_SCENE_FRAME}.0) AS INT) AS n_frames
        FROM documents WHERE n_chars >= {_SCENE_FRAME} * 2),
    f AS (
        SELECT doc_id, source, i AS frame_idx,
               list_sum(list_transform(range(0, {_SCENE_FRAME}),
                   j -> ord(substr(text, i * {_SCENE_FRAME} + j + 1, 1))))
                   / {_SCENE_FRAME}.0 AS intensity
        FROM v, unnest(range(0, n_frames)) AS t(i)),
    d AS (
        SELECT doc_id, source, frame_idx, intensity,
               intensity - lag(intensity) OVER (PARTITION BY doc_id
                                                ORDER BY frame_idx) AS delta
        FROM f)
    SELECT source,
           count(DISTINCT doc_id) AS n_videos,
           CAST(sum(CASE WHEN abs(delta) > {_SCENE_CUT}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
           round(avg(intensity), 4) AS avg_intensity
    FROM d GROUP BY source ORDER BY source
"""


@declare(
    "m8_video_scene_cuts",
    oracle=_SCENE_ORACLE,
    tags=("ext", "multimodal"),
)
def m8_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the synthetic video column: the asset
    bytes are segmented into fixed-size frames, each frame reduced to a
    mean intensity, and a cut is a frame-over-frame intensity jump above
    threshold — the shot-boundary pass a video training pipeline runs to
    pick frames worth captioning.

    The frame explode is linear in asset bytes; intensities are pure
    codegen'd array math (no UDF); the lag is a per-asset window whose
    partitions are bounded by frames-per-asset. At 100 TB the only
    shuffle is the per-asset window key."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= _SCENE_FRAME * 2
    )
    frames = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(F.col("n_chars") / float(_SCENE_FRAME)).cast("int") - 1,
            )
        ).alias("frame_idx"),
        "text",
    ).select(
        "doc_id",
        "source",
        "frame_idx",
        (
            F.expr(
                f"aggregate(transform(sequence(0, {_SCENE_FRAME - 1}), "
                f"j -> ascii(substr(text, frame_idx * {_SCENE_FRAME} + j + 1, 1))), "
                f"0L, (a, x) -> a + x)"
            )
            / float(_SCENE_FRAME)
        ).alias("intensity"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = frames.withColumn(
        "delta", F.col("intensity") - F.lag("intensity").over(w)
    )
    return (
        d.groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_videos"),
            F.sum(F.when(F.abs("delta") > _SCENE_CUT, 1).otherwise(0))
            .cast("bigint")
            .alias("n_cuts"),
            F.round(F.avg("intensity"), 4).alias("avg_intensity"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------- d19


_BENFORD_ORACLE = """
    WITH digits AS (
        -- floor() explicitly: DuckDB CAST(double AS BIGINT) ROUNDS, Spark truncates
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS d
        FROM orders WHERE o_totalprice >= 1),
    obs AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT obs.d AS first_digit,
           obs.n AS n_observed,
           round(obs.n * 1.0 / tot.total, 6) AS p_observed,
           round(log10(1.0 + 1.0 / obs.d), 6) AS p_benford
    FROM obs, tot ORDER BY first_digit
"""


@declare(
    "d19_benford_audit", oracle=_BENFORD_ORACLE, tags=("ext", "quality", "audit")
)
def d19_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals: observed first-digit
    distribution side-by-side with Benford's law expectation — the
    fabricated-data / broken-generator smell test a data-quality layer
    runs on monetary columns. One scan, a 9-key aggregate, and a 1-row
    total broadcast; nothing here grows past 9 rows after the scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            F.col("n").alias("n_observed"),
            F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("p_observed"),
            F.round(F.log10(1.0 + 1.0 / F.col("d")), 6).alias("p_benford"),
        )
        .orderBy("first_digit")
    )


# --------------------------------------------------------------- d20


_SKEW_ORACLE = """
    WITH s1 AS (
        SELECT 'lineitem.l_orderkey' AS key_col,
               CAST(sum(c) AS BIGINT) AS n_rows,
               count(*) AS n_distinct,
               max(c) AS top1_count
        FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey)),
    s2 AS (
        SELECT 'lineitem.l_suppkey',
               CAST(sum(c) AS BIGINT), count(*), max(c)
        FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_suppkey)),
    s3 AS (
        SELECT 'orders.o_custkey',
               CAST(sum(c) AS BIGINT), count(*), max(c)
        FROM (SELECT count(*) AS c FROM orders GROUP BY o_custkey))
    SELECT key_col, n_rows, n_distinct, top1_count,
           round(top1_count * 1.0 / n_rows, 6) AS top1_share
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s3)
    ORDER BY key_col
"""


@declare(
    "d20_join_key_skew_report", oracle=_SKEW_ORACLE, tags=("ext", "scale", "audit")
)
def d20_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: per candidate shuffle key, the row count,
    distinct-key count, and the hottest key's share — the report that
    decides between a plain shuffle, AQE skew-join, or salting (k1/k2)
    BEFORE a 100 TB job is launched. Each key costs one grouped count
    whose result frame is O(distinct keys); the hot-key max is a second
    tiny aggregate over that frame."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def key_stats(df, col, label):
        per_key = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return per_key.agg(
            F.lit(label).alias("key_col"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top1_count"),
        ).select(
            "key_col",
            "n_rows",
            "n_distinct",
            "top1_count",
            F.round(F.col("top1_count") * 1.0 / F.col("n_rows"), 6).alias(
                "top1_share"
            ),
        )

    out = (
        key_stats(li, "l_orderkey", "lineitem.l_orderkey")
        .unionByName(key_stats(li, "l_suppkey", "lineitem.l_suppkey"))
        .unionByName(key_stats(orders, "o_custkey", "orders.o_custkey"))
    )
    return out.orderBy("key_col")


# --------------------------------------------------------------- n80


_MAD_ORACLE = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*) AS n
        FROM events GROUP BY event_type, h),
    stats AS (
        SELECT event_type,
               median(n * 1.0) AS med
        FROM hourly GROUP BY event_type),
    dev AS (
        SELECT h.event_type, h.h, h.n, s.med,
               abs(h.n - s.med) AS ad
        FROM hourly h JOIN stats s USING (event_type)),
    mad AS (
        SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_type,
           count(*) AS n_hours,
           CAST(sum(CASE WHEN m.mad > 0
                         AND abs(d.n - d.med) / (1.4826 * m.mad) > 3.5
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_hours
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
"""


@declare(
    "n80_robust_anomaly_mad",
    oracle=_MAD_ORACLE,
    tags=("ext", "events", "timeseries"),
)
def n80_robust_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust hourly anomaly detection via median absolute deviation —
    the outlier-resistant twin of n41's z-score (a single traffic spike
    inflates a stddev but barely moves the MAD, so MAD flags it instead
    of hiding it). Modified z = |x - median| / (1.4826 * MAD), outliers
    at > 3.5 (Iglewicz-Hoaglin).

    The hourly rollup is the only corpus-wide shuffle; medians run on the
    per-(type,hour) frame (bounded by hours x types), broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.expr("percentile(n * 1.0, 0.5)").alias("med")
    )
    dev = hourly.join(F.broadcast(stats), "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    is_outlier = (F.col("mad") > 0) & (
        F.abs(F.col("n") - F.col("med")) / (1.4826 * F.col("mad")) > 3.5
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(is_outlier, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outlier_hours"),
        )
        .orderBy("event_type")
    )
