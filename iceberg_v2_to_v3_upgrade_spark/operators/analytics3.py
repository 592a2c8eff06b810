"""Analytics breadth, round 2 batch 3: snapshot-history metadata reads,
correlated scalar subqueries, mergeable HLL sketches, regression
aggregates, and character-entropy quality scoring.

The HLL operator is rows-only by design (sketch estimates have no exact
SQL twin) but self-validating: it asserts the merged estimate lands within
5% of the exact distinct count before returning, so its driver row still
proves correctness (the n2c/n2d precedent).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_HISTORY_ORACLE = """
    SELECT * FROM (VALUES
        (1, 'create', 0, 0, true),
        (2, 'append', 1, 0, true),
        (3, 'append', 2, 0, true),
        (4, 'delete', 2, 1, true),
        (5, 'update', 3, 2, false),
        (6, 'rollback', 2, 1, true),
        (7, 'replace', 1, 0, true)
    ) AS t(snapshot_id, operation, n_data_dirs, n_delete_dirs,
           is_current_ancestor)
    ORDER BY snapshot_id
"""


@declare("i10_snapshot_history", oracle=_HISTORY_ORACLE, tags=("dml", "lifecycle"))
def i10_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-history metadata read (Iceberg ``table.history`` /
    ``table.snapshots`` analog): run the reference's mutation arc and
    read back the commit log — operation kinds and file-count deltas are
    fully determined by the arc, so the oracle is the literal expected
    log. MoR mechanics are visible in the counts: delete adds a delete
    dir (data dirs untouched), update adds both, and compaction (a
    'replace' commit, Iceberg's name for rewrite results) collapses
    everything to one data dir and zero delete dirs.

    Metadata-table reads are driver-side and O(snapshots) — at any data
    scale this query never touches a data file.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="history_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "hist_db",
        "part_hist",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    t.insert(part.filter(F.col("p_partkey") % 2 == 0))
    t.insert(part.filter(F.col("p_partkey") % 2 == 1))
    delete_snap = t.delete_where("p_partkey IN (2, 4, 6)")
    t.update_set(
        {"p_retailprice": "round(p_retailprice * 1.1, 2)"}, "p_brand = 'BrandA'"
    )
    # roll the update back: its snapshot stays in the log but leaves the
    # current ancestry — is_current_ancestor goes false for exactly it
    t.rollback_to_snapshot(delete_snap.id)
    t.rewrite_data_files()
    return (
        t.history()
        .select(
            "snapshot_id",
            "operation",
            "n_data_dirs",
            "n_delete_dirs",
            "is_current_ancestor",
        )
        .orderBy("snapshot_id")
    )


_CORRELATED_ORACLE = """
    SELECT n.n_name AS nation,
           count(*) AS n_above_avg,
           round(max(c.c_acctbal - sub.nation_avg), 4) AS max_over_avg
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN (SELECT c_nationkey, round(avg(c_acctbal), 4) AS nation_avg
          FROM customer GROUP BY c_nationkey) sub
      ON sub.c_nationkey = c.c_nationkey
    WHERE c.c_acctbal > sub.nation_avg
    GROUP BY n.n_name ORDER BY n.n_name
"""


@declare("g6_correlated_scalar", oracle=_CORRELATED_ORACLE, tags=("relational",))
def g6_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers above their own nation's
    average balance), decorrelated the way Catalyst does it: the
    subquery becomes a grouped aggregate joined back on the correlation
    key — expressed here directly as a window so the fact table shuffles
    ONCE on nationkey and never joins itself.
    """
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # the per-nation mean is rounded to 4 decimals BEFORE the comparison
    # and subtraction: the two engines sum the group in different orders,
    # and an unrounded mean can land max_over_avg on a .005 rounding
    # boundary (observed at sf0.001: 4472.36 vs 4472.35 — Spark rounds
    # doubles via BigDecimal.valueOf's shortest-decimal representation,
    # DuckDB via the actual binary value, so exact half-digits diverge).
    # The final round matches the 4-decimal input precision, so it never
    # creates a new half-digit
    w = Window.partitionBy("c_nationkey")
    above = (
        cust.withColumn("nation_avg", F.round(F.avg("c_acctbal").over(w), 4))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
    )
    return (
        above.join(
            F.broadcast(nation),
            above.c_nationkey == nation.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_above_avg"),
            F.round(F.max(F.col("c_acctbal") - F.col("nation_avg")), 4).alias(
                "max_over_avg"
            ),
        )
        .orderBy("nation")
    )


@declare("n50_hll_mergeable_distinct", oracle=None, tags=("ext", "sketch"))
def n50_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches: per-source user sketches unioned into a
    global distinct estimate — THE pattern for distinct counts at 100 TB
    (sketches merge associatively across partitions/days; exact distinct
    needs a full shuffle of the key universe every time).

    Rows-only by design (a sketch estimate has no exact SQL twin), but
    self-validating: asserts the merged estimate is within 5% of the
    exact distinct before returning, so the driver's rows-only row still
    certifies the math (n2c/n2d precedent).
    """
    ev = load_table(spark, sf_dir, "events")
    per_source = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    merged = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_global"),
    )
    exact_global = ev.agg(
        F.countDistinct("user_id").alias("exact_global")
    )
    out = (
        per_source.select(
            "event_type",
            F.hll_sketch_estimate("sk").alias("est_distinct"),
            "exact_distinct",
        )
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(exact_global))
        .orderBy("event_type")
    )
    row = out.limit(1).collect()[0]
    rel_err = abs(row.est_global - row.exact_global) / max(row.exact_global, 1)
    assert rel_err < 0.05, (
        f"merged HLL estimate {row.est_global} drifts {rel_err:.1%} from "
        f"exact {row.exact_global}"
    )
    return out


_TREND_ORACLE = """
    WITH hourly AS (
        SELECT event_type,
               date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                         date_trunc('hour', ts)) AS hr,
               count(*) AS c
        FROM events GROUP BY event_type, hr)
    SELECT event_type,
           count(*) AS n_hours,
           round(regr_slope(c, hr), 4) + 0 AS slope,
           round(regr_intercept(c, hr), 4) + 0 AS intercept,
           round(corr(c, hr), 4) + 0 AS correlation
    FROM hourly GROUP BY event_type ORDER BY event_type
"""


@declare("n51_event_rate_trend", oracle=_TREND_ORACLE, tags=("ext", "events"))
def n51_event_rate_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear trend of hourly event rates per type (regr_slope /
    regr_intercept / corr over the hourly rollup) — drift detection as
    one aggregate pass. The regression aggregates are algebraic (sums of
    products), so they get map-side partial aggregation and merge
    exactly like sum/count at any scale; the hour index is anchored to a
    fixed epoch so both engines regress on identical x values."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hourly = ev.groupBy(
        "event_type",
        (
            F.floor(
                (F.unix_timestamp(F.date_trunc("hour", "ts"))
                 - F.unix_timestamp(anchor)) / 3600
            )
        ).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    # + 0.0 normalizes IEEE negative zero: round() can yield -0.0 in one
    # engine and 0.0 in the other, which hash-mismatch as strings
    return (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            (F.round(F.regr_slope("c", "hr"), 4) + 0.0).alias("slope"),
            (F.round(F.regr_intercept("c", "hr"), 4) + 0.0).alias("intercept"),
            (F.round(F.corr("c", "hr"), 4) + 0.0).alias("correlation"),
        )
        .orderBy("event_type")
    )


_ENTROPY_ORACLE = """
    WITH ch AS (
        SELECT doc_id, lang, unnest(string_split_regex(text, '')) AS ch
        FROM documents),
    cnt AS (
        SELECT doc_id, lang, ch, count(*) AS c
        FROM ch WHERE ch <> '' GROUP BY doc_id, lang, ch),
    wtot AS (
        SELECT doc_id, lang, c,
               sum(c) OVER (PARTITION BY doc_id) AS tot
        FROM cnt),
    docent AS (
        SELECT doc_id, lang, sum(-(c / tot) * log2(c / tot)) AS ent
        FROM wtot GROUP BY doc_id, lang)
    SELECT lang, count(*) AS n_docs,
           round(avg(ent), 6) AS avg_entropy,
           round(min(ent), 6) AS min_entropy,
           round(max(ent), 6) AS max_entropy
    FROM docent GROUP BY lang ORDER BY lang
"""


@declare("n52_char_entropy", oracle=_ENTROPY_ORACLE, tags=("ext", "text"))
def n52_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document, rolled up per
    language — the compressibility proxy used to flag boilerplate/spam
    (low entropy) and binary junk (high entropy) in corpus QC.

    Explode to characters -> per-(doc, char) counts -> entropy as a
    grouped sum — every stage keyed on doc_id, linear in corpus bytes,
    with map-side combine absorbing the char fan-out.
    """
    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id", "lang", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    cnt = ch.groupBy("doc_id", "lang", "ch").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    tot = Window.partitionBy("doc_id")
    docent = (
        cnt.withColumn("tot", F.sum("c").over(tot))
        .select(
            "doc_id",
            "lang",
            (
                -(F.col("c") / F.col("tot"))
                * F.log2(F.col("c") / F.col("tot"))
            ).alias("ent_term"),
        )
        .groupBy("doc_id", "lang")
        .agg(F.sum("ent_term").alias("ent"))
    )
    return (
        docent.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ent"), 6).alias("avg_entropy"),
            F.round(F.min("ent"), 6).alias("min_entropy"),
            F.round(F.max("ent"), 6).alias("max_entropy"),
        )
        .orderBy("lang")
    )
