"""Declared lifecycle queries, part 3: partitions metadata table and
snapshot rollback — plus the grouped-Arrow OLS operator that puts the
``applyInPandas`` path under the driver's hash gate.

Reference parity: partitions-metadata mirrors Iceberg's
``table.partitions`` (the inspection surface behind the reference's
``--list`` report, ``internal/upgrade_table.py:187-194``); rollback mirrors
``CALL system.rollback_to_snapshot`` — the escape hatch the reference's
README points operators to when an upgrade goes wrong.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_PARTITIONS_ORACLE = """
    SELECT p_brand AS partition_value, count(*) AS record_count
    FROM part WHERE p_partkey NOT IN (2, 4, 6)
    GROUP BY p_brand ORDER BY p_brand
"""


@declare(
    "i11_partitions_metadata", oracle=_PARTITIONS_ORACLE, tags=("dml", "lifecycle")
)
def i11_partitions_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``table.partitions`` metadata read after MoR mutation: per-partition
    LIVE record counts (delete files applied) — what the reference's
    ``--list`` style inspection shows an operator deciding what to
    compact. Partition values come from the directory layout; only the
    record counts touch data, as one grouped count over the merged scan.

    File-count/byte columns exist on the API but are excluded here: how
    many parquet files a partition holds depends on writer parallelism,
    which is environment- not data-determined.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="partmeta_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "pm_db",
        "part_mor",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
        partition_by=["p_brand"],
    )
    t.insert(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_retailprice"
        )
    )
    t.delete_where("p_partkey IN (2, 4, 6)")
    return (
        t.partitions()
        .select(
            F.col("p_brand").alias("partition_value"),
            "record_count",
        )
        .orderBy("partition_value")
    )


_ROLLBACK_ORACLE = """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part ORDER BY p_partkey
"""


@declare("i12_rollback", oracle=_ROLLBACK_ORACLE, tags=("dml", "lifecycle"))
def i12_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rollback_to_snapshot``: mutate (DELETE + UPDATE), then roll back
    to the post-insert snapshot — the scan must read exactly the
    unmutated fixture (the oracle), and the rollback itself lands as a
    NEW auditable commit (history preserved, like Iceberg).

    Rollback is metadata-only at any scale: the commit points back at
    the old snapshot's file set; no data file is read or written.
    """
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="rollback_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "rb_db",
        "part_mor",
        "p_partkey BIGINT, p_brand STRING, p_retailprice DOUBLE",
        partition_by=["p_brand"],
    )
    insert_snap = t.insert(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_retailprice"
        )
    )
    t.delete_where("p_partkey IN (2, 4, 6)")
    t.update_set(
        {"p_retailprice": "round(p_retailprice * 1.1, 2)"}, "p_brand = 'BrandA'"
    )
    t.rollback_to_snapshot(insert_snap.id)
    assert t.current_snapshot().operation == "rollback"
    return (
        t.scan()
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )


_OLS_ORACLE = """
    WITH hourly AS (
        SELECT event_type,
               date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                         date_trunc('hour', ts)) AS hr,
               count(*) AS c
        FROM events GROUP BY event_type, hr)
    SELECT event_type,
           count(*) AS n_hours,
           round(regr_slope(c, hr), 4) + 0 AS slope,
           round(regr_intercept(c, hr), 4) + 0 AS intercept
    FROM hourly GROUP BY event_type ORDER BY event_type
"""


@declare("m6_grouped_arrow_ols", oracle=_OLS_ORACLE, tags=("ext", "arrow"))
def m6_grouped_arrow_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-Arrow custom aggregation: per-event-type OLS fit of hourly
    counts, computed in numpy inside ``applyInPandas`` — and hash-checked
    against DuckDB's regr_slope/regr_intercept, which certifies the whole
    grouped-Arrow path (grouping, batch assembly, pandas->Arrow->JVM
    types) numerically, not just structurally. n51 computes the same fit
    with built-in algebraic aggregates; this is the escape hatch for
    models the SQL surface can't express (the two agree through round(4)).

    Scale shape: the expensive pass is the hourly pre-aggregation
    (map-side combined); the Arrow stage sees |types| x |hours| rows
    grouped on the same key they were already shuffled on.
    """
    import pandas as pd

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

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # closure-self-contained (pickled by value — executors don't have
        # the repo on sys.path; see SCALING.md UDF note)
        import numpy as np

        x = pdf["hr"].to_numpy(dtype="float64")
        y = pdf["c"].to_numpy(dtype="float64")
        xm, ym = x.mean(), y.mean()
        cov = ((x - xm) * (y - ym)).sum()
        var = ((x - xm) ** 2).sum()
        slope = cov / var
        intercept = ym - slope * xm
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_hours": [len(pdf)],
                "slope": [round(slope, 4) + 0.0],
                "intercept": [round(intercept, 4) + 0.0],
            }
        )

    return (
        hourly.groupBy("event_type")
        .applyInPandas(
            fit, "event_type string, n_hours long, slope double, intercept double"
        )
        .orderBy("event_type")
    )


_INC_NEARDUP_ORACLE = """
    WITH cutoff AS (
        SELECT CAST(floor(max(doc_id) * 0.8) AS BIGINT) AS c FROM documents),
    d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
        FROM d, unnest(range(greatest(len(w) - 2, 0))) AS t(i)),
    h AS (
        SELECT doc_id, s.seed,
               min(('0x' || substr(
                   md5(s.seed::VARCHAR || ':' || shingle), 1, 8))::BIGINT) AS mh
        FROM sh, unnest(range(32)) AS s(seed)
        GROUP BY doc_id, s.seed),
    sig AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM h GROUP BY doc_id),
    banded AS (
        SELECT doc_id, sig, b.band,
               md5(array_to_string(
                   sig[b.band * 4 + 1 : (b.band + 1) * 4], ',')) AS bkey
        FROM sig, unnest(range(8)) AS b(band)),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sig AS sig_a, b.sig AS sig_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id <> b.doc_id
        WHERE a.doc_id >= (SELECT c FROM cutoff))
    SELECT doc_a, doc_b,
           round(len(list_filter(generate_series(1, 32),
                     i -> sig_a[i] = sig_b[i])) / 32.0, 6) AS est_jaccard
    FROM cand
    WHERE len(list_filter(generate_series(1, 32),
              i -> sig_a[i] = sig_b[i])) / 32.0 >= 0.8
    ORDER BY doc_a, doc_b
"""


@declare(
    "i13_incremental_neardup",
    oracle=_INC_NEARDUP_ORACLE,
    tags=("dml", "incremental", "dedup"),
)
def i13_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup maintenance over table CDC: documents land in the
    snapshot-versioned table in two commits; the second batch is read back
    as the CHANGELOG (LocalTable.changes — O(changed rows), not O(table))
    and only those delta docs are MinHash-signed and band-joined against
    the corpus index. This is the process-only-the-delta pattern that
    keeps dedup affordable at 100 TB: per crawl drop, signature work is
    |delta|, not |corpus|, and the banded index itself would be a
    maintained table updated by the same commit.

    The 80%-of-max-doc_id cutoff is computed from the data on both sides,
    so the oracle replays the identical split. Candidate pairs keep LEFT =
    new doc; est-Jaccard >= 0.8 verified exactly like n2h."""
    from iceberg_v2_to_v3_upgrade_spark.operators.dedup import (
        md5_band_keys,
        md5_minhash_sig_grouped,
    )
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    docs = load_table(spark, sf_dir, "documents")
    cutoff = int(
        docs.agg(F.floor(F.max("doc_id") * 0.8).cast("bigint")).collect()[0][0]
    )
    catalog = LocalCatalog(spark, tempfile.mkdtemp(prefix="incdedup_wh_"))
    t = catalog.create_table(
        "inc_db",
        "docs",
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    t.insert(docs.filter(F.col("doc_id") < cutoff))
    base_snap = t.current_snapshot().id
    t.insert(docs.filter(F.col("doc_id") >= cutoff))

    delta = t.changes(base_snap).filter(
        F.col("_change_type") == "insert"
    ).select("doc_id", "text")

    def band_explode(sig_df: DataFrame) -> DataFrame:
        return sig_df.select(
            "doc_id", "sig", F.explode(md5_band_keys(F.col("sig"))).alias("bk")
        ).select("doc_id", "sig", "bk.band", "bk.bkey")

    new_banded = band_explode(md5_minhash_sig_grouped(delta))
    corpus_banded = band_explode(
        md5_minhash_sig_grouped(t.scan().select("doc_id", "text"))
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(32.0)
    )
    return (
        new_banded.alias("a")
        .join(
            corpus_banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )


@declare(
    "i14_stats_file_skipping",
    oracle="""
        WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                   FROM orders)
        SELECT o_orderkey, o_totalprice FROM orders, b
        WHERE o_totalprice > b.lo + (b.hi - b.lo) * 0.8
        ORDER BY o_orderkey
    """,
    tags=("dml", "scan", "pruning"),
)
def i14_stats_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file skipping end-to-end: orders land in 4 commits
    covering disjoint price ranges (per-dir min/max recorded at write
    time), then a selective scan proves that dirs whose range excludes
    the predicate are never read — the Iceberg data-skipping behavior
    that turns a 100 TB scan into a read of the few matching files. The
    query ASSERTS pruning happened (3 of 4 dirs skipped) before
    returning; the oracle recomputes the same selection from the raw
    fixture."""
    from pyspark.sql import functions as F2

    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    lo, hi = od.agg(
        F2.min("o_totalprice"), F2.max("o_totalprice")
    ).collect()[0]
    catalog = LocalCatalog(spark, tempfile.mkdtemp(prefix="skip_wh_"))
    t = catalog.create_table(
        "skip_db", "orders_ranged", "o_orderkey BIGINT, o_totalprice DOUBLE"
    )
    step = (hi - lo) / 4
    for i in range(4):
        a = lo + i * step
        b = hi + 1 if i == 3 else lo + (i + 1) * step
        t.insert(
            od.filter(
                (F2.col("o_totalprice") >= a) & (F2.col("o_totalprice") < b)
            )
        )
    cut = lo + (hi - lo) * 0.8
    out = t.scan(data_filter=f"o_totalprice > {cut!r}").orderBy("o_orderkey")
    assert t.last_scan_pruning == {"candidate_dirs": 4, "read_dirs": 1}, (
        f"expected 3 of 4 dirs skipped, got {t.last_scan_pruning}"
    )
    return out


@declare(
    "i16_compaction_advisor",
    oracle="""
        WITH del AS (SELECT count(*) AS n_deleted FROM orders
                     WHERE o_orderkey % 5 = 0),
             tot AS (SELECT count(*) AS n_total FROM orders)
        SELECT 'adv_db.orders_mor' AS table_name,
               del.n_deleted AS n_position_deletes,
               round(del.n_deleted / tot.n_total, 6) AS deleted_fraction,
               CASE WHEN del.n_deleted >= 1 THEN 1 ELSE 0 END
                   AS needs_compaction,
               0 AS n_position_deletes_after
        FROM del, tot
    """,
    tags=("dml", "maintenance", "advisor"),
)
def i16_compaction_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction-debt advisor: measures MoR delete-file debt from the
    position_deletes metadata table (never touching data files), applies
    the reference's delete-file-threshold decision rule
    (upgrade_table.py:124 / README.md:28 — any file with >= 1 delete
    entry gets rewritten), runs the compaction, and proves the debt hits
    zero. This is the reference's [OK]/[WARN] report upgraded to a
    measurable, hash-checked maintenance decision.

    The oracle recomputes every metric from the raw fixture (the delete
    predicate determines the debt), so a miscounted delete entry or a
    compaction that loses/keeps the wrong rows breaks the hash."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    catalog = LocalCatalog(spark, tempfile.mkdtemp(prefix="adv_wh_"))
    t = catalog.create_table(
        "adv_db", "orders_mor", "o_orderkey BIGINT, o_totalprice DOUBLE"
    )
    t.insert(od)
    n_total = t.scan().count() + 0  # pre-delete cardinality
    t.delete_where("o_orderkey % 5 = 0")
    n_pos = t.position_deletes().count()
    needs = 1 if n_pos >= 1 else 0
    if needs:
        t.rewrite_data_files()
    n_after = t.position_deletes().count()
    assert n_after == 0
    return spark.createDataFrame(
        [
            (
                "adv_db.orders_mor",
                n_pos,
                round(n_pos / n_total, 6),
                needs,
                n_after,
            )
        ],
        "table_name string, n_position_deletes long, deleted_fraction double, "
        "needs_compaction int, n_position_deletes_after int",
    )
