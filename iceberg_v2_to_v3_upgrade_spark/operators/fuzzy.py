"""Fuzzy string matching: edit-distance functions and the blocked fuzzy
join — entity-resolution shapes (name/title matching across sources) that
every data-integration pipeline eventually needs.

The join is BLOCKED (candidates share a cheap equi-key; the O(len^2)
edit-distance only runs inside blocks) — the same never-all-pairs contract
as the near-dup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_EDIT_ORACLE = """
    SELECT levenshtein(c_name, 'Customer#000000010') AS edit_dist,
           count(*) AS n_customers,
           min(c_name) AS example
    FROM customer WHERE c_custkey <= 500
    GROUP BY edit_dist ORDER BY edit_dist
"""


@declare("h15_edit_distance", oracle=_EDIT_ORACLE, tags=("functions", "fuzzy"))
def h15_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit-distance histogram against a probe string —
    the similarity primitive under fuzzy dedup/matching. Map-only; the
    only shuffle is the distance-bucket rollup."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return (
        cust.select(
            F.levenshtein("c_name", F.lit("Customer#000000010")).alias(
                "edit_dist"
            ),
            "c_name",
        )
        .groupBy("edit_dist")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_name").alias("example"),
        )
        .orderBy("edit_dist")
    )


_FUZZY_JOIN_ORACLE = """
    WITH a AS (
        SELECT s_suppkey, s_name, substr(s_name, 10, 5) AS blk
        FROM supplier),
    b AS (
        SELECT c_custkey, c_name, substr(c_name, 10, 5) AS blk
        FROM customer WHERE c_custkey <= 2000),
    cand AS (
        SELECT a.s_suppkey, a.s_name, b.c_custkey, b.c_name,
               levenshtein(substr(a.s_name, 15), substr(b.c_name, 15)) AS d
        FROM a JOIN b ON a.blk = b.blk)
    SELECT s_suppkey, s_name, c_custkey, c_name, d AS edit_dist
    FROM cand WHERE d <= 1
    ORDER BY s_suppkey, c_custkey
"""


@declare("n56_fuzzy_blocked_join", oracle=_FUZZY_JOIN_ORACLE, tags=("ext", "fuzzy", "join"))
def n56_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): supplier and customer
    records matched on their numeric id segments — candidates must share
    the leading 5 id digits (the BLOCK), then the edit-distance kernel
    runs only on the trailing digits within each block. The two-registry
    same-entity-id shape of record linkage.

    At 100 TB the block key is the whole game: prefix/phonetic/sorted-
    neighborhood blocking bounds every bucket, and the expensive
    quadratic kernel cost scales with true candidate counts (the
    n2b/n31 contract, applied to entity matching).
    """
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.substring("s_name", 10, 5).alias("blk")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 2000)
        .select("c_custkey", "c_name", F.substring("c_name", 10, 5).alias("blk"))
    )
    cand = sup.join(cust, "blk").select(
        "s_suppkey",
        "s_name",
        "c_custkey",
        "c_name",
        F.levenshtein(
            F.expr("substr(s_name, 15)"), F.expr("substr(c_name, 15)")
        ).alias("edit_dist"),
    )
    return cand.filter(F.col("edit_dist") <= 1).orderBy("s_suppkey", "c_custkey")


_ASOF_TOL_ORACLE = """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           CASE WHEN v.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
                THEN epoch_us(p.ts) - epoch_us(v.ts) END AS gap_us,
           CASE WHEN v.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
                THEN 1 ELSE 0 END AS matched
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
"""


@declare(
    "c12_asof_tolerance_join",
    oracle=_ASOF_TOL_ORACLE,
    tags=("join", "asof", "feature-store"),
)
def c12_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness as-of join (feature-store point-in-time lookup):
    every purchase keeps the user's most recent view ONLY if it is at most
    1 hour stale, else the feature is null — the max-staleness contract a
    feature store enforces so models never train on expired features.
    LEFT semantics: unmatched purchases survive with matched=0.

    Same linear union + window composition as c7 (one user_id-keyed
    shuffle); the tolerance is a post-window predicate, not a range join —
    the naive interval-join formulation is quadratic per user. Oracle:
    DuckDB's native ASOF LEFT JOIN with the staleness CASE applied on top.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_purchase"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.col("event_id"),
        F.lit(1).alias("is_purchase"),
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).withColumn(
        "last_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    gap = F.unix_micros("ts") - F.unix_micros("last_view_ts")
    fresh = F.col("last_view_ts").isNotNull() & (gap <= 3_600_000_000)
    return (
        merged.filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.when(fresh, gap).alias("gap_us"),
            F.when(fresh, 1).otherwise(0).alias("matched"),
        )
        .orderBy("event_id")
    )


_TRAJ_ORACLE = """
    WITH seq AS (
        SELECT user_id,
               substr(string_agg(substr(event_type, 1, 1), ''
                                 ORDER BY ts, event_id), 1, 20) AS seq
        FROM events GROUP BY user_id),
    p AS (SELECT user_id AS probe_id, seq AS pseq FROM seq WHERE user_id < 3),
    d AS (SELECT p.probe_id, s.user_id, levenshtein(p.pseq, s.seq) AS dist
          FROM p CROSS JOIN seq s WHERE s.user_id <> p.probe_id),
    r AS (SELECT probe_id, user_id, dist,
                 row_number() OVER (PARTITION BY probe_id
                                    ORDER BY dist, user_id) AS rk
          FROM d)
    SELECT probe_id, user_id, dist, rk FROM r WHERE rk <= 5
    ORDER BY probe_id, rk
"""


@declare(
    "n71_trajectory_similarity",
    oracle=_TRAJ_ORACLE,
    tags=("ext", "events", "similarity", "trajectory"),
)
def n71_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k behavioral-trajectory similarity (cf. distributed top-k
    trajectory search, ICDE 2021): each user's event-type sequence
    (ts-ordered, encoded one char per event, truncated to 20) is compared
    by edit distance against 3 probe users; the 5 nearest users per probe
    survive.

    Shape: one user-keyed shuffle builds every sequence
    (collect_list -> array_sort keeps ordering inside the aggregate — no
    per-user sort pass); probes broadcast, so the distance scan is
    map-only over user-cardinality rows with O(len^2 = 400)-bounded
    per-row work; top-k per probe is a window over a 3-probe-keyed frame.
    At 100 TB a length-difference / q-gram prefilter would prune the
    scan, as in the banding ops."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.collect_list(
                F.struct("ts", "event_id", "event_type")
            ).alias("evs")
        )
        .select(
            "user_id",
            F.substring(
                F.array_join(
                    F.transform(
                        F.array_sort("evs"),
                        lambda s: F.substring(s["event_type"], 1, 1),
                    ),
                    "",
                ),
                1,
                20,
            ).alias("seq"),
        )
    )
    probes = seq.filter(F.col("user_id") < 3).select(
        F.col("user_id").alias("probe_id"), F.col("seq").alias("pseq")
    )
    d = (
        seq.crossJoin(F.broadcast(probes))
        .filter(F.col("user_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "user_id",
            F.levenshtein("pseq", "seq").alias("dist"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("dist", "user_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .orderBy("probe_id", "rk")
    )
