"""Declared queries, round 3 batch D: interval-overlap sweep, time-series
gap-fill, A/B z-test, Kaplan-Meier survival, change-point split statistic,
Zipf rank-frequency fit, readability scoring, and BFS shortest paths.

All are classic warehouse/training-pipeline analytics the reference's
users run downstream of its tables; each is expressed as pure DataFrame
ops (windows, one keyed shuffle each — no Python in the hot path) with a
DuckDB oracle. BFS is the one genuinely iterative operator: Spark has no
recursive CTE, so it runs a bounded frontier-join loop (one broadcast-size
shuffle per hop) against DuckDB's WITH RECURSIVE as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

# --------------------------------------------------------------- c13


_CONCURRENCY_ORACLE = """
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                     OR lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events),
    sessions AS (
        SELECT user_id, min(ts) AS s, max(ts) AS e
        FROM (SELECT user_id, ts,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sn
              FROM ordered)
        GROUP BY user_id, sn),
    sweep AS (
        SELECT s AS t, 1 AS delta FROM sessions
        UNION ALL
        SELECT e AS t, -1 AS delta FROM sessions)
    SELECT (SELECT count(*) FROM sessions) AS n_sessions,
           CAST(max(running) AS BIGINT) AS max_concurrent
    FROM (SELECT sum(delta) OVER (ORDER BY t, delta DESC
                                  ROWS UNBOUNDED PRECEDING) AS running
          FROM sweep)
"""


@declare(
    "c13_max_concurrent_sessions",
    oracle=_CONCURRENCY_ORACLE,
    tags=("ext", "events", "interval"),
)
def c13_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap analytics via the +1/-1 sweep: sessionize (30-min
    gap), turn each session [start, end] into a start(+1)/end(-1) event
    pair, and take the max of the running sum — peak concurrent sessions.

    Closed-interval convention: at equal timestamps starts are processed
    before ends (ORDER BY t, delta DESC), so zero-length single-event
    sessions still register. Scale: the sweep is ONE global ordered
    window over 2x n_sessions rows — n_sessions is already two orders of
    magnitude smaller than events, and at 100 TB the same sweep runs
    per day/tenant partition with a final tree-agg max."""
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(F.col("user_id"), F.session_window("ts", "30 minutes"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    # one scan: each session explodes to its (start,+1)/(end,-1) pair
    # instead of a self-union that would re-read events per branch
    sweep = sessions.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("x")
    ).select("x.t", "x.delta")
    running = sweep.withColumn(
        "running",
        F.sum("delta").over(
            Window.orderBy(F.col("t").asc(), F.col("delta").desc()).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return running.agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions"),
        F.max("running").alias("max_concurrent"),
    )


# --------------------------------------------------------------- n81


_GAP_FILL_ORACLE = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour_ts,
               count(*) AS cnt, round(avg(value), 4) + 0.0 AS avg_val
        FROM events GROUP BY 1),
    spine AS (
        SELECT unnest(generate_series(
                   (SELECT min(date_trunc('hour', ts)) FROM events),
                   (SELECT max(date_trunc('hour', ts)) FROM events),
                   INTERVAL 1 HOUR)) AS hour_ts)
    SELECT s.hour_ts,
           coalesce(h.cnt, 0) AS n_events,
           last_value(h.avg_val IGNORE NULLS) OVER (
               ORDER BY s.hour_ts ROWS UNBOUNDED PRECEDING) AS avg_val_ffill
    FROM spine s LEFT JOIN hourly h USING (hour_ts)
    ORDER BY s.hour_ts
"""


@declare(
    "n81_gap_fill_resample",
    oracle=_GAP_FILL_ORACLE,
    tags=("ext", "events", "timeseries"),
)
def n81_gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: an hourly spine generated with
    ``sequence()`` (never a driver-side loop), left-joined to the hourly
    aggregate; missing hours land as 0 events with the last known hourly
    mean forward-filled (``last(ignorenulls=True)``).

    Scale: the spine is O(hours) — tiny — and broadcast-joins to the
    aggregate; forward fill is one ordered window over the spine, not the
    raw events. At 100 TB the hourly aggregate is the only big shuffle
    and it is a partial-agg-friendly groupBy."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.round(F.avg("value"), 4) + F.lit(0.0)).alias("avg_val"),
    )
    bounds = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour_ts")
    )
    w = Window.orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(hourly, "hour_ts", "left")
        .select(
            "hour_ts",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_events"),
            F.last("avg_val", ignorenulls=True).over(w).alias("avg_val_ffill"),
        )
        .orderBy("hour_ts")
    )


# --------------------------------------------------------------- n82


_AB_TEST_ORACLE = """
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                    THEN 'A' ELSE 'B' END AS variant,
               max(CASE WHEN event_type = 'purchase' AND value > 200
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1, 2),
    per_variant AS (
        SELECT variant, count(*) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_conv,
               sum(converted) * 1.0 / count(*) AS rate
        FROM assigned GROUP BY 1),
    pooled AS (
        SELECT sum(n_conv) * 1.0 / sum(n_users) AS p,
               sum(CASE WHEN variant = 'A' THEN rate END)
                   - sum(CASE WHEN variant = 'B' THEN rate END) AS diff,
               sum(CASE WHEN variant = 'A' THEN 1.0 / n_users END)
                   + sum(CASE WHEN variant = 'B' THEN 1.0 / n_users END)
                   AS inv_n
        FROM per_variant)
    SELECT v.variant, v.n_users, v.n_conv,
           round(v.rate, 6) + 0.0 AS conv_rate,
           round(p.diff / sqrt(p.p * (1 - p.p) * p.inv_n), 4) + 0.0 AS z_stat
    FROM per_variant v, pooled p
    ORDER BY v.variant
"""


@declare(
    "n82_ab_test_ztest", oracle=_AB_TEST_ORACLE, tags=("ext", "events", "stats")
)
def n82_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-assigned to
    variants (first md5 hex char — the engine-portable bucket idiom from
    n11), conversion = any purchase over 200 (every fixture user makes
    SOME purchase at the monthly horizon, which would degenerate the
    pooled p to 1 and the z denominator to 0), and the two-proportion pooled
    z-statistic. Assignment is a pure function of user_id, so membership
    is stable under any cluster size or partitioning — the property that
    matters at 100 TB. One user-keyed shuffle; everything after is over
    a 2-row frame."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            "A",
        )
        .otherwise("B")
        .alias("variant"),
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
            ).otherwise(0)
        ).alias("converted")
    )
    per_variant = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
        (F.sum("converted") * 1.0 / F.count(F.lit(1))).alias("rate"),
    )
    pooled = per_variant.agg(
        (F.sum("n_conv") * 1.0 / F.sum("n_users")).alias("p"),
        (
            F.sum(F.when(F.col("variant") == "A", F.col("rate")))
            - F.sum(F.when(F.col("variant") == "B", F.col("rate")))
        ).alias("diff"),
        (
            F.sum(F.when(F.col("variant") == "A", 1.0 / F.col("n_users")))
            + F.sum(F.when(F.col("variant") == "B", 1.0 / F.col("n_users")))
        ).alias("inv_n"),
    )
    return (
        per_variant.crossJoin(F.broadcast(pooled))
        .select(
            "variant",
            "n_users",
            "n_conv",
            (F.round(F.col("rate"), 6) + F.lit(0.0)).alias("conv_rate"),
            (
                F.round(
                    F.col("diff")
                    / F.sqrt(F.col("p") * (1 - F.col("p")) * F.col("inv_n")),
                    4,
                )
                + F.lit(0.0)
            ).alias("z_stat"),
        )
        .orderBy("variant")
    )


# --------------------------------------------------------------- n83


_KM_ORACLE = """
    WITH lifetimes AS (
        SELECT user_id,
               date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
                   AS lifetime_days
        FROM events GROUP BY 1),
    grouped AS (
        SELECT lifetime_days, count(*) AS n_deaths
        FROM lifetimes GROUP BY 1),
    km AS (
        SELECT lifetime_days, n_deaths,
               CAST(sum(n_deaths) OVER (ORDER BY lifetime_days DESC
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS n_risk
        FROM grouped)
    SELECT lifetime_days, n_deaths, n_risk,
           CASE WHEN min(1.0 - n_deaths * 1.0 / n_risk)
                         OVER (ORDER BY lifetime_days
                               ROWS UNBOUNDED PRECEDING) <= 0
                THEN 0.0
                ELSE round(exp(sum(
                         CASE WHEN 1.0 - n_deaths * 1.0 / n_risk > 0
                              THEN ln(1.0 - n_deaths * 1.0 / n_risk)
                              ELSE 0.0 END)
                     OVER (ORDER BY lifetime_days ROWS UNBOUNDED PRECEDING)),
                     6) + 0.0
           END AS survival
    FROM km ORDER BY lifetime_days
"""


@declare(
    "n83_kaplan_meier", oracle=_KM_ORACLE, tags=("ext", "events", "stats")
)
def n83_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes (days between first and
    last event; all observations uncensored at fixture horizon). The
    estimator is a product over event times of (1 - d_i / n_i) computed
    as exp(cumsum(ln ...)) with the zero-factor guard both engines agree
    on (DuckDB hard-errors on ln(0)). n_risk is a descending cumulative
    sum — one window, no self-join. Scale: the heavy step is the per-user
    min/max (one keyed shuffle); the KM curve itself lives on the tiny
    distinct-lifetime frame."""
    ev = load_table(spark, sf_dir, "events")
    lifetimes = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("lifetime_days")
    )
    grouped = lifetimes.groupBy("lifetime_days").agg(
        F.count(F.lit(1)).alias("n_deaths")
    )
    w_desc = Window.orderBy(F.col("lifetime_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("lifetime_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = grouped.withColumn("n_risk", F.sum("n_deaths").over(w_desc))
    factor = 1.0 - F.col("n_deaths") * 1.0 / F.col("n_risk")
    return km.select(
        "lifetime_days",
        "n_deaths",
        "n_risk",
        F.when(F.min(factor).over(w_asc) <= 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(
                    F.sum(
                        F.when(factor > 0, F.log(factor)).otherwise(0.0)
                    ).over(w_asc)
                ),
                6,
            )
            + F.lit(0.0)
        )
        .alias("survival"),
    ).orderBy("lifetime_days")


# --------------------------------------------------------------- n84


_CHANGEPOINT_ORACLE = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1),
    indexed AS (
        SELECT day, cnt,
               row_number() OVER (ORDER BY day) AS i,
               sum(cnt) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s,
               count(*) OVER () AS n,
               sum(cnt) OVER () AS total
        FROM daily)
    SELECT day AS split_day,
           round(abs(s * 1.0 / i - (total - s) * 1.0 / (n - i))
                 * sqrt(i * (n - i) * 1.0 / n), 4) + 0.0 AS split_stat,
           round(s * 1.0 / i, 4) + 0.0 AS mean_left,
           round((total - s) * 1.0 / (n - i), 4) + 0.0 AS mean_right
    FROM indexed WHERE i < n
    ORDER BY abs(s * 1.0 / i - (total - s) * 1.0 / (n - i))
                 * sqrt(i * (n - i) * 1.0 / n) DESC, day
    LIMIT 1
"""


@declare(
    "n84_changepoint_split",
    oracle=_CHANGEPOINT_ORACLE,
    tags=("ext", "events", "timeseries"),
)
def n84_changepoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection (binary-segmentation step): for every
    candidate split of the daily event-count series, the scaled
    mean-difference statistic |mean_L - mean_R| * sqrt(i*(n-i)/n),
    maximized. All splits evaluated at once from ONE prefix-sum window —
    no per-split scan, no driver loop; the candidate frame is O(days).
    Deterministic tie-break on the earlier day."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    indexed = daily.select(
        "day",
        F.row_number().over(w).alias("i"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("s"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("cnt").over(wall).alias("total"),
    )
    ml = F.col("s") * 1.0 / F.col("i")
    mr = (F.col("total") - F.col("s")) * 1.0 / (F.col("n") - F.col("i"))
    stat = F.abs(ml - mr) * F.sqrt(
        F.col("i") * (F.col("n") - F.col("i")) * 1.0 / F.col("n")
    )
    return (
        indexed.filter(F.col("i") < F.col("n"))
        .select(
            F.col("day").alias("split_day"),
            (F.round(stat, 4) + F.lit(0.0)).alias("split_stat"),
            (F.round(ml, 4) + F.lit(0.0)).alias("mean_left"),
            (F.round(mr, 4) + F.lit(0.0)).alias("mean_right"),
            stat.alias("_stat"),
        )
        .orderBy(F.col("_stat").desc(), "split_day")
        .limit(1)
        .drop("_stat")
    )


# --------------------------------------------------------------- n85


_ZIPF_ORACLE = """
    WITH freqs AS (
        SELECT t.word, count(*) AS freq
        FROM documents, unnest(string_split(text, ' ')) AS t(word)
        WHERE t.word <> ''
        GROUP BY 1),
    ranked AS (
        SELECT freq,
               row_number() OVER (ORDER BY freq DESC, word) AS rank
        FROM freqs
        ORDER BY freq DESC, word LIMIT 1000)
    SELECT count(*) AS n_terms,
           round(regr_slope(ln(freq * 1.0), ln(rank * 1.0)), 4) + 0.0
               AS zipf_slope,
           round(regr_r2(ln(freq * 1.0), ln(rank * 1.0)), 4) + 0.0 AS fit_r2
    FROM ranked
"""


@declare(
    "n85_zipf_slope", oracle=_ZIPF_ORACLE, tags=("ext", "text", "stats")
)
def n85_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: the Zipf rank-frequency fit. Healthy
    natural-language corpora show ln(freq) ~ -1 * ln(rank); a slope far
    from -1 or a weak R^2 flags synthetic/degenerate text. Uses the
    built-in regr_slope/regr_r2 aggregates (single-pass, JVM-side) over
    the top-1000 terms; term counting is the standard explode->groupBy
    (one shuffle, map-side combined). TakeOrdered handles the top-k."""
    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = (
        freqs.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("freq").desc(), F.col("word"))
            ),
        )
        .filter(F.col("rank") <= 1000)
        .select(
            F.log(F.col("freq") * 1.0).alias("ln_f"),
            F.log(F.col("rank") * 1.0).alias("ln_r"),
        )
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.round(F.expr("regr_slope(ln_f, ln_r)"), 4) + F.lit(0.0)).alias(
            "zipf_slope"
        ),
        (F.round(F.expr("regr_r2(ln_f, ln_r)"), 4) + F.lit(0.0)).alias(
            "fit_r2"
        ),
    )


# --------------------------------------------------------------- n86


_READABILITY_ORACLE = """
    WITH scored AS (
        SELECT doc_id,
               206.835
               - 1.015 * (len(list_filter(string_split(text, ' '),
                                          x -> x <> '')) * 1.0
                          / greatest(len(list_filter(
                                string_split_regex(text, '[.!?]+'),
                                x -> trim(x) <> '')), 1))
               - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))
                         * 1.0
                         / greatest(len(list_filter(string_split(text, ' '),
                                                    x -> x <> '')), 1))
                   AS flesch
        FROM documents)
    SELECT CAST(floor(flesch / 10) * 10 AS BIGINT) AS score_bucket,
           count(*) AS n_docs,
           round(avg(flesch), 4) + 0.0 AS avg_score
    FROM scored GROUP BY 1 ORDER BY 1
"""


@declare(
    "n86_readability_flesch",
    oracle=_READABILITY_ORACLE,
    tags=("ext", "text", "quality"),
)
def n86_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring with a vowel-group syllable proxy
    (regexp_extract_all on [aeiouy]+ runs), bucketed into a histogram.
    Pure per-row JVM expressions — zero shuffles before the tiny
    bucket-level groupBy; the standard quality-filter signal a training
    pipeline computes beside n4c's stopword/punctuation score."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.size(
        F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    )
    sentences = F.greatest(
        F.size(
            F.filter(
                F.split("text", r"[.!?]+"), lambda x: F.trim(x) != F.lit("")
            )
        ),
        F.lit(1),
    )
    syllables = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    )
    flesch = (
        F.lit(206.835)
        - 1.015 * (words * 1.0 / sentences)
        - 84.6 * (syllables * 1.0 / F.greatest(words, F.lit(1)))
    )
    return (
        docs.select(flesch.alias("flesch"))
        .groupBy(
            (F.floor(F.col("flesch") / 10) * 10)
            .cast("bigint")
            .alias("score_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.round(F.avg("flesch"), 4) + F.lit(0.0)).alias("avg_score"),
        )
        .orderBy("score_bucket")
    )


# --------------------------------------------------------------- n87


_BFS_ORACLE = """
    WITH RECURSIVE
    edges AS (
        SELECT p_partkey AS src,
               (2 * p_partkey) % (SELECT count(*) FROM part) + 1 AS dst
        FROM part
        UNION ALL
        SELECT p_partkey,
               (3 * p_partkey + 1) % (SELECT count(*) FROM part) + 1
        FROM part),
    walk AS (
        SELECT 1 AS node, 0 AS hops
        UNION ALL
        SELECT e.dst, w.hops + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < 6)
    SELECT hops, count(*) AS n_nodes
    FROM (SELECT node, min(hops) AS hops FROM walk GROUP BY node)
    GROUP BY hops ORDER BY hops
"""


#: size guard for the driver BFS fast path (the n2f/_star_components
#: convention: a bounded collect, never corpus-shaped)
_BFS_DRIVER_MAX_EDGES = 500_000


def _bfs_hop_counts(
    edges: DataFrame,
    source: int = 1,
    max_hops: int = 6,
    stats: dict | None = None,
) -> list[tuple[int, int]]:
    """(hops, n_nodes) pairs for a capped BFS from ``source`` over an
    (src, dst) edge frame — exact min-hop layers, sorted by hops.

    Round-11 (VERDICT r10 item 4, the n2f pattern): when the edge set
    fits the 500k-row guard, a DRIVER BFS over a collected adjacency
    dict replaces the 6-hop distributed loop — each hop of which was a
    join + distinct + anti-join + localCheckpoint round-trip of pure
    job machinery over a frontier bounded by the part dimension
    (~3 s of scheduler overhead at sf0.1). Layer sets are identical
    (exact integer BFS either way). ``stats`` is the instrumentation
    hook and forces the distributed path (tests measure both)."""
    if stats is None:
        edge_rows = edges.limit(_BFS_DRIVER_MAX_EDGES + 1).collect()
        if len(edge_rows) <= _BFS_DRIVER_MAX_EDGES:
            adj: dict[int, list[int]] = {}
            for e in edge_rows:
                adj.setdefault(e["src"], []).append(e["dst"])
            dist = {source: 0}
            frontier = [source]
            for hop in range(1, max_hops + 1):
                nxt: list[int] = []
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v not in dist:
                            dist[v] = hop
                            nxt.append(v)
                if not nxt:
                    break
                frontier = nxt
            from collections import Counter

            c = Counter(dist.values())
            return sorted(c.items())
    spark = edges.sparkSession
    edges = edges.persist()  # reused by every hop's join
    dist_df = spark.createDataFrame(
        [(source, 0)], "node long, hops int"
    )
    frontier_df = dist_df
    rounds = 0
    for hop in range(1, max_hops + 1):
        nxt_df = (
            frontier_df.join(edges, frontier_df.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist_df.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        nxt_df = nxt_df.localCheckpoint(eager=True)  # cut deep lineage
        rounds += 1
        if nxt_df.isEmpty():
            break
        dist_df = dist_df.unionByName(nxt_df)
        frontier_df = nxt_df
    if stats is not None:
        stats["rounds"] = rounds
    rows = (
        dist_df.groupBy("hops")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("hops")
        .collect()
    )
    edges.unpersist()
    return [(int(r["hops"]), int(r["n_nodes"])) for r in rows]


@declare(
    "n87_bfs_shortest_path", oracle=_BFS_ORACLE, tags=("ext", "graph")
)
def n87_bfs_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path distances on a deterministic functional graph
    over part keys (k -> 2k mod N + 1 and k -> 3k+1 mod N + 1), from
    source node 1, capped at 6 hops. Spark has no recursive CTE; the
    engine side is ``_bfs_hop_counts``: a size-gated driver BFS over
    the (output-bounded) edge list, with the canonical distributed
    frontier loop — keyed join + anti-join per hop, work bounded by
    the frontier — behind the gate for graphs that exceed it. The
    DuckDB oracle is a genuine WITH RECURSIVE walk."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    n = part.count()  # scalar aggregate, not a data collect
    edges = part.select(
        F.col("p_partkey").alias("src"),
        ((2 * F.col("p_partkey")) % n + 1).alias("dst"),
    ).unionAll(
        part.select(
            F.col("p_partkey").alias("src"),
            ((3 * F.col("p_partkey") + 1) % n + 1).alias("dst"),
        )
    )
    return spark.createDataFrame(
        _bfs_hop_counts(edges), "hops int, n_nodes bigint"
    )
