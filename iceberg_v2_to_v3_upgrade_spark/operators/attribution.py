"""Declared queries, round 3 batch F: Markov-chain multi-touch attribution.

The removal-effect model: user journeys become a first-order Markov chain
(START -> channel -> ... -> CONV/NULL); a channel's credit is how much the
chain's conversion probability drops when that channel is removed. The
chain solve is a fixed 16-step power iteration — deterministic, identical
in both engines — run as a DataFrame loop over the TINY (scenario, state)
frame; only the transition aggregation ever touches the full events table.
The DuckDB oracle unrolls the same 16 steps as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_ITERS = 16
_CHANNELS = ("click", "error", "signup", "view")

_JOURNEY_SQL = """
    ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
    purch AS (
        SELECT user_id, min(rn) AS prn
        FROM ranked WHERE event_type = 'purchase' GROUP BY 1),
    kept AS (
        SELECT r.user_id, r.event_type, r.rn, p.prn
        FROM ranked r LEFT JOIN purch p USING (user_id)
        WHERE r.event_type <> 'purchase'
          AND (p.prn IS NULL OR r.rn < p.prn)),
    steps AS (
        SELECT user_id,
               coalesce(lag(event_type) OVER (PARTITION BY user_id
                                              ORDER BY rn), 'START') AS src,
               event_type AS dst
        FROM kept
        UNION ALL
        -- terminal edge: last pre-purchase touch (or START if the
        -- purchase led) -> CONV for converters, last touch -> NULL else
        SELECT k.user_id,
               coalesce(max_by(k.event_type, k.rn), 'START') AS src,
               CASE WHEN max(k.prn) IS NOT NULL THEN 'CONV'
                    ELSE 'NULL' END AS dst
        FROM kept k GROUP BY k.user_id
        UNION ALL
        SELECT p.user_id, 'START', 'CONV'
        FROM purch p
        WHERE p.prn = 1),
    trans AS (
        SELECT src, dst, count(*) AS cnt,
               sum(count(*)) OVER (PARTITION BY src) AS total
        FROM steps GROUP BY 1, 2),
    strans AS (
        SELECT s.scenario, t.src, t.dst, t.cnt * 1.0 / t.total AS prob
        FROM trans t,
             (SELECT 'full' AS scenario UNION ALL SELECT 'click'
              UNION ALL SELECT 'error' UNION ALL SELECT 'signup'
              UNION ALL SELECT 'view') s
        WHERE s.scenario = 'full'
           OR (t.src <> s.scenario AND t.dst <> s.scenario))
"""


def _oracle() -> str:
    ctes = ["WITH " + _JOURNEY_SQL.strip().rstrip(",") + ","]
    ctes.append(
        "p0 AS (SELECT DISTINCT scenario, src AS state, 0.0 AS p FROM strans),"
    )
    for i in range(1, _ITERS + 1):
        ctes.append(
            f"p{i} AS (SELECT t.scenario, t.src AS state, "
            "sum(t.prob * CASE t.dst WHEN 'CONV' THEN 1.0 "
            "WHEN 'NULL' THEN 0.0 ELSE coalesce(p.p, 0.0) END) AS p "
            f"FROM strans t LEFT JOIN p{i - 1} p "
            "ON p.scenario = t.scenario AND p.state = t.dst "
            "GROUP BY 1, 2),"
        )
    ctes[-1] = ctes[-1].rstrip(",")
    final = f"""
    SELECT c.scenario AS channel,
           round(f.p, 6) + 0.0 AS p_conv_full,
           round(1.0 - c.p / f.p, 6) + 0.0 AS removal_effect
    FROM p{_ITERS} c
    JOIN p{_ITERS} f
      ON f.scenario = 'full' AND f.state = 'START'
    WHERE c.state = 'START' AND c.scenario <> 'full'
    ORDER BY channel
    """
    return "\n".join(ctes) + final


@declare(
    "n91_markov_attribution", oracle=_oracle(), tags=("ext", "events", "stats")
)
def n91_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect attribution. Journeys truncate at the first
    purchase; transitions include START and the CONV/NULL absorbers; for
    each removal scenario the channel's rows are dropped (mass through it
    is lost — the standard removal semantics). Conversion probability
    from START is solved by a fixed 16-step power iteration over the
    (scenario, state) frame — at most 5 scenarios x 6 states, so each
    step is a broadcast join over rows that would fit in a cache line;
    the only data-scale work is the transition count (one user-keyed
    window + one groupBy). Removal effect = 1 - P_removed/P_full."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    purch = (
        ranked.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    kept = (
        ranked.join(purch, "user_id", "left")
        .filter(
            (F.col("event_type") != "purchase")
            & (F.col("prn").isNull() | (F.col("rn") < F.col("prn")))
        )
    )
    wk = Window.partitionBy("user_id").orderBy("rn")
    steps = (
        kept.select(
            F.coalesce(F.lag("event_type").over(wk), F.lit("START")).alias(
                "src"
            ),
            F.col("event_type").alias("dst"),
        )
        .unionByName(
            kept.groupBy("user_id").agg(
                F.coalesce(
                    F.max_by("event_type", "rn"), F.lit("START")
                ).alias("src"),
                F.when(F.max("prn").isNotNull(), "CONV")
                .otherwise("NULL")
                .alias("dst"),
            ).select("src", "dst")
        )
        .unionByName(
            purch.filter(F.col("prn") == 1).select(
                F.lit("START").alias("src"), F.lit("CONV").alias("dst")
            )
        )
    )
    trans = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    trans = trans.withColumn(
        "prob",
        F.col("cnt") * 1.0 / F.sum("cnt").over(Window.partitionBy("src")),
    )
    # The fixed point runs DRIVER-SIDE (round-10): the transition frame
    # is bounded by the fixed state vocabulary (|states|^2 <= 36 rows —
    # a k-bounded collect, never corpus-shaped), and the previous
    # 16-step loop of join+agg+localCheckpoint jobs was pure scheduler
    # overhead (~3 s of a 4.5 s query) for arithmetic over a frame that
    # fits in a cache line. Same per-step math (sum of prob * successor
    # value, absorbers CONV=1 / NULL=0, missing successors 0.0); sums
    # accumulate in sorted (src, dst) order — both the old Spark agg
    # and the DuckDB oracle are order-unpinned here, which the final
    # 6dp rounding absorbs (unchanged tolerance class, re-verified
    # hash-green at all three SFs). round() replicates F.round exactly:
    # HALF_UP over the shortest-repr decimal (repr(float) ==
    # Double.toString), plus the same +0.0 negative-zero normalization.
    from decimal import ROUND_HALF_UP, Decimal

    def _round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        ) + 0.0

    tr = sorted(
        (r["src"], r["dst"], float(r["prob"]))
        for r in trans.select("src", "dst", "prob").collect()
    )

    def _solve(scenario: str) -> float | None:
        """P(conv from START) under the scenario, or None when no
        surviving transition leaves START — the oracle's p16 then has no
        START row for the scenario and its final join emits NO row
        (round-10 ADVICE: the old code emitted removal_effect 1.0 for
        that channel, a row-count parity change)."""
        t = [
            (s, d, p)
            for s, d, p in tr
            if scenario == "full" or (s != scenario and d != scenario)
        ]
        states = sorted({s for s, _d, _p in t})
        if "START" not in states:
            return None
        p = dict.fromkeys(states, 0.0)
        for _ in range(_ITERS):
            nxt = dict.fromkeys(states, 0.0)
            for s, d, prob in t:
                nxt[s] += prob * (
                    1.0
                    if d == "CONV"
                    else 0.0
                    if d == "NULL"
                    else p.get(d, 0.0)
                )
            p = nxt
        return p["START"]

    p_full = _solve("full")
    out_rows = []
    if p_full is not None:  # else: oracle's f-join matches nothing
        for c in sorted(_CHANNELS):
            pc = _solve(c)
            if pc is None:
                continue
            # DuckDB (and the pre-round-10 Spark plan) yield NULL for
            # double division by zero — measured, not IEEE Inf/NaN —
            # so a zero-conversion corpus gets a NULL removal_effect,
            # not a ZeroDivisionError (round-10 ADVICE)
            re_val = (
                None if p_full == 0.0 else _round6(1.0 - pc / p_full)
            )
            out_rows.append((c, _round6(p_full), re_val))
    return spark.createDataFrame(
        out_rows, "channel string, p_conv_full double, removal_effect double"
    )
