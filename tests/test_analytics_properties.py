"""Property tests for the batch-D/F analytics math: the Spark
formulations (interval sweep, Kaplan-Meier windows, change-point prefix
sums, BFS frontier loop) against brute-force Python on RANDOM inputs —
the fixture oracles pin one dataset; these pin the algorithm."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window, functions as F


# ------------------------------------------------------- interval sweep


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_sweep_matches_bruteforce_max_concurrency(spark, intervals):
    ivs = [(s, s + d) for s, d in intervals]
    # brute force: closed intervals — concurrency at each start point
    brute = max(
        sum(1 for s2, e2 in ivs if s2 <= t <= e2) for t, _ in ivs
    )
    df = spark.createDataFrame(ivs, "s int, e int")
    sweep = df.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("x")
    ).select("x.t", "x.delta")
    got = (
        sweep.withColumn(
            "running",
            F.sum("delta").over(
                Window.orderBy(
                    F.col("t").asc(), F.col("delta").desc()
                ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .agg(F.max("running"))
        .collect()[0][0]
    )
    assert got == brute, f"sweep {got} != brute {brute} on {ivs}"


# ------------------------------------------------------- Kaplan-Meier


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lifetimes=st.lists(
        st.integers(min_value=0, max_value=12), min_size=1, max_size=30
    )
)
def test_km_windows_match_direct_product(spark, lifetimes):
    # direct estimator
    n = len(lifetimes)
    expect = {}
    surv = 1.0
    at_risk = n
    for d in sorted(set(lifetimes)):
        deaths = lifetimes.count(d)
        surv *= 1.0 - deaths / at_risk
        expect[d] = round(surv, 9)
        at_risk -= deaths
    df = spark.createDataFrame([(x,) for x in lifetimes], "lt int")
    grouped = df.groupBy("lt").agg(F.count(F.lit(1)).alias("d"))
    w_desc = Window.orderBy(F.col("lt").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("lt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = grouped.withColumn("n_risk", F.sum("d").over(w_desc))
    factor = 1.0 - F.col("d") * 1.0 / F.col("n_risk")
    got = {
        r.lt: round(r.s, 9)
        for r in km.select(
            "lt",
            F.when(F.min(factor).over(w_asc) <= 0, F.lit(0.0))
            .otherwise(
                F.exp(
                    F.sum(
                        F.when(factor > 0, F.log(factor)).otherwise(0.0)
                    ).over(w_asc)
                )
            )
            .alias("s"),
        ).collect()
    }
    for d in expect:
        assert abs(got[d] - expect[d]) < 1e-6, (d, got[d], expect[d], lifetimes)


# ------------------------------------------------------- change point


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=50), min_size=2, max_size=20
    )
)
def test_changepoint_prefix_sums_match_direct(spark, counts):
    n = len(counts)
    total = sum(counts)

    def stat(i):  # split after position i (1-based)
        s = sum(counts[:i])
        ml, mr = s / i, (total - s) / (n - i)
        return abs(ml - mr) * (i * (n - i) / n) ** 0.5

    best_i = max(range(1, n), key=lambda i: (stat(i), -i))
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "day int, cnt int"
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    indexed = df.select(
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
    sp = F.abs(ml - mr) * F.sqrt(
        F.col("i") * (F.col("n") - F.col("i")) * 1.0 / F.col("n")
    )
    got = (
        indexed.filter(F.col("i") < F.col("n"))
        .orderBy(sp.desc(), "day")
        .limit(1)
        .collect()[0]
    )
    assert got.i == best_i, (got.i, best_i, counts)


# ------------------------------------------------------- BFS distances


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=12),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_bfs_frontier_loop_matches_python_bfs(spark, edges):
    from collections import deque

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    expect = {1: 0}
    dq = deque([1])
    while dq:
        u = dq.popleft()
        if expect[u] >= 6:
            continue
        for v in adj.get(u, ()):  # directed
            if v not in expect:
                expect[v] = expect[u] + 1
                dq.append(v)
    e = spark.createDataFrame(edges, "src int, dst int").distinct()
    dist = spark.createDataFrame([(1, 0)], "node int, hops int")
    frontier = dist
    for hop in range(1, 7):
        nxt = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)
        frontier = nxt
    got = {r.node: r.hops for r in dist.collect()}
    assert got == expect, (got, expect, edges)
