"""Round-11 optimization invariants.

Each optimization that changed an operator's internals gets a focused
equivalence test here: the size-gated driver BFS (n87), the gated
repartition helper, and the row-slabbed cluster gram kernels.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bfs_driver_path_matches_distributed(spark):
    """_bfs_hop_counts: the size-gated driver BFS and the stats-forced
    distributed frontier loop must return identical hop histograms on
    graphs with cycles, unreachable nodes, self-loops and duplicate
    edges."""
    from iceberg_v2_to_v3_upgrade_spark.operators.analytics6 import (
        _bfs_hop_counts,
    )

    edge_sets = [
        # chain + branch + cycle back to source
        [(1, 2), (2, 3), (3, 4), (2, 5), (5, 1)],
        # self-loop on source, duplicate edges, unreachable island
        [(1, 1), (1, 2), (1, 2), (8, 9)],
        # deeper than the 6-hop cap
        [(i, i + 1) for i in range(1, 12)],
    ]
    for edges in edge_sets:
        df = spark.createDataFrame(edges, "src long, dst long")
        fast = _bfs_hop_counts(df)
        stats: dict = {}
        dist = _bfs_hop_counts(df, stats=stats)
        assert fast == dist, (edges, fast, dist)
        assert stats["rounds"] >= 1
        # capped at 6 hops in both paths
        assert all(h <= 6 for h, _n in fast)


def test_ensure_wide_gates_on_partition_count(spark):
    """_ensure_wide must add an exchange ONLY for narrow inputs: a
    frame already at defaultParallelism partitions passes through
    unchanged (same plan object), a 1-partition frame is widened."""
    from iceberg_v2_to_v3_upgrade_spark.operators.dedup import (
        _ensure_wide,
    )

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    widened = _ensure_wide(narrow)
    assert widened.rdd.getNumPartitions() == par
    wide = spark.range(1000).repartition(par)
    assert _ensure_wide(wide) is wide  # no-op, no new plan node


def test_slabbed_cluster_gram_matches_unslabbed(spark):
    """The ~64 MB row-slab rewrite of the n113/n114 cluster kernels
    must be bit-identical to the whole-matrix per-dimension fold (the
    r10 pinned form) — slabbing only changes ALLOCATION, never the
    per-entry op sequence."""
    import numpy as np

    rng = np.random.default_rng(7)
    M = rng.normal(size=(37, 16))
    ids = np.arange(37, dtype=np.int64)
    tau = 0.1
    # reference: whole-matrix fold (the pre-r11 kernel body)
    acc_ref = np.zeros((37, 37))
    for i in range(M.shape[1]):
        col = M[:, i]
        acc_ref = acc_ref + col[:, None] * col[None, :]
    dup_ref = (
        (acc_ref >= tau) & (ids[:, None] < ids[None, :])
    ).any(axis=0)
    # slabbed form with a tiny slab so several slabs occur
    n = len(ids)
    dup = np.zeros(n, dtype=bool)
    for s0 in range(0, n, 5):
        rs = slice(s0, min(s0 + 5, n))
        acc = np.zeros((rs.stop - s0, n))
        for i in range(M.shape[1]):
            col = M[:, i]
            acc = acc + col[rs, None] * col[None, :]
        assert (acc == acc_ref[rs]).all()  # bitwise, not approx
        dup |= ((acc >= tau) & (ids[rs, None] < ids[None, :])).any(
            axis=0
        )
    assert (dup == dup_ref).all()


def test_star_components_selfloop_guard_single_collect(spark):
    """Self-loop nodes ride the SAME guarded collect as real edges
    (round-10 ADVICE): labels unchanged, including self-loop-only
    singletons."""
    from iceberg_v2_to_v3_upgrade_spark.operators.dedup import (
        _star_components,
    )

    df = spark.createDataFrame(
        [(7, 7), (7, 9), (4, 4)], "a BIGINT, b BIGINT"
    )
    got = {
        (r["id"], r["label"]) for r in _star_components(df).collect()
    }
    assert got == {(7, 7), (9, 7), (4, 4)}


def test_h18_gate_matches_trimall_whitespace(spark):
    """The widened [\\x00-\\x20] gate must agree with bare try_cast on
    control-char-padded values (UTF8String.trimAll strips <= 0x20,
    which Java \\s does not cover)."""
    vals = [
        "5",
        " 5 ",
        "\t7\n",
        "5\x00",
        "\x0b8\x1f",
        "9x",
        "",
        "  ",
        "+3",
        "-4",
        "99999999999999999999",  # overflow: ambiguous, try_cast path
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    gated = df.selectExpr(
        "s",
        "CASE WHEN (s) RLIKE '^[\\\\x00-\\\\x20]*[+-]?[0-9]+[\\\\x00-\\\\x20]*$' "
        "THEN try_cast((s) as int) END AS g",
        "try_cast(s as int) AS t",
    ).collect()
    for r in gated:
        assert r["g"] == r["t"], (repr(r["s"]), r["g"], r["t"])
