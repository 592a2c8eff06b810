"""Round-8 item 1: adaptive-k SemDeDup (k = max(8, ceil(n/250))).

The driver-gate corpora never exceed 2000 vectors, so the floor keeps
k = 8 there and CORRECTNESS rows can't tell adaptive from fixed. These
tests push n past the floor (2100 vectors -> k = 9) and assert the
Spark plan and the DuckDB oracle still agree bit-for-bit — i.e. the
adaptive formula, the row_number-filtered seed list, and the kval CTE
are the SAME function of n on both engines.
"""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from iceberg_v2_to_v3_upgrade_spark.operators.analytics16 import (
    _SEMDEDUP_ORACLE,
    _adaptive_k,
    n113_semdedup_cluster_prune,
)


def test_adaptive_k_formula():
    # floor region
    assert _adaptive_k(0) == 8
    assert _adaptive_k(1) == 8
    assert _adaptive_k(2000) == 8  # ceil(2000/250) = 8 == floor
    # above the floor: exact integer ceil
    assert _adaptive_k(2001) == 9
    assert _adaptive_k(2250) == 9
    assert _adaptive_k(2251) == 10
    assert _adaptive_k(1_000_000) == 4000


def test_adaptive_k_matches_sql_formula():
    """The SQL twin (GREATEST(8, (n + 249) // 250)) must be the same
    function — evaluate it in DuckDB for a sweep of n."""
    con = duckdb.connect()
    for n in (0, 1, 7, 250, 1999, 2000, 2001, 2250, 2251, 12345):
        got = con.execute(
            f"SELECT GREATEST(8, ({n} + 249) // 250)"
        ).fetchone()[0]
        assert got == _adaptive_k(n), n
    con.close()


def _write_embeddings(path: str, rows):
    os.makedirs(path, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))


def test_semdedup_above_floor_matches_oracle(spark, tmp_path):
    # 2100 vectors -> k = ceil(2100/250) = 9 > floor: the adaptive path
    # (Spark count()+limit(k) vs oracle kval CTE) is actually exercised
    n = 2100
    rows = []
    for i in range(n):
        a = (i * 0.7) % math.pi
        b = (i * 1.3) % math.pi
        rows.append(
            (
                i,
                [
                    math.cos(a),
                    math.sin(a) * math.cos(b),
                    math.sin(a) * math.sin(b),
                    0.1 * (i % 5),
                ],
            )
        )
    sf = str(tmp_path / "sf")
    _write_embeddings(sf, rows)

    got = sorted(
        tuple(r) for r in n113_semdedup_cluster_prune(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(sf, 'embeddings.parquet')}'"
    )
    want = sorted(tuple(r) for r in con.execute(_SEMDEDUP_ORACLE).fetchall())
    con.close()
    assert got == want
    # and the fixture really did leave the floor: 9 seed labels existed
    labels = {r[0] for r in got}
    assert max(labels) == 8 and len(labels) >= 2, labels
