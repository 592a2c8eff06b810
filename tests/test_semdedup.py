"""n113 SemDeDup edge cases the fixture can't hit (round-6 review):

- a SEED cluster can empty out when two seeds are near-identical (all
  points tie toward the lower label) — cluster labels must stay the
  ORIGINAL seed ids, not collapse to list positions, or Spark diverges
  from the oracle;
- an empty corpus returns the oracle's empty result instead of
  crashing on seeds[0].
"""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_v2_to_v3_upgrade_spark.operators.analytics16 import (
    _SEMDEDUP_ORACLE,
    n113_semdedup_cluster_prune,
)


def _write_embeddings(path: str, rows: list[tuple[int, list[float]]]):
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


def _oracle(path: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(path, 'embeddings.parquet')}'"
    )
    return sorted(tuple(r) for r in con.execute(_SEMDEDUP_ORACLE).fetchall())


def test_emptied_seed_cluster_keeps_original_labels(spark, tmp_path):
    # seeds are the 8 smallest vec_ids; vec 0 and vec 1 are identical,
    # so every point ties toward label 0 and seed cluster 1 EMPTIES
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0])]
    for i in range(2, 24):
        a = (i * 0.7) % math.pi
        b = (i * 1.3) % math.pi
        rows.append(
            (i, [math.cos(a), math.sin(a) * math.cos(b),
                 math.sin(a) * math.sin(b), 0.1 * (i % 3)])
        )
    sf = str(tmp_path / "sf")
    _write_embeddings(sf, rows)
    got = sorted(
        tuple(r) for r in n113_semdedup_cluster_prune(spark, sf).collect()
    )
    want = _oracle(sf)
    assert got == want, "cluster labels diverged from the oracle"
    labels = {r[0] for r in got}
    assert 1 not in labels, (
        "test fixture no longer empties seed cluster 1 — rebuild it"
    )
    # the identical pair itself must have been pruned to one survivor
    c0 = next(r for r in got if r[0] == 0)
    assert c0[2] >= 1  # n_dups includes the identical twin


def test_empty_corpus_returns_empty_frame(spark, tmp_path):
    sf = str(tmp_path / "sf_empty")
    _write_embeddings(sf, [])
    out = n113_semdedup_cluster_prune(spark, sf)
    assert out.count() == 0
    assert out.columns == [
        "cluster", "n_docs", "n_dups", "n_survivors", "min_survivor"
    ]
    assert _oracle(sf) == []
