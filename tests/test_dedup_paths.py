"""The two exact physical strategies behind n2e_embedding_cosine_neardup
must produce identical pairs — the oracle covers whichever path the
size-guard picks, so path equivalence is the invariant that keeps the
guard safe (VERDICT.md round-1 item 5: no unconditional full-corpus
collect on any data path).
"""

from __future__ import annotations

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.operators.dedup import (
    _NEARDUP_BROADCAST_MAX_ROWS,
    _cosine_neardup_block_grid,
    _cosine_neardup_broadcast_gemm,
)

from tests.conftest import SF_SMALL


def _pairs(df):
    return sorted((r.vec_a, r.vec_b, r.cos_sim) for r in df.collect())


def test_block_grid_matches_broadcast_gemm(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    exact = _pairs(_cosine_neardup_broadcast_gemm(spark, emb))
    assert exact, "fixture should contain near-dup pairs"
    # small block count so every grid-cell shape (diagonal, off-diagonal,
    # smaller-id-in-higher-block) occurs on the tiny fixture
    grid = _pairs(_cosine_neardup_block_grid(spark, emb, n_blocks=4))
    assert grid == exact


def test_block_grid_single_block_degenerate(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    exact = _pairs(_cosine_neardup_broadcast_gemm(spark, emb))
    assert _pairs(_cosine_neardup_block_grid(spark, emb, n_blocks=1)) == exact


def test_broadcast_guard_threshold_is_bounded():
    # the guard must stay a real bound (not float("inf") snuck in later):
    # 500k rows x 64 dims x 8 bytes = 256 MB broadcast, the documented cap
    assert _NEARDUP_BROADCAST_MAX_ROWS <= 1_000_000
