"""Recall audits for the approximate operators against their exact twins —
the test discipline that makes rows-only queries trustworthy."""

from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

from tests.conftest import SF_SMALL

REGISTRY = load_all_operators()


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


@pytest.fixture(scope="module")
def exact_topk(spark):
    return _topk_sets(REGISTRY["n3_topk_cosine"].fn(spark, SF_SMALL))


@pytest.mark.parametrize("name,min_recall", [("n3b_lsh_ann", 0.3), ("n3c_ivf_ann", 0.3)])
def test_ann_recall_vs_exact(spark, exact_topk, name, min_recall):
    approx = _topk_sets(REGISTRY[name].fn(spark, SF_SMALL))
    recalls = []
    for q, exact in exact_topk.items():
        got = approx.get(q, set())
        recalls.append(len(got & exact) / len(exact))
        # every returned sim must be a real neighbor (ids exist, no self)
        assert q not in got
    avg = sum(recalls) / len(recalls)
    assert avg >= min_recall, f"{name} avg recall {avg:.2f} < {min_recall}"


def test_minhash_recalls_all_exact_pairs(spark):
    exact = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["n2b_ngram_jaccard_pairs"].fn(spark, SF_SMALL).collect()
    }
    mh = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["n2c_minhash_lsh_neardup"].fn(spark, SF_SMALL).collect()
    }
    assert exact <= mh or len(exact - mh) / max(len(exact), 1) <= 0.1


def test_simhash_recalls_most_exact_pairs(spark):
    """SimHash at hamming<=6 approximates jaccard via cosine of term
    vectors — banding only guarantees collisions for hamming<=3, so assert
    high (not perfect) recall of the exact jaccard>=0.8 pairs."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["n2b_ngram_jaccard_pairs"].fn(spark, SF_SMALL).collect()
    }
    sh = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["n2d_simhash_neardup"].fn(spark, SF_SMALL).collect()
    }
    assert len(exact - sh) / max(len(exact), 1) <= 0.15


def test_approx_distinct_error_bound(spark):
    from pyspark.sql import functions as F

    from iceberg_v2_to_v3_upgrade_spark.io import load_table

    got = {
        r.event_type: r.approx_users
        for r in REGISTRY["n8_approx_distinct_users"].fn(spark, SF_SMALL).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(got[et] - n) <= max(1, 0.05 * n)
