"""Property tests for the round-4 batch-B math: the DECLARED n108
(MaxSim late interaction) and n109 (Wasserstein-1 length drift) query
functions against brute-force Python on RANDOM parquet inputs written
to a tmp sf_dir — the fixture oracles pin one dataset; these pin the
algorithm on arbitrary data."""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

_BUCKET_W = 32  # keep in sync with operators/analytics14.py


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmpdir, f"{name}.parquet"))


# ------------------------------------------------------------- n109 EMD


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=400),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_emd_matches_bruteforce(spark, tmp_path_factory, docs):
    tmpdir = str(tmp_path_factory.mktemp("emd_sf"))
    _write(
        spark,
        tmpdir,
        "documents",
        [(s, n) for s, n in docs],
        "source string, n_chars long",
    )
    reg = load_all_operators()
    got = {
        r.source: (r.n_docs, r.emd_buckets)
        for r in reg["n109_length_emd_drift"].fn(spark, tmpdir).collect()
    }

    # brute force: CDF over the distinct observed buckets, exact ints
    buckets = sorted({n // _BUCKET_W for _, n in docs})
    tot_c = len(docs)
    corpus_counts = {
        b: sum(1 for _, n in docs if n // _BUCKET_W == b) for b in buckets
    }
    for src in {s for s, _ in docs}:
        mine = [n for s, n in docs if s == src]
        tot_s = len(mine)
        cum_s = cum_c = 0
        num = 0
        for b in buckets:
            cum_s += sum(1 for n in mine if n // _BUCKET_W == b)
            cum_c += corpus_counts[b]
            num += abs(cum_s * tot_c - cum_c * tot_s)
        emd = num / (tot_s * tot_c)
        assert got[src][0] == tot_s
        assert abs(got[src][1] - round(emd, 6)) <= 1e-9, (
            f"{src}: spark {got[src][1]} != brute {emd} on {docs}"
        )


# ---------------------------------------------------------- n108 MaxSim


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.tuples(
            st.tuples(  # first component >= 1 keeps every norm positive
                st.integers(min_value=1, max_value=4),
                st.integers(min_value=-4, max_value=4),
                st.integers(min_value=-4, max_value=4),
                st.integers(min_value=-4, max_value=4),
            ),
            st.integers(min_value=0, max_value=5),  # label
        ),
        min_size=3,
        max_size=30,
    )
)
def test_maxsim_is_valid_topk(spark, tmp_path_factory, vecs):
    tmpdir = str(tmp_path_factory.mktemp("maxsim_sf"))
    _write(
        spark,
        tmpdir,
        "embeddings",
        [
            (i, [float(x) for x in v], lbl)
            for i, (v, lbl) in enumerate(vecs)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    reg = load_all_operators()
    rows = reg["n108_maxsim_multivector"].fn(spark, tmpdir).collect()

    queries = [[float(x) for x in v] for v, _ in vecs[:3]]
    labels = {lbl for _, lbl in vecs}
    brute = {}
    for lbl in labels:
        members = [[float(x) for x in v] for v, l2 in vecs if l2 == lbl]
        brute[lbl] = sum(
            max(_cos(q, m) for m in members) for q in queries
        )
    # (a) every returned label's score matches brute within float slack
    for r in rows:
        assert abs(r.maxsim_score - brute[r.label]) <= 2e-4, (
            f"label {r.label}: spark {r.maxsim_score} != "
            f"brute {brute[r.label]}"
        )
        assert r.n_query_tokens == 3
    # (b) the returned set is a valid top-5 up to near-tie tolerance
    k = min(5, len(labels))
    assert len(rows) == k
    returned = {r.label for r in rows}
    excluded_best = max(
        (v for l2, v in brute.items() if l2 not in returned), default=-1e9
    )
    assert min(brute[lbl] for lbl in returned) >= excluded_best - 3e-4
