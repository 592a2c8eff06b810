"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join handling covers joins; a groupBy on a pathologically hot
key (one key = 30% of 100 TB) still funnels that key's rows into one
reducer. Salting splits each key into ``salt`` sub-keys, partially
aggregates, then merges — turning one hot reducer into ``salt`` even ones.

Only algebraic (mergeable) aggregates are supported, which is exactly the
set that benefits: sum / count / min / max (and avg as sum+count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """``aggs`` maps output column -> (input column, fn) with fn in
    sum|count|min|max. Returns exactly what
    ``df.groupBy(keys).agg(...)`` returns, via two shuffles neither of
    which has a hot partition.
    """
    for out, (_, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{out}: non-mergeable aggregate {fn!r}")
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[fn](col).alias(f"_p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"_p_{out}").alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when AQE's skew splitting can't help (e.g.
    the dim side is too big to broadcast but small enough to replicate
    ``salt``-fold, and one fact key dominates).

    Fact rows get a random salt in [0, salt); the dim side is exploded
    ``salt``-fold so every (key, salt) bucket finds its match. The hot
    key's rows spread across ``salt`` reducers instead of one. Supports
    inner and left joins (dim replicated, never filtered).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    replicated_dim = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    out = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return out.drop("_salt")
