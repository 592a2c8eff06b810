"""Plan pins for the round-5 analytics batch: the chunker must stay
map-only (its 100 TB posture is 'zero shuffles'), the sequence miner
must partial-aggregate before its one exchange, the padding audit must
not join documents back to itself, and k13's final adaptive plan must
actually show coalesced shuffle reads."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def registry():
    return load_all_operators()


def plan(spark, registry, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        registry[name].fn(spark, SF_SMALL).explain("formatted")
    return buf.getvalue()


def test_doc_chunking_is_map_only(spark, registry):
    # n110's scale claim: split -> sequence -> explode with NO shuffle
    # and no Python — any Exchange here breaks the 100 TB posture
    p = plan(spark, registry, "n110_doc_chunking")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_sequence_mining_partial_aggregates(spark, registry):
    # one user-keyed window shuffle + a count that partial-aggregates
    # before its exchange; never a sort-merge join
    p = plan(spark, registry, "n111_event_sequence_mining")
    assert "SortMergeJoin" not in p
    assert p.count("HashAggregate") >= 2


def test_padding_waste_reads_lengths_only(spark, registry):
    # the audit works on token LENGTHS — the doc text must be read once
    # for the length projection and the plan must not self-join
    p = plan(spark, registry, "n112_padding_waste_batching")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_aqe_coalesces_small_shuffle(spark, registry):
    # k13 executes its aggregate and asserts `AQEShuffleRead ...
    # coalesced` on ITS OWN executed plan, raising otherwise (the
    # returned frame is the already-collected result, so re-explaining
    # it here would show only an ExistingRDD scan) — running it IS the
    # pin; this test guards that the in-query gate keeps firing
    assert (
        registry["k13_aqe_partition_coalescing"].fn(spark, SF_SMALL).count()
        > 0
    )
