from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.sources.formats import (
    read_table,
    to_json_rows,
    write_table,
)

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF_SMALL, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip(spark, nation, tmp_path, fmt):
    path = str(tmp_path / f"out_{fmt}")
    write_table(nation, path, fmt)
    back = read_table(
        spark,
        path,
        fmt,
        schema=nation.schema if fmt in ("csv", "json") else None,
    )
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_partitioned_write_prunes(spark, tmp_path):
    import os

    part = load_table(spark, SF_SMALL, "part")
    path = str(tmp_path / "part_by_brand")
    write_table(part, path, "parquet", partition_by=["p_brand"])
    assert any(d.startswith("p_brand=") for d in os.listdir(path))
    back = read_table(spark, path)
    one = back.filter("p_brand = 'Brand#1'")
    # partition pruning: the scan's file listing must be brand-filtered
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == part.filter("p_brand = 'Brand#1'").count()
    assert "PartitionFilters" in plan


def test_schema_required_for_text_formats(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, str(tmp_path), "csv")
    with pytest.raises(ValueError, match="unsupported"):
        read_table(spark, str(tmp_path), "avro")


def test_json_result_sink(spark, nation):
    rows = to_json_rows(nation.orderBy("n_nationkey"), limit=3)
    assert len(rows) == 3
    assert rows[0]["n_nationkey"] == 0
    assert set(rows[0]) == {"n_nationkey", "n_name", "n_regionkey"}
