"""Partition evolution: metadata-only spec change; old dirs keep their
layout, new writes use the new spec, scans/DML/pruning stay correct across
mixed layouts, and rewrite_data_files migrates to the current spec."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from iceberg_v2_to_v3_upgrade_spark.tables.table import LocalTable


def _dir_layouts(root):
    """{snap dir name: sorted partition-key names in its layout}."""
    out = {}
    for d in sorted(glob.glob(os.path.join(root, "data", "snap-*"))):
        keys = {
            seg.split("=", 1)[0]
            for p in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
            for seg in os.path.relpath(p, d).split(os.sep)[:-1]
            if "=" in seg
        }
        out[os.path.basename(d)] = sorted(keys)
    return out


@pytest.fixture()
def evo_table(spark, tmp_path):
    t = LocalTable.create(
        spark,
        str(tmp_path / "t"),
        "k BIGINT, brand STRING, price DOUBLE",
        partition_by=["brand"],
    )
    t.insert(
        spark.range(10).selectExpr(
            "id AS k", "concat('b', id % 3) AS brand", "CAST(id AS DOUBLE) AS price"
        )
    )
    t.evolve_partition_spec(["bucket(4, k)"])
    t.insert(
        spark.range(10, 20).selectExpr(
            "id AS k", "concat('b', id % 3) AS brand", "CAST(id AS DOUBLE) AS price"
        )
    )
    return t


def test_spec_change_is_metadata_only(evo_table):
    layouts = _dir_layouts(evo_table.root)
    assert layouts["snap-00002"] == ["brand"]  # old dir untouched
    assert layouts["snap-00003"] == ["k_bucket"]  # new write, new spec
    assert evo_table.partition_by == ["bucket(4, k)"]
    log = evo_table.partition_spec_log
    assert [e["spec_id"] for e in log] == [0, 1]
    assert log[1]["partition_by"] == ["bucket(4, k)"]


def test_scan_unions_both_layouts(evo_table):
    rows = evo_table.scan().orderBy("k").collect()
    assert [r.k for r in rows] == list(range(20))
    # identity partition col of the OLD spec round-trips from dir names
    assert all(r.brand == f"b{r.k % 3}" for r in rows)


def test_partition_filter_scoped_to_covering_spec(evo_table):
    # bucket col exists only in the new spec: old-dir rows must pass
    # through UNFILTERED (conservative), new-dir rows prune by bucket.
    got = evo_table.scan(partition_filter="k_bucket = '1'")
    full = evo_table.scan()
    new_side = full.filter("k >= 10").withColumn(
        "b", F.pmod(F.xxhash64("k"), F.lit(4)).cast("int")
    )
    expect = 10 + new_side.filter("b = 1").count()
    assert got.count() == expect


def test_identity_filter_applies_everywhere(evo_table):
    got = evo_table.scan(partition_filter="brand = 'b0'").count()
    assert got == evo_table.scan().filter("brand = 'b0'").count()


def test_delete_spans_layouts(evo_table):
    evo_table.delete_where("k IN (3, 13)")
    rows = {r.k for r in evo_table.scan().collect()}
    assert rows == set(range(20)) - {3, 13}


def test_rewrite_migrates_to_current_spec(evo_table):
    evo_table.rewrite_data_files()
    snap = evo_table.current_snapshot()
    layouts = _dir_layouts(evo_table.root)
    for d in snap.data_dirs:
        assert layouts[os.path.basename(d)] == ["k_bucket"]
    assert evo_table.scan().count() == 20


def test_single_spec_tables_unaffected(spark, tmp_path):
    # pre-evolution metadata (no partition_spec_log key) must read fine
    t = LocalTable.create(
        spark, str(tmp_path / "u"), "k BIGINT, v STRING", partition_by=["v"]
    )
    t._meta.pop("partition_spec_log", None)
    t._write_meta()
    t = LocalTable(spark, t.root)
    t.insert(spark.range(6).selectExpr("id AS k", "concat('v', id % 2) AS v"))
    assert t.partition_spec_log == [
        {"spec_id": 0, "seq": 0, "partition_by": ["v"]}
    ]
    assert t.scan(partition_filter="v = 'v1'").count() == 3


def test_evolve_validates_spec(evo_table):
    import pytest as _pytest

    from iceberg_v2_to_v3_upgrade_spark.tables.table import TableError

    with _pytest.raises(TableError, match="unknown column"):
        evo_table.evolve_partition_spec(["bucket(4, no_such_col)"])
    with _pytest.raises(TableError, match="duplicate partition field"):
        evo_table.evolve_partition_spec(["brand", "brand"])
    # same dir-column name from two transforms of the same source col
    with _pytest.raises(TableError, match="duplicate partition field"):
        evo_table.evolve_partition_spec(["bucket(4, k)", "bucket(8, k)"])


def test_same_name_different_transform_not_covered(evo_table, spark):
    # bucket(4,k) -> bucket(8,k): both derive 'k_bucket', but the VALUES
    # differ — the filter must NOT apply to the bucket(4) dir (conservative
    # pass-through), else rows whose bucket4 != bucket8 silently vanish
    evo_table.evolve_partition_spec(["bucket(8, k)"])
    evo_table.insert(
        spark.range(20, 30).selectExpr(
            "id AS k", "concat('b', id % 3) AS brand",
            "CAST(id AS DOUBLE) AS price"
        )
    )
    from pyspark.sql import functions as F

    full = evo_table.scan()
    b8 = full.filter("k >= 20").withColumn(
        "b", F.pmod(F.xxhash64("k"), F.lit(8)).cast("int")
    )
    expect = 20 + b8.filter("b = 1").count()  # 10 identity + 10 bucket4 rows pass through
    got = evo_table.scan(partition_filter="k_bucket = '1'").count()
    assert got == expect


def test_partitions_metadata_spec_aware(evo_table):
    parts = evo_table.partitions().collect()
    # both layouts reported under their OWN spec ids, no phantom blank row
    by_spec = {}
    for r in parts:
        by_spec.setdefault(r.spec_id, []).append(r)
    assert set(by_spec) == {0, 1}
    # spec 0: identity brand dirs (b0/b1/b2), 10 rows total
    s0 = {r.brand: r.record_count for r in by_spec[0]}
    assert sum(s0.values()) == 10 and set(s0) == {"b0", "b1", "b2"}
    assert all(r.k_bucket == "" for r in by_spec[0])
    # spec 1: bucket dirs carry the other 10 rows
    assert sum(r.record_count for r in by_spec[1]) == 10
    assert all(r.brand == "" for r in by_spec[1])
    # file stats attached to every row that has files
    assert all(r.file_count > 0 for r in parts)


def test_evolve_requires_transform_width(evo_table):
    import pytest as _pytest

    from iceberg_v2_to_v3_upgrade_spark.tables.table import TableError

    with _pytest.raises(TableError, match="width"):
        evo_table.evolve_partition_spec(["bucket(k)"])
    with _pytest.raises(TableError, match="width"):
        evo_table.evolve_partition_spec(["truncate(brand)"])


def test_partitions_empty_multi_spec_table(spark, tmp_path):
    t = LocalTable.create(
        spark, str(tmp_path / "e"), "k BIGINT, v STRING", partition_by=["v"]
    )
    t.evolve_partition_spec(["bucket(4, k)"])
    assert t.partitions().count() == 0  # no data dirs: empty, not a crash


def test_partitions_multi_spec_applies_mor_deletes(evo_table):
    # delete rows across both layouts: record counts must equal scan()
    evo_table.delete_where("k IN (0, 1, 12, 13)")
    parts = evo_table.partitions()
    total = parts.agg({"record_count": "sum"}).collect()[0][0]
    assert total == evo_table.scan().count() == 16


def test_short_text_shingles_are_empty(spark):
    from pyspark.sql import functions as F

    from iceberg_v2_to_v3_upgrade_spark.functions.hashing import word_shingles

    df = spark.createDataFrame(
        [("a b",), ("one two three four",)], "text string"
    )
    got = df.select(F.size(word_shingles(F.col("text"), 3)).alias("n")).collect()
    assert sorted(r.n for r in got) == [0, 2]
