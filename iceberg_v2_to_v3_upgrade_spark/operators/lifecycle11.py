"""Round-9 driver-gate conversion: the combined metadata-integrity arc
(verdict item 9) — the per-commit ADDED-DIRS manifest (SURVEY §2 I+
round-5 row) and the reference's VERIFY 3-PROBE suite (§2 K4 /
``internal/verify_in_databricks.py:57-112``), previously pytest-only.

- Added-dirs: every commit records the data dirs it ADDED vs its
  parent (Iceberg's added-files manifest field); cherry-pick reads its
  delta from that record instead of diffing against earlier-listed
  snapshots — the construction that broke in round 5 once
  ``expire_snapshots`` compacted the earlier history away (the diff
  base emptied and the whole inherited dir list was mistaken for the
  delta). The arc stages an append on a branch, EXPIRES the shared
  ancestry down to heads, then cherry-picks — exactly the
  post-expiry publish that needs the recorded delta.
- 3-probe: DESCRIBE / SELECT * LIMIT 5 / COUNT(*), the fixed suite the
  reference runs in the OTHER engine after the upgrade
  (``verify_in_databricks.py:67,79,102``); here the second engine is
  DuckDB reading the table natively (``tables/duckdb_reader.py``).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_I50_ORACLE = """
    WITH final AS (
        SELECT o_orderkey FROM orders
        WHERE o_orderkey % 2 = 1 AND o_orderkey % 5 <> 0
        UNION ALL
        SELECT o_orderkey FROM orders
        WHERE o_orderkey % 2 = 0 AND o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 500000000 FROM orders
        WHERE o_orderkey % 64 = 0
    ),
    picked AS (
        SELECT CAST(count(*) AS BIGINT) AS v FROM orders
        WHERE o_orderkey % 64 = 0
    ),
    head5 AS (
        SELECT CAST(sum(o_orderkey) AS BIGINT) AS v FROM (
            SELECT o_orderkey FROM final ORDER BY o_orderkey LIMIT 5
        )
    ),
    total AS (SELECT CAST(count(*) AS BIGINT) AS v FROM final),
    report(step, fact, value) AS (
        VALUES
            (1, 'added_dirs_create',       CAST(0 AS BIGINT)),
            (2, 'added_dirs_insert1',      CAST(1 AS BIGINT)),
            (3, 'added_dirs_delete',       CAST(0 AS BIGINT)),
            (4, 'added_dirs_insert2',      CAST(1 AS BIGINT)),
            (5, 'added_dirs_compaction',   CAST(1 AS BIGINT)),
            (6, 'cherrypick_after_expiry', (SELECT v FROM picked)),
            (7, 'probe_describe_cols',     CAST(2 AS BIGINT)),
            (8, 'probe_head5_keysum',      (SELECT v FROM head5)),
            (9, 'probe_count',             (SELECT v FROM total))
    )
    SELECT step, fact, value FROM report ORDER BY step
"""


@declare(
    "i50_metadata_integrity_arc",
    oracle=_I50_ORACLE,
    tags=("lifecycle", "metadata", "cross-engine", "branch"),
)
def i50_metadata_integrity_arc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Added-dirs manifest + verify 3-probe behind the hash gate
    (round-9 verdict #9, closing SURVEY §2 to full driver evidence):

    steps 1-5: for EVERY commit (create / insert / MoR delete / insert
    / full compaction) the recorded ``added_dirs`` must equal the
    recomputed data-dir diff against the parent snapshot — asserted
    in-query, the per-commit count is the returned fact;
    step 6: an append staged on a branch is cherry-picked to main
    AFTER ``expire_snapshots(retain_last=1)`` compacted the shared
    ancestry — the publish must take its delta from the recorded
    added-dirs (the legacy earlier-listed diff base no longer exists)
    and exactly the staged rows appear on main;
    steps 7-9: the reference's fixed verification probes — DESCRIBE,
    ordered-head SELECT (LIMIT 5), COUNT(*) — run in DuckDB reading
    the table natively, no Spark in the read path.
    """
    import datetime

    import duckdb

    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
    from iceberg_v2_to_v3_upgrade_spark.tables.duckdb_reader import (
        duckdb_table_sql,
    )

    warehouse = tempfile.mkdtemp(prefix="mi_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "mi_db", "orders_mi", "o_orderkey BIGINT, o_totalprice DOUBLE"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t.insert(orders.filter("o_orderkey % 2 = 1"))
    t.delete_where("o_orderkey % 5 = 0")
    t.insert(orders.filter("o_orderkey % 2 = 0 AND o_orderkey % 7 = 0"))
    t.rewrite_data_files(rewrite_all=True, delete_file_threshold=1)

    # steps 1-5: recorded added-dirs == recomputed diff vs parent
    snaps = t.snapshots()
    by_id = {s.id: s for s in snaps}
    labels = [
        "added_dirs_create",
        "added_dirs_insert1",
        "added_dirs_delete",
        "added_dirs_insert2",
        "added_dirs_compaction",
    ]
    assert len(snaps) == len(labels), [s.operation for s in snaps]
    rows: list[tuple[int, str, int]] = []
    for step, (s, label) in enumerate(zip(snaps, labels), start=1):
        parent_data = (
            set(by_id[s.parent_id].data_dirs) if s.parent_id else set()
        )
        diff = [d for d in s.data_dirs if d not in parent_data]
        # the CREATE snapshot predates any _commit (no added_dirs
        # field); it owns no data dirs, so its delta is [] by definition
        recorded = s.added_dirs if s.added_dirs is not None else []
        if s.added_dirs is None:
            assert s.operation == "create" and not s.data_dirs, label
        assert sorted(recorded) == sorted(diff), (label, recorded, diff)
        rows.append((step, label, len(recorded)))

    # step 6: stage on a branch, expire the shared ancestry, cherry-pick
    t.create_branch("stage")
    staged = t.insert(
        orders.filter("o_orderkey % 64 = 0").selectExpr(
            "o_orderkey + 500000000 AS o_orderkey", "o_totalprice"
        ),
        branch="stage",
    )
    before = t.scan().count()
    t.expire_snapshots(
        older_than=datetime.datetime(2030, 1, 1), retain_last=1
    )
    t = catalog.load_table("mi_db", "orders_mi")  # reload post-GC
    t.cherrypick_snapshot(staged.id)
    picked = t.scan().count() - before
    rows.append((6, "cherrypick_after_expiry", picked))

    # steps 7-9: the reference's 3-probe suite in the second engine
    sql = duckdb_table_sql(t)
    con = duckdb.connect()
    try:
        cols = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
        rows.append((7, "probe_describe_cols", len(cols)))
        head5 = con.execute(
            f"SELECT CAST(sum(o_orderkey) AS BIGINT) FROM "
            f"(SELECT o_orderkey FROM ({sql}) "
            f"ORDER BY o_orderkey LIMIT 5)"
        ).fetchone()[0]
        rows.append((8, "probe_head5_keysum", int(head5)))
        n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        rows.append((9, "probe_count", int(n)))
    finally:
        con.close()
    return spark.createDataFrame(
        rows, "step int, fact string, value bigint"
    ).orderBy("step")
