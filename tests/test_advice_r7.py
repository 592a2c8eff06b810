"""Round-7 advisor-finding regressions (ADVICE.md round 6).

1. The table-level SELECT gate must not over-match sibling tables that
   share a name prefix: a principal granted SELECT on `orders_items`
   only must be able to read it even though `orders` (ungranted) is a
   prefix — the old `(\\b|_)` continuation gated `orders` on the
   `orders_items` reference. Known view suffixes (`_files`, `_v3`, ...)
   still count as spellings of the base table.
2. Double-quoted string literals are blanked before gate matching, like
   single-quoted ones — Spark SQL treats both as literals by default.
3. SemDeDup centroid re-normalization rounds half AWAY from zero on the
   driver, matching Spark F.round / DuckDB round (Python's builtin
   round is banker's).
4. snapshot_table's adopted-by update re-reads source properties under
   a per-source flock: concurrent snapshots of one source never lose
   each other's dependent entry.
5. The session-view / changelog-view registry caches key on the OPEN
   fd's (inode, mtime), so content swapped in by a concurrent
   os.replace is never cached under the old key.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from iceberg_v2_to_v3_upgrade_spark.operators.analytics16 import (
    _round_half_up,
)
from iceberg_v2_to_v3_upgrade_spark.sql_router import (
    EngineSQL,
    PermissionDenied,
)
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

ROLE = "arn:aws:iam::123456789012:role/engineer"
LIMITED = "arn:aws:iam::123456789012:role/limited"


@pytest.fixture()
def catalog(spark, tmp_path):
    return LocalCatalog(spark, str(tmp_path / "wh"))


def _mk_sibling_tables(catalog):
    sql = EngineSQL(catalog, principal=ROLE)
    sql.execute(
        "CREATE TABLE glue_catalog.shop.orders (id BIGINT, v STRING)"
        " USING iceberg;"
        "INSERT INTO glue_catalog.shop.orders VALUES (1, 'a');"
        "CREATE TABLE glue_catalog.shop.orders_items (id BIGINT, qty BIGINT)"
        " USING iceberg;"
        "INSERT INTO glue_catalog.shop.orders_items VALUES (1, 3)"
    )
    return sql


# ------------------------------------------- 1. sibling-prefix over-match


def test_select_gate_does_not_gate_prefix_sibling(catalog):
    _mk_sibling_tables(catalog)
    catalog.permissions.grant_table_permissions(
        LIMITED, "shop", "orders_items", ["SELECT"]
    )
    catalog.permissions.enable_enforcement()
    limited = EngineSQL(catalog, principal=LIMITED)
    # granted only orders_items; the statement references ONLY it — the
    # old gate matched `shop.orders` + `_` and spuriously denied
    res = limited.execute_one(
        "SELECT count(*) AS n FROM shop.orders_items"
    )
    assert res.df.collect()[0].n == 1
    # the ungranted base table itself is still denied
    with pytest.raises(PermissionDenied):
        limited.execute_one("SELECT * FROM shop.orders")


def test_select_gate_still_gates_metadata_view_spellings(catalog):
    _mk_sibling_tables(catalog)
    catalog.permissions.grant_table_permissions(
        LIMITED, "shop", "orders_items", ["SELECT"]
    )
    catalog.permissions.enable_enforcement()
    limited = EngineSQL(catalog, principal=LIMITED)
    # the registered view spelling of the UNGRANTED table's metadata
    # view still gates like the dotted spelling
    with pytest.raises(PermissionDenied):
        limited.execute_one("SELECT * FROM shop_orders_files")


# ----------------------------------------- 2. double-quoted literal blank


def test_double_quoted_literal_not_a_spurious_deny(catalog):
    _mk_sibling_tables(catalog)
    catalog.permissions.grant_table_permissions(
        LIMITED, "shop", "orders_items", ["SELECT"]
    )
    catalog.permissions.enable_enforcement()
    limited = EngineSQL(catalog, principal=LIMITED)
    res = limited.execute_one(
        'SELECT id, "migrated from shop.orders" AS note'
        " FROM shop.orders_items"
    )
    assert res.df.collect()[0].note == "migrated from shop.orders"


# ------------------------------------------------- 3. half-up rounding


def test_round_half_up_matches_engines_not_bankers():
    # banker's would give 0.12 for both; engines give 0.12 / 0.13
    assert _round_half_up(0.125, 2) == 0.13
    assert _round_half_up(-0.125, 2) == -0.13  # away from zero
    assert _round_half_up(0.135, 2) == 0.14
    # sanity vs Python's builtin on the boundary case it gets "wrong"
    assert round(0.135, 2) != 0.14 or _round_half_up(0.135, 2) == round(
        0.135, 2
    )


def test_round_half_up_agrees_with_spark_round(spark):
    from pyspark.sql import functions as F

    vals = [0.125, -0.125, 1.0055, -1.0055, 2.5, -2.5, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r.r
        for r in df.select(F.round("x", 2).alias("r"))
        .orderBy(F.monotonically_increasing_id())
        .collect()
    ]
    assert got == [_round_half_up(v, 2) for v in vals]


# --------------------------------------- 4. concurrent adopted-by update


def test_concurrent_snapshot_table_never_loses_adopted_by(catalog):
    t = catalog.create_table("adv", "src", "id int, v string")
    t.insert_values([(1, "a"), (2, "b")])
    errs = []

    def snap(i):
        try:
            # separate catalog instance = separate process stand-in
            cat = LocalCatalog(catalog.spark, catalog.warehouse)
            cat.snapshot_table("adv", "src", "adv", f"snap{i}")
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=snap, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    src = catalog.load_table("adv", "src")
    deps = set(
        d
        for d in src.properties.get("snapshot.adopted-by", "").split(",")
        if d
    )
    assert deps == {f"adv.snap{i}" for i in range(4)}
    assert src.properties.get("gc.enabled") == "false"


# ------------------------------------------- 5. open-then-fstat cache key


def test_view_registry_cache_keys_on_open_inode(catalog):
    path = catalog._session_views_path
    os.makedirs(os.path.dirname(path), exist_ok=True)

    def write(views):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(views, f)
        os.replace(tmp, path)

    write({"v1": "SELECT 1"})
    assert catalog.views == {"v1": "SELECT 1"}
    # os.replace swaps in a NEW inode: the cache must notice even if the
    # mtime were identical, because the key includes st_ino of the fd
    # that was actually read
    write({"v2": "SELECT 2"})
    assert catalog.views == {"v2": "SELECT 2"}
    key1 = catalog._sv_cache[0]
    write({"v3": "SELECT 3"})
    assert catalog.views == {"v3": "SELECT 3"}
    assert catalog._sv_cache[0] != key1
