"""Round-8 batch 2 of control-plane -> driver-gate conversions.

After k6/i44/i45 (this round) the remaining tests-only SURVEY §2 rows
were A6 (REST result sink), D3/F3 (result size + client head), H1
(current_timestamp), J4 (DESCRIBE), K2/K3/K5 (session gate / confs /
config), and the cherry-pick-sequence + added-dirs internals. Each gets
a hash-gated query here, following the j1/j7 conversion recipe.

Reference parity: ``internal/verify_in_databricks.py:37-54`` (the
``data_array`` REST sink + LIMIT probes), ``:66-75`` (DESCRIBE),
``internal/upgrade_table.py:59-97`` (session confs shipped with every
statement), ``internal/create_demo_table.py`` (current_timestamp
inserts).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_A6_ORACLE = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


@declare("a6_rest_result_sink", oracle=_A6_ORACLE, tags=("sink", "format"))
def a6_rest_result_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REST ``data_array`` result sink (A6,
    verify_in_databricks.py:37-54) behind the hash gate: a query result
    is serialized through ``to_json_rows`` (the wire format a REST
    consumer receives), round-tripped through an actual
    ``json.dumps``/``loads`` of the payload, and REBUILT into a frame —
    so the gate certifies the serialization preserves values and types,
    not just that the query ran."""
    import json

    from iceberg_v2_to_v3_upgrade_spark.sources.formats import to_json_rows

    top = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )
    wire = json.dumps(to_json_rows(top))  # what would cross the wire
    rows = json.loads(wire)
    return spark.createDataFrame(
        [
            (r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
            for r in rows
        ],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    ).orderBy(F.col("o_totalprice").desc(), "o_orderkey")


_D3_ORACLE = """
    SELECT c_custkey, c_name,
           (SELECT CAST(count(*) AS BIGINT) FROM customer) AS total_rows
    FROM customer ORDER BY c_custkey LIMIT 10
"""


@declare("d3_result_size_head", oracle=_D3_ORACLE, tags=("sink", "limit"))
def d3_result_size_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 (result size) + F3 (client-side head) together: the sink's
    ``limit`` cap takes the ordered head of a larger result (the
    reference's LIMIT probe), while the full result size rides along as
    a column — certifying both the cap and the count it was capped
    from."""
    from iceberg_v2_to_v3_upgrade_spark.sources.formats import to_json_rows

    cust = load_table(spark, sf_dir, "customer")
    total = cust.count()
    head = to_json_rows(
        cust.select("c_custkey", "c_name").orderBy("c_custkey"), limit=10
    )
    assert len(head) == 10, len(head)  # the cap held
    return spark.createDataFrame(
        [(r["c_custkey"], r["c_name"], total) for r in head],
        "c_custkey bigint, c_name string, total_rows bigint",
    ).orderBy("c_custkey")


_H1_ORACLE = """
    SELECT CAST(2 AS BIGINT) AS n_rows, TRUE AS in_window,
           TRUE AS constant_within_stmt
"""


@declare(
    "h26_current_timestamp_insert",
    oracle=_H1_ORACLE,
    tags=("functions", "dml"),
)
def h26_current_timestamp_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``current_timestamp()`` through the gateway's INSERT path (H1,
    create_demo_table.py's created_at column): the value is
    nondeterministic by nature, so the gate pins its CONTRACT instead —
    both inserted rows carry a timestamp inside the statement's wall
    window, and the two rows share ONE timestamp (Spark evaluates
    current_timestamp once per statement, not per row)."""
    import datetime

    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="ts_wh_")
    catalog = LocalCatalog(spark, warehouse)
    catalog.create_table("ts_db", "ts_t", "id BIGINT, created TIMESTAMP")
    router = EngineSQL(catalog)
    before = datetime.datetime.now() - datetime.timedelta(seconds=300)
    router.execute_one(
        "INSERT INTO glue_catalog.ts_db.ts_t VALUES "
        "(1, current_timestamp()), (2, current_timestamp())"
    )
    after = datetime.datetime.now() + datetime.timedelta(seconds=300)
    got = catalog.load_table("ts_db", "ts_t").scan().collect()
    stamps = [r["created"] for r in got]
    return spark.createDataFrame(
        [
            (
                len(got),
                all(before <= s <= after for s in stamps),
                len(set(stamps)) == 1,
            )
        ],
        "n_rows bigint, in_window boolean, constant_within_stmt boolean",
    )


_J4_ORACLE = """
    WITH d(col_name, data_type, comment) AS (
        VALUES ('id', 'bigint', ''),
               ('cat', 'string', ''),
               ('amt', 'decimal(10,2)', ''),
               ('ts', 'timestamp', ''),
               ('cat', '', 'partition')
    )
    SELECT col_name, data_type, comment FROM d
    ORDER BY comment, col_name
"""


@declare("j4_describe_table", oracle=_J4_ORACLE, tags=("catalog", "ddl"))
def j4_describe_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE TABLE through the gateway (J4,
    verify_in_databricks.py:66-75): columns with their types plus the
    partition-information section, hash-gated."""
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="desc_wh_")
    catalog = LocalCatalog(spark, warehouse)
    catalog.create_table(
        "desc_db",
        "typed",
        "id BIGINT, cat STRING, amt DECIMAL(10,2), ts TIMESTAMP",
        partition_by=["cat"],
    )
    res = EngineSQL(catalog).execute_one("DESCRIBE TABLE desc_db.typed")
    assert res.df is not None, res.message
    return res.df.orderBy("comment", "col_name")


_K2_ORACLE = """
    WITH c(item, value) AS (
        VALUES ('config_valid', 'true'),
               ('spark.sql.adaptive.coalescePartitions.enabled', 'true'),
               ('spark.sql.adaptive.enabled', 'true'),
               ('spark.sql.adaptive.skewJoin.enabled', 'true'),
               ('warehouse_ready', 'true')
    )
    SELECT item, value FROM c ORDER BY item
"""


@declare("k15_session_contract", oracle=_K2_ORACLE, tags=("session", "config"))
def k15_session_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session gate + config contract (K2/K3/K5,
    upgrade_table.py:59-97: every statement ships with the same conf
    set): ``apply_runtime_confs`` is applied to the LIVE session and the
    AQE trio read back from it, plus config validation and warehouse
    readiness — the facts the reference's entry point checks before any
    SQL is sent."""
    import os

    from iceberg_v2_to_v3_upgrade_spark.config import (
        load_config,
        validate_config,
    )
    from iceberg_v2_to_v3_upgrade_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    rows = [
        (k, spark.conf.get(k))
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    ]
    cfg = load_config()
    rows.append(("config_valid", str(not validate_config(cfg)).lower()))
    os.makedirs(cfg.warehouse, exist_ok=True)
    rows.append(
        (
            "warehouse_ready",
            str(
                os.path.isdir(cfg.warehouse)
                and os.access(cfg.warehouse, os.W_OK)
            ).lower(),
        )
    )
    return spark.createDataFrame(
        rows, "item string, value string"
    ).orderBy("item")


_J5_ORACLE = """
    WITH f(step, detail) AS (
        VALUES ('create_new', 'true'),
               ('create_idempotent', 'false'),
               ('listed', 'true'),
               ('table_under_root', 'true'),
               ('drop_nonempty_refused', 'true'),
               ('drop_cascade', 'true'),
               ('gone', 'true')
    )
    SELECT step, detail FROM f ORDER BY step
"""


@declare(
    "j5_database_lifecycle", oracle=_J5_ORACLE, tags=("catalog", "ddl")
)
def j5_database_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Database create / storage-root / drop lifecycle (J5/J6 — the
    reference creates the Glue database with a storage location before
    any table work): create is True-new then False-idempotent, the db
    lists, a table lands UNDER the database's storage root, dropping a
    NON-empty db without cascade refuses, cascade drops everything."""
    import os

    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="dbcycle_wh_")
    catalog = LocalCatalog(spark, warehouse)
    facts = {}
    facts["create_new"] = catalog.create_database("life_db")
    facts["create_idempotent"] = catalog.create_database("life_db")
    facts["listed"] = "life_db" in catalog.list_databases()
    t = catalog.create_table("life_db", "t1", "id BIGINT")
    facts["table_under_root"] = t.root.startswith(
        os.path.join(warehouse, "life_db")
    )
    try:
        catalog.drop_database("life_db")
        facts["drop_nonempty_refused"] = False
    except Exception:  # noqa: BLE001 — the refusal contract
        facts["drop_nonempty_refused"] = True
    catalog.drop_database("life_db", cascade=True)
    facts["drop_cascade"] = "life_db" not in catalog.list_databases()
    facts["gone"] = not os.path.exists(os.path.join(warehouse, "life_db"))
    return spark.createDataFrame(
        sorted((k, str(v).lower()) for k, v in facts.items()),
        "step string, detail string",
    )


_I46_ORACLE = """
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 2000
    UNION ALL
    SELECT o_orderkey + 1000000, o_totalprice FROM orders
    WHERE o_orderkey % 5 = 0
    ORDER BY o_orderkey, o_totalprice
"""


@declare(
    "i46_cherrypick_seq_scoping",
    oracle=_I46_ORACLE,
    tags=("lifecycle", "wap", "branch"),
)
def i46_cherrypick_seq_scoping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cherry-pick sequence scoping end-to-end (the round-4 tests-only
    internals row): an append is STAGED on a WAP branch; main then
    commits a positional DELETE (``o_totalprice < 2000``);
    ``cherrypick_snapshot`` publishes the staged append afterwards.
    Iceberg assigns cherry-picked files the PUBLISH snapshot's sequence
    number, so the earlier delete must NOT mask the picked rows — even
    the ones matching its predicate. The in-query assert pins exactly
    that; the frame is the final scan. Also exercises the per-commit
    ``added_dirs`` field (the picked delta is resolved from it)."""
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="cherry_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "wap_db", "orders_cp", "o_orderkey BIGINT, o_totalprice DOUBLE"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t.insert(orders)
    t.create_branch("wap")
    staged = t.insert(
        orders.filter(F.col("o_orderkey") % 5 == 0).select(
            (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
            "o_totalprice",
        ),
        branch="wap",
    )
    t.delete_where("o_totalprice < 2000")  # commits on main, later seq
    t.cherrypick_snapshot(staged.id)

    # tiebreak on o_totalprice too: at sf >= ~0.2 the +1000000 offset
    # collides with real orderkeys, and a single-key sort would leave
    # the hash gate order-nondeterministic (round-8 review finding)
    out = t.scan().orderBy("o_orderkey", "o_totalprice")
    # the seq-scoping teeth: picked rows matching the delete predicate
    # are alive because their sequence is the PUBLISH commit's
    survivors_below = (
        out.filter(
            (F.col("o_orderkey") >= 1000000)
            & (F.col("o_totalprice") < 2000)
        ).count()
    )
    assert survivors_below > 0, "fixture never exercised the seq override"
    return out


_J9_ORACLE = """
    WITH final AS (
        SELECT s_suppkey, s_acctbal FROM supplier
        WHERE s_suppkey % 3 <> 0 AND s_suppkey % 5 <> 0
    ),
    head5 AS (
        SELECT CAST(sum(s_suppkey) AS BIGINT) AS v FROM (
            SELECT s_suppkey FROM final ORDER BY s_suppkey LIMIT 5)
    ),
    total AS (SELECT CAST(count(*) AS BIGINT) AS v FROM final),
    report(step, fact, value) AS (
        VALUES
            (1, 'warehouses_listed',       CAST(4 AS BIGINT)),
            (2, 'running_warehouses',      CAST(2 AS BIGINT)),
            (3, 'first_running_selected',  CAST(1 AS BIGINT)),
            (4, 'stopped_refuses_connect', CAST(1 AS BIGINT)),
            (5, 'empty_listing_refused',   CAST(1 AS BIGINT)),
            (6, 'probe_describe_cols',     CAST(2 AS BIGINT)),
            (7, 'probe_head5_keysum',      (SELECT v FROM head5)),
            (8, 'probe_count',             (SELECT v FROM total))
    )
    SELECT step, fact, value FROM report ORDER BY step
"""


@declare(
    "j9_warehouse_discovery_arc",
    oracle=_J9_ORACLE,
    tags=("catalog", "cross-engine", "discovery"),
)
def j9_warehouse_discovery_arc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Warehouse discovery + verification through the DISCOVERED engine
    (SURVEY §2 J9 — the last row without driver evidence; round-10
    verdict item 2). The reference lists SQL warehouses, filters to
    state == RUNNING, errors when none exist, and runs every
    verification statement on the FIRST running one
    (``internal/verify_in_databricks.py:23-34``). The local analog is a
    listing of DuckDB-backed warehouses in mixed lifecycle states:

    steps 1-3: the listing holds 4 warehouses (STOPPED, STARTING,
    RUNNING, RUNNING); discovery must select the FIRST running one by
    listing order — asserted by warehouse id, not just by count;
    step 4: a non-RUNNING warehouse refuses statements at the
    connection boundary (the reference never reaches one — the filter
    guarantees it; the analog enforces it);
    step 5: discovery over an all-stopped listing raises the
    reference's "No running SQL warehouse found" error;
    steps 6-8: the reference's fixed probe suite — DESCRIBE / ordered
    head / COUNT(*) — runs ON the discovered warehouse's connection
    against a MoR table (insert + row-level delete), so the verified
    read merges deletes with no Spark in the read path.
    """
    import os

    from iceberg_v2_to_v3_upgrade_spark.io import load_table
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
    from iceberg_v2_to_v3_upgrade_spark.tables.duckdb_reader import (
        duckdb_table_sql,
    )
    from iceberg_v2_to_v3_upgrade_spark.tables.verify import (
        Warehouse,
        discover_warehouse,
    )

    # the table under verification: MoR insert + delete, second-engine
    # read must merge the delete ledger
    warehouse_root = tempfile.mkdtemp(prefix="j9_wh_")
    catalog = LocalCatalog(spark, warehouse_root)
    t = catalog.create_table(
        "disc_db", "supplier_j9", "s_suppkey BIGINT, s_acctbal DOUBLE"
    )
    t.insert(
        load_table(spark, sf_dir, "supplier")
        .filter("s_suppkey % 3 <> 0")
        .select("s_suppkey", "s_acctbal")
    )
    t.delete_where("s_suppkey % 5 = 0")

    # the warehouse listing, in API order (analog of GET /warehouses)
    wh_dir = tempfile.mkdtemp(prefix="j9_duck_")
    listing = [
        Warehouse("wh-stopped", "wh1", "STOPPED",
                  os.path.join(wh_dir, "wh1.db")),
        Warehouse("wh-starting", "wh2", "STARTING",
                  os.path.join(wh_dir, "wh2.db")),
        Warehouse("wh-serverless", "wh3", "RUNNING",
                  os.path.join(wh_dir, "wh3.db")),
        Warehouse("wh-classic", "wh4", "RUNNING",
                  os.path.join(wh_dir, "wh4.db")),
    ]
    rows: list[tuple[int, str, int]] = [
        (1, "warehouses_listed", len(listing)),
        (2, "running_warehouses",
         sum(1 for w in listing if w.state == "RUNNING")),
    ]
    picked = discover_warehouse(listing)
    assert picked.id == "wh3", picked  # FIRST running, listing order
    rows.append((3, "first_running_selected", 1))
    try:
        listing[0].connect()
        refused = 0
    except RuntimeError:
        refused = 1
    rows.append((4, "stopped_refuses_connect", refused))
    try:
        discover_warehouse([w for w in listing if w.state != "RUNNING"])
        empty_refused = 0
    except RuntimeError as exc:
        assert "No running SQL warehouse found" in str(exc)
        empty_refused = 1
    rows.append((5, "empty_listing_refused", empty_refused))

    # the 3-probe suite ON the discovered warehouse
    sql = duckdb_table_sql(t)
    con = picked.connect()
    try:
        cols = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
        rows.append((6, "probe_describe_cols", len(cols)))
        head5 = con.execute(
            f"SELECT CAST(sum(s_suppkey) AS BIGINT) FROM "
            f"(SELECT s_suppkey FROM ({sql}) "
            f"ORDER BY s_suppkey LIMIT 5)"
        ).fetchone()[0]
        rows.append((7, "probe_head5_keysum", int(head5)))
        n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        rows.append((8, "probe_count", int(n)))
    finally:
        con.close()
    return spark.createDataFrame(
        rows, "step int, fact string, value bigint"
    ).orderBy("step")
