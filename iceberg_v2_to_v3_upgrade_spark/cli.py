"""CLI — same flag surface as the reference's ``upgrade.sh`` /
``internal/upgrade_table.py:173-228`` (K6): ``-d -t --tables --all --list
--dry-run``), plus ``demo`` replicating the reference's three-act demo
(``demo.sh``) end-to-end locally.

Usage:
    python -m iceberg_v2_to_v3_upgrade_spark.cli upgrade -d db -t tbl
    python -m iceberg_v2_to_v3_upgrade_spark.cli upgrade -d db --all [--dry-run]
    python -m iceberg_v2_to_v3_upgrade_spark.cli upgrade -d db --list
    python -m iceberg_v2_to_v3_upgrade_spark.cli demo
"""

from __future__ import annotations

import argparse
import datetime
import sys
from decimal import Decimal

from iceberg_v2_to_v3_upgrade_spark.config import load_config, validate_config
from iceberg_v2_to_v3_upgrade_spark.plans.upgrade import upgrade_many
from iceberg_v2_to_v3_upgrade_spark.session import get_spark
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
from iceberg_v2_to_v3_upgrade_spark.tables.verify import (
    verification_passed,
    verify_table_in_duckdb,
)

DEMO_SCHEMA = (
    "id INT, name STRING, category STRING, amount DECIMAL(10,2), "
    "created_at TIMESTAMP"
)
# reference rows (internal/create_demo_table.py:117-127); created_at pinned
# to a literal instead of current_timestamp() for determinism (SURVEY §7 risk 2)
_TS = datetime.datetime(2026, 1, 1, 0, 0, 0)
_D = Decimal
DEMO_ROWS = [
    (1, "Product A", "electronics", _D("100.50"), _TS),
    (2, "Product B", "clothing", _D("49.99"), _TS),
    (3, "Product C", "electronics", _D("299.99"), _TS),
    (4, "Product D", "furniture", _D("599.00"), _TS),
    (5, "Product E", "clothing", _D("79.99"), _TS),
    (6, "Product F", "electronics", _D("149.99"), _TS),
    (7, "Product G", "furniture", _D("899.00"), _TS),
    (8, "Product H", "clothing", _D("29.99"), _TS),
    (9, "Product I", "electronics", _D("199.99"), _TS),
    (10, "Product J", "furniture", _D("399.00"), _TS),
]


def cmd_upgrade(args: argparse.Namespace) -> int:
    cfg = load_config()
    problems = validate_config(cfg)
    if problems:
        print("config invalid:", "; ".join(problems))
        return 2
    spark = get_spark(app_name="upgrade-cli")
    catalog = LocalCatalog(spark, args.warehouse or cfg.warehouse)

    if args.list:
        for row in catalog.list_report(args.database).collect():
            print(f"  {row.status:<28} {row.table} (format-version={row.format_version})")
        return 0

    if args.all:
        tables = [
            t["name"]
            for t in catalog.list_tables(args.database)
            if t["format_version"] != "3"
        ]
        if not tables:
            print("nothing to upgrade (all tables already V3)")
            return 0
    elif args.tables:
        tables = [t.strip() for t in args.tables.split(",") if t.strip()]
    elif args.table:
        tables = [args.table]
    else:
        print("one of -t/--tables/--all/--list required")
        return 2

    results = upgrade_many(catalog, args.database, tables, dry_run=args.dry_run)
    ok = 0
    for r in results:
        print(r.message if not args.dry_run else r.plan.explain())
        ok += int(r.ok)
    print(f"\nsummary: {ok}/{len(results)} OK")  # upgrade_table.py:221-228
    return 0 if ok == len(results) else 1


def cmd_demo(args: argparse.Namespace) -> int:
    """The reference demo arc (demo.sh three acts), fully local:
    create V2 MoR table -> insert 10 -> DELETE ids (2,4,6) -> UPDATE
    electronics *1.1 -> upgrade to V3 + compact -> verify in second
    engine -> post-upgrade MoR delete (test_v3_mor_deletes.py)."""
    spark = get_spark(app_name="demo")
    catalog = LocalCatalog(spark, args.warehouse or load_config().warehouse)
    db, name = "demo_db", "v2_mor_demo"
    catalog.drop_table(db, name, if_exists=True)
    t = catalog.create_table(
        db, name, DEMO_SCHEMA, partition_by=["category"],
    )
    t.insert_values(DEMO_ROWS)
    print(f"Act 1: created V2 MoR table, count={t.count()} (expect 10)")
    t.delete_where("id IN (2, 4, 6)")
    print(f"  after DELETE IN (2,4,6): count={t.count()} (expect 7)")
    t.update_set({"amount": "amount * 1.1"}, "category = 'electronics'")
    print(f"  after UPDATE electronics: count={t.count()} (expect 7), "
          f"delete files={len(t.current_snapshot().delete_dirs)}")

    from iceberg_v2_to_v3_upgrade_spark.plans.upgrade import execute_upgrade

    res = execute_upgrade(catalog, db, name)
    print(f"Act 2: {res.message}")

    probes = verify_table_in_duckdb(catalog.load_table(db, name))
    for p in probes:
        print(f"  probe {p.probe}: {'OK' if p.ok else 'FAIL'} ({p.detail[:80]})")
    print(f"Act 3: cross-engine verification "
          f"{'PASSED' if verification_passed(probes) else 'FAILED'}")

    t = catalog.load_table(db, name)
    t.delete_where("id = 1")
    print(f"  post-upgrade V3 MoR delete: count={t.count()} (expect 6)")
    probes = verify_table_in_duckdb(t)
    print(f"  re-verification {'PASSED' if verification_passed(probes) else 'FAILED'}")
    return 0


def cmd_permissions(args: argparse.Namespace) -> int:
    """The reference's lake_formation_setup.py CLI arc (J7/J8): grant db
    perms, optional table perms, the IAM wildcard pair (reference
    :174-205), against the local PermissionStore. ``--revoke`` is the
    closing half Lake Formation exposes via revoke_permissions."""
    from iceberg_v2_to_v3_upgrade_spark.tables.permissions import (
        PermissionStore,
        setup_permissions,
    )

    store = PermissionStore(args.warehouse or load_config().warehouse)
    print("=" * 60 + "\nPERMISSION SETUP (local)\n" + "=" * 60)
    print(f"account id: {store.account_id}")
    if args.revoke:
        store.revoke_database_permissions(args.principal, args.database)
        if args.table:
            store.revoke_table_permissions(args.principal, args.database, args.table)
        print(f"  [OK] revoked {args.principal} on {args.database}"
              + (f".{args.table}" if args.table else ""))
        return 0
    setup_permissions(store, args.principal, args.database, args.table)
    print(f"  [OK] database permissions granted on '{args.database}'")
    if args.table:
        print(f"  [OK] table permissions granted on '{args.database}.{args.table}'")
    print("  [OK] IAM_ALLOWED_PRINCIPALS granted")
    if args.enforce:
        store.enable_enforcement()
        print("  [OK] enforcement enabled")
    print("\n[OK] permission setup complete!")
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    """spark-sql -e analog (reference upgrade_table.py:81-90 shipped SQL
    text over SSH; here it routes through EngineSQL in-process)."""
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL

    spark = get_spark(app_name="sql-cli")
    catalog = LocalCatalog(spark, args.warehouse or load_config().warehouse)
    for res in EngineSQL(catalog).execute(args.execute):
        if res.df is not None:
            for row in res.df.collect():
                print("\t".join(str(v) for v in row))
        else:
            print(f"-- {res.kind}: {res.message}")
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    """The --dry-run analog for read queries (reference upgrade_table.py:
    74-78 prints the plan it would execute; this prints Catalyst's)."""
    from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

    registry = load_all_operators()
    if args.query not in registry:
        print(f"unknown query {args.query!r}; known: {', '.join(sorted(registry))}")
        return 2
    spark = get_spark(app_name="explain")
    df = registry[args.query].fn(spark, args.sf_dir)
    df.explain("formatted")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="iceberg-v2-to-v3-upgrade-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    up = sub.add_parser("upgrade", help="upgrade table(s) to format-version 3")
    up.add_argument("-d", "--database", required=True)
    up.add_argument("-t", "--table")
    up.add_argument("--tables", help="comma-separated table list")
    up.add_argument("--all", action="store_true", help="all V2 tables in db")
    up.add_argument("--list", action="store_true", help="report versions only")
    up.add_argument("--dry-run", action="store_true")
    up.add_argument("--warehouse")
    up.set_defaults(fn=cmd_upgrade)

    demo = sub.add_parser("demo", help="run the reference demo arc locally")
    demo.add_argument("--warehouse")
    demo.set_defaults(fn=cmd_demo)

    sqlp = sub.add_parser(
        "sql", help="execute a SQL program (the spark-sql -e analog)"
    )
    sqlp.add_argument("-e", "--execute", required=True, help="SQL text")
    sqlp.add_argument("--warehouse")
    sqlp.set_defaults(fn=cmd_sql)

    perm = sub.add_parser(
        "permissions", help="grant/revoke catalog permissions (J7 analog)"
    )
    perm.add_argument("-d", "--database", required=True)
    perm.add_argument("-t", "--table")
    perm.add_argument("-p", "--principal", required=True, help="principal to grant to")
    perm.add_argument("--revoke", action="store_true")
    perm.add_argument("--enforce", action="store_true",
                      help="enable enforcement after granting")
    perm.add_argument("--warehouse")
    perm.set_defaults(fn=cmd_permissions)

    exp = sub.add_parser(
        "explain", help="formatted physical plan of a declared query"
    )
    exp.add_argument("-q", "--query", required=True, help="declared query name")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    exp.set_defaults(fn=cmd_explain)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
