"""Conditional V2->V3 upgrade plan — the reference's core control plane
(I3/I4/I6, ``internal/upgrade_table.py:100-146``), verbatim semantics:

- table not found            -> error
- not an Iceberg table       -> skip (guard :117-119)
- already format-version 3   -> compact only (branch :121-124)
- format-version < 3         -> ALTER to 3, then full compaction (:127-131)

``dry_run`` renders the plan as the SQL the reference would ship over SSH
(:74-78) — our EXPLAIN analog — without executing anything.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

_COMPACT_SQL = (
    "CALL system.rewrite_data_files(table => '{db}.{table}', "
    "options => map('rewrite-all', 'true', 'delete-file-threshold', '1'))"
)
_ALTER_SQL = (
    "ALTER TABLE {db}.{table} SET TBLPROPERTIES ('format-version' = '3')"
)


@dataclass
class UpgradePlan:
    database: str
    table: str
    action: str  # error | skip_not_iceberg | compact_only | upgrade_and_compact
    reason: str
    statements: list[str] = field(default_factory=list)

    def explain(self) -> str:
        lines = [
            f"upgrade plan for {self.database}.{self.table}: {self.action}",
            f"  reason: {self.reason}",
        ]
        lines += [f"  [{i+1}] {s}" for i, s in enumerate(self.statements)]
        return "\n".join(lines)


@dataclass
class UpgradeResult:
    plan: UpgradePlan
    executed: bool
    ok: bool
    message: str


def plan_upgrade(catalog: LocalCatalog, db: str, table: str) -> UpgradePlan:
    info = catalog.get_table_info(db, table)
    if info is None:
        return UpgradePlan(db, table, "error", "table not found")
    if "ICEBERG" not in (info["table_type"] or ""):
        return UpgradePlan(
            db, table, "skip_not_iceberg", f"table_type={info['table_type']}"
        )
    if info["format_version"] == "3":
        return UpgradePlan(
            db,
            table,
            "compact_only",
            "already format-version 3; compacting to clear delete files",
            [_COMPACT_SQL.format(db=db, table=table)],
        )
    return UpgradePlan(
        db,
        table,
        "upgrade_and_compact",
        f"format-version {info['format_version']} -> 3",
        [
            _ALTER_SQL.format(db=db, table=table),
            _COMPACT_SQL.format(db=db, table=table),
        ],
    )


def execute_upgrade(
    catalog: LocalCatalog, db: str, table: str, dry_run: bool = False
) -> UpgradeResult:
    plan = plan_upgrade(catalog, db, table)
    if dry_run:
        return UpgradeResult(plan, executed=False, ok=True, message=plan.explain())
    if plan.action == "error":
        return UpgradeResult(plan, executed=False, ok=False, message=plan.reason)
    if plan.action == "skip_not_iceberg":
        return UpgradeResult(plan, executed=False, ok=True, message=plan.reason)
    t = catalog.load_table(db, table)
    if plan.action == "upgrade_and_compact":
        t.set_properties({"format-version": "3"})
    t.rewrite_data_files(rewrite_all=True, delete_file_threshold=1)
    assert not t.current_snapshot().delete_dirs, "compaction left delete files"
    return UpgradeResult(
        plan,
        executed=True,
        ok=True,
        message=f"{db}.{table}: {plan.action} complete "
        f"(format-version={t.format_version}, "
        f"next-row-id={t.properties.get('next-row-id')})",
    )


def upgrade_many(
    catalog: LocalCatalog,
    db: str,
    tables: list[str],
    dry_run: bool = False,
) -> list[UpgradeResult]:
    """Batch loop + summary accounting (reference upgrade_table.py:216-228)."""
    return [execute_upgrade(catalog, db, t, dry_run=dry_run) for t in tables]
