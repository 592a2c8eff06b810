"""Local permission store — the reference's Lake Formation surface
(SURVEY.md §2.J7/J8) on a file-backed warehouse.

Mirrors ``internal/lake_formation_setup.py`` semantics:

- ``get_account_id`` (J8, reference :11-19): the catalog-owning account —
  locally a deterministic 12-digit id derived from the warehouse path.
- ``grant_database_permissions`` (:22-54): db-level grants, idempotent
  ("AlreadyExists" → OK), default permission set
  ALL/ALTER/CREATE_TABLE/DESCRIBE/DROP with grant option.
- ``grant_table_permissions`` (:57-90): table-level grants, default set
  ALL/ALTER/DELETE/DESCRIBE/DROP/INSERT/SELECT.
- ``grant_iam_allowed_principals`` (:93-141): the IAM_ALLOWED_PRINCIPALS
  wildcard principal — a grant to it applies to *every* caller (that is
  what IAM-based access means in Lake Formation).

Enforcement model: like Lake Formation's default "IAM access control"
mode, a fresh store is NON-enforcing (everything allowed). After
``enable_enforcement()`` every router DDL/DML path checks the acting
principal against the grant table (see ``EngineSQL._authorize``).
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Iterable

#: LF wildcard principal: grants to it apply to every caller.
IAM_ALLOWED_PRINCIPALS = "IAM_ALLOWED_PRINCIPALS"

#: Default grant sets (reference lake_formation_setup.py:43,79).
DB_PERMISSIONS: tuple[str, ...] = ("ALL", "ALTER", "CREATE_TABLE", "DESCRIBE", "DROP")
TABLE_PERMISSIONS: tuple[str, ...] = (
    "ALL",
    "ALTER",
    "DELETE",
    "DESCRIBE",
    "DROP",
    "INSERT",
    "SELECT",
)
#: IAM_ALLOWED_PRINCIPALS default sets (reference :118,131).
IAM_DB_PERMISSIONS: tuple[str, ...] = ("DESCRIBE", "CREATE_TABLE")
IAM_TABLE_PERMISSIONS: tuple[str, ...] = (
    "SELECT",
    "DESCRIBE",
    "ALTER",
    "DELETE",
    "INSERT",
)


def get_account_id(warehouse: str) -> str:
    """J8: the catalog account id (reference STS get_caller_identity) —
    locally a stable 12-digit function of the warehouse location."""
    return f"{zlib.crc32(os.path.abspath(warehouse).encode()) % 10**12:012d}"


class PermissionStore:
    """Grant table persisted next to the warehouse metadata.

    Layout: ``{"enforcing": bool, "grants": {resource: {principal:
    [perms]}}}`` where resource is ``db:<name>`` or ``table:<db>.<name>``.
    """

    def __init__(self, warehouse: str):
        self.warehouse = warehouse.rstrip("/")
        self.path = os.path.join(self.warehouse, "_permissions.json")
        self.account_id = get_account_id(self.warehouse)
        self._cache: dict | None = None
        self._cache_mtime: float | None = None

    # ---------------------------------------------------------- storage

    def _load(self) -> dict:
        # mtime-keyed cache: the router consults masks for every catalog
        # table on every SELECT; without this each statement pays N
        # open+json.load calls even when no grants exist. External writers
        # (another process) bump the mtime, which invalidates the cache.
        try:
            mtime = os.stat(self.path).st_mtime_ns
        except FileNotFoundError:
            return {"enforcing": False, "grants": {}}
        if self._cache is not None and mtime == self._cache_mtime:
            return self._cache
        with open(self.path) as f:
            state = json.load(f)
        self._cache, self._cache_mtime = state, mtime
        return state

    def _save(self, state: dict) -> None:
        os.makedirs(self.warehouse, exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        # same-process writes must be visible even within one mtime tick
        self._cache = state
        try:
            self._cache_mtime = os.stat(self.path).st_mtime_ns
        except FileNotFoundError:
            self._cache_mtime = None

    # ------------------------------------------------------ enforcement

    @property
    def enforcing(self) -> bool:
        return bool(self._load().get("enforcing"))

    def enable_enforcement(self) -> None:
        state = self._load()
        state["enforcing"] = True
        self._save(state)

    def disable_enforcement(self) -> None:
        state = self._load()
        state["enforcing"] = False
        self._save(state)

    # ----------------------------------------------------------- grants

    def _grant(self, resource: str, principal: str, perms: Iterable[str]) -> bool:
        state = self._load()
        held = set(state["grants"].setdefault(resource, {}).get(principal, []))
        wanted = {p.upper() for p in perms}
        if wanted <= held:
            return True  # "[OK] Permissions already exist" (reference :50)
        state["grants"][resource][principal] = sorted(held | wanted)
        self._save(state)
        return True

    def _revoke(self, resource: str, principal: str, perms: Iterable[str] | None) -> None:
        state = self._load()
        if principal not in state["grants"].get(resource, {}):
            return
        if perms is None:
            del state["grants"][resource][principal]
        else:
            held = set(state["grants"][resource][principal])
            state["grants"][resource][principal] = sorted(
                held - {p.upper() for p in perms}
            )
        self._save(state)

    def grant_database_permissions(
        self,
        principal: str,
        database: str,
        permissions: Iterable[str] = DB_PERMISSIONS,
    ) -> bool:
        """J7 db-level grant (reference lake_formation_setup.py:22-54)."""
        return self._grant(f"db:{database}", principal, permissions)

    def grant_table_permissions(
        self,
        principal: str,
        database: str,
        table: str,
        permissions: Iterable[str] = TABLE_PERMISSIONS,
    ) -> bool:
        """J7 table-level grant (reference lake_formation_setup.py:57-90)."""
        return self._grant(f"table:{database}.{table}", principal, permissions)

    def grant_iam_allowed_principals(
        self, database: str, table: str | None = None
    ) -> None:
        """The wildcard grant pair (reference lake_formation_setup.py:93-141)."""
        self._grant(f"db:{database}", IAM_ALLOWED_PRINCIPALS, IAM_DB_PERMISSIONS)
        if table:
            self._grant(
                f"table:{database}.{table}",
                IAM_ALLOWED_PRINCIPALS,
                IAM_TABLE_PERMISSIONS,
            )

    def revoke_database_permissions(
        self, principal: str, database: str, permissions: Iterable[str] | None = None
    ) -> None:
        self._revoke(f"db:{database}", principal, permissions)

    def revoke_table_permissions(
        self,
        principal: str,
        database: str,
        table: str,
        permissions: Iterable[str] | None = None,
    ) -> None:
        self._revoke(f"table:{database}.{table}", principal, permissions)

    # ------------------------------------------- column-level security

    def set_column_mask(
        self, principal: str, database: str, table: str, columns
    ) -> None:
        """Lake Formation data-filter analog (cell-level security): the
        principal still sees the full schema, but masked columns read as
        NULL — LF's nulled-projection column filter, which keeps
        downstream SELECT * shapes working."""
        state = self._load()
        res = f"colmask:{database}.{table}"
        # GRANT verbs accumulate (matches _grant): a second GRANT COLUMN
        # MASK adds columns rather than silently unmasking earlier ones.
        held = set(state["grants"].get(res, {}).get(principal, []))
        state["grants"].setdefault(res, {})[principal] = sorted(
            held | set(columns)
        )
        self._save(state)

    def drop_column_mask(
        self, principal: str, database: str, table: str
    ) -> None:
        state = self._load()
        state["grants"].get(f"colmask:{database}.{table}", {}).pop(
            principal, None
        )
        self._save(state)

    def masked_columns(
        self, principal: str | None, database: str, table: str
    ) -> set:
        if principal is None:
            return set()
        state = self._load()
        return set(
            state["grants"]
            .get(f"colmask:{database}.{table}", {})
            .get(principal, [])
        )

    def set_row_filter(
        self, principal: str, database: str, table: str, predicate: str
    ) -> None:
        """Lake Formation row-filter analog: the principal only sees rows
        satisfying ``predicate`` (a SQL boolean over the table columns).
        One filter per principal per table — a second grant replaces it
        (filters are a single predicate, unlike the accumulating column
        mask list)."""
        state = self._load()
        state["grants"].setdefault(f"rowfilter:{database}.{table}", {})[
            principal
        ] = [predicate]
        self._save(state)

    def drop_row_filter(
        self, principal: str, database: str, table: str
    ) -> None:
        state = self._load()
        state["grants"].get(f"rowfilter:{database}.{table}", {}).pop(
            principal, None
        )
        self._save(state)

    def row_filter(
        self, principal: str | None, database: str, table: str
    ) -> str | None:
        if principal is None:
            return None
        preds = (
            self._load()["grants"]
            .get(f"rowfilter:{database}.{table}", {})
            .get(principal)
        )
        return preds[0] if preds else None

    # ------------------------------------------------------------ checks

    def _held(self, resource: str, principal: str | None, state: dict) -> set[str]:
        grants = state["grants"].get(resource, {})
        held = set(grants.get(IAM_ALLOWED_PRINCIPALS, []))
        if principal is not None:
            held |= set(grants.get(principal, []))
        return held

    def check_database(
        self, principal: str | None, database: str, permission: str
    ) -> bool:
        """True when the principal may perform ``permission`` on the db.
        Non-enforcing stores allow everything (LF IAM-access default)."""
        state = self._load()
        if not state.get("enforcing"):
            return True
        held = self._held(f"db:{database}", principal, state)
        return "ALL" in held or permission.upper() in held

    def check_table(
        self, principal: str | None, database: str, table: str, permission: str
    ) -> bool:
        """True when the principal may perform ``permission`` on the table.
        Table-level grants only — db grants do not cascade (LF model)."""
        state = self._load()
        if not state.get("enforcing"):
            return True
        held = self._held(f"table:{database}.{table}", principal, state)
        return "ALL" in held or permission.upper() in held

    def check_table_explicit(
        self, principal: str | None, database: str, table: str, permission: str
    ) -> bool:
        """True only when an EXPLICIT grant covers the permission — the
        non-enforcing default does NOT count. Used for privileges that
        must not ride the IAM-access default, e.g. column-mask
        administration (masks are enforced even in non-enforcing stores,
        so removing one cannot be allowed just because the store is
        permissive)."""
        state = self._load()
        held = self._held(f"table:{database}.{table}", principal, state)
        return "ALL" in held or permission.upper() in held


class PermissionDenied(Exception):
    """Raised by the router when an enforcing store rejects a statement."""


def setup_permissions(
    store: PermissionStore,
    principal: str,
    database: str,
    table: str | None = None,
) -> bool:
    """The reference CLI's full setup arc (lake_formation_setup.py:174-205):
    db grant, optional table grant, then the IAM wildcard pair. The S3
    register step (J6) collapses to the warehouse dir existing locally."""
    ok = store.grant_database_permissions(principal, database)
    if table:
        ok = store.grant_table_permissions(principal, database, table) and ok
    store.grant_iam_allowed_principals(database, table)
    return ok
