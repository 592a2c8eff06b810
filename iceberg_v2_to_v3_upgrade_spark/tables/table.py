"""Mutable, versioned, partitioned table — the reference's data model
(SURVEY.md §1) natively on Spark + parquet.

Semantics mirrored from the reference's Iceberg surface:
- schema-fixed DDL with identity partitioning and table properties
  (create: internal/create_demo_table.py:102-114),
- merge-on-read DELETE/UPDATE writing *delete files* that mask rows at
  read time instead of rewriting data files (:130,133),
- snapshot-versioned commits with time travel and expiry (README.md:34-38),
- format-version 2->3 upgrade gated exactly like
  internal/upgrade_table.py:100-146, exposing `next-row-id` at V3
  (README.md:43-45 — row lineage is why the upgrade exists).

Physical layout (one directory per table):

    <table_root>/metadata.json        # schema, properties, snapshot log
    <table_root>/data/snap-<id>/      # parquet, partitioned by identity cols
    <table_root>/deletes/snap-<id>/   # parquet delete files (_row_id)

Every scan is `union(data dirs) LEFT ANTI JOIN union(delete dirs) ON
_row_id` with the delete side broadcast — the exact shape of Iceberg's MoR
read path. Delete files are tiny relative to data (O(deleted rows)), so at
100 TB the anti-join never shuffles the fact side.

Row identity: `_row_id` is assigned at write from
`monotonically_increasing_id()` plus a per-commit base offset — unique and
monotone across commits but intentionally sparse, exactly like Iceberg's
(file, position) identity; `next-row-id` tracks the high-water mark.
"""

from __future__ import annotations

import contextlib
import datetime
import fcntl
import json
import os
import re
import shutil
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

_ROW_ID = "_row_id"

# Iceberg-style partition transforms: days(ts), months(ts),
# bucket(N, col), truncate(N, col)
_TRANSFORM_RE = re.compile(
    r"^(?P<fn>days|months|bucket|truncate)\(\s*(?:(?P<n>\d+)\s*,\s*)?"
    r"(?P<col>\w+)\s*\)$",
    re.IGNORECASE,
)


class TableError(Exception):
    pass


class CommitConflictError(TableError):
    """Another writer advanced the table since this handle loaded its
    metadata, and the change could not be safely re-applied on top —
    the analog of Iceberg's ``CommitFailedException`` after its
    optimistic-concurrency retries are exhausted. Reload the table
    (open a fresh handle) and re-run the operation."""


@contextlib.contextmanager
def _table_lock(root: str):
    """Exclusive per-table commit lock (flock on ``<root>/.commit.lock``).

    Held across every metadata read-check-modify-write so the version
    check in ``_write_meta`` and the rebase in ``_commit`` are atomic
    with the ``os.replace`` that publishes the new metadata — the
    single-filesystem stand-in for the atomic compare-and-swap a real
    Iceberg catalog provides on the table pointer
    (reference README.md:7 — concurrent engines share one table)."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, ".commit.lock"), "w") as fd:
        fcntl.flock(fd, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)


@dataclass
class Snapshot:
    id: int
    timestamp: str  # ISO-8601 UTC
    operation: str  # append | delete | update | replace | create
    data_dirs: list[str] = field(default_factory=list)
    delete_dirs: list[str] = field(default_factory=list)  # positional
    # equality deletes: [{"dir": path, "cols": [...], "seq": snap_id}];
    # each applies only to data committed BEFORE seq (Iceberg sequence-
    # number semantics)
    eq_deletes: list[dict] = field(default_factory=list)
    # Iceberg parent-snapshot-id: the snapshot this commit built on (the
    # branch head for branch-staged writes, else the then-current main
    # head). None only for the initial 'create' snapshot and metadata
    # written before this field existed (readers fall back to the
    # positional predecessor in the global list).
    parent_id: int | None = None
    # cherry-pick seq overrides, scoped to THIS snapshot and inherited by
    # descendants at commit time: {data_dir: publish_seq}. Iceberg gives
    # cherry-picked files the publish snapshot's sequence number, but only
    # in the publish lineage — the branch snapshot that originally staged
    # the dir keeps its staged seq, so branch-side deletes still apply
    # there (a global per-table map would resurrect branch-deleted rows).
    seq_overrides: dict[str, int] = field(default_factory=dict)
    # data dirs this commit ADDED relative to its parent (Iceberg's
    # added-files manifest entry), recorded at commit time. None on
    # metadata written before the field existed — readers needing the
    # delta (cherry-pick) then fall back to diffing against earlier
    # snapshots, which is only sound while that history is retained.
    added_dirs: list[str] | None = None

    def to_json(self) -> dict[str, Any]:
        out = {
            "id": self.id,
            "timestamp": self.timestamp,
            "operation": self.operation,
            "data_dirs": self.data_dirs,
            "delete_dirs": self.delete_dirs,
            "eq_deletes": self.eq_deletes,
            "parent_id": self.parent_id,
        }
        if self.seq_overrides:
            out["seq_overrides"] = self.seq_overrides
        if self.added_dirs is not None:
            out["added_dirs"] = self.added_dirs
        return out

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Snapshot":
        return Snapshot(
            id=d["id"],
            timestamp=d["timestamp"],
            operation=d["operation"],
            data_dirs=list(d["data_dirs"]),
            delete_dirs=list(d["delete_dirs"]),
            eq_deletes=list(d.get("eq_deletes", [])),
            parent_id=d.get("parent_id"),
            seq_overrides={
                k: int(v) for k, v in d.get("seq_overrides", {}).items()
            },
            added_dirs=d.get("added_dirs"),
        )


def _utcnow() -> str:
    return datetime.datetime.now(datetime.timezone.utc).isoformat()


def _norm_ts(ts: str) -> str:
    """Canonicalize a user-supplied instant so lexicographic comparison
    against stored snapshot timestamps (``isoformat()`` at UTC — 'T'
    separator, '+00:00' offset) is chronologically correct. Handles the
    SQL space separator, the 'Z' UTC suffix (which sorts AFTER the
    fractional-seconds digits and would wrongly admit later snapshots),
    and non-UTC offsets (converted to UTC). A naive instant is taken as
    UTC, matching the session timezone pin."""
    raw = ts.strip().replace(" ", "T", 1)
    try:
        parsed = datetime.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        return raw  # not ISO-8601; compare as given (legacy behavior)
    if parsed.tzinfo is None:
        parsed = parsed.replace(tzinfo=datetime.timezone.utc)
    return parsed.astimezone(datetime.timezone.utc).isoformat()


class LocalTable:
    """One mutable table rooted at ``root`` (see module docstring)."""

    #: set by the last scan(data_filter=...): {"candidate_dirs": n,
    #: "read_dirs": m}; None when no stats pruning was attempted.
    last_scan_pruning: dict | None = None

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        #: Set by at_metadata_version: a historical handle whose metadata
        #: lives only in memory. Checked at the TOP of _commit, _write_meta
        #: and _write_data_dir so ANY mutator — including one added later
        #: and never appended to the per-name refusal list — fails before
        #: its first filesystem side effect (round-5 advisor: the late
        #: _write_meta backstop alone let a stale-id insert overwrite a
        #: live data dir before refusing).
        self._read_only = False
        self._meta = self._read_meta()

    def _check_writable(self) -> None:
        if self._read_only:
            raise TableError(
                "table handle opened at a historical metadata version "
                "is read-only"
            )

    # ---------------------------------------------------------------- DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema_ddl: str,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
        if_not_exists: bool = False,
    ) -> "LocalTable":
        """CREATE TABLE ... PARTITIONED BY ... TBLPROPERTIES (...).

        Reference: internal/create_demo_table.py:102-114. Defaults match the
        demo table: format-version 2, merge-on-read delete/update modes.
        """
        meta_path = os.path.join(root, "metadata.json")
        if os.path.exists(meta_path):
            if if_not_exists:
                return cls(spark, root)
            raise TableError(f"table already exists at {root}")
        os.makedirs(root, exist_ok=True)
        props = {
            "format-version": "2",
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
        }
        props.update(properties or {})
        meta = {
            "schema_ddl": schema_ddl,
            "partition_by": partition_by or [],
            "partition_spec_log": [
                {"spec_id": 0, "seq": 0, "partition_by": partition_by or []}
            ],
            "properties": props,
            "next_row_id": 0,
            "snapshots": [
                Snapshot(id=1, timestamp=_utcnow(), operation="create").to_json()
            ],
            "current_snapshot_id": 1,
        }
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=2)
        return cls(spark, root)

    @staticmethod
    def drop(root: str, if_exists: bool = True) -> bool:
        """DROP TABLE IF EXISTS (reference internal/create_demo_table.py:99)."""
        if not os.path.exists(os.path.join(root, "metadata.json")):
            if if_exists:
                return False
            raise TableError(f"no table at {root}")
        shutil.rmtree(root)
        return True

    # ----------------------------------------------------------- metadata

    def _read_meta(self) -> dict[str, Any]:
        with open(os.path.join(self.root, "metadata.json")) as f:
            return json.load(f)

    def _metadata_version_path(self, version: int) -> str:
        """The one spelling of the metadata-log filename scheme —
        _write_meta (producer), metadata_log_entries, and
        at_metadata_version (consumers) must agree on it."""
        return os.path.join(
            self.root, "metadata", f"v{version:06d}.metadata.json"
        )

    def _write_meta(self, locked: bool = False) -> None:
        """Atomically replace metadata.json and append a versioned copy
        to the metadata log (Iceberg writes v{N}.metadata.json per commit
        and `metadata_log_entries` reads the trail). Retention follows
        `write.metadata.previous-versions-max` (Iceberg property, default
        100): oldest versioned copies beyond the cap are deleted — the
        current metadata.json itself is never at risk.

        Concurrency: runs under the per-table flock and CAS-checks the
        metadata version — if another writer advanced the table since
        this handle loaded it, the write REFUSES with
        ``CommitConflictError`` instead of silently dropping the other
        writer's snapshots (the lost-update hazard of dumping a stale
        in-memory ``_meta`` wholesale). ``_commit`` pre-reconciles under
        the same lock (rebase) and passes ``locked=True`` so its write
        sails through; direct metadata mutators (set_properties,
        rollback, expire, schema DDL) surface the conflict to the caller,
        whose remedy is a fresh handle."""
        self._check_writable()
        if not locked:
            with _table_lock(self.root):
                return self._write_meta(locked=True)
        disk_meta: dict[str, Any] | None
        try:
            with open(os.path.join(self.root, "metadata.json")) as f:
                disk_meta = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            disk_meta = None  # initial create: nothing on disk yet
        if disk_meta is not None:
            disk_ver = int(disk_meta.get("last_metadata_version", 0))
            mem_ver = int(self._meta.get("last_metadata_version", 0))
            # versions only ever increase, so disk AHEAD of this handle
            # means a concurrent writer committed since we loaded.
            # (disk BEHIND can only mean the caller advanced the counter
            # deliberately — e.g. the 6->7-digit rollover test — never a
            # concurrency hazard, so it is not refused.)
            if disk_ver > mem_ver:
                raise CommitConflictError(
                    f"metadata.json at {self.root} is at version "
                    f"{disk_ver} but this handle loaded version "
                    f"{mem_ver}: a concurrent writer committed first. "
                    f"Reload the table and retry."
                )
            # Guard-property carry-forward (round-6 review): the snapshot
            # procedure records gc.enabled=false / snapshot.adopted-by on
            # the source through a FRESH handle; a caller-held stale
            # handle's next commit dumps its own _meta wholesale and would
            # silently erase the guard — re-enabling the GC the guard
            # exists to block. A guard key present on disk but absent in
            # memory is therefore re-adopted before the write; a key
            # present in memory (e.g. an explicit gc.enabled=true
            # re-enable) always wins. (With the version CAS above this
            # only fires for same-version property races, but it is cheap
            # insurance and keeps the round-6 regression covered.)
            disk_props = disk_meta.get("properties", {})
            for k in ("gc.enabled", "snapshot.adopted-by"):
                if k in disk_props and k not in self._meta["properties"]:
                    self._meta["properties"][k] = disk_props[k]
        ver = int(self._meta.get("last_metadata_version", 0)) + 1
        self._meta["last_metadata_version"] = ver
        tmp = os.path.join(self.root, "metadata.json.tmp")
        with open(tmp, "w") as f:
            json.dump(self._meta, f, indent=2)
        os.replace(tmp, os.path.join(self.root, "metadata.json"))
        log_dir = os.path.join(self.root, "metadata")
        os.makedirs(log_dir, exist_ok=True)
        shutil.copyfile(
            os.path.join(self.root, "metadata.json"),
            self._metadata_version_path(ver),
        )
        keep = int(
            self._meta["properties"].get(
                "write.metadata.previous-versions-max", "100"
            )
        )
        # Sort by the PARSED version: past v999999 the %06d scheme emits
        # 7-digit names that misorder lexically (v1000000 < v999999), and
        # a lexical prune would delete the newest file (round-5 advisor).
        versions = sorted(
            (
                f
                for f in os.listdir(log_dir)
                if re.fullmatch(r"v\d+\.metadata\.json", f)
            ),
            key=lambda f: int(f[1:].split(".")[0]),
        )
        # Iceberg semantics: the property counts PREVIOUS versions, so
        # keep+1 files survive (the current version's copy plus `keep`
        # older ones) — at max=1 the immediately preceding version must
        # remain reachable
        for old in versions[: max(0, len(versions) - (keep + 1))]:
            os.remove(os.path.join(log_dir, old))

    @property
    def properties(self) -> dict[str, str]:
        return dict(self._meta["properties"])

    @property
    def format_version(self) -> int:
        return int(self._meta["properties"].get("format-version", "1"))

    @property
    def partition_by(self) -> list[str]:
        return list(self._meta["partition_by"])

    @property
    def schema_ddl(self) -> str:
        return self._meta["schema_ddl"]

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot.from_json(s) for s in self._meta["snapshots"]]

    def current_snapshot(self) -> Snapshot:
        cur = self._meta["current_snapshot_id"]
        for s in self._meta["snapshots"]:
            if s["id"] == cur:
                return Snapshot.from_json(s)
        raise TableError(f"current snapshot {cur} missing")

    def ancestry(self, head_id: int | None = None) -> list[Snapshot]:
        """The parent chain from the initial snapshot to ``head_id``
        (default: the current main head), oldest first — Iceberg's
        snapshot ancestry. Branch-staged commits that were never
        published are NOT in main's ancestry; after a fast_forward or
        cherrypick publish, the adopted commits are. Snapshots written
        before parent_id existed fall back to the positional predecessor
        in the global list (exactly the legacy traversal)."""
        snaps = self.snapshots()
        by_id = {s.id: s for s in snaps}
        pos = {s.id: i for i, s in enumerate(snaps)}
        cur = by_id.get(
            head_id if head_id is not None
            else self._meta["current_snapshot_id"]
        )
        if cur is None:
            raise TableError(f"no snapshot {head_id}")
        chain = [cur]
        while True:
            if chain[-1].parent_id is not None:
                # parent_id 0 is the explicit root sentinel written by
                # expire_snapshots when the whole chain below was expired
                # — the walk ends here, it must NOT fall through to the
                # positional guess (by_id has no 0, so get() ends it).
                parent = by_id.get(chain[-1].parent_id)
            elif pos[chain[-1].id] > 0:  # legacy metadata: positional
                parent = snaps[pos[chain[-1].id] - 1]
            else:
                parent = None
            if parent is None:
                break
            chain.append(parent)
        chain.reverse()
        return chain

    def _snapshot_at(self, ts: str, head_id: int | None = None) -> Snapshot:
        """TIMESTAMP AS OF resolution: the latest snapshot in the MAIN
        ancestry (never an unpublished branch staging commit) whose
        commit timestamp is <= the given instant."""
        ts = _norm_ts(ts)
        eligible = [s for s in self.ancestry(head_id) if s.timestamp <= ts]
        if not eligible:
            raise TableError(f"no snapshot at or before {ts!r}")
        return max(eligible, key=lambda s: (s.timestamp, s.id))

    def history(self) -> DataFrame:
        """Snapshot log as a DataFrame (Iceberg `table.history` analog,
        including its `is_current_ancestor` column: false for snapshots
        outside the current head's parent chain — rolled-back-away lines
        and unpublished branch staging commits)."""
        ancestors = {s.id for s in self.ancestry()}
        rows = [
            (
                s.id,
                s.timestamp,
                s.operation,
                len(s.data_dirs),
                len(s.delete_dirs),
                s.id in ancestors,
            )
            for s in self.snapshots()
        ]
        return self.spark.createDataFrame(
            rows,
            "snapshot_id int, committed_at string, operation string, "
            "n_data_dirs int, n_delete_dirs int, is_current_ancestor boolean",
        )

    def set_properties(self, props: dict[str, str]) -> None:
        """ALTER TABLE ... SET TBLPROPERTIES (reference upgrade_table.py:128).

        Guards the format-version state machine: only 2->3 is a legal
        transition (the reference never downgrades; V3->V2 would strand
        row-lineage metadata, so we refuse it).
        """
        if "format-version" in props:
            new = int(props["format-version"])
            cur = self.format_version
            if new < cur:
                raise TableError(
                    f"cannot downgrade format-version {cur} -> {new}"
                )
            if new not in (2, 3):
                raise TableError(f"unsupported format-version {new}")
            if new == 3:
                # V3 metadata must carry next-row-id (README.md:43-45);
                # missing it is the reference's documented failure mode.
                props = {**props, "next-row-id": str(self._meta["next_row_id"])}
        self._meta["properties"].update(props)
        self._write_meta()

    # -------------------------------------------------------------- write

    def _base_snapshot(self, branch: str | None = None) -> Snapshot:
        """The snapshot a write builds on: the branch head when writing to
        a branch (WAP staging), else the table's current snapshot."""
        if branch is None:
            return self.current_snapshot()
        branches = self._meta.get("branches", {})
        if branch not in branches:
            raise TableError(f"no branch {branch!r}")
        for s in self.snapshots():
            if s.id == branches[branch]:
                return s
        raise TableError(f"branch {branch!r} head missing")

    def _commit(
        self,
        operation: str,
        data_dirs,
        delete_dirs,
        branch: str | None = None,
        eq_deletes: list[dict] | None = None,
        parent_id: int | None = None,
        seq_overrides: dict[str, int] | None = None,
        min_id: int | None = None,
        fresh_row_dirs: list[str] | None = None,
        row_id_base: int | None = None,
    ) -> Snapshot:
        """Append one snapshot and publish it — optimistic concurrency.

        Under the per-table flock the current metadata is re-read; if
        another writer advanced the table since this handle loaded it,
        the commit is REBASED onto the new head (Iceberg's
        commit-retry: re-read, revalidate, re-apply) when that is
        provably safe, else refused with ``CommitConflictError``:

        - our change is a pure append (new data dirs only) → always
          rebases, onto any head;
        - the other writer's changes were pure appends → our
          delete/update/overwrite/compaction rebases on top (snapshot
          isolation — Iceberg's ``write.delete.isolation-level=
          snapshot``: rows appended concurrently are not subject to a
          predicate evaluated against the older snapshot);
        - both sides changed delete state or removed files → refuse
          (the serializable-conflict case Iceberg also fails).

        ``fresh_row_dirs``/``row_id_base``: dirs whose ``_row_id``s were
        assigned from this handle's (possibly stale) ``next_row_id``.
        If the winner allocated overlapping ids, the rebase shifts ours
        above the winner's watermark (rewriting only the just-written
        dirs) so row identity stays globally unique — the invariant the
        MoR anti-join depends on.
        """
        self._check_writable()
        with _table_lock(self.root):
            return self._commit_locked(
                operation,
                data_dirs,
                delete_dirs,
                branch,
                eq_deletes,
                parent_id,
                seq_overrides,
                min_id,
                fresh_row_dirs,
                row_id_base,
            )

    def _commit_locked(
        self,
        operation: str,
        data_dirs,
        delete_dirs,
        branch: str | None,
        eq_deletes: list[dict] | None,
        parent_id: int | None,
        seq_overrides: dict[str, int] | None,
        min_id: int | None,
        fresh_row_dirs: list[str] | None,
        row_id_base: int | None,
    ) -> Snapshot:
        try:
            disk = self._read_meta()
        except (FileNotFoundError, json.JSONDecodeError):
            disk = None
        if disk is not None and int(disk.get("last_metadata_version", 0)) > int(
            self._meta.get("last_metadata_version", 0)
        ):
            if parent_id is not None:
                # explicit-parent commits are history surgery (publish /
                # adoption); re-pointing them under a moved head is not
                # a mechanical merge — surface the conflict instead
                raise CommitConflictError(
                    f"cannot {operation} with an explicit parent: the "
                    f"table moved underneath this handle; reload and retry"
                )
            data_dirs, delete_dirs, eq_deletes, rebased_overrides = (
                self._rebase_commit(
                    disk,
                    operation,
                    list(data_dirs),
                    list(delete_dirs),
                    list(eq_deletes or []),
                    branch,
                    list(fresh_row_dirs or []),
                    row_id_base,
                    min_id,
                )
            )
            seq_overrides = {**(seq_overrides or {}), **rebased_overrides}
        resolved_parent = (
            parent_id
            if parent_id is not None
            else self._meta["branches"][branch]
            if branch is not None
            else self._meta["current_snapshot_id"]
        )
        # Inherit the parent's seq overrides (cherry-pick scoping follows
        # the publish lineage), merge any new ones, and prune entries for
        # dirs this snapshot no longer carries.
        parent_rec = next(
            (s for s in self._meta["snapshots"] if s["id"] == resolved_parent),
            None,
        )
        merged = dict((parent_rec or {}).get("seq_overrides", {}))
        merged.update(seq_overrides or {})
        live = set(data_dirs)
        merged = {d: int(s) for d, s in merged.items() if d in live}
        parent_data = set((parent_rec or {}).get("data_dirs", []))
        snap = Snapshot(
            # min_id lets an adopting commit (snapshot_table) floor the
            # numbering above every adopted source seq, so the two
            # numbering systems never interleave
            id=max(
                max(s["id"] for s in self._meta["snapshots"]) + 1,
                min_id or 0,
            ),
            timestamp=_utcnow(),
            operation=operation,
            data_dirs=data_dirs,
            delete_dirs=delete_dirs,
            eq_deletes=list(eq_deletes or []),
            # parent = the head this commit builds on (branch head for
            # staged writes, else main) — Iceberg parent-snapshot-id.
            # Rollback/set_current override it with the TARGET so the
            # abandoned line leaves the ancestry (Iceberg ancestorsOf).
            parent_id=resolved_parent,
            seq_overrides=merged,
            added_dirs=[d for d in data_dirs if d not in parent_data],
        )
        self._meta["snapshots"].append(snap.to_json())
        if branch is None:
            self._meta["current_snapshot_id"] = snap.id
        else:
            self._meta["branches"][branch] = snap.id
        self._write_meta(locked=True)
        return snap

    def _rebase_commit(
        self,
        disk: dict[str, Any],
        operation: str,
        data_dirs: list[str],
        delete_dirs: list[str],
        eq_deletes: list[dict],
        branch: str | None,
        fresh_row_dirs: list[str],
        row_id_base: int | None,
        min_id: int | None,
    ) -> tuple[list[str], list[str], list[dict], dict[str, int]]:
        """Re-apply this handle's staged change on top of the metadata a
        concurrent writer published (see ``_commit``). Mutates
        ``self._meta`` to the merged state and returns the rebased
        (data_dirs, delete_dirs, eq_deletes, seq_overrides)."""
        stale = self._meta
        # P = the head this change was built against; H = the disk head
        if branch is not None:
            if branch not in stale.get("branches", {}) or branch not in disk.get(
                "branches", {}
            ):
                raise CommitConflictError(
                    f"branch {branch!r} changed concurrently; reload and retry"
                )
            p_id = stale["branches"][branch]
            h_id = disk["branches"][branch]
        else:
            p_id = stale["current_snapshot_id"]
            h_id = disk["current_snapshot_id"]
        p_rec = next((s for s in stale["snapshots"] if s["id"] == p_id), None)
        h_rec = next((s for s in disk["snapshots"] if s["id"] == h_id), None)
        if p_rec is None or h_rec is None:
            raise CommitConflictError(
                "snapshot history rewritten concurrently (rollback/expire); "
                "reload and retry"
            )
        if p_rec != next(
            (s for s in disk["snapshots"] if s["id"] == p_id), None
        ):
            raise CommitConflictError(
                f"base snapshot {p_id} no longer on disk as loaded; "
                f"reload and retry"
            )

        def _ser(e: dict) -> str:
            return json.dumps(e, sort_keys=True)

        p_data = list(p_rec.get("data_dirs", []))
        p_del = list(p_rec.get("delete_dirs", []))
        p_eq = [_ser(e) for e in p_rec.get("eq_deletes", [])]
        # hoisted set views: `x in set(...)` inside a comprehension
        # rebuilds the set per element — quadratic inside the table-wide
        # commit lock (review finding)
        p_data_set, p_del_set, p_eq_set = set(p_data), set(p_del), set(p_eq)
        data_set, del_set = set(data_dirs), set(delete_dirs)
        added_data = [d for d in data_dirs if d not in p_data_set]
        removed_data = [d for d in p_data if d not in data_set]
        added_del = [d for d in delete_dirs if d not in p_del_set]
        removed_del = [d for d in p_del if d not in del_set]
        our_eq_set = {_ser(e) for e in eq_deletes}
        added_eq = [e for e in eq_deletes if _ser(e) not in p_eq_set]
        removed_eq = [s for s in p_eq if s not in our_eq_set]
        ours_pure_append = not (
            removed_data or added_del or removed_del or added_eq or removed_eq
        )
        h_data = list(h_rec.get("data_dirs", []))
        h_del = list(h_rec.get("delete_dirs", []))
        h_eq = [_ser(e) for e in h_rec.get("eq_deletes", [])]
        h_data_set = set(h_data)
        h_pure_append = (
            p_data_set <= h_data_set
            and sorted(h_del) == sorted(p_del)
            and sorted(h_eq) == sorted(p_eq)
        )
        if not (ours_pure_append or h_pure_append):
            raise CommitConflictError(
                f"concurrent writers both changed delete state of "
                f"{self.root} ({operation} vs snapshot {h_id}); reload "
                f"and retry"
            )
        # a dir WE claim to add that the winner already carries can only
        # be an externally named dir (add_files import — reserved write
        # paths are unique): committing it again would double-count every
        # row, and pinning a fresh seq override on the winner's dir would
        # lift it past delete files that already applied (review finding:
        # eq-deleted rows resurrected by a duplicate concurrent import)
        for d in added_data:
            if d in h_data_set:
                raise CommitConflictError(
                    f"{d} was added by a concurrent writer"
                )
        # imported-dir (add_files) reconciliation: duplicate concurrent
        # imports of the same dir would double-read every row
        ours_imports = {
            k: v
            for k, v in stale.get("imported_dirs", {}).items()
            if k not in disk.get("imported_dirs", {})
        }
        new_id = max(
            max(s["id"] for s in disk["snapshots"]) + 1, min_id or 0
        )
        # row-id reconciliation: if the winner advanced next_row_id past
        # the base we assigned from, our materialized ids overlap theirs —
        # shift ours above the winner's watermark
        disk_next = int(disk.get("next_row_id", 0))
        stale_next = int(stale.get("next_row_id", 0))
        if row_id_base is not None and disk_next > row_id_base:
            shift = disk_next - row_id_base
            for d in fresh_row_dirs:
                self._shift_row_ids(d, shift)
            for entry in ours_imports.values():
                entry["files"] = {
                    fp: int(rid) + shift for fp, rid in entry["files"].items()
                }
            merged_next = stale_next + shift
        else:
            merged_next = max(stale_next, disk_next)
        # merged metadata: the winner's state is the base; fold in what
        # this handle staged before its commit (dir stats for the new
        # dirs, imports, the V3 carried-rows flag, the id watermark)
        merged = disk
        merged["next_row_id"] = merged_next
        if int(merged["properties"].get("format-version", "1")) >= 3:
            merged["properties"]["next-row-id"] = str(merged_next)
        stats = merged.setdefault("dir_stats", {})
        for k, v in stale.get("dir_stats", {}).items():
            stats.setdefault(k, v)
        imports = merged.setdefault("imported_dirs", {})
        for k, v in ours_imports.items():
            v["seq"] = new_id
            imports[k] = v
        if stale.get("carried_row_ids"):
            merged["carried_row_ids"] = True
        self._meta = merged
        if ours_pure_append:
            new_data = h_data + added_data  # disjoint: checked above
            new_del = list(h_del)
            new_eq = [e for e in h_rec.get("eq_deletes", [])]
        else:
            h_added = [d for d in h_data if d not in p_data_set]
            new_data = data_dirs + [d for d in h_added if d not in data_set]
            new_del = list(delete_dirs)
            new_eq = list(eq_deletes)
        # our added data dirs were named for the STALE next snapshot id;
        # pin their delete-scope sequence to the id they actually commit
        # under, so e.g. an equality delete the winner committed in
        # between does not swallow rows appended after it. Only OUR dirs
        # (never the winner's — their seq story is already right) get
        # the pin. Deliberately NOT re-pinned: our own delete files and
        # eq entries keep the stale-stamped sequence — that IS snapshot
        # isolation (write.delete.isolation-level=snapshot): a delete
        # evaluated against snapshot P must not swallow rows a
        # concurrent append committed after P, even though the delete
        # lands later in the linear history.
        new_data_set = set(new_data)
        overrides = {
            d: new_id
            for d in added_data
            if d in new_data_set and self._parse_dir_seq(d) != new_id
        }
        return new_data, new_del, new_eq, overrides

    @staticmethod
    def _parse_dir_seq(d: str) -> int:
        m = re.search(r"snap-(\d+)", os.path.basename(d))
        return int(m.group(1)) if m else 0

    def _shift_row_ids(self, d: str, shift: int) -> None:
        """Rewrite one just-written data dir with ``_row_id += shift``
        (rebase path only — conflicts are rare, and only the losing
        writer's newest dir is touched, never table history)."""
        df = self._read_one_dir(d, self._data_read_schema()).withColumn(
            _ROW_ID, (F.col(_ROW_ID) + F.lit(int(shift))).cast("long")
        )
        spec = self._partition_spec()
        for name, expr in spec:
            if expr is not None and name not in df.columns:
                df = df.withColumn(name, expr)
        tmp = d + ".rbshift"
        writer = df.write.mode("overwrite")
        if spec:
            writer = writer.partitionBy(*[name for name, _ in spec])
        writer.parquet(tmp)
        shutil.rmtree(d)
        os.rename(tmp, d)

    def _next_dir(self, kind: str, snap_id: int) -> str:
        return self._reserve_dir(
            os.path.join(self.root, kind, f"snap-{snap_id:05d}")
        )

    @staticmethod
    def _reserve_dir(base: str) -> str:
        """Atomically reserve a write path. Two writers holding the same
        stale metadata both compute ``snap-{max+1}``; without reservation
        the second ``mode("overwrite")`` write would destroy the first
        writer's files before either commit runs. The CAS is an O_EXCL
        marker FILE (``.<name>.rsv``) BESIDE the dir, not the dir itself:
        Spark's overwrite briefly DELETES the target dir before
        recreating it, so a dir-existence check alone has a window in
        which a second writer's mkdir succeeds on the same path (review
        finding). The sibling marker survives the overwrite cycle; the
        loser takes a suffixed sibling (the ``snap-(\\d+)`` prefix that
        encodes the delete-scope sequence is preserved; the rebase in
        ``_commit`` re-pins the sequence anyway). Markers are dotfiles,
        invisible to the ``snap-*`` dir listers and the orphan walk."""
        candidate, i = base, 0
        while True:
            parent = os.path.dirname(candidate)
            os.makedirs(parent, exist_ok=True)
            marker = os.path.join(
                parent, f".{os.path.basename(candidate)}.rsv"
            )
            try:
                fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                i += 1
                candidate = f"{base}-c{i}"
                continue
            os.close(fd)
            os.makedirs(candidate, exist_ok=True)
            return candidate

    @staticmethod
    def _remove_reservation_marker(d: str) -> None:
        """Reclaim the ``.{name}.rsv`` sibling when its dir is physically
        deleted (expire / orphan GC) — markers otherwise accumulate one
        per lifetime write (review finding)."""
        marker = os.path.join(
            os.path.dirname(d), f".{os.path.basename(d)}.rsv"
        )
        try:
            os.remove(marker)
        except FileNotFoundError:
            pass

    def _assign_row_ids(self, df: DataFrame) -> DataFrame:
        base = int(self._meta["next_row_id"])
        return df.withColumn(
            _ROW_ID, F.monotonically_increasing_id() + F.lit(base)
        )

    def _bump_row_id_watermark(self, data_path: str) -> None:
        """Advance ``next_row_id`` past the max ``_row_id`` in the
        just-written dir, read from the parquet FOOTER statistics
        (row-group max of the ``_row_id`` column) — the same number the
        previous Spark re-read+agg computed, at O(files) driver-side
        metadata cost instead of one full read job per write (round-8
        perf item: this was an extra Spark job in EVERY streaming batch
        commit; real Iceberg takes it from manifest stats the same
        way). Files whose footer lacks min/max stats fall back to a
        pyarrow column read of that file alone."""
        import glob as _glob

        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        hi: int | None = None
        for f in _glob.glob(
            os.path.join(data_path, "**", "*.parquet"), recursive=True
        ):
            pf = _pq.ParquetFile(f)
            md = pf.metadata
            col_idx = next(
                (
                    i
                    for i in range(md.num_columns)
                    if md.schema.column(i).name == _ROW_ID
                ),
                None,
            )
            if col_idx is None:
                continue
            fmax: int | None = None
            stats_ok = md.num_row_groups > 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                if st is None or not st.has_min_max:
                    stats_ok = False
                    break
                fmax = st.max if fmax is None else max(fmax, st.max)
            if not stats_ok:
                v = _pc.max(pf.read(columns=[_ROW_ID])[_ROW_ID]).as_py()
                fmax = v
            if fmax is not None:
                hi = fmax if hi is None else max(hi, fmax)
        if hi is not None:
            # MONOTONIC: a V3 carried-row update re-writes rows keeping
            # their OLD (possibly low) ids — taking hi+1 unconditionally
            # would move the watermark backwards and let the next insert
            # mint duplicate _row_ids (round-8 review finding)
            nxt = max(int(self._meta["next_row_id"]), int(hi) + 1)
            self._meta["next_row_id"] = nxt
            if self.format_version >= 3:
                self._meta["properties"]["next-row-id"] = str(nxt)

    @property
    def partition_spec_log(self) -> list[dict]:
        """Partition-spec history (Iceberg partition evolution): each entry
        is ``{"spec_id": i, "seq": first_commit_seq, "partition_by": [...]}``.
        Data dirs written at commit sequence s use the spec with the
        largest ``seq <= s``. Tables created before evolution existed get a
        synthetic single-entry log (spec 0 from seq 0)."""
        log = self._meta.get("partition_spec_log")
        if log:
            return [dict(e) for e in log]
        return [{"spec_id": 0, "seq": 0, "partition_by": self.partition_by}]

    def evolve_partition_spec(self, new_partition_by: list[str]) -> int:
        """ALTER TABLE ... partition evolution (Iceberg V2 metadata-only
        spec change): NEW writes lay out data under ``new_partition_by``;
        existing data dirs keep their original layout and stay readable —
        no data is rewritten. ``rewrite_data_files`` migrates old dirs to
        the current spec, exactly as Iceberg's rewrite action does.
        Returns the new spec_id.

        Validated at ALTER time (as Iceberg does): every referenced
        column must exist in the schema, and the spec's directory-column
        names must be unique — committing a broken spec would poison
        every subsequent INSERT instead of failing here."""
        schema_cols = {
            f.name
            for f in self.spark.createDataFrame([], self.schema_ddl).schema
        }
        seen_names: set[str] = set()
        for name, canon, _derived, src in self._spec_names(new_partition_by):
            if src not in schema_cols:
                raise TableError(
                    f"partition field references unknown column {src!r} "
                    f"(schema: {sorted(schema_cols)})"
                )
            if name in seen_names:
                raise TableError(
                    f"duplicate partition field {name!r} in spec "
                    f"{new_partition_by}"
                )
            # bucket/truncate REQUIRE the width parameter: the regex makes
            # it optional, and a parameterless form would silently write
            # NULL partition values on every later insert
            if canon.startswith(("bucket(", "truncate(")) and ", " not in canon:
                raise TableError(
                    f"partition transform {canon!r} requires a width "
                    "parameter, e.g. bucket(8, col)"
                )
            seen_names.add(name)
        log = self.partition_spec_log
        start_seq = max(s["id"] for s in self._meta["snapshots"]) + 1
        spec_id = max(e["spec_id"] for e in log) + 1
        log.append(
            {
                "spec_id": spec_id,
                "seq": start_seq,
                "partition_by": list(new_partition_by),
            }
        )
        self._meta["partition_spec_log"] = log
        self._meta["partition_by"] = list(new_partition_by)
        self._meta["properties"]["default-spec-id"] = str(spec_id)
        self._write_meta()
        return spec_id

    def _spec_for_seq(self, seq: int) -> list[str]:
        """The partition spec active at commit sequence ``seq``."""
        best = None
        for e in self.partition_spec_log:
            if e["seq"] <= seq and (best is None or e["seq"] >= best["seq"]):
                best = e
        return list((best or {"partition_by": []})["partition_by"])

    @staticmethod
    def _spec_names(
        partition_by: list[str],
    ) -> list[tuple[str, str, bool, str]]:
        """Pure-regex spec parse (no Spark session touched):
        ``[(dir_column, canonical_transform, is_derived, source_col)]``.
        The canonical form distinguishes ``bucket(4, k)`` from
        ``bucket(8, k)`` even though both derive the same dir column name
        — the distinction filter scoping depends on."""
        out: list[tuple[str, str, bool, str]] = []
        for spec in partition_by:
            m = _TRANSFORM_RE.match(spec.strip())
            if not m:
                col = spec.strip()
                out.append((col, col, False, col))
                continue
            fn = m.group("fn").lower()
            col = m.group("col")
            n = m.group("n")
            canon = f"{fn}({n + ', ' if n else ''}{col})"
            suffix = {"days": "day", "months": "month", "bucket": "bucket"}.get(
                fn, "trunc"
            )
            out.append((f"{col}_{suffix}", canon, True, col))
        return out

    def _partition_spec(
        self, partition_by: list[str] | None = None
    ) -> list[tuple[str, Column | None]]:
        """Parse a partition spec into (dir_column, derivation) pairs
        (defaults to the table's CURRENT spec).

        Identity entries ("col") keep derivation None — the column itself
        lands in the directory name. Transform entries implement Iceberg's
        hidden partitioning: ``days(ts)`` / ``months(ts)`` /
        ``bucket(N, col)`` / ``truncate(N, col)`` derive a directory-only
        column (dropped on scan) so data clusters by the transform while
        queries keep using the source column. bucket() hashes with
        xxhash64 (Iceberg specifies murmur3 — same contract, different
        hash; documented engine-specific)."""
        out: list[tuple[str, Column | None]] = []
        types = {
            f.name: f.dataType.simpleString()
            for f in self.spark.createDataFrame([], self.schema_ddl).schema
        }
        for spec in (
            self.partition_by if partition_by is None else partition_by
        ):
            m = _TRANSFORM_RE.match(spec.strip())
            if not m:
                out.append((spec, None))
                continue
            fn = m.group("fn").lower()
            col = m.group("col")
            n = int(m.group("n")) if m.group("n") else None
            if fn == "days":
                out.append(
                    (f"{col}_day", F.date_format(F.col(col), "yyyy-MM-dd"))
                )
            elif fn == "months":
                out.append(
                    (f"{col}_month", F.date_format(F.col(col), "yyyy-MM"))
                )
            elif fn == "bucket":
                out.append(
                    (
                        f"{col}_bucket",
                        F.pmod(F.xxhash64(F.col(col)), F.lit(n)).cast(
                            "int"
                        ),
                    )
                )
            else:  # truncate
                if types.get(col, "string").startswith(
                    ("int", "bigint", "smallint", "tinyint")
                ):
                    expr = F.col(col) - F.pmod(F.col(col), F.lit(n))
                else:
                    expr = F.substring(F.col(col), 1, n)
                out.append((f"{col}_trunc", expr))
        return out

    def _derived_partition_ddl(self) -> str:
        """Read-schema suffix for transform-derived directory columns
        (string-typed: they come from directory names). Under partition
        evolution the union of EVERY historical spec's derived columns is
        declared — a dir written under another spec simply null-fills the
        columns it never encoded."""
        derived: list[str] = []
        for entry in self.partition_spec_log:
            for name, _canon, is_derived, _src in self._spec_names(
                entry["partition_by"]
            ):
                if is_derived and name not in derived:
                    derived.append(name)
        return "".join(f", {name} string" for name in derived)

    def _pf_scope(self, pf: str) -> dict[str, str] | None:
        """Precompute (once per scan, not per dir) what a partition
        filter needs from a dir's spec: {derived dir column referenced by
        ``pf`` -> its canonical transform in the LATEST spec defining it}.
        Returns None when the filter references no derived column (always
        applicable). The canonical transform matters: ``bucket(4, k)``
        and ``bucket(8, k)`` share the dir column name ``k_bucket`` but
        encode different values — a name-only match would silently drop
        rows from old-spec dirs."""
        log = self.partition_spec_log
        ref_defs: dict[str, str] = {}
        for entry in log:  # later entries overwrite: latest definition wins
            for name, canon, derived, _src in self._spec_names(
                entry["partition_by"]
            ):
                if derived:
                    ref_defs[name] = canon
        referenced = {
            tok
            for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", pf)
            if tok in ref_defs
        }
        if not referenced:
            return None
        return {name: ref_defs[name] for name in referenced}

    def _partition_filter_applies(
        self, d: str, pf: str, scope: dict[str, str] | None = ...
    ) -> bool:
        """Whether ``pf`` may be applied to rows read from dir ``d``.

        Partition evolution makes transform-derived dir columns
        spec-dependent: a dir written under a spec that never encoded
        ``p_partkey_bucket`` reads it as NULL, and filtering on it would
        silently DROP every row of that dir. A filter therefore only
        applies to dirs whose own spec derives every referenced transform
        column WITH THE SAME canonical transform (name alone is not
        enough — see ``_pf_scope``); other dirs pass through unfiltered —
        conservative (extra rows for the residual to handle), never
        wrong. Identity partition columns live in the table schema and
        are recoverable from every dir (file or dir name), so they never
        gate."""
        if scope is ...:
            scope = self._pf_scope(pf)
        if scope is None or len(self.partition_spec_log) == 1:
            return True
        m = re.search(r"snap-(\d+)", os.path.basename(d))
        seq = int(m.group(1)) if m else 0
        mine = {
            name: canon
            for name, canon, derived, _src in self._spec_names(
                self._spec_for_seq(seq)
            )
            if derived
        }
        return all(mine.get(name) == canon for name, canon in scope.items())

    def _maybe_filter_dir(
        self, df: DataFrame, d: str, pf: str | None, scope
    ) -> DataFrame:
        """Shared per-dir filter application for both read paths (plain
        and MoR-with-seq) so the scoping rule cannot diverge between
        them."""
        if pf and self._partition_filter_applies(d, pf, scope):
            return df.filter(pf)
        return df

    def _write_data_dir(
        self,
        df: DataFrame,
        path: str,
        max_records_per_file: int | None = None,
    ) -> None:
        self._check_writable()
        spec = self._partition_spec()
        for name, expr in spec:
            if expr is not None:
                df = df.withColumn(name, expr)
        sort_order = self._meta["properties"].get("write.sort-order")
        if sort_order:
            # Iceberg WRITE ORDERED BY analog: cluster rows inside each
            # task's files so parquet row-group min/max (and the dir stats
            # above) stay narrow — the write-side half of data skipping.
            # "col [DESC][, col2 ...]" — task-local sort, no extra shuffle.
            cols = []
            for piece in sort_order.split(","):
                toks = piece.split()
                col = F.col(toks[0])
                if len(toks) > 1 and toks[1].upper() == "DESC":
                    col = col.desc()
                cols.append(col)
            df = df.sortWithinPartitions(*cols)
        writer = df.write.mode("overwrite")
        if max_records_per_file:
            # target-file-size-bytes analog: the writer splits oversized
            # tasks so compaction can hit a file-size target regardless of
            # upstream partitioning
            writer = writer.option(
                "maxRecordsPerFile", max_records_per_file
            )
        if spec:
            writer = writer.partitionBy(*[name for name, _ in spec])
        writer.parquet(path)
        self._record_dir_stats(path)

    def _record_dir_stats(self, path: str) -> None:
        """Iceberg manifest-stats analog: per-data-dir min/max for numeric
        columns, persisted in table metadata at write time. Scans consult
        these to skip whole dirs whose range excludes a predicate, before
        any file is listed. Stored under the CURRENT column names; after a
        rename, old stats simply stop matching and pruning degrades to
        conservative (read everything), never to wrong answers.

        Read from the parquet FOOTER row-group statistics (the same
        numbers real Iceberg lifts into its manifests), at O(files)
        driver-side metadata cost — the previous full Spark read+agg job
        per write charged every table commit one extra job (round-10
        optimization; same move as ``_bump_row_id_watermark``). Identity
        partition values are parsed from the ``name=value`` dir layout
        (they are not stored in the files). Any footer gap — missing
        stats, exotic types (decimal bytes), unparsable partition dirs —
        falls back to the exact read+agg job, never to wrong stats."""
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        numeric = {
            f.name: f.dataType.typeName()
            for f in declared
            if f.dataType.typeName()
            in ("integer", "long", "short", "double", "float", "decimal")
        }
        if not numeric:
            return
        try:
            stats = self._dir_stats_from_footers(path, numeric)
        except Exception:
            stats = None  # unreadable footer: the exact job decides
        if stats is None:
            stats = self._dir_stats_from_read(path, list(numeric))
            if stats is None:
                return
        self._meta.setdefault("dir_stats", {})[path] = stats

    def _dir_stats_from_footers(
        self, path: str, numeric: dict[str, str]
    ) -> dict | None:
        """Per-column [lo, hi] from parquet footers + partition dir names;
        None when any footer lacks usable stats (caller falls back)."""
        import glob as _glob
        import math as _math

        import pyarrow.parquet as _pq

        integral = {"integer", "long", "short"}
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}

        def _update(col: str, mn: object, mx: object) -> bool:
            if isinstance(mn, bool) or not isinstance(mn, (int, float)):
                return False  # decimal-as-bytes or exotic: use the exact job
            if isinstance(mn, float) and (
                _math.isnan(mn) or _math.isnan(mx)  # type: ignore[arg-type]
            ):
                return False  # NaN stats: Spark max() semantics differ
            if col not in lo:
                lo[col], hi[col] = mn, mx
            else:
                lo[col] = min(lo[col], mn)  # type: ignore[type-var]
                hi[col] = max(hi[col], mx)  # type: ignore[type-var]
            return True

        for f in _glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        ):
            # identity-partition values live in the dir layout, not the file
            for piece in os.path.relpath(f, path).split(os.sep)[:-1]:
                name, eq, raw = piece.partition("=")
                if not eq or name not in numeric:
                    continue
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    continue  # null partition value: min/max ignore nulls
                try:
                    v = (
                        int(raw)
                        if numeric[name] in integral
                        else float(raw)
                    )
                except ValueError:
                    return None
                if not _update(name, v, v):
                    return None
            md = _pq.ParquetFile(f).metadata
            names = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for col in numeric:
                idx = names.get(col)
                if idx is None:
                    continue  # partition col (above) or evolved-away col
                for rg in range(md.num_row_groups):
                    chunk = md.row_group(rg).column(idx)
                    st = chunk.statistics
                    if st is not None and st.num_values == 0:
                        continue  # all-null row group: nothing to record
                    if st is None or not st.has_min_max:
                        return None
                    if not _update(col, st.min, st.max):
                        return None
        stats: dict[str, list] = {}
        for col in numeric:
            if col not in lo:
                continue
            l, h = lo[col], hi[col]
            # Keep integral stats EXACT (json ints are arbitrary
            # precision): float coercion rounds values >2^53 and a
            # rounded-down hi could wrongly satisfy `hi <= val`,
            # skipping a dir that contains matching rows. Non-integral
            # values are widened OUTWARD so pruning stays conservative
            # under any representation error.
            if isinstance(l, int) and isinstance(h, int):
                stats[col] = [l, h]
            else:
                stats[col] = [
                    _math.nextafter(float(l), -_math.inf),
                    _math.nextafter(float(h), _math.inf),
                ]
        return stats

    def _dir_stats_from_read(
        self, path: str, numeric: list[str]
    ) -> dict | None:
        """Exact fallback: one Spark read+agg over the just-written dir."""
        try:
            df = self._read_one_dir(path, self.schema_ddl + f", {_ROW_ID} long")
        except Exception:
            return None
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in numeric],
            *[F.max(c).alias(f"hi_{c}") for c in numeric],
        ).collect()[0]
        stats = {}
        for c in numeric:
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            if lo is not None:
                if isinstance(lo, int) and isinstance(hi, int):
                    stats[c] = [lo, hi]
                else:
                    import math as _math

                    stats[c] = [
                        _math.nextafter(float(lo), -_math.inf),
                        _math.nextafter(float(hi), _math.inf),
                    ]
        return stats

    _SIMPLE_PRED = None  # compiled lazily below

    def _prune_dirs_by_stats(
        self, dirs: list[str], data_filter: str
    ) -> list[str]:
        """Drop dirs whose recorded min/max provably exclude the filter.
        Only simple AND-ed numeric comparisons (`col <op> literal`) prune;
        anything else (ORs, expressions, strings) is conservatively kept —
        the same residual-evaluation posture as Iceberg manifest pruning."""
        import re

        if LocalTable._SIMPLE_PRED is None:
            LocalTable._SIMPLE_PRED = re.compile(
                r"^\s*(\w+)\s*(<=|>=|<|>|==|=)\s*(-?\d+(?:\.\d+)?)\s*$"
            )
        if re.search(r"\bOR\b", data_filter, re.IGNORECASE):
            return dirs
        conjuncts = []
        for part in re.split(r"\bAND\b", data_filter, flags=re.IGNORECASE):
            m = LocalTable._SIMPLE_PRED.match(part)
            if m:
                lit = m.group(3)
                # integer literals stay int: Python int/float comparisons
                # are exact, so >2^53 literals don't round
                conjuncts.append(
                    (m.group(1), m.group(2), float(lit) if "." in lit else int(lit))
                )
        if not conjuncts:
            return dirs
        all_stats = self._meta.get("dir_stats", {})
        kept = []
        for d in dirs:
            stats = all_stats.get(d)
            skip = False
            if stats:
                for col, op, val in conjuncts:
                    if col not in stats:
                        continue
                    lo, hi = stats[col]
                    if (
                        (op == ">" and hi <= val)
                        or (op == ">=" and hi < val)
                        or (op == "<" and lo >= val)
                        or (op == "<=" and lo > val)
                        or (op in ("=", "==") and not (lo <= val <= hi))
                    ):
                        skip = True
                        break
            if not skip:
                kept.append(d)
        return kept

    def _align_to_schema(self, df: DataFrame) -> DataFrame:
        """Project/cast incoming rows to the declared schema (missing
        columns null-fill — schema evolution; extras are rejected)."""
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        extra = set(df.columns) - set(declared.fieldNames()) - {_ROW_ID}
        if extra:
            raise TableError(f"columns not in table schema: {sorted(extra)}")
        return df.select(
            *[
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in declared
            ]
        )

    def insert(self, df: DataFrame, branch: str | None = None) -> Snapshot:
        """INSERT INTO ... (reference internal/create_demo_table.py:117-127).

        Appends a new data dir; never touches existing files (snapshot
        isolation). Written partitioned by the identity partition columns.
        ``branch`` stages the commit on a branch ref (WAP) instead of
        advancing the table's current snapshot.
        """
        cur = self._base_snapshot(branch)
        row_id_base = int(self._meta["next_row_id"])
        with_ids = self._assign_row_ids(self._align_to_schema(df))
        snap_id = max(s["id"] for s in self._meta["snapshots"]) + 1
        path = self._next_dir("data", snap_id)
        self._write_data_dir(with_ids, path)
        self._bump_row_id_watermark(path)
        return self._commit(
            "append",
            cur.data_dirs + [path],
            list(cur.delete_dirs),
            branch=branch,
            eq_deletes=cur.eq_deletes,
            fresh_row_dirs=[path],
            row_id_base=row_id_base,
        )

    def insert_values(self, rows: list[tuple]) -> Snapshot:
        """INSERT INTO ... VALUES literal batch (create_demo_table.py:117-127)."""
        return self.insert(self.spark.createDataFrame(rows, self.schema_ddl))

    def insert_overwrite(self, df: DataFrame) -> Snapshot:
        """INSERT OVERWRITE — Iceberg's dynamic partition overwrite: one
        atomic commit that replaces EXACTLY the partitions present in the
        incoming rows and leaves every other partition's files untouched
        (the backfill/restatement idiom). Unpartitioned tables degrade to
        a full-table replace whose snapshot cites only the new data dir —
        prior snapshots keep their dir lists, so time travel still reads
        the pre-overwrite data.

        Scale: the touched-partition list is a DISTINCT over the incoming
        rows' partition transforms (metadata-sized — bounded by partition
        count, never row count) broadcast against the scan, so the delete
        side is one semi-join; no shuffle of existing table data, no
        rewrite of untouched partitions.
        """
        cur = self.current_snapshot()
        aligned = self._align_to_schema(df)
        spec = self._partition_spec()
        row_id_base = int(self._meta["next_row_id"])
        snap_id = max(s["id"] for s in self._meta["snapshots"]) + 1
        data_path = self._next_dir("data", snap_id)
        with_ids = self._assign_row_ids(aligned)
        self._write_data_dir(with_ids, data_path)
        self._bump_row_id_watermark(data_path)
        if not spec:
            return self._commit(
                "overwrite",
                [data_path],
                [],
                eq_deletes=[],
                fresh_row_dirs=[data_path],
                row_id_base=row_id_base,
            )
        names = [name for name, _ in spec]
        exprs = [
            (expr if expr is not None else F.col(name)).alias(name)
            for name, expr in spec
        ]
        touched = aligned.select(*exprs).distinct()
        # NULL-safe equality: Iceberg treats NULL as a partition value —
        # incoming NULL-partition rows must REPLACE existing ones, and a
        # plain equi-join would never match them
        cond = F.lit(True)
        for n in names:
            cond = cond & F.col(f"t.{n}").eqNullSafe(F.col(f"p.{n}"))
        matched = (
            self._scan_raw(cur)
            .select(_ROW_ID, *exprs)
            .alias("t")
            .join(F.broadcast(touched.alias("p")), cond, "left_semi")
            .select(_ROW_ID)
        )
        del_path = self._next_dir("deletes", snap_id)
        matched.write.mode("overwrite").parquet(del_path)
        return self._commit(
            "overwrite",
            cur.data_dirs + [data_path],
            cur.delete_dirs + [del_path],
            eq_deletes=cur.eq_deletes,
            fresh_row_dirs=[data_path],
            row_id_base=row_id_base,
        )

    @property
    def imported_dirs(self) -> dict:
        """Dirs registered via ``add_files``: ``{dir: {"seq": commit_seq,
        "files": {file_path: first_row_id}}}`` (read-only copy)."""
        return dict(self._meta.get("imported_dirs", {}))

    def add_files(self, source_dir: str) -> Snapshot:
        """CALL system.add_files analog — the Iceberg migration
        procedure: register EXISTING parquet files as table data without
        rewriting a byte. The commit cites the external dir; row ids are
        assigned LAZILY, V3-style: each file gets a ``first_row_id`` at
        import time and readers compute ``first_row_id + row position in
        file`` (``_metadata.row_index``) — deterministic, so positional
        deletes and row lineage work on imported data exactly as on
        managed data.

        Costs at import: one footer-level per-file row count (metadata-
        sized), zero data movement. Restricted to unpartitioned tables —
        imported files carry no partition layout.
        """
        if self._partition_spec():
            raise TableError(
                "add_files requires an unpartitioned table (imported "
                "files carry no partition layout)"
            )
        # duplicate-import guard (Iceberg add_files check_duplicate_files):
        # citing the dir twice would read every row twice under the SAME
        # row ids, and re-basing first_row_id would re-point existing
        # positional deletes at the wrong rows
        if source_dir in self._meta.get("imported_dirs", {}):
            raise TableError(f"{source_dir} was already imported")
        if source_dir in self.current_snapshot().data_dirs:
            raise TableError(f"{source_dir} is already table data")
        probe = self.spark.read.parquet(source_dir)
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        extra = set(probe.columns) - set(declared.fieldNames())
        if _ROW_ID in probe.columns:
            raise TableError(
                f"source files already carry {_ROW_ID} — use insert() "
                f"for data exported from a managed table"
            )
        if extra:
            raise TableError(f"columns not in table schema: {sorted(extra)}")
        per_file = sorted(
            (r["fp"], r["n"])
            for r in probe.groupBy(
                F.col("_metadata.file_path").alias("fp")
            )
            .agg(F.count("*").alias("n"))
            .collect()
        )
        row_id_base = base = int(self._meta["next_row_id"])
        files: dict[str, int] = {}
        for fp, n in per_file:
            files[fp] = base
            base += int(n)
        self._meta["next_row_id"] = base
        if self.format_version >= 3:
            self._meta["properties"]["next-row-id"] = str(base)
        cur = self.current_snapshot()
        snap_id = max(s["id"] for s in self._meta["snapshots"]) + 1
        self._meta.setdefault("imported_dirs", {})[source_dir] = {
            "seq": snap_id,
            "files": files,
        }
        return self._commit(
            "append",
            cur.data_dirs + [source_dir],
            list(cur.delete_dirs),
            eq_deletes=cur.eq_deletes,
            row_id_base=row_id_base,
        )

    def delete_where(
        self, predicate: str | Column, branch: str | None = None
    ) -> Snapshot:
        """DELETE FROM ... WHERE <pred> (reference create_demo_table.py:130).

        merge-on-read (default): append a positional delete file holding the
        matched `_row_id`s — O(deleted rows) write amplification.
        copy-on-write: rewrite data dirs without the matched rows.
        """
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        cur = self._base_snapshot(branch)
        matched = self._scan_raw(cur).filter(cond).select(_ROW_ID)
        snap_id = max(s["id"] for s in self._meta["snapshots"]) + 1
        if self._meta["properties"].get("write.delete.mode") == "merge-on-read":
            path = self._next_dir("deletes", snap_id)
            matched.write.mode("overwrite").parquet(path)
            return self._commit(
                "delete",
                list(cur.data_dirs),
                cur.delete_dirs + [path],
                branch=branch,
                eq_deletes=cur.eq_deletes,
            )
        # copy-on-write: one full rewrite, zero delete files
        remaining = self._scan_raw(cur).join(
            F.broadcast(matched), _ROW_ID, "left_anti"
        )
        path = self._next_dir("data", snap_id)
        self._write_data_dir(remaining, path)
        return self._commit("delete", [path], [], branch=branch)

    def delete_by_keys(
        self,
        keys_df: DataFrame,
        eq_cols: list[str],
        branch: str | None = None,
    ) -> Snapshot:
        """Equality delete (Iceberg's second MoR delete flavor, the one
        streaming CDC writers emit): append a delete file holding KEY
        VALUES instead of row positions. At read time the keys anti-join
        data committed BEFORE this delete's sequence number — rows
        inserted later with the same key are NOT deleted. O(1) write cost
        per key: no scan of the table happens here at all (the whole
        point vs ``delete_where``, which must find matching positions).
        """
        declared = {
            f.name for f in self.spark.createDataFrame([], self.schema_ddl).schema
        }
        missing = set(eq_cols) - declared
        if missing:
            raise TableError(f"equality columns not in schema: {sorted(missing)}")
        cur = self._base_snapshot(branch)
        snap_id = max(s["id"] for s in self._meta["snapshots"]) + 1
        path = self._reserve_dir(
            os.path.join(self.root, "deletes", f"snap-{snap_id:05d}-eq")
        )
        keys_df.select(*eq_cols).distinct().write.mode("overwrite").parquet(
            path
        )
        entry = {"dir": path, "cols": list(eq_cols), "seq": snap_id}
        return self._commit(
            "delete",
            list(cur.data_dirs),
            list(cur.delete_dirs),
            branch=branch,
            eq_deletes=cur.eq_deletes + [entry],
        )

    def update_set(
        self,
        assignments: dict[str, str | Column],
        predicate: str | Column,
        branch: str | None = None,
    ) -> Snapshot:
        """UPDATE ... SET col = expr WHERE <pred> (create_demo_table.py:133).

        MoR semantics exactly as Iceberg executes it: matched rows get a
        positional delete entry AND are re-appended rewritten (with fresh
        row ids — lineage records the rewrite).
        """
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        cur = self._base_snapshot(branch)
        raw = self._scan_raw(cur)
        # persisted: feeds the delete file AND the rewrite (MoR), so the
        # MoR scan runs once per UPDATE, not once per output (round-8
        # perf item, the merge_into lesson); bounded by the predicate's
        # matched set. Released after the commit.
        matched = raw.filter(cond).persist()
        # try/finally: a CommitConflictError (or any validation raise)
        # must not leak the cached frame (round-8 review finding)
        try:
            rewritten = self._apply_assignments(matched.drop(_ROW_ID), assignments)
            snap_id = max(s["id"] for s in self._meta["snapshots"]) + 1
            row_id_base = int(self._meta["next_row_id"])
            if self._meta["properties"].get("write.update.mode") == "merge-on-read":
                del_path = self._next_dir("deletes", snap_id)
                matched.select(_ROW_ID).write.mode("overwrite").parquet(del_path)
                data_path = self._next_dir("data", snap_id)
                carried = self.format_version >= 3
                if carried:
                    # V3 row lineage: the rewritten row KEEPS its _row_id
                    # (Iceberg V3 carried-over row ids — incremental consumers
                    # can track a logical row across updates). The tombstone
                    # above still hides the OLD position; the seq-scoped
                    # delete application (flagged here) keeps the carried copy
                    # visible. (rewritten above had _ROW_ID dropped — rebuild
                    # the SET projection from `matched` keeping the id.)
                    with_ids = self._apply_assignments(matched, assignments)
                    self._meta["carried_row_ids"] = True
                else:
                    with_ids = self._assign_row_ids(rewritten)
                self._write_data_dir(with_ids, data_path)
                self._bump_row_id_watermark(data_path)
                snap = self._commit(
                    "update",
                    cur.data_dirs + [data_path],
                    cur.delete_dirs + [del_path],
                    branch=branch,
                    eq_deletes=cur.eq_deletes,
                    # V3 carried rows keep their original ids — nothing to
                    # shift on rebase; V2 rewrites got fresh ids
                    fresh_row_dirs=[] if carried else [data_path],
                    row_id_base=None if carried else row_id_base,
                )
                return snap
            # copy-on-write. NULL-predicate rows are NOT matched (SQL
            # three-valued logic) and must be KEPT: a bare ~cond is NULL for
            # them too, which would silently drop the rows from the single
            # rewritten dir (round-8 review finding; the MoR branch never
            # had the problem because unmatched rows stay in their dir).
            untouched = raw.filter(~F.coalesce(cond, F.lit(False))).drop(_ROW_ID)
            merged = untouched.unionByName(rewritten)
            data_path = self._next_dir("data", snap_id)
            with_ids = self._assign_row_ids(merged)
            self._write_data_dir(with_ids, data_path)
            self._bump_row_id_watermark(data_path)
            snap = self._commit(
                "update",
                [data_path],
                [],
                branch=branch,
                fresh_row_dirs=[data_path],
                row_id_base=row_id_base,
            )
            return snap
        finally:
            matched.unpersist()

    def _apply_assignments(
        self, df: DataFrame, assignments: dict[str, str | Column]
    ) -> DataFrame:
        """Apply SET ``col = expr`` projections with each result cast
        back to the DECLARED column type: SET expressions must not drift
        the schema (decimal arithmetic widens — amount*1.1 on
        DECIMAL(10,2) is DECIMAL(13,3); Iceberg casts back). One
        implementation for both the fresh-id and V3 carried-row paths of
        ``update_set`` (review finding: the duplicated loops drifted
        apart in maintenance)."""
        declared = {
            f.name: f.dataType
            for f in self.spark.createDataFrame([], self.schema_ddl).schema
        }
        for col, expr in assignments.items():
            value = F.expr(expr) if isinstance(expr, str) else expr
            if col in declared:
                value = value.cast(declared[col])
            df = df.withColumn(col, value)
        return df

    def merge_into(
        self,
        source: DataFrame,
        on: list[str],
        when_matched: str | dict[str, str | Column] | None = "update",
        when_not_matched: str | dict[str, str] | None = "insert",
        matched_condition: str | None = None,
        not_matched_condition: str | None = None,
    ) -> Snapshot:
        """MERGE INTO target USING source ON keys — the third leg of
        Iceberg's row-level DML (DELETE/UPDATE/MERGE), MoR semantics:
        matched target rows get delete entries; their replacements (and
        not-matched source rows) are appended in one commit.

        ``when_matched``: "update" (take all source columns), "delete",
        a dict of SET expressions evaluated against the matched join
        (source columns win on name clashes), or None (leave matched
        rows untouched).
        ``when_not_matched``: "insert" (take all source columns — the
        source must then cover the full schema), a dict of
        ``column -> SQL expression`` implementing
        ``INSERT (cols) VALUES (exprs)`` (expressions may use ``s.``
        qualifiers; columns not listed land as typed NULL, the Spark
        MERGE column-list contract), or None.
        ``matched_condition`` / ``not_matched_condition``: optional SQL
        predicates (may use ``t.`` / ``s.`` qualifiers) implementing
        ``WHEN [NOT] MATCHED AND <cond>`` — matched rows that fail the
        condition are left untouched (no delete entry, no rewrite), and
        unmatched source rows that fail theirs are not inserted.

        Scale: ONE equi-join keyed on ``on`` between target scan and
        source — broadcast when the source is small (the common upsert
        case), AQE otherwise. The join result (bounded by the source
        size in the upsert pattern) is PERSISTED and feeds the delete
        file, the rewrite rows, and the not-matched anti-join, so the
        target scan executes once per MERGE instead of once per output
        (round-8 perf item: this was 2-3 table scans per streaming
        batch). Everything else is appends.
        """
        cur = self.current_snapshot()
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        cols = declared.fieldNames()
        t = self._scan_raw(cur).alias("t")
        s = source.alias("s")
        cond = F.lit(True)
        for k in on:
            cond = cond & (F.col(f"t.{k}") == F.col(f"s.{k}"))
        matched_raw = t.join(s, cond, "inner").persist()
        # try/finally: a CommitConflictError (the contended-writer
        # case this persist exists to make cheap to retry) or any
        # validation raise must not leak the cached join (round-8
        # review finding)
        try:
            matched = matched_raw
            if matched_condition:
                matched = matched.filter(F.expr(matched_condition))
            # not-matched source rows = source anti-joined against the
            # (persisted, batch-bounded) MATCHED KEYS — not against the full
            # table scan, which would re-execute the MoR merge per output.
            # Key semantics are identical: a null-keyed source row matches
            # nothing under equality either way and stays "not matched".
            matched_keys = matched_raw.select(
                *[F.col(f"s.{k}").alias(k) for k in on]
            ).distinct()
            new_rows = []
            if when_matched == "update":
                # source columns win; table fills the rest (classic upsert)
                new_rows.append(
                    matched.select(
                        *[
                            F.col(f"s.{c}" if c in source.columns else f"t.{c}").alias(c)
                            for c in cols
                        ]
                    )
                )
            elif isinstance(when_matched, dict):
                # SET expressions may use t.col / s.col qualifiers
                updated = matched
                assigned = {}
                for col, expr in when_matched.items():
                    value = F.expr(expr) if isinstance(expr, str) else expr
                    value = value.cast(declared[col].dataType)
                    tmp = f"__set_{col}"
                    updated = updated.withColumn(tmp, value)
                    assigned[col] = tmp
                new_rows.append(
                    updated.select(
                        *[
                            F.col(assigned[c]).alias(c)
                            if c in assigned
                            else F.col(f"t.{c}").alias(c)
                            for c in cols
                        ]
                    )
                )
            elif when_matched not in ("delete", None):
                raise TableError(f"bad when_matched: {when_matched!r}")
            if when_not_matched == "insert":
                missing = [c for c in cols if c not in source.columns]
                if missing:
                    raise TableError(
                        f"when_not_matched='insert' needs all table columns in "
                        f"source; missing {missing}"
                    )
                unmatched_src = s.join(matched_keys, on, "left_anti")
                if not_matched_condition:
                    unmatched_src = unmatched_src.filter(
                        F.expr(not_matched_condition)
                    )
                new_rows.append(unmatched_src.select(*cols))
            elif isinstance(when_not_matched, dict):
                # SQL identifiers are case-insensitive: normalize the INSERT
                # column list to the declared casing before validating
                canon = {c.lower(): c for c in cols}
                unknown = [
                    c for c in when_not_matched if c.lower() not in canon
                ]
                if unknown:
                    raise TableError(
                        f"INSERT column(s) not in table schema: {unknown}"
                    )
                when_not_matched = {
                    canon[c.lower()]: v for c, v in when_not_matched.items()
                }
                unmatched_src = s.join(matched_keys, on, "left_anti")
                if not_matched_condition:
                    unmatched_src = unmatched_src.filter(
                        F.expr(not_matched_condition)
                    )
                new_rows.append(
                    unmatched_src.select(
                        *[
                            (
                                F.expr(when_not_matched[c])
                                if c in when_not_matched
                                else F.lit(None)
                            )
                            .cast(declared[c].dataType)
                            .alias(c)
                            for c in cols
                        ]
                    )
                )
            elif when_not_matched is not None:
                raise TableError(f"bad when_not_matched: {when_not_matched!r}")

            snap_id = max(s2["id"] for s2 in self._meta["snapshots"]) + 1
            delete_dirs = list(cur.delete_dirs)
            data_dirs = list(cur.data_dirs)
            if when_matched is not None:
                del_path = self._next_dir("deletes", snap_id)
                matched.select(F.col(f"t.{_ROW_ID}").alias(_ROW_ID)).write.mode(
                    "overwrite"
                ).parquet(del_path)
                delete_dirs.append(del_path)
            appended = None
            for df in new_rows:
                appended = df if appended is None else appended.unionByName(df)
            fresh_row_dirs: list[str] = []
            row_id_base = int(self._meta["next_row_id"])
            if appended is not None:
                data_path = self._next_dir("data", snap_id)
                with_ids = self._assign_row_ids(appended)
                self._write_data_dir(with_ids, data_path)
                self._bump_row_id_watermark(data_path)
                data_dirs.append(data_path)
                fresh_row_dirs = [data_path]
            snap = self._commit(
                "merge",
                data_dirs,
                delete_dirs,
                eq_deletes=cur.eq_deletes,
                fresh_row_dirs=fresh_row_dirs,
                row_id_base=row_id_base if fresh_row_dirs else None,
            )
            return snap
        finally:
            matched_raw.unpersist()

    # ----------------------------------------------------- schema evolution

    def _log_schema(self) -> None:
        """Record the CURRENT schema as superseded at the current commit
        sequence — the Iceberg metadata `schemas` list, emulated. Called
        by every schema mutator before it rewrites `schema_ddl`, so
        ``schema_at`` can resolve the schema any snapshot was written
        under."""
        self._meta.setdefault("schema_log", []).append(
            {
                "until_seq": self._meta["current_snapshot_id"],
                "schema_ddl": self.schema_ddl,
            }
        )

    def schema_at(self, snapshot_id: int) -> str:
        """The schema DDL in effect at ``snapshot_id`` (Iceberg's
        schema-id-per-snapshot lookup): the first logged schema
        superseded at-or-after that snapshot, else the current schema."""
        for entry in self._meta.get("schema_log", []):
            if snapshot_id <= entry["until_seq"]:
                return entry["schema_ddl"]
        return self.schema_ddl

    def add_column(
        self, name: str, dtype: str, default: str | None = None
    ) -> None:
        """ALTER TABLE ADD COLUMN — existing files are not rewritten; old
        rows read the new column as NULL (Iceberg schema evolution).

        ``default`` (a SQL literal string, e.g. ``"'unknown'"`` or
        ``"0"``) is Iceberg V3's *initial-default*: rows written BEFORE
        the ALTER read the default instead of NULL, still with zero file
        rewrites — the dir's commit sequence decides which side of the
        ALTER it is on. V2 tables only support a NULL initial default
        (the Iceberg spec gates non-null defaults on format-version 3),
        so a non-null default on a V2 table is refused. Rows written
        AFTER the ALTER store real values; a post-ALTER NULL stays NULL
        (the default is not a read-time coalesce for new data)."""
        schema = self.spark.createDataFrame([], self.schema_ddl).schema
        if name in schema.fieldNames():
            raise TableError(f"column {name} already exists")
        if default is not None and self.format_version < 3:
            raise TableError(
                "non-null column defaults require format-version 3 "
                f"(table is V{self.format_version}); upgrade first"
            )
        if any(
            name in (r["from"], r["to"])
            for r in self._meta.get("renames", [])
        ):
            # Iceberg disambiguates reused names via field ids; this
            # emulation matches by physical name, so a reused name would
            # collide with bytes written under the old meaning.
            raise TableError(
                f"column name {name} appears in the rename history; "
                "pick a fresh name"
            )
        self._log_schema()
        self._meta["schema_ddl"] = f"{self.schema_ddl}, {name} {dtype}"
        if default is not None:
            # same seq convention as the rename log: dirs with
            # snap-seq <= this seq predate the ALTER and read the default
            self._meta.setdefault("column_defaults", {})[name] = {
                "seq": self._schema_change_seq(),
                "sql": default,
                "dtype": dtype,
            }
        self._write_meta()

    def _schema_change_seq(self) -> int:
        """Sequence recorded for a metadata-only schema change (rename /
        initial default). Snapshot ids are allocated GLOBALLY across
        branches, so the MAIN head alone is not a safe boundary: a branch
        data dir committed before the ALTER can carry an id greater than
        the MAIN head and would wrongly classify as post-ALTER. The
        global high-water mark makes every dir written before the ALTER,
        on any branch, classify as pre-ALTER."""
        snaps = self._meta.get("snapshots") or []
        return max(
            (s["id"] for s in snaps),
            default=self._meta["current_snapshot_id"],
        )

    _PROMOTIONS = {
        "tinyint": {"smallint", "int", "bigint"},
        "smallint": {"int", "bigint"},
        "int": {"bigint"},
        "float": {"double"},
    }

    def widen_column(self, name: str, new_type: str) -> None:
        """ALTER COLUMN ... TYPE — Iceberg type promotion (int->bigint,
        float->double, decimal precision growth at fixed scale).

        Metadata-only: Spark's vectorized parquet reader upcasts narrower
        physical types to the declared read schema on the fly, so files
        written before the promotion are never rewritten. Promotions
        outside Iceberg's legal set are refused (they would silently
        corrupt or fail at read time).
        """
        schema = self.spark.createDataFrame([], self.schema_ddl).schema
        cur = None
        for f in schema:
            if f.name == name:
                cur = f.dataType.simpleString()
        if cur is None:
            raise TableError(f"no column {name}")
        new = new_type.strip().lower().replace(" ", "")
        ok = new in self._PROMOTIONS.get(cur, set())
        if not ok and cur.startswith("decimal(") and new.startswith("decimal("):
            p1, s1 = map(int, cur[8:-1].split(","))
            p2, s2 = map(int, new[8:-1].split(","))
            ok = s2 == s1 and p2 > p1
        if not ok:
            raise TableError(f"illegal type promotion {cur} -> {new_type}")
        self._log_schema()
        self._meta["schema_ddl"] = ", ".join(
            f"{f.name} {new if f.name == name else f.dataType.simpleString()}"
            for f in schema
        )
        self._write_meta()

    def rename_column(self, old: str, new: str) -> None:
        """ALTER TABLE RENAME COLUMN — metadata-only, no file rewrite.

        Iceberg renames are free because files reference columns by field
        id; this parquet emulation matches by name, so the table metadata
        keeps a rename log keyed by commit sequence and the read path
        resolves each data dir's physical column names from the log
        (dirs encode their commit sequence in the `snap-NNNNN` dir name).
        Old files keep serving their bytes under the new name; files
        written after the rename carry the new name physically.
        """
        schema = self.spark.createDataFrame([], self.schema_ddl).schema
        if old not in schema.fieldNames():
            raise TableError(f"no column {old}")
        if new in schema.fieldNames():
            raise TableError(f"column {new} already exists")
        if old in self.partition_by or any(
            f"({old})" in spec or f" {old})" in spec
            for spec in self.partition_by
        ):
            raise TableError(f"cannot rename partition column {old}")
        if any(
            new in (r["from"], r["to"])
            for r in self._meta.get("renames", [])
        ):
            raise TableError(
                f"column name {new} appears in the rename history; "
                "pick a fresh name"
            )
        for s in self.snapshots():
            if any(old in e["cols"] for e in s.eq_deletes):
                raise TableError(
                    f"cannot rename {old}: equality-delete files key on it"
                )
        self._log_schema()
        self._meta["schema_ddl"] = ", ".join(
            f"{new if f.name == old else f.name} {f.dataType.simpleString()}"
            for f in schema
        )
        self._meta.setdefault("renames", []).append(
            {"seq": self._schema_change_seq(), "from": old, "to": new}
        )
        defaults = self._meta.get("column_defaults", {})
        if old in defaults:  # defaults follow the column across renames
            defaults[new] = defaults.pop(old)
        self._write_meta()

    def drop_column(self, name: str) -> None:
        """ALTER TABLE DROP COLUMN — metadata-only; files keep the bytes,
        scans stop projecting them (Iceberg semantics)."""
        schema = self.spark.createDataFrame([], self.schema_ddl).schema
        if name not in schema.fieldNames():
            raise TableError(f"no column {name}")
        if name in self.partition_by:
            raise TableError(f"cannot drop partition column {name}")
        self._log_schema()
        self._meta["schema_ddl"] = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in schema
            if f.name != name
        )
        self._meta.get("column_defaults", {}).pop(name, None)
        self._write_meta()

    # --------------------------------------------------------------- read

    def _data_read_schema(self) -> str:
        return (
            self.schema_ddl
            + f", {_ROW_ID} long"
            + self._derived_partition_ddl()
        )

    def _read_one_dir(self, d: str, ddl: str) -> DataFrame:
        """Read one snapshot dir with an explicit schema, resolving any
        column renames: a dir written at commit sequence s (from its
        `snap-NNNNN` name) stores, for each current column, the name that
        column had at sequence s (walk the rename log newest->oldest);
        the read projects physical names back to current names. Pure
        metadata resolution — the Iceberg field-id lookup, emulated."""
        imported = self._meta.get("imported_dirs", {}).get(d)
        if imported is not None:
            return self._read_imported_dir(d, ddl, imported)
        renames = self._meta.get("renames", [])
        m = re.search(r"snap-(\d+)", os.path.basename(d))
        seq = int(m.group(1)) if m else 0
        df = None
        if renames:
            fields = [
                (f.name, f.dataType.simpleString())
                for f in self.spark.createDataFrame([], ddl).schema
            ]
            hist = []
            changed = False
            for name, dt in fields:
                h = name
                for r in reversed(renames):
                    if r["to"] == h and seq <= r["seq"]:
                        h = r["from"]
                        changed = True
                hist.append((h, name, dt))
            if changed:
                read_ddl = ", ".join(f"{h} {dt}" for h, _, dt in hist)
                df = (
                    self.spark.read.schema(read_ddl)
                    .option("basePath", d)
                    .parquet(d)
                    .select(*[F.col(h).alias(c) for h, c, _ in hist])
                )
        if df is None:
            # per-dir basePath so identity-partition columns round-trip
            df = self.spark.read.schema(ddl).option("basePath", d).parquet(d)
        # V3 initial-defaults: a dir whose commit sequence predates the
        # ADD COLUMN ... DEFAULT reads the default literal instead of the
        # null-fill; post-ALTER dirs store real values (NULLs included)
        for name, entry in self._meta.get("column_defaults", {}).items():
            if seq <= entry["seq"] and name in df.columns:
                df = df.withColumn(
                    name,
                    F.expr(f"CAST({entry['sql']} AS {entry['dtype']})"),
                )
        return df

    def _read_imported_dir(self, d: str, ddl: str, entry: dict) -> DataFrame:
        """Read a dir registered by ``add_files``: external parquet with
        no ``_row_id`` column. Row ids are computed V3-lazily — the
        file's recorded ``first_row_id`` plus the row's position in the
        file (``_metadata.row_index``, deterministic for parquet) — via a
        literal file->base map (bounded by file count, pure expression,
        no join). Columns the files lack (post-import ADD COLUMNs)
        null-fill; initial-defaults apply via the recorded import seq."""
        fields = list(self.spark.createDataFrame([], ddl).schema)
        phys = self.spark.read.parquet(d)
        base_map = F.create_map(
            *[
                x
                for fp, b in sorted(entry["files"].items())
                for x in (F.lit(fp), F.lit(int(b)))
            ]
        )
        seq = int(entry["seq"])
        renames = self._meta.get("renames", [])

        def _physical(name: str) -> str:
            # the files store the name each column had at import time —
            # same newest->oldest rename walk as _read_one_dir
            h = name
            for r in reversed(renames):
                if r["to"] == h and seq <= r["seq"]:
                    h = r["from"]
            return h

        cols = []
        for f in fields:  # keep the exact ddl column order
            h = _physical(f.name)
            if f.name == _ROW_ID:
                cols.append(
                    (
                        F.element_at(base_map, F.col("_metadata.file_path"))
                        + F.col("_metadata.row_index")
                    ).alias(_ROW_ID)
                )
            elif h in phys.columns:
                cols.append(F.col(h).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        df = phys.select(*cols)
        for name, centry in self._meta.get("column_defaults", {}).items():
            if seq <= centry["seq"] and name in df.columns:
                df = df.withColumn(
                    name,
                    F.expr(f"CAST({centry['sql']} AS {centry['dtype']})"),
                )
        return df

    def _read_dirs(
        self,
        dirs: list[str],
        ddl: str,
        partition_filter: str | None = None,
    ) -> DataFrame | None:
        """Read snapshot dirs with an EXPLICIT schema: a zero-row
        partitioned write leaves a dir with no parquet files at all, and
        schema inference would fail on it (found by the hypothesis DML
        model test). With the schema given, empty dirs read as empty
        frames, and files written before an ADD COLUMN null-fill the
        missing column (schema evolution).

        ``partition_filter`` is applied PER DIR, and only to dirs whose
        own partition spec encodes the referenced transform columns
        (partition evolution; see ``_partition_filter_applies``) — for
        single-spec tables this is exactly the old union-then-filter
        behavior (filter commutes with union), with the filter sitting at
        the scan so Spark prunes directories before listing files."""
        scope = self._pf_scope(partition_filter) if partition_filter else None
        dfs = [
            self._maybe_filter_dir(
                self._read_one_dir(d, ddl), d, partition_filter, scope
            )
            for d in dirs
        ]
        if not dfs:
            return None
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    def _delete_scope_seq(self, d: str, snap: Snapshot) -> int:
        """The commit sequence deletes are scoped against for data dir
        ``d`` when read through snapshot ``snap``: the snapshot's per-dir
        override if one is recorded (cherry-picked dirs adopt the PUBLISH
        snapshot's seq — Iceberg assigns cherry-picked files the new
        snapshot's sequence number, so eq/pos deletes committed between
        staging and publish do not apply to them), else the seq encoded
        in the dir name. The override lives on the publish snapshot and
        its descendants ONLY — the branch snapshot that staged the dir
        keeps the staged seq, so branch-side deletes still apply there.
        Schema/rename/spec scoping deliberately keeps the dir-name seq:
        the files' physical layout is the one they were WRITTEN with,
        only their delete visibility moves."""
        override = snap.seq_overrides.get(d)
        if override is not None:
            return int(override)
        m = re.search(r"snap-(\d+)", os.path.basename(d))
        return int(m.group(1)) if m else 0

    def _read_data_with_seq(
        self, snap: Snapshot, partition_filter: str | None = None
    ) -> DataFrame | None:
        """Union of the snapshot's data dirs, each row tagged with the
        commit sequence parsed from its dir name (`.../snap-00007`),
        or the cherry-pick override (``_delete_scope_seq``).
        ``partition_filter`` follows the same per-dir spec-scoped rule as
        ``_read_dirs`` (shared ``_maybe_filter_dir``)."""
        dfs = []
        ddl = self._data_read_schema()
        scope = self._pf_scope(partition_filter) if partition_filter else None
        for d in snap.data_dirs:
            seq = self._delete_scope_seq(d, snap)
            df = self._read_one_dir(d, ddl).withColumn("_seq", F.lit(seq))
            dfs.append(self._maybe_filter_dir(df, d, partition_filter, scope))
        if not dfs:
            return None
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    def _apply_eq_deletes(self, snap: Snapshot, data: DataFrame) -> DataFrame:
        """Anti-join each equality-delete key set against data rows with
        an OLDER commit sequence (broadcast — key sets are O(deleted
        keys), the fact side never shuffles)."""
        declared = {
            f.name: f.dataType.simpleString()
            for f in self.spark.createDataFrame([], self.schema_ddl).schema
        }
        for entry in snap.eq_deletes:
            cols = entry["cols"]
            read_ddl = ", ".join(f"{c} {declared[c]}" for c in cols)
            keys = (
                self.spark.read.schema(read_ddl)
                .parquet(entry["dir"])
                .select(*[F.col(c).alias(f"_eq_{c}") for c in cols])
            )
            cond = F.lit(True)
            for c in cols:
                cond = cond & (F.col(c) == F.col(f"_eq_{c}"))
            cond = cond & (F.col("_seq") < F.lit(entry["seq"]))
            data = data.join(F.broadcast(keys), on=cond, how="left_anti")
        return data

    def _apply_pos_deletes_seq_scoped(
        self, snap: Snapshot, data: DataFrame
    ) -> DataFrame:
        """Positional tombstones scoped to data committed BEFORE them.

        Under V3 row lineage an UPDATE's rewritten row carries its
        original ``_row_id`` into a NEW data dir in the SAME commit, so a
        global row-id anti-join would tombstone the replacement too. Real
        Iceberg scopes positional delete files to the specific data files
        they reference; the analog here is commit sequence — a delete dir
        at seq N only hits rows from data dirs with seq < N. Deletes stay
        broadcast; the data side never shuffles."""
        dfs = []
        for d in snap.delete_dirs:
            m = re.search(r"snap-(\d+)", os.path.basename(d))
            dseq = int(m.group(1)) if m else 10**9
            dfs.append(
                self._read_one_dir(d, f"{_ROW_ID} long")
                .select(F.col(_ROW_ID).alias("_del_row_id"))
                .withColumn("_dseq", F.lit(dseq))
            )
        if not dfs:
            return data
        deletes = dfs[0]
        for df in dfs[1:]:
            deletes = deletes.unionByName(df)
        cond = (F.col(_ROW_ID) == F.col("_del_row_id")) & (
            F.col("_seq") < F.col("_dseq")
        )
        return data.join(F.broadcast(deletes), on=cond, how="left_anti")

    def _scan_raw(
        self,
        snap: Snapshot | None = None,
        partition_filter: str | None = None,
        data_filter: str | None = None,
    ) -> DataFrame:
        """Merged scan WITH _row_id (MoR anti-join applied), projected to
        the table's CURRENT declared schema (schema evolution: added
        columns null-fill on old files, dropped columns stop projecting).

        ``partition_filter`` may reference transform-derived directory
        columns (e.g. ``ts_day >= '2024-01-01'``) — applied before the
        anti-join, it reaches the file index as partition pruning, so
        non-matching directories are never listed or read."""
        snap = snap or self.current_snapshot()
        self.last_scan_pruning = None
        if snap.eq_deletes or self._meta.get("carried_row_ids"):
            # per-dir reads tagged with their commit sequence so each
            # equality delete (and, under V3 row lineage, each positional
            # tombstone) can scope to older data only (stats pruning is
            # skipped here — conservative, sequences must stay aligned)
            data = self._read_data_with_seq(snap, partition_filter)
        else:
            dirs = snap.data_dirs
            if data_filter:
                dirs = self._prune_dirs_by_stats(dirs, data_filter)
                self.last_scan_pruning = {
                    "candidate_dirs": len(snap.data_dirs),
                    "read_dirs": len(dirs),
                }
            data = self._read_dirs(
                dirs, self._data_read_schema(), partition_filter
            )
        if data is None:
            return self.spark.createDataFrame(
                [], self.schema_ddl + f", {_ROW_ID} long"
            )
        if data_filter:
            # residual: stats pruning only skips whole dirs; the row-level
            # predicate still applies (and commutes with the MoR anti-join)
            data = data.filter(data_filter)
        if snap.eq_deletes:
            data = self._apply_eq_deletes(snap, data)
        if self._meta.get("carried_row_ids"):
            # V3 row lineage: an UPDATE re-appends the row with its
            # ORIGINAL _row_id (Iceberg V3 carried-over row ids), so a
            # positional tombstone must only hit rows committed BEFORE
            # it — the per-(file,position) scoping Iceberg gets from
            # file-referenced delete files, modeled here by commit seq.
            data = self._apply_pos_deletes_seq_scoped(snap, data)
        else:
            deletes = self._read_dirs(snap.delete_dirs, f"{_ROW_ID} long")
            if deletes is not None:
                # The C1 implicit MoR anti-join (README.md:7): delete files
                # are O(deleted rows), broadcast them; data side never
                # shuffles.
                data = data.join(F.broadcast(deletes), _ROW_ID, "left_anti")
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        projection = [
            F.col(f.name)
            if f.name in data.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in declared
        ]
        return data.select(*projection, F.col(_ROW_ID))

    def scan(
        self,
        snapshot_id: int | str | None = None,
        with_row_lineage: bool = False,
        partition_filter: str | None = None,
        data_filter: str | None = None,
        as_of: str | None = None,
    ) -> DataFrame:
        """SELECT * — full MoR-merged read (create_demo_table.py:137).

        ``snapshot_id`` gives time travel (Iceberg VERSION AS OF) — an int
        snapshot id or a tag name.
        ``as_of`` gives Iceberg's other time-travel form (TIMESTAMP AS
        OF): the latest snapshot whose commit timestamp is <= the given
        ISO-8601 UTC instant (snapshot timestamps compare lexically).
        ``with_row_lineage`` exposes the stable ``_row_id`` column — the V3
        row-lineage feature the whole upgrade exists for (README.md:43-45);
        refused on V2 tables exactly as Iceberg gates it on format-version.
        ``partition_filter`` prunes transform-partitioned directories
        (hidden partitioning) before any file is read.
        ``data_filter`` additionally consults the per-dir min/max stats
        recorded at write time (Iceberg manifest-stats analog): data dirs
        whose range provably excludes a simple numeric conjunct are never
        listed or read; the predicate still applies row-level as the
        residual. ``last_scan_pruning`` reports candidate vs read dirs.
        """
        snap = None
        if as_of is not None:
            if snapshot_id is not None:
                raise TableError("pass snapshot_id or as_of, not both")
            snapshot_id = self._snapshot_at(as_of).id
        if isinstance(snapshot_id, str):  # tag/branch name -> snapshot
            refs = {
                **self._meta.get("refs", {}),
                **self._meta.get("branches", {}),
            }
            if snapshot_id not in refs:
                raise TableError(f"no ref {snapshot_id!r}")
            snapshot_id = refs[snapshot_id]
        if snapshot_id is not None:
            for s in self.snapshots():
                if s.id == snapshot_id:
                    snap = s
                    break
            if snap is None:
                raise TableError(f"no snapshot {snapshot_id}")
        if with_row_lineage:
            if self.format_version < 3:
                raise TableError(
                    "row lineage requires format-version 3 "
                    f"(table is V{self.format_version}); upgrade first"
                )
            return self._scan_raw(snap, partition_filter, data_filter)
        return self._scan_raw(snap, partition_filter, data_filter).drop(
            _ROW_ID
        )

    # ------------------------------------------------------ refs / rollback

    def create_tag(self, name: str, snapshot_id: int | None = None) -> None:
        """Iceberg `ALTER TABLE ... CREATE TAG` analog: a named immutable
        ref pinning a snapshot (release audits, reproducible reads).
        Tagged snapshots survive expire_snapshots."""
        snapshot_id = snapshot_id or self._meta["current_snapshot_id"]
        if not any(s.id == snapshot_id for s in self.snapshots()):
            raise TableError(f"no snapshot {snapshot_id}")
        refs = self._meta.setdefault("refs", {})
        if name in refs:
            raise TableError(f"tag {name!r} already exists")
        refs[name] = snapshot_id
        self._write_meta()

    def drop_tag(self, name: str) -> None:
        refs = self._meta.get("refs", {})
        if name not in refs:
            raise TableError(f"no tag {name!r}")
        del refs[name]
        self._write_meta()

    def tags(self) -> dict[str, int]:
        return dict(self._meta.get("refs", {}))

    def create_branch(
        self, name: str, snapshot_id: int | None = None
    ) -> None:
        """Iceberg branch ref: a WRITABLE named head. The write-audit-
        publish pattern: stage commits on the branch (DML ``branch=``
        kwarg), audit them via ``scan(snapshot_id=<branch>)``, then
        ``fast_forward`` to publish."""
        snapshot_id = snapshot_id or self._meta["current_snapshot_id"]
        if not any(s.id == snapshot_id for s in self.snapshots()):
            raise TableError(f"no snapshot {snapshot_id}")
        branches = self._meta.setdefault("branches", {})
        if name in branches or name in self._meta.get("refs", {}):
            raise TableError(f"ref {name!r} already exists")
        branches[name] = snapshot_id
        self._write_meta()

    def drop_branch(self, name: str) -> None:
        branches = self._meta.get("branches", {})
        if name not in branches:
            raise TableError(f"no branch {name!r}")
        del branches[name]
        self._write_meta()

    def branches(self) -> dict[str, int]:
        return dict(self._meta.get("branches", {}))

    def fast_forward(self, branch: str) -> None:
        """Publish a branch: point the table's current snapshot at the
        branch head (Iceberg `fast_forward(main, branch)`) — the publish
        step of write-audit-publish. Metadata-only, nothing rewritten."""
        branches = self._meta.get("branches", {})
        if branch not in branches:
            raise TableError(f"no branch {branch!r}")
        self._meta["current_snapshot_id"] = branches[branch]
        self._write_meta()

    def rollback_to_snapshot(self, snapshot_id: int) -> Snapshot:
        """CALL system.rollback_to_snapshot analog: commit a NEW snapshot
        whose state is the old snapshot's (history is preserved — a
        rollback is itself an auditable commit, exactly like Iceberg).
        The rollback commit's parent is the TARGET, not the abandoned
        head: the rolled-back-away line must leave main's ancestry so
        TIMESTAMP AS OF / rollback_to_timestamp can never resolve back
        onto it (Iceberg ancestorsOf(current) semantics); the abandoned
        snapshots stay in the global list for VERSION AS OF and audit."""
        target = None
        for s in self.snapshots():
            if s.id == snapshot_id:
                target = s
                break
        if target is None:
            raise TableError(f"no snapshot {snapshot_id}")
        return self._commit(
            "rollback",
            list(target.data_dirs),
            list(target.delete_dirs),
            eq_deletes=target.eq_deletes,
            parent_id=target.id,
        )

    def rollback_to_timestamp(self, ts: str) -> Snapshot:
        """CALL system.rollback_to_timestamp analog: roll back to the
        latest MAIN-ancestry snapshot whose commit timestamp is <= the
        given ISO-8601 UTC instant (same resolution rule as TIMESTAMP AS
        OF reads, via the shared ``_snapshot_at``; space/'Z'/offset
        instants are canonicalized; unpublished branch staging commits
        are never eligible — rolling back must not publish them)."""
        return self.rollback_to_snapshot(self._snapshot_at(ts).id)

    def set_current_snapshot(self, snapshot_id: int) -> Snapshot:
        """CALL system.set_current_snapshot analog: point the table at
        ANY existing snapshot — unlike rollback it may also move FORWARD
        (e.g. undo a rollback). Committed as an auditable 'rollback' op
        (same non-linear visibility semantics: changes() refuses ranges
        crossing it)."""
        return self.rollback_to_snapshot(snapshot_id)

    def cherrypick_snapshot(self, snapshot_id: int) -> Snapshot:
        """CALL system.cherrypick_snapshot analog: apply one snapshot's
        APPEND delta on top of the current head (Iceberg limits
        cherry-pick to appends / dynamic overwrites; this models the
        append case — the WAP idiom of publishing a single staged commit
        out of order). Refuses non-append sources: their deltas are
        entangled with the visibility state they were committed against.
        """
        snaps = self.snapshots()
        by_id = {s.id: s for s in snaps}
        target = by_id.get(snapshot_id)
        if target is None:
            raise TableError(f"no snapshot {snapshot_id}")
        if target.operation != "append":
            raise TableError(
                f"cherrypick_snapshot: snapshot {snapshot_id} is "
                f"{target.operation!r} — only append snapshots can be "
                "cherry-picked"
            )
        # The append's OWN dirs: recorded at commit time (added_dirs,
        # diffed against the actual parent). The legacy fallback — dirs
        # no earlier-listed snapshot carries — breaks once
        # expire_snapshots compacts the earlier history away (the
        # "earlier" set empties and the whole inherited dir list is
        # mistaken for the delta; caught by the ancestry property test),
        # so it exists only for pre-field metadata.
        if target.added_dirs is not None:
            new_data = list(target.added_dirs)
        else:
            idx = next(i for i, s in enumerate(snaps) if s.id == snapshot_id)
            earlier = {d for s in snaps[:idx] for d in s.data_dirs}
            new_data = [d for d in target.data_dirs if d not in earlier]
        cur = self.current_snapshot()
        add = [d for d in new_data if d not in cur.data_dirs]
        if not add:
            raise TableError(
                f"cherrypick_snapshot: snapshot {snapshot_id}'s data is "
                "already present in the current snapshot"
            )
        # Iceberg assigns cherry-picked files the NEW snapshot's sequence
        # number: eq/pos deletes committed on main between staging and
        # publish must NOT mask the picked rows. The adopted dirs keep
        # their staged snap-N names (metadata-only publish, no rewrite),
        # so record a per-dir seq override ON THE PUBLISH SNAPSHOT (it
        # inherits to descendants at commit); the staging branch's own
        # snapshots keep the staged seq, so deletes committed on the
        # branch after staging still apply when reading the branch.
        publish_seq = max(s["id"] for s in self._meta["snapshots"]) + 1
        return self._commit(
            "append",
            list(cur.data_dirs) + add,
            list(cur.delete_dirs),
            eq_deletes=cur.eq_deletes,
            seq_overrides={d: publish_seq for d in add},
        )

    def files(self) -> DataFrame:
        """Iceberg `table.files` metadata-table analog: every live data /
        delete file of the current snapshot with size and record count."""
        import glob as _glob

        snap = self.current_snapshot()
        rows = []
        eq_dirs = [e["dir"] for e in snap.eq_deletes]
        for kind, dirs in (
            ("data", snap.data_dirs),
            ("deletes", snap.delete_dirs),
            ("eq-deletes", eq_dirs),
        ):
            for d in dirs:
                for path in sorted(
                    _glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
                ):
                    rows.append((kind, path, os.path.getsize(path)))
        return self.spark.createDataFrame(
            rows or [], "content string, file_path string, file_size_bytes long"
        )

    def position_deletes(self) -> DataFrame:
        """Iceberg `table.position_deletes` metadata-table analog: every
        live positional-delete entry of the current snapshot — the row ids
        masked at read time, tagged with the commit that wrote them. A
        metadata read of the delete side only (never touches data files);
        its row count == rows the MoR anti-join will drop, which is how
        compaction tooling decides when delete-file debt is worth
        rewriting (delete-file-threshold)."""
        snap = self.current_snapshot()
        out = None
        for d in snap.delete_dirs:
            df = self._read_one_dir(d, f"{_ROW_ID} long").select(
                F.lit(d).alias("delete_dir"),
                F.col(_ROW_ID).alias("deleted_row_id"),
            )
            out = df if out is None else out.unionByName(df)
        if out is None:
            return self.spark.createDataFrame(
                [], "delete_dir string, deleted_row_id long"
            )
        return out

    def metadata_log_entries(self) -> DataFrame:
        """Iceberg `table.metadata_log_entries` metadata-table analog:
        one row per retained metadata-file version (the trail _write_meta
        leaves under metadata/), oldest first — file name, the snapshot
        that was current when it was written, and how many snapshots it
        recorded. Reading the log is pure metadata IO: O(retained
        versions) small JSON files, never a data file."""
        import glob as _glob

        rows = []
        # numeric sort: 7-digit versions misorder lexically past v999999
        for path in sorted(
            _glob.glob(os.path.join(self.root, "metadata", "v*.metadata.json")),
            key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
        ):
            with open(path) as f:
                meta = json.load(f)
            m = re.fullmatch(r"v(\d+)\.metadata\.json", os.path.basename(path))
            rows.append(
                (
                    int(m.group(1)),
                    os.path.basename(path),
                    meta.get("current_snapshot_id"),
                    len(meta.get("snapshots", [])),
                )
            )
        return self.spark.createDataFrame(
            rows or [],
            "metadata_version int, file string, latest_snapshot_id int, "
            "n_snapshots int",
        )

    def at_metadata_version(self, version: int) -> "LocalTable":
        """Metadata-file time travel (Iceberg: instantiate a table AT a
        retained vN.metadata.json — the recovery move when the current
        metadata is bad, and the strongest form of time travel: it
        restores snapshot HISTORY, refs, schema interpretation, and
        properties as of that write, not just one snapshot's dir list).
        Returns a READ-ONLY handle: its metadata lives only in memory,
        so any commit through it would fork the trail. Mutators are
        refused AT ENTRY — refusing only at metadata-write time (the
        original design) let a mutation's physical side effects land
        first: the clone's stale metadata re-derives an already-used
        snapshot id, so its insert OVERWRITES the live table's
        data/snap-N dir before the late refusal (round-5 review repro
        — the live row was corrupted on disk while counts stayed
        equal). The per-name refusals below give the clearest error at
        the public surface; the structural guard is clone._read_only,
        checked at the top of _commit / _write_meta / _write_data_dir,
        so a mutator added later and never appended to this list still
        fails BEFORE any filesystem effect (round-5 advisor)."""
        path = self._metadata_version_path(version)
        if not os.path.exists(path):
            raise TableError(
                f"metadata version {version} is not retained "
                "(write.metadata.previous-versions-max)"
            )
        clone = LocalTable(self.spark, self.root)
        with open(path) as f:
            clone._meta = json.load(f)
        clone._read_only = True

        def _refuse(*_args, **_kwargs) -> None:
            raise TableError(
                "table handle opened at a historical metadata version "
                "is read-only"
            )

        for mutator in (
            "insert",
            "insert_values",
            "insert_overwrite",
            "merge_into",
            "delete_where",
            "delete_by_keys",
            "update_set",
            "rewrite_data_files",
            "consolidate_deletes",
            "expire_snapshots",
            "remove_orphan_files",
            "add_files",
            "set_properties",
            "add_column",
            "drop_column",
            "rename_column",
            "widen_column",
            "evolve_partition_spec",
            "create_branch",
            "drop_branch",
            "create_tag",
            "drop_tag",
            "rollback_to_snapshot",
            "rollback_to_timestamp",
            "set_current_snapshot",
            "fast_forward",
            "cherrypick_snapshot",
        ):
            setattr(clone, mutator, _refuse)
        clone._write_meta = _refuse  # type: ignore[method-assign]
        return clone

    def all_data_files(self) -> DataFrame:
        """Iceberg `table.all_data_files` / `all_delete_files` analog in
        one table: every data / delete dir referenced by ANY retained
        snapshot (not just the current one — the difference is what
        expire_snapshots/remove_orphan_files would reclaim), with the
        first referencing snapshot and whether the CURRENT snapshot still
        reads it. Dir-level like files(): a pure metadata walk over
        snapshot dir lists, no data IO."""
        cur = self.current_snapshot()
        live = {
            "data": set(cur.data_dirs),
            "deletes": set(cur.delete_dirs),
            "eq-deletes": {e["dir"] for e in cur.eq_deletes},
        }
        first_ref: dict[tuple[str, str], int] = {}
        for s in self.snapshots():
            for kind, dirs in (
                ("data", s.data_dirs),
                ("deletes", s.delete_dirs),
                ("eq-deletes", [e["dir"] for e in s.eq_deletes]),
            ):
                for d in dirs:
                    first_ref.setdefault((kind, d), s.id)
        rows = [
            (kind, os.path.basename(d), snap_id, d in live[kind])
            for (kind, d), snap_id in sorted(first_ref.items())
        ]
        return self.spark.createDataFrame(
            rows or [],
            "content string, dir string, first_snapshot_id int, "
            "is_live boolean",
        )

    def partitions(self) -> DataFrame:
        """Iceberg `table.partitions` metadata-table analog: per-partition
        live record count plus data-file count and bytes.

        Partition values come from the directory layout (`k=v` path
        segments — including hidden-partitioning transform columns), so
        file stats reflect the physical clustering; record_count is the
        MoR-merged live row count, matching what a scan returns. File
        stats are metadata-only (a directory walk, no data read); the
        record counts are one groupBy over the merged scan.
        """
        if len(self.partition_spec_log) > 1:
            return self._partitions_multi_spec()
        spec = self._partition_spec()
        names = [name for name, _ in spec]
        snap = self.current_snapshot()
        stats: dict[tuple, list[int]] = {}
        for d in snap.data_dirs:
            for vals, size in self._walk_dir_file_stats(d):
                key = tuple(vals.get(n, "") for n in names)
                s = stats.setdefault(key, [0, 0])
                s[0] += 1
                s[1] += size
        file_rows = [(*k, n, b) for k, (n, b) in sorted(stats.items())]
        cols = "file_count int, total_data_file_size_bytes long"
        if not names:
            n_files, n_bytes = file_rows[0] if file_rows else (0, 0)
            return self.spark.createDataFrame(
                [(self.scan().count(), n_files, n_bytes)],
                "record_count long, " + cols,
            )
        files_df = self.spark.createDataFrame(
            file_rows or [],
            ", ".join(f"{n} string" for n in names) + ", " + cols,
        )
        df = self.scan()
        for name, expr in spec:
            if expr is not None:
                df = df.withColumn(name, expr)
        counts = df.groupBy(
            *[F.col(n).cast("string").alias(n) for n in names]
        ).agg(F.count(F.lit(1)).alias("record_count"))
        # full outer: a partition can be all-deleted (files but 0 live rows)
        return (
            counts.join(files_df, on=names, how="full_outer")
            .na.fill({"record_count": 0, "file_count": 0})
            .orderBy(*names)
        )

    def _walk_dir_file_stats(self, d: str):
        """Yield (partition-values dict, file size) for every parquet file
        under a data dir — shared by the single- and multi-spec
        ``partitions`` paths. Spark writes Hive-escaped partition dirs
        (e.g. '#' -> '%23'); unquote so file stats join the scan-side
        values instead of splitting into phantom encoded partitions."""
        import glob as _glob
        from urllib.parse import unquote

        for path in _glob.glob(
            os.path.join(d, "**", "*.parquet"), recursive=True
        ):
            rel = os.path.relpath(path, d)
            vals = {
                k: unquote(v)
                for k, v in (
                    seg.split("=", 1)
                    for seg in rel.split(os.sep)[:-1]
                    if "=" in seg
                )
            }
            yield vals, os.path.getsize(path)

    def _partitions_multi_spec(self) -> DataFrame:
        """``partitions`` for a table with partition evolution (Iceberg
        reports per-partition rows WITH their spec_id): each dir is
        grouped under ITS OWN spec's dir columns — keying old-layout
        files on the current spec's names would lump them into one blank
        phantom partition. Output columns: spec_id + the union of every
        historical spec's dir columns ('' where a spec doesn't encode
        one), live record_count, file_count, bytes. Record counts apply
        the SAME MoR merge as ``scan`` (equality deletes and, under V3
        row lineage, commit-seq-scoped positional tombstones) — per-dir
        partition values are captured as extra columns BEFORE the merge
        so delete application stays the one shared code path."""
        snap = self.current_snapshot()
        union_names: list[str] = []
        for entry in self.partition_spec_log:
            for n, _c, _d, _s in self._spec_names(entry["partition_by"]):
                if n not in union_names:
                    union_names.append(n)
        keys = ["spec_id", *union_names]
        stats: dict[tuple, list[int]] = {}
        frames = []
        ddl = self._data_read_schema()
        for d in snap.data_dirs:
            m = re.search(r"snap-(\d+)", os.path.basename(d))
            seq = int(m.group(1)) if m else 0
            d_names = {
                n for n, _c, _d2, _s in self._spec_names(self._spec_for_seq(seq))
            }
            spec_id = next(
                e["spec_id"]
                for e in reversed(self.partition_spec_log)
                if e["seq"] <= seq
            )
            for vals, size in self._walk_dir_file_stats(d):
                key = (spec_id, *(vals.get(n, "") for n in union_names))
                s = stats.setdefault(key, [0, 0])
                s[0] += 1
                s[1] += size
            df = (
                self._read_one_dir(d, ddl)
                # delete scoping honors the cherry-pick seq override;
                # spec/schema scoping above stays on the dir-name seq
                .withColumn("_seq", F.lit(self._delete_scope_seq(d, snap)))
                .withColumn("_spec_id", F.lit(spec_id))
            )
            for i, n in enumerate(union_names):
                df = df.withColumn(
                    f"_pv{i}",
                    F.coalesce(F.col(n).cast("string"), F.lit(""))
                    if n in d_names
                    else F.lit(""),
                )
            frames.append(df)
        file_rows = [(*k, n, b) for k, (n, b) in sorted(stats.items())]
        files_df = self.spark.createDataFrame(
            file_rows or [],
            "spec_id int, "
            + ", ".join(f"{n} string" for n in union_names)
            + ", file_count int, total_data_file_size_bytes long",
        )
        counts_schema = (
            "spec_id int, "
            + ", ".join(f"{n} string" for n in union_names)
            + ", record_count long"
        )
        if not frames:
            counts = self.spark.createDataFrame([], counts_schema)
        else:
            data = frames[0]
            for f in frames[1:]:
                data = data.unionByName(f)
            if snap.eq_deletes:
                data = self._apply_eq_deletes(snap, data)
            if self._meta.get("carried_row_ids"):
                data = self._apply_pos_deletes_seq_scoped(snap, data)
            else:
                deletes = self._read_dirs(snap.delete_dirs, f"{_ROW_ID} long")
                if deletes is not None:
                    data = data.join(
                        F.broadcast(deletes), _ROW_ID, "left_anti"
                    )
            counts = data.groupBy(
                F.col("_spec_id").alias("spec_id"),
                *[
                    F.col(f"_pv{i}").alias(n)
                    for i, n in enumerate(union_names)
                ],
            ).agg(F.count(F.lit(1)).alias("record_count"))
        return (
            counts.join(files_df, on=keys, how="full_outer")
            .na.fill(
                {
                    "record_count": 0,
                    "file_count": 0,
                    "total_data_file_size_bytes": 0,
                }
            )
            .orderBy(*keys)
        )

    def count(self) -> int:
        return self.scan().count()

    def describe(self) -> DataFrame:
        """DESCRIBE TABLE (reference verify_in_databricks.py:66-75)."""
        fields = [
            (f.name, f.dataType.simpleString(), "")
            for f in self.spark.createDataFrame([], self.schema_ddl).schema
        ]
        for c in self.partition_by:
            fields.append((c, "", "partition"))
        return self.spark.createDataFrame(
            fields, "col_name string, data_type string, comment string"
        )

    def changes(
        self, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> DataFrame:
        """Incremental/CDC read: logical row changes between two snapshots
        (Iceberg incremental scan / changelog analog).

        Emits the table columns plus ``_change_type`` ('insert'|'delete')
        and ``_commit_snapshot_id``. Compactions ('replace') are
        layout-only and correctly produce no changes. Deleted rows are
        recovered by joining new delete ledgers against the data visible
        at the preceding snapshot — O(changed rows), not O(table).

        The walk follows ``to_snapshot_id``'s parent-id ANCESTRY, not the
        global snapshot list: branch-staged (WAP) commits interleaved in
        the list are invisible until published (fast_forward adopts the
        staged chain into the ancestry; cherrypick re-commits the delta
        on main), so a changelog over a linear main history never sees —
        or misattributes rows to — an unpublished staging commit.
        """
        by_id = {s.id: s for s in self.snapshots()}
        if from_snapshot_id not in by_id:
            raise TableError(f"no snapshot {from_snapshot_id}")
        to_snapshot_id = to_snapshot_id or self._meta["current_snapshot_id"]
        if to_snapshot_id not in by_id:
            raise TableError(f"no snapshot {to_snapshot_id}")
        chain = self.ancestry(to_snapshot_id)
        if not any(s.id == from_snapshot_id for s in chain):
            raise TableError(
                f"changes(): snapshot {from_snapshot_id} is not an "
                f"ancestor of {to_snapshot_id} — no linear delta exists"
            )
        declared = self.spark.createDataFrame([], self.schema_ddl).schema
        out: DataFrame | None = None
        prev = None
        # ids strictly increase along the parent chain (allocation is a
        # global max+1), so the numeric guard selects exactly the
        # ancestors after `from`.
        for s in chain:
            if prev is not None and s.id > from_snapshot_id:
                step: DataFrame | None = None
                if s.operation == "snapshot":
                    # the zero-copy adopt commit (CALL system.snapshot):
                    # its delta is the table's INITIAL LOAD — the rows
                    # VISIBLE at the adopt snapshot (MoR-merged), not the
                    # raw adopted dirs, which still contain rows the
                    # SOURCE had already deleted before the snapshot.
                    # Matches the changelog-view default of reading the
                    # first data commit as inserts.
                    if prev.data_dirs:
                        raise TableError(
                            f"changes(): snapshot-adopt commit {s.id} on "
                            "a non-empty parent has no incremental delta"
                        )
                    step = self._scan_raw(s).withColumn(
                        "_change_type", F.lit("insert")
                    )
                elif s.operation in (
                    "append", "update", "merge", "delete", "overwrite"
                ):
                    new_data = [d for d in s.data_dirs if d not in prev.data_dirs]
                    new_dels = [
                        d for d in s.delete_dirs if d not in prev.delete_dirs
                    ]
                    dropped = [
                        d for d in prev.data_dirs if d not in s.data_dirs
                    ]
                    if new_data:
                        ins = self._read_dirs(
                            new_data, self._data_read_schema()
                        ).withColumn("_change_type", F.lit("insert"))
                        step = ins
                    if dropped:
                        # Unpartitioned INSERT OVERWRITE commits a fresh
                        # dir list (no delete ledgers), so the delete side
                        # is every row VISIBLE at prev — prev's scan, not
                        # a dir diff. Only the full-replace shape drops
                        # dirs; a partial drop has no defined delta here.
                        if set(dropped) != set(prev.data_dirs):
                            raise TableError(
                                f"changes(): snapshot {s.id} "
                                f"({s.operation}) drops a strict subset "
                                "of data dirs — no incremental delta"
                            )
                        dels = self._scan_raw(prev).withColumn(
                            "_change_type", F.lit("delete")
                        )
                        step = dels if step is None else step.unionByName(
                            dels, allowMissingColumns=True
                        )
                    elif new_dels:
                        dels = (
                            self._scan_raw(prev)
                            .join(
                                F.broadcast(
                                    self._read_dirs(
                                        new_dels, f"{_ROW_ID} long"
                                    )
                                ),
                                _ROW_ID,
                            )
                            .withColumn("_change_type", F.lit("delete"))
                        )
                        step = dels if step is None else step.unionByName(
                            dels, allowMissingColumns=True
                        )
                    new_eq = [
                        e for e in s.eq_deletes if e not in prev.eq_deletes
                    ]
                    if new_eq:
                        # Equality deletes (delete_by_keys, the streaming
                        # CDC flavor) grow eq_deletes without touching
                        # dir lists. Every prev-visible row has a commit
                        # seq below this snapshot's, so the delta is
                        # simply prev's visible scan inner-joined with
                        # the new key sets (broadcast — O(deleted keys)).
                        types = {
                            f.name: f.dataType.simpleString()
                            for f in declared
                        }
                        vis_prev = self._scan_raw(prev)
                        eq_dels: DataFrame | None = None
                        for entry in new_eq:
                            cols = entry["cols"]
                            ddl = ", ".join(
                                f"{c} {types[c]}" for c in cols
                            )
                            keys = (
                                self.spark.read.schema(ddl)
                                .parquet(entry["dir"])
                                .distinct()
                            )
                            hit = vis_prev.join(F.broadcast(keys), cols)
                            eq_dels = (
                                hit
                                if eq_dels is None
                                else eq_dels.unionByName(hit)
                            )
                        eq_dels = eq_dels.dropDuplicates(
                            [_ROW_ID]
                        ).withColumn("_change_type", F.lit("delete"))
                        step = (
                            eq_dels
                            if step is None
                            else step.unionByName(
                                eq_dels, allowMissingColumns=True
                            )
                        )
                elif s.operation not in ("replace", "maintenance", "create"):
                    # 'rollback' (and any future non-linear op) has no
                    # incremental delta: visibility reverts wholesale.
                    # Refuse loudly so callers (e.g. incremental MV
                    # refresh) fall back to a full recompute instead of
                    # silently missing changes.
                    raise TableError(
                        f"changes(): operation {s.operation!r} (snapshot "
                        f"{s.id}) in range is not incrementally diffable"
                    )
                # 'replace' (compaction) and 'create': no logical change
                if step is not None:
                    step = step.select(
                        *[
                            F.col(f.name)
                            if f.name in step.columns
                            else F.lit(None).cast(f.dataType).alias(f.name)
                            for f in declared
                        ],
                        "_change_type",
                        F.lit(s.id).alias("_commit_snapshot_id"),
                    )
                    out = step if out is None else out.unionByName(step)
            prev = s
        if out is None:
            return self.spark.createDataFrame(
                [],
                self.schema_ddl
                + ", _change_type string, _commit_snapshot_id int",
            )
        return out

    # -------------------------------------------------------- maintenance

    def _zorder_value(self, cols: list[str], bits: int = 16) -> Column:
        """Z-order (Morton) key over 2+ numeric/timestamp columns: each
        column min-max-normalized to a ``bits``-bit integer, then bit-
        interleaved. Pure JVM expressions (window min/max + shifts/ors) —
        no UDF. Rows close in Z-value are close in EVERY dimension, so
        sorting by it clusters files for multi-column min/max pruning
        (the OPTIMIZE ZORDER pattern)."""
        from pyspark.sql.window import Window

        w = Window.partitionBy()
        buckets = []
        for c in cols:
            v = F.col(c).cast("double")
            lo, hi = F.min(v).over(w), F.max(v).over(w)
            frac = F.when(hi == lo, F.lit(0.0)).otherwise(
                (v - lo) / (hi - lo)
            )
            buckets.append(
                F.least(
                    F.floor(frac * ((1 << bits) - 1)).cast("long"),
                    F.lit((1 << bits) - 1),
                )
            )
        z = F.lit(0).cast("long")
        for b in range(bits):
            for i, bucket in enumerate(buckets):
                z = z.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                        b * len(buckets) + i,
                    )
                )
        return z

    def rewrite_data_files(
        self,
        rewrite_all: bool = True,
        delete_file_threshold: int = 1,
        target_file_partitions: int | None = None,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        max_records_per_file: int | None = None,
    ) -> Snapshot:
        """CALL system.rewrite_data_files(...) — full compaction.

        Reference: internal/upgrade_table.py:124,129 with
        options map('rewrite-all','true','delete-file-threshold','1') —
        guarantees zero surviving delete files (README.md:26-29). The
        rewrite must be semantically invisible: scan() results are
        identical before/after (asserted in tests).

        At scale the rewrite re-partitions by the identity partition columns
        so file clustering survives compaction. ``sort_by`` gives linear
        sort-order compaction; ``zorder_by`` gives multi-dimensional
        Z-order clustering (range-partition + sort on the Morton key, so
        parquet min/max stats stay narrow on ALL the listed columns).
        """
        cur = self.current_snapshot()
        n_delete_files = len(cur.delete_dirs) + len(cur.eq_deletes)
        if not rewrite_all and n_delete_files < delete_file_threshold:
            return cur
        merged = self._scan_raw(cur)  # keeps _row_id: lineage survives
        if zorder_by:
            merged = merged.withColumn(
                "_zvalue", self._zorder_value(zorder_by)
            )
            n = (
                target_file_partitions
                or self.spark.sparkContext.defaultParallelism
            )
            merged = (
                merged.repartitionByRange(n, "_zvalue")
                .sortWithinPartitions("_zvalue")
                .drop("_zvalue")
            )
        elif target_file_partitions:
            merged = merged.repartition(target_file_partitions)
        if sort_by:
            # cluster within files so parquet min/max stats prune range
            # predicates on these columns (Iceberg sort-order compaction)
            merged = merged.sortWithinPartitions(*sort_by)
        snap_id = max(s["id"] for s in self._meta["snapshots"]) + 1
        path = self._next_dir("data", snap_id)
        self._write_data_dir(
            merged, path, max_records_per_file=max_records_per_file
        )
        return self._commit("replace", [path], [])

    def consolidate_deletes(self) -> Snapshot:
        """V3 deletion-vector consolidation: merge ALL positional delete
        files into ONE compact tombstone set — the maintenance move
        Iceberg V3 performs when it converts accumulated positional delete
        files into a single deletion vector per data file (the headline
        read-amplification fix of the V2->V3 upgrade,
        reference README.md:26-29 / internal/upgrade_table.py:124-129).

        Unlike ``rewrite_data_files`` this touches NO data files — cost is
        O(deleted rows), one distinct + one write, so it can run far more
        often than full compaction. Scan results must be identical
        before/after (asserted in tests and by the i17 oracle).

        Refuses under carried row ids: a carried UPDATE re-appends a
        tombstoned _row_id, and collapsing tombstones to one commit seq
        would wrongly hide the carried copy (Iceberg keeps per-file DVs
        for exactly this reason); those tables consolidate through
        ``rewrite_data_files`` instead."""
        if self._meta.get("carried_row_ids"):
            raise TableError(
                "consolidate_deletes on a row-lineage table would break "
                "seq-scoped tombstones; use rewrite_data_files"
            )
        cur = self.current_snapshot()
        if len(cur.delete_dirs) <= 1:
            return cur
        tombstones = self._read_dirs(
            cur.delete_dirs, f"{_ROW_ID} long"
        ).distinct()
        snap_id = max(s["id"] for s in self._meta["snapshots"]) + 1
        dv_path = self._reserve_dir(
            os.path.join(self.root, "deletes", f"snap-{snap_id:05d}-dv")
        )
        # single file: the whole point is one tombstone blob per scan
        tombstones.coalesce(1).write.mode("overwrite").parquet(dv_path)
        return self._commit(
            "maintenance",
            list(cur.data_dirs),
            [dv_path],
            eq_deletes=cur.eq_deletes,
        )

    def _check_gc_enabled(self, procedure: str) -> None:
        """Iceberg refuses GC procedures when gc.enabled=false ("Cannot
        expire snapshots: GC is disabled"). The catalog's snapshot
        procedure sets it on the SOURCE table because the snapshot
        table's scans reference dirs under the source root — a source-
        side expiry would physically delete files another table still
        reads (round-5 advisor). snapshot.adopted-by names the
        dependents so the operator knows what to check before
        re-enabling."""
        if self.properties.get("gc.enabled", "true").lower() == "false":
            deps = self.properties.get("snapshot.adopted-by", "")
            hint = f" (snapshot tables depend on its files: {deps})" if deps else ""
            raise TableError(
                f"cannot {procedure}: gc.enabled=false on this table{hint}; "
                "set gc.enabled=true only after verifying no snapshot "
                "table still references its files"
            )

    def remove_orphan_files(
        self,
        dry_run: bool = False,
        older_than_seconds: float = 86400.0,
    ) -> list[str]:
        """CALL system.remove_orphan_files analog: delete data/delete dirs
        under the table root referenced by NO snapshot (crashed writes,
        aborted commits). Returns removed (or would-remove) paths.

        ``older_than_seconds`` (default 24 h, mirroring Iceberg's
        refusal to GC recent files): an unreferenced dir younger than
        the threshold is NOT an orphan — under optimistic concurrency a
        writer legitimately writes its data dir BEFORE taking the commit
        lock, so a zero-grace GC racing that window would delete a dir
        the imminent commit is about to publish (review finding). Pass 0
        explicitly for the single-writer immediate mode (the CLI/tests).
        The walk runs under the table lock (non-dry-run), so the
        snapshot list it checks cannot move mid-delete."""
        if dry_run:
            return self._orphan_walk(older_than_seconds)
        self._check_gc_enabled("remove_orphan_files")
        with _table_lock(self.root):
            # re-read under the lock: a commit that landed since this
            # handle loaded may reference dirs we would call orphans —
            # and the gc guard must be re-checked against the FRESH
            # properties (the snapshot procedure writes gc.enabled=false
            # through its own handle; a stale handle must not GC past it)
            try:
                self._meta = self._read_meta()
            except FileNotFoundError:
                pass
            self._check_gc_enabled("remove_orphan_files")
            orphans = self._orphan_walk(older_than_seconds)
            for d in orphans:
                shutil.rmtree(d)
                self._remove_reservation_marker(d)
            self._sweep_stale_markers(older_than_seconds)
        return orphans

    def _sweep_stale_markers(self, older_than_seconds: float) -> None:
        """Remove ``.X.rsv`` reservation markers whose dir X is gone
        (expired or GC'd before marker cleanup existed). The sweep grace
        is floored at 24 h REGARDLESS of the caller's dir grace (review
        finding: a live writer's ``mode("overwrite")`` briefly deletes
        its reserved dir, so a dir-missing marker under an aggressive
        ``older_than_seconds=0`` could belong to an in-flight write —
        sweeping it would re-open the double-reservation the marker CAS
        exists to close; no write's delete-recreate window approaches
        24 h, and stale markers are only a bytes-sized leak meanwhile)."""
        import time as _time

        grace = max(older_than_seconds, 86400.0)
        now = _time.time()
        for kind in ("data", "deletes"):
            base = os.path.join(self.root, kind)
            if not os.path.isdir(base):
                continue
            for f in os.listdir(base):
                m = re.fullmatch(r"\.(.+)\.rsv", f)
                if not m or os.path.isdir(os.path.join(base, m.group(1))):
                    continue
                full = os.path.join(base, f)
                try:
                    if now - os.path.getmtime(full) >= grace:
                        os.remove(full)
                except OSError:
                    pass

    def _orphan_walk(self, older_than_seconds: float) -> list[str]:
        import time as _time

        referenced: set[str] = set()
        for s in self.snapshots():
            referenced.update(s.data_dirs)
            referenced.update(s.delete_dirs)
            referenced.update(e["dir"] for e in s.eq_deletes)
        now = _time.time()
        orphans = []
        for kind in ("data", "deletes"):
            base = os.path.join(self.root, kind)
            if not os.path.isdir(base):
                continue
            for d in sorted(os.listdir(base)):
                full = os.path.join(base, d)
                # reservation markers (.snap-N.rsv) and stray files are
                # not dirs; never rmtree them
                if d.startswith(".") or not os.path.isdir(full):
                    continue
                if full in referenced:
                    continue
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    continue
                if age >= older_than_seconds:
                    orphans.append(full)
        return orphans

    def expire_snapshots(
        self, older_than: datetime.datetime, retain_last: int = 1
    ) -> list[int]:
        """CALL system.expire_snapshots(older_than=>, retain_last=>).

        Reference: README.md:34-38. Removes expired snapshot entries and
        physically deletes files no surviving snapshot references.
        Returns the expired snapshot ids.

        Ordering (review finding): the metadata CAS runs BEFORE anything
        irreversible. Previously the dirs were rmtree'd first and the
        stale-handle refusal fired only at the final ``_write_meta`` —
        the refusal then left on-disk metadata still referencing
        already-deleted dirs (permanent corruption, not protection).
        Now the whole read-check-modify-write runs under the table lock,
        the new metadata publishes first, and the physical deletes run
        last: a crash between publish and delete leaves only orphan
        dirs, which ``remove_orphan_files`` reclaims.
        """
        self._check_gc_enabled("expire_snapshots")
        with _table_lock(self.root):
            return self._expire_snapshots_locked(older_than, retain_last)

    def _expire_snapshots_locked(
        self, older_than: datetime.datetime, retain_last: int
    ) -> list[int]:
        try:
            disk = self._read_meta()
        except FileNotFoundError:
            disk = None
        if disk is not None and int(disk.get("last_metadata_version", 0)) > int(
            self._meta.get("last_metadata_version", 0)
        ):
            raise CommitConflictError(
                f"metadata.json at {self.root} moved since this handle "
                f"loaded it; reload the table and retry expire_snapshots"
            )
        snaps = self.snapshots()
        keep_tail = {s.id for s in snaps[-retain_last:]}
        keep_tail.add(self._meta["current_snapshot_id"])
        # tagged snapshots and branch heads are pinned refs — never
        # expired (Iceberg ref retention semantics)
        keep_tail.update(self._meta.get("refs", {}).values())
        keep_tail.update(self._meta.get("branches", {}).values())
        cutoff = (
            older_than.astimezone(datetime.timezone.utc)
            if older_than.tzinfo
            else older_than.replace(tzinfo=datetime.timezone.utc)
        )
        expired = [
            s
            for s in snaps
            if s.id not in keep_tail
            and datetime.datetime.fromisoformat(s.timestamp) < cutoff
        ]
        expired_ids = {s.id for s in expired}
        survivors = [s for s in snaps if s.id not in expired_ids]
        referenced: set[str] = set()
        for s in survivors:
            referenced.update(s.data_dirs)
            referenced.update(s.delete_dirs)
            referenced.update(e["dir"] for e in s.eq_deletes)
        to_delete: list[str] = []
        for s in expired:
            expired_dirs = (
                list(s.data_dirs)
                + list(s.delete_dirs)
                + [e["dir"] for e in s.eq_deletes]
            )
            own_root = os.path.abspath(self.root) + os.sep
            for d in expired_dirs:
                # Never physically delete a dir outside this table's
                # root: dirs adopted by the snapshot procedure live
                # under the SOURCE table's root — expiry here must only
                # unreference them, or it corrupts the source (round-5
                # review repro; Iceberg snapshot tables set
                # gc.enabled=false for exactly this hazard).
                if (
                    d not in referenced
                    and os.path.abspath(d).startswith(own_root)
                    and os.path.exists(d)
                    and d not in to_delete
                ):
                    to_delete.append(d)
        # Reparent survivors through expired nodes: a survivor whose
        # parent was expired hops to its nearest SURVIVING ancestor, so
        # the ancestry chain (time travel, changes(), rollback-by-
        # timestamp) stays intact for every retained snapshot instead of
        # silently truncating at the first expired parent.
        parent_of = {s.id: s.parent_id for s in snaps}
        # positional predecessor in the PRE-compaction list: the parent a
        # legacy (parent_id=None) snapshot resolves to via ancestry()'s
        # fallback — captured now, because after compaction "whatever
        # precedes it in the list" can be an unrelated rolled-back or
        # branch-staged snapshot.
        pos_pred = {
            snaps[i].id: (snaps[i - 1].id if i > 0 else None)
            for i in range(len(snaps))
        }
        def _parent(pid):
            p = parent_of.get(pid)
            return p if p is not None else pos_pred.get(pid)
        def _nearest_survivor(pid):
            while pid is not None and pid in expired_ids:
                pid = _parent(pid)
            return pid
        for s in survivors:
            if s.parent_id is None:
                # materialize the legacy positional parent as an explicit
                # id BEFORE compacting, resolved through expired nodes —
                # otherwise the survivor silently re-binds to its new
                # list neighbor after expiry.
                s.parent_id = _nearest_survivor(pos_pred.get(s.id)) or 0
            elif s.parent_id in expired_ids:
                # when the WHOLE chain below expired, record the explicit
                # root sentinel 0 (no snapshot has id 0) rather than None:
                # None means "legacy metadata, use the positional
                # fallback", which would adopt an arbitrary neighbor —
                # e.g. a tag-pinned rolled-back-away snapshot — as parent
                # and flip its is_current_ancestor back to true.
                s.parent_id = _nearest_survivor(s.parent_id) or 0
        self._meta["snapshots"] = [s.to_json() for s in survivors]
        self._write_meta(locked=True)
        # publish first, delete last (see expire_snapshots docstring)
        for d in to_delete:
            shutil.rmtree(d)
            self._remove_reservation_marker(d)
        return sorted(expired_ids)
