"""Second-engine TABLE read: DuckDB executes the MoR merge itself.

The reference's headline verification arc is a *second engine reading the
managed table* — ``internal/verify_in_databricks.py:57-112`` points
Databricks at the same Iceberg table another engine wrote and checks the
merged state is readable. ``tables/verify.py`` previously approximated
that by exporting the already-merged scan to parquet; this module closes
the gap: it compiles the table's CURRENT snapshot metadata (data dirs,
positional delete dirs, equality deletes, per-dir delete-scope sequences)
into one self-contained DuckDB SQL statement, so DuckDB reconstructs the
post-DELETE/UPDATE state from raw table files with **no Spark pre-merge
and no knowledge of this engine** beyond the generated view definition —
the moral equivalent of handing a spec-shaped metadata file to an
``iceberg_scan``-capable reader (the DuckDB iceberg extension itself
needs a network INSTALL, unavailable here, so the manifest is expressed
as SQL rather than Avro; ``tables/iceberg_export.py`` emits the
spec-field file form).

Fidelity covered by the generated SQL:
- hive-partitioned data dirs (identity and transform partition columns
  are directory-encoded; DuckDB's ``hive_partitioning`` recovers them),
- positional deletes via global ``_row_id`` anti-join,
- V3 carried row ids: delete files scope to data committed BEFORE them
  (``data._seq < delete._dseq``), so an UPDATE's rewritten row — same
  ``_row_id``, newer sequence — survives its own tombstone,
- equality deletes: key anti-join against older-sequence data only,
  with the ENGINE's null-unsafe ``=`` semantics (a NULL key never
  matches — review finding: ``IS NOT DISTINCT FROM`` would delete
  NULL-keyed rows the engine keeps),
- cherry-pick/rebase sequence overrides (``Snapshot.seq_overrides``),
- column renames: each dir projects the PHYSICAL name its files were
  written under back to the current name (the engine's
  ``_read_one_dir`` rename walk, re-derived per dir),
- schema evolution + V3 initial defaults: a dir written before an ADD
  COLUMN null-fills (or reads the recorded default literal) exactly
  like the engine's per-dir sequence rule.

Declared limitation: dirs registered by ``add_files`` carry no
``_row_id`` column (ids are lazily derived); compiling that read is not
supported and raises ``DuckDBReadUnsupported`` — callers
(``verify.py``) fall back to the exported-scan probe rather than
silently resurrecting deleted imported rows (review finding).
"""

from __future__ import annotations

import glob
import os
import re

from iceberg_v2_to_v3_upgrade_spark.tables.table import (
    _ROW_ID,
    LocalTable,
    Snapshot,
)


class DuckDBReadUnsupported(Exception):
    """The table uses a feature the compiled-SQL read cannot express
    (currently: ``add_files`` imported dirs). Use the exported-scan
    verification path instead."""


_DUCK_PRIMITIVES = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "REAL",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "binary": "BLOB",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside <...> or (...)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _duck_type(simple: str) -> str:
    """Spark simpleString -> DuckDB type (primitives, decimal, arrays,
    maps, structs — complex types must map faithfully or a null-fill
    arm typed VARCHAR collides with real MAP/STRUCT arms in the
    UNION ALL BY NAME, review finding)."""
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", simple)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"array<(.+)>", simple)
    if m:
        return f"{_duck_type(m.group(1))}[]"
    m = re.fullmatch(r"map<(.+)>", simple)
    if m:
        k, v = _split_top_level(m.group(1))
        return f"MAP({_duck_type(k.strip())}, {_duck_type(v.strip())})"
    m = re.fullmatch(r"struct<(.+)>", simple)
    if m:
        fields = []
        for part in _split_top_level(m.group(1)):
            name, _, dt = part.partition(":")
            fields.append(f'"{name.strip()}" {_duck_type(dt.strip())}')
        return f"STRUCT({', '.join(fields)})"
    return _DUCK_PRIMITIVES.get(simple, "VARCHAR")


def _dir_glob(d: str) -> str:
    """Recursive parquet glob: matches files at the dir root (unpartitioned
    writes) and under key=value subdirs (partitioned writes)."""
    return os.path.join(d, "**", "*.parquet").replace("'", "''")


def _has_parquet(d: str) -> bool:
    """True when the snapshot-referenced dir holds parquet files. A dir
    that EXISTS with no files is a zero-row write (engine-supported,
    skip it); a dir that does not exist at all is corruption — fail
    loudly rather than compile a confidently wrong read that silently
    drops data or delete filters (review finding)."""
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"snapshot references missing dir {d}; refusing to compile "
            f"a partial table read"
        )
    return bool(
        glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )


def _empty_select(declared) -> str:
    typed = ", ".join(
        f"CAST(NULL AS {_duck_type(f.dataType.simpleString())})"
        f' AS "{f.name}"'
        for f in declared
    )
    return f"SELECT {typed} WHERE FALSE"


def duckdb_table_sql(table: LocalTable, snap: Snapshot | None = None) -> str:
    """One DuckDB SELECT that reproduces ``table.scan()`` for ``snap``
    (default: current snapshot) straight from the table's files."""
    snap = snap or table.current_snapshot()
    declared = table.spark.createDataFrame([], table.schema_ddl).schema
    cols = ", ".join(f'"{name}"' for name in declared.fieldNames())
    if not snap.data_dirs:
        return _empty_select(declared)
    imported = table._meta.get("imported_dirs", {})
    renames = table._meta.get("renames", [])
    defaults = table._meta.get("column_defaults", {})
    evolved = bool(renames or defaults or table._meta.get("schema_log"))
    declared_names = set(declared.fieldNames())
    written_at: dict[int, set[str]] = {}  # write_seq -> physical columns
    data_parts = []
    for d in snap.data_dirs:
        if d in imported:
            raise DuckDBReadUnsupported(
                f"{d} was registered by add_files (no materialized "
                f"{_ROW_ID}); use the exported-scan verification path"
            )
        if not _has_parquet(d):
            # a zero-row partitioned write leaves a dir with no parquet
            # files at all (engine-supported state — see _read_dirs);
            # a bare read_parquet glob on it is an IO error in DuckDB
            continue
        seq = table._delete_scope_seq(d, snap)
        write_seq = LocalTable._parse_dir_seq(d)
        # columns physically present when this dir was written (current
        # names resolve through the rename walk below). One JVM DDL
        # parse per DISTINCT schema epoch, not per dir — and none at
        # all for never-evolved tables (review finding).
        if not evolved:
            written = declared_names
        elif write_seq in written_at:
            written = written_at[write_seq]
        else:
            written = {
                f.name
                for f in table.spark.createDataFrame(
                    [], table.schema_at(write_seq)
                ).schema
            }
            written_at[write_seq] = written
        proj = []
        for f in declared:
            name = f.name
            # the engine's newest->oldest rename walk (_read_one_dir):
            # the files store the name the column had at the dir's seq
            phys = name
            for r in reversed(renames):
                if r["to"] == phys and write_seq <= r["seq"]:
                    phys = r["from"]
            entry = defaults.get(name)
            if entry is not None and write_seq <= int(entry["seq"]):
                # V3 initial-default: pre-ALTER dirs read the literal
                proj.append(
                    f"CAST({entry['sql']} AS "
                    f"{_duck_type(entry['dtype'])}) AS \"{name}\""
                )
            elif phys in written:
                proj.append(
                    f'"{name}"' if phys == name else f'"{phys}" AS "{name}"'
                )
            else:
                # column added after this dir was written: null-fill,
                # typed so single-dir tables keep the declared schema
                proj.append(
                    f"CAST(NULL AS {_duck_type(f.dataType.simpleString())})"
                    f' AS "{name}"'
                )
        data_parts.append(
            f"SELECT {', '.join(proj)}, \"{_ROW_ID}\", "
            f"CAST({seq} AS BIGINT) AS _seq "
            f"FROM read_parquet('{_dir_glob(d)}', "
            f"hive_partitioning=1, union_by_name=1)"
        )
    if not data_parts:  # every data dir was a zero-row write
        return _empty_select(declared)
    data_sql = "\nUNION ALL BY NAME\n".join(data_parts)
    filters = []
    del_parts = []
    for d in snap.delete_dirs:
        if not _has_parquet(d):  # zero-match delete: nothing to mask
            continue
        dseq = LocalTable._parse_dir_seq(d) or 10**9
        del_parts.append(
            f"SELECT \"{_ROW_ID}\" AS _del_row_id, "
            f"CAST({dseq} AS BIGINT) AS _dseq "
            f"FROM read_parquet('{_dir_glob(d)}')"
        )
    if del_parts:
        dels_sql = " UNION ALL ".join(del_parts)
        filters.append(
            f"NOT EXISTS (SELECT 1 FROM ({dels_sql}) x "
            f"WHERE x._del_row_id = d.\"{_ROW_ID}\" AND d._seq < x._dseq)"
        )
    for entry in snap.eq_deletes:
        if not _has_parquet(entry["dir"]):
            continue
        # null-UNSAFE key equality, matching the engine's == semantics
        # (_apply_eq_deletes): a NULL key deletes nothing
        key_cond = " AND ".join(
            f"k.\"{c}\" = d.\"{c}\"" for c in entry["cols"]
        )
        filters.append(
            f"NOT EXISTS (SELECT 1 FROM "
            f"read_parquet('{_dir_glob(entry['dir'])}') k "
            f"WHERE {key_cond} AND d._seq < {int(entry['seq'])})"
        )
    where = ("WHERE " + "\n  AND ".join(filters)) if filters else ""
    return f"SELECT {cols} FROM (\n{data_sql}\n) d\n{where}"


def read_table_in_duckdb(table: LocalTable, snap: Snapshot | None = None):
    """Execute the generated statement in a fresh DuckDB connection and
    return the result as a pandas DataFrame (column order = declared
    schema). This is the second-engine read path the i40 driver query and
    ``verify.py`` probe ride."""
    import duckdb

    con = duckdb.connect()
    try:
        return con.execute(duckdb_table_sql(table, snap)).df()
    finally:
        con.close()
