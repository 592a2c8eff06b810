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
as SQL rather than Avro).

Fidelity covered by the generated SQL:
- hive-partitioned data dirs (identity and transform partition columns
  are directory-encoded; DuckDB's ``hive_partitioning`` recovers them),
- positional deletes via global ``_row_id`` anti-join,
- V3 carried row ids: delete files scope to data committed BEFORE them
  (``data._seq < delete._dseq``), so an UPDATE's rewritten row — same
  ``_row_id``, newer sequence — survives its own tombstone,
- equality deletes: key anti-join against older-sequence data only,
- cherry-pick/rebase sequence overrides (``Snapshot.seq_overrides``).
"""

from __future__ import annotations

import os

from iceberg_v2_to_v3_upgrade_spark.tables.table import (
    _ROW_ID,
    LocalTable,
    Snapshot,
)


def _dir_glob(d: str) -> str:
    """Recursive parquet glob: matches files at the dir root (unpartitioned
    writes) and under key=value subdirs (partitioned writes)."""
    return os.path.join(d, "**", "*.parquet").replace("'", "''")


def duckdb_table_sql(table: LocalTable, snap: Snapshot | None = None) -> str:
    """One DuckDB SELECT that reproduces ``table.scan()`` for ``snap``
    (default: current snapshot) straight from the table's files."""
    snap = snap or table.current_snapshot()
    declared = table.spark.createDataFrame([], table.schema_ddl).schema
    cols = ", ".join(f'"{name}"' for name in declared.fieldNames())
    if not snap.data_dirs:
        duck_types = {
            "integer": "INTEGER",
            "long": "BIGINT",
            "short": "SMALLINT",
            "double": "DOUBLE",
            "float": "REAL",
            "boolean": "BOOLEAN",
            "date": "DATE",
            "timestamp": "TIMESTAMP",
        }
        typed = ", ".join(
            f"CAST(NULL AS {duck_types.get(f.dataType.typeName(), 'VARCHAR')})"
            f' AS "{f.name}"'
            for f in declared
        )
        return f"SELECT {typed} WHERE FALSE"
    data_parts = []
    for d in snap.data_dirs:
        seq = table._delete_scope_seq(d, snap)
        data_parts.append(
            f"SELECT *, CAST({seq} AS BIGINT) AS _seq "
            f"FROM read_parquet('{_dir_glob(d)}', "
            f"hive_partitioning=1, union_by_name=1)"
        )
    data_sql = "\nUNION ALL BY NAME\n".join(data_parts)
    filters = []
    if snap.delete_dirs:
        del_parts = []
        for d in snap.delete_dirs:
            dseq = LocalTable._parse_dir_seq(d) or 10**9
            del_parts.append(
                f"SELECT \"{_ROW_ID}\" AS _del_row_id, "
                f"CAST({dseq} AS BIGINT) AS _dseq "
                f"FROM read_parquet('{_dir_glob(d)}')"
            )
        dels_sql = " UNION ALL ".join(del_parts)
        filters.append(
            f"NOT EXISTS (SELECT 1 FROM ({dels_sql}) x "
            f"WHERE x._del_row_id = d.\"{_ROW_ID}\" AND d._seq < x._dseq)"
        )
    for entry in snap.eq_deletes:
        key_cond = " AND ".join(
            f"k.\"{c}\" IS NOT DISTINCT FROM d.\"{c}\"" for c in entry["cols"]
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
