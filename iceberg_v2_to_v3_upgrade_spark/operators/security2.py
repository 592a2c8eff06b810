"""Round-9 driver-gate conversion: row-level security (SURVEY §2 J+
round-3 row — the last user-facing tests-only security surface).

The reference's Lake Formation data-cell filters
(``internal/lake_formation_setup.py:22-171``) restrict which ROWS a
principal's scans see; this engine's analog is the gateway's
``GRANT ROW FILTER (<pred>) ON db.t TO 'principal'``. The arc query
below proves, behind the driver's hash gate, every semantics the
router tests pin: filtered SELECT, refused whole-row mutations
(MERGE/DELETE/UPDATE into a filtered table), refused metadata tables,
the MERGE-SOURCE being filtered (hidden rows cannot be smuggled into
another table through a merge), and clean restoration after REVOKE.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

_J8_ORACLE = """
    WITH b AS (
        SELECT CAST(count(*) AS BIGINT) AS v FROM customer
        WHERE c_mktsegment = 'BUILDING'
    ),
    f AS (SELECT CAST(count(*) AS BIGINT) AS v FROM customer),
    report(step, action, allowed, n_rows) AS (
        VALUES
            (1,  'analyst_select',        TRUE,  (SELECT v FROM b)),
            (2,  'owner_select',          TRUE,  (SELECT v FROM f)),
            (3,  'merge_into_filtered',   FALSE, CAST(NULL AS BIGINT)),
            (4,  'delete_on_filtered',    FALSE, CAST(NULL AS BIGINT)),
            (5,  'update_on_filtered',    FALSE, CAST(NULL AS BIGINT)),
            (6,  'snapshots_metadata',    FALSE, CAST(NULL AS BIGINT)),
            (7,  'files_metadata',        FALSE, CAST(NULL AS BIGINT)),
            (8,  'merge_source_filtered', TRUE,  (SELECT v FROM b)),
            (9,  'post_revoke_select',    TRUE,  (SELECT v FROM f)),
            (10, 'post_revoke_merge',     TRUE,  (SELECT v FROM f))
    )
    SELECT step, action, allowed, n_rows FROM report ORDER BY step
"""


@declare(
    "j8_row_security_arc",
    oracle=_J8_ORACLE,
    tags=("security", "catalog", "row-filter"),
)
def j8_row_security_arc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level security end-to-end under an ENFORCING store (round-9
    verdict #5): the analyst principal is row-filtered to BUILDING
    customers via the gateway's GRANT ROW FILTER; then

    - (1) the analyst's SELECT sees exactly the filtered count while
      (2) the unfiltered owner sees all rows;
    - (3-5) MERGE/DELETE/UPDATE against the filtered table are REFUSED
      for the analyst (whole-row mutations could read or destroy hidden
      rows — the conservative LF stance the router tests pin);
    - (6-7) metadata tables (snapshots/files) are refused too: record
      counts and file sizes are computed over hidden rows;
    - (8) the analyst CAN merge FROM the filtered table into their own
      staging table — and only the filtered rows arrive (the
      MERGE-source path applies the filter; hidden rows cannot be
      exfiltrated through a merge);
    - (9-10) after REVOKE ROW FILTER the scan and the same merge see
      every row again.

    Each (step, action, allowed, n_rows) fact is a returned row,
    hash-gated against the oracle's restatement of the policy. The J8
    account-id surface (``permissions.get_account_id``) is asserted
    in-query (12-digit, deterministic).

    Reference parity: ``internal/lake_formation_setup.py:22-171``
    (grants + data-cell filters), ``:11-19`` (caller identity).
    """
    from iceberg_v2_to_v3_upgrade_spark.sql_router import (
        EngineSQL,
        PermissionDenied,
    )
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
    from iceberg_v2_to_v3_upgrade_spark.tables.permissions import (
        get_account_id,
        setup_permissions,
    )

    warehouse = tempfile.mkdtemp(prefix="rowsec_wh_")
    acct = get_account_id(warehouse)
    assert len(acct) == 12 and acct.isdigit(), acct
    assert acct == get_account_id(warehouse), "account id not stable"

    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "sec_db",
        "cust_rf",
        "c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    t.insert(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
    )
    catalog.create_table(
        "sec_db",
        "staging_rf",
        "c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    store = catalog.permissions
    setup_permissions(store, "analyst", "sec_db", "cust_rf")
    setup_permissions(store, "analyst", "sec_db", "staging_rf")
    store.enable_enforcement()
    admin = EngineSQL(catalog)
    admin.execute_one(
        "GRANT ROW FILTER (c_mktsegment = 'BUILDING') "
        "ON sec_db.cust_rf TO 'analyst'"
    )
    analyst = EngineSQL(catalog, principal="analyst")

    def _count(router: EngineSQL, table: str) -> int:
        return (
            router.execute_one(
                f"SELECT c_custkey FROM glue_catalog.sec_db.{table}"
            )
            .df.count()
        )

    def _denied(sql: str) -> bool:
        try:
            analyst.execute_one(sql)
            return False
        except PermissionDenied:
            return True

    merge_sql = (
        "MERGE INTO sec_db.staging_rf t USING "
        "(SELECT c_custkey, c_acctbal, c_mktsegment "
        "FROM glue_catalog.sec_db.cust_rf) s "
        "ON t.c_custkey = s.c_custkey "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = [
        (1, "analyst_select", True, _count(analyst, "cust_rf")),
        (2, "owner_select", True, _count(admin, "cust_rf")),
        (
            3,
            "merge_into_filtered",
            not _denied(
                "MERGE INTO sec_db.cust_rf t USING "
                "(SELECT c_custkey, c_acctbal, c_mktsegment "
                "FROM glue_catalog.sec_db.staging_rf) s "
                "ON t.c_custkey = s.c_custkey "
                "WHEN NOT MATCHED THEN INSERT *"
            ),
            None,
        ),
        (
            4,
            "delete_on_filtered",
            not _denied("DELETE FROM sec_db.cust_rf WHERE c_custkey = 1"),
            None,
        ),
        (
            5,
            "update_on_filtered",
            not _denied(
                "UPDATE sec_db.cust_rf SET c_acctbal = 0 WHERE c_custkey = 1"
            ),
            None,
        ),
        (
            6,
            "snapshots_metadata",
            not _denied("SELECT * FROM sec_db.cust_rf.snapshots"),
            None,
        ),
        (
            7,
            "files_metadata",
            not _denied("SELECT * FROM sec_db.cust_rf.files"),
            None,
        ),
    ]
    # (8) MERGE-source filtering: the analyst merges FROM the filtered
    # table into their own staging table — only BUILDING rows land
    analyst.execute_one(merge_sql)
    rows.append(
        (8, "merge_source_filtered", True, _count(admin, "staging_rf"))
    )
    admin.execute_one(
        "REVOKE ROW FILTER ON sec_db.cust_rf FROM 'analyst'"
    )
    rows.append(
        (9, "post_revoke_select", True, _count(analyst, "cust_rf"))
    )
    analyst.execute_one(merge_sql)  # insert-only: tops staging up to full
    rows.append(
        (10, "post_revoke_merge", True, _count(admin, "staging_rf"))
    )
    return spark.createDataFrame(
        rows, "step int, action string, allowed boolean, n_rows bigint"
    ).orderBy("step")
