"""J7/J8 — the reference's Lake Formation permission surface made local
(reference internal/lake_formation_setup.py). The router's DDL/DML paths
consult the catalog's PermissionStore once enforcement is enabled; a fresh
store is non-enforcing (LF's IAM-access default), which keeps unsecured
workflows identical to round 1.
"""

from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.sql_router import (
    EngineSQL,
    PermissionDenied,
    TableError,
)
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
from iceberg_v2_to_v3_upgrade_spark.tables.permissions import (
    DB_PERMISSIONS,
    IAM_ALLOWED_PRINCIPALS,
    TABLE_PERMISSIONS,
    get_account_id,
    setup_permissions,
)

ROLE = "arn:aws:iam::123456789012:role/engineer"


@pytest.fixture()
def catalog(spark, tmp_path):
    return LocalCatalog(spark, str(tmp_path / "wh"))


def _mk_table(catalog):
    sql = EngineSQL(catalog, principal=ROLE)
    sql.execute(
        "CREATE TABLE glue_catalog.db1.t1 (id BIGINT, v STRING) USING iceberg;"
        "INSERT INTO glue_catalog.db1.t1 VALUES (1, 'a'), (2, 'b')"
    )
    return sql


def test_account_id_is_stable_12_digits(tmp_path):
    a = get_account_id(str(tmp_path))
    assert len(a) == 12 and a.isdigit()
    assert a == get_account_id(str(tmp_path))  # deterministic (J8)


def test_fresh_store_is_non_enforcing(catalog):
    # anonymous principal, zero grants: everything allowed (LF IAM default)
    sql = EngineSQL(catalog)
    res = sql.execute(
        "CREATE TABLE glue_catalog.db1.t1 (id BIGINT) USING iceberg;"
        "DROP TABLE IF EXISTS glue_catalog.db1.t1"
    )
    assert [r.kind for r in res] == ["create_table", "drop_table"]


def test_unprivileged_drop_denied(catalog):
    _mk_table(catalog)
    catalog.permissions.grant_iam_allowed_principals("db1")  # db-level only
    catalog.permissions.enable_enforcement()
    intruder = EngineSQL(catalog, principal="arn:aws:iam::123456789012:role/intruder")
    with pytest.raises(PermissionDenied, match="DROP"):
        intruder.execute_one("DROP TABLE glue_catalog.db1.t1")
    # the table survived
    assert catalog.table_exists("db1", "t1")


def test_unprivileged_dml_denied_then_granted(catalog):
    _mk_table(catalog)
    catalog.permissions.enable_enforcement()
    user = EngineSQL(catalog, principal="arn:aws:iam::123456789012:role/analyst")
    with pytest.raises(PermissionDenied, match="INSERT"):
        user.execute_one("INSERT INTO glue_catalog.db1.t1 VALUES (3, 'c')")
    with pytest.raises(PermissionDenied, match="DELETE"):
        user.execute_one("DELETE FROM glue_catalog.db1.t1 WHERE id = 1")
    with pytest.raises(PermissionDenied, match="ALTER"):
        user.execute_one(
            "ALTER TABLE glue_catalog.db1.t1 SET TBLPROPERTIES ('k' = 'v')"
        )
    catalog.permissions.grant_table_permissions(user.principal, "db1", "t1")
    res = user.execute_one("INSERT INTO glue_catalog.db1.t1 VALUES (3, 'c')")
    assert "appended" in res.message


def test_update_requires_delete_and_insert(catalog):
    _mk_table(catalog)
    catalog.permissions.enable_enforcement()
    user = EngineSQL(catalog, principal="arn:aws:iam::123456789012:role/writer")
    catalog.permissions.grant_table_permissions(
        user.principal, "db1", "t1", ["INSERT"]
    )
    with pytest.raises(PermissionDenied, match="DELETE"):
        user.execute_one("UPDATE glue_catalog.db1.t1 SET v = 'x' WHERE id = 1")
    catalog.permissions.grant_table_permissions(
        user.principal, "db1", "t1", ["DELETE"]
    )
    res = user.execute_one("UPDATE glue_catalog.db1.t1 SET v = 'x' WHERE id = 1")
    assert res.kind == "update"


def test_create_table_needs_db_grant(catalog):
    catalog.create_database("db2")
    catalog.permissions.enable_enforcement()
    user = EngineSQL(catalog, principal="arn:aws:iam::123456789012:role/creator")
    with pytest.raises(PermissionDenied, match="CREATE_TABLE"):
        user.execute_one("CREATE TABLE glue_catalog.db2.t2 (id BIGINT) USING iceberg")
    catalog.permissions.grant_database_permissions(user.principal, "db2")
    assert (
        user.execute_one("CREATE TABLE glue_catalog.db2.t2 (id BIGINT) USING iceberg").kind
        == "create_table"
    )


def test_iam_allowed_principals_wildcard(catalog):
    """A grant to IAM_ALLOWED_PRINCIPALS admits every principal — the
    reference's IAM-based access path (lake_formation_setup.py:93-141)."""
    _mk_table(catalog)
    catalog.permissions.grant_iam_allowed_principals("db1", "t1")
    catalog.permissions.enable_enforcement()
    anyone = EngineSQL(catalog, principal="arn:aws:iam::123456789012:role/random")
    assert "appended" in anyone.execute_one(
        "INSERT INTO glue_catalog.db1.t1 VALUES (9, 'z')"
    ).message
    # ...but DROP is not in the IAM table set, so it still fails
    with pytest.raises(PermissionDenied, match="DROP"):
        anyone.execute_one("DROP TABLE glue_catalog.db1.t1")


def test_setup_permissions_arc_and_revoke(catalog):
    """The reference CLI's grant arc, then revoke closes access again."""
    _mk_table(catalog)
    assert setup_permissions(catalog.permissions, ROLE, "db1", "t1")
    catalog.permissions.enable_enforcement()
    owner = EngineSQL(catalog, principal=ROLE)
    assert owner.execute_one("DELETE FROM glue_catalog.db1.t1 WHERE id = 2").kind == "delete"
    # closing access means revoking the role AND the IAM wildcard the setup
    # arc granted (wildcard admits every principal, reference :93-141)
    catalog.permissions.revoke_table_permissions(ROLE, "db1", "t1")
    catalog.permissions.revoke_table_permissions(
        IAM_ALLOWED_PRINCIPALS, "db1", "t1"
    )
    with pytest.raises(PermissionDenied):
        owner.execute_one("DELETE FROM glue_catalog.db1.t1 WHERE id = 1")


def test_grants_idempotent_and_persisted(catalog):
    # double-grant is the reference's "AlreadyExists -> [OK]" path
    assert catalog.permissions.grant_database_permissions(ROLE, "db1")
    assert catalog.permissions.grant_database_permissions(ROLE, "db1")
    # a second store over the same warehouse sees the same grants
    fresh = LocalCatalog(catalog.spark, catalog.warehouse).permissions
    assert fresh.check_database(ROLE, "db1", "DROP") or not fresh.enforcing
    fresh.enable_enforcement()
    for p in DB_PERMISSIONS:
        assert fresh.check_database(ROLE, "db1", p)
    assert not fresh.check_database("nobody", "db1", "DROP")
    for p in TABLE_PERMISSIONS:
        assert not fresh.check_table("nobody", "db1", "t1", p)


def test_column_mask_nulls_values_for_principal(spark, tmp_path):
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    admin = EngineSQL(catalog, principal=None)  # non-enforcing default
    admin.execute(
        """
        CREATE TABLE glue_catalog.sec_db.people (
            id INT, name STRING, salary DECIMAL(10,2)
        ) USING iceberg;
        INSERT INTO glue_catalog.sec_db.people VALUES
            (1, 'ada', 100.00), (2, 'bob', 200.00);
        GRANT COLUMN MASK (salary, name) ON sec_db.people TO 'analyst';
        """
    )
    analyst = EngineSQL(catalog, principal="analyst")
    rows = analyst.execute_one(
        "SELECT id, name, salary FROM sec_db.people ORDER BY id"
    ).df.collect()
    assert [r.id for r in rows] == [1, 2]  # schema + row count intact
    assert all(r.name is None and r.salary is None for r in rows)

    # an unmasked principal still sees everything
    other = EngineSQL(catalog, principal="other")
    rows = other.execute_one(
        "SELECT name FROM sec_db.people ORDER BY id"
    ).df.collect()
    assert [r.name for r in rows] == ["ada", "bob"]

    # revoke restores visibility
    admin.execute_one("REVOKE COLUMN MASK ON sec_db.people FROM 'analyst'")
    rows = analyst.execute_one(
        "SELECT name FROM sec_db.people ORDER BY id"
    ).df.collect()
    assert [r.name for r in rows] == ["ada", "bob"]


@pytest.fixture()
def masked_people(spark, tmp_path):
    """sec_db.people with salary+name masked for 'analyst' (admin is a
    distinct principal holding an EXPLICIT ALTER grant — ALL mask/filter
    administration requires one; store left non-enforcing otherwise)."""
    catalog = LocalCatalog(spark, str(tmp_path / "wh"))
    admin = EngineSQL(catalog, principal="admin")
    admin.execute(
        """
        CREATE TABLE glue_catalog.sec_db.people (
            id INT, name STRING, salary DECIMAL(10,2), region STRING
        ) USING iceberg PARTITIONED BY (region);
        INSERT INTO glue_catalog.sec_db.people VALUES
            (1, 'ada', 100.00, 'emea'), (2, 'bob', 200.00, 'apac');
        """
    )
    catalog.permissions.grant_table_permissions(
        "admin", "sec_db", "people", ["ALTER"]
    )
    admin.execute_one(
        "GRANT COLUMN MASK (salary, name) ON sec_db.people TO 'analyst'"
    )
    return catalog, admin, EngineSQL(catalog, principal="analyst")


def test_column_mask_self_revoke_denied(masked_people):
    """A masked principal must not remove its own mask via the
    non-enforcing ALTER default — that would make masks self-service.
    Nor may it administer ANYONE's masks (two masked principals could
    otherwise revoke each other's): all administration needs an
    explicit ALTER grant."""
    catalog, admin, analyst = masked_people
    with pytest.raises(PermissionDenied, match="explicit ALTER grant"):
        analyst.execute_one(
            "REVOKE COLUMN MASK ON sec_db.people FROM 'analyst'"
        )
    with pytest.raises(PermissionDenied, match="explicit ALTER grant"):
        analyst.execute_one(
            "GRANT COLUMN MASK (id) ON sec_db.people TO 'analyst'"
        )
    # the mutual-revoke bypass: an unprivileged THIRD principal may not
    # administer the analyst's masks either
    with pytest.raises(PermissionDenied, match="explicit ALTER grant"):
        EngineSQL(catalog, principal="other").execute_one(
            "REVOKE COLUMN MASK ON sec_db.people FROM 'analyst'"
        )
    # the admin (explicit ALTER grant) still administers freely
    admin.execute_one("REVOKE COLUMN MASK ON sec_db.people FROM 'analyst'")
    rows = analyst.execute_one(
        "SELECT name FROM sec_db.people ORDER BY id"
    ).df.collect()
    assert [r.name for r in rows] == ["ada", "bob"]
    # and with an EXPLICIT ALTER grant the principal is a real admin and
    # may modify its own masks
    catalog.permissions.grant_table_permissions(
        "analyst", "sec_db", "people", ["ALTER"]
    )
    analyst.execute_one(
        "GRANT COLUMN MASK (salary) ON sec_db.people TO 'analyst'"
    )
    analyst.execute_one("REVOKE COLUMN MASK ON sec_db.people FROM 'analyst'")


def test_column_mask_grants_accumulate(masked_people):
    """A second GRANT COLUMN MASK adds columns (GRANT verbs accumulate,
    like table grants) instead of replacing the earlier list."""
    catalog, admin, analyst = masked_people
    admin.execute_one("GRANT COLUMN MASK (id) ON sec_db.people TO 'analyst'")
    assert catalog.permissions.masked_columns(
        "analyst", "sec_db", "people"
    ) == {"id", "name", "salary"}


def test_column_mask_validates_and_normalizes_columns(masked_people):
    """Unknown columns are rejected at grant time; wrong-case grants are
    normalized to the schema's case so they actually mask."""
    catalog, admin, analyst = masked_people
    from iceberg_v2_to_v3_upgrade_spark.tables.table import TableError

    with pytest.raises(TableError, match="no column 'slary'"):
        admin.execute_one(
            "GRANT COLUMN MASK (slary) ON sec_db.people TO 'other'"
        )
    admin.execute_one("GRANT COLUMN MASK (SALARY) ON sec_db.people TO 'other'")
    other = EngineSQL(catalog, principal="other")
    rows = other.execute_one(
        "SELECT salary FROM sec_db.people ORDER BY id"
    ).df.collect()
    assert all(r.salary is None for r in rows)


def test_column_mask_applies_to_merge_source(masked_people):
    """MERGE routes its source through the current principal's masked
    views — even right after an UNMASKED principal registered the same
    table as a temp view on the shared SparkSession."""
    catalog, admin, analyst = masked_people
    # admin SELECT registers sec_db_people UNMASKED in the shared session
    admin.execute_one("SELECT * FROM sec_db.people")
    analyst.execute(
        "CREATE TABLE glue_catalog.own_db.copy "
        "(id INT, name STRING, salary DECIMAL(10,2)) USING iceberg"
    )
    analyst.execute_one(
        "MERGE INTO own_db.copy t USING "
        "(SELECT id, name, salary FROM sec_db.people) s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = analyst.execute_one(
        "SELECT * FROM own_db.copy ORDER BY id"
    ).df.collect()
    assert [r.id for r in rows] == [1, 2]
    assert all(r.name is None and r.salary is None for r in rows)


def test_column_mask_covers_metadata_tables(masked_people):
    """partitions / SHOW PARTITIONS / files must not leak masked
    partition values via directory metadata."""
    catalog, admin, analyst = masked_people
    admin.execute_one("GRANT COLUMN MASK (region) ON sec_db.people TO 'analyst'")
    part_rows = analyst.execute_one(
        "SELECT * FROM sec_db.people.partitions"
    ).df.collect()
    assert part_rows and all(r.region is None for r in part_rows)
    show_rows = analyst.execute_one(
        "SHOW PARTITIONS sec_db.people"
    ).df.collect()
    assert show_rows and all(r.region is None for r in show_rows)
    file_rows = analyst.execute_one(
        "SELECT file_path FROM sec_db.people.files"
    ).df.collect()
    assert file_rows
    assert all("region=***" in r.file_path for r in file_rows)
    assert not any("emea" in r.file_path or "apac" in r.file_path
                   for r in file_rows)
    # the admin (unmasked) still sees real partition values
    admin_rows = admin.execute_one(
        "SELECT * FROM sec_db.people.partitions"
    ).df.collect()
    assert sorted(r.region for r in admin_rows) == ["apac", "emea"]


def test_row_filter_restricts_rows_for_principal(masked_people):
    """GRANT ROW FILTER (pred) ON t TO 'p' — the LF row-level data filter
    (reference internal/lake_formation_setup.py data-cell filters): the
    principal's scans only see rows satisfying the predicate."""
    catalog, admin, analyst = masked_people
    admin.execute_one(
        "GRANT ROW FILTER (region = 'emea') ON sec_db.people TO 'analyst'"
    )
    rows = analyst.execute_one(
        "SELECT id, region FROM sec_db.people ORDER BY id"
    ).df.collect()
    assert [(r.id, r.region) for r in rows] == [(1, "emea")]
    # an unfiltered principal still sees every row
    other = EngineSQL(catalog, principal="other")
    assert (
        other.execute_one("SELECT count(*) AS n FROM sec_db.people")
        .df.collect()[0].n
        == 2
    )
    # a second grant REPLACES the filter (single predicate per principal)
    admin.execute_one(
        "GRANT ROW FILTER (region = 'apac') ON sec_db.people TO 'analyst'"
    )
    rows = analyst.execute_one(
        "SELECT id FROM sec_db.people"
    ).df.collect()
    assert [r.id for r in rows] == [2]
    # revoke restores full visibility
    admin.execute_one("REVOKE ROW FILTER ON sec_db.people FROM 'analyst'")
    assert (
        analyst.execute_one("SELECT count(*) AS n FROM sec_db.people")
        .df.collect()[0].n
        == 2
    )


def test_row_filter_self_administration_denied(masked_people):
    catalog, admin, analyst = masked_people
    admin.execute_one(
        "GRANT ROW FILTER (region = 'emea') ON sec_db.people TO 'analyst'"
    )
    with pytest.raises(PermissionDenied):
        analyst.execute_one(
            "REVOKE ROW FILTER ON sec_db.people FROM 'analyst'"
        )
    with pytest.raises(PermissionDenied):
        analyst.execute_one(
            "GRANT ROW FILTER (1 = 1) ON sec_db.people TO 'analyst'"
        )


def test_row_filter_validates_predicate_at_grant(masked_people):
    """A typo'd filter must fail loudly at grant time, not silently
    filter nothing at read time."""
    catalog, admin, analyst = masked_people
    with pytest.raises(TableError, match="does not analyze"):
        admin.execute_one(
            "GRANT ROW FILTER (regon = 'emea') ON sec_db.people TO 'analyst'"
        )


def test_row_filter_composes_with_column_mask(masked_people):
    """Filter evaluates FIRST on raw values, then the mask projection —
    so a filter may reference a column the principal reads as NULL."""
    catalog, admin, analyst = masked_people
    admin.execute_one(
        "GRANT ROW FILTER (salary > 150.00) ON sec_db.people TO 'analyst'"
    )
    rows = analyst.execute_one(
        "SELECT id, salary FROM sec_db.people"
    ).df.collect()
    assert [r.id for r in rows] == [2]          # filtered on raw salary
    assert rows[0].salary is None               # ...still masked on read


def test_row_filter_denies_metadata_tables(masked_people):
    """partitions/files record-counts are computed over ALL rows and
    would leak hidden-row volume; the filtered principal is refused."""
    catalog, admin, analyst = masked_people
    admin.execute_one(
        "GRANT ROW FILTER (region = 'emea') ON sec_db.people TO 'analyst'"
    )
    for q in (
        "SELECT * FROM sec_db.people.partitions",
        "SELECT file_path FROM sec_db.people.files",
        "SHOW PARTITIONS sec_db.people",
    ):
        with pytest.raises(PermissionDenied, match="row-filtered"):
            analyst.execute_one(q)
    # the admin still reads metadata freely
    assert admin.execute_one(
        "SELECT * FROM sec_db.people.partitions"
    ).df.collect()


def test_row_filter_applies_to_merge_source(masked_people):
    """Using a filtered table as a MERGE source must not smuggle hidden
    rows into the target."""
    catalog, admin, analyst = masked_people
    catalog.permissions.grant_table_permissions(
        "analyst", "sec_db", "people", ["SELECT"]
    )
    admin.execute(
        """
        CREATE TABLE glue_catalog.sec_db.mirror (
            id INT, region STRING
        ) USING iceberg;
        GRANT ROW FILTER (region = 'emea') ON sec_db.people TO 'analyst';
        """
    )
    catalog.permissions.grant_table_permissions(
        "analyst", "sec_db", "mirror", ["SELECT", "INSERT", "DELETE", "ALTER"]
    )
    analyst.execute_one(
        "MERGE INTO sec_db.mirror t "
        "USING (SELECT id, region FROM sec_db.people) s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = admin.execute_one(
        "SELECT id, region FROM sec_db.mirror ORDER BY id"
    ).df.collect()
    assert [(r.id, r.region) for r in rows] == [(1, "emea")]


def test_row_filter_denies_whole_row_mutations(masked_people):
    """UPDATE/DELETE/MERGE/TRUNCATE scan raw rows and could pull hidden
    rows into the visible window (UPDATE SET region='emea' would expose
    every hidden row) — refused outright for filtered principals."""
    catalog, admin, analyst = masked_people
    for p in ("SELECT", "INSERT", "DELETE", "ALTER"):
        catalog.permissions.grant_table_permissions(
            "analyst", "sec_db", "people", [p]
        )
    admin.execute_one(
        "GRANT ROW FILTER (region = 'emea') ON sec_db.people TO 'analyst'"
    )
    for stmt in (
        "UPDATE sec_db.people SET region = 'emea' WHERE id > 0",
        "DELETE FROM sec_db.people WHERE id > 0",
        "TRUNCATE TABLE sec_db.people",
        "MERGE INTO sec_db.people t USING (SELECT 1 AS id) s "
        "ON t.id = s.id WHEN MATCHED THEN DELETE",
    ):
        with pytest.raises(PermissionDenied, match="row-filtered"):
            analyst.execute_one(stmt)
    # plain INSERT stays allowed: append-only, reads nothing
    analyst.execute_one(
        "INSERT INTO glue_catalog.sec_db.people VALUES "
        "(7, 'gia', 70.00, 'emea')"
    )
    # history/snapshots metadata also refused (not just files/partitions)
    for q in (
        "SELECT * FROM sec_db.people.history",
        "SELECT * FROM sec_db.people.snapshots",
    ):
        with pytest.raises(PermissionDenied, match="row-filtered"):
            analyst.execute_one(q)
