from iceberg_v2_to_v3_upgrade_spark.tables.table import (  # noqa: F401
    CommitConflictError,
    LocalTable,
    TableError,
)
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog  # noqa: F401
