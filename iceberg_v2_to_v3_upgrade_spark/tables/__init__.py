from iceberg_v2_to_v3_upgrade_spark.tables.table import LocalTable  # noqa: F401
from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog  # noqa: F401
