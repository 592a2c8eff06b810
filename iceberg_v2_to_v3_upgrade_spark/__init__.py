"""PySpark-native analytics engine with the capability surface of
``ryancicak/iceberg-v2-to-v3-upgrade``.

The reference is a lakehouse-table-migration orchestrator (Iceberg V2->V3
upgrade over EMR/Glue/Databricks). This package re-expresses that entire
surface Spark-first and in-process:

- ``tables/``   — mutable, versioned, partitioned tables (create / insert /
                  MoR delete / MoR update / format-version upgrade /
                  compaction / snapshot expiry), reference §2.A/2.I.
- ``catalog``   — table enumeration + properties (reference §2.J).
- ``operators/``— the declared analytic read surface (scans, filters,
                  joins, aggregations, windows, set ops) plus the [EXT]
                  LLM-data-pipeline operators (dedup, similarity search,
                  text analysis, event analytics).
- ``functions/``— array / hashing helpers built on pyspark.sql.functions.
- ``streaming/``— Structured Streaming twins of the event operators.
- ``multimodal/``— binary-column (image/audio) plumbing via mapInPandas.
- ``plans/``    — control-plane plans (conditional upgrade, dry-run explain).

Every declared query lives in the central :mod:`.registry` and is exported
through ``/root/repo/__spark_entry__.py`` together with a DuckDB oracle.
"""

from iceberg_v2_to_v3_upgrade_spark.session import get_spark  # noqa: F401
from iceberg_v2_to_v3_upgrade_spark.io import load_table, register_views  # noqa: F401

__version__ = "0.1.0"
