"""Central registry of declared queries.

Every operator this engine claims (SURVEY.md §2) registers here: a name, a
``(spark, sf_dir) -> DataFrame`` callable, and — when SQL-expressible — a
DuckDB oracle string over the same parquet views. ``__spark_entry__.py``
re-exports the registry verbatim, so registering a query *is* declaring it
to the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a declared query under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query: {name}")
        REGISTRY[name] = DeclaredQuery(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return wrap


def load_all_operators() -> dict[str, DeclaredQuery]:
    """Import every operator module so its @declare decorators run."""
    # Imports are at call time so `import iceberg_v2_to_v3_upgrade_spark`
    # stays cheap and cycle-free.
    from iceberg_v2_to_v3_upgrade_spark.operators import (  # noqa: F401
        relational,
        advanced,
        dedup,
        similarity,
        text,
        embeddings,
        events,
        lifecycle,
        tpch_extra,
        tpch_extra2,
        advanced2,
        sampling,
        curation,
        relevance,
    )
    from iceberg_v2_to_v3_upgrade_spark import multimodal  # noqa: F401
    from iceberg_v2_to_v3_upgrade_spark.multimodal import binary  # noqa: F401

    return REGISTRY
