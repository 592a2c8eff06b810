"""Engine configuration — shape mirrors the reference's config module
(K5, ``internal/config.py:11-82``): load from environment with defaults,
validate required keys, mask sensitive values when printing. Local paths
replace the AWS/Databricks endpoints.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass


@dataclass
class EngineConfig:
    warehouse: str = "/tmp/spark_graft_warehouse"
    sf_dir: str = "/root/testdata/sf0.1"
    cpus: int = 32
    shuffle_partitions: int = 32
    app_name: str = "iceberg-v2-to-v3-upgrade-spark"


def load_config() -> EngineConfig:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return EngineConfig(
        warehouse=os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
        ),
        sf_dir=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        cpus=cpus,
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        ),
    )


def validate_config(cfg: EngineConfig) -> list[str]:
    """Return problems (empty list == valid) — reference raises on missing
    required vars (internal/config.py:44-62); local required = readable
    fixture dir."""
    problems = []
    if not os.path.isdir(cfg.sf_dir):
        problems.append(f"sf_dir does not exist: {cfg.sf_dir}")
    if cfg.cpus < 1:
        problems.append(f"cpus must be >= 1, got {cfg.cpus}")
    return problems


def masked(cfg: EngineConfig) -> dict[str, str]:
    """Mask-for-display analog (internal/config.py:65-82). Nothing local is
    secret, but the shape is preserved for parity."""
    return {k: str(v) for k, v in asdict(cfg).items()}
