"""Env-backed engine configuration.

Parity target: the reference's ``core/config.py:5-6`` — a
``pydantic-settings`` shell reading ``.env`` with NO keys defined
(README.md:170-178 documents the intent). Here the same env-first shape
with the keys the engine actually consults, implemented on ``os.environ``
(pydantic-settings is not a baked-in dependency; stdlib keeps it exact).

Every key is overridable per-instance; the env supplies defaults. Prefix:
``DQ_``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(f"DQ_{name}", default)


@dataclass
class Config:
    """Engine defaults, resolved from the environment at construction.

    - ``dataset`` (DQ_DATASET): default dataset label on metric rows.
    - ``severity_level`` (DQ_SEVERITY): default rule severity.
    - ``approx_rsd`` (DQ_APPROX_RSD): relative std-dev for HLL distinct
      counts (UniqueRule default estimator).
    - ``max_bucket_size`` (DQ_MAX_BUCKET_SIZE): LSH hot-bucket cap.
    - ``sf_dir`` (DQ_SF_DIR / SPARK_GRAFT_SF_DIR): fixture table root.
    """

    dataset: str = field(default_factory=lambda: _env("DATASET", ""))
    severity_level: str = field(default_factory=lambda: _env("SEVERITY", "medium"))
    approx_rsd: float = field(
        default_factory=lambda: float(_env("APPROX_RSD", "0.01"))
    )
    max_bucket_size: int = field(
        default_factory=lambda: int(_env("MAX_BUCKET_SIZE", "1000"))
    )
    sf_dir: str = field(
        default_factory=lambda: _env(
            "SF_DIR", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        )
    )
