"""pyspark_data_quality_spark — a PySpark-native data-quality analytics engine.

A ground-up, Spark-first rebuild of the capabilities of
``danielsmag/pyspark-data-quality`` (reference at /root/reference):
declarative quality rules compiled into a SINGLE fused aggregation pass
(instead of one Spark action per check), a consistent valid/invalid row
split with a ``failed_rules`` column, the reference's 14-field typed
metric schema — plus the large-scale training-data-pipeline operators the
reference never had: exact/near deduplication (MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search, text analysis, and
streaming checks. Designed for 100 TB on a real cluster; tested on
local mode.
"""

from .core.enums import CheckStatus, Dimension, FreshnessPeriod, SeverityLevel
from .core.errors import (
    ColumnNotFoundError,
    DataQualityError,
    NoDataError,
    RuleConfigurationError,
)
from .core.models import METRIC_SCHEMA, MetricResult
from .manager import DQManager
from .result import FAILED_RULES_COL, ResultObj

__all__ = [
    "CheckStatus",
    "ColumnNotFoundError",
    "DataQualityError",
    "Dimension",
    "DQManager",
    "FAILED_RULES_COL",
    "FreshnessPeriod",
    "METRIC_SCHEMA",
    "MetricResult",
    "NoDataError",
    "ResultObj",
    "RuleConfigurationError",
    "SeverityLevel",
]

__version__ = "0.1.0"
