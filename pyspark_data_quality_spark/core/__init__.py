from .enums import CheckStatus, Dimension, FreshnessPeriod, SeverityLevel
from .errors import ColumnNotFoundError, DataQualityError, NoDataError
from .models import METRIC_SCHEMA, MetricResult

__all__ = [
    "CheckStatus",
    "ColumnNotFoundError",
    "DataQualityError",
    "Dimension",
    "FreshnessPeriod",
    "METRIC_SCHEMA",
    "MetricResult",
    "NoDataError",
    "SeverityLevel",
]
