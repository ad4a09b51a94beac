"""Enumerations for severity levels, quality dimensions and check status.

Capability parity with the reference's ``core/_enums.py:5-28``
(SeverityLevel, Dimension, FreshnessPeriod, CheckStatus). The reference
declared ``FreshnessPeriod`` but never used it; here it backs the
:class:`~pyspark_data_quality_spark.operators.freshness.FreshnessRule`.
"""

from __future__ import annotations

from enum import Enum


class SeverityLevel(str, Enum):
    LOW = "low"
    MEDIUM = "medium"
    HIGH = "high"
    CRITICAL = "critical"


class Dimension(str, Enum):
    FRESHNESS = "freshness"
    COMPLETENESS = "completeness"
    ACCURACY = "accuracy"
    CONSISTENCY = "consistency"
    UNIQUENESS = "uniqueness"
    VALIDITY = "validity"


class FreshnessPeriod(str, Enum):
    YEAR = "year"
    MONTH = "month"
    WEEK = "week"
    DAY = "day"
    HOUR = "hour"
    MINUTE = "minute"


#: Seconds per freshness period (driver-side constant, used to convert
#: an age in seconds into the rule's declared unit).
FRESHNESS_PERIOD_SECONDS = {
    FreshnessPeriod.YEAR: 365 * 86400.0,
    FreshnessPeriod.MONTH: 30 * 86400.0,
    FreshnessPeriod.WEEK: 7 * 86400.0,
    FreshnessPeriod.DAY: 86400.0,
    FreshnessPeriod.HOUR: 3600.0,
    FreshnessPeriod.MINUTE: 60.0,
}


class CheckStatus(str, Enum):
    SUCCESS = "SUCCESS"
    FAILURE = "FAILURE"
