from .base import Rule, RunContext
from .completeness import CompletenessColRatioRule, CompletenessRawRatioRule
from .uniqueness import UniqueRule

__all__ = [
    "CompletenessColRatioRule",
    "CompletenessRawRatioRule",
    "Rule",
    "RunContext",
    "UniqueRule",
]
