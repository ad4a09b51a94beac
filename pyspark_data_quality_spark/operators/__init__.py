from .base import Rule, RunContext
from .completeness import CompletenessColRatioRule, CompletenessRawRatioRule
from .freshness import FreshnessRule
from .uniqueness import UniqueRule
from .validity import PredicateRule, RangeRule, RegexMatchRule, SetMembershipRule

__all__ = [
    "CompletenessColRatioRule",
    "CompletenessRawRatioRule",
    "FreshnessRule",
    "PredicateRule",
    "RangeRule",
    "RegexMatchRule",
    "Rule",
    "RunContext",
    "SetMembershipRule",
    "UniqueRule",
]
