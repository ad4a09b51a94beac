from .base import Rule, RunContext
from .completeness import CompletenessColRatioRule, CompletenessRawRatioRule
from .consistency import ReferentialIntegrityRule
from .freshness import FreshnessRule
from .uniqueness import UniqueRule
from .validity import PredicateRule, RangeRule, RegexMatchRule, SetMembershipRule

__all__ = [
    "CompletenessColRatioRule",
    "CompletenessRawRatioRule",
    "FreshnessRule",
    "PredicateRule",
    "RangeRule",
    "ReferentialIntegrityRule",
    "RegexMatchRule",
    "Rule",
    "RunContext",
    "SetMembershipRule",
    "UniqueRule",
]
