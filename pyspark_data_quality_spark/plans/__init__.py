from .analysis import AnalysisRunner
from .compile import and_fold, null_safe, or_fold, ratio_agg, require_columns, to_condition

__all__ = [
    "AnalysisRunner",
    "and_fold",
    "null_safe",
    "or_fold",
    "ratio_agg",
    "require_columns",
    "to_condition",
]
