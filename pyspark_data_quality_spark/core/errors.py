"""Framework exceptions.

Parity with the reference's ``core/exceptation.py:3-7`` (ColumnNotFoundError),
plus analysis-time validation errors the reference lacked.
"""

from __future__ import annotations


class DataQualityError(Exception):
    """Base class for all framework errors."""


class ColumnNotFoundError(DataQualityError):
    """A rule references columns absent from the input DataFrame."""

    def __init__(self, missing: list[str], available: list[str] | None = None):
        self.missing = list(missing)
        self.available = list(available or [])
        msg = f"Columns not found: {sorted(self.missing)}"
        if self.available:
            msg += f" (available: {sorted(self.available)})"
        super().__init__(msg)


class RuleConfigurationError(DataQualityError):
    """A rule was declared with an invalid configuration."""


class NoDataError(DataQualityError):
    """`run()` was invoked before `set_data()`."""
