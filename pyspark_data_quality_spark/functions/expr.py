"""Expression-tree helpers shared by the column-function modules."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_bind(value: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding for expression trees: evaluate ``value`` once per row
    and pass it to ``body`` as a lambda variable (O(1) lookup per
    reference). Spark's interpreted expression evaluation has no
    common-subexpression elimination inside higher-order-function
    lambdas, so an expression referenced N times is computed N times —
    binding via a single-element ``transform`` caps that at once.
    Nesting is fine (inner lambdas may reference outer variables).
    """
    return F.element_at(F.transform(F.array(value), body), 1)
