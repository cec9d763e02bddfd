"""Expression-level let-binding for Catalyst.

Catalyst's ``CollapseProject`` rule inlines a projected subexpression
into every downstream use site.  For scalar references that is free,
but when the reference sits *inside a higher-order-function lambda*
the subexpression is re-evaluated per element (or once per duplicated
expression tree) — e.g. a word-shingle ``transform`` whose lambda calls
``element_at(split(text), i)`` re-runs the regex split for every
shingle, turning an O(len) tokenize into O(len * n_shingles).
Measured on the sf0.1 documents table this is a 40x slowdown.

``let_`` forces single evaluation per row with a pure-expression
trick: wrap the value in a one-element array and ``transform`` over
it, so the lambda variable is bound to the materialized value.  No
shuffle, no UDF, survives any projection collapse.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["let_"]


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row; pass the bound result to
    ``body``.  Equivalent to a SQL lateral ``LET`` / DuckDB positional
    CTE — Spark has no surface syntax for it, but lambda variables in
    higher-order functions are true bindings."""
    return F.element_at(F.transform(F.array(value), body), 1)
