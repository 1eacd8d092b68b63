"""Column-fold helpers: the two shapes this codebase builds dozens of times
— an OR over a list of predicates and a first-match-wins when-chain.  One
audited implementation instead of a hand-rolled None-seeded loop per query
(each copy is a chance for an off-by-one; see the round-3 review pass)."""

from __future__ import annotations

from functools import reduce
from operator import or_
from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def any_of(preds: Iterable[Column]) -> Column:
    """OR-fold of predicate columns (empty input is a caller bug)."""
    return reduce(or_, preds)


def when_chain(pairs: Iterable[tuple[Column, object]]) -> Column:
    """First-match-wins CASE over (predicate, value) pairs; null when none
    match (append an .otherwise at the call site for a default)."""
    chain = None
    for pred, value in pairs:
        chain = F.when(pred, value) if chain is None else chain.when(pred, value)
    return chain
