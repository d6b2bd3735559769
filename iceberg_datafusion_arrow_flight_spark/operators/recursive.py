"""Driver-loop fixpoint iteration — the recursive-CTE execution pattern.

Spark 4 executes ``WITH RECURSIVE`` natively (plans/relational.py
``cte_recursive``); this operator is the portable form SURVEY §7.1
step 5 calls for — required on Spark < 4.0, and still the right tool
when the step is not SQL-expressible (iterative algorithms: connected
components, label propagation, PageRank-style loops).

Scale notes:
- ``localCheckpoint`` every ``checkpoint_every`` iterations truncates
  lineage — without it, iteration N carries an N-deep plan and the
  driver's analysis cost goes quadratic.
- The frontier (delta) is what iterates, not the accumulated result —
  semi-naïve evaluation; each step touches only new rows.
- ``count()`` per iteration is the fixpoint test; it piggybacks on the
  checkpoint materialization, so each iteration runs once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from .materialize import materialize


def iterate_fixpoint(seed: DataFrame,
                     step: Callable[[DataFrame], DataFrame],
                     max_iterations: int = 100,
                     checkpoint_every: int = 5,
                     distinct_frontier: bool = False) -> DataFrame:
    """UNION ALL recursive-CTE semantics: result = seed ∪ step(seed) ∪
    step(step(seed)) ∪ … until ``step`` yields no rows (or max_iter).

    ``step`` receives the previous FRONTIER only (semi-naïve);
    ``distinct_frontier=True`` additionally dedups each frontier —
    UNION (not ALL) semantics against cycles."""
    frontier = seed.transform(materialize)
    acc = frontier
    for i in range(max_iterations):
        nxt = step(frontier)
        if distinct_frontier:
            nxt = nxt.distinct()
        if i % checkpoint_every == checkpoint_every - 1:
            nxt = nxt.transform(materialize)
        if nxt.isEmpty():
            return acc
        frontier = nxt
        acc = acc.unionAll(nxt)
    return acc
