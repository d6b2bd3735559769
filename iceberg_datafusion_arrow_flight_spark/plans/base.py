"""Registry plumbing for the query-plan catalog.

Contract (mirrors the driver's correctness gate, see ``__spark_entry__.py``):

- ``build(spark, sf_dir) -> DataFrame`` — a *declarative* plan over the
  fixture tables under ``sf_dir``; never collects, never touches the driver.
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same Parquet (views
  pre-registered with the table names).  ``None`` for ops whose semantics
  are not SQL-expressible (the driver then records a rows-only check).
- Output columns are aliased identically on both sides (the comparator
  sorts columns by name and hashes values).
- Output must be deterministic **as a multiset**: no bare LIMIT without a
  total order, unique tie-breaks in every window ORDER BY, and
  floating-point aggregates rounded on both sides (cross-engine float
  summation order differs in the last ulp; rounding makes the hash stable).
  Beware ROUND on values that can land EXACTLY on a .5 digit boundary
  (e.g. a rounded sum divided by a count): Spark rounds the shortest
  decimal rendering, DuckDB rounds the binary value, and they disagree at
  the boundary — emit the unrounded quotient of identically-rounded
  operands instead (bit-identical inputs ⇒ bit-identical hash).

Every [P] operator row in SURVEY §2 is reachable in the reference only
via ctx.sql (iceberg-datafusion-arrow-flight/src/lib.rs:678); this registry is the
Spark-side enumeration of that surface.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()):
    """Decorator: add a build function to the catalog under ``name``."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle,
                                   doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn
    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand used by every plan builder."""
    return load_table(spark, sf_dir, name)
