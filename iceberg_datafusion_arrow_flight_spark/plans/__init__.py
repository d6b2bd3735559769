"""Query-plan catalog.

The reference exposes its entire operator surface through one entry point —
``ctx.sql(user_query)`` at iceberg-datafusion-arrow-flight/src/lib.rs:678 —
so its capability contract is "the set of SQL shapes DataFusion 40
executes" (SURVEY §2).  This package re-expresses that contract as a
registry of named, declarative Spark plans: every SURVEY §2 row gets at
least one :class:`~.base.QuerySpec`, built with the DataFrame API (so
Catalyst owns physical strategy selection) and paired with an ANSI-SQL
oracle string for the DuckDB correctness gate.

Importing this package populates the registry.
"""

from .base import REGISTRY, QuerySpec, register, table

# Import for registration side effects — order defines display order.
from . import tpch            # noqa: E402,F401
from . import relational      # noqa: E402,F401
from . import aggregates      # noqa: E402,F401
from . import windows         # noqa: E402,F401
from . import scalar_funcs    # noqa: E402,F401
from . import nested          # noqa: E402,F401
from . import dedup           # noqa: E402,F401
from . import similarity      # noqa: E402,F401
from . import text            # noqa: E402,F401
from . import multimodal      # noqa: E402,F401
from . import events          # noqa: E402,F401
from . import dialect_queries # noqa: E402,F401
from . import ddl_io         # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register", "table"]
