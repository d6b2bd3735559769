"""Materialization seam for lazily-returned intermediate DataFrames.

Many operators in this package pin an intermediate result that the
returned (still-lazy) plan references more than once — LSH band tables,
per-round graph states, partition-id assignments.  On ``local[*]`` the
right tool is ``Dataset.localCheckpoint``: it truncates lineage (keeps
Catalyst analysis O(1) across iterative rounds), materializes eagerly,
and its blocks are reclaimed by the ContextCleaner on GC, so lazily
returned plans never leak pinned cache entries (the DuckDB-oracle gate
asserts the SQL CacheManager stays empty — see
``testing/oracle.py:_cache_manager_empty``).

On a real multi-executor cluster with dynamic allocation or executor
loss, ``localCheckpoint`` blocks are unrecoverable: losing one executor
kills the job.  The cluster-safe drop-ins are ``persist(MEMORY_AND_DISK)``
(recomputable lineage, but no lineage truncation) or a reliable
``checkpoint`` to the configured checkpoint dir (truncates lineage AND
survives executor loss, at the cost of a distributed write).  Rather
than editing ~75 call sites to switch, every operator routes through
:func:`materialize` / :func:`materialize_lazy` below and the strategy is
a process-level switch:

    SPARK_GRAFT_MATERIALIZE=local_checkpoint   (default, local[*])
    SPARK_GRAFT_MATERIALIZE=persist            (cluster, recompute-safe)
    SPARK_GRAFT_MATERIALIZE=checkpoint         (cluster, reliable; needs
                                                spark.sparkContext.setCheckpointDir)

Call sites keep chain style via ``DataFrame.transform``::

    bands = _bands(df).transform(materialize)

Notes per strategy:

- ``persist`` registers in the SQL CacheManager and is NOT unpersisted
  by :func:`materialize` itself (the plans are lazy; the caller/job owns
  the lifecycle) — so the oracle gate's leak invariant only permits it
  outside gate runs, which is exactly the cluster scenario it exists
  for.  Eager semantics are preserved with a ``count()`` job, mirroring
  ``localCheckpoint(eager)``.  A long-running SERVICE in persist mode
  (e.g. the Flight server answering many queries in one session) should
  wrap each query in :func:`materialize_scope`, which records every pin
  made under it and blocking-unpersists them on exit — the CacheManager
  returns to its pre-query state once the query's results are streamed
  out.  Scopes nest (inner pins release with the inner scope) and are
  thread-local (concurrent Flight sessions don't release each other's
  pins).  Under the other two strategies the scope is a no-op.
- ``checkpoint`` raises (from Spark) unless a checkpoint dir is set;
  iterative operators NEED lineage truncation at scale, so this — not
  ``persist`` — is the drop-in for the graph/recursive families on a
  cluster.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

STRATEGY_ENV = "SPARK_GRAFT_MATERIALIZE"
_VALID = ("local_checkpoint", "persist", "checkpoint")

_scope_state = threading.local()


def strategy() -> str:
    """Current materialization strategy (validated)."""
    s = os.environ.get(STRATEGY_ENV, "local_checkpoint")
    if s not in _VALID:
        raise ValueError(
            f"{STRATEGY_ENV}={s!r}: expected one of {_VALID}")
    return s


def _apply(df: DataFrame, eager: bool) -> DataFrame:
    s = strategy()
    if s == "local_checkpoint":
        return df.localCheckpoint(eager=eager)
    if s == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        stack = getattr(_scope_state, "stack", None)
        if stack:
            stack[-1].append(out)
        if eager:
            out.count()
        return out
    return df.checkpoint(eager=eager)


@contextmanager
def materialize_scope():
    """Release every persist-strategy pin made inside the ``with`` block
    on exit (blocking unpersist, so a follow-up CacheManager check is
    deterministic).  No-op under ``local_checkpoint``/``checkpoint``.

    The lifecycle hook for long-running services in ``persist`` mode::

        with materialize_scope():
            rows = REGISTRY[name].build(spark, sf_dir).collect()
        # CacheManager is back to its pre-query state here

    IMPORTANT: anything the scope pinned is only safe to use INSIDE the
    scope — a lazy DataFrame returned out of it recomputes from source
    (correct, just unpinned) once the scope closes."""
    stack = getattr(_scope_state, "stack", None)
    if stack is None:
        stack = _scope_state.stack = []
    pins: list[DataFrame] = []
    stack.append(pins)
    try:
        yield pins
    finally:
        stack.pop()
        for df in reversed(pins):
            try:
                df.unpersist(blocking=True)
            except Exception:       # session already stopped, etc.
                pass


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` under the configured strategy.

    Drop-in for ``df.localCheckpoint(eager=True)``; chainable as
    ``df.transform(materialize)``.
    """
    return _apply(df, eager=True)


def materialize_lazy(df: DataFrame) -> DataFrame:
    """Lazy variant (materializes on first use); drop-in for
    ``df.localCheckpoint(eager=False)``."""
    return _apply(df, eager=False)
