"""Structured Streaming pipelines over the ``events`` stream.

The reference has **no** streaming surface (SURVEY §2.10 — its only
streams are transport-level ``futures::Stream`` of Flight data,
iceberg-datafusion-arrow-flight/src/lib.rs:288-295); this package is the
north-star extension built on Spark's native streaming engine:

- :mod:`.jobs` — watermarked tumbling/sliding/session window
  aggregations, ``dropDuplicatesWithinWatermark``, and a custom stateful
  operator via ``transformWithStateInPandas``-style
  ``applyInPandasWithState``.

Every job is defined once over an unbounded DataFrame and verified in
tests by running it with ``trigger(availableNow=True)`` against the
fixture Parquet and comparing to the equivalent batch plan
(:mod:`..plans.events`) — the streaming/batch unification Spark
guarantees and the tests pin.
"""

from .jobs import (
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_aggregates,
    dedup_within_watermark,
    user_running_totals_stateful,
    run_to_memory_sink,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregates",
    "dedup_within_watermark",
    "user_running_totals_stateful",
    "run_to_memory_sink",
]

from .jobs import enriched_events, purchase_after_signup  # noqa: E402

__all__ += ["enriched_events", "purchase_after_signup"]

from .jobs import merged_countmin, stream_countmin_partials  # noqa: E402

__all__ += ["stream_countmin_partials", "merged_countmin"]
