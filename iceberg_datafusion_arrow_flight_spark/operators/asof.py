"""AS-OF join — point-in-time lookup, the time-series join Spark lacks.

DataFusion 40 lacks it too (SURVEY §2.3 marks it out of parity scope);
it is first-class here because training-data pipelines need it
constantly (join each sample to the latest-prior feature snapshot).

Implementation is the UNION + WINDOW form, not a range join:

    rows   = right(ts, key, payload…) ∪ left(ts, key)
    sorted = window PARTITION BY key ORDER BY ts, side
    carry  = last(payload, ignoreNulls) over unbounded-preceding..current
    result = rows where side = left

One shuffle on the key, one per-partition sort, zero join fan-out —
O(n log n) per key versus the O(n·m) worst case of a range join, and
immune to the hot-key explosion a range join suffers when one key holds
many rows on both sides.  This is the same plan a 100 TB backfill wants.

DuckDB's native ``ASOF JOIN`` is the test oracle (plans/events.py
``join_asof_events``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              strict: bool = False) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``) and the same key.

    Backward as-of, left-outer semantics: left rows with no prior right
    row keep nulls.  ``right_cols`` defaults to every non-key,
    non-timestamp column of ``right``; attached columns are prefixed
    ``asof_`` plus the right timestamp as ``asof_{right_ts}``."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]

    # side ordering breaks ts ties: right-before-left for <=, the
    # reverse for strict <, so equality resolves per the chosen bound
    l_tag, r_tag = (1, 0) if not strict else (0, 1)
    l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(l_tag).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
          for c in right_cols])
    r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__side"),
        F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols])
    unioned = l.unionByName(r)
    w = (Window.partitionBy("__k").orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        "__side", "__lrow",
        F.last("__rts", ignorenulls=True).over(w).alias(f"asof_{right_ts}"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in right_cols])
    out = carried.where(F.col("__side") == l_tag).drop("__side")
    return out.select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        f"asof_{right_ts}", *[f"asof_{c}" for c in right_cols])


def asof_join_forward(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str,
                      right_cols: list[str] | None = None,
                      tolerance_seconds: int | None = None) -> DataFrame:
    """FORWARD as-of: for each left row, attach the EARLIEST right row
    with ``right_ts >= left_ts`` and the same key, optionally only when
    it falls within ``tolerance_seconds`` (matches outside the bound
    null out — left-outer semantics, like pandas merge_asof's
    direction='forward' + tolerance).

    Same union + window plan as :func:`asof_join` with the order
    REVERSED (ts DESC; right-before-left at equal ts so the >= bound
    includes exact hits): one shuffle on the key, one per-partition
    sort, zero join fan-out — hot-key-immune.  Right rows must be
    unique per (key, right_ts) for deterministic payloads (true of any
    snapshot/rollup table)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    l_tag, r_tag = 1, 0   # right first at equal ts ⇒ inclusive >=
    l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(l_tag).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
          for c in right_cols])
    r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__side"),
        F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols])
    unioned = l.unionByName(r)
    w = (Window.partitionBy("__k")
         .orderBy(F.col("__ts").desc(), "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        "__side", "__lrow",
        F.last("__rts", ignorenulls=True).over(w).alias("__ats"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in right_cols])
    out = carried.where(F.col("__side") == l_tag).drop("__side")
    if tolerance_seconds is not None:
        lts = F.col("__lrow").getField(left_ts)
        lt_type = dict(left.dtypes)[left_ts]
        if lt_type in ("timestamp", "timestamp_ntz", "date"):
            # interval arithmetic, not an epoch cast: TIMESTAMP_NTZ
            # (what a plain driver session reads from parquet) cannot
            # cast to long
            bound = lts + F.expr(f"INTERVAL {int(tolerance_seconds)} "
                                 f"SECONDS")
        else:  # numeric / epoch-second columns: plain addition
            bound = lts + F.lit(int(tolerance_seconds))
        ok = F.col("__ats") <= bound
        out = out.select(
            "__lrow",
            F.when(ok, F.col("__ats")).alias(f"asof_{right_ts}"),
            *[F.when(ok, F.col(f"asof_{c}")).alias(f"asof_{c}")
              for c in right_cols])
    else:
        out = out.withColumnRenamed("__ats", f"asof_{right_ts}")
    return out.select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        f"asof_{right_ts}", *[f"asof_{c}" for c in right_cols])
