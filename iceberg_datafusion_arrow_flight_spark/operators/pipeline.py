"""Training-data pipeline operators: deterministic splits, quality
filtering, sequence packing.

North-star extensions (SURVEY §7.1 step 7) — the operations a large-scale
LLM training-data pipeline runs after dedup/similarity/text-analysis:
carve reproducible train/test splits, apply a C4-style cleanup chain,
and pack documents into fixed token budgets for efficient batching.

All three are pure Catalyst expressions/windows — no Python, no driver
materialization:

- **split**: a projection (zero shuffle, zero state) using a
  multiplicative integer hash both engines compute identically, so the
  assignment is stable across runs, engines, and cluster sizes.
- **quality filter**: filter + aggregate; predicates push to the scan.
- **packing**: one window cumsum per language shard — partitioned by
  ``lang`` so no single-partition global window exists at scale (the
  100 TB failure mode of naive packing); bins are keyed (lang, bin_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import text as T

# Knuth multiplicative hash: identical plain-integer arithmetic on any
# engine (no library hash), uniform enough for split assignment.
_KNUTH = 2654435761
_MOD = 1 << 32


def split_bucket(id_col: Column, n_buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer id."""
    return (id_col * _KNUTH % _MOD) % n_buckets


def train_test_split(df: DataFrame, id_col: str = "doc_id",
                     test_frac: float = 0.1) -> DataFrame:
    """Adds a ``split`` column ('train' | 'test').  Reproducible: the
    assignment is a pure function of the id, so re-runs, engine swaps,
    and repartitions never move a document across the split boundary
    (the leakage-prevention contract a training pipeline needs)."""
    cut = int(test_frac * 10_000)
    return df.withColumn(
        "split",
        F.when(split_bucket(F.col(id_col)) < cut, "test")
         .otherwise("train"))


def quality_filter(df: DataFrame, text_col: str = "text",
                   chars_col: str | None = "n_chars",
                   min_chars: int = 100, max_chars: int = 10_000,
                   min_tokens: int = 10,
                   min_quality: float = 0.5) -> DataFrame:
    """C4-style cleanup chain: length band, minimum token count, minimum
    composite quality score.

    The length band prefers a materialized char-count COLUMN
    (``chars_col``) over ``length(text)``: a plain column comparison
    reaches the parquet scan as a pushed filter + row-group stats skip
    (``length(text)`` never pushes), so at 100 TB the band prunes IO,
    not just rows.  Falls back to computing the length when the column
    is absent.  The expression predicates (tokens, score) run only on
    band survivors."""
    text = F.col(text_col)
    if chars_col and chars_col in df.columns:
        n = F.col(chars_col)
    else:
        n = F.length(text)
    return (df
            .where((n >= min_chars) & (n <= max_chars))
            .where(T.token_count(text) >= min_tokens)
            .where(T.quality_score(text) >= min_quality))


def pack_sequences(df: DataFrame, token_budget: int = 512,
                   shard_col: str = "lang",
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Contiguous sequence packing: within each shard (ordered by id),
    a document joins the bin its running token offset falls in —
    ``bin_id = floor(offset_before / budget)``.  One window cumsum per
    shard; deterministic; no global window (shards pack independently,
    which is also what keeps state bounded at 100 TB)."""
    toks = T.token_count(F.col(text_col))
    w = (Window.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(toks).over(w)
    return (df.select(F.col(shard_col), F.col(id_col),
                      toks.alias("n_tokens"), cum.alias("cum_tokens"))
            .withColumn("bin_id",
                        ((F.col("cum_tokens") - F.col("n_tokens"))
                         / token_budget).cast("bigint")))
