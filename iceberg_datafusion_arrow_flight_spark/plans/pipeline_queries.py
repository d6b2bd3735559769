"""Training-data pipeline plans (implementations in
:mod:`..operators.pipeline`): reproducible splits, C4-style quality
filtering, per-shard sequence packing — each DuckDB-oracled.

North-star extension (SURVEY §7.1 step 7) — no counterpart in the
reference; operators live in operators/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table
from ..operators import pipeline as P

# Shared oracle fragments (must mirror operators/text.py exactly —
# the same spellings the text_* oracles already pin).
_N_TOKENS = r"len(string_split_regex(trim(text), '\s+'))"
_QUALITY = rf"""
ROUND(0.3 * LEAST(length(text) / 400.0, 1.0)
    + 0.2 * (CASE WHEN length(text) * 1.0 / GREATEST({_N_TOKENS}, 1)
                   BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
    + 0.2 * (1.0 - LEAST(len(regexp_extract_all(text, '[^\w\s]'))
                         * 1.0 / GREATEST(length(text), 1) * 10, 1.0))
    + 0.1 * (1.0 - LEAST(len(regexp_extract_all(text, '\d'))
                         * 1.0 / GREATEST(length(text), 1) * 10, 1.0))
    + 0.2 * LEAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                    t -> list_contains(['the','a','and','of','to','in','is',
                                        'it','that','for'], t)))
                  * 1.0 / GREATEST({_N_TOKENS}, 1) * 5, 1.0)
, 6)"""


@register(
    "pipeline_train_test_split",
    oracle="""
SELECT CASE WHEN (doc_id * 2654435761 % 4294967296) % 10000 < 1000
            THEN 'test' ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
ORDER BY 1
""",
    doc="Reproducible train/test split: multiplicative-hash bucket of "
        "the id — a pure projection (zero shuffle), identical assignment "
        "on any engine/cluster/run, so no train-test leakage across "
        "re-runs. operators/pipeline.py:train_test_split.",
    tags=("pipeline", "split"),
)
def pipeline_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (P.train_test_split(docs, test_frac=0.1)
            .groupBy("split")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"))
            .orderBy("split"))


@register(
    "pipeline_quality_filter",
    oracle=f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM({_N_TOKENS}) AS BIGINT) AS kept_tokens
FROM documents
WHERE n_chars BETWEEN 100 AND 10000
  AND {_N_TOKENS} >= 10
  AND {_QUALITY} >= 0.5
GROUP BY lang
ORDER BY lang
""",
    doc="C4-style cleanup chain: char-length band (pushed to the scan), "
        "token minimum, composite quality threshold — survivors counted "
        "per lang. operators/pipeline.py:quality_filter.",
    tags=("pipeline", "text"),
)
def pipeline_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    kept = P.quality_filter(docs)
    from ..operators import text as T
    return (kept.groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_kept"),
                 F.sum(T.token_count(F.col("text"))).cast("bigint")
                  .alias("kept_tokens"))
            .orderBy("lang"))


@register(
    "pipeline_sequence_packing",
    oracle=f"""
WITH toks AS (
  SELECT lang, doc_id, {_N_TOKENS} AS n_tokens,
         SUM({_N_TOKENS}) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM documents
), binned AS (
  SELECT lang, doc_id, n_tokens,
         CAST(FLOOR((cum_tokens - n_tokens) / 512) AS BIGINT) AS bin_id
  FROM toks
)
SELECT lang, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM binned
GROUP BY lang, bin_id
ORDER BY lang, bin_id
""",
    doc="Sequence packing for training batches: per-language shards, "
        "window cumsum of token counts, bin = floor(offset/512).  No "
        "global window — shards pack independently, which is what keeps "
        "the window state bounded at 100 TB. "
        "operators/pipeline.py:pack_sequences.",
    tags=("pipeline", "window"),
)
def pipeline_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    packed = P.pack_sequences(docs, token_budget=512)
    return (packed.groupBy("lang", "bin_id")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("bin_tokens"))
            .orderBy("lang", "bin_id"))
