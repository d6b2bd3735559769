"""Text-analysis plans over ``documents`` (implementations in
:mod:`..operators.text`).
North-star extension (SURVEY §7.1 step 7) — no counterpart in the
reference; operators live in operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table
from ..operators import text as T

_SW_EN = "['the','a','and','of','to','in','is','it','that','for']"
_SW_DE = "['der','die','das','und','ist','nicht','ein','mit','für','auf']"
_SW_FR = "['le','la','les','et','est','un','une','pour','dans','que']"

_HITS = (r"len(list_filter(string_split_regex(lower(text), '\s+'), "
         r"t -> list_contains({lst}, t)))")


@register(
    "text_token_counts",
    oracle=r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(regexp_extract_all(text, '\w{1,4}|[^\w\s]')) AS n_subwords,
       length(text) AS n_chars_measured,
       n_chars = length(text) AS n_chars_consistent
FROM documents
""",
    doc="Token counting: whitespace tokens + BPE-ish subword regex units; "
        "cross-checks the fixture's n_chars column. "
        "operators/text.py:token_count/subword_count.",
    tags=("text",),
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.subword_count(F.col("text")).alias("n_subwords"),
        F.length("text").alias("n_chars_measured"),
        (F.col("n_chars") == F.length("text")).alias("n_chars_consistent"))


@register(
    "text_language_id",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN en_h >= de_h AND en_h >= fr_h AND en_h > 0 THEN 'en'
            WHEN de_h >= fr_h AND de_h > 0 THEN 'de'
            WHEN fr_h > 0 THEN 'fr'
            ELSE 'und' END AS detected_lang
FROM (
  SELECT doc_id, lang,
         {_HITS.format(lst=_SW_EN)} AS en_h,
         {_HITS.format(lst=_SW_DE)} AS de_h,
         {_HITS.format(lst=_SW_FR)} AS fr_h
  FROM documents
) t
""",
    doc="Language-ID via stopword-hit argmax (en/de/fr + und). "
        "operators/text.py:detect_language.",
    tags=("text",),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.col("lang").alias("labeled_lang"),
                    T.detect_language(F.col("text")).alias("detected_lang"))


@register(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
       ROUND(0.3 * LEAST(length(text) / 400.0, 1.0)
           + 0.2 * (CASE WHEN length(text) * 1.0 / GREATEST(len(string_split_regex(trim(text), '\\s+')), 1)
                          BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)
           + 0.2 * (1.0 - LEAST(len(regexp_extract_all(text, '[^\\w\\s]'))
                                * 1.0 / GREATEST(length(text), 1) * 10, 1.0))
           + 0.1 * (1.0 - LEAST(len(regexp_extract_all(text, '\\d'))
                                * 1.0 / GREATEST(length(text), 1) * 10, 1.0))
           + 0.2 * LEAST({_HITS.format(lst=_SW_EN)}
                         * 1.0 / GREATEST(len(string_split_regex(trim(text), '\\s+')), 1) * 5, 1.0)
       , 6) AS quality
FROM documents
""",
    doc="Composite quality score: length, avg-token-length band, "
        "punctuation/digit density, stopword ratio. "
        "operators/text.py:quality_score. Bench headline.",
    tags=("text", "bench"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


@register(
    "text_fingerprints",
    oracle=r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fp_md5,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split_regex(trim(text), '\s+'),
             t -> CAST(concat('0x', substr(md5('s7|' || t), 1, 15)) AS BIGINT)
                  % 2147483647)),
         (acc, x) -> (acc * 1000003 + x) % 2147483647
       ) AS fp_rolling
FROM documents
""",
    doc="Document fingerprints: content md5 (normalized) + order-sensitive "
        "rolling token hash. operators/text.py:fingerprint_md5/_rolling.",
    tags=("text",),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id",
                    T.fingerprint_md5(F.col("text")).alias("fp_md5"),
                    T.fingerprint_rolling(F.col("text")).alias("fp_rolling"))
