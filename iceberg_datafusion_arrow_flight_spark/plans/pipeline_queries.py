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
from ..operators.materialize import materialize

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


# n-gram oracle fragment: scalar range() + list_transform mirror of
# operators/text.py:token_ngrams (DuckDB list slice t[i:j] is inclusive).
def _DUCK_GRAMS(n: int) -> str:
    return (f"CASE WHEN len(t) >= {n} THEN "
            f"list_transform(range(1, len(t) - {n - 2}), "
            f"i -> array_to_string(t[i:i+{n - 1}], ' ')) "
            "ELSE [] END")


@register(
    "pipeline_decontaminate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
), grams AS (
  SELECT doc_id, source, unnest({_DUCK_GRAMS(3)}) AS g FROM tok
), bg AS (
  SELECT DISTINCT g FROM grams WHERE source = 'src0'
), cg AS (
  SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0'
), hit AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN g IN (SELECT g FROM bg) THEN 1 ELSE 0 END) AS n_hit
  FROM cg GROUP BY doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_hit AS BIGINT) AS n_hit,
       ROUND(n_hit * 1.0 / n_grams, 4) AS contamination
FROM hit WHERE n_hit > 0 ORDER BY doc_id
""",
    doc="Benchmark decontamination: distinct-3-gram overlap of every "
        "corpus doc (sources != src0) against the benchmark set (source "
        "= src0).  The benchmark gram set broadcasts — the corpus is "
        "never self-joined, so the plan survives a 100 TB corpus with "
        "one aggregate exchange. operators/pipeline.py:decontaminate.",
    tags=("pipeline", "dedup", "text"),
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("source") != "src0")
    bench = docs.where(F.col("source") == "src0")
    return (P.decontaminate(corpus, bench, n=3)
            .orderBy("doc_id"))


@register(
    "pipeline_repetition_filter",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest({_DUCK_GRAMS(2)}) AS g FROM tok
), counts AS (
  SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
), ranked AS (
  SELECT doc_id, g, c,
         SUM(c) OVER (PARTITION BY doc_id) AS n_grams,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, g) AS rn
  FROM counts
)
SELECT doc_id, g AS top_gram, CAST(c AS BIGINT) AS top_count,
       CAST(n_grams AS BIGINT) AS n_grams,
       ROUND(c * 1.0 / n_grams, 4) AS top_frac
FROM ranked WHERE rn = 1 ORDER BY doc_id
""",
    doc="Gopher-style repetition signal: per-doc share of all 2-grams "
        "taken by the most frequent one (ties to the smallest gram).  "
        "Exchanges are keyed by (doc, gram) then doc — per-doc state "
        "only. operators/pipeline.py:top_ngram_repetition.",
    tags=("pipeline", "text", "window"),
)
def pipeline_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return P.top_ngram_repetition(docs, n=2).orderBy("doc_id")


@register(
    "pipeline_balanced_sample",
    oracle="""
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY doc_id * 2654435761 % 4294967296,
                                     doc_id) AS rn
  FROM documents
), target AS (
  SELECT MIN(c) AS t
  FROM (SELECT COUNT(*) AS c FROM documents GROUP BY lang)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS ids_checksum
FROM ranked WHERE rn <= (SELECT t FROM target)
GROUP BY lang ORDER BY lang
""",
    doc="Language-balanced downsample: every lang keeps exactly "
        "min-lang-count docs, ranked by the Knuth hash of the id — "
        "deterministic across engines/runs (rand() sampling is not).  "
        "The checksum pins WHICH docs were kept, not just how many. "
        "operators/pipeline.py:balanced_sample.",
    tags=("pipeline", "sample", "window"),
)
def pipeline_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (P.balanced_sample(docs, "lang", "doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                 F.sum("doc_id").cast("bigint").alias("ids_checksum"))
            .orderBy("lang"))


# Deterministic synthetic-PII derivation shared by query and oracle:
# fixture text is PII-free word soup, so the query plants category
# markers as a pure function of doc_id, then detects/redacts them.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"555-[0-9]{4}"
_PII_IP = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@register(
    "pipeline_pii_redact",
    oracle=f"""
WITH synth AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0
               THEN 'contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com ' ELSE '' END)
         || (CASE WHEN doc_id % 4 = 0
                  THEN 'call 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' ' ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0
                  THEN 'host 10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.0.1 ' ELSE '' END)
         || text AS s
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(s, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(s, '{_PII_IP}')) AS BIGINT) AS n_ip,
       md5(regexp_replace(regexp_replace(regexp_replace(s,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IP}', '<IP>', 'g')) AS red_md5
FROM synth ORDER BY doc_id
""",
    doc="PII detect + redact: plants synthetic emails/phones/IPs as a "
        "pure function of doc_id (fixture text is PII-free), counts "
        "matches per category (regexp_count) and md5-pins the fully "
        "redacted text.  Zero shuffle — a scan-projection that runs at "
        "any scale; patterns restricted to the Java-regex ∩ RE2 common "
        "dialect. operators/pipeline.py:redact_pii.",
    tags=("pipeline", "text", "regex"),
)
def pipeline_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = F.concat(
        F.when(did % 3 == 0,
               F.concat(F.lit("contact user"), did.cast("string"),
                        F.lit("@example.com "))).otherwise(""),
        F.when(did % 4 == 0,
               F.concat(F.lit("call 555-"),
                        F.lpad((did % 10000).cast("string"), 4, "0"),
                        F.lit(" "))).otherwise(""),
        F.when(did % 5 == 0,
               F.concat(F.lit("host 10."), (did % 256).cast("string"),
                        F.lit(".0.1 "))).otherwise(""),
        F.col("text"))
    counts = P.pii_counts(s)
    return (docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ip"].alias("n_ip"),
        F.md5(P.redact_pii(s).cast("binary")).alias("red_md5"))
        .orderBy("doc_id"))


@register(
    "pipeline_end_to_end",
    oracle=f"""
WITH deduped AS (
  SELECT * FROM (
    SELECT d.*, MIN(doc_id) OVER (
        PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
                      '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g')))) AS __rep
    FROM documents d)
  WHERE doc_id = __rep
), tok AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
), grams AS (
  SELECT doc_id, source, unnest({_DUCK_GRAMS(3)}) AS g FROM tok
), bg AS (
  SELECT DISTINCT g FROM grams WHERE source = 'src0'
), contaminated AS (
  SELECT doc_id
  FROM (SELECT doc_id, COUNT(*) AS n_grams,
               SUM(CASE WHEN g IN (SELECT g FROM bg) THEN 1 ELSE 0 END)
               AS n_hit
        FROM (SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0')
        GROUP BY doc_id)
  WHERE n_hit * 1.0 / n_grams > 0.15
), kept AS (
  SELECT * FROM deduped
  WHERE source <> 'src0'
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND n_chars BETWEEN 100 AND 10000
    AND {_N_TOKENS} >= 10
    AND {_QUALITY} >= 0.5
)
SELECT lang,
       CASE WHEN (doc_id * 2654435761 % 4294967296) % 10000 < 1000
            THEN 'test' ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({_N_TOKENS}) AS BIGINT) AS total_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS ids_checksum
FROM kept
GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc="The COMPOSED training-data pipeline, one declarative plan: "
        "exact dedup (keep min-id per normalized-text fingerprint) -> "
        "benchmark-decontamination gate (drop corpus docs with >15% "
        "distinct-3-gram overlap vs the src0 benchmark) -> C4-style "
        "quality filter -> reproducible hash split -> per-(lang, split) "
        "counts, token totals, and an id checksum pinning exactly which "
        "documents survived.  Every stage is the already-oracled "
        "operator composed unchanged; Catalyst fuses the chain (the "
        "filters run in one pass over dedup survivors, the benchmark "
        "gram set broadcasts, the only wide exchanges are the dedup "
        "fingerprint window, the contamination aggregate, and the final "
        "group) — the plan a 100 TB curation run would actually ship. "
        "operators/{{dedup,pipeline}}.py.",
    tags=("pipeline", "dedup", "text", "split"),
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from ..operators import text as T
    from ..operators.dedup import normalize_text

    docs = table(spark, sf_dir, "documents")
    fp = F.md5(normalize_text(F.col("text")).cast("binary"))
    deduped = (docs.withColumn(
        "__rep", F.min("doc_id").over(Window.partitionBy(fp)))
        .where(F.col("doc_id") == F.col("__rep")).drop("__rep"))
    corpus_all = docs.where(F.col("source") != "src0")
    bench = docs.where(F.col("source") == "src0")
    contaminated = (P.decontaminate(corpus_all, bench, n=3)
                    .where(F.col("contamination") > 0.15)
                    .select("doc_id"))
    kept = (deduped.where(F.col("source") != "src0")
            .join(contaminated, "doc_id", "left_anti"))
    kept = P.quality_filter(kept)
    split = P.train_test_split(kept)
    return (split.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(T.token_count(F.col("text"))).cast("bigint")
                  .alias("total_tokens"),
                 F.sum("doc_id").cast("bigint").alias("ids_checksum"))
            .orderBy("lang", "split"))


@register(
    "pipeline_domain_mixture",
    oracle="""
WITH per AS (
  SELECT source, lang, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
  FROM documents GROUP BY source, lang
), tot AS (SELECT COUNT(*) AS n FROM documents)
SELECT source, lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(n_docs * 1.0 / n, 6) AS actual_share,
       -- uniform target over the observed (source, lang) cells
       ROUND(1.0 / (SELECT COUNT(*) FROM per), 6) AS target_share,
       ROUND((1.0 / (SELECT COUNT(*) FROM per)) / (n_docs * 1.0 / n), 4)
         AS sample_weight,
       CAST(n_chars AS BIGINT) AS n_chars
FROM per CROSS JOIN tot
ORDER BY source, lang
""",
    doc="Domain-mixture reweighting (the data-mixing step before "
        "training): per (source, lang) cell — count, actual corpus "
        "share, uniform target share, and the sampling weight "
        "(target/actual) a weighted sampler applies to hit the target "
        "mixture.  One partial-agg shuffle builds the cell table; the "
        "totals are single-row broadcasts.  Swap the uniform target for "
        "a tuned mixture (DoReMi-style) without changing the plan.",
    tags=("pipeline", "sample"),
)
def pipeline_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per = (docs.groupBy("source", "lang")
           .agg(F.count(F.lit(1)).alias("__n"),
                F.sum("n_chars").alias("__chars")))
    tot = docs.agg(F.count(F.lit(1)).alias("__total"))
    cells = per.agg(F.count(F.lit(1)).alias("__cells"))
    actual = F.col("__n") / F.col("__total")
    target = F.lit(1.0) / F.col("__cells")
    return (per.join(F.broadcast(tot)).join(F.broadcast(cells))
            .select("source", "lang",
                    F.col("__n").cast("bigint").alias("n_docs"),
                    F.round(actual, 6).alias("actual_share"),
                    F.round(target, 6).alias("target_share"),
                    F.round(target / actual, 4).alias("sample_weight"),
                    F.col("__chars").cast("bigint").alias("n_chars"))
            .orderBy("source", "lang"))


@register(
    "pipeline_profile_columns",
    oracle="""
SELECT 'doc_id' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(MIN(doc_id) AS VARCHAR) AS min_value,
       CAST(MAX(doc_id) AS VARCHAR) AS max_value
FROM documents
UNION ALL
SELECT 'lang', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT lang) AS BIGINT),
       CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
FROM documents
UNION ALL
SELECT 'source', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT source) AS BIGINT),
       CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
FROM documents
UNION ALL
SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(DISTINCT n_chars) AS BIGINT),
       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
FROM documents
""",
    doc="One-pass column profiler (deequ/TFDV analyzer shape): "
        "null/distinct counts + min/max per column in a single aggregate "
        "job (Expand for multi-column exact distincts; HLL variant for "
        "the 100 TB path). operators/pipeline.py:profile_columns.",
    tags=("pipeline",),
)
def pipeline_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.profile_columns(table(spark, sf_dir, "documents"),
                             ["doc_id", "lang", "source", "n_chars"])


@register(
    "pipeline_check_constraints",
    oracle="""
SELECT 'doc_id_not_null' AS check, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN NOT (doc_id IS NOT NULL) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       SUM(CASE WHEN NOT (doc_id IS NOT NULL) THEN 1 ELSE 0 END) = 0 AS passed
FROM documents
UNION ALL
SELECT 'lang_in_domain', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN NOT (lang IN ('en','de','fr','es','zh'))
                THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (lang IN ('en','de','fr','es','zh'))
           THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'n_chars_positive', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN NOT (n_chars > 0) THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (n_chars > 0) THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'n_chars_matches_text', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN NOT (length(text) = n_chars) THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (length(text) = n_chars) THEN 1 ELSE 0 END) = 0
FROM documents
""",
    doc="Declarative data-quality gate: named row-level boolean checks "
        "evaluated in ONE aggregate pass (violation count + pass flag "
        "per check; NULL outcomes count as passes — SQL CHECK "
        "semantics, identical on both engines). "
        "operators/pipeline.py:check_constraints.",
    tags=("pipeline",),
)
def pipeline_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return P.check_constraints(docs, [
        ("doc_id_not_null", F.col("doc_id").isNotNull()),
        ("lang_in_domain", F.col("lang").isin("en", "de", "fr", "es", "zh")),
        ("n_chars_positive", F.col("n_chars") > 0),
        ("n_chars_matches_text", F.length("text") == F.col("n_chars")),
    ])


@register(
    "pipeline_weighted_sample",
    oracle="""
WITH w AS (
  SELECT doc_id, lang,
         CASE WHEN lang = 'en' THEN 4 WHEN lang = 'de' THEN 2
              ELSE 1 END AS weight
  FROM documents
), keyed AS (
  SELECT doc_id, lang, weight,
         MAX(CAST(('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)
                                   || '|' || CAST(j AS VARCHAR)), 1, 15))
                  ::UBIGINT AS BIGINT)) AS key
  FROM w, range(0, 16) r(j)
  WHERE j < weight
  GROUP BY doc_id, lang, weight
)
SELECT doc_id, lang, CAST(weight AS INT) AS weight
FROM keyed ORDER BY key DESC, doc_id LIMIT 100
""",
    doc="Deterministic weighted sampling (integer-weighted A-Res / "
        "Efraimidis–Spirakis): key = max of `weight` md5-derived hash "
        "slots — the u^(1/w) order statistic with zero transcendentals, "
        "so both engines select the IDENTICAL 100 docs (en weighted 4x, "
        "de 2x).  Selection plans as a global top-k, not a full sort. "
        "operators/pipeline.py:weighted_sample.",
    tags=("pipeline", "sampling"),
)
def pipeline_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", "lang",
        F.when(F.col("lang") == "en", 4)
         .when(F.col("lang") == "de", 2)
         .otherwise(1).cast("int").alias("weight"))
    return P.weighted_sample(w, "doc_id", "weight", k=100)


@register(
    "diag_key_skew_profile",
    oracle="""
WITH counts AS (
  SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(MAX(c) AS BIGINT) AS max_key_rows,
       CAST(quantile_cont(c, 0.5) AS DOUBLE) AS p50_key_rows,
       CAST(quantile_cont(c, 0.99) AS DOUBLE) AS p99_key_rows,
       CAST(arg_max(k, c) AS VARCHAR) AS heaviest_key,
       ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_key_row_share
FROM counts
""",
    doc="Key-skew diagnostic over orders.o_custkey: the frequency-"
        "distribution stats (max/p50/p99 per-key rows, heaviest key, "
        "top-key row share) that decide salting or AQE skew thresholds "
        "BEFORE a large shuffle. operators/skew.py:key_skew_profile.",
    tags=("pipeline", "diagnostic"),
)
def diag_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_profile
    return key_skew_profile(table(spark, sf_dir, "orders"), "o_custkey")


@register(
    "pipeline_chunk_documents",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
), pos AS (
  -- chunk starts derived FROM the data (lateral generate_series), not a
  -- static bound: fixtures regenerate between rounds and a doc longer
  -- than a hard-coded cap would silently lose chunks on this side only.
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, 24)) AS i
  FROM toks WHERE len(t) >= 1
)
SELECT doc_id,
       CAST(i // 24 AS INT) AS chunk_idx,
       CAST(LEAST(32, len(t) - i) AS INT) AS n_tokens,
       array_to_string(t[i+1:i+32], ' ') AS chunk_text
FROM pos
""",
    doc="Context-window chunking: 32-token windows at stride 24 (8-token "
        "overlap) — the pretraining/RAG ingestion split.  Zero-shuffle "
        "projection+explode; chunks reassemble inside codegen.  The "
        "oracle recomputes identical windows from a data-derived strided "
        "series. operators/pipeline.py:chunk_documents.",
    tags=("pipeline",),
)
def pipeline_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.chunk_documents(table(spark, sf_dir, "documents"),
                             chunk_tokens=32, stride=24)


@register(
    "pipeline_gopher_rules",
    oracle=r"""
WITH t AS (
  SELECT lang, string_split_regex(trim(text), '\s+') AS toks FROM documents
), m AS (
  SELECT lang,
         len(toks) AS n_words,
         list_aggregate(list_transform(toks, x -> CAST(len(x) AS DOUBLE)),
                        'sum') / len(toks) AS mwl,
         len(list_filter(toks, x -> x IN ('the', 'a'))) AS stop_hits
  FROM t
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN NOT (n_words BETWEEN 25 AND 90)
                THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
  CAST(SUM(CASE WHEN NOT (mwl BETWEEN 4.3 AND 4.8)
                THEN 1 ELSE 0 END) AS BIGINT) AS fail_mwl,
  CAST(SUM(CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
  CAST(SUM(CASE WHEN n_words BETWEEN 25 AND 90
                 AND mwl BETWEEN 4.3 AND 4.8
                 AND stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM m GROUP BY lang ORDER BY lang
""",
    doc="Gopher rule filter (Rae et al. 2021 table A1, whitespace-token "
        "adaptation): word-count band, mean-word-length band, stop-word "
        "minimum — per-language per-rule failure counts plus the "
        "all-rules survivor count.  Pure projection + one aggregate; the "
        "mean-word-length fold is exact in double on both engines so the "
        "band compares need no rounding. "
        "operators/pipeline.py:gopher_rules.",
    tags=("pipeline", "text"),
)
def pipeline_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = P.gopher_rules(table(spark, sf_dir, "documents"))
    return (docs.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.count_if(~F.col("ok_words")).cast("bigint")
                  .alias("fail_words"),
                 F.count_if(~F.col("ok_mwl")).cast("bigint")
                  .alias("fail_mwl"),
                 F.count_if(~F.col("ok_stop")).cast("bigint")
                  .alias("fail_stop"),
                 F.count_if(F.col("kept")).cast("bigint").alias("n_kept"))
            .orderBy("lang"))


@register(
    "pipeline_boilerplate_coverage",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
), grams AS (
  SELECT doc_id, lang, unnest({_DUCK_GRAMS(8)}) AS g FROM tok
), freq AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2
), per_doc AS (
  SELECT doc_id, lang, COUNT(*) AS n_grams,
         SUM(CASE WHEN g IN (SELECT g FROM freq) THEN 1 ELSE 0 END)
           AS n_boiler
  FROM grams GROUP BY doc_id, lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ROUND(n_boiler * 1.0 / n_grams, 4) >= 0.2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       ROUND(SUM(n_boiler) * 1.0 / SUM(n_grams), 4) AS corpus_frac
FROM per_doc GROUP BY lang ORDER BY lang
""",
    doc="C4-style boilerplate mining on token spans: 8-gram spans with "
        "corpus frequency >= 2 are boilerplate; documents are scored by "
        "the boilerplate share of their span instances, then rolled up "
        "per language (docs, flagged >= 0.2, corpus-level share).  The "
        "frequent-span set is mined with one partial-combined aggregate "
        "and broadcast back — no gram self-join.  corpus_frac uses the "
        "integer-sum ratio (exact) rather than avg-of-doubles so the "
        "hash is engine-stable. operators/pipeline.py:boilerplate_spans.",
    tags=("pipeline", "dedup", "text"),
)
def pipeline_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = P.boilerplate_spans(table(spark, sf_dir, "documents"),
                                  n=8, min_freq=2, carry=("lang",))
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.count_if(F.col("boiler_frac") >= 0.2).cast("bigint")
                  .alias("n_flagged"),
                 F.round(F.sum("n_boiler") / F.sum("n_grams"), 4)
                  .alias("corpus_frac"))
            .orderBy("lang"))


@register(
    "pipeline_drift_psi",
    oracle=r"""
WITH binned AS (
  SELECT LEAST(CAST(n_chars // 50 AS BIGINT), 11) AS bin,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_ref,
         CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_cur
  FROM documents GROUP BY 1
), dist AS (
  SELECT bin, n_ref, n_cur,
         (n_ref + 0.5) / (SUM(n_ref) OVER () + 6.0) AS p,
         (n_cur + 0.5) / (SUM(n_cur) OVER () + 6.0) AS q
  FROM binned
)
SELECT bin, n_ref, n_cur,
       ROUND(p, 6) AS p, ROUND(q, 6) AS q,
       ROUND((p - q) * ln(p / q), 6) AS psi_term
FROM dist ORDER BY bin
""",
    doc="Population-stability-index drift monitor: the length "
        "distribution of the reference slice (source = src0) vs the "
        "rest of the corpus, over fixed 50-char bins with +0.5 Laplace "
        "smoothing (12 virtual bins) so empty bins never divide by "
        "zero.  Per-bin PSI terms sum to the drift score a pipeline "
        "alerts on between crawl snapshots.  One aggregate pass + "
        "window totals — no per-slice rescan; both engines compute the "
        "identical smoothed doubles so ln() terms hash-match at 6 "
        "decimals.",
    tags=("pipeline", "text", "monitoring"),
)
def pipeline_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    docs = table(spark, sf_dir, "documents")
    binned = (docs.groupBy(
        F.least((F.col("n_chars") / 50).cast("bigint"), F.lit(11))
         .alias("bin"))
        .agg(F.count_if(F.col("source") == "src0").cast("bigint")
              .alias("n_ref"),
             F.count_if(F.col("source") != "src0").cast("bigint")
              .alias("n_cur")))
    w = Window.partitionBy()
    p = (F.col("n_ref") + 0.5) / (F.sum("n_ref").over(w) + 6.0)
    q = (F.col("n_cur") + 0.5) / (F.sum("n_cur").over(w) + 6.0)
    return (binned
            .withColumn("p", p).withColumn("q", q)
            .select("bin", "n_ref", "n_cur",
                    F.round("p", 6).alias("p"),
                    F.round("q", 6).alias("q"),
                    F.round((F.col("p") - F.col("q"))
                            * F.log(F.col("p") / F.col("q")), 6)
                     .alias("psi_term"))
            .orderBy("bin"))


@register(
    "pipeline_seeded_shuffle_shards",
    oracle="""
WITH keyed AS (
  SELECT doc_id, md5(concat('epoch-7:', CAST(doc_id AS VARCHAR))) AS h
  FROM documents
), sharded AS (
  SELECT doc_id, h,
         CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS BIGINT)
           AS shard
  FROM keyed
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos_in_shard
FROM sharded
""",
    doc="Seeded REPRODUCIBLE global shuffle + sharding — the ordering "
        "primitive training runs need: every worker, every rerun, any "
        "cluster size derives the identical (shard, position) for each "
        "document from md5(seed, doc_id) alone.  Shard = first hex "
        "nibble (16 shards); position = hash order within the shard.  Scale "
        "shape: a pure projection plus ONE window partitioned by shard "
        "— no global sort, no single-partition rank; changing the seed "
        "string reshuffles every epoch deterministically.",
    tags=("pipeline",),
)
def pipeline_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    docs = table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch-7:"),
                       F.col("doc_id").cast("string"))).alias("h"))
    sharded = keyed.withColumn(
        "shard", (F.instr(F.lit("0123456789abcdef"),
                          F.substring("h", 1, 1)) - 1).cast("bigint"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return sharded.select(
        "doc_id", "shard",
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"))


# BPE-ish subword count — mirrors operators/text.py:subword_count
# (word fragments of <=4 chars + punctuation marks).
_N_SUBWORDS = r"len(regexp_extract_all(text, '\w{1,4}|[^\w\s]'))"


@register(
    "pipeline_pack_boundary_loss",
    oracle=f"""
WITH toks AS (
  SELECT lang, doc_id, {_N_SUBWORDS} AS n_tokens,
         SUM({_N_SUBWORDS}) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
), spans AS (
  SELECT lang, n_tokens, cum - n_tokens AS start,
         CAST(FLOOR((cum - n_tokens) / 512) AS BIGINT) AS start_bin,
         CAST(FLOOR((cum - n_tokens + GREATEST(n_tokens, 1) - 1) / 512)
              AS BIGINT) AS end_bin
  FROM toks
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT)                        AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT)                   AS total_tokens,
       CAST(MAX(end_bin) + 1 AS BIGINT)                AS n_sequences,
       CAST(SUM(CASE WHEN end_bin > start_bin THEN 1 ELSE 0 END)
            AS BIGINT)                                 AS n_crossings,
       CAST(SUM(CASE WHEN end_bin > start_bin
                     THEN start + n_tokens - (start_bin + 1) * 512
                     ELSE 0 END) AS BIGINT)            AS boundary_loss,
       ROUND(SUM(CASE WHEN end_bin > start_bin
                      THEN start + n_tokens - (start_bin + 1) * 512
                      ELSE 0 END) * 100.0
             / GREATEST(SUM(n_tokens), 1), 6)          AS loss_pct
FROM spans
GROUP BY lang
ORDER BY lang
""",
    doc="Tokenizer-aware sequence packing with boundary-loss accounting "
        "(VERDICT r5 ask #4): packs in BPE-ish subword units "
        "(text.subword_count — the unit a real tokenizer bills in, not "
        "whitespace words), places every doc's span in the fixed "
        "512-token sequence grid, and accounts the boundary policy's "
        "cost per shard — crossings (docs straddling a sequence edge) "
        "and boundary_loss (tokens past the first edge: what "
        "truncate-at-boundary drops, or split-at-boundary severs from "
        "their context).  One window cumsum per shard, pure projections "
        "after; shards audit independently (bounded window state at "
        "100 TB).  operators/pipeline.py:pack_boundary_accounting.",
    tags=("pipeline", "window"),
)
def pipeline_pack_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    audited = P.pack_boundary_accounting(docs, token_budget=512)
    return (audited.groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 (F.max("end_bin") + 1).cast("bigint").alias("n_sequences"),
                 F.sum(F.col("crosses").cast("int")).cast("bigint")
                  .alias("n_crossings"),
                 F.sum("boundary_loss").cast("bigint")
                  .alias("boundary_loss"),
                 F.round(F.sum("boundary_loss") * 100.0
                         / F.greatest(F.sum("n_tokens"), F.lit(1)), 6)
                  .alias("loss_pct"))
            .orderBy("lang"))


@register(
    "pipeline_url_domain_filter",
    oracle="""
WITH urls AS (
  SELECT source,
         'https://www.' || source || '.example.com/' || lang || '/doc-'
           || CAST(doc_id AS VARCHAR) || '?utm_source=crawl&session=42'
           AS url
  FROM documents
), parsed AS (
  SELECT source,
         regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
                        '^www\\.', '') AS domain,
         lower(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1)) AS path
  FROM urls
), flagged AS (
  SELECT source,
         list_contains(['src3.example.com', 'src7.example.com'], domain)
           AS blocked_domain,
         (path LIKE '%/es/%' OR path LIKE '%forbidden%') AS blocked_path
  FROM parsed
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)                                  AS n_docs,
       CAST(SUM(CASE WHEN blocked_domain THEN 1 ELSE 0 END) AS BIGINT)
                                                                 AS n_blocked_domain,
       CAST(SUM(CASE WHEN blocked_path AND NOT blocked_domain
                     THEN 1 ELSE 0 END) AS BIGINT)               AS n_blocked_path,
       CAST(SUM(CASE WHEN NOT blocked_domain AND NOT blocked_path
                     THEN 1 ELSE 0 END) AS BIGINT)               AS n_kept
FROM flagged
GROUP BY source
ORDER BY source
""",
    doc="URL/domain-level C4 filtering (VERDICT r5 ask #4): derive the "
        "crawl provenance URL (fixture has no URL column; shape mirrors "
        "a crawl record incl. a tracking query string), parse host+path "
        "with JVM parse_url, canonicalize the host (lowercase, strip "
        "www.), then drop (a) blocklisted registered domains and (b) "
        "URLs whose path hits a banned-term list — C4's URL-level "
        "page-removal rule.  Per-source kept/blocked accounting.  Pure "
        "projection end-to-end (blocklists are plan literals here; a "
        "production-sized blocklist broadcast-joins instead), so the "
        "filter rides the scan at 100 TB. "
        "operators/pipeline.py:derive_urls,url_domain_filter.",
    tags=("pipeline", "text"),
)
def pipeline_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    flagged = P.url_domain_filter(
        P.derive_urls(docs),
        blocked_domains=["src3.example.com", "src7.example.com"],
        blocked_path_terms=["/es/", "forbidden"])
    return (flagged.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum(F.col("blocked_domain").cast("int")).cast("bigint")
                  .alias("n_blocked_domain"),
                 F.sum((F.col("blocked_path")
                        & ~F.col("blocked_domain")).cast("int"))
                  .cast("bigint").alias("n_blocked_path"),
                 F.sum(F.col("kept").cast("int")).cast("bigint")
                  .alias("n_kept"))
            .orderBy("source"))


@register(
    "pipeline_quality_gate_funnel",
    oracle=f"""
WITH flags AS (
  SELECT n_chars BETWEEN 100 AND 10000 AS f1,
         {_N_TOKENS} >= 10 AS f2,
         {_QUALITY} >= 0.5 AS f3,
         length(text) * 1.0 / GREATEST({_N_TOKENS}, 1) BETWEEN 3 AND 12 AS f4
  FROM documents
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(SUM(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END)
              AS BIGINT) AS n4
  FROM flags
)
SELECT stage, stage_name, n_in, n_out, n_in - n_out AS n_dropped,
       ROUND(n_out * 100.0 / GREATEST(n_in, 1), 4) AS pass_pct
FROM (
  SELECT 1 AS stage, 'char_band' AS stage_name, n0 AS n_in, n1 AS n_out FROM agg
  UNION ALL SELECT 2, 'min_tokens', n1, n2 FROM agg
  UNION ALL SELECT 3, 'quality_score', n2, n3 FROM agg
  UNION ALL SELECT 4, 'token_len_band', n3, n4 FROM agg
)
ORDER BY stage
""",
    doc="Quality-gate FUNNEL: the C4/Gopher filter chain instrumented "
        "per stage — each row reports one gate's input, survivors, "
        "drops, and pass rate, with gates applied cumulatively (the "
        "report a curation run publishes so a sudden corpus shift is "
        "attributable to the gate that ate it).  ONE scan computes all "
        "stage flags as projections; a single aggregate emits every "
        "funnel level (conditional sums), so the funnel costs one pass "
        "regardless of stage count — never one scan per stage. "
        "operators/pipeline.py:quality_filter (gates 1-3 are its "
        "exact predicates).",
    tags=("pipeline", "diagnostics"),
)
def pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T
    docs = table(spark, sf_dir, "documents")
    n_tok = T.token_count(F.col("text"))
    f1 = F.col("n_chars").between(100, 10000)
    f2 = n_tok >= 10
    f3 = T.quality_score(F.col("text")) >= 0.5
    f4 = (F.length("text") / F.greatest(n_tok, F.lit(1))).between(3, 12)
    agg = docs.agg(
        F.count("*").cast("bigint").alias("n0"),
        F.sum(f1.cast("int")).cast("bigint").alias("n1"),
        F.sum((f1 & f2).cast("int")).cast("bigint").alias("n2"),
        F.sum((f1 & f2 & f3).cast("int")).cast("bigint").alias("n3"),
        F.sum((f1 & f2 & f3 & f4).cast("int")).cast("bigint").alias("n4"))
    # one row feeds every funnel level — materialize so the union's
    # branches don't each re-run the corpus scan
    agg = agg.transform(materialize)
    stages = [(1, "char_band", "n0", "n1"), (2, "min_tokens", "n1", "n2"),
              (3, "quality_score", "n2", "n3"),
              (4, "token_len_band", "n3", "n4")]
    rows = None
    for num, name, cin, cout in stages:
        r = agg.select(F.lit(num).alias("stage"),
                       F.lit(name).alias("stage_name"),
                       F.col(cin).alias("n_in"), F.col(cout).alias("n_out"))
        rows = r if rows is None else rows.unionAll(r)
    return (rows
            .withColumn("n_dropped", F.col("n_in") - F.col("n_out"))
            .withColumn("pass_pct",
                        F.round(F.col("n_out") * 100.0
                                / F.greatest(F.col("n_in"), F.lit(1)), 4))
            .orderBy("stage"))


@register(
    "pipeline_token_budget_mixture",
    oracle=f"""
WITH per_source AS (
  SELECT source, CAST(SUM({_N_TOKENS}) AS BIGINT) AS source_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_sources FROM per_source
)
SELECT source, source_tokens,
       CAST(FLOOR(1000000.0 / t.n_sources) AS BIGINT) AS budget_tokens,
       ROUND(FLOOR(1000000.0 / t.n_sources)
             / GREATEST(source_tokens, 1), 6) AS epochs,
       FLOOR(1000000.0 / t.n_sources)
         / GREATEST(source_tokens, 1) > 1.0 AS oversampled
FROM per_source CROSS JOIN tot t
ORDER BY source
""",
    doc="Token-budget mixture allocation: given a total training budget "
        "(1M tokens here) split uniformly across sources, compute each "
        "source's epoch count (budget share / available tokens) and "
        "flag oversampled sources (epochs > 1 — the DoReMi/Pile-style "
        "repetition signal curators cap).  One keyed agg + a "
        "scalar-sized cross join; the mixture math is driver-free and "
        "source-count-sized, so it costs the same at 100 TB. "
        "Complements pipeline_domain_mixture (observed mix) with the "
        "PRESCRIBED mix.",
    tags=("pipeline",),
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T
    docs = table(spark, sf_dir, "documents")
    per_source = (docs.groupBy("source")
                  .agg(F.sum(T.token_count(F.col("text"))).cast("bigint")
                       .alias("source_tokens")))
    tot = per_source.agg(
        F.count("*").cast("double").alias("n_sources"))
    share = F.floor(F.lit(1000000.0) / F.col("n_sources"))
    epochs = share / F.greatest(F.col("source_tokens"), F.lit(1))
    return (per_source.crossJoin(F.broadcast(tot))
            .select("source", "source_tokens",
                    share.cast("bigint").alias("budget_tokens"),
                    F.round(epochs, 6).alias("epochs"),
                    (epochs > 1.0).alias("oversampled"))
            .orderBy("source"))


@register(
    "pipeline_dataset_card",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT)                       AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT)         AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT)           AS n_langs,
       CAST(SUM({_N_TOKENS}) AS BIGINT)               AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT)                   AS total_chars,
       CAST(MIN(n_chars) AS BIGINT)                   AS min_chars,
       CAST(MAX(n_chars) AS BIGINT)                   AS max_chars,
       ROUND(AVG({_QUALITY}), 6)                      AS mean_quality,
       ROUND(COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 6)
                                                      AS exact_uniq_ratio
FROM documents
""",
    doc="Dataset card: the one-row corpus summary published alongside a "
        "training set (docs, sources, languages, token/char volume, "
        "length band, mean quality score, exact-duplicate ratio via "
        "content-hash distinct).  ONE aggregate pass — every statistic "
        "is partial-aggregable (the distinct-counts keyed by their "
        "value), so the card costs a single scan at any corpus size; "
        "the near-dup and contamination lines of a full card come from "
        "the dedicated entries (dedup_*, pipeline_decontaminate). "
        "plans/pipeline_queries.py:pipeline_dataset_card.",
    tags=("pipeline", "diagnostics"),
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T
    docs = table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum(T.token_count(F.col("text"))).cast("bigint")
         .alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.round(F.avg(T.quality_score(F.col("text"))), 6)
         .alias("mean_quality"),
        F.round(F.countDistinct(F.md5("text")) / F.count(F.lit(1)), 6)
         .alias("exact_uniq_ratio"))


@register(
    "pipeline_perplexity_buckets",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN
           list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
         ELSE [] END) AS g
  FROM tok
), words AS (
  SELECT unnest(t) AS w FROM tok
), big_counts AS (
  SELECT g, COUNT(*) AS c12 FROM grams GROUP BY g
), uni_counts AS (
  SELECT w, COUNT(*) AS c1 FROM words GROUP BY w
), vocab AS (
  SELECT COUNT(DISTINCT w) AS v FROM words
), lm AS (
  SELECT doc_id, ROUND(AVG(ln((c12 + 1) * 1.0 / (c1 + v))), 4) AS lp
  FROM grams
  JOIN big_counts USING (g)
  JOIN uni_counts ON string_split(g, ' ')[1] = w
  CROSS JOIN vocab
  GROUP BY doc_id
), bucketed AS (
  SELECT d.doc_id, d.source, lp,
         len(string_split_regex(trim(d.text), '\s+')) AS n_tokens,
         NTILE(5) OVER (ORDER BY lp DESC, d.doc_id) AS bucket
  FROM documents d JOIN lm USING (doc_id)
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(MIN(lp), 4) AS min_logprob,
       ROUND(MAX(lp), 4) AS max_logprob,
       ROUND(SUM(CAST(ROUND(lp * 10000) AS BIGINT))
             / (COUNT(*) * 10000.0), 4) AS mean_logprob,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM bucketed
GROUP BY bucket
ORDER BY bucket
""",
    doc="CCNet-style perplexity bucketing: score every doc with the "
        "in-corpus bigram LM (same model as text_lm_score), split the "
        "corpus into 5 quality quintiles (NTILE over score, id "
        "tie-break), and report each bucket's doc/token mass and "
        "source diversity — the head/middle/tail partition CCNet uses "
        "to decide what to keep.  Bucket means go through integer "
        "1e-4 units (scores are 4-decimal), so every aggregate is "
        "summation-order-independent.  At 100 TB the quintile "
        "boundary comes from one approx-quantile pass and docs bucket "
        "by threshold — the NTILE total order here is the "
        "oracle-exact form of the same partition (doc-level rows, "
        "not token-level).  operators/text.py:lm_score + "
        "plans/pipeline_queries.py:pipeline_perplexity_buckets.",
    tags=("pipeline", "text", "window"),
)
def pipeline_perplexity_buckets(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from ..operators import text as T
    d = table(spark, sf_dir, "documents")
    lm = T.lm_score(d).select("doc_id", F.col("avg_logprob").alias("lp"))
    joined = (d.select("doc_id", "source",
                       T.token_count(F.col("text")).alias("n_tokens"))
              .join(lm, "doc_id"))
    from ..operators.ranking import distributed_ntile
    # distributed exact NTILE over the doc table (operators/ranking.py)
    b = distributed_ntile(joined, [F.col("lp").desc(), F.col("doc_id")],
                          5, "bucket")
    return (b.groupBy(F.col("bucket").cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.round(F.min("lp"), 4).alias("min_logprob"),
                 F.round(F.max("lp"), 4).alias("max_logprob"),
                 F.round(F.sum(F.round(F.col("lp") * 10000)
                               .cast("bigint"))
                         / (F.count(F.lit(1)) * 10000.0), 4)
                  .alias("mean_logprob"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 F.countDistinct("source").cast("bigint")
                  .alias("n_sources"))
            .orderBy("bucket"))


def _decontam_size_oracle(sizes: tuple[int, ...] = (2, 3, 5)) -> str:
    """Per-n mirror of pipeline_decontaminate's corpus rollup: the same
    distinct-gram hit accounting at each shingle size, one summary row
    per n."""
    parts, selects = [], []
    for n in sizes:
        parts.append(f""", grams{n} AS (
  SELECT doc_id, source, unnest({_DUCK_GRAMS(n)}) AS g FROM tok
), bg{n} AS (
  SELECT DISTINCT g FROM grams{n} WHERE source = 'src0'
), hit{n} AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN g IN (SELECT g FROM bg{n}) THEN 1 ELSE 0 END)
             AS n_hit
  FROM (SELECT DISTINCT doc_id, g FROM grams{n} WHERE source <> 'src0')
  GROUP BY doc_id
)""")
        selects.append(f"""
SELECT CAST({n} AS INT) AS n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hit{n} WHERE n_hit > 0)
           AS n_flagged_docs,
       (SELECT CAST(COALESCE(SUM(n_hit), 0) AS BIGINT) FROM hit{n}
         WHERE n_hit > 0) AS sum_hits,
       (SELECT CAST(COALESCE(SUM(n_grams), 0) AS BIGINT) FROM hit{n}
         WHERE n_hit > 0) AS sum_grams_flagged,
       (SELECT COUNT(*) FROM hit{n} WHERE n_hit > 0)
         / ((SELECT COUNT(DISTINCT doc_id) FROM documents
              WHERE source <> 'src0') * 1.0) AS flagged_share
""")
    return ("""
WITH tok AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
)""" + "".join(parts) + "\nUNION ALL".join(selects) + "ORDER BY n")


@register(
    "pipeline_decontaminate_ngram_sizes",
    oracle=_decontam_size_oracle(),
    doc="Decontamination SHINGLE-SIZE sensitivity: the corpus-level "
        "flag accounting (flagged docs, hit/gram sums, flagged share) "
        "at n = 2 / 3 / 5 — the n-size tuning table behind every "
        "contamination policy: short shingles flag natural phrase "
        "reuse (false positives), long ones miss paraphrase overlap "
        "(false negatives), and the policy n should be chosen off "
        "THIS curve, not folklore (the production entry uses 3).  "
        "Each sweep point keeps the scale shape of the production "
        "entry: benchmark grams broadcast, corpus never self-joined, "
        "one per-doc aggregate exchange.  Exact integer accounting; "
        "shares are ratios of identical integers. "
        "plans/pipeline_queries.py:pipeline_decontam_sizes.",
    tags=("pipeline", "dedup", "text", "diagnostics"),
)
def pipeline_decontam_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pipeline import decontaminate
    docs = table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("source") != "src0")
    bench = docs.where(F.col("source") == "src0")
    n_corpus = corpus.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("__n"))
    out = None
    for n in (2, 3, 5):
        flagged = decontaminate(corpus, bench, n=n)
        row = (flagged.agg(
                   F.count(F.lit(1)).cast("bigint").alias("n_flagged_docs"),
                   F.coalesce(F.sum("n_hit"), F.lit(0)).cast("bigint")
                    .alias("sum_hits"),
                   F.coalesce(F.sum("n_grams"), F.lit(0)).cast("bigint")
                    .alias("sum_grams_flagged"))
               .crossJoin(F.broadcast(n_corpus))
               .select(F.lit(n).cast("int").alias("n"),
                       "n_flagged_docs", "sum_hits", "sum_grams_flagged",
                       (F.col("n_flagged_docs")
                        / (F.col("__n") * F.lit(1.0)))
                       .alias("flagged_share")))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n")


@register(
    "pipeline_stratified_allocation",
    oracle="""
WITH s AS (
  SELECT doc_id, lang || '|' || source AS stratum FROM documents
), c AS (
  SELECT stratum, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY stratum
), t AS (SELECT SUM(c) AS t FROM c),
a AS (
  SELECT stratum, (c * 500) // t AS base, (c * 500) % t AS rem FROM c, t
), lo AS (SELECT CAST(500 - SUM(base) AS BIGINT) AS leftover FROM a),
fin AS (
  SELECT stratum,
         CAST(base + CASE WHEN row_number()
                               OVER (ORDER BY rem DESC, stratum)
                          <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
  FROM a, lo
), ranked AS (
  SELECT stratum, doc_id,
         ROW_NUMBER() OVER (PARTITION BY stratum
                            ORDER BY doc_id * 2654435761 % 4294967296,
                                     doc_id) AS rn
  FROM s
)
SELECT r.stratum, CAST(f.alloc AS BIGINT) AS allocation,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS ids_checksum
FROM ranked r JOIN fin f ON f.stratum = r.stratum
WHERE rn <= f.alloc
GROUP BY r.stratum, f.alloc
ORDER BY r.stratum
""",
    doc="Exact proportional stratified sampling to a FIXED 500-doc "
        "budget over (lang, source) strata by the largest-remainder "
        "(Hamilton) method — the domain-mixture allocation a training-"
        "data pipeline runs when the token budget is fixed and "
        "per-stratum rounding must still sum EXACTLY to the budget.  "
        "All integer arithmetic: base = floor-div on BIGINTs (Spark "
        "`div`), remainder seats by (budget*c mod T) descending with a "
        "stratum-name tie-break, kept rows are the allocation-smallest "
        "by Knuth id-hash per stratum.  The checksum pins WHICH docs "
        "were kept.  Scale: the allocation runs on the one-row-per-"
        "stratum count table (broadcast back); per-row work is the one "
        "window rank a stratified sample fundamentally needs. "
        "operators/pipeline.py:stratified_allocation.",
    tags=("pipeline", "sampling"),
)
def pipeline_stratified_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.concat_ws("|", "lang", "source").alias("stratum")))
    kept = P.stratified_allocation(docs, "stratum", "doc_id", budget=500)
    return (kept.groupBy("stratum",
                         F.col("allocation").cast("bigint")
                          .alias("allocation"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                 F.sum("doc_id").cast("bigint").alias("ids_checksum"))
            .orderBy("stratum"))


@register(
    "pipeline_decontaminate_bloom",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
), grams AS (
  SELECT doc_id, source, unnest({{grams}}) AS g FROM tok
), bg AS (
  SELECT DISTINCT g FROM grams WHERE source = 'src0'
), bloom AS (
  SELECT DISTINCT kk,
         CAST(('0x' || substr(md5('cm' || CAST(kk AS VARCHAR) || '|'
                              || g), 1, 8))::UBIGINT % 65536 AS BIGINT)
             AS bit
  FROM bg CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS kk)
), cg AS (
  SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0'
), probed AS (
  SELECT doc_id, g,
         MAX(CASE WHEN g IN (SELECT g FROM bg) THEN 1 ELSE 0 END)
             AS hit_exact,
         CASE WHEN COUNT(*) FILTER (WHERE b.bit IS NOT NULL) = 4
              THEN 1 ELSE 0 END AS hit_bloom
  FROM (SELECT doc_id, g, kk,
               CAST(('0x' || substr(md5('cm' || CAST(kk AS VARCHAR)
                                    || '|' || g), 1, 8))::UBIGINT
                    % 65536 AS BIGINT) AS bit
        FROM cg CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS kk)) p
  LEFT JOIN bloom b ON b.kk = p.kk AND b.bit = p.bit
  GROUP BY doc_id, g
), per_doc AS (
  SELECT doc_id,
         MAX(hit_exact) AS any_exact, MAX(hit_bloom) AS any_bloom,
         SUM(hit_exact) AS ge, SUM(hit_bloom) AS gb
  FROM probed GROUP BY doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_checked,
       CAST(SUM(any_exact) AS BIGINT) AS docs_flagged_exact,
       CAST(SUM(any_bloom) AS BIGINT) AS docs_flagged_bloom,
       CAST(SUM(ge) AS BIGINT) AS gram_hits_exact,
       CAST(SUM(gb) AS BIGINT) AS gram_hits_bloom,
       CAST(SUM(gb) - SUM(ge) AS BIGINT) AS gram_false_positives
FROM per_doc
""".replace("{grams}", _DUCK_GRAMS(3)),
    doc="Decontamination via a BROADCAST Bloom filter vs the exact "
        "gram join, in one report — the audit for THE 100 TB "
        "decontamination play: a benchmark suite's gram set may be "
        "MBs, but a k=4/m=65536 Bloom is a fixed 64 K bits that "
        "broadcasts to every executor and filters map-side with zero "
        "gram shuffle; the price is false positives, and this entry "
        "MEASURES them against the exact join (no false negatives by "
        "construction — the gate would catch any).  Same md5 bucket "
        "family as the count-min/Bloom sketch entries, so the filter "
        "is bit-reproducible in both engines and the whole report is "
        "exact integers.  plans/pipeline_queries.py + "
        "operators/countmin.py:bloom_build/cm_bucket.",
    tags=("pipeline", "sketch", "dedup"),
)
def pipeline_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import countmin as CM
    from ..operators import text as T
    from ..operators.partitioning import fan_out
    docs = table(spark, sf_dir, "documents")
    g = T.token_ngrams(F.col("text"), 3)
    bench = (docs.where(F.col("source") == "src0")
             .select(F.explode(g).alias("g")).distinct())
    bloom = CM.bloom_build(bench, "g", k=4, m=65536) \
        .transform(materialize)
    corpus = (fan_out(docs.where(F.col("source") != "src0"))
              .select("doc_id", F.explode(g).alias("g")).distinct())
    probes = corpus.select(
        "doc_id", "g",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("kk"))
    probes = probes.withColumn(
        "bit", CM.cm_bucket(F.col("g"), F.col("kk"), 65536))
    probed = (probes.join(F.broadcast(bloom.withColumn("__s", F.lit(1))),
                          ["kk", "bit"], "left")
              .groupBy("doc_id", "g")
              .agg((F.count(F.when(F.col("__s").isNotNull(), 1)) == 4)
                   .cast("int").alias("hit_bloom")))
    exact = (corpus.join(F.broadcast(bench.withColumn("__h", F.lit(1))),
                         "g", "left")
             .select("doc_id", "g",
                     F.coalesce(F.col("__h"), F.lit(0)).alias("hit_exact")))
    per_doc = (probed.join(exact, ["doc_id", "g"])
               .groupBy("doc_id")
               .agg(F.max("hit_exact").alias("any_exact"),
                    F.max("hit_bloom").alias("any_bloom"),
                    F.sum("hit_exact").alias("ge"),
                    F.sum("hit_bloom").alias("gb")))
    return per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_checked"),
        F.sum("any_exact").cast("bigint").alias("docs_flagged_exact"),
        F.sum("any_bloom").cast("bigint").alias("docs_flagged_bloom"),
        F.sum("ge").cast("bigint").alias("gram_hits_exact"),
        F.sum("gb").cast("bigint").alias("gram_hits_bloom"),
        (F.sum("gb") - F.sum("ge")).cast("bigint")
         .alias("gram_false_positives"))


@register(
    "pipeline_dedup_rate_by_source",
    oracle="""
WITH per_text AS (
  SELECT source, md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS copies
  FROM documents GROUP BY source, md5(text)
)
SELECT source,
       CAST(SUM(copies) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_redundant,
       ROUND(1.0 - COUNT(*) * 1.0 / SUM(copies), 6) AS dup_rate,
       CAST(MAX(copies) AS BIGINT) AS max_cluster
FROM per_text GROUP BY source ORDER BY source
""",
    doc="Exact-duplication observability per source: docs, distinct "
        "texts (md5 identity — portable and constant-width however "
        "long the docs), redundant copies, dup rate, and the largest "
        "clone cluster — the per-feed scorecard a crawl operator "
        "watches to catch a mirror or a scraper loop BEFORE the dedup "
        "stage pays for it.  Counts exact; the rate one integer "
        "ratio.  Scale: one (source, md5) partial-agg shuffle with "
        "constant-width keys (never the raw text), then a sources-"
        "sized rollup. plans/pipeline_queries.py:pipeline_dedup_rate.",
    tags=("pipeline", "dedup"),
)
def pipeline_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per_text = (d.groupBy("source", F.md5("text").alias("h"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("copies")))
    return (per_text.groupBy("source")
            .agg(F.sum("copies").cast("bigint").alias("n_docs"),
                 F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                 (F.sum("copies") - F.count(F.lit(1))).cast("bigint")
                  .alias("n_redundant"),
                 F.round(F.lit(1.0) - F.count(F.lit(1))
                         / F.sum("copies"), 6).alias("dup_rate"),
                 F.max("copies").cast("bigint").alias("max_cluster"))
            .orderBy("source"))


@register(
    "pipeline_temperature_mixture",
    oracle=f"""
WITH per_source AS (
  SELECT source, CAST(SUM({_N_TOKENS}) AS BIGINT) AS n
  FROM documents GROUP BY source
), fp AS (
  SELECT source, n,
         CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS s
  FROM per_source
), tot AS (
  SELECT CAST(SUM(s) AS BIGINT) AS st FROM fp
), base AS (
  SELECT source, n, s,
         (1000000 * s) // t.st AS base_alloc,
         (1000000 * s) % t.st AS rem
  FROM fp CROSS JOIN tot t
), leftover AS (
  SELECT CAST(1000000 - SUM(base_alloc) AS BIGINT) AS k FROM base
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS r FROM base
)
SELECT b.source, b.n AS source_tokens, b.s AS sqrt_fp,
       CAST(b.base_alloc + CASE WHEN b.r <= l.k THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_tokens,
       ROUND(b.s * 1.0 / (SELECT st FROM tot), 6) AS temp_share,
       ROUND((b.base_alloc + CASE WHEN b.r <= l.k THEN 1 ELSE 0 END)
             * 1.0 / GREATEST(b.n, 1), 6) AS epochs
FROM ranked b CROSS JOIN leftover l
ORDER BY b.source
""",
    doc="Temperature-weighted mixture allocation (tau = 0.5): each "
        "source's share of a 1M-token budget is proportional to "
        "n_tokens^0.5 — the mT5/XLM-R up-sampling rule that keeps "
        "low-resource sources from vanishing — allocated EXACTLY to "
        "the budget by largest-remainder (Hamilton) arithmetic.  "
        "Cross-engine exactness: sqrt is IEEE-correctly-rounded and "
        "identical in both engines, frozen to integer micro-units "
        "(floor(sqrt(n) x 1e6)) BEFORE any summation so the share "
        "fractions, integer quotients, and remainder ranking never "
        "touch an order-dependent float sum (the stratified-allocation "
        "discipline applied to the mixture problem).  Scale: one keyed "
        "agg; everything after is source-count-sized. "
        "plans/pipeline_queries.py:pipeline_temperature_mixture.",
    tags=("pipeline",),
)
def pipeline_temperature_mixture(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from ..operators import text as T
    docs = table(spark, sf_dir, "documents")
    per_source = (docs.groupBy("source")
                  .agg(F.sum(T.token_count(F.col("text"))).cast("bigint")
                       .alias("n")))
    fp = per_source.withColumn(
        "s", F.floor(F.sqrt(F.col("n").cast("double")) * 1000000)
              .cast("bigint"))
    tot = fp.agg(F.sum("s").cast("bigint").alias("st"))
    base = (fp.crossJoin(F.broadcast(tot))
            .withColumn("base_alloc", F.expr("(1000000 * s) div st"))
            .withColumn("rem", (F.lit(1000000) * F.col("s")) % F.col("st")))
    leftover = base.agg((F.lit(1000000) - F.sum("base_alloc"))
                        .cast("bigint").alias("k"))
    ranked = base.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("rem").desc(),
                                                "source")))
    extra = F.when(F.col("r") <= F.col("k"), 1).otherwise(0)
    return (ranked.crossJoin(F.broadcast(leftover))
            .select("source", F.col("n").alias("source_tokens"),
                    F.col("s").alias("sqrt_fp"),
                    (F.col("base_alloc") + extra).cast("bigint")
                     .alias("alloc_tokens"),
                    F.round(F.col("s").cast("double") / F.col("st"), 6)
                     .alias("temp_share"),
                    F.round((F.col("base_alloc") + extra).cast("double")
                            / F.greatest(F.col("n"), F.lit(1)), 6)
                     .alias("epochs"))
            .orderBy("source"))


@register(
    "pipeline_length_percentiles_by_lang",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       ROUND(QUANTILE_CONT(n_chars, 0.10), 4) AS p10,
       ROUND(QUANTILE_CONT(n_chars, 0.50), 4) AS p50,
       ROUND(QUANTILE_CONT(n_chars, 0.90), 4) AS p90,
       ROUND(QUANTILE_CONT(n_chars, 0.99), 4) AS p99,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
""",
    doc="Document-length percentile profile per language (p10/p50/p90/"
        "p99 exact continuous quantiles + min/max) — the calibration "
        "table length-based quality filters (Gopher's min/max-chars "
        "rules, the C4 short-doc drop) are tuned from, per language "
        "because length distributions differ by script.  Same exact-"
        "percentile spelling as agg_median_percentile (Spark "
        "percentile() == DuckDB QUANTILE_CONT).  Scale: exact "
        "percentiles group-shuffle (lang, n_chars) pairs — bounded by "
        "the distinct-length domain per group; for truly hot groups "
        "the HDR-sketch entry is the approximate path. "
        "plans/pipeline_queries.py:pipeline_length_percentiles.",
    tags=("pipeline", "stats", "diagnostics"),
)
def pipeline_length_percentiles(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    c = F.col("n_chars")
    return (d.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.min(c).cast("bigint").alias("min_chars"),
                 F.round(F.percentile(c, 0.10), 4).alias("p10"),
                 F.round(F.percentile(c, 0.50), 4).alias("p50"),
                 F.round(F.percentile(c, 0.90), 4).alias("p90"),
                 F.round(F.percentile(c, 0.99), 4).alias("p99"),
                 F.max(c).cast("bigint").alias("max_chars"))
            .orderBy("lang"))


@register(
    "pipeline_systematic_resample",
    oracle="""
WITH w AS (
  SELECT doc_id, source, n_chars,
         SUM(n_chars) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
), tot AS (
  SELECT CAST(SUM(n_chars) AS BIGINT) AS W,
         CAST((COUNT(*) + 9) // 10 AS BIGINT) AS n
  FROM documents
), cnts AS (
  SELECT doc_id, source, n_chars,
         LEAST(t.n, GREATEST(0,
           (2 * cum * t.n - t.W + 2 * t.W - 1) // (2 * t.W)))
         - LEAST(t.n, GREATEST(0,
           (2 * (cum - n_chars) * t.n - t.W + 2 * t.W - 1) // (2 * t.W)))
           AS k
  FROM w CROSS JOIN tot t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS sampled_docs,
       CAST(SUM(k) AS BIGINT) AS sampled_multiplicity,
       CAST(SUM(n_chars) AS BIGINT) AS weight,
       ROUND(SUM(k) * 1.0 / (SELECT MAX(n) FROM tot), 6)
         AS share_of_sample,
       ROUND(SUM(n_chars) * 1.0 / (SELECT MAX(W) FROM tot), 6)
         AS share_of_weight
FROM cnts GROUP BY source ORDER BY source
""",
    doc="Deterministic SYSTEMATIC resampling proportional to length "
        "(the DSIR-style importance-resampling primitive with weight = "
        "n_chars ~ token budget): n = ceil(docs/10) evenly-spaced "
        "positions (j+0.5)·W/n walk the doc_id-ordered cumulative-"
        "weight line; each doc's multiplicity is the EXACT integer "
        "count of positions inside its interval — spelled as "
        "ceil-divisions over 64-bit integers on both engines, so the "
        "sample is bit-reproducible (no RNG, no floats: the property "
        "that makes a 100 TB sampling job re-runnable and auditable).  "
        "Any CONTIGUOUS doc_id range receives its weight share to "
        "within 1 position by construction (the systematic-sampling "
        "guarantee); the per-source report exposes how far the "
        "INTERLEAVED strata deviate (sources scatter into many "
        "sub-spacing intervals, so their shares track weight only in "
        "expectation — measured ±40% relative at sf0.1 — which is "
        "exactly why a stratum-exact budget needs "
        "pipeline_stratified_allocation/pipeline_temperature_mixture "
        "instead; total multiplicity == n EXACTLY, asserted at both "
        "SFs).  The cumulative line is a DISTRIBUTED prefix "
        "sum (range-repartition + local window + offset lift, "
        "operators/ranking.py:with_global_cumsum — never a one-task "
        "sort).  plans/pipeline_queries.py:pipeline_systematic_resample.",
    tags=("pipeline", "aggregate"),
)
def pipeline_systematic_resample(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..operators.ranking import with_global_cumsum
    docs = table(spark, sf_dir, "documents") \
        .select("doc_id", "source", "n_chars")
    tot = docs.agg(F.sum("n_chars").cast("bigint").alias("W"),
                   F.count(F.lit(1)).cast("bigint").alias("c")).first()
    W, n = int(tot["W"]), (int(tot["c"]) + 9) // 10
    cum = with_global_cumsum(docs, [F.col("doc_id")], "n_chars", "cum")

    def cnt(c):  # positions strictly below c: ceil((2cn - W) / (2W))
        return F.least(
            F.lit(n).cast("bigint"),
            F.greatest(F.lit(0).cast("bigint"),
                       F.expr(f"(2 * {c} * {n} - {W} + {2 * W} - 1) "
                              f"div {2 * W}")))

    k = (cnt("cum") - cnt("(cum - n_chars)")).alias("k")
    cnts = cum.select("doc_id", "source", "n_chars", k)
    return (cnts.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum((F.col("k") > 0).cast("int")).cast("bigint")
                  .alias("sampled_docs"),
                 F.sum("k").cast("bigint").alias("sampled_multiplicity"),
                 F.sum("n_chars").cast("bigint").alias("weight"),
                 F.round(F.sum("k") / F.lit(float(n)), 6)
                  .alias("share_of_sample"),
                 F.round(F.sum("n_chars") / F.lit(float(W)), 6)
                  .alias("share_of_weight"))
            .orderBy("source"))


def _logreg_oracle(iterations: int = 8) -> str:
    mwl = ("list_aggregate(list_transform(toks, x -> "
           "CAST(len(x) AS DOUBLE)), 'sum') / len(toks)")
    parts = [rf"""
WITH feats AS MATERIALIZED (
  SELECT len(toks) AS n1,
         CAST(ROUND(({mwl}) * CAST(1e6 AS DOUBLE), 0) AS BIGINT) AS m6,
         len(list_filter(toks, x -> x IN ('the', 'a'))) AS s1,
         CASE WHEN len(toks) BETWEEN 25 AND 90
               AND ({mwl}) BETWEEN 4.3 AND 4.8
               AND len(list_filter(toks, x -> x IN ('the', 'a'))) >= 2
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
  FROM (SELECT string_split_regex(trim(text), '\s+') AS toks
        FROM documents)
), w0 AS (
  SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS ww,
         CAST(0.0 AS DOUBLE) AS wm, CAST(0.0 AS DOUBLE) AS ws
)"""]
    for t in range(1, iterations + 1):
        parts.append(f""",
r{t} AS (
  SELECT CAST(ROUND(p * CAST(1e8 AS DOUBLE), 0) AS BIGINT)
           - y * 100000000 AS e8,
         CAST(ROUND(-(CAST(y AS DOUBLE) * LN(pc)
                      + (CAST(1.0 AS DOUBLE) - CAST(y AS DOUBLE))
                        * LN(CAST(1.0 AS DOUBLE) - pc))
                    * CAST(1e8 AS DOUBLE), 0) AS BIGINT) AS l8,
         z, n1, m6, s1, y
  FROM (
    SELECT LEAST(GREATEST(p, CAST(1e-8 AS DOUBLE)),
                 CAST(1.0 AS DOUBLE) - CAST(1e-8 AS DOUBLE)) AS pc,
           p, z, n1, m6, s1, y
    FROM (
      SELECT ROUND(CAST(1.0 AS DOUBLE)
                   / (CAST(1.0 AS DOUBLE) + EXP(-z)), 8) AS p,
             z, n1, m6, s1, y
      FROM (
        SELECT b + ww * (CAST(n1 AS DOUBLE) / CAST(100.0 AS DOUBLE))
                 + wm * (CAST(m6 AS DOUBLE) / CAST(1e7 AS DOUBLE))
                 + ws * (CAST(s1 AS DOUBLE) / CAST(10.0 AS DOUBLE)) AS z,
               n1, m6, s1, y
        FROM feats, w{t - 1})))
), st{t} AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         ROUND(CAST(SUM(e8) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * CAST(1e8 AS DOUBLE)), 8)
           AS g0,
         ROUND(CAST(SUM(e8 * n1) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * CAST(1e10 AS DOUBLE)), 8)
           AS g1,
         ROUND(CAST(SUM(e8 * m6) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * CAST(1e15 AS DOUBLE)), 8)
           AS g2,
         ROUND(CAST(SUM(e8 * s1) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * CAST(1e9 AS DOUBLE)), 8)
           AS g3,
         ROUND(CAST(SUM(l8) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * CAST(1e8 AS DOUBLE)), 6)
           AS loss,
         CAST(SUM(CASE WHEN y = 1 AND z >= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN y = 0 AND z >= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN y = 0 AND z < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS tn,
         CAST(SUM(CASE WHEN y = 1 AND z < 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fn
  FROM r{t}
), w{t} AS (
  SELECT ROUND(b - CAST(4.0 AS DOUBLE) * g0, 10) AS b,
         ROUND(ww - CAST(4.0 AS DOUBLE) * g1, 10) AS ww,
         ROUND(wm - CAST(4.0 AS DOUBLE) * g2, 10) AS wm,
         ROUND(ws - CAST(4.0 AS DOUBLE) * g3, 10) AS ws
  FROM w{t - 1}, st{t}
)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS INT) AS iter, loss, tp, fp, tn, fn, "
        f"b AS w_bias, ww AS w_words, wm AS w_mwl, ws AS w_stop "
        f"FROM st{t}, w{t}"
        for t in range(1, iterations + 1))
    parts.append("\n" + sel + "\nORDER BY iter")
    return "".join(parts)


@register(
    "pipeline_quality_logreg_distill",
    oracle=_logreg_oracle(),
    doc="Distill the Gopher rule cascade into a linear quality scorer "
        "— the fastText-style pattern production LLM pipelines run "
        "(CCNet/LLaMA/RedPajama: expensive filter labels a sample, a "
        "cheap classifier mimics it and scores the full crawl).  "
        "Teacher = gopher_rules' kept flag; student = logistic "
        "regression on the same three surface signals; 8 full-batch "
        "GD iterations (lr=4; final model 74% accuracy vs the 52.5% "
        "base rate — the band rules are NOT linearly separable, an "
        "honest distillation gap), each ONE map-side-combinable aggregate "
        "(per-partition partial sums, a d+6-value row per partition "
        "crosses the wire; driver holds only the 4 weights — the "
        "bounded-driver-state pattern of the BPE/k-center entries).  "
        "Bit-exact replay: σ is rounded to 8 digits immediately, so "
        "gradient numerators Σ e·x are EXACT INTEGER sums "
        "(decimal(38,0) Spark-side, HUGEINT oracle-side) — no float "
        "summation order anywhere; the integer-lr update is closed over "
        "8-digit decimals; confusion counts compare the exact z ≥ 0. "
        "Output = the whole training curve (per-iteration loss, "
        "confusion at 0.5, post-update weights). "
        "operators/pipeline.py:distill_quality_logreg.",
    tags=("pipeline", "text"),
)
def pipeline_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.distill_quality_logreg(table(spark, sf_dir, "documents"))
