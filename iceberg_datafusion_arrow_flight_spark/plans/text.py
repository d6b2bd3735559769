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


@register(
    "text_lm_score",
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
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln((c12 + 1) * 1.0 / (c1 + v))), 4) AS avg_logprob
FROM grams
JOIN big_counts USING (g)
JOIN uni_counts ON string_split(g, ' ')[1] = w
CROSS JOIN vocab
GROUP BY doc_id ORDER BY doc_id
""",
    doc="Bigram LM quality score (CCNet-style): add-one-smoothed "
        "in-corpus bigram model, mean log P(w2|w1) per doc — low "
        "scorers are out-of-distribution.  Counts are partial-agg "
        "shuffles; scoring is one gram-keyed equi-join + broadcast "
        "unigram/vocab joins. operators/text.py:lm_score.",
    tags=("text", "pipeline"),
)
def text_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return T.lm_score(d).orderBy("doc_id")


@register(
    "text_tfidf_topk",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, term,
         ROUND((c * 1.0 / SUM(c) OVER (PARTITION BY doc_id))
               * ln(n_docs * 1.0 / df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
""",
    doc="Top-3 characteristic terms per doc by tf-idf (deterministic "
        "tie-break).  One (doc,term) shuffle, vocabulary-sized document-"
        "frequency broadcast, per-doc top-k window. "
        "operators/text.py:tfidf_top_terms.",
    tags=("text", "pipeline", "window"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return T.tfidf_top_terms(d, k=3).orderBy("doc_id", "rank")


@register(
    "sketch_count_min",
    oracle=r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS v FROM documents
), rows_ AS (
  SELECT d, v FROM tok CROSS JOIN (SELECT unnest([0,1,2,3]) AS d)
)
SELECT d,
       CAST(('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || '|' || v),
                            1, 8))::UBIGINT % 256 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS c
FROM rows_
GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc="Count-min sketch (4 rows x 256 buckets) over document tokens — "
        "the mergeable frequency sketch itself, bit-for-bit oracled: "
        "md5-derived bucket hashes compute identically on both engines. "
        "Shuffle volume is d*w regardless of corpus size; executors "
        "sketch shards independently and cells add. "
        "operators/countmin.py:countmin_sketch.",
    tags=("text", "sketch", "approx"),
)
def sketch_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import countmin as CM
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.ws_tokens(F.col("text"))).alias("v"))
    return (CM.countmin_sketch(toks, "v", depth=4, width=256)
            .select("d", "bucket", F.col("c").cast("bigint").alias("c"))
            .orderBy("d", "bucket"))


@register(
    "sketch_heavy_hitters",
    oracle=r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS v FROM documents
), exact_ AS (
  SELECT v, COUNT(*) AS exact_count FROM tok GROUP BY v
), sk AS (
  SELECT d,
         ('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || '|' || v),
                         1, 8))::UBIGINT % 256 AS bucket,
         COUNT(*) AS c
  FROM tok CROSS JOIN (SELECT unnest([0,1,2,3]) AS d)
  GROUP BY 1, 2
), est AS (
  SELECT e.v, MIN(sk.c) AS cm_estimate
  FROM exact_ e
  CROSS JOIN (SELECT unnest([0,1,2,3]) AS d) ds
  JOIN sk ON sk.d = ds.d
         AND sk.bucket = ('0x' || substr(md5('cm' || CAST(ds.d AS VARCHAR)
                          || '|' || e.v), 1, 8))::UBIGINT % 256
  GROUP BY e.v
)
SELECT v AS token, CAST(exact_count AS BIGINT) AS exact_count,
       CAST(cm_estimate AS BIGINT) AS cm_estimate,
       CAST(cm_estimate - exact_count AS BIGINT) AS overcount
FROM exact_ JOIN est USING (v)
ORDER BY exact_count DESC, token LIMIT 20
""",
    doc="Top-20 tokens with exact count AND count-min estimate side by "
        "side: overcount >= 0 always (the sketch never underestimates), "
        "bounded by n/width.  The probe path broadcasts the d*w sketch "
        "and never reshuffles the stream. "
        "operators/countmin.py:countmin_estimate.",
    tags=("text", "sketch", "approx", "topk"),
)
def sketch_hh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import countmin as CM
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.ws_tokens(F.col("text"))).alias("v"))
    sketch = CM.countmin_sketch(toks, "v", depth=4, width=256)
    exact = toks.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count"))
    est = CM.countmin_estimate(sketch, toks, "v", depth=4, width=256)
    return (exact.join(est, "v")
            .select(F.col("v").alias("token"), "exact_count",
                    "cm_estimate",
                    (F.col("cm_estimate") - F.col("exact_count"))
                    .cast("bigint").alias("overcount"))
            .orderBy(F.col("exact_count").desc(), F.col("token"))
            .limit(20))


@register(
    "sketch_bloom_membership",
    oracle=r"""
WITH bloom AS (
  SELECT DISTINCT kk,
         CAST(('0x' || substr(md5('cm' || CAST(kk AS VARCHAR) || '|'
                              || CAST(o_custkey AS VARCHAR)),
                              1, 8))::UBIGINT % 4096 AS BIGINT) AS bit
  FROM orders CROSS JOIN (SELECT unnest([0,1,2,3]) AS kk)
  WHERE o_orderpriority = '1-URGENT'
), probe AS (
  SELECT c_custkey, kk,
         CAST(('0x' || substr(md5('cm' || CAST(kk AS VARCHAR) || '|'
                              || CAST(c_custkey AS VARCHAR)),
                              1, 8))::UBIGINT % 4096 AS BIGINT) AS bit
  FROM customer CROSS JOIN (SELECT unnest([0,1,2,3]) AS kk)
)
SELECT c_custkey,
       (COUNT(*) FILTER (WHERE b.bit IS NOT NULL) = 4) AS maybe_present
FROM probe p
LEFT JOIN bloom b ON b.kk = p.kk AND b.bit = p.bit
GROUP BY c_custkey
""",
    doc="Bloom-filter membership sketch (sparse bitset relation, k=4 "
        "hash rows x m=4096 bits, count-min's md5 bucket family): build "
        "over urgent-order customers, probe every customer.  Merge is "
        "union+distinct (bitwise OR); no false negatives by "
        "construction; the oracle reproduces the identical bits in SQL. "
        "operators/countmin.py:bloom_build/bloom_probe.",
    tags=("sketch", "approx"),
)
def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import countmin as CM
    urgent = (table(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") == "1-URGENT"))
    bloom = CM.bloom_build(urgent, "o_custkey")
    return CM.bloom_probe(bloom, table(spark, sf_dir, "customer"),
                          "c_custkey")


@register(
    "text_langid_confusion",
    oracle=f"""
WITH pred AS (
  SELECT lang,
         CASE WHEN en_h >= de_h AND en_h >= fr_h AND en_h > 0 THEN 'en'
              WHEN de_h >= fr_h AND de_h > 0 THEN 'de'
              WHEN fr_h > 0 THEN 'fr'
              ELSE 'und' END AS detected_lang
  FROM (
    SELECT lang,
           {_HITS.format(lst=_SW_EN)} AS en_h,
           {_HITS.format(lst=_SW_DE)} AS de_h,
           {_HITS.format(lst=_SW_FR)} AS fr_h
    FROM documents
  ) t
)
SELECT lang, detected_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY lang, detected_lang ORDER BY lang, detected_lang
""",
    doc="Language-ID confusion matrix: the stopword-argmax detector "
        "cross-tabulated against the fixture labels — the evaluation "
        "rollup a pipeline runs before trusting a classifier for "
        "filtering. operators/text.py:detect_language.",
    tags=("text", "eval"),
)
def text_langid_conf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (d.select("lang",
                     T.detect_language(F.col("text")).alias("detected_lang"))
            .groupBy("lang", "detected_lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .orderBy("lang", "detected_lang"))


@register(
    "text_vocab_stats",
    oracle=r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents
), counts AS (
  SELECT t, COUNT(*) AS c FROM tok GROUP BY t
)
SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
       CAST(MAX(c) AS BIGINT) AS max_token_freq
FROM counts
""",
    doc="Corpus vocabulary statistics in one pass over the token "
        "explosion: total token count, vocabulary size, hapax-legomena "
        "count (frequency-1 tokens — the Heaps/Zipf health signal for a "
        "crawl), and the modal token frequency.  One shuffle keyed by "
        "token, then a single-row rollup.",
    tags=("text",),
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = (d.select(F.explode(T.ws_tokens(F.col("text"))).alias("t"))
              .groupBy("t").agg(F.count(F.lit(1)).alias("c")))
    return counts.agg(
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint")
         .alias("hapax_count"),
        F.max("c").cast("bigint").alias("max_token_freq"))


@register(
    "text_zipf_law_fit",
    oracle=r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents
), counts AS (
  SELECT t, COUNT(*) AS c FROM tok GROUP BY t
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS r FROM counts
), head AS (
  SELECT CAST(c AS DOUBLE) AS c, CAST(r AS DOUBLE) AS r
  FROM ranked WHERE r <= 1000
)
SELECT ROUND(regr_slope(ln(c), ln(r)), 4) AS zipf_slope,
       ROUND(regr_r2(ln(c), ln(r)), 4) AS zipf_r2,
       CAST(COUNT(*) AS BIGINT) AS n_types_fit
FROM head
""",
    doc="Zipf's-law fit over the corpus frequency spectrum: OLS slope "
        "and R² of ln(frequency) against ln(rank) for the top-1000 "
        "types (the head is where the power law holds; the tail "
        "departs).  A healthy natural-language crawl fits slope ≈ −1 "
        "with high R² — a flat slope or broken fit flags boilerplate "
        "floods or synthetic spam.  Scale shape: one token-keyed "
        "count shuffle, then TakeOrderedAndProject caps the global "
        "sort at 1000 rows before the single-partition rank window — "
        "the full vocabulary (hundreds of millions of types at 100 TB) "
        "never funnels through one task.",
    tags=("text",),
)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    d = table(spark, sf_dir, "documents")
    counts = (d.select(F.explode(T.ws_tokens(F.col("text"))).alias("t"))
              .groupBy("t").agg(F.count(F.lit(1)).alias("c")))
    head = counts.orderBy(F.col("c").desc(), F.col("t")).limit(1000)
    w = Window.orderBy(F.col("c").desc(), F.col("t"))
    ranked = head.select(F.col("c").cast("double").alias("c"),
                         F.row_number().over(w).cast("double").alias("r"))
    return ranked.agg(
        F.round(F.regr_slope(F.log("c"), F.log("r")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("c"), F.log("r")), 4).alias("zipf_r2"),
        F.count(F.lit(1)).cast("bigint").alias("n_types_fit"))


@register(
    "text_chi2_lang_source",
    oracle=r"""
WITH obs AS (
  SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS o
  FROM documents GROUP BY lang, source
), rowt AS (
  SELECT lang, SUM(o) AS rl FROM obs GROUP BY lang
), colt AS (
  SELECT source, SUM(o) AS cs FROM obs GROUP BY source
), tot AS (
  SELECT SUM(o) AS n FROM obs
), cells AS (
  SELECT r.lang, c.source, r.rl * c.cs / t.n AS e, COALESCE(o.o, 0.0) AS o
  FROM rowt r CROSS JOIN colt c CROSS JOIN tot t
  LEFT JOIN obs o ON o.lang = r.lang AND o.source = c.source
)
SELECT ROUND(SUM((o - e) * (o - e) / e), 4) AS chi2_stat,
       CAST(((SELECT COUNT(*) FROM rowt) - 1)
            * ((SELECT COUNT(*) FROM colt) - 1) AS BIGINT) AS dof
FROM cells
""",
    doc="Chi-squared test of independence between document language and "
        "source — the corpus-composition diagnostic (is one source "
        "over-contributing a language?  is the crawl mix drifting?).  "
        "All cells of the full contingency table contribute, including "
        "observed-zero ones (rowt × colt cross join, COALESCE 0).  "
        "Scale shape: one (lang, source)-keyed count shuffle over the "
        "corpus; everything after operates on the cell table, which is "
        "|langs|·|sources| rows — driver-trivial at any corpus size.",
    tags=("text",),
)
def text_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    obs = (d.groupBy("lang", "source")
           .agg(F.count(F.lit(1)).cast("double").alias("o")))
    rowt = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    colt = obs.groupBy("source").agg(F.sum("o").alias("cs"))
    tot = obs.agg(F.sum("o").alias("n"))
    dof = obs.agg(((F.countDistinct("lang") - 1)
                   * (F.countDistinct("source") - 1))
                  .cast("bigint").alias("dof"))
    cells = (rowt.crossJoin(colt).crossJoin(F.broadcast(tot))
             .join(obs, ["lang", "source"], "left")
             .select((F.col("rl") * F.col("cs") / F.col("n")).alias("e"),
                     F.coalesce(F.col("o"), F.lit(0.0)).alias("o")))
    chi2 = cells.agg(
        F.round(F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))
                      / F.col("e")), 4).alias("chi2_stat"))
    return chi2.crossJoin(F.broadcast(dof))


@register(
    "text_pmi_collocations",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), grams AS (
  SELECT unnest(CASE WHEN len(t) >= 2 THEN
           list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
         ELSE [] END) AS g
  FROM tok
), words AS (
  SELECT unnest(t) AS w FROM tok
), big_counts AS (
  SELECT g, COUNT(*) AS c12 FROM grams GROUP BY g
), uni_counts AS (
  SELECT w, COUNT(*) AS c1 FROM words GROUP BY w
), tot AS (
  SELECT (SELECT CAST(SUM(c12) AS DOUBLE) FROM big_counts) AS b,
         (SELECT CAST(SUM(c1) AS DOUBLE) FROM uni_counts) AS n
), scored AS (
  SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
         CAST(c12 AS BIGINT) AS c12,
         ROUND(ln((c12 / t.b) / ((u1.c1 / t.n) * (u2.c1 / t.n))), 6) AS pmi
  FROM big_counts CROSS JOIN tot t
  JOIN uni_counts u1 ON string_split(g, ' ')[1] = u1.w
  JOIN uni_counts u2 ON string_split(g, ' ')[2] = u2.w
  WHERE c12 >= 5
)
SELECT w1, w2, c12, pmi FROM scored
ORDER BY pmi DESC, w1, w2 LIMIT 50
""",
    doc="PMI collocation mining — top-50 adjacent token pairs by "
        "pointwise mutual information, min count 5 (the classic "
        "collocation-extraction recipe; on a web crawl it surfaces "
        "multiword entities and boilerplate phrases).  pmi = "
        "ln(P(w1w2) / (P(w1)P(w2))) from in-corpus bigram/unigram "
        "frequencies.  Scale shape: two partial-agg count shuffles, "
        "then the SMALL filtered bigram table joins broadcast unigram "
        "counts and a 1-row totals relation; the top-50 is a "
        "TakeOrdered, never a global sort.  Deterministic under ties: "
        "(pmi, w1, w2) is a unique total order.",
    tags=("text",),
)
def text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    grams = d.select(F.explode(T.token_ngrams(F.col("text"), 2)).alias("g"))
    toks = d.select(F.explode(T.ws_tokens(F.col("text"))).alias("w"))
    big = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c12"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    tot = (big.agg(F.sum("c12").cast("double").alias("b"))
           .crossJoin(uni.agg(F.sum("c1").cast("double").alias("n"))))
    u1 = uni.select(F.col("w").alias("__w1k"), F.col("c1").alias("c1a"))
    u2 = uni.select(F.col("w").alias("__w2k"), F.col("c1").alias("c1b"))
    scored = (big.where(F.col("c12") >= 5)
              .withColumn("w1", F.split(F.col("g"), " ").getItem(0))
              .withColumn("w2", F.split(F.col("g"), " ").getItem(1))
              .join(F.broadcast(u1), F.col("w1") == F.col("__w1k"))
              .join(F.broadcast(u2), F.col("w2") == F.col("__w2k"))
              .crossJoin(F.broadcast(tot))
              .select(
                  "w1", "w2", F.col("c12").cast("bigint").alias("c12"),
                  F.round(F.log((F.col("c12") / F.col("b"))
                                / ((F.col("c1a") / F.col("n"))
                                   * (F.col("c1b") / F.col("n")))), 6)
                   .alias("pmi")))
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(50)


@register(
    "text_unigram_kl_by_source",
    oracle=r"""
WITH tok AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
), sw AS (
  SELECT source, w, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY source, w
), vocab AS (
  SELECT w, CAST(SUM(c) AS DOUBLE) AS c_all FROM sw GROUP BY w
), srcs AS (
  SELECT source, CAST(SUM(c) AS DOUBLE) AS n_src FROM sw GROUP BY source
), tot AS (
  SELECT CAST(SUM(c_all) AS DOUBLE) AS n_all,
         CAST(COUNT(*) AS DOUBLE) AS v FROM vocab
), cells AS (
  SELECT s.source,
         (COALESCE(c.c, 0.0) + 0.5) / (s.n_src + 0.5 * t.v) AS p,
         ((vb.c_all - COALESCE(c.c, 0.0)) + 0.5)
           / ((t.n_all - s.n_src) + 0.5 * t.v) AS q
  FROM srcs s CROSS JOIN vocab vb CROSS JOIN tot t
  LEFT JOIN sw c ON c.source = s.source AND c.w = vb.w
)
SELECT source,
       ROUND(SUM(p * ln(p / q)), 6) AS kl_vs_rest
FROM cells GROUP BY source ORDER BY source
""",
    doc="Per-source unigram KL divergence vs the rest of the corpus — "
        "the 'which source is linguistically off-distribution' monitor "
        "(the token-level sibling of the length-bin PSI drift entry).  "
        "Laplace-0.5 smoothing over the shared vocabulary keeps both "
        "distributions strictly positive, absent words included (the "
        "srcs × vocab cross join materializes |S|·|V| cells — sources "
        "are few by construction, so this stays vocabulary-sized at "
        "any corpus scale).  One (source, token) count shuffle feeds "
        "everything; identical smoothed doubles on both engines.",
    tags=("text", "monitoring"),
)
def text_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sw = (d.select("source", F.explode(T.ws_tokens(F.col("text"))).alias("w"))
          .groupBy("source", "w")
          .agg(F.count(F.lit(1)).cast("double").alias("c")))
    vocab = sw.groupBy("w").agg(F.sum("c").alias("c_all"))
    srcs = sw.groupBy("source").agg(F.sum("c").alias("n_src"))
    tot = vocab.agg(F.sum("c_all").alias("n_all"),
                    F.count(F.lit(1)).cast("double").alias("v"))
    cells = (srcs.crossJoin(vocab).crossJoin(F.broadcast(tot))
             .join(sw, ["source", "w"], "left")
             .select(
                 "source",
                 ((F.coalesce(F.col("c"), F.lit(0.0)) + 0.5)
                  / (F.col("n_src") + 0.5 * F.col("v"))).alias("p"),
                 (((F.col("c_all") - F.coalesce(F.col("c"), F.lit(0.0)))
                   + 0.5)
                  / ((F.col("n_all") - F.col("n_src"))
                     + 0.5 * F.col("v"))).alias("q")))
    return (cells.groupBy("source")
            .agg(F.round(F.sum(F.col("p")
                               * F.log(F.col("p") / F.col("q"))), 6)
                 .alias("kl_vs_rest"))
            .orderBy("source"))


_BM25_TERMS = "['table', 'spark', 'merge']"


@register(
    "text_bm25_topk",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS len FROM tok GROUP BY doc_id
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(len) / COUNT(*) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS f
  FROM tok WHERE list_contains({_BM25_TERMS}, term)
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM tok WHERE list_contains({_BM25_TERMS}, term)
  GROUP BY term
), parts AS (
  SELECT tf.doc_id,
         ROUND(ln((s.n - df + 0.5) / (df + 0.5) + 1.0)
               * (f * 2.2)
               / (f + 1.2 * (0.25 + 0.75 * dl.len / s.avgdl)), 10)
           AS part
  FROM tf JOIN dfreq USING (term)
  JOIN dl USING (doc_id) CROSS JOIN stats s
), scored AS (
  SELECT doc_id, ROUND(SUM(part), 6) AS bm25 FROM parts GROUP BY doc_id
)
SELECT doc_id, bm25,
       CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank
FROM scored QUALIFY rank <= 20
""",
    doc="Okapi BM25 ranking (k1=1.2, b=0.75) of the corpus against a "
        "fixed query-term set — THE classical retrieval scorer and the "
        "lexical half of every hybrid search stack (tf saturation + "
        "length normalization, which plain tf-idf lacks).  Per-term "
        "parts round to 10 digits before the per-doc sum so the "
        "engines' 3-term addition order can't flip the 6-digit score.  "
        "Scale shape: the query-term filter prunes the (doc, term) "
        "shuffle to matching rows only; document-frequency and "
        "corpus-stats sides broadcast; top-20 is a TakeOrdered.",
    tags=("text",),
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    terms = ["table", "spark", "merge"]
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id",
                    F.explode(T.ws_tokens(F.col("text"))).alias("term"))
    dl = (toks.groupBy("doc_id")
          .agg(F.count(F.lit(1)).cast("double").alias("len")))
    stats = dl.agg(F.count(F.lit(1)).cast("double").alias("n"),
                   (F.sum("len") / F.count(F.lit(1))).alias("avgdl"))
    qtoks = toks.where(F.col("term").isin(terms))
    tf = (qtoks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("double").alias("f")))
    dfreq = (qtoks.select("doc_id", "term").distinct()
             .groupBy("term")
             .agg(F.count(F.lit(1)).cast("double").alias("df")))
    parts = (tf.join(F.broadcast(dfreq), "term")
             .join(dl, "doc_id")
             .crossJoin(F.broadcast(stats))
             .select("doc_id", F.round(
                 F.log((F.col("n") - F.col("df") + 0.5)
                       / (F.col("df") + 0.5) + 1.0)
                 * (F.col("f") * 2.2)
                 / (F.col("f") + 1.2 * (0.25 + 0.75 * F.col("len")
                                        / F.col("avgdl"))), 10)
                 .alias("part")))
    scored = (parts.groupBy("doc_id")
              .agg(F.round(F.sum("part"), 6).alias("bm25")))
    from ..operators.ranking import topk_with_rank
    # TakeOrdered prunes per partition BEFORE the k-row rank window —
    # the rank-then-filter window form would shuffle every doc to one
    # partition (operators/ranking.py)
    return topk_with_rank(
        scored, [F.col("bm25").desc(), F.col("doc_id")], 20)


@register(
    "text_lexical_diversity",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_types,
       ROUND(len(list_distinct(t)) * 1.0 / len(t), 6) AS type_token_ratio,
       CAST(len(list_filter(list_distinct(t),
              w -> len(list_filter(t, x -> x = w)) = 1)) AS BIGINT)
         AS n_hapax
FROM tok
""",
    doc="Per-document lexical diversity: type-token ratio and "
        "hapax-legomena count — the doc-level repetitiveness signal "
        "(a TTR near zero is a token loop; corpus-level twins live in "
        "text_vocab_stats).  Pure array expressions inside codegen, "
        "zero shuffles, zero explodes — the per-doc hapax count is a "
        "bounded nested filter over the distinct set, not a grouped "
        "aggregation.",
    tags=("text",),
)
def text_lexdiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = T.ws_tokens(F.col("text"))
    dt = F.array_distinct(t)
    hapax = F.size(F.filter(
        dt, lambda w: F.size(F.filter(t, lambda x: x == w)) == 1))
    return d.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.size(dt).cast("bigint").alias("n_types"),
        F.round(F.size(dt) * F.lit(1.0) / F.size(t), 6)
         .alias("type_token_ratio"),
        hapax.cast("bigint").alias("n_hapax"))


@register(
    "text_readability",
    oracle=r"""
WITH sig AS (
  SELECT lang,
         GREATEST(len(string_split_regex(trim(text), '\s+')), 1) AS w,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(CAST(w AS DOUBLE) / s), 4) AS avg_words_per_sentence,
       ROUND(AVG(CAST(syl AS DOUBLE) / w), 4) AS avg_syllables_per_word,
       ROUND(AVG(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                         - 84.6 * (CAST(syl AS DOUBLE) / w)), 4) AS avg_flesch
FROM sig
GROUP BY lang
ORDER BY lang
""",
    doc="Readability scoring (Flesch 1948 reading-ease form): words, "
        "terminal-punctuation sentence runs, vowel-group syllable proxy "
        "— the quality-scoring complement corpus curators bin documents "
        "by before mixing.  Pure projections + one agg; rides the scan "
        "at 100 TB. operators/text.py:readability.",
    tags=("text",),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sig = T.readability(F.col("text"))
    scored = docs.select(
        "lang",
        sig["n_words"].alias("w"),
        sig["n_sentences"].alias("s"),
        sig["n_syllables"].alias("syl"),
        sig["flesch"].alias("flesch"))
    return (scored.groupBy("lang")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.round(F.avg(F.col("w").cast("double") / F.col("s")), 4)
                  .alias("avg_words_per_sentence"),
                 F.round(F.avg(F.col("syl").cast("double") / F.col("w")), 4)
                  .alias("avg_syllables_per_word"),
                 F.round(F.avg("flesch"), 4).alias("avg_flesch"))
            .orderBy("lang"))


@register(
    "text_char_ngram_entropy",
    oracle=r"""
WITH grams AS (
  SELECT source, unnest(list_transform(range(1, length(text)),
                                       i -> text[i:i+1])) AS g
  FROM documents WHERE length(text) >= 2
), counts AS (
  SELECT source, g, CAST(COUNT(*) AS DOUBLE) AS c
  FROM grams GROUP BY source, g
), totals AS (
  SELECT source, SUM(c) AS n FROM counts GROUP BY source
)
SELECT c.source,
       CAST(t.n AS BIGINT) AS n_bigrams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(-SUM((c.c / t.n) * ln(c.c / t.n)) / ln(2), 6) AS entropy_bits
FROM counts c JOIN totals t ON t.source = c.source
GROUP BY c.source, t.n
ORDER BY c.source
""",
    doc="Character-bigram Shannon entropy per source — the cheap "
        "gibberish / encoding-anomaly / wrong-charset detector (natural "
        "language sits in a narrow entropy band; base64 blobs and "
        "mojibake jump out).  One (source, bigram) count shuffle + one "
        "per-source fold; bigram expansion is a codegen'd projection "
        "riding the scan.  Both engines compute the identical "
        "c/n·ln(c/n) doubles; ROUND(...,6) absorbs summation-order "
        "last-ulp noise (the KL/PMI entries' established recipe).",
    tags=("text", "monitoring"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").where(F.length("text") >= 2)
    grams = d.select(
        "source",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("text") - 1),
            lambda i: F.substring(F.col("text"), i, F.lit(2)))).alias("g"))
    counts = (grams.groupBy("source", "g")
              .agg(F.count(F.lit(1)).cast("double").alias("c")))
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (counts.join(totals, "source")
            .groupBy("source", "n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                 F.round(-F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 6)
                  .alias("entropy_bits"))
            .select("source", F.col("n").cast("bigint").alias("n_bigrams"),
                    "n_distinct", "entropy_bits")
            .orderBy("source"))


@register(
    "text_code_detection",
    oracle=r"""
WITH sig AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '[{}();=<>\[\]]'))
           * 1.0 / GREATEST(length(text), 1)          AS sym_density,
         len(regexp_extract_all(text,
             '\b(def|return|import|class|function|var|const|if|else|for|while)\b'))
           AS kw_hits,
         len(regexp_extract_all(text, '(^|\n)(    |\t)'))
           AS indented_lines,
         len(regexp_extract_all(text, '[a-z][A-Z]')) AS camel_humps
  FROM documents
), scored AS (
  SELECT doc_id, source,
         ROUND(sym_density, 6) AS sym_density,
         CAST(kw_hits AS BIGINT) AS kw_hits,
         CAST(indented_lines AS BIGINT) AS indented_lines,
         CAST(camel_humps AS BIGINT) AS camel_humps,
         (sym_density > 0.02 AND kw_hits >= 2)
           OR indented_lines >= 3
           OR (camel_humps >= 5 AND sym_density > 0.01) AS looks_like_code
  FROM sig
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN looks_like_code THEN 1 ELSE 0 END) AS BIGINT)
           AS n_code,
       ROUND(AVG(sym_density), 6) AS avg_sym_density,
       CAST(SUM(kw_hits) AS BIGINT) AS total_kw_hits
FROM scored
GROUP BY source
ORDER BY source
""",
    doc="Code-vs-prose detection — the curation split every mixed crawl "
        "needs before routing documents to code- or text-specific "
        "cleaning (heuristic: structural-symbol density, programming "
        "keywords, indented-line count, camelCase humps; thresholds "
        "are arbitrary-but-fixed, the contract is determinism).  Pure "
        "regex projections + one per-source agg — rides the scan. "
        "plans/text.py:text_code_detect.",
    tags=("text", "pipeline"),
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sym_density = (F.size(F.regexp_extract_all(
        F.col("text"), F.lit(r"[{}();=<>\[\]]"), 0))
        / F.greatest(F.length("text"), F.lit(1)))
    kw = F.size(F.regexp_extract_all(
        F.col("text"),
        F.lit(r"\b(def|return|import|class|function|var|const|if|else|for|while)\b"),
        0))
    indented = F.size(F.regexp_extract_all(
        F.col("text"), F.lit("(^|\n)(    |\t)"), 0))
    humps = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(r"[a-z][A-Z]"), 0))
    looks = (((sym_density > 0.02) & (kw >= 2))
             | (indented >= 3)
             | ((humps >= 5) & (sym_density > 0.01)))
    return (d.select("source", sym_density.alias("sd"), kw.alias("kw"),
                     looks.alias("looks"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(F.col("looks").cast("int")).cast("bigint")
                  .alias("n_code"),
                 F.round(F.avg("sd"), 6).alias("avg_sym_density"),
                 F.sum("kw").cast("bigint").alias("total_kw_hits"))
            .orderBy("source"))


def _bpe_oracle(n_merges: int = 10) -> str:
    """Unrolled-CTE mirror of operators/text.py:bpe_merge_table — the
    same (word, freq) base, and per round the same pair count, the same
    (freq DESC, pair ASC) argmax, and the same left-to-right literal
    replace() merge, so the ledger agrees row-for-row."""
    sql = """WITH w0 AS MATERIALIZED (
  SELECT concat(array_to_string(regexp_extract_all(w, '[a-z]'), ' '),
                ' </w>') AS s,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
  WHERE length(w) > 0 AND length(w) <= 40
  GROUP BY w
)"""
    for r in range(1, n_merges + 1):
        sql += f""", p{r} AS MATERIALIZED (
  SELECT arr[k] || ' ' || arr[k + 1] AS pair, freq
  FROM (SELECT string_split(s, ' ') AS arr, freq FROM w{r - 1}),
       range(1, 61) t(k)
  WHERE k < len(arr)
), b{r} AS MATERIALIZED (
  SELECT pair, replace(pair, ' ', '') AS merged,
         CAST(SUM(freq) AS BIGINT) AS f
  FROM p{r} GROUP BY pair ORDER BY f DESC, pair LIMIT 1
), w{r} AS MATERIALIZED (
  SELECT trim(replace(' ' || s || ' ', ' ' || b.pair || ' ',
                      ' ' || b.merged || ' ')) AS s, freq
  FROM w{r - 1}, b{r} b
)"""
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS round, pair, merged, f AS freq FROM b{r}"
        for r in range(1, n_merges + 1))
    return sql + "\n" + unions + "\nORDER BY round"


@register(
    "text_bpe_train_merges",
    oracle=_bpe_oracle(10),
    doc="BPE tokenizer TRAINING (Sennrich 2016): ten rounds of "
        "most-frequent adjacent-symbol-pair merging over the corpus "
        "vocabulary, emitting the learned merge table — the artifact a "
        "tokenizer ships, here produced by the cluster itself.  State "
        "is the distinct-word table (vocab-sized; the corpus collapses "
        "to (word, freq) once); each round is one keyed count + one "
        "projection, only the 1-row argmax reaches the driver.  The "
        "oracle unrolls the identical ten rounds as chained CTEs "
        "(pagerank's pattern) — same base, same tie-breaks, same "
        "left-to-right replace() merge — so every learned pair, its "
        "merged symbol, and its frequency hash-match. "
        "operators/text.py:bpe_merge_table.",
    tags=("text", "pipeline"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return T.bpe_merge_table(docs, n_merges=10)


@register(
    "text_bpe_compression",
    oracle=_bpe_oracle(10).replace(
        "\nUNION ALL\n".join(
            f"SELECT CAST({r} AS INT) AS round, pair, merged, f AS freq "
            f"FROM b{r}" for r in range(1, 11)) + "\nORDER BY round",
        """SELECT
  (SELECT CAST(SUM(len(string_split(s, ' ')) * freq) AS BIGINT) FROM w0)
      AS symbols_before,
  (SELECT CAST(SUM(len(string_split(s, ' ')) * freq) AS BIGINT) FROM w10)
      AS symbols_after,
  (SELECT ROUND(1.0 - SUM(len(string_split(s, ' ')) * freq) * 1.0
                / (SELECT SUM(len(string_split(s, ' ')) * freq) FROM w0),
                6) FROM w10) AS compression,
  (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT)
   FROM (SELECT unnest(string_split(s, ' ')) AS sym FROM w10))
      AS vocab_symbols"""),
    doc="What the learned BPE vocabulary BUYS: total corpus symbol "
        "count before vs after applying the 10 trained merges, the "
        "compression fraction, and the resulting symbol-vocabulary "
        "size — the train-then-measure loop a tokenizer team runs.  "
        "Reuses the exact training rounds (same oracle CTE chain as "
        "text_bpe_train_merges, different final projection); the Spark "
        "side measures the trainer's actual final state, so the hash "
        "pins training AND application end-to-end. "
        "operators/text.py:bpe_merge_table(return_state=True).",
    tags=("text", "pipeline"),
)
def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    _ledger, state = T.bpe_merge_table(docs, n_merges=10,
                                       return_state=True)
    n_sym = F.size(F.split("s", " "))
    before = (docs.select(F.explode(
                 F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w"))
              .where((F.length("w") > 0) & (F.length("w") <= 40))
              .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
              .select(F.sum((F.length("w") + 1) * F.col("freq"))
                      .cast("bigint").alias("symbols_before")))
    after = state.select(
        F.sum(n_sym * F.col("freq")).cast("bigint").alias("symbols_after"))
    vocab = (state.select(F.explode(F.split("s", " ")).alias("sym"))
             .agg(F.countDistinct("sym").cast("bigint")
                  .alias("vocab_symbols")))
    return (before.crossJoin(after).crossJoin(vocab)
            .select("symbols_before", "symbols_after",
                    F.round(1.0 - F.col("symbols_after")
                            / F.col("symbols_before"), 6)
                     .alias("compression"),
                    "vocab_symbols")
            .select("symbols_before", "symbols_after", "compression",
                    "vocab_symbols"))


@register(
    "text_bpe_encode",
    oracle=_bpe_oracle(10).replace(
        "\nUNION ALL\n".join(
            f"SELECT CAST({r} AS INT) AS round, pair, merged, f AS freq "
            f"FROM b{r}" for r in range(1, 11)) + "\nORDER BY round",
        """SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_word_types,
       CAST(SUM(freq) AS BIGINT) AS n_words,
       CAST(SUM(freq * n_sym) AS BIGINT) AS n_tokens,
       ROUND(SUM(freq * n_sym) * 1.0 / SUM(freq), 6) AS tokens_per_word
FROM (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents)
      WHERE length(w) > 0 AND length(w) <= 40
      GROUP BY source, w) ps
JOIN (SELECT replace(replace(s, ' ', ''), '</w>', '') AS w,
             len(string_split(s, ' ')) AS n_sym
      FROM w10) seg USING (w)
GROUP BY source
ORDER BY source"""),
    doc="BPE tokenizer APPLICATION — the natural twin of the training "
        "flagship: tokenize the corpus with the learned merge table and "
        "account tokens per source (word types, words, tokens, "
        "tokens-per-word).  A user trains merges precisely to apply "
        "them; this entry pins the apply path.  Encoding rides the "
        "TRAINED STATE itself: the final state table IS every distinct "
        "word's segmentation under the full merge sequence, so apply = "
        "one vocab-sized equi-join from the per-(source, word) counts "
        "to the segmentations (the original word reconstructs from the "
        "segmentation by dropping spaces and the </w> marker) — the "
        "corpus is never re-scanned per merge round.  The oracle reuses "
        "the training chain's final CTE state (same rounds, same "
        "tie-breaks) and joins identically, so the hash pins train AND "
        "encode end-to-end.  operators/text.py:bpe_merge_table.",
    tags=("text", "pipeline"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    _ledger, state = T.bpe_merge_table(docs, n_merges=10,
                                       return_state=True)
    seg = state.select(
        F.replace(F.replace(F.col("s"), F.lit(" "), F.lit("")),
                  F.lit("</w>"), F.lit("")).alias("w"),
        F.size(F.split("s", " ")).alias("n_sym"))
    per_src = (docs.select(
                  "source",
                  F.explode(F.split(F.lower(F.col("text")),
                                    "[^a-z]+")).alias("w"))
               .where((F.length("w") > 0) & (F.length("w") <= 40))
               .groupBy("source", "w")
               .agg(F.count(F.lit(1)).cast("bigint").alias("freq")))
    return (per_src.join(seg, "w")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_word_types"),
                 F.sum("freq").cast("bigint").alias("n_words"),
                 F.sum(F.col("freq") * F.col("n_sym")).cast("bigint")
                  .alias("n_tokens"))
            .select("source", "n_word_types", "n_words", "n_tokens",
                    F.round(F.col("n_tokens") / F.col("n_words"), 6)
                     .alias("tokens_per_word"))
            .orderBy("source"))


@register(
    "text_rake_keywords",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS t
  FROM documents
), pos AS (
  SELECT doc_id, z.w, z.i,
         z.w IN ('the','a','an','and','or','of','to','in','is','it',
                 'that','for','on','with','as','are','was','at','by',
                 'be') AS is_stop
  FROM tok, LATERAL (SELECT unnest(t) AS w,
                            unnest(range(1, len(t) + 1)) AS i) z
  WHERE length(z.w) > 0
), marked AS (
  SELECT doc_id, i, w, is_stop,
         SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS pid
  FROM pos
), pw AS (
  SELECT doc_id, i, w, pid,
         COUNT(*) OVER (PARTITION BY doc_id, pid) AS plen
  FROM marked WHERE NOT is_stop
), stats AS (
  SELECT w, COUNT(*) AS freq, SUM(plen) AS degree FROM pw GROUP BY w
), wscore AS (
  SELECT w, CAST(ROUND(degree * 1000000.0 / freq) AS BIGINT) AS ws_micro
  FROM stats
), phrases AS (
  SELECT doc_id, pid,
         string_agg(w, ' ' ORDER BY i) AS phrase,
         SUM(ws_micro) AS score_micro,
         COUNT(*) AS n_words
  FROM pw JOIN wscore USING (w)
  GROUP BY doc_id, pid
), agg AS (
  SELECT phrase,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         MAX(score_micro) AS score_micro,
         CAST(MAX(n_words) AS INT) AS n_words
  FROM phrases GROUP BY phrase
), ranked AS (
  SELECT phrase, score_micro, n_words, n_occurrences,
         ROW_NUMBER() OVER (ORDER BY score_micro DESC, phrase) AS rank
  FROM agg
)
SELECT phrase, ROUND(score_micro / 1000000.0, 4) AS rake_score,
       n_words, n_occurrences, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank
""",
    doc="RAKE keyword extraction (Rose et al. 2010): corpus top-10 "
        "candidate phrases (maximal stopword-free runs) scored by "
        "summed word degree/frequency.  Phrase splitting is "
        "array-position based — posexplode + a running stopword-count "
        "window as the phrase id — because regex lookarounds differ "
        "across engines and replace-based splitting breaks on "
        "multi-stopword runs.  Word scores travel as integer "
        "micro-units (degree and freq are exact ints), so phrase "
        "scores are order-independent integer sums on both engines. "
        "operators/text.py:rake_keywords.",
    tags=("text", "pipeline"),
)
def text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.rake_keywords(table(spark, sf_dir, "documents"), k=10)


@register(
    "sketch_bloom_fpr_calibration",
    oracle=r"""
WITH members AS (
  SELECT DISTINCT o_custkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT'
), bloom AS (
  SELECT DISTINCT kk,
         CAST(('0x' || substr(md5('cm' || CAST(kk AS VARCHAR) || '|'
                              || CAST(k AS VARCHAR)),
                              1, 8))::UBIGINT % 4096 AS BIGINT) AS bit
  FROM members CROSS JOIN (SELECT unnest([0,1,2,3]) AS kk)
), non_members AS (
  SELECT c_custkey FROM customer
  WHERE c_custkey NOT IN (SELECT k FROM members)
), probe AS (
  SELECT c_custkey, kk,
         CAST(('0x' || substr(md5('cm' || CAST(kk AS VARCHAR) || '|'
                              || CAST(c_custkey AS VARCHAR)),
                              1, 8))::UBIGINT % 4096 AS BIGINT) AS bit
  FROM non_members CROSS JOIN (SELECT unnest([0,1,2,3]) AS kk)
), verdicts AS (
  SELECT c_custkey,
         (COUNT(*) FILTER (WHERE b.bit IS NOT NULL) = 4) AS fp
  FROM probe p
  LEFT JOIN bloom b ON b.kk = p.kk AND b.bit = p.bit
  GROUP BY c_custkey
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
       CAST(COUNT(*) AS BIGINT) AS n_non_member_probes,
       CAST(SUM(CASE WHEN fp THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_positives,
       SUM(CASE WHEN fp THEN 1 ELSE 0 END) / (COUNT(*) * 1.0)
           AS measured_fpr
FROM verdicts
""",
    doc="Bloom-filter FALSE-POSITIVE-RATE calibration: probe the k=4 x "
        "m=4096 filter (built over urgent-order customers) with every "
        "customer key that is provably NOT a member and report the "
        "measured FPR beside the exact member/probe counts — the "
        "measured counterpart of the analytic bound (1-e^{-kn/m})^k, "
        "which stays in this docstring rather than the hashed result "
        "because exp() is not bit-specified across engines.  No false "
        "negatives is a THEOREM for Bloom filters; the FPR is the "
        "empirical half every capacity plan needs measured, not "
        "assumed.  Deterministic md5 bits end-to-end; the rate is a "
        "ratio of identical integers. "
        "operators/countmin.py:bloom_build/bloom_probe.",
    tags=("sketch", "approx", "eval"),
)
def sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import countmin as CM
    orders = table(spark, sf_dir, "orders")
    members = (orders.where(F.col("o_orderpriority") == "1-URGENT")
               .select(F.col("o_custkey")).distinct())
    bloom = CM.bloom_build(
        orders.where(F.col("o_orderpriority") == "1-URGENT"), "o_custkey")
    non_members = (table(spark, sf_dir, "customer")
                   .select("c_custkey")
                   .join(members,
                         F.col("c_custkey") == F.col("o_custkey"),
                         "left_anti"))
    verdicts = CM.bloom_probe(bloom, non_members, "c_custkey")
    n_members = members.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"))
    return (n_members.crossJoin(
        verdicts.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_non_member_probes"),
            F.sum(F.col("maybe_present").cast("int")).cast("bigint")
             .alias("n_false_positives"),
            (F.sum(F.col("maybe_present").cast("int"))
             / (F.count(F.lit(1)) * F.lit(1.0))).alias("measured_fpr"))))


@register(
    "text_term_burstiness",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
  FROM documents
), per_doc AS (
  SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS x
  FROM tok GROUP BY t, doc_id
), stats AS (
  SELECT t,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM per_doc GROUP BY t
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
top AS (
  SELECT t, s1, s2, df FROM stats ORDER BY s1 DESC, t LIMIT 20
)
SELECT t AS term, s1 AS total_count, df AS doc_freq,
       CAST(n.n * s2 - s1 * s1 AS DOUBLE) / (n.n * s1) AS vmr
FROM top, n
ORDER BY total_count DESC, term
""",
    doc="Term burstiness audit: variance-to-mean ratio (Fisher "
        "dispersion index) of per-doc counts for the 20 most frequent "
        "whitespace tokens, zeros included — VMR ~ 1 flags Poisson-"
        "scattered function words, VMR >> 1 flags bursty content/"
        "boilerplate terms that concentrate in few docs (the signal "
        "behind stopword lists and template detection; Church & Gale "
        "1995).  Population VMR = (N·Σx² − (Σx)²)/(N·Σx) — one float "
        "expression over three exact integers per term, zero-count "
        "docs contributing only through N, so no sparse-row "
        "materialization and the report is bit-exact.  Scale: one "
        "(term, doc) keyed count + one term rollup; the top-k is a "
        "global WindowGroupLimit-eligible sort over the term table. "
        "plans/text.py:text_burstiness.",
    tags=("text",),
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_docs = d.count()
    per_doc = (d.select("doc_id",
                        F.explode(T.ws_tokens(F.col("text"))).alias("t"))
               .groupBy("t", "doc_id")
               .agg(F.count(F.lit(1)).cast("bigint").alias("x")))
    stats = (per_doc.groupBy("t")
             .agg(F.sum("x").cast("bigint").alias("s1"),
                  F.sum(F.col("x") * F.col("x")).cast("bigint")
                   .alias("s2"),
                  F.count(F.lit(1)).cast("bigint").alias("df")))
    top = stats.orderBy(F.col("s1").desc(), "t").limit(20)
    vmr = ((F.lit(n_docs) * F.col("s2") - F.col("s1") * F.col("s1"))
           .cast("double") / (F.lit(n_docs) * F.col("s1")))
    return (top.select(F.col("t").alias("term"),
                       F.col("s1").alias("total_count"),
                       F.col("df").alias("doc_freq"),
                       vmr.alias("vmr"))
            .orderBy(F.col("total_count").desc(), "term"))


@register(
    "sketch_countmin_heavy_hitters",
    oracle=r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS v FROM documents
), exact_ AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY v
), top AS (
  SELECT v, c FROM exact_
  QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, v) <= 20
), sketch AS (
  SELECT d,
         CAST(('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || '|' || v),
                              1, 8))::UBIGINT % 256 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM tok CROSS JOIN (SELECT unnest([0,1,2,3]) AS d)
  GROUP BY 1, 2
)
SELECT t.v AS token, t.c AS exact_c,
       CAST(MIN(s.c) AS BIGINT) AS est_c,
       CAST(MIN(s.c) - t.c AS BIGINT) AS overest
FROM top t
CROSS JOIN (SELECT unnest([0,1,2,3]) AS d) dd
JOIN sketch s
  ON s.d = dd.d
 AND s.bucket = CAST(('0x' || substr(md5('cm' || CAST(dd.d AS VARCHAR)
                                     || '|' || t.v), 1, 8))::UBIGINT
                     % 256 AS BIGINT)
GROUP BY 1, 2
ORDER BY exact_c DESC, token
""",
    doc="Heavy hitters through the count-min sketch: the exact top-20 "
        "tokens (deterministic tie-break) probed against the 4x256 "
        "md5-bucket sketch, reporting estimate and overestimate per "
        "hitter — the accuracy readout that decides whether a sketch "
        "deployment's width is adequate (CM never underestimates; "
        "overest <= n/width w.h.p.).  Bit-for-bit oracled: both the "
        "sketch cells and the min-probe compute identically in DuckDB. "
        "Scale: exact counts are one token shuffle; top-20 is a "
        "TakeOrdered; the probe broadcasts the d*w sketch, never "
        "shuffling the hitters. operators/countmin.py:countmin_"
        "estimate.",
    tags=("text", "sketch", "approx"),
)
def sketch_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import countmin as CM
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.ws_tokens(F.col("text"))).alias("v"))
    exact = (toks.groupBy("v")
             .agg(F.count(F.lit(1)).cast("bigint").alias("exact_c")))
    top = exact.orderBy(F.col("exact_c").desc(), "v").limit(20)
    sketch = CM.countmin_sketch(toks, "v", depth=4, width=256)
    est = CM.countmin_estimate(sketch, top, "v", depth=4, width=256)
    return (top.join(est, "v")
            .select(F.col("v").alias("token"), "exact_c",
                    F.col("cm_estimate").alias("est_c"),
                    (F.col("cm_estimate") - F.col("exact_c"))
                    .cast("bigint").alias("overest"))
            .orderBy(F.col("exact_c").desc(), "token"))


@register(
    "text_tokenizer_fertility",
    oracle=r"""
WITH per_doc AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             AS n_words,
         CAST(len(regexp_extract_all(text, '\w{1,4}|[^\w\s]')) AS BIGINT)
             AS n_subwords
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_subwords) AS BIGINT) AS total_subwords,
       ROUND(SUM(n_subwords) * 1.0 / GREATEST(SUM(n_words), 1), 6)
           AS fertility
FROM per_doc GROUP BY lang ORDER BY lang
""",
    doc="Tokenizer fertility by language: subword units per whitespace "
        "word (the multilingual-tokenizer quality metric — high "
        "fertility means a language pays more sequence length per word "
        "and trains worse; the readout that drives vocabulary "
        "rebalancing alongside the temperature-mixture entry).  Uses "
        "the same BPE-ish subword regex as text_token_counts so the "
        "two entries cannot drift.  Exact integer sums, one ratio per "
        "language; a single (lang) partial-agg shuffle. "
        "operators/text.py:subword_count,token_count.",
    tags=("text", "pipeline"),
)
def text_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per = d.select("lang",
                   T.token_count(F.col("text")).cast("bigint")
                    .alias("n_words"),
                   T.subword_count(F.col("text")).cast("bigint")
                    .alias("n_subwords"))
    return (per.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_words").cast("bigint").alias("total_words"),
                 F.sum("n_subwords").cast("bigint")
                  .alias("total_subwords"),
                 F.round(F.sum("n_subwords")
                         / F.greatest(F.sum("n_words"), F.lit(1)), 6)
                  .alias("fertility"))
            .orderBy("lang"))


@register(
    "text_hapax_ratio_by_source",
    oracle=r"""
WITH tok AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
  FROM documents
), tf AS (
  SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
           AS hapax_ratio
FROM tf GROUP BY source ORDER BY source
""",
    doc="Hapax legomena ratio per source: the share of a feed's "
        "vocabulary that occurs exactly once — the lexical-diversity "
        "screen that separates organic text (high hapax mass, Zipf "
        "tail intact) from template/boilerplate feeds (tiny hapax "
        "share), read next to the Zipf and vocab-stats entries.  "
        "Exact counts, one ratio; two keyed partial-agg shuffles "
        "((source, term) then source), constant-width keys. "
        "plans/text.py:text_hapax_ratio.",
    tags=("text", "pipeline", "diagnostics"),
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tf = (d.select("source",
                   F.explode(T.ws_tokens(F.col("text"))).alias("t"))
          .groupBy("source", "t")
          .agg(F.count(F.lit(1)).alias("c")))
    return (tf.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                  .cast("bigint").alias("n_hapax"),
                 F.round(F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                         * F.lit(1.0) / F.count(F.lit(1)), 6)
                  .alias("hapax_ratio"))
            .orderBy("source"))


@register(
    "text_ngram_novelty_by_batch",
    oracle=r"""
WITH m AS (
  SELECT MAX(doc_id) + 1 AS mx1 FROM documents
), d AS (
  SELECT CAST((doc_id * 10) // mx1 AS INT) AS batch,
         string_split_regex(text, '\s+') AS t
  FROM documents, m
), bg AS (
  SELECT DISTINCT batch, g
  FROM d, UNNEST(CASE WHEN len(t) >= 3 THEN
      list_distinct(list_transform(range(1, len(t) - 1),
        i -> array_to_string(t[i:i+2], ' ')))
      ELSE CAST([] AS VARCHAR[]) END) u(g)
), fb AS (
  SELECT g, MIN(batch) AS first_batch FROM bg GROUP BY g
)
SELECT bg.batch,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN fb.first_batch = bg.batch
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       ROUND(SUM(CASE WHEN fb.first_batch = bg.batch
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS novelty_rate
FROM bg JOIN fb USING (g)
GROUP BY bg.batch ORDER BY bg.batch
""",
    doc="Content-novelty decay across ingestion batches: the corpus is "
        "split into 10 arrival batches (doc_id deciles — the synthetic "
        "arrival axis), every 3-gram shingle gets a first-seen batch "
        "(one min-agg), and each batch reports how many of its distinct "
        "shingles are NEW vs recycled — the crawl-saturation curve a "
        "data-acquisition team watches: when novelty_rate flattens, "
        "another crawl of the same sources buys nothing.  Shape: one "
        "scan → (batch, shingle) distinct → min-agg + keyed join, all "
        "partial-aggregable; shingles stay strings here for the "
        "cross-engine oracle (scale swap: xxhash64 longs, the "
        "dedup-module convention).  Exact integer counts. "
        "plans/text.py:text_ngram_novelty_by_batch.",
    tags=("text", "pipeline"),
)
def text_ngram_novelty_by_batch(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from ..operators.materialize import materialize
    docs = table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    toks = F.split(F.col("text"), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - 3)
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 3),
                                                " ")))
    grams = F.when(F.size(toks) >= 3, grams) \
             .otherwise(F.array().cast("array<string>"))
    bg = (docs.select(
              F.expr(f"CAST((doc_id * 10) div {max_id + 1} AS INT)")
               .alias("batch"),
              F.explode(grams).alias("g"))
          .distinct().transform(materialize))
    fb = bg.groupBy("g").agg(F.min("batch").alias("first_batch"))
    new = F.sum(F.when(F.col("first_batch") == F.col("batch"), 1)
                .otherwise(0))
    return (bg.join(fb, "g")
            .groupBy("batch")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                 new.cast("bigint").alias("n_new"),
                 F.round(new / F.count(F.lit(1)), 6).alias("novelty_rate"))
            .orderBy("batch"))


@register(
    "text_mattr_lexical_diversity",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(text, '\s+') AS t
  FROM documents
), wins AS (
  SELECT doc_id, source,
         list_transform(range(1, len(t) - 50 + 2, 25),
                        i -> len(list_distinct(t[i:i+49]))) AS d
  FROM toks WHERE len(t) >= 50
), per_doc AS (
  SELECT source,
         CAST(len(d) AS BIGINT) AS n_windows,
         CAST(list_reduce(list_prepend(0, d), (a, x) -> a + x)
              AS BIGINT) AS sum_distinct
  FROM wins
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_windows) AS BIGINT) AS n_windows,
       CAST(SUM(sum_distinct) AS BIGINT) AS sum_distinct,
       ROUND(SUM(sum_distinct) * 1.0 / (SUM(n_windows) * 50), 6)
         AS mattr
FROM per_doc GROUP BY source ORDER BY source
""",
    doc="MATTR lexical diversity (Covington & McFall 2010: moving-"
        "average type-token ratio — the length-INVARIANT diversity "
        "measure; plain TTR collapses as documents grow, which is why "
        "corpus-quality dashboards use windowed variants): distinct-"
        "type counts over 50-token windows strided by 25, per source.  "
        "Everything stays integer until ONE final ratio (sum of "
        "distinct counts / windows*50), so the report hash-checks "
        "exactly; the window transform is a pure codegen array "
        "expression — zero explode, zero shuffle before the per-source "
        "partial agg.  Complements text_hapax_ratio_by_source (rare-"
        "type mass) and text_char_ngram_entropy (character diversity). "
        "plans/text.py:text_mattr_lexical_diversity.",
    tags=("text", "pipeline"),
)
def text_mattr_lexical_diversity(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    W, S = 50, 25
    docs = table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), r"\s+")
    starts = F.sequence(F.lit(0), F.size(t) - W, F.lit(S))
    d = F.transform(starts,
                    lambda i: F.size(F.array_distinct(
                        F.slice(t, i + 1, W))))
    per = (docs.where(F.size(t) >= W)
           .select("source",
                   F.size(d).cast("bigint").alias("n_windows"),
                   F.aggregate(d, F.lit(0),
                               lambda a, x: a + x).cast("bigint")
                    .alias("sum_distinct")))
    return (per.groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_windows").cast("bigint").alias("n_windows"),
                 F.sum("sum_distinct").cast("bigint")
                  .alias("sum_distinct"),
                 F.round(F.sum("sum_distinct")
                         / (F.sum("n_windows") * W), 6).alias("mattr"))
            .orderBy("source"))


@register(
    "text_simpsons_diversity",
    oracle=r"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
  FROM documents
), per AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE tok <> '' GROUP BY source, tok
), agg AS (
  SELECT source,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(cnt * (cnt - 1)) AS BIGINT) AS pair_hits
  FROM per GROUP BY source
)
SELECT source, n_tokens, n_types,
       ROUND(CAST(pair_hits AS DOUBLE)
             / CAST(n_tokens * (n_tokens - 1) AS DOUBLE), 6)
         AS simpson_lambda,
       ROUND(CAST(1.0 AS DOUBLE)
             - CAST(pair_hits AS DOUBLE)
               / CAST(n_tokens * (n_tokens - 1) AS DOUBLE), 6)
         AS gini_simpson
FROM agg ORDER BY source
""",
    doc="Simpson's diversity index per source (Simpson, Nature 1948): "
        "λ = Σ_w n_w(n_w−1) / N(N−1) is the probability two tokens "
        "drawn WITHOUT replacement are the same type; 1−λ "
        "(Gini-Simpson) is the de-facto corpus-concentration gauge — "
        "the dominance-weighted complement of MATTR/hapax richness "
        "(a source can have high type count yet tiny diversity when "
        "one template token dominates; λ catches exactly that).  "
        "Numerator and denominator stay exact integers through the "
        "two-level aggregate (token counts < 2^26 at any SF here, so "
        "n_w(n_w−1) sums stay < 2^53); ONE float division at the end, "
        "rounded identically on both engines.  Scale: explode + two "
        "keyed partial-aggregates — shuffle rows ≈ distinct (source, "
        "token) pairs, never positions.",
    tags=("text",),
)
def text_simpsons_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = (docs.select("source",
                        F.explode(F.split(F.col("text"), r"\s+"))
                         .alias("tok"))
            .where(F.col("tok") != ""))
    per = (toks.groupBy("source", "tok")
           .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    agg = (per.groupBy("source")
           .agg(F.sum("cnt").cast("bigint").alias("n_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("n_types"),
                F.sum(F.col("cnt") * (F.col("cnt") - 1)).cast("bigint")
                 .alias("pair_hits")))
    lam = (F.col("pair_hits").cast("double")
           / (F.col("n_tokens") * (F.col("n_tokens") - 1)).cast("double"))
    return (agg.select("source", "n_tokens", "n_types",
                       F.round(lam, 6).alias("simpson_lambda"),
                       F.round(F.lit(1.0) - lam, 6).alias("gini_simpson"))
            .orderBy("source"))


@register(
    "text_cross_source_bleu",
    oracle=r"""
WITH toks AS (
  SELECT source AS src, unnest(string_split_regex(trim(text), '\s+')) AS g
  FROM documents
), uni AS (
  SELECT src, g, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE g <> '' GROUP BY src, g
), bi_raw AS (
  SELECT src,
         unnest(CASE WHEN len(t) >= 2 THEN
           list_transform(range(1, len(t)),
                          i -> array_to_string(t[i:i+1], ' '))
         ELSE [] END) AS g
  FROM (SELECT source AS src, string_split_regex(trim(text), '\s+') AS t
        FROM documents)
), bi AS (
  SELECT src, g, CAST(COUNT(*) AS BIGINT) AS c
  FROM bi_raw GROUP BY src, g
), uni_tot AS (
  SELECT src, CAST(SUM(c) AS BIGINT) AS t FROM uni GROUP BY src
), bi_tot AS (
  SELECT src, CAST(SUM(c) AS BIGINT) AS t FROM bi GROUP BY src
), uni_clip AS (
  SELECT a.src AS src_a, b.src AS src_b,
         CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS clip
  FROM uni a JOIN uni b ON a.g = b.g AND a.src <> b.src
  GROUP BY a.src, b.src
), bi_clip AS (
  SELECT a.src AS src_a, b.src AS src_b,
         CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS clip
  FROM bi a JOIN bi b ON a.g = b.g AND a.src <> b.src
  GROUP BY a.src, b.src
), pairs AS (
  SELECT a.src AS src_a, b.src AS src_b
  FROM (SELECT DISTINCT src FROM uni) a,
       (SELECT DISTINCT src FROM uni) b
  WHERE a.src <> b.src
), j AS (
  SELECT p.src_a, p.src_b,
         COALESCE(u.clip, 0) AS uni_clip,
         ta.t AS uni_total,
         COALESCE(bc.clip, 0) AS bi_clip,
         tb.t AS bi_total,
         tr.t AS ref_len
  FROM pairs p
  LEFT JOIN uni_clip u ON u.src_a = p.src_a AND u.src_b = p.src_b
  LEFT JOIN bi_clip bc ON bc.src_a = p.src_a AND bc.src_b = p.src_b
  JOIN uni_tot ta ON ta.src = p.src_a
  JOIN bi_tot tb ON tb.src = p.src_a
  JOIN uni_tot tr ON tr.src = p.src_b
)
SELECT src_a, src_b, uni_clip, uni_total, bi_clip, bi_total, ref_len,
  ROUND(CAST(uni_clip AS DOUBLE) / CAST(uni_total AS DOUBLE), 6) AS p1,
  ROUND(CAST(bi_clip AS DOUBLE) / CAST(bi_total AS DOUBLE), 6) AS p2,
  ROUND(CASE WHEN uni_total > ref_len THEN CAST(1.0 AS DOUBLE)
             ELSE EXP(CAST(1.0 AS DOUBLE)
                      - CAST(ref_len AS DOUBLE)
                        / CAST(uni_total AS DOUBLE)) END, 6) AS bp,
  ROUND(CASE WHEN uni_clip = 0 OR bi_clip = 0 THEN CAST(0.0 AS DOUBLE)
             ELSE (CASE WHEN uni_total > ref_len THEN CAST(1.0 AS DOUBLE)
                        ELSE EXP(CAST(1.0 AS DOUBLE)
                                 - CAST(ref_len AS DOUBLE)
                                   / CAST(uni_total AS DOUBLE)) END)
                  * EXP(CAST(0.5 AS DOUBLE)
                        * (LN(CAST(uni_clip AS DOUBLE)
                              / CAST(uni_total AS DOUBLE))
                           + LN(CAST(bi_clip AS DOUBLE)
                                / CAST(bi_total AS DOUBLE)))) END, 6)
    AS bleu2
FROM j ORDER BY src_a, src_b
""",
    doc="Corpus-level cross-source BLEU-2 (Papineni et al. ACL'02): "
        "every ordered source pair gets clipped 1/2-gram precisions "
        "(exact integers from keyed joins of per-source gram counts), "
        "brevity penalty, and the geometric-mean BLEU — the "
        "corpus-pair template/mirror screen run before mixture "
        "weighting, complementing doc-level MinHash (two sources can "
        "share template text wholesale without any single doc pair "
        "crossing a near-dup threshold).  Integer clips/totals hash "
        "exactly; BP/BLEU apply exp/ln to identical integer-ratio "
        "doubles and round to 6 (the established transcendental "
        "corner).  Scale: two gram-keyed partial-count shuffles; "
        "per-gram pair work ∝ (#sources containing it)² — bounded by "
        "source count, not corpus size. "
        "operators/text.py:cross_source_bleu.",
    tags=("text", "pipeline"),
)
def text_cross_source_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import cross_source_bleu
    return cross_source_bleu(table(spark, sf_dir, "documents"))


_AMS_ORACLE = """
WITH freq AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
  FROM events GROUP BY user_id
), z AS (
  SELECT CAST(SUM(f * f) AS BIGINT) AS exact_f2,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(f) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams0|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z0,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams1|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z1,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams2|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z2,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams3|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z3,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams4|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z4,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams5|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z5,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams6|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z6,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams7|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z7,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams8|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z8,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams9|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z9,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams10|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z10,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams11|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z11,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams12|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z12,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams13|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z13,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams14|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z14,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams15|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z15,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams16|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z16,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams17|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z17,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams18|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z18,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams19|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z19,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams20|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z20,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams21|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z21,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams22|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z22,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams23|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z23,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams24|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z24,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams25|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z25,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams26|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z26,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams27|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z27,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams28|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z28,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams29|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z29,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams30|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z30,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams31|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z31,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams32|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z32,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams33|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z33,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams34|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z34,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams35|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z35,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams36|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z36,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams37|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z37,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams38|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z38,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams39|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z39,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams40|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z40,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams41|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z41,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams42|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z42,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams43|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z43,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams44|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z44,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams45|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z45,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams46|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z46,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams47|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z47,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams48|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z48,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams49|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z49,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams50|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z50,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams51|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z51,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams52|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z52,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams53|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z53,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams54|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z54,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams55|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z55,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams56|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z56,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams57|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z57,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams58|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z58,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams59|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z59,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams60|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z60,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams61|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z61,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams62|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z62,
         CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('ams63|' || CAST(user_id AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS z63
  FROM freq
), g AS (
  SELECT exact_f2, n_keys, n_rows,
         CAST(z0 * z0 + z1 * z1 + z2 * z2 + z3 * z3 + z4 * z4 + z5 * z5 + z6 * z6 + z7 * z7 AS BIGINT) AS g0,
         CAST(z8 * z8 + z9 * z9 + z10 * z10 + z11 * z11 + z12 * z12 + z13 * z13 + z14 * z14 + z15 * z15 AS BIGINT) AS g1,
         CAST(z16 * z16 + z17 * z17 + z18 * z18 + z19 * z19 + z20 * z20 + z21 * z21 + z22 * z22 + z23 * z23 AS BIGINT) AS g2,
         CAST(z24 * z24 + z25 * z25 + z26 * z26 + z27 * z27 + z28 * z28 + z29 * z29 + z30 * z30 + z31 * z31 AS BIGINT) AS g3,
         CAST(z32 * z32 + z33 * z33 + z34 * z34 + z35 * z35 + z36 * z36 + z37 * z37 + z38 * z38 + z39 * z39 AS BIGINT) AS g4,
         CAST(z40 * z40 + z41 * z41 + z42 * z42 + z43 * z43 + z44 * z44 + z45 * z45 + z46 * z46 + z47 * z47 AS BIGINT) AS g5,
         CAST(z48 * z48 + z49 * z49 + z50 * z50 + z51 * z51 + z52 * z52 + z53 * z53 + z54 * z54 + z55 * z55 AS BIGINT) AS g6,
         CAST(z56 * z56 + z57 * z57 + z58 * z58 + z59 * z59 + z60 * z60 + z61 * z61 + z62 * z62 + z63 * z63 AS BIGINT) AS g7
  FROM z
), m AS (
  SELECT exact_f2, n_keys, n_rows,
         CAST(g0 + g1 + g2 + g3 + g4 + g5 + g6 + g7 AS BIGINT) AS z2_total,
         CAST(list_sort([g0,g1,g2,g3,g4,g5,g6,g7])[4]
              + list_sort([g0,g1,g2,g3,g4,g5,g6,g7])[5] AS BIGINT) AS med2_gsum
  FROM g
)
SELECT exact_f2, n_keys, n_rows, z2_total, med2_gsum,
  CAST(ROUND(CAST(z2_total AS DOUBLE) / CAST(64.0 AS DOUBLE)) AS BIGINT)
    AS est_mean,
  CAST(ROUND(CAST(med2_gsum AS DOUBLE) / CAST(16.0 AS DOUBLE)) AS BIGINT)
    AS est_median_of_means,
  ROUND(ABS(CAST(z2_total AS DOUBLE) / CAST(64.0 AS DOUBLE)
            - CAST(exact_f2 AS DOUBLE)) / CAST(exact_f2 AS DOUBLE), 6)
    AS rel_err_mean,
  ROUND(ABS(CAST(med2_gsum AS DOUBLE) / CAST(16.0 AS DOUBLE)
            - CAST(exact_f2 AS DOUBLE)) / CAST(exact_f2 AS DOUBLE), 6)
    AS rel_err_mom
FROM m
"""


@register(
    "sketch_ams_f2_calibration",
    oracle=_AMS_ORACLE,
    doc="AMS second-frequency-moment sketch (Alon, Matias & Szegedy "
        "STOC'96) with its exact twin in one plan: F2 = Σ f_x² over "
        "user_id — the self-join size / skew statistic a planner "
        "wants before choosing a join strategy.  64 estimators "
        "Z_j = Σ ±f_x with md5-derived signs; the report compares the "
        "plain 64-mean against the textbook median-of-8-means "
        "(robust to Z²'s heavy right tail) and the exact F2, with "
        "relative errors.  Z_j, Z_j², group sums, and the 2×median "
        "numerator are ALL exact integers — both engines hash-agree "
        "bit-for-bit; the sketch state is 64 integers, mergeable by "
        "addition (the streaming/partial-agg property that makes AMS "
        "usable at 100 TB: one map-side pass over the (key, f) "
        "table). operators/countmin.py:ams_f2_report.",
    tags=("sketch", "events"),
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.countmin import ams_f2_report
    return ams_f2_report(table(spark, sf_dir, "events"), "user_id")


@register(
    "text_burrows_delta",
    oracle=r"""
WITH toks AS (
  SELECT source AS src, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
), cnt AS (
  SELECT src, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE w <> '' GROUP BY src, w
), tot AS (
  SELECT src, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY src
), top AS (
  SELECT w FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, w) AS rk
    FROM cnt GROUP BY w) WHERE rk <= 30
), f AS (
  SELECT top.w, tot.src,
         CAST(COALESCE(cnt.c, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE) AS f
  FROM top CROSS JOIN tot
  LEFT JOIN cnt ON cnt.w = top.w AND cnt.src = tot.src
), stats AS (
  SELECT w, ROUND(AVG(f), 8) AS m,
         ROUND(SQRT(GREATEST(AVG(f * f) - AVG(f) * AVG(f),
                             CAST(0.0 AS DOUBLE))), 8) AS sd
  FROM f GROUP BY w
), z AS (
  SELECT f.w, f.src,
         CAST(ROUND((f.f - s.m) / s.sd * CAST(1e6 AS DOUBLE), 0)
              AS BIGINT) AS z6
  FROM f JOIN stats s ON s.w = f.w
  WHERE s.sd > 0
), p AS (
  SELECT a.src AS src_a, b.src AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(ABS(a.z6 - b.z6)) AS BIGINT) AS s6
  FROM z a JOIN z b ON a.w = b.w AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT src_a, src_b, n_words,
       ROUND(CAST(s6 AS DOUBLE)
             / (CAST(n_words AS DOUBLE) * CAST(1e6 AS DOUBLE)), 6)
         AS delta
FROM p ORDER BY src_a, src_b
""",
    doc="Burrows' Delta stylometric distance between source pairs "
        "(Burrows LLC 2002 / Argamon LLC 2008): z-scored relative "
        "frequencies of the corpus's 30 most frequent words (function "
        "words — style, not topic), Delta = mean |z_a − z_b| over "
        "unordered pairs.  Two crawl sources with near-zero Delta are "
        "the same underlying GENERATOR (mirror, template farm, shared "
        "pipeline) even when their content n-grams differ — the "
        "stylistic complement of text_cross_source_bleu.  Word "
        "selection ranks exact integer counts; frequencies are "
        "integer-ratio divisions; across-source mean/sd round to 8 "
        "before z-scoring (GREATEST guards E[x²]−E[x]² against "
        "float-negative variance); z is carried as exact integer "
        "micro-units because the 30-word mean of 6-decimal values is "
        "a denominator-3e7 rational that lands on EXACT round-half "
        "ties (measured 1.1977215 splitting the engines) — Delta is "
        "one ROUND of an identical integer-ratio double.  Scale: one (source, word) "
        "count shuffle; everything after runs on a #sources × 30 "
        "matrix, constant-size regardless of corpus bytes. "
        "operators/text.py:burrows_delta.",
    tags=("text", "pipeline"),
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import burrows_delta
    return burrows_delta(table(spark, sf_dir, "documents"))
