"""Deduplication plans over ``documents`` (north-star training-data ops;
implementations in :mod:`..operators.dedup`).

Oracles: the approximate families (MinHash-LSH, SimHash) use md5-derived
portable hashes and provably-complete candidate generation, so their
verified outputs equal exhaustive-exact computations that DuckDB can run
— the oracle for MinHash-LSH is the *exact* Jaccard pair join (what LSH
approximates), and for SimHash the full signature computation replicated
in SQL.

North-star extension (SURVEY §7.1 step 7) — no counterpart in the
reference; operators live in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table
from ..operators import dedup as D
from ..operators.materialize import materialize

_TOKS = r"""
  SELECT doc_id,
         list_sort(list_distinct(string_split_regex(text, '\s+'))) AS ts
  FROM documents
"""


@register(
    "dedup_exact",
    oracle=r"""
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS representative_id,
       COUNT(*) AS n_dups
FROM documents GROUP BY 1
""",
    doc="Exact dedup on normalized text (lowercase, punctuation stripped, "
        "whitespace collapsed) → md5 fingerprint groupBy. "
        "operators/dedup.py:exact_dedup.",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_exact_token_set",
    oracle=f"""
WITH toks AS ({_TOKS})
SELECT md5(array_to_string(ts, ' ')) AS fingerprint,
       MIN(doc_id) AS representative_id,
       COUNT(*) AS n_dups
FROM toks GROUP BY 1
""",
    doc="Bag-of-words dedup: fingerprint = sorted distinct token set — "
        "collapses word-order shuffles (the fixture's actual duplicate "
        "structure: ~500 docs share far fewer token sets).",
    tags=("dedup",),
)
def dedup_exact_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(table(spark, sf_dir, "documents"), "doc_id", "text",
                         canon="token_set")


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH toks AS ({_TOKS})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.ts, b.ts)) * 1.0 /
             len(list_distinct(list_concat(a.ts, b.ts))), 6) AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE 10 * len(list_intersect(a.ts, b.ts))
      >= 9 * len(list_distinct(list_concat(a.ts, b.ts)))
""",
    doc="MinHash(64) + LSH(16 bands × 4 rows) near-dup pairs at token-set "
        "Jaccard >= 0.9, exact-verified. P[miss] ≈ 4e-8 per qualifying "
        "pair, so the output equals the oracle's exhaustive pair join; "
        "4-row bands keep template-vocabulary corpora (baseline J≈0.4) "
        "from flooding the candidate buckets. "
        "operators/dedup.py:minhash_lsh_pairs. Bench headline.",
    tags=("dedup", "bench"),
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(table(spark, sf_dir, "documents"),
                               "doc_id", "text")


@register(
    "dedup_simhash",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_sort(list_distinct(string_split_regex(text, '\s+'))) AS ts
  FROM documents
), sigs AS (
  SELECT doc_id,
         (SELECT CAST(SUM(CASE WHEN 2 * len(list_filter(ts, t ->
                   (CAST(concat('0x', substr(md5('s999|' || t), 1, 15)) AS BIGINT)
                    & (CAST(1 AS BIGINT) << b)) != 0)) >= len(ts)
                 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT)
          FROM range(32) r(b)) AS simhash
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
""",
    doc="SimHash(32-bit) near-dup pairs at Hamming distance <= 2; chunk-"
        "bucketed candidate generation (pigeonhole-complete for "
        "n_chunks > max_hamming) + exact verify. The oracle recomputes the "
        "identical md5-derived signature in SQL. operators/dedup.py:simhash_pairs.",
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_ngram_jaccard",
    oracle=r"""
WITH sh AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           range(1, len(string_split_regex(text, '\s+')) - 1),
           i -> array_to_string(string_split_regex(text, '\s+')[i:i+2], ' ')))) AS s
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
             len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE 10 * len(list_intersect(a.s, b.s))
      >= 8 * len(list_distinct(list_concat(a.s, b.s)))
""",
    doc="Exact 3-gram shingle Jaccard pairs >= 0.8 — the quadratic "
        "validation-scale operator (and the semantic MinHash approximates). "
        "operators/dedup.py:ngram_jaccard_pairs.",
    tags=("dedup",),
)
def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(table(spark, sf_dir, "documents"),
                                 "doc_id", "text", n=3,
                                 threshold_num=8, threshold_den=10)


@register(
    "dedup_token_jaccard_ppjoin",
    oracle=f"""
WITH toks AS ({_TOKS})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(len(list_intersect(a.ts, b.ts)) * 1.0 /
             len(list_distinct(list_concat(a.ts, b.ts))), 6) AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE 10 * len(list_intersect(a.ts, b.ts))
      >= 9 * len(list_distinct(list_concat(a.ts, b.ts)))
""",
    doc="Prefix-filtered exact set-similarity join (PPJoin family) at "
        "token Jaccard >= 0.9 — the SAME result set as dedup_minhash_lsh "
        "computed by a second, independent exact algorithm (equi-join on "
        "pigeonhole prefixes instead of banded MinHash). "
        "operators/dedup.py:ngram_jaccard_pairs(n=1).",
    tags=("dedup",),
)
def dedup_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(table(spark, sf_dir, "documents"),
                                 "doc_id", "text", n=1,
                                 threshold_num=9, threshold_den=10)


@register(
    "dedup_substring_overlap",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
), pos AS (
  -- per-doc gram positions derived FROM the data (unnest over a lateral
  -- generate_series), not a static bound: fixtures regenerate between
  -- rounds and a doc longer than any hard-coded cap would silently drop
  -- grams on the oracle side only.
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 8)) AS i
  FROM toks WHERE len(t) >= 8
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i+1:i+8], ' ') AS g FROM pos
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
), islands AS (
  SELECT id_a, id_b, COUNT(*) AS run
  FROM (SELECT id_a, id_b, pa - pb AS diag, pa,
               pa - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, pa - pb
                                       ORDER BY pa) AS island
        FROM cand)
  GROUP BY id_a, id_b, diag, island
)
SELECT id_a, id_b, CAST(MAX(run) + 7 AS BIGINT) AS max_run_tokens
FROM islands GROUP BY id_a, id_b
HAVING MAX(run) + 7 >= 20
""",
    doc="Exact substring-overlap pairs: docs sharing >= 20 consecutive "
        "tokens, with the longest shared run — suffix-array-style "
        "substring dedup re-expressed as a k-gram (k=8) inverted index + "
        "diagonal gaps-and-islands, so candidates come keyed by gram "
        "hash, never doc×doc.  The oracle replicates the identical "
        "index+islands plan over gram STRINGS (Spark joins xxhash64 of "
        "the same grams). operators/dedup.py:substring_overlap_pairs.",
    tags=("dedup",),
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.substring_overlap_pairs(table(spark, sf_dir, "documents"),
                                     "doc_id", "text", k=8, min_tokens=20)


@register(
    "dedup_prune_corpus",
    oracle=r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           range(1, len(string_split_regex(text, '\s+')) - 1),
           i -> array_to_string(string_split_regex(text, '\s+')[i:i+2], ' ')))) AS s
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE 10 * len(list_intersect(a.s, b.s))
        >= 8 * len(list_distinct(list_concat(a.s, b.s)))
), und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
), comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS rep FROM reach GROUP BY a
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node != rep)
""",
    doc="Dedup MATERIALIZATION: the kept corpus after near-dup pruning — "
        "3-gram Jaccard>=0.8 pairs -> connected components -> keep the "
        "smallest doc_id per cluster (plus every unpaired doc).  The "
        "pair-mining and clustering steps are the already-oracled "
        "operators; this query is the step real pipelines actually ship: "
        "an anti-join of the corpus against the non-representative "
        "members. operators/dedup.py:connected_components.",
    tags=("dedup",),
)
def dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                  threshold_num=8, threshold_den=10)
    comp = D.connected_components(pairs)
    drop = comp.where(F.col("node") != F.col("label")) \
               .select(F.col("node").alias("doc_id"))
    return (docs.join(drop, "doc_id", "left_anti")
            .select("doc_id", "lang", "source"))


@register(
    "dedup_cluster_components",
    oracle=r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           range(1, len(string_split_regex(text, '\s+')) - 1),
           i -> array_to_string(string_split_regex(text, '\s+')[i:i+2], ' ')))) AS s
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE 10 * len(list_intersect(a.s, b.s))
        >= 8 * len(list_distinct(list_concat(a.s, b.s)))
), und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
), comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS rep FROM reach GROUP BY a
)
SELECT CAST(rep AS BIGINT) AS rep,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(node) AS BIGINT) AS ids_checksum
FROM comp GROUP BY rep ORDER BY rep
""",
    doc="Near-dup CLUSTERING: exact 3-gram Jaccard>=0.8 pairs "
        "(dedup_ngram_jaccard's edge set) -> connected components by "
        "min-label propagation -> one representative (smallest id) per "
        "cluster with member count + id checksum.  The oracle computes "
        "the same components as a recursive-CTE transitive closure — "
        "quadratic per component, which is exactly why the Spark side "
        "iterates a keyed join instead (O(diameter) rounds, no closure "
        "materialization). operators/dedup.py:connected_components.",
    tags=("dedup", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = D.ngram_jaccard_pairs(table(spark, sf_dir, "documents"),
                                  "doc_id", "text", n=3,
                                  threshold_num=8, threshold_den=10)
    comp = D.connected_components(pairs)
    return (comp.groupBy(F.col("label").alias("rep"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"),
                 F.sum("node").cast("bigint").alias("ids_checksum"))
            .orderBy("rep"))


@register(
    "dedup_cross_corpus",
    oracle=f"""
WITH toks AS ({_TOKS}),
new_docs AS (SELECT d.doc_id, t.ts FROM documents d JOIN toks t USING (doc_id)
             WHERE d.source = 'src0'),
corpus AS (SELECT d.doc_id, t.ts FROM documents d JOIN toks t USING (doc_id)
           WHERE d.source != 'src0')
SELECT n.doc_id AS id_left, c.doc_id AS id_right,
       ROUND(len(list_intersect(n.ts, c.ts)) * 1.0 /
             len(list_distinct(list_concat(n.ts, c.ts))), 6) AS jaccard
FROM new_docs n JOIN corpus c
  ON 10 * len(list_intersect(n.ts, c.ts))
     >= 9 * len(list_distinct(list_concat(n.ts, c.ts)))
""",
    doc="Cross-corpus near-dup mining: every src0 doc (the 'new crawl') "
        "against the rest of the corpus at token Jaccard >= 0.9 — the "
        "batch form of dedup-at-ingest.  Banded-LSH keyed join between "
        "the two sides' band tables (never |new|×|corpus|), exact "
        "verify; oracle is the exhaustive cross join. "
        "operators/dedup.py:minhash_lsh_pairs_cross.",
    tags=("dedup",),
)
def dedup_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_cross(
        docs.where(F.col("source") == "src0"),
        docs.where(F.col("source") != "src0"),
        "doc_id", "text")


@register(
    "pipeline_split_leakage",
    oracle=f"""
WITH toks AS ({_TOKS}), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
  WHERE 10 * len(list_intersect(a.ts, b.ts))
        >= 9 * len(list_distinct(list_concat(a.ts, b.ts)))
), splits AS (
  SELECT doc_id,
         CASE WHEN (doc_id * 2654435761 % 4294967296) % 10000 < 1000
              THEN 'test' ELSE 'train' END AS split
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_near_dup_pairs,
       CAST(COALESCE(SUM(CASE WHEN sa.split <> sb.split
                              THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_leaky_pairs,
       CAST(COUNT(DISTINCT
              CASE WHEN sa.split <> sb.split AND sa.split = 'test'
                   THEN p.id_a
                   WHEN sa.split <> sb.split AND sb.split = 'test'
                   THEN p.id_b END)
            AS BIGINT) AS n_test_docs_leaked
FROM pairs p JOIN splits sa ON p.id_a = sa.doc_id
             JOIN splits sb ON p.id_b = sb.doc_id
""",
    doc="Train/test leakage audit: near-dup pairs (MinHash-LSH at "
        "Jaccard >= 0.9, exact-verified) that STRADDLE the reproducible "
        "split boundary — the contamination check a training pipeline "
        "runs before trusting held-out metrics.  Composes two oracled "
        "operators; the split is a pure projection, so the only extra "
        "cost over pair mining is two id-keyed joins of the (small) "
        "pair set.  Reports pair counts and the distinct test docs "
        "with a train-side twin. operators/dedup.py:minhash_lsh_pairs + "
        "operators/pipeline.py:train_test_split.",
    tags=("pipeline", "dedup", "split"),
)
def dedup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pipeline as P

    docs = table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text")
    splits = P.train_test_split(docs).select("doc_id", "split")
    sa = (splits.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("split", "split_a"))
    sb = (splits.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("split", "split_b"))
    j = pairs.join(sa, "id_a").join(sb, "id_b")
    leak = F.col("split_a") != F.col("split_b")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_near_dup_pairs"),
        F.coalesce(F.sum(leak.cast("int")), F.lit(0)).cast("bigint")
         .alias("n_leaky_pairs"),
        F.countDistinct(
            F.when(leak & (F.col("split_a") == "test"), F.col("id_a"))
             .when(leak & (F.col("split_b") == "test"), F.col("id_b")))
         .cast("bigint").alias("n_test_docs_leaked"))


@register(
    "dedup_edit_distance",
    oracle="""
WITH d AS (SELECT doc_id, lower(text) AS s FROM documents
           WHERE length(text) >= 11)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.s, b.s) AS INTEGER) AS edit_distance
FROM d a JOIN d b
  ON a.doc_id < b.doc_id
 AND abs(length(a.s) - length(b.s)) <= 10
WHERE levenshtein(a.s, b.s) <= 10
""",
    doc="Bounded edit-distance near-dup pairs (Levenshtein <= 10 on "
        "lowercased text) via PassJoin pigeonhole segments: k+1-way even "
        "partition indexed, displaced windows probed, equi-join on "
        "(segment#, text), exact levenshtein verify. Lossless candidate "
        "generation, so output == the oracle's exhaustive pair join. "
        "operators/dedup.py:edit_distance_pairs.",
    tags=("dedup",),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.edit_distance_pairs(table(spark, sf_dir, "documents"),
                                 "doc_id", "text", k=10)


@register(
    "dedup_url_canonicalize",
    oracle="""
WITH variants AS (
  SELECT doc_id, source,
         unnest([
           'https://www.' || source || '.example.com/' || lang || '/doc-'
             || CAST(doc_id AS VARCHAR) || '?utm_source=crawl&session=42',
           'http://' || upper(source) || '.EXAMPLE.com/' || lang || '/doc-'
             || CAST(doc_id AS VARCHAR),
           'https://' || source || '.example.com/' || lang || '/doc-'
             || CAST(doc_id AS VARCHAR) || '/#section-2'
         ]) AS url
  FROM documents
), canon AS (
  SELECT doc_id, source,
         lower(regexp_extract(
             regexp_replace(regexp_replace(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '[?#].*$', ''),
             '^([^/]*)', 1))
         || regexp_replace(
              regexp_extract(
                regexp_replace(regexp_replace(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '[?#].*$', ''),
                '^[^/]*(.*)$', 1), '/$', '') AS k0
  FROM variants
), canon2 AS (
  SELECT doc_id, source, regexp_replace(k0, '^www\\.', '') AS key
  FROM (SELECT doc_id, source,
               CASE WHEN k0 LIKE 'www.%' THEN regexp_replace(k0, '^www\\.', '')
                    ELSE k0 END AS k0
        FROM canon)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT key) AS BIGINT) AS n_pages,
       ROUND(1.0 - COUNT(DISTINCT key) * 1.0 / COUNT(*), 6) AS dup_ratio
FROM canon2
GROUP BY source
ORDER BY source
""",
    doc="Canonical-URL dedup: three crawl-shaped variants per page "
        "(https+www+tracking query, http+SHOUTING host, trailing "
        "slash+fragment) must collapse to ONE canonical key — scheme "
        "dropped, host lowercased, www. stripped, query/fragment cut, "
        "trailing slash trimmed.  Per-source variant count vs distinct "
        "pages vs dup ratio; a canonicalizer miss shows up as n_pages "
        "> n_docs.  The cheapest dedup pass a crawl corpus gets — pure "
        "projection + one distinct-count agg. "
        "operators/pipeline.py:canonicalize_url.",
    tags=("dedup", "pipeline"),
)
def dedup_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pipeline as P
    docs = table(spark, sf_dir, "documents")
    mk = lambda s: F.concat(*[F.lit(x) if isinstance(x, str) else x
                              for x in s])  # noqa: E731
    did = F.col("doc_id").cast("string")
    variants = F.array(
        mk([F.lit("https://www."), F.col("source"),
            F.lit(".example.com/"), F.col("lang"), F.lit("/doc-"), did,
            F.lit("?utm_source=crawl&session=42")]),
        mk([F.lit("http://"), F.upper(F.col("source")),
            F.lit(".EXAMPLE.com/"), F.col("lang"), F.lit("/doc-"), did]),
        mk([F.lit("https://"), F.col("source"),
            F.lit(".example.com/"), F.col("lang"), F.lit("/doc-"), did,
            F.lit("/#section-2")]))
    urls = (docs.select("doc_id", "source",
                        F.explode(variants).alias("url")))
    keyed = urls.withColumn("key", P.canonicalize_url(F.col("url")))
    return (keyed.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_urls"),
                 F.countDistinct("key").cast("bigint").alias("n_pages"),
                 F.round(1.0 - F.countDistinct("key")
                         / F.count("*"), 6).alias("dup_ratio"))
            .orderBy("source"))


@register(
    "dedup_containment",
    oracle=r"""
WITH sh AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           range(1, len(t)),
           i -> array_to_string(t[i:i+1], ' ')))) AS s
  FROM (SELECT doc_id, string_split_regex(text, '\s+') AS t
        FROM documents)
  WHERE len(t) >= 2
)
SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
       ROUND(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6)
           AS containment
FROM sh a JOIN sh b ON a.doc_id != b.doc_id
WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(a.s)
ORDER BY contained_id, container_id
""",
    doc="Directed containment pairs at |A∩B|/|A| >= 0.8 over bigram "
        "shingles — the asymmetric twin of the PPJoin entry.  "
        "Containment catches excerpts and near-subsets that symmetric "
        "Jaccard structurally misses (a short doc inside a long one "
        "has union-dominated Jaccard ~0 but containment ~1).  EXACT "
        "via the containment prefix filter: probe = each doc's "
        "pigeonhole prefix in global hash order, index = full shingle "
        "sets (the asymmetric side), keyed equi-join only — the "
        "oracle brute-forces the same directed predicate over string "
        "shingles. operators/dedup.py:containment_pairs.",
    tags=("dedup",),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (D.containment_pairs(table(spark, sf_dir, "documents"),
                                "doc_id", "text", n=2,
                                threshold_num=8, threshold_den=10)
            .orderBy("contained_id", "container_id"))


@register(
    "dedup_cascade_report",
    oracle=r"""
WITH keys AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]',
                                                '', 'g'),
                                 '\s+', ' ', 'g'))) AS k1,
         md5(array_to_string(list_sort(string_split_regex(text, '\s+')),
                             ' ')) AS k2,
         md5(array_to_string(list_sort(list_distinct(
               string_split_regex(text, '\s+'))), ' ')) AS k3
  FROM documents
), s1 AS (
  SELECT doc_id, k2, k3 FROM (
    SELECT doc_id, k2, k3,
           ROW_NUMBER() OVER (PARTITION BY k1 ORDER BY doc_id) AS rn
    FROM keys) WHERE rn = 1
), s2 AS (
  SELECT doc_id, k3 FROM (
    SELECT doc_id, k3,
           ROW_NUMBER() OVER (PARTITION BY k2 ORDER BY doc_id) AS rn
    FROM s1) WHERE rn = 1
), s3 AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY k3 ORDER BY doc_id) AS rn
    FROM s2) WHERE rn = 1
)
SELECT * FROM (
  SELECT CAST(1 AS INT) AS stage, 'exact_text' AS stage_name,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM keys) AS n_input,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_survivors
  UNION ALL
  SELECT CAST(2 AS INT), 'token_multiset',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s1),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
  UNION ALL
  SELECT CAST(3 AS INT), 'token_set',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s2),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
)
ORDER BY stage
""",
    doc="Exact-dedup CASCADE accounting: three progressively coarser "
        "canonicalizations applied in sequence — normalized text, "
        "sorted token multiset (collapses word-order shuffles), sorted "
        "distinct token set (collapses repetition too) — with input/"
        "survivor counts per stage, min-id representative rule.  The "
        "stage ordering mirrors a production pipeline (cheapest, "
        "highest-precision key first); all three keys come from ONE "
        "corpus scan, each stage is a keyed first-row window over the "
        "previous stage's survivors.  plans/dedup.py:dedup_cascade.",
    tags=("dedup", "pipeline"),
)
def dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    keys = d.select(
        "doc_id",
        F.md5(D.normalize_text(F.col("text")).cast("binary")).alias("k1"),
        F.md5(F.array_join(F.array_sort(toks), " ").cast("binary"))
         .alias("k2"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")
              .cast("binary")).alias("k3")).transform(materialize)

    def survivors(df, key):
        w = Window.partitionBy(key).orderBy("doc_id")
        return (df.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1).drop("__rn"))

    s1 = survivors(keys, "k1").transform(materialize)
    s2 = survivors(s1, "k2").transform(materialize)
    s3 = survivors(s2, "k3")
    counts = [keys.count(), s1.count(), s2.count(), s3.count()]
    rows = [(i + 1, name, counts[i], counts[i + 1])
            for i, name in enumerate(
                ["exact_text", "token_multiset", "token_set"])]
    return spark.createDataFrame(
        rows, "stage INT, stage_name STRING, n_input BIGINT, "
              "n_survivors BIGINT").orderBy("stage")


def _minhash_calibration_oracle(n_hashes: int = 64, seed0: int = 7000) -> str:
    """Mirror of the portable-md5 MinHash signature: sig_i = min over
    tokens of hash_expr(t, seed0 + i) (operators/dedup.py:hash_expr —
    the same 's<seed>|' spelling the SimHash oracle re-derives)."""
    return f"""
WITH toks AS ({_TOKS}),
sample AS (SELECT doc_id, ts FROM toks WHERE doc_id % 10 = 0),
sigs AS (
  SELECT doc_id, ts,
         list_transform(generate_series(0, {n_hashes - 1}), i ->
           list_min(list_transform(ts, t ->
             CAST(concat('0x', substr(md5('s' || ({seed0} + i) || '|' || t),
                                      1, 15)) AS BIGINT)))) AS sig
  FROM sample
), pairs AS (
  SELECT len(list_filter(list_zip(a.sig, b.sig), p -> p[1] = p[2]))
           / {n_hashes}.0 AS est,
         len(list_intersect(a.ts, b.ts)) * 1.0
           / len(list_distinct(list_concat(a.ts, b.ts))) AS j
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
)
SELECT CAST(FLOOR(j * 10) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(FLOOR((est - j) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_signed_err_micro,
       CAST(SUM(CAST(FLOOR(ABS(est - j) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_abs_err_micro,
       SUM(CAST(FLOOR(ABS(est - j) * 1e6 + 0.5) AS BIGINT))
         / (COUNT(*) * 1.0) AS mean_abs_err_micro
FROM pairs
GROUP BY 1
ORDER BY bin
"""


@register(
    "dedup_minhash_estimator_calibration",
    oracle=_minhash_calibration_oracle(),
    doc="MinHash ESTIMATOR calibration: estimated Jaccard (matching "
        "signature components / 64) vs exact token-set Jaccard over "
        "the reproducible 10% doc sample's pairs, binned by exact-"
        "Jaccard decile with signed and absolute micro-unit error "
        "sums — the accuracy audit run before trusting any MinHash "
        "threshold (the production LSH entry verifies candidates "
        "exactly, so IT is estimator-independent; THIS measures the "
        "estimator the thresholds are derived from).  Signatures here "
        "use the portable md5 family (hash_expr) so both engines "
        "derive bit-identical minima; errors fold to integer "
        "micro-units.  Scale: a calibration needs only a BOUNDED "
        "sample — the pair block is constant-size at any corpus "
        "(swap the modulus to target ~5k docs). "
        "plans/dedup.py:dedup_minhash_calibration.",
    tags=("dedup", "diagnostics"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hash_expr, tokens
    n_hashes, seed0 = 64, 7000
    docs = table(spark, sf_dir, "documents")

    def _h(i):
        return lambda t: hash_expr(t, seed0 + i)

    sig = F.array(*[F.array_min(F.transform(F.col("ts"), _h(i)))
                    for i in range(n_hashes)])
    sample = (docs.where(F.col("doc_id") % 10 == 0)
              .select("doc_id", tokens(F.col("text")).alias("ts"))
              .select("doc_id", "ts", sig.alias("sig"))
              .transform(materialize))
    a = sample.select(F.col("doc_id").alias("ida"),
                      F.col("ts").alias("ta"), F.col("sig").alias("sa"))
    b = sample.select(F.col("doc_id").alias("idb"),
                      F.col("ts").alias("tb"), F.col("sig").alias("sb"))
    est = (F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, x: acc + x) / F.lit(float(n_hashes)))
    j = (F.size(F.array_intersect("ta", "tb")) * F.lit(1.0)
         / F.size(F.array_union("ta", "tb")))
    pairs = (a.join(b, F.col("ida") < F.col("idb"))
             .select(est.alias("est"), j.alias("j")))
    signed = F.floor((F.col("est") - F.col("j")) * 1e6 + 0.5).cast("bigint")
    absd = F.floor(F.abs(F.col("est") - F.col("j")) * 1e6 + 0.5) \
            .cast("bigint")
    return (pairs
            .select(F.floor(F.col("j") * 10).cast("bigint").alias("bin"),
                    signed.alias("se"), absd.alias("ae"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.sum("se").cast("bigint").alias("sum_signed_err_micro"),
                 F.sum("ae").cast("bigint").alias("sum_abs_err_micro"),
                 (F.sum("ae") / (F.count(F.lit(1)) * F.lit(1.0)))
                 .alias("mean_abs_err_micro"))
            .orderBy("bin"))


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
WITH toks AS ({_TOKS}),
src AS (SELECT doc_id, source FROM documents),
pairs AS (
  SELECT LEAST(sa.source, sb.source) AS source_a,
         GREATEST(sa.source, sb.source) AS source_b,
         ROUND(len(list_intersect(a.ts, b.ts)) * 1.0
               / len(list_distinct(list_concat(a.ts, b.ts))), 6) AS j
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
  JOIN src sa ON sa.doc_id = a.doc_id
  JOIN src sb ON sb.doc_id = b.doc_id
  WHERE 10 * len(list_intersect(a.ts, b.ts))
        >= 9 * len(list_distinct(list_concat(a.ts, b.ts)))
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(FLOOR(j * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_jaccard_micro
FROM pairs
GROUP BY source_a, source_b
ORDER BY source_a, source_b
""",
    doc="Cross-source near-duplicate FLOW MATRIX: the verified "
        "MinHash-LSH pair set (token Jaccard >= 0.9, the production "
        "dedup entry's machinery) rolled up by unordered source pair — "
        "the provenance question behind every dedup run ('which feeds "
        "re-publish which?'), deciding crawl priorities and licensing "
        "exposure.  Diagonal cells are intra-source churn, off-"
        "diagonal cells are syndication flows.  Candidate generation "
        "stays banded-LSH (never doc×doc); the rollup adds one "
        "broadcast-sized join to attach sources and a matrix-sized "
        "agg.  Jaccards fold to integer micro-units for order-proof "
        "sums. plans/dedup.py:dedup_cross_source.",
    tags=("dedup", "pipeline"),
)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D
    docs = table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text")
    src = docs.select("doc_id", "source")
    flows = (pairs
             .join(src.select(F.col("doc_id").alias("id_a"),
                              F.col("source").alias("sa")), "id_a")
             .join(src.select(F.col("doc_id").alias("id_b"),
                              F.col("source").alias("sb")), "id_b")
             .select(F.least("sa", "sb").alias("source_a"),
                     F.greatest("sa", "sb").alias("source_b"),
                     F.floor(F.col("jaccard") * 1e6 + 0.5).cast("bigint")
                     .alias("jm")))
    return (flows.groupBy("source_a", "source_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.sum("jm").cast("bigint").alias("sum_jaccard_micro"))
            .orderBy("source_a", "source_b"))


@register(
    "dedup_threshold_sensitivity",
    oracle=f"""
WITH toks AS ({_TOKS}),
pairs AS (
  SELECT ROUND(len(list_intersect(a.ts, b.ts)) * 1.0
               / len(list_distinct(list_concat(a.ts, b.ts))), 6) AS j
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
  WHERE 10 * len(list_intersect(a.ts, b.ts))
        >= 7 * len(list_distinct(list_concat(a.ts, b.ts)))
)
SELECT * FROM (
  SELECT CAST(0.7 AS DOUBLE) AS threshold,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs WHERE j >= 0.7
  UNION ALL
  SELECT CAST(0.8 AS DOUBLE), CAST(COUNT(*) AS BIGINT)
  FROM pairs WHERE j >= 0.8
  UNION ALL
  SELECT CAST(0.9 AS DOUBLE), CAST(COUNT(*) AS BIGINT)
  FROM pairs WHERE j >= 0.9
  UNION ALL
  SELECT CAST(0.95 AS DOUBLE), CAST(COUNT(*) AS BIGINT)
  FROM pairs WHERE j >= 0.95
)
ORDER BY threshold
""",
    doc="Dedup THRESHOLD sensitivity table: near-dup pair counts at "
        "Jaccard >= 0.7 / 0.8 / 0.9 / 0.95 from ONE exact "
        "candidate-complete run at the loosest threshold — the table "
        "that turns 'pick 0.9' from folklore into a measured choice "
        "(each row is the dedup blast radius at that setting; the "
        "marginal pairs between rows are the gray zone a human should "
        "sample).  Candidate generation is the PPJoin prefix filter, "
        "NOT banded LSH: pigeonhole prefixes are provably complete at "
        "ANY threshold, where 16x4 MinHash bands miss ~1.2% of pairs "
        "at J=0.7 ((1-0.7^4)^16 — measured as 46 missing pairs before "
        "this was switched; the banding math that makes LSH "
        "oracle-exact at 0.9 does NOT transfer down-threshold).  "
        "Pairs are mined once and bucketed by exact verified Jaccard, "
        "never re-mined per threshold. "
        "plans/dedup.py:dedup_threshold_sensitivity.",
    tags=("dedup", "diagnostics"),
)
def dedup_threshold_sensitivity(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=1,
                                  threshold_num=7, threshold_den=10)
    out = None
    for thr in (0.7, 0.8, 0.9, 0.95):
        row = (pairs.where(F.col("jaccard") >= thr)
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
               .select(F.lit(thr).alias("threshold"), "n_pairs"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("threshold")


@register(
    "dedup_winnowing_fingerprints",
    oracle="""
WITH d AS (
  SELECT doc_id, lower(text) AS t, length(text) AS n
  FROM documents WHERE length(text) >= 11
), grams AS (
  SELECT doc_id, i,
         CAST(concat('0x', substr(md5(substr(t, CAST(i AS INT), 8)),
                                  1, 15)) AS BIGINT) AS h,
         n - 8 + 1 AS ng
  FROM d, range(1, 600) r(i)
  WHERE i <= n - 8 + 1
), wins AS (
  SELECT doc_id, j, h, i
  FROM grams, range(1, 600) w(j)
  WHERE j BETWEEN greatest(1, i - 3) AND least(i, ng - 3)
), sel AS (
  SELECT DISTINCT doc_id, h FROM (
    SELECT doc_id, j, h,
           row_number() OVER (PARTITION BY doc_id, j
                              ORDER BY h, i DESC) AS rn
    FROM wins) WHERE rn = 1
), df AS (
  SELECT h, COUNT(*) AS c FROM sel GROUP BY h
), kept AS (
  SELECT s.doc_id, s.h FROM sel s JOIN df ON df.h = s.h WHERE df.c <= 20
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b HAVING COUNT(*) >= 5
ORDER BY doc_a, doc_b
""",
    doc="Robust-winnowing fingerprint near-dup pairs (Schleimer, "
        "Wilkerson & Aiken 2003 — the MOSS algorithm): 8-gram md5 "
        "hashes, 4-gram windows each selecting their minimum hash with "
        "the rightmost tie-break (guarantee: any shared substring of "
        "length >= 11 yields a shared fingerprint — the detection "
        "floor MinHash cannot promise), MOSS's boilerplate rule "
        "dropping fingerprints in > 20 docs, pairs sharing >= 5 "
        "survivors via the inverted-index join.  Window argmins are "
        "explicit (gram x <= 4 covering windows + one row_number per "
        "window), spelled identically in both engines; the df cap "
        "bounds per-hash join fan-out exactly like the LSH "
        "band-bucket guard.  Complements the gapped-gram substring-"
        "overlap entry: winnowing selects a provably-dense fingerprint "
        "SUBSET (w-fold smaller index, the property that matters at "
        "100 TB).  operators/dedup.py:winnowing_pairs.",
    tags=("dedup", "text"),
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.winnowing_pairs(docs, "doc_id", "text",
                             k=8, w=4, max_df=20, min_shared=5)


@register(
    "dedup_cluster_size_histogram",
    oracle=r"""
WITH RECURSIVE corpus AS (
  -- histogram over a 1-in-3 stratum: the recursive-closure oracle is
  -- quadratic per component and the FULL pair graph at sf0.1 (~1M
  -- edges) never finishes; the stratum keeps the oracle tractable
  -- while the banding logic under test is unchanged (the full-corpus
  -- component machinery is already oracled by dedup_cluster_components)
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
), sh AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
           range(1, len(string_split_regex(text, '\s+')) - 1),
           i -> array_to_string(string_split_regex(text, '\s+')[i:i+2], ' ')))) AS s
  FROM corpus
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE 10 * len(list_intersect(a.s, b.s))
        >= 8 * len(list_distinct(list_concat(a.s, b.s)))
), und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
), comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS rep FROM reach GROUP BY a
), sizes AS (
  SELECT rep, COUNT(*) AS sz FROM comp GROUP BY rep
), n_docs AS (
  SELECT COUNT(*) AS n FROM corpus
), singletons AS (
  SELECT (SELECT n FROM n_docs)
         - (SELECT COUNT(*) FROM comp) AS n_single
), banded AS (
  SELECT CASE WHEN sz = 2 THEN '1_pair'
              WHEN sz <= 5 THEN '2_small_3_5'
              WHEN sz <= 20 THEN '3_medium_6_20'
              ELSE '4_large_over_20' END AS band,
         sz
  FROM sizes
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs_in_band,
       CAST(MAX(sz) AS BIGINT) AS max_cluster
FROM banded GROUP BY band
UNION ALL
SELECT '0_singleton', CAST(n_single AS BIGINT),
       CAST(n_single AS BIGINT), CAST(1 AS BIGINT)
FROM singletons
ORDER BY band
""",
    doc="Duplicate-cluster size distribution: the connected-component "
        "clusters (dedup_cluster_components' machinery verbatim) "
        "banded by size, with singletons (docs in no near-dup pair) as "
        "their own band — the readout that tells a curation run "
        "whether duplication is a few mirror FARMS (mass in the large "
        "band, cheap to kill) or diffuse near-dup smear (mass in "
        "pairs, needs the full LSH pass); also the denominator "
        "evidence for the keep-one-per-cluster yield estimate.  All "
        "exact integer counts.  Scale: the component labels are the "
        "O(diameter)-round propagation; everything after is "
        "cluster-count-sized. plans/dedup.py:dedup_cluster_sizes.",
    tags=("dedup", "graph", "diagnostics"),
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 3 == 0))
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                  threshold_num=8, threshold_den=10)
    comp = D.connected_components(pairs)
    sizes = (comp.groupBy("label")
             .agg(F.count(F.lit(1)).alias("sz"))
             .transform(materialize))
    n_docs = docs.count()
    n_clustered = sizes.agg(F.sum("sz")).first()[0] or 0
    band = (F.when(F.col("sz") == 2, "1_pair")
            .when(F.col("sz") <= 5, "2_small_3_5")
            .when(F.col("sz") <= 20, "3_medium_6_20")
            .otherwise("4_large_over_20"))
    banded = (sizes.select(band.alias("band"), "sz")
              .groupBy("band")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
                   F.sum("sz").cast("bigint").alias("n_docs_in_band"),
                   F.max("sz").cast("bigint").alias("max_cluster")))
    single = spark.createDataFrame(
        [("0_singleton", int(n_docs - n_clustered),
          int(n_docs - n_clustered), 1)],
        "band string, n_clusters bigint, n_docs_in_band bigint, "
        "max_cluster bigint")
    return banded.unionByName(single).orderBy("band")


def _bbit_minhash_oracle(k: int = 32, seed0: int = 9000) -> str:
    """Mirror of the b-bit minwise estimator: same portable-md5 minima
    as the calibration entry (seed family 9000), low-b-bit slot matches,
    Li-Konig collision correction (m*2^b - k) / (k*(2^b - 1)), floored
    at 0 — spelled identically on both engines."""
    per_b = []
    for b in (1, 2, 4, 8):
        mask, denom = (1 << b) - 1, k * ((1 << b) - 1)
        per_b.append(f"""
  SELECT {b} AS b, {k * b} AS bits_per_sig,
         GREATEST(0.0,
           (len(list_filter(list_zip(a.sig, b2.sig),
                p -> xor(p[1] & {mask}, p[2] & {mask}) = 0)) * {1 << b}
            - {k}) / {denom}.0) AS est,
         len(list_intersect(a.ts, b2.ts)) * 1.0
           / len(list_distinct(list_concat(a.ts, b2.ts))) AS j
  FROM sigs a JOIN sigs b2 ON a.doc_id < b2.doc_id""")
    union = "\n  UNION ALL".join(per_b)
    return f"""
WITH toks AS ({_TOKS}),
sample AS (SELECT doc_id, ts FROM toks WHERE doc_id % 10 = 0),
sigs AS (
  SELECT doc_id, ts,
         list_transform(generate_series(0, {k - 1}), i ->
           list_min(list_transform(ts, t ->
             CAST(concat('0x', substr(md5('s' || ({seed0} + i) || '|' || t),
                                      1, 15)) AS BIGINT)))) AS sig
  FROM sample
), pairs AS ({union}
)
SELECT b, CAST(bits_per_sig AS INT) AS bits_per_sig,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(FLOOR(ABS(est - j) * 1e6 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_abs_err_micro,
       SUM(CAST(FLOOR(ABS(est - j) * 1e6 + 0.5) AS BIGINT))
         / (COUNT(*) * 1.0) AS mean_abs_err_micro
FROM pairs
GROUP BY b, bits_per_sig
ORDER BY b
"""


@register(
    "dedup_minhash_bbit",
    oracle=_bbit_minhash_oracle(),
    doc="b-bit minwise hashing (Li & Konig, WWW 2010): store only the "
        "low b bits of each of k=32 portable-md5 minima and estimate "
        "Jaccard from the slot-match rate with the collision "
        "correction (m*2^b - k)/(k*(2^b - 1)), floored at 0 — the "
        "storage knob that turns a 64-bit-per-slot MinHash sketch "
        "into 1/2/4/8 bits per slot (8-64x smaller signature "
        "shuffles, THE lever when the sketch table itself is the "
        "shuffle at 100 TB).  One row per b with exact integer "
        "micro-unit error sums over the reproducible 10% sample's "
        "pairs — the same discipline as "
        "dedup_minhash_estimator_calibration, so the accuracy/bits "
        "trade reads directly off the result.  Per-pair errors fold "
        "to integers BEFORE summation (no order-dependent float "
        "accumulation); the estimator arithmetic is exact-int-ratio "
        "division both engines spell identically. "
        "plans/dedup.py:dedup_minhash_bbit.",
    tags=("dedup", "diagnostics", "sketch"),
)
def dedup_minhash_bbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hash_expr, tokens
    k, seed0 = 32, 9000
    docs = table(spark, sf_dir, "documents")

    def _h(i):
        return lambda t: hash_expr(t, seed0 + i)

    sig = F.array(*[F.array_min(F.transform(F.col("ts"), _h(i)))
                    for i in range(k)])
    sample = (docs.where(F.col("doc_id") % 10 == 0)
              .select("doc_id", tokens(F.col("text")).alias("ts"))
              .select("doc_id", "ts", sig.alias("sig"))
              .transform(materialize))
    a = sample.select(F.col("doc_id").alias("ida"),
                      F.col("ts").alias("ta"), F.col("sig").alias("sa"))
    b_ = sample.select(F.col("doc_id").alias("idb"),
                       F.col("ts").alias("tb"), F.col("sig").alias("sb"))
    j = (F.size(F.array_intersect("ta", "tb")) * F.lit(1.0)
         / F.size(F.array_union("ta", "tb")))
    pairs = (a.join(b_, F.col("ida") < F.col("idb"))
             .select("sa", "sb", j.alias("j"))
             .transform(materialize))
    frames = []
    for b in (1, 2, 4, 8):
        mask, denom = (1 << b) - 1, k * ((1 << b) - 1)
        m = F.aggregate(
            F.zip_with("sa", "sb",
                       lambda x, y: (x.bitwiseAND(F.lit(mask))
                                     == y.bitwiseAND(F.lit(mask)))
                       .cast("int")),
            F.lit(0), lambda acc, x: acc + x)
        est = F.greatest(F.lit(0.0),
                         (m * (1 << b) - k) / F.lit(float(denom)))
        absd = F.floor(F.abs(est - F.col("j")) * 1e6 + 0.5).cast("bigint")
        frames.append(pairs.select(
            F.lit(b).alias("b"),
            F.lit(k * b).cast("int").alias("bits_per_sig"),
            absd.alias("absd")))
    allb = frames[0]
    for fr in frames[1:]:
        allb = allb.unionAll(fr)
    return (allb.groupBy("b", "bits_per_sig")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.sum("absd").cast("bigint").alias("sum_abs_err_micro"),
                 (F.sum("absd") / F.count(F.lit(1)))
                 .alias("mean_abs_err_micro"))
            .orderBy("b"))


@register(
    "dedup_cdc_chunking",
    oracle="""
WITH d AS (
  SELECT doc_id, source, text AS t, length(text) AS n,
         list_transform(range(1, length(text) + 1),
                        j -> CAST(unicode(substr(t, CAST(j AS INT), 1))
                                  AS BIGINT)) AS cps
  FROM documents
), cand AS (
  SELECT doc_id, source, t, n, cps,
         list_reduce(
           list_concat([[CAST(0 AS BIGINT)]],
                       list_transform(range(1, CAST(n AS BIGINT)),
                                      k -> [k])),
           (a, b) -> CASE WHEN b[1] >= 16
                           AND ((2 * a[1]
                                 + (cps[CAST(b[1] AS INT)] * 2654435761)
                                   % 1048576) % 1048576) % 64 = 0
                     THEN list_concat(list_concat(
                            [(2 * a[1]
                              + (cps[CAST(b[1] AS INT)] * 2654435761)
                                % 1048576) % 1048576], a[2:]), [b[1]])
                     ELSE list_concat(
                            [(2 * a[1]
                              + (cps[CAST(b[1] AS INT)] * 2654435761)
                                % 1048576) % 1048576], a[2:])
                     END)[2:] AS cand
  FROM d
), cuts AS (
  -- the lambda must return a FRESH list on EVERY branch: DuckDB
  -- 1.0.0's list_reduce corrupts the fold when a branch returns the
  -- accumulator unchanged (ELSE a ==> [80] instead of [0,46,80]),
  -- so the branch moves INSIDE list_concat's second argument
  SELECT doc_id, source, t, n,
         list_reduce(
           list_concat([[CAST(0 AS BIGINT)]],
                       list_transform(cand, k -> [k])),
           (a, b) -> list_concat(a,
                       CASE WHEN b[-1] - a[-1] >= 16
                            THEN b ELSE []::BIGINT[] END)) AS cuts
  FROM cand
), chunks AS (
  SELECT source,
         unnest(list_transform(range(1, len(cuts) + 1), i ->
           substr(t, CAST(cuts[CAST(i AS INT)] + 1 AS INT),
                  CAST(list_concat(cuts, [CAST(n AS BIGINT)])
                         [CAST(i + 1 AS INT)]
                       - cuts[CAST(i AS INT)] AS INT)))) AS chunk
  FROM cuts
), per AS (
  SELECT source, chunk, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(length(chunk) AS BIGINT) AS len
  FROM chunks GROUP BY source, chunk
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(cnt * len) AS BIGINT) AS chars_total,
       CAST(SUM(len) AS BIGINT) AS chars_distinct,
       ROUND(CAST(1.0 AS DOUBLE)
             - CAST(SUM(len) AS DOUBLE) / CAST(SUM(cnt * len) AS DOUBLE),
             6) AS dedup_ratio
FROM per GROUP BY source ORDER BY source
""",
    doc="Content-defined chunking dedup scorecard (FastCDC/LBFS family "
        "— Muthitacharoen et al. SOSP'01, Xia et al. ATC'16): each doc "
        "splits at rolling-hash boundaries (gear g(c) = c*2654435761 "
        "mod 2^20, window 20, cut mask %64, min chunk 16) so chunk "
        "boundaries follow CONTENT — a one-word prefix insert shifts "
        "every fixed-size block but CDC re-synchronizes after one "
        "window and the tail chunks dedup again; per source: chunk "
        "count, distinct chunks, exact char totals, and the "
        "storage-dedup ratio.  The mod-2^20 shift-by-1 rolling hash "
        "depends on only the last 20 code points (weight 2^20 ≡ 0 "
        "drops older terms), and both engines COMPUTE it as the same "
        "single pass per document — h ← (2h + g(cp)) mod 2^20, "
        "spelled as one numpy convolve in the Arrow-batched Spark "
        "kernel and as a zero-prepended list_reduce fold in DuckDB; "
        "the min-gap rule is a greedy pass over the ~n/64 candidates; "
        "ALL arithmetic is integer (< 2^45), so the entry has no "
        "float-order hazard at all.  Scale: chunking is map-only "
        "(work ∝ input chars); only (source, chunk) rows shuffle "
        "into the two-level aggregate. operators/dedup.py:cdc_chunks.",
    tags=("dedup", "pipeline"),
)
def dedup_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = D.cdc_chunks(table(spark, sf_dir, "documents"),
                          "doc_id", "text", keep_cols=("source",))
    per = (chunks.groupBy("source", "chunk")
           .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.first("chunk_len").alias("len")))
    return (per.groupBy("source")
            .agg(F.sum("cnt").cast("bigint").alias("n_chunks"),
                 F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                 F.sum(F.col("cnt") * F.col("len")).cast("bigint")
                  .alias("chars_total"),
                 F.sum("len").cast("bigint").alias("chars_distinct"))
            .select("source", "n_chunks", "n_distinct", "chars_total",
                    "chars_distinct",
                    F.round(F.lit(1.0)
                            - F.col("chars_distinct").cast("double")
                            / F.col("chars_total").cast("double"), 6)
                     .alias("dedup_ratio"))
            .orderBy("source"))
