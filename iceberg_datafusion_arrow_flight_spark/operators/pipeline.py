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

from .partitioning import fan_out

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


# --- decontamination ----------------------------------------------------

def decontaminate(corpus: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """Benchmark-contamination scan: for every corpus document, the
    fraction of its DISTINCT token n-grams that also occur anywhere in
    the benchmark set (the pre-training hygiene check run before a
    benchmark is trusted).

    Scale shape: the benchmark side collapses to a DISTINCT gram set and
    broadcasts (benchmark suites are ~MBs even when the corpus is 100 TB),
    so the corpus is never self-joined and never shuffled on gram — the
    only wide exchange is the per-document aggregate on ``id_col``.
    Returns (id, n_grams, n_hit, contamination) for contaminated docs.
    """
    g = T.token_ngrams(F.col(text_col), n)
    cg = (fan_out(corpus).select(F.col(id_col), F.explode(g).alias("g"))
          .distinct())
    bg = bench.select(F.explode(g).alias("g")).distinct()
    return (
        cg.join(F.broadcast(bg.withColumn("__hit", F.lit(1))), "g", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"),
             F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint")
              .alias("n_hit"))
        .where(F.col("n_hit") > 0)
        .withColumn("contamination",
                    F.round(F.col("n_hit") / F.col("n_grams"), 4))
    )


# --- repetition (Gopher-style) ------------------------------------------

def top_ngram_repetition(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Gopher-style repetition signal: per document, the share of all
    token n-grams (counted WITH duplicates) taken by the single most
    frequent one; boilerplate/templated docs score high.  Ties break to
    the lexicographically smallest gram so output is deterministic.

    Scale shape: explode → two keyed exchanges (gram count on
    (id, gram), then the per-doc window) — state per doc is its
    distinct-gram set, never a global structure."""
    grams = fan_out(df).select(F.col(id_col),
                               F.explode(T.token_ngrams(F.col(text_col), n)).alias("g"))
    counts = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = Window.partitionBy(id_col)
    ranked = (counts
              .withColumn("n_grams", F.sum("c").over(per_doc))
              .withColumn("__rn", F.row_number().over(
                  per_doc.orderBy(F.col("c").desc(), F.col("g")))))
    return (ranked.where(F.col("__rn") == 1)
            .select(F.col(id_col), F.col("g").alias("top_gram"),
                    F.col("c").cast("bigint").alias("top_count"),
                    F.col("n_grams").cast("bigint").alias("n_grams"),
                    F.round(F.col("c") / F.col("n_grams"), 4)
                     .alias("top_frac")))


# --- Gopher rule filter (Rae et al. 2021, table A1) ---------------------

_GOPHER_STOPWORDS = ("the", "a")


def gopher_rules(df: DataFrame, text_col: str = "text",
                 min_words: int = 25, max_words: int = 90,
                 min_mwl: float = 4.3, max_mwl: float = 4.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """Gopher-style per-document quality rules, adapted to whitespace
    tokens: word-count band, mean-word-length band, and a minimum
    stop-word hit count.  Adds the measured signals plus one boolean
    column per rule and a combined ``kept`` flag.

    Scale shape: a pure projection — every signal is a codegen'd
    expression over the token array (no explode, no shuffle, no Python),
    so the rule pass rides along with whatever scan already reads the
    text column.  Thresholds are tuned to the fixture's token-length
    distribution (p5-p95 = 16-94 words) so each rule has teeth.
    """
    toks = T.ws_tokens(F.col(text_col))
    n_words = F.size(toks)
    # Left-to-right fold of integer lengths in a double accumulator:
    # exact in both engines, so the band compare needs no rounding.
    mwl = (F.aggregate(toks, F.lit(0.0),
                       lambda acc, x: acc + F.length(x)) / n_words)
    stop_hits = F.size(F.filter(
        toks, lambda x: x.isin(*_GOPHER_STOPWORDS)))
    out = (df
           .withColumn("n_words", n_words.cast("bigint"))
           .withColumn("mean_word_len", mwl)
           .withColumn("stop_hits", stop_hits.cast("bigint")))
    ok_words = F.col("n_words").between(min_words, max_words)
    ok_mwl = F.col("mean_word_len").between(min_mwl, max_mwl)
    ok_stop = F.col("stop_hits") >= min_stop_hits
    return (out
            .withColumn("ok_words", ok_words)
            .withColumn("ok_mwl", ok_mwl)
            .withColumn("ok_stop", ok_stop)
            .withColumn("kept", ok_words & ok_mwl & ok_stop))


# --- corpus boilerplate span mining (C4-style, token-span unit) ---------

def boilerplate_spans(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 8,
                      min_freq: int = 2,
                      carry: tuple[str, ...] = ()) -> DataFrame:
    """C4-style boilerplate detection re-based on token spans: a span is
    an ``n``-token gram; spans occurring ``min_freq``+ times corpus-wide
    are boilerplate, and every document is scored by the fraction of its
    gram INSTANCES that are boilerplate (its templated share).

    Scale shape: one gram-keyed aggregate (map-side partial combine)
    mines the frequent-span set — which is small by construction
    (boilerplate is the heavy-hitter tail, and min_freq bounds it) — and
    that set broadcasts back onto the gram stream, so the corpus is
    never self-joined on gram and the only wide exchange is the per-doc
    re-aggregate.  Documents shorter than ``n`` tokens have no spans and
    drop out (mirrored by the oracle's CASE len(t) >= n guard).
    """
    g = T.token_ngrams(F.col(text_col), n)
    grams = fan_out(df).select(
        F.col(id_col), *[F.col(c) for c in carry], F.explode(g).alias("g"))
    frequent = (grams.groupBy("g")
                .agg(F.count(F.lit(1)).alias("freq"))
                .where(F.col("freq") >= min_freq)
                .select("g", F.lit(1).alias("__boiler")))
    return (grams.join(F.broadcast(frequent), "g", "left")
            .groupBy(id_col, *carry)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"),
                 F.sum(F.coalesce(F.col("__boiler"), F.lit(0)))
                  .cast("bigint").alias("n_boiler"))
            .withColumn("boiler_frac",
                        F.round(F.col("n_boiler") / F.col("n_grams"), 4)))


# --- stratified / balanced sampling -------------------------------------

def balanced_sample(df: DataFrame, strata_col: str = "lang",
                    id_col: str = "doc_id") -> DataFrame:
    """Language-balanced downsample: every stratum keeps exactly
    min-stratum-count rows, chosen by ranking the Knuth hash of the id
    (tie-broken by id) inside each stratum — deterministic across runs,
    engines, and partitionings, unlike rand()-based sampling.

    Scale shape: one window sort per stratum (the shuffle a stratified
    sample fundamentally needs) plus a broadcast single-row target; no
    driver-side stratum table."""
    target = (df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__c"))
              .agg(F.min("__c").alias("__target")))
    w = Window.partitionBy(strata_col).orderBy(
        split_bucket(F.col(id_col), _MOD), F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .join(F.broadcast(target))
            .where(F.col("__rn") <= F.col("__target"))
            .drop("__rn", "__target"))


# --- PII detection / redaction ------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (regex valid in BOTH Java regex and RE2, replacement tag)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"555-[0-9]{4}", "<PHONE>"),
    "ip": (r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category PII match counts (codegen'd regexp_count)."""
    return {name: F.regexp_count(col, F.lit(pat)).cast("bigint")
            for name, (pat, _tag) in PII_PATTERNS.items()}


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its category tag.  Sequential
    regexp_replace chain — all JVM-side, no Python in the loop."""
    out = col
    for pat, tag in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, tag)
    return out


# --- data-quality profiling / validation --------------------------------

def profile_columns(df: DataFrame, cols: list[str] | None = None,
                    exact_distinct: bool = True) -> DataFrame:
    """One-pass column profiler (the deequ/TFDV analyzer shape): per
    column — row count, null count, distinct count, min, max (min/max
    cast to string so one tall schema fits every column type).

    Scale: ONE aggregate job over the data.  Multiple exact
    COUNT(DISTINCT) in one pass plan as a Catalyst Expand (k× the scan
    rows through the partial aggregate, still map-side combined);
    ``exact_distinct=False`` swaps in approx_count_distinct (HLL, no
    Expand) — the 100 TB default, the exact form is the oracle path."""
    cols = cols or df.columns
    nd = (F.count_distinct if exact_distinct
          else lambda c: F.approx_count_distinct(c))
    row = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        *[e for c in cols for e in (
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .cast("bigint").alias(f"__null_{c}"),
            nd(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        )])
    per_col = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("__n").alias("n_rows"),
                 F.col(f"__null_{c}").alias("n_nulls"),
                 F.col(f"__nd_{c}").alias("n_distinct"),
                 F.col(f"__min_{c}").alias("min_value"),
                 F.col(f"__max_{c}").alias("max_value"))
        for c in cols])
    return (row.select(F.explode(per_col).alias("m")).select("m.*"))


def check_constraints(df: DataFrame,
                      checks: list[tuple[str, Column]]) -> DataFrame:
    """Declarative data-quality gate: each check is (name, row-level
    boolean Column); emits one row per check with the violation count
    and pass flag.  All checks evaluate in ONE aggregate pass (no
    per-check jobs — the mistake that makes naive validators O(checks)
    scans at 100 TB)."""
    row = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        *[F.sum(F.when(~cond, 1).otherwise(0)).cast("bigint")
           .alias(f"__viol_{i}") for i, (_, cond) in enumerate(checks)])
    per_check = F.array(*[
        F.struct(F.lit(name).alias("check"),
                 F.col("__n").alias("n_rows"),
                 F.col(f"__viol_{i}").alias("n_violations"),
                 (F.col(f"__viol_{i}") == 0).alias("passed"))
        for i, (name, _) in enumerate(checks)])
    return row.select(F.explode(per_check).alias("m")).select("m.*")


# --- deterministic weighted sampling ------------------------------------

_WS_MAX_WEIGHT = 16


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int) -> DataFrame:
    """Deterministic weighted sampling without replacement: top-k by a
    per-row key whose distribution matches integer-weighted A-Res
    (Efraimidis–Spirakis) — but with NO transcendentals, so any engine
    reproduces the exact sample.

    The trick: a weight-w row's key is the MAX of w independent
    md5-derived uniforms (max of w uniforms ~ u^(1/w), the A-Res key),
    computed as ``greatest`` over a static bound of ``_WS_MAX_WEIGHT``
    hash slots gated by the weight.  log/pow keys differ in the last ulp
    across libms and can flip selection at the boundary; integer hash
    comparisons cannot.

    Scale: the key is a pure projection; selection is a global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort).
    Weights are small positive ints (repetition factors / domain
    priorities), capped at 16."""
    wcol = F.col(weight_col).cast("int")
    slots = [
        F.when(F.lit(j) < wcol,
               F.conv(F.substring(
                   F.md5(F.concat(F.lit("ws|"),
                                  F.col(id_col).cast("string"),
                                  F.lit("|"), F.lit(str(j)))), 1, 15),
                   16, 10).cast("bigint"))
        .otherwise(F.lit(-1).cast("bigint"))
        for j in range(_WS_MAX_WEIGHT)]
    return (df.withColumn("__key", F.greatest(*slots))
            .orderBy(F.col("__key").desc(), F.col(id_col))
            .limit(k)
            .drop("__key"))


# --- context-window document chunking -----------------------------------

def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 32,
                    stride: int = 24) -> DataFrame:
    """Split each document into overlapping token windows — the
    context-window chunking step of pretraining/RAG ingestion
    (``stride < chunk_tokens`` gives the overlap that keeps spans from
    being cut at hard boundaries).

    Pure projection + one explode: chunk starts come from a strided
    ``sequence``, each chunk reassembles via ``slice`` + ``concat_ws``
    inside codegen — no shuffle at all; the operator parallelizes with
    the scan.  Emits (id, chunk_idx, n_tokens, chunk_text)."""
    toks = F.split(F.col(text_col), r"\s+")
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
    n = F.size("__t")
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: s < n)
    chunk = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.least(F.lit(chunk_tokens), n - s).cast("int")
             .alias("n_tokens"),
            F.concat_ws(" ", F.slice("__t", s + 1, chunk_tokens))
             .alias("chunk_text")))
    return (base.select("__id", F.explode(chunk).alias("c"))
            .select(F.col("__id").alias(id_col),
                    "c.chunk_idx", "c.n_tokens", "c.chunk_text"))


def pack_boundary_accounting(df: DataFrame, token_budget: int = 512,
                             shard_col: str = "lang",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Tokenizer-aware packing audit: where does each document land in
    the fixed-length training sequences, and what does the boundary
    policy cost?

    Uses the BPE-ish subword count (``text.subword_count`` — word
    fragments <=4 chars + punctuation, the cheap tokenizer-load proxy)
    rather than whitespace words, because packing decisions in a real
    pipeline are made in TOKENIZER units.  Within each shard (ordered by
    id) the running subword offset places a document at
    ``[start, start + n)``; a document whose span crosses a
    ``token_budget`` boundary is a *boundary crossing*, and
    ``boundary_loss`` counts the tokens past the first boundary — the
    tokens a truncate-at-boundary policy would drop (equivalently, the
    cross-sequence attention a split policy would sever).

    One window cumsum per shard, pure projections after it — shards
    audit independently, so window state stays bounded at 100 TB.
    Emits per-doc (shard, id, n_tokens, start_bin, end_bin, crosses,
    boundary_loss)."""
    toks = T.subword_count(F.col(text_col))
    w = (Window.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(toks).over(w)
    base = df.select(F.col(shard_col), F.col(id_col),
                     toks.alias("n_tokens"), cum.alias("cum_tokens"))
    start = F.col("cum_tokens") - F.col("n_tokens")
    eff = F.greatest(F.col("n_tokens"), F.lit(1))  # 0-token doc: 1 slot
    start_bin = F.floor(start / token_budget)
    end_bin = F.floor((start + eff - 1) / token_budget)
    return (base
            .withColumn("start_bin", start_bin.cast("bigint"))
            .withColumn("end_bin", end_bin.cast("bigint"))
            .withColumn("crosses",
                        F.col("end_bin") > F.col("start_bin"))
            .withColumn(
                "boundary_loss",
                F.when(F.col("crosses"),
                       start + F.col("n_tokens")
                       - (F.col("start_bin") + 1) * token_budget)
                 .otherwise(F.lit(0)).cast("bigint")))


def derive_urls(df: DataFrame, id_col: str = "doc_id",
                source_col: str = "source",
                lang_col: str = "lang") -> DataFrame:
    """Deterministic provenance URL per document (the fixture carries
    no URL column; a crawl corpus would).  Shape mirrors a real crawl
    record: scheme + www host derived from the source, path carrying
    lang and id, and a tracking query string the canonicalizer must
    strip.  Pure projection."""
    url = F.concat(F.lit("https://www."), F.col(source_col),
                   F.lit(".example.com/"), F.col(lang_col),
                   F.lit("/doc-"), F.col(id_col).cast("string"),
                   F.lit("?utm_source=crawl&session=42"))
    return df.withColumn("url", url)


def url_domain_filter(df: DataFrame,
                      blocked_domains: list[str],
                      blocked_path_terms: list[str],
                      url_col: str = "url") -> DataFrame:
    """C4-style URL/domain filtering: parse host + path out of the URL
    (JVM ``parse_url``), canonicalize the host (lowercase, strip one
    leading ``www.``), then flag (a) blocklisted registered domains and
    (b) blocklisted path substrings (C4 dropped pages whose URL hit a
    banned-word list).  Emits the input plus ``domain``,
    ``blocked_domain``, ``blocked_path``, ``kept`` — a pure projection
    (the blocklists ride inside the plan as literals; at a realistic
    blocklist size they'd broadcast-join instead), so the filter
    parallelizes with the scan and pushes nothing across the wire."""
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    domain = F.regexp_replace(host, r"^www\.", "")
    path = F.lower(F.parse_url(F.col(url_col), F.lit("PATH")))
    bad_dom = F.array_contains(
        F.array(*[F.lit(d.lower()) for d in blocked_domains]), domain)
    bad_path = None
    for t in blocked_path_terms:
        hit = path.contains(t.lower())
        bad_path = hit if bad_path is None else (bad_path | hit)
    if bad_path is None:
        bad_path = F.lit(False)
    return (df.withColumn("domain", domain)
            .withColumn("blocked_domain", bad_dom)
            .withColumn("blocked_path", bad_path)
            .withColumn("kept", ~bad_dom & ~bad_path))


def canonicalize_url(url: Column) -> Column:
    """Canonical dedup key for a crawl URL: scheme dropped, host
    lowercased with one leading ``www.`` stripped, query string and
    fragment removed, trailing slash trimmed.  The key under which
    ``http://WWW.Site.com/a/?utm=1`` and ``https://site.com/a`` are the
    same page — the cheapest, highest-yield dedup pass a crawl corpus
    gets before any content hashing.  Pure string projection."""
    no_scheme = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    no_qf = F.regexp_replace(no_scheme, r"[?#].*$", "")
    host = F.lower(F.regexp_extract(no_qf, r"^([^/]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(no_qf, r"^[^/]*(.*)$", 1)
    path = F.regexp_replace(path, r"/$", "")
    return F.concat(host, path)


def stratified_allocation(df: DataFrame, strata_col: str, id_col: str,
                          budget: int) -> DataFrame:
    """Exact proportional stratified sample to a FIXED total budget via
    the largest-remainder (Hamilton) method, all in integer arithmetic:
    stratum s with c_s of T rows gets base_s = floor(budget·c_s / T);
    the leftover budget − Σ base_s seats go to the strata with the
    largest integer remainders budget·c_s mod T (ties by stratum value
    ascending) — so allocations always sum EXACTLY to the budget, the
    property per-stratum rounding cannot give.  Within each stratum the
    kept rows are the allocation-smallest by Knuth hash of the id
    (tie-broken by id) — deterministic across runs, engines, and
    partitionings.

    Scale shape: the allocation is computed on the stratum-count table
    (tiny — one row per stratum) and broadcast back; the per-row work
    is one window rank per stratum, the shuffle a stratified sample
    fundamentally needs.  No fractions anywhere: remainder comparison
    uses budget·c_s mod T, avoiding float division entirely."""
    counts = (df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__c")))
    total = counts.agg(F.sum("__c").alias("__t"))
    # Spark's `div` is true INTEGER division — exact at any stratum
    # size, where a double round-trip would lose exactness past 2^53:
    alloc = (counts.join(F.broadcast(total))
             .select(strata_col, "__c", "__t",
                     F.expr(f"(__c * {budget}) div __t")
                     .cast("bigint").alias("__base"),
                     ((F.col("__c") * budget) % F.col("__t"))
                     .alias("__rem")))
    leftover = (alloc.agg((F.lit(budget) - F.sum("__base"))
                          .alias("__left")))
    w_rem = Window.orderBy(F.col("__rem").desc(), F.col(strata_col))
    final = (alloc.join(F.broadcast(leftover))
             .withColumn("__rk", F.row_number().over(w_rem))
             .select(strata_col,
                     (F.col("__base")
                      + F.when(F.col("__rk") <= F.col("__left"), 1)
                         .otherwise(0)).alias("__alloc")))
    w = Window.partitionBy(strata_col).orderBy(
        split_bucket(F.col(id_col), _MOD), F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .join(F.broadcast(final), strata_col)
            .where(F.col("__rn") <= F.col("__alloc"))
            .drop("__rn")
            .withColumnRenamed("__alloc", "allocation"))


def distill_quality_logreg(df: DataFrame, iterations: int = 8,
                           lr: float = 4.0,
                           text_col: str = "text") -> DataFrame:
    """Distill the Gopher rule cascade into a linear quality scorer —
    the fastText-style pattern every production LLM-data pipeline runs
    (CCNet, LLaMA, RedPajama): an expensive filter labels a sample, a
    cheap classifier learns to mimic it, and THE CLASSIFIER runs over
    the full crawl.  Here the teacher is :func:`gopher_rules`' ``kept``
    flag and the student is logistic regression over three surface
    features (scaled word count, mean word length, stop-word hits) —
    exactly the signals the rules threshold, so the sigmoid learns a
    soft version of the AND-of-bands decision surface.

    Training is full-batch gradient descent, distributed the way GD
    actually distributes: each iteration is ONE map-side-combinable
    aggregate over the feature table (per-partition partial sums of the
    d+1 gradient components, loss, and confusion counts — a single
    d+6-double row per partition crosses the wire), and the driver
    holds only the weight vector (d+1 floats, the textbook bounded
    driver state; the feature table is materialized ONCE and re-scanned
    per iteration with flat lineage).

    Cross-engine determinism — the entry is ORDER-INDEPENDENT, not just
    rounded: the one transcendental, σ(z) over the fixed-order exact
    double z = w·x, is rounded to 8 digits immediately, making the
    per-row error e = σ−y an exact 8-digit decimal; features are exact
    scaled integers (n_words, mwl·10^6, stop_hits); so every gradient
    NUMERATOR Σ e·x is an exact INTEGER sum, carried in decimal(38,0)
    here and HUGEINT in the oracle — no float summation order anywhere.
    Per-row log-loss is likewise folded to integer 10^-8 units after
    rounding.  Gradient means divide the exact numerator by a
    deterministic double denominator and round to 8; the weight update
    w ← w − 4·g (integer lr) is then CLOSED over 8-digit decimals
    (ROUND(·,10) merely cleans float representation
    — there is no half-boundary to disagree on), mirrored by
    decimal.Decimal HALF_UP here and ROUND() in-engine.  The
    0.5-threshold confusion counts compare z ≥ 0 — exact.

    Returns one row per iteration: loss + confusion at the PRE-update
    weights, then the POST-update weights — the whole training curve as
    a hash-comparable table."""
    from decimal import Decimal, ROUND_HALF_UP

    from .materialize import materialize

    spark = df.sparkSession
    feats = (gopher_rules(df, text_col)
             .select(F.col("n_words").alias("n1"),
                     F.round(F.col("mean_word_len") * F.lit(1e6), 0)
                      .cast("bigint").alias("m6"),
                     F.col("stop_hits").alias("s1"),
                     F.when(F.col("kept"), F.lit(1)).otherwise(F.lit(0))
                      .cast("bigint").alias("y"))
             .transform(materialize))

    def r10(v: float) -> float:
        return float(Decimal(repr(v)).quantize(Decimal("1e-10"),
                                               rounding=ROUND_HALF_UP))

    dec = "decimal(38,0)"
    w = [0.0, 0.0, 0.0, 0.0]
    log = []
    for t in range(1, iterations + 1):
        z = (F.lit(w[0])
             + F.lit(w[1]) * (F.col("n1").cast("double") / F.lit(100.0))
             + F.lit(w[2]) * (F.col("m6").cast("double") / F.lit(1e7))
             + F.lit(w[3]) * (F.col("s1").cast("double") / F.lit(10.0)))
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 8)
        pc = F.least(F.greatest(p, F.lit(1e-8)), F.lit(1.0) - F.lit(1e-8))
        e8 = (F.round(p * F.lit(1e8), 0).cast("bigint")
              - F.col("y") * F.lit(100000000))
        l8 = F.round(-(F.col("y").cast("double") * F.log(pc)
                       + (F.lit(1.0) - F.col("y").cast("double"))
                       * F.log(F.lit(1.0) - pc)) * F.lit(1e8), 0) \
              .cast("bigint")
        row = (feats.select(
            e8.alias("e8"), l8.alias("l8"), z.alias("z"),
            F.col("n1"), F.col("m6"), F.col("s1"), F.col("y"))
            .agg(F.count(F.lit(1)).cast("double").alias("n"),
                 F.sum(F.col("e8").cast(dec)).alias("G0"),
                 F.sum((F.col("e8") * F.col("n1")).cast(dec)).alias("G1"),
                 F.sum((F.col("e8") * F.col("m6")).cast(dec)).alias("G2"),
                 F.sum((F.col("e8") * F.col("s1")).cast(dec)).alias("G3"),
                 F.sum(F.col("l8").cast(dec)).alias("L"),
                 F.sum(F.when((F.col("y") == 1) & (F.col("z") >= 0), 1)
                        .otherwise(0)).cast("bigint").alias("tp"),
                 F.sum(F.when((F.col("y") == 0) & (F.col("z") >= 0), 1)
                        .otherwise(0)).cast("bigint").alias("fp"),
                 F.sum(F.when((F.col("y") == 0) & (F.col("z") < 0), 1)
                        .otherwise(0)).cast("bigint").alias("tn"),
                 F.sum(F.when((F.col("y") == 1) & (F.col("z") < 0), 1)
                        .otherwise(0)).cast("bigint").alias("fn"))
            .select(
                F.round(F.col("G0").cast("double")
                        / (F.col("n") * F.lit(1e8)), 8).alias("g0"),
                F.round(F.col("G1").cast("double")
                        / (F.col("n") * F.lit(1e10)), 8).alias("g1"),
                F.round(F.col("G2").cast("double")
                        / (F.col("n") * F.lit(1e15)), 8).alias("g2"),
                F.round(F.col("G3").cast("double")
                        / (F.col("n") * F.lit(1e9)), 8).alias("g3"),
                F.round(F.col("L").cast("double")
                        / (F.col("n") * F.lit(1e8)), 6).alias("loss"),
                "tp", "fp", "tn", "fn")
            .first())
        w = [r10(w[0] - lr * row["g0"]), r10(w[1] - lr * row["g1"]),
             r10(w[2] - lr * row["g2"]), r10(w[3] - lr * row["g3"])]
        log.append((t, row["loss"], row["tp"], row["fp"], row["tn"],
                    row["fn"], w[0], w[1], w[2], w[3]))
    return spark.createDataFrame(
        log, "iter int, loss double, tp bigint, fp bigint, tn bigint, "
             "fn bigint, w_bias double, w_words double, w_mwl double, "
             "w_stop double")
