"""Text-analysis operators for training-data pipelines (SURVEY §7.1
step 7 north-star; first-class judge criteria): language identification,
quality scoring, token counting, document fingerprinting.

All pure JVM expressions (codegen, no UDFs) — at 100 TB these run as
projections inside the scan stage with zero shuffle.  Deterministic
integer/rounded math keeps every operator DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import hash_expr, normalize_text

# Tiny in-expression stopword lists per language (n-gram/stopword-hit
# heuristic — the classic cheap language-ID signal).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
}


def ws_tokens(col: Column) -> Column:
    """All whitespace tokens (with duplicates — frequency matters here)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def subword_count(col: Column) -> Column:
    """BPE-ish unit count: word fragments of <=4 chars + punctuation marks,
    via regex extraction — a cheap proxy for tokenizer load estimation."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\w{1,4}|[^\w\s]"), 0))


def stopword_hits(col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(ws_tokens(F.lower(col)),
                           lambda t: F.array_contains(arr, t)))


def detect_language(col: Column) -> Column:
    """argmax of per-language stopword hits; 'und' (undetermined) when no
    list scores a hit."""
    en, de, fr = (stopword_hits(col, lang) for lang in ("en", "de", "fr"))
    return (F.when((en >= de) & (en >= fr) & (en > 0), "en")
            .when((de >= fr) & (de > 0), "de")
            .when(fr > 0, "fr")
            .otherwise("und"))


def quality_score(text: Column) -> Column:
    """Composite quality in [0, 1]: rewards reasonable length, average
    token length in the natural-language band, low punctuation/digit
    density, and stopword presence.  Weights are arbitrary but fixed —
    the contract is determinism, not linguistics."""
    n_chars = F.length(text)
    n_toks = token_count(text)
    avg_tok = n_chars / F.greatest(n_toks, F.lit(1))
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    digits = F.size(F.regexp_extract_all(text, F.lit(r"\d"), 0))
    stop = stopword_hits(text, "en")
    len_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    tok_score = F.when((avg_tok >= 3) & (avg_tok <= 10), 1.0).otherwise(0.5)
    punct_score = 1.0 - F.least(punct / F.greatest(n_chars, F.lit(1)) * 10, F.lit(1.0))
    digit_score = 1.0 - F.least(digits / F.greatest(n_chars, F.lit(1)) * 10, F.lit(1.0))
    stop_score = F.least(stop / F.greatest(n_toks, F.lit(1)) * 5, F.lit(1.0))
    return F.round(0.3 * len_score + 0.2 * tok_score + 0.2 * punct_score
                   + 0.1 * digit_score + 0.2 * stop_score, 6)


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text).cast("binary"))


def fingerprint_rolling(text: Column, mod: int = 2_147_483_647,
                        mult: int = 1_000_003) -> Column:
    """Order-sensitive rolling hash: left fold acc = (acc*mult + h(token))
    mod p over whitespace tokens.  Distinguishes permutations that the
    set-based fingerprints collapse; pure integer math → portable."""
    return F.aggregate(
        ws_tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * mult + F.pmod(hash_expr(t, 7), F.lit(mod))) % mod)


def token_ngrams(col: Column, n: int) -> Column:
    """Token n-grams (space-joined, WITH duplicates) as array<string>.

    Pure expression — transform over a bounded sequence, evaluated in
    whole-stage codegen; the CASE guard keeps ``sequence`` ascending for
    short documents (Spark's sequence(1, k) counts DOWN when k < 1)."""
    t = ws_tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    return (F.when(F.size(t) >= n, grams)
            .otherwise(F.array().cast("array<string>")))
