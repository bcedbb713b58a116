"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, fingerprinting. All pure Catalyst
expressions (JVM-side, codegen'd) — these run over every document at
100 TB, so no Python in the row path.

`md5int` is the engine's portable 60-bit hash: identical results in
Spark (conv/substring of md5) and DuckDB ('0x'||substr cast), which is
what makes MinHash/SimHash signatures oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5int(col: Column | str) -> Column:
    """First 15 hex chars of md5 as a non-negative bigint (60 bits) —
    portable across engines, uniform, deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


MD5INT_SQL = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"


# Marker stop-words per language for the n-gram-free language-ID
# heuristic (deterministic, vocabulary-based).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "zu"],
    "fr": ["le", "la", "les", "et", "est", "dans"],
    "es": ["el", "la", "los", "y", "es", "en"],
    "zh": ["de5", "shi4", "le5", "zai4"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["it", "that", "was", "for", "on", "with"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def lang_scores(col: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """Per-language marker-hit counts over whitespace tokens. An
    optional pre-projected ``toks`` column avoids re-tokenizing per
    reference; measured cost is dominated by the token-by-marker
    membership scans (a linear per-row CPU cost that parallelizes
    trivially), so this is hygiene, not a hot-path fix."""
    if toks is None:
        toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column | str, toks: Column | None = None) -> Column:
    """Predicted language: argmax marker count, ties broken by the
    fixed key order of LANG_MARKERS ('en' first)."""
    scores = lang_scores(col, toks=toks)
    langs = list(scores)
    # build a greatest-of struct trick: pick first lang achieving the max
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("unknown")
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("unknown"))


def n_tokens(col: Column | str) -> Column:
    return F.size(tokens(col))


def n_bpe_tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_RE), 0))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals plus the
    Gopher-style repetition rules (frac_unique_tokens, top_token_ratio
    — the "fraction of duplicated content" family used by production
    pretraining filters). All deterministic ratios of small-int counts
    — cross-engine exact.

    top_token_ratio's max-frequency count is computed as the longest
    run in the SORTED token array (one aggregate pass, O(n log n) per
    row) rather than the naive per-distinct-token rescan: the rescan is
    O(unique × tokens) per row — quadratic on long documents — and,
    measured, catastrophic when the expression lands inside a
    non-codegen Filter (Catalyst evaluates HOF lambdas interpreted
    there: a 10k-doc quality gate went 69s → 2s from this rewrite
    alone). Values are identical — max run length in a sorted array IS
    the max token frequency — so the DuckDB oracles are unaffected."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c))
    nt = F.size(toks)
    stop_arr = F.array(*[F.lit(m) for m in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    n_chars = F.length(c)
    uniq = F.array_distinct(toks)
    sorted_toks = F.array_sort(toks)
    top_count = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: F.when(acc["best"] > 0, acc["best"]),
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": nt.cast("long"),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(n_stop.cast("double") / F.greatest(nt, F.lit(1)), 4),
        "avg_token_len": F.round(
            (n_chars - nt + 1).cast("double") / F.greatest(nt, F.lit(1)), 4
        ),
        "frac_unique_tokens": F.round(
            F.size(uniq).cast("double") / F.greatest(nt, F.lit(1)), 4
        ),
        "top_token_ratio": F.round(
            F.coalesce(top_count, F.lit(0)).cast("double") / F.greatest(nt, F.lit(1)), 4
        ),
    }


# PII redaction rules, applied in ORDER (email/IP before the digit
# rules so address digits are consumed first; <ID> before <PHONE> so a
# 3-2-4 SSN shape is never half-eaten by the phone pattern). Patterns
# restricted to syntax with identical semantics in Java regex (Spark)
# and RE2 (DuckDB) — character classes, bounded repeats, \b — so the
# oracle can run the very same patterns.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("phone", r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Scrub PII spans (training-data hygiene pass): email addresses,
    IPv4 addresses, SSN-shaped ids, phone numbers → typed placeholder
    tokens. Pure Catalyst regexp_replace chain — JVM-side, codegen'd,
    no shuffle; the operator is a projection and composes with any
    pipeline stage."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_flags(col: Column | str) -> dict[str, Column]:
    """Pre-redaction detection flags (one INT column per rule) — the
    audit side-channel a scrubbing pass reports on."""
    c = F.col(col) if isinstance(col, str) else col
    return {f"has_{name}": c.rlike(pat).cast("int") for name, pat, _ in PII_RULES}


def fingerprint(norm_col: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set of the
    normalized text (word-order/duplication-invariant identity)."""
    toks = tokens(norm_col)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def ngram_occurrences(df, text_col: str = "text", n: int = 2):
    """Raw n-gram OCCURRENCES of the normalized text (one row per
    position, not per distinct gram — vocabulary induction counts
    frequency, unlike dedup shingling which wants per-doc sets). The
    token array is materialized in its own projection first: Catalyst
    does no subexpression elimination inside higher-order-function
    lambdas (same pitfall text_dedup.shingles documents)."""
    from .normalize import normalize_text

    words = F.col("_words")
    # sequence(1, m) DESCENDS when m < 1 — guard short docs explicitly
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.split(normalize_text(text_col), " ").alias("_words")).select(
        F.explode(grams).alias("ngram")
    )


def top_ngrams(df, text_col: str = "text", n: int = 2, k_top: int = 20):
    """Top-k n-grams by corpus frequency — the vocabulary-induction /
    corpus-profiling primitive (seed vocab for a BPE-ish tokenizer,
    boilerplate detection). groupBy(ngram) partial-aggregates map-side,
    so the shuffle carries one row per distinct gram per task; the
    top-k is a TakeOrderedAndProject (per-partition heaps, no global
    sort materialization). Ties break on the gram itself so the cut at
    rank k is deterministic in any engine."""
    return (
        ngram_occurrences(df, text_col, n)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(k_top)
    )
