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


def doc_ngram_rows(df, text_col: str = "text", n: int = 2, id_col: str = "doc_id"):
    """(id, ngram) OCCURRENCE rows of the normalized text — the keyed
    sibling of ngram_occurrences (which drops the id for corpus-wide
    profiling). One row per position; short docs (< n tokens) produce
    no rows. Same materialize-the-token-array-first discipline (no
    Catalyst subexpression elimination inside HOF lambdas)."""
    from .normalize import normalize_text

    words = F.col("_words")
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("_words")
    ).select(id_col, F.explode(grams).alias("ngram"))


def lm_doc_scores(
    df,
    train=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
):
    """Bigram language-model document scoring — the CCNet/KenLM-style
    pretraining quality stage: train add-alpha-smoothed bigram
    probabilities P(w2|w1) = (c(w1 w2) + a) / (c(w1 ·) + a·V) on
    ``train`` (defaults to ``df`` itself: self-scoring ranks documents
    by in-corpus typicality; a curated reference corpus slots in as
    ``train`` with the identical plan), then score each document by the
    mean log-probability of its bigrams and the per-token perplexity
    exp(-mean). Low avg_logp / high ppl = improbable text — the
    gibberish/boilerplate signal production filters threshold on.

    Shapes at 100 TB: the LM is bounded by the realized bigram
    vocabulary (≪ corpus — heavy-tail-truncated further by min-count
    pruning upstream if needed), so training is one partial-aggregated
    groupBy over gram occurrences and the trained table BROADCASTS to
    the scoring join; the corpus side is explode → broadcast-join →
    re-aggregate on the doc key, i.e. the document rows shuffle once on
    the id for the final mean. The vocabulary size V (one bounded
    scalar — model state, like the kmeans_fit centroids) is fetched at
    construct and embedded as a literal, keeping the plan free of the
    nested-loop join a constant-key scalar join would fold into.

    Determinism across engines: counts are exact ints, alpha=0.5 is
    binary-exact, and both engines evaluate the identical
    ln((c_big + a)/(c_ctx + a·V)) expression tree; the per-doc mean is
    rounded to 4 decimals (absorbing summation-order drift, the
    kmeans_fit argument) and ppl is exp of the ROUNDED mean rounded to
    2, so the oracle reproduces every value digit-for-digit.

    Context counts use the bigram-PREFIX count c(w1 ·) (occurrences of
    w1 as a non-final token) rather than the raw unigram count — the
    standard choice that makes the smoothed conditional sum to 1 over
    the vocabulary.

    Reference anchor: the reference's quality gate is the fuzzy-ratio
    accept/reject of processor.py:200-233 (per-record string
    plausibility vs an authority); the LM score is that same
    "plausibility against a trusted distribution" idea, trained on the
    corpus instead of hand-authored."""
    train = train if train is not None else df
    grams_t = doc_ngram_rows(train, text_col, 2, id_col)
    # localCheckpoint(eager=False): `big` feeds both the broadcast score
    # join and the c_ctx derivation below — unmaterialized, the full
    # train-corpus gram pass behind it ran twice (runtime-verified: zero
    # ReusedExchange in the executed plan). The distinct-bigram table is
    # vocabulary-bounded (the same boundedness that lets it broadcast);
    # it materializes once inside the first action.
    from ..session import lazy_local_checkpoint

    big = lazy_local_checkpoint(
        grams_t.groupBy("ngram").agg(F.count(F.lit(1)).alias("c_big"))
    )
    # c_ctx(w1) = occurrences of w1 as a bigram prefix = sum of c_big
    # over bigrams starting with w1 — identical values to counting the
    # raw gram stream, but computed from the (distinct-bigram-sized)
    # aggregate instead of a SECOND normalize+explode pass over the
    # whole train corpus (guide §1.2: don't recompute what a cheaper
    # equivalent derivation gives; one full corpus scan saved).
    ctx = (
        big.select(F.split(F.col("ngram"), " ")[0].alias("w1"), "c_big")
        .groupBy("w1")
        .agg(F.sum("c_big").alias("c_ctx"))
    )
    from .normalize import normalize_text

    # V is ONE bounded scalar (the kmeans_fit precedent: the model may
    # live on the driver) — fetched at construct and embedded as a
    # literal. A constant-key join would constant-fold to a
    # BroadcastNestedLoopJoin (test_plan_quality forbids the shape) and
    # a window needs a countDistinct windows don't support.
    v_scalar = (
        train.select(F.explode(F.split(normalize_text(text_col), " ")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
        .first()["v"]
    )
    # score-side joins are LEFT with coalesce-to-0 counts so a bigram
    # (or context) unseen in a SEPARATE train corpus falls back to the
    # smoothed floor a/(c_ctx + a·V) (and a/(a·V) = 1/V when the
    # context itself is unseen) instead of silently dropping out; with
    # train = df every gram matches and the joins behave as inner
    grams_d = doc_ngram_rows(df, text_col, 2, id_col).withColumn(
        "w1", F.split(F.col("ngram"), " ")[0]
    )
    joined = grams_d.join(F.broadcast(big), "ngram", "left").join(
        F.broadcast(ctx), "w1", "left"
    )
    logp = F.log(
        (F.coalesce(F.col("c_big"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(alpha) * F.lit(v_scalar))
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(logp), 4).alias("avg_logp"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        "avg_logp",
        F.round(F.exp(-F.col("avg_logp")), 2).alias("ppl"),
    )


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
):
    """Overlapping fixed-stride chunking of the normalized token
    stream — the windowing stage an embedding/RAG pipeline runs before
    vectorizing long documents (stride < window ⇒ consecutive chunks
    overlap by window-stride tokens, so no boundary-straddling span is
    lost to every chunk). Chunk starts are the deterministic grid
    1, 1+stride, 1+2·stride, … up to the last start ≤ n, each chunk
    clamped to the document end — short tails are emitted, empty docs
    emit nothing. Returns (id, chunk_idx, start_tok, n_chunk_tokens,
    chunk_text).

    Pure projection + explode: no shuffle anywhere — at 100 TB this is
    a map-only pass whose output fans out ~n_tokens/stride rows per
    doc. The token array materializes in its own projection before the
    chunk-building lambda (no Catalyst subexpression elimination
    inside HOF lambdas — the shingles() lesson)."""
    from pyspark.sql import functions as F

    from .normalize import normalize_text

    if not (0 < stride <= window):
        raise ValueError("chunk_documents: need 0 < stride <= window")
    toks = F.filter(
        F.split(normalize_text(text_col), " "), lambda x: x != F.lit("")
    )
    t = F.col("_t")
    n = F.size(t)
    chunks = F.when(
        n >= 1,
        F.transform(
            F.sequence(
                F.lit(0), F.floor((n - 1) / F.lit(stride)).cast("int")
            ),
            lambda i: F.struct(
                i.alias("chunk_idx"),
                (i * stride + 1).alias("start_tok"),
                F.size(F.slice(t, i * stride + 1, window)).alias("n_chunk_tokens"),
                F.concat_ws(" ", F.slice(t, i * stride + 1, window)).alias(
                    "chunk_text"
                ),
            ),
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<chunk_idx:int,start_tok:int,"
            "n_chunk_tokens:int,chunk_text:string>>"
        )
    )
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.start_tok").alias("start_tok"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )
