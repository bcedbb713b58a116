"""Distributed byte-pair-encoding (BPE) training — the tokenizer-
construction stage of a pretraining pipeline (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016): start
from characters, repeatedly merge the most frequent adjacent symbol
pair, weighted by word frequency.

Training follows the kmeans_fit recipe — the MODEL lives on the driver
(one (pair, count) row per round, bounded by n_merges), the DATA never
leaves the cluster:

- the corpus collapses ONCE to the distinct-word frequency table (the
  classic BPE preprocessing; at 100 TB the word table is orders of
  magnitude smaller than the corpus and is the only thing the rounds
  touch — it is persisted so rounds read memory);
- each round is one job: adjacent-pair counts over the symbolized words
  (explode → partial-agg groupBy, shuffle bounded by the realized pair
  vocabulary), then a deterministic argmax (count desc, pair asc)
  collected to the driver;
- applying the learned merges is a chain of LITERAL string replaces —
  a pure projection, engine-portable, replayed digit-for-digit by the
  DuckDB oracle's unrolled per-round CTEs.

Symbol strings use the double-bar encoding ``||a||b||c||``: every
boundary carries two bars, and the merge replace ``|a||b|`` → ``|ab|``
consumes one bar from each side, leaving one to serve the neighboring
occurrence — so plain left-to-right non-overlapping ``replace()``
(identical semantics in Spark and DuckDB) merges consecutive
occurrences correctly without regex lookahead (which RE2 lacks).

Reference anchor: the reference has no tokenizer, but its closest
shape is the iterative normalize-then-classify chain of
processors/utils (string pipelines with fixed rule order); BPE is that
same deterministic rewrite-chain idea with the rules LEARNED from the
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .normalize import normalize_text


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, n): distinct normalized tokens with corpus frequencies —
    the one corpus-wide shuffle of the whole trainer."""
    return (
        df.select(F.explode(F.split(normalize_text(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _sym_expr(merges: list[tuple[str, str]]):
    """The symbolization of column ``w`` with ``merges`` applied in
    order: '||' + every char followed by '||', then the literal
    double-bar replaces."""
    e = F.concat(F.lit("||"), F.regexp_replace(F.col("w"), "(.)", "$1||"))
    for a, b in merges:
        e = F.replace(e, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    return e


def _pair_rows(wc: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(a, b, c): adjacent-symbol pair counts weighted by word
    frequency, under the current merge list. Token arrays materialize
    in their own projection before the pair-building lambda (no
    Catalyst subexpression elimination inside HOF lambdas)."""
    toks = F.filter(F.split(_sym_expr(merges), r"\|\|"), lambda x: x != F.lit(""))
    t = F.col("t")
    prs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("a"), F.element_at(t, i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        wc.select("n", toks.alias("t"))
        .select("n", F.explode(prs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("c"))
    )


def bpe_fit(
    df: DataFrame, text_col: str = "text", n_merges: int = 6
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merge rules; returns [(a, b, count), ...] in
    learned order. Ties break (count desc, a asc, b asc) so the
    schedule is deterministic in any engine. Stops early (shorter
    list) only if the pair space is exhausted."""
    wc = word_frequencies(df, text_col).persist()
    try:
        wc.count()  # materialize once; every round reads memory
        merges: list[tuple[str, str]] = []
        out: list[tuple[str, str, int]] = []
        for _ in range(n_merges):
            row = (
                _pair_rows(wc, merges)
                .orderBy(F.col("c").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not row:
                break
            a, b, c = row[0]["a"], row[0]["b"], int(row[0]["c"])
            merges.append((a, b))
            out.append((a, b, c))
        return out
    finally:
        wc.unpersist()


def bpe_vocab(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    k_top: int = 30,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Train (or take) the merge list, apply it to the word table, and
    return the top-k resulting subword symbols by corpus frequency:
    (symbol, n), deterministic (n desc, symbol asc) cut. The
    oracle-checkable surface of the trainer — a wrong rule in any
    round produces a different vocabulary."""
    if merges is None:
        merges = [(a, b) for a, b, _ in bpe_fit(df, text_col, n_merges)]
    wc = word_frequencies(df, text_col)
    toks = F.filter(F.split(_sym_expr(merges), r"\|\|"), lambda x: x != F.lit(""))
    return (
        wc.select("n", toks.alias("t"))
        .select("n", F.explode(F.col("t")).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "symbol")
        .limit(k_top)
    )


def bpe_doc_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 6,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Corpus-scale tokenization by VOCABULARY LOOKUP: symbolize the
    distinct-word table once with the learned merges (a bounded,
    projection-only pass), then join each document's token stream
    against it — per-doc subword budgets (the number that sizes a
    training run) without re-running the merge chain per occurrence.
    Returns (id, n_words, n_subwords); empty docs produce no row.

    Scale shape: the subword-count side is the WORD table (one row per
    distinct normalized token), broadcast here under the bounded-vocab
    assumption the BPE preprocessing already makes; a corpus whose
    realized vocabulary outgrows a broadcast drops the hint and the
    probe becomes a plain equi-join on the token — either way the doc
    side shuffles only for its final per-doc aggregation."""
    if merges is None:
        merges = [(a, b) for a, b, _ in bpe_fit(df, text_col, n_merges)]
    wsub = word_frequencies(df, text_col).select(
        "w",
        F.size(
            F.filter(F.split(_sym_expr(merges), r"\|\|"), lambda x: x != F.lit(""))
        )
        .cast("bigint")
        .alias("n_sub"),
    )
    toks = df.select(
        F.col(id_col), F.explode(F.split(normalize_text(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    return (
        toks.join(F.broadcast(wsub), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_subwords"),
        )
    )
