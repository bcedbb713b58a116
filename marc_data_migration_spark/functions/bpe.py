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
  magnitude smaller than the corpus and is the only thing training
  ever touches);
- the merge SCHEDULE is then trained DRIVER-LOCAL on the collected
  word table (``_fit_local``: heap-argmax + incremental pair-count
  maintenance touching only the words that contain the merged pair) —
  a real 32k–100k-merge vocabulary is thousands of sequential argmax
  rounds, which as per-round Spark jobs would be a driver-side
  scheduling wall, while the word table itself is tiny relative to
  the corpus (distinct normalized tokens, not occurrences). Only when
  the realized vocabulary exceeds ``driver_vocab_cap`` does training
  fall back to the per-round distributed job (explode → partial-agg
  groupBy pair counts, deterministic argmax collected per round);
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


def _merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Greedy left-to-right non-overlapping merge of (a, b) — the exact
    semantics of the double-bar ``replace()`` used cluster-side."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _fit_local(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Train the merge schedule on a collected word table. Exact replay
    of the naive recount-per-round algorithm (same argmax, same
    (count desc, a asc, b asc) tie-break), but incremental: a lazy
    max-heap over pair counts plus a pair→words inverted index, so
    each round touches only the words containing the merged pair
    instead of rescanning the table 32k times."""
    import heapq
    from collections import defaultdict

    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w), n) for w, n in word_counts
    ]
    pc: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (syms, n) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pc[p] += n
            where[p].add(idx)
    heap = [(-c, a, b) for (a, b), c in pc.items()]
    heapq.heapify(heap)
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, a, b = heapq.heappop(heap)
            if pc.get((a, b), 0) == -negc:  # else stale entry: discard
                best = (a, b, -negc)
                break
        if best is None:
            break  # pair space exhausted
        a, b, c = best
        out.append(best)
        touched: set[tuple[str, str]] = set()
        for idx in sorted(where[(a, b)]):
            syms, n = words[idx]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] -= n
                where[p].discard(idx)
                touched.add(p)
            new = _merge_word(syms, a, b)
            words[idx] = (new, n)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pc[p] += n
                where[p].add(idx)
                touched.add(p)
        for p in touched:
            if pc[p] > 0:
                heapq.heappush(heap, (-pc[p], p[0], p[1]))
            else:
                pc.pop(p, None)
                where.pop(p, None)
    return out


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    driver_vocab_cap: int = 2_000_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` merge rules; returns [(a, b, count), ...] in
    learned order. Ties break (count desc, a asc, b asc) so the
    schedule is deterministic in any engine. Stops early (shorter
    list) only if the pair space is exhausted.

    When the distinct-word table fits under ``driver_vocab_cap`` rows
    (it does for any natural-language corpus — the table holds
    distinct normalized tokens, not occurrences), the schedule is
    trained driver-local in one collect + ``_fit_local``; otherwise
    each round is one Spark job over the persisted word table.

    A literal ``|`` inside a token (normalize_text keeps it) makes the
    char-tuple fast path unsound: the cluster-side merge is a string
    replace over the double-bar encoding, and a bar INSIDE a symbol
    lets ``|a||b|`` match across what the tuple view considers a
    symbol boundary. Bar-bearing vocabularies therefore take the
    distributed string-domain rounds, which are oracle-parity by
    construction; on bar-free tokens (every natural corpus after
    normalization) tuple-merge == string-replace exactly (pinned by
    test_bpe_local_matches_distributed_schedule + the property test)."""
    wc = word_frequencies(df, text_col).persist()
    try:
        n_words = wc.count()  # materialize once
        if n_words <= driver_vocab_cap:
            rows = wc.collect()  # bounded: distinct words, not corpus
            pairs = [(r["w"], int(r["n"])) for r in rows]
            if not any("|" in w for w, _ in pairs):
                return _fit_local(pairs, n_merges)
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
