"""Deterministic hash-based dataset splitting.

A training-data pipeline needs train/val/test assignment that is
(a) deterministic — reruns produce the same split; (b) stable — adding
new documents never moves an existing document between splits (which
`randomSplit`/`TABLESAMPLE` cannot promise: both depend on partition
layout and row order); (c) engine-portable — auditable from any SQL
engine over the same table. Hashing the document id gives all three:
bucket = md5int(salt # id) mod 10_000, split by cumulative-fraction
thresholds. Pure Catalyst, no shuffle — assignment is a projection.

The salt namespaces independent splits (e.g. a second experiment's
split must not correlate with the first) and guards against ids that
are themselves hash-shaped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text_analysis import md5int

BUCKETS = 10_000

DEFAULT_FRACTIONS: dict[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}


def split_bucket(id_col: Column | str, salt: str = "split") -> Column:
    """The stable per-id bucket in [0, BUCKETS)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5int(F.concat_ws("#", F.lit(salt), c.cast("string"))) % BUCKETS


def hash_split(
    id_col: Column | str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> Column:
    """Split label for each row. ``fractions`` map split→fraction in
    insertion order; they must sum to 1 (the last split absorbs the
    rounding remainder so every bucket is labeled)."""
    fractions = fractions or DEFAULT_FRACTIONS
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = split_bucket(id_col, salt)
    names = list(fractions)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        cond = b < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def stratified_cap(df, group_col, order_col, quota: int):
    """Keep at most ``quota`` rows per group — the representation-cap a
    corpus pipeline applies per language / domain / source so one
    over-crawled stratum can't dominate the mixture. Deterministic
    (ordered by ``order_col``, e.g. a quality score desc or stable id),
    so reruns keep the same rows.

    Spark 4 plans ``row_number() <= quota`` as a partial
    WindowGroupLimit per input partition *before* the exchange on
    ``group_col``: each map task forwards at most ``quota`` rows per
    group it sees, so a hot stratum never funnels its full row set
    through one reducer — the same pushdown that makes W1 dedup
    skew-tolerant."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def pack_contexts(
    df,
    n_tokens_col: str,
    id_col: str = "doc_id",
    ctx_size: int = 512,
    n_shards: int = 8,
    salt: str = "pack",
):
    """Concat-and-chunk sequence packing — the batch-prep step that
    turns a document corpus into fixed-size training contexts: docs are
    concatenated in a deterministic order and chunked every
    ``ctx_size`` tokens; each doc is assigned the context its first
    token lands in, plus its offset inside that context.

    Scale shape: a single global running sum would serialize the whole
    corpus through one window partition, so docs are hash-sharded
    first (stable: the shard of a doc never changes as the corpus
    grows) and the running sum is per-shard — n_shards independent
    window partitions, each a partial-aggregated sort. At 100 TB set
    n_shards ≈ cluster parallelism; context ids are (shard, ctx_idx)
    pairs so no cross-shard coordination exists.

    Returns: (id, shard, ctx_idx, ctx_offset, n_tokens) — one row per
    doc; a downstream exploder can materialize per-context rows.
    """
    from pyspark.sql import Window

    shard = (
        F.pmod(
            md5int(F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))),
            F.lit(n_shards),
        )
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(id_col)
    start = F.sum(F.col(n_tokens_col)).over(w) - F.col(n_tokens_col)
    return (
        df.withColumn("shard", shard)
        .select(
            id_col,
            "shard",
            F.floor(start / ctx_size).cast("long").alias("ctx_idx"),
            (start % ctx_size).cast("long").alias("ctx_offset"),
            F.col(n_tokens_col).cast("long").alias("n_tokens"),
        )
    )
