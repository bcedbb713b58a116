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
