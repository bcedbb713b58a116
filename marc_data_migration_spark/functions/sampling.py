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


def temperature_keep(
    df,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    budget: int = 250,
    salt: str = "temp",
):
    """Temperature-based stratum rebalancing — the multilingual-corpus
    sampler (the p^alpha upsampling rule multilingual LM pipelines use):
    stratum l with n_l docs gets sampling weight n_l^alpha / sum
    n_l^alpha, flattening the head so dominant languages stop drowning
    the tail (alpha=1 recovers natural frequencies, alpha=0 uniform).
    Per-doc keep probability is min(1, budget * w_l / (sum_w * n_l)),
    decided by the same deterministic md5 bucket as hash_split — so the
    sample is stable under reruns, auditable from any SQL engine, and
    NESTED across configurations: a doc's bucket never changes, so
    raising the budget (or any change that raises its stratum's
    probability) only ever ADDs docs to the sample, never swaps them.

    Scale shape: stratum stats are a tiny groupBy (one row per
    language), joined back by BROADCAST — the corpus itself never
    shuffles; the keep decision is a projection. Probabilities are
    rounded to 6 decimals before the bucket comparison so engines whose
    pow() differs in the last ulp still make identical keep decisions.

    Returns the kept rows with their ``keep_prob`` (rounded to 4, the
    driver double convention)."""
    from pyspark.sql import Window

    # NULL strata participate: an equi-join on the raw lang column
    # would silently drop every NULL-lang doc (NULL never equi-joins),
    # zeroing their keep probability with no error — docs whose
    # language ID failed form their own stratum instead
    lang_key = F.coalesce(
        (F.col(lang_col) if isinstance(lang_col, str) else lang_col).cast("string"),
        F.lit("<null>"),
    )
    lc = (
        df.select(lang_key.alias("_lang"))
        .groupBy("_lang")
        .agg(F.count(F.lit(1)).alias("_n_l"))
    )
    lc = lc.withColumn("_w_l", F.pow(F.col("_n_l").cast("double"), F.lit(alpha)))
    # normalizer sum over the stratum dim itself: a single-partition
    # window over one-row-per-language (bounded small by definition) —
    # avoids a scalar cross join, which would plan as a
    # BroadcastNestedLoopJoin on the corpus side. This line is the
    # source of the "WindowExec: No Partition Defined" warning in bench
    # logs: DELIBERATE and bounded — the window input is the aggregated
    # stratum dim (≤ languages rows), never the corpus.
    lc = lc.withColumn("_s", F.sum("_w_l").over(Window.partitionBy()))
    prob = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(budget)) * F.col("_w_l") / (F.col("_s") * F.col("_n_l")),
        ),
        6,
    )
    u = split_bucket(id_col, salt)
    return (
        df.withColumn("_lang", lang_key)
        .join(F.broadcast(lc), "_lang")
        .withColumn("_p", prob)
        .filter(u < F.col("_p") * BUCKETS)
        .withColumn("keep_prob", F.round(F.col("_p"), 4))
        .drop("_lang", "_n_l", "_w_l", "_s", "_p")
    )


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


def weighted_sample(
    df,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
):
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-Res scheme: each row draws a stable uniform
    u ∈ (0,1) from its hashed id and competes with key u^(1/w); the n
    largest keys win. Inclusion probability is proportional to weight
    (exactly the reservoir semantics), yet the draw is reproducible,
    stable under appends (an existing row's key never changes), and
    auditable from any engine — the three properties `hash_split`'s
    docstring demands and `df.sample`/reservoir RNGs cannot give.

    u is (md5int(salt#id) % 10^6 + 0.5)/10^6 — strictly inside (0,1)
    so the key is well-defined for every weight; keys round to 8
    decimals BEFORE the rank (pow is correctly-rounded within 1 ulp on
    both engines — 8 decimals is far above the drift) and ties break
    by id, so the selected SET is engine-identical. Rows with
    non-positive weight never qualify (filtered, matching the w>0
    domain of the scheme).

    Scale shape: the key is a pure projection; `orderBy(...).limit(n)`
    plans as TakeOrderedAndProject — per-partition top-n then a
    single bounded merge on the driver side of the exchange, never a
    global sort of the corpus.

    Returns (id, weight, skey) for the n winners.
    """
    c = F.col(id_col)
    u = (
        md5int(F.concat_ws("#", F.lit(salt), c.cast("string"))) % 1_000_000
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 8
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .select(c, F.col(weight_col), key.alias("skey"))
        .orderBy(F.col("skey").desc(), c.asc())
        .limit(n)
    )
