"""As-of (temporal) join — a CDC-enrichment primitive the reference
never needed (SURVEY.md §2.3: "no range/as-of joins exist") but a
transcript pipeline does: attach to each change/event the latest
version of a slowly-changing dimension as of its timestamp (plan in
effect, policy version, model snapshot).

Spark has no built-in as-of join; the classic distributed formulation
is union-then-window, one shuffle total:

    tag left rows 1 / right rows 0
    → union on (key, ts, tag, right-payload-struct)
    → last(right_struct, ignoreNulls) OVER (PARTITION BY key
          ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)
    → keep left rows, unpack the struct

Ordering (ts, tag) makes the match inclusive (right.ts <= left.ts —
a dimension version effective exactly at the event's timestamp wins),
matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` oracle semantics.
The right payload rides ONE struct column so legitimately-null payload
fields survive (last(ignoreNulls) on bare columns would skip them).

Scale notes: one hash shuffle on the key; the window has no
WindowGroupLimit pushdown, so a hot key serializes — the time-sharded
two-phase template (streaming/stateful.py sessionize_batch_salted)
applies if dimensions are hot. Right-side rows must be unique per
(key, ts): ties have no defined winner in either engine — pre-dedupe
with operators/dedup.latest_per_key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row gains the
    payload of the latest ``right`` row with ``right.ts <= left.ts``
    for the same key (null payload when no such row exists). Right
    payload columns come back prefixed with ``right_prefix``; the
    matched right timestamp is ``{right_prefix}{ts_col}``."""
    internals = {"_tag", "_l", "_r", "_match"}
    clash = internals & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"input columns collide with asof_join internals: {sorted(clash)}")
    r_payload = [c for c in right.columns if c not in key_cols and c != ts_col]
    out_names = {f"{right_prefix}{ts_col}", *(f"{right_prefix}{c}" for c in r_payload)}
    shadow = out_names & set(left.columns)
    if shadow:
        raise ValueError(
            f"left columns {sorted(shadow)} collide with prefixed right outputs; "
            "choose a different right_prefix"
        )
    r_struct = F.struct(F.col(ts_col).alias(ts_col), *[F.col(c) for c in r_payload])

    l_tagged = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns if c not in key_cols and c != ts_col]).alias(
            "_l"
        ),
        F.lit(None).cast(
            right.select(r_struct.alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            left.select(
                F.struct(
                    *[F.col(c) for c in left.columns if c not in key_cols and c != ts_col]
                ).alias("s")
            ).schema["s"].dataType
        ).alias("_l"),
        r_struct.alias("_r"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    l_cols = [c for c in left.columns if c not in key_cols and c != ts_col]
    return joined.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(f"_l.{c}").alias(c) for c in l_cols],
        F.col(f"_match.{ts_col}").alias(f"{right_prefix}{ts_col}"),
        *[F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in r_payload],
    )
