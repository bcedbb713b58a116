"""Custom stateful streaming operator: conversation sessionization.

The reference keeps no cross-record state beyond counters (SURVEY.md
§2.9 — record_update.py:26-34); the target engine's change feed makes
one genuinely stateful query natural: split each conversation's
activity into *sessions* separated by idle gaps, the standard
watermark + timeout pattern a transcript pipeline needs (e.g. billing
windows, agent-session analytics).

Two implementations, property-tested equal:

- ``sessionize_batch``   — pure Catalyst window composition
  (lag → gap flag → running sum = session id → groupBy). This is the
  DuckDB-oracle-checkable form and the replay/backfill path.
- ``sessionize_stream``  — ``applyInPandasWithState`` with event-time
  timeout: per conv_id, state = the open session (start, last, count);
  gap-split inside each batch, emit closed sessions immediately, and
  let the watermark fire the timeout that flushes the final session.
  This is the streaming path (Arrow-batched, no per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open-session state per conv: (start_us, last_us, n_events)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_batch(
    changes: DataFrame, gap_seconds: int = 1800, ts_col: str = "commit_ts"
) -> DataFrame:
    """Gap-based sessions as a window composition — one shuffle on
    conv_id, reused by lag, running sum, and the final aggregation."""
    w = Window.partitionBy("conv_id").orderBy(ts_col)
    # NTZ timestamps reject a direct long cast; the session is pinned to
    # UTC so the intermediate timestamp cast is identity
    sec = F.col(ts_col).cast("timestamp").cast("long")
    new_session = sec - F.lag(sec).over(w) > gap_seconds
    sess = F.sum(F.when(new_session, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        changes.withColumn("_sess", sess)
        .groupBy("conv_id", "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sess")
    )


def _sessionize_fn(gap_seconds: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(conv_id, [(start_us, last_us, n)])
            return
        ts = pd.concat([pdf["commit_ts"] for pdf in pdf_iter])
        # normalize to µs since epoch regardless of pandas' storage unit
        us = ts.astype("datetime64[us]").astype("int64").sort_values().to_numpy()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(us[0]), int(us[0]), 0
        closed: list[tuple[int, int, int]] = []
        for t in us:  # events per (conv, batch) are few; dominated by Arrow IO
            t = int(t)
            # Gap test on floor-seconds — bit-identical to sessionize_batch's
            # cast-to-long comparison and the conv_sessions SQL oracle
            # (epoch_us // 1e6); a µs-precision test would split sessions
            # the batch/backfill path keeps together.
            if n > 0 and t // 1_000_000 - last_us // 1_000_000 > gap_seconds:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 0
            # A late event (within the watermark delay) that sorts before
            # the open session's last event merges into it without
            # regressing the session end — min/max anchoring, the same
            # semantics as Spark's built-in session_window for late rows.
            start_us, last_us, n = min(start_us, t), max(last_us, t), n + 1
        state.update((start_us, last_us, n))
        # Event-time timeout: fires once the watermark passes last + gap.
        # Defensive clamp: rows behind the watermark are filtered before
        # this function (verified empirically), so last + gap normally
        # exceeds the watermark — but a timeout timestamp at or below it
        # throws and kills the stream, so any engine-version variation
        # in late-row filtering degrades to a next-batch timeout instead.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_us // 1000 + gap_seconds * 1000, wm + 1))
        if closed:
            yield _emit(conv_id, closed)

    return fn


def _emit(conv_id: str, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "session_start": pd.to_datetime([s for s, _, _ in sessions], unit="us"),
            "session_end": pd.to_datetime([e for _, e, _ in sessions], unit="us"),
            "n_events": [n for _, _, n in sessions],
        }
    )


def sessionize_stream(
    changes: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming sessionization over a change-feed stream. Emits each
    session exactly once: gap-closed sessions as soon as the closing
    event arrives, idle-open sessions when the event-time watermark
    passes ``last_event + gap`` (GroupStateTimeout.EventTimeTimeout —
    the watermark's only job here is state cleanup, per SURVEY.md §2.9)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        changes.withWatermark("commit_ts", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_salted(
    changes: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "commit_ts",
    shard_seconds: int = 86400,
) -> DataFrame:
    """Skew-broken sessionization — the salting template for window
    shapes WITHOUT a WindowGroupLimit pushdown (lag/lead/running sums),
    where a hot conversation's whole partition otherwise lands on one
    task (PLANS.md 'Dedup strategy choice under skew').

    Two phases, *provably* equal to :func:`sessionize_batch`:

    1. shard each conversation by time range (``floor(sec/shard)``) and
       sessionize within ``(conv_id, shard)`` — a hot conversation now
       parallelizes across its time shards. Shard boundaries only ADD
       cuts: consecutive events inside a shard are consecutive
       globally, so phase-1 sessions are the true sessions cut extra
       at shard edges.
    2. per conversation, merge adjacent phase-1 sessions whose
       boundary gap ≤ gap — exactly reversing the extra cuts. The
       phase-2 window runs over *sessions* (orders of magnitude fewer
       rows than events), so the hot key is no longer hot.

    The gap tests floor to seconds in both phases, matching
    sessionize_batch and the SQL oracle bit-for-bit (property test:
    random feeds, both paths equal)."""
    sec = F.col(ts_col).cast("timestamp").cast("long")
    sharded = changes.withColumn("_shard", F.floor(sec / shard_seconds))
    w = Window.partitionBy("conv_id", "_shard").orderBy(ts_col)
    new_session = sec - F.lag(sec).over(w) > gap_seconds
    sess = F.sum(F.when(new_session, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    pieces = (
        sharded.withColumn("_sess", sess)
        .groupBy("conv_id", "_shard", "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    start_sec = F.col("session_start").cast("timestamp").cast("long")
    end_sec = F.col("session_end").cast("timestamp").cast("long")
    w2 = Window.partitionBy("conv_id").orderBy("session_start")
    new_chain = start_sec - F.lag(end_sec).over(w2) > gap_seconds
    chain = F.sum(F.when(new_chain, 1).otherwise(0)).over(
        w2.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pieces.withColumn("_chain", chain)
        .groupBy("conv_id", "_chain")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("_chain")
    )
