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
