"""Streaming first-seen document dedup — the exact-dedup complement to
operators.text_dedup.IncrementalLshDedup's near-dup band filter.

A corpus ingestion stream must drop re-crawled / re-delivered document
bodies across micro-batches. The reference's analogue is its implicit
last-write-wins file order (SURVEY.md §2.5 W1 — record_update.py
:182-254); for *content* identity the streaming form is first-seen
wins, keyed on the word-order-invariant document fingerprint
(functions.text_analysis.fingerprint).

Two implementations:

- ``first_seen_batch`` — pure Catalyst: row_number over
  (fingerprint, ORDER BY ts, doc_id) = 1. The replay/backfill path and
  the oracle-checkable form.
- ``dedup_stream`` — ``applyInPandasWithState`` with event-time
  timeout: state per fingerprint is (first doc, first ts, last seen);
  the first arrival emits immediately (append mode), later arrivals
  only refresh the horizon. When the watermark passes
  ``last_seen + ttl`` the state is dropped.

Equality contract (test-pinned): the two paths agree whenever each
fingerprint's earliest-(ts, id) row arrives in the first batch that
carries the fingerprint — i.e. for event-time-ordered feeds, and
within a batch regardless of row order (min-(ts, id) wins). A LATE
cross-batch duplicate with an earlier event time than the already
emitted row is deliberately suppressed: append-mode emission is
irrevocable, so the stream keeps the first-ARRIVED row where the
batch path would pick the earlier-timestamped one. That is the
standard streaming dedup semantics (keep-first-observed); pipelines
needing strict event-time first-wins replay first_seen_batch over the
stored corpus.

The TTL is the deliberate bounded-state trade: stream state cannot
hold every fingerprint ever seen at 100 TB, so a duplicate arriving
AFTER its fingerprint's state expired re-emits. Long-horizon exact
dedup belongs to the lake side (exact_dedup over the stored corpus /
the MERGE key); the stream's job is the high-frequency near-window
duplicates. Size ttl to the re-delivery window of the source.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.normalize import normalize_text
from ..functions.text_analysis import fingerprint

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
    ]
)

# per-fingerprint state: (first doc id, first ts, newest sighting) in µs
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def with_fingerprint(
    docs: DataFrame, text_col: str = "text", fp_col: str = "fingerprint"
) -> DataFrame:
    """Projection adding the normalized-text fingerprint column — pure
    Catalyst, shared by both the batch and streaming paths so their
    keys are bit-identical."""
    return docs.withColumn(fp_col, fingerprint(normalize_text(text_col)))


def first_seen_batch(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch analogue: per fingerprint keep the earliest (ts, id) row.
    One shuffle on the fingerprint; Spark 4 plans the rn=1 filter as a
    map-side WindowGroupLimit, so duplicate-heavy fingerprints don't
    funnel their full row sets through one reducer."""
    d = with_fingerprint(docs, text_col)
    w = Window.partitionBy("fingerprint").orderBy(ts_col, id_col)
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "fingerprint",
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(ts_col).alias("first_ts"),
        )
    )


def _dedup_fn(ttl_seconds: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (fp,) = key
        if state.hasTimedOut:
            state.remove()  # forget the fingerprint; a later dup re-emits
            return
        ids: list[int] = []
        ts_us: list[int] = []
        for pdf in pdf_iter:
            ids.extend(int(x) for x in pdf["doc_id"])
            ts_us.extend(
                int(x)
                for x in pdf["ts"].astype("datetime64[us]").astype("int64")
            )
        batch_first = min(zip(ts_us, ids))  # (ts, id) — deterministic
        last_us = max(ts_us)
        if state.exists:
            doc_id0, first_us, prev_last = state.get
            state.update((doc_id0, first_us, max(prev_last, last_us)))
            emit = None
        else:
            state.update((batch_first[1], batch_first[0], last_us))
            emit = batch_first
        # drop state once the watermark passes last_seen + ttl; clamped
        # above the watermark so engine-version variation in late-row
        # filtering degrades to a next-batch timeout, not a crash
        # (same defensive clamp as stateful._sessionize_fn)
        wm = state.getCurrentWatermarkMs()
        _, _, horizon = state.get
        state.setTimeoutTimestamp(max(horizon // 1000 + ttl_seconds * 1000, wm + 1))
        if emit is not None:
            yield pd.DataFrame(
                {
                    "fingerprint": [fp],
                    "doc_id": [emit[1]],
                    "first_ts": pd.to_datetime([emit[0]], unit="us"),
                }
            )

    return fn


def dedup_stream(
    docs: DataFrame,
    ttl_seconds: int = 86400,
    watermark_delay: str = "10 seconds",
    text_col: str = "text",
) -> DataFrame:
    """Streaming first-seen dedup over a document stream with event
    time ``ts``. Emits each fingerprint's first row exactly once per
    TTL window, immediately on arrival (no flush latency — append mode
    emission happens in the sighting batch; the watermark's only job
    is state cleanup, per SURVEY.md §2.9)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        with_fingerprint(docs, text_col)
        .withWatermark("ts", watermark_delay)
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn(ttl_seconds),
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
