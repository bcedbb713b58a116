"""Streaming first-seen dedup (applyInPandasWithState) equals the
batch window analogue inside the TTL horizon, and deliberately
re-emits once state expires — the bounded-state trade the operator
documents."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T

from marc_data_migration_spark.streaming.dedup_stream import (
    dedup_stream,
    first_seen_batch,
)
from marc_data_migration_spark.streaming.stream import stage_feed_chunks

EPOCH = pd.Timestamp("2026-01-01")

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _doc(doc_id: int, text: str, minutes: float) -> dict:
    return {
        "doc_id": doc_id,
        "text": text,
        "ts": EPOCH + pd.Timedelta(minutes=minutes),
    }


def _run_stream(spark, tmp_path, chunks, ttl_seconds, name, watermark_delay="10 seconds"):
    feed = str(tmp_path / f"feed_{name}")
    stage_feed_chunks([pd.DataFrame(c) for c in chunks], feed)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        dedup_stream(stream, ttl_seconds=ttl_seconds, watermark_delay=watermark_delay)
        .writeStream.format("memory")
        .queryName(f"dedup_out_{name}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(f"dedup_out_{name}").toPandas()


def test_stream_matches_batch_first_seen(spark, tmp_path):
    """Cross-batch duplicates (including reworded texts that normalize
    to the same fingerprint) collapse to the earliest (ts, id) row —
    identical to the batch window analogue."""
    chunks = [
        [
            _doc(1, "The quick brown fox", 0),
            _doc(2, "something else entirely here", 1),
            _doc(3, "the quick BROWN fox!!", 2),  # dup of 1 after normalize
        ],
        [
            _doc(4, "The quick brown fox", 10),  # cross-batch dup of 1
            _doc(5, "a third distinct document body", 11),
            _doc(6, "something else entirely here", 12),  # dup of 2
        ],
    ]
    got = _run_stream(spark, tmp_path, chunks, ttl_seconds=3600, name="parity")
    all_docs = spark.createDataFrame(
        pd.DataFrame([d for c in chunks for d in c]), DOCS_SCHEMA
    )
    want = first_seen_batch(all_docs).toPandas()
    norm = lambda pdf: sorted(  # noqa: E731
        zip(pdf.fingerprint, pdf.doc_id.astype(int), pdf.first_ts.astype("datetime64[us]"))
    )
    assert norm(got) == norm(want)
    assert sorted(got.doc_id.astype(int)) == [1, 2, 5]


def test_ttl_expiry_reemits(spark, tmp_path):
    """A duplicate arriving after the watermark passed its
    fingerprint's last_seen + ttl re-emits: the state was dropped.
    Batches: A@0 → filler far ahead (advances watermark past A's
    timeout) → filler (A's timeout fires, no data for A) → A-dup."""
    ttl = 600  # 10 min
    chunks = [
        [_doc(1, "recurring boilerplate banner text", 0)],
        [_doc(2, "advance the watermark once", 60)],  # wm → ~t+60m
        [_doc(3, "advance and fire timeouts", 61)],  # A times out here
        [_doc(4, "recurring boilerplate banner text", 62)],
    ]
    got = _run_stream(spark, tmp_path, chunks, ttl_seconds=ttl, name="ttl")
    emitted = sorted(got.doc_id.astype(int))
    assert emitted == [1, 2, 3, 4]  # doc 4 re-emitted after expiry


def test_within_ttl_no_reemit(spark, tmp_path):
    """Same shape but the duplicate lands INSIDE the ttl horizon —
    suppressed (regression guard for the horizon-refresh path)."""
    ttl = 3600 * 24 * 30
    chunks = [
        [_doc(1, "recurring boilerplate banner text", 0)],
        [_doc(2, "advance the watermark once", 60)],
        [_doc(3, "advance again", 61)],
        [_doc(4, "recurring boilerplate banner text", 62)],
    ]
    got = _run_stream(spark, tmp_path, chunks, ttl_seconds=ttl, name="inttl")
    assert sorted(got.doc_id.astype(int)) == [1, 2, 3]


def test_late_crossbatch_duplicate_keeps_first_arrived(spark, tmp_path):
    """Documented divergence from the batch path: a cross-batch
    duplicate with an EARLIER event time (late but inside the
    watermark) is suppressed — append-mode emission is irrevocable, so
    the stream keeps the first-ARRIVED row while first_seen_batch
    picks the earlier-timestamped one."""
    chunks = [
        [_doc(1, "recurring boilerplate banner text", 10)],
        [_doc(2, "recurring boilerplate banner text", 5)],  # late, earlier ts
    ]
    # 30-minute watermark delay: the late row is WITHIN the watermark,
    # so the engine delivers it to the state function (not pre-filtered)
    # and the suppression below is our state logic's decision
    got = _run_stream(
        spark, tmp_path, chunks, ttl_seconds=3600, name="late",
        watermark_delay="30 minutes",
    )
    assert sorted(got.doc_id.astype(int)) == [1]  # first-arrived wins
    all_docs = spark.createDataFrame(
        pd.DataFrame([d for c in chunks for d in c]), DOCS_SCHEMA
    )
    batch = first_seen_batch(all_docs).toPandas()
    assert sorted(batch.doc_id.astype(int)) == [2]  # batch: min (ts, id)
