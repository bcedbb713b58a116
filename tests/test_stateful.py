"""Stateful streaming sessionization (applyInPandasWithState) equals
the batch window composition — the custom-stateful-operator surface
the brief requires, with the watermark used only for state cleanup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from marc_data_migration_spark.schemas import CHANGES_SCHEMA
from marc_data_migration_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)
from marc_data_migration_spark.streaming.stream import stage_feed_chunks

GAP = 600  # seconds
EPOCH = pd.Timestamp("2026-01-01")


def _feed() -> pd.DataFrame:
    """3 convs × multiple gap-separated sessions, deterministic; plus a
    far-future heartbeat event that drives the watermark past every
    real session's (last_event + gap)."""
    rng = np.random.default_rng(21)
    rows = []
    lsn = 0
    for ci in range(3):
        t = EPOCH + pd.Timedelta(minutes=ci)
        for _ in range(4):  # 4 sessions per conv
            for _ in range(int(rng.integers(1, 5))):  # 1-4 events each
                lsn += 1
                rows.append(
                    {
                        "op": "U",
                        "lsn": lsn,
                        "commit_ts": t,
                        "conv_id": f"conv-{ci}",
                        "turn_idx": lsn % 10,
                        "role": "user",
                        "text": f"t{lsn}",
                        "tool": "none",
                        "ts": t,
                    }
                )
                t += pd.Timedelta(seconds=int(rng.integers(10, GAP - 10)))
            t += pd.Timedelta(seconds=GAP + int(rng.integers(60, 600)))
    lsn += 1
    rows.append(
        {
            "op": "U",
            "lsn": lsn,
            "commit_ts": EPOCH + pd.Timedelta(days=30),
            "conv_id": "heartbeat",
            "turn_idx": 0,
            "role": "system",
            "text": "hb",
            "tool": "none",
            "ts": EPOCH + pd.Timedelta(days=30),
        }
    )
    pdf = pd.DataFrame(rows).sort_values("commit_ts").reset_index(drop=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["lsn"] = pdf["lsn"].astype("int64")
    return pdf


def _norm(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[pdf.conv_id != "heartbeat"]
    return sorted(
        zip(
            pdf.conv_id,
            pdf.session_start.astype("datetime64[us]"),
            pdf.session_end.astype("datetime64[us]"),
            pdf.n_events.astype(int),
        )
    )


def test_stream_sessionize_matches_batch(spark, tmp_path):
    feed_pdf = _feed()
    want = _norm(sessionize_batch(spark.createDataFrame(feed_pdf), GAP).toPandas())
    assert len(want) == 12  # 3 convs × 4 sessions

    # stage the WAL in event-time order: two chunks, the second carrying
    # the heartbeat so its batch's watermark flushes every open session
    half = len(feed_pdf) // 2
    chunks = [feed_pdf.iloc[:half], feed_pdf.iloc[half:].reset_index(drop=True)]
    feed = str(tmp_path / "feed")
    stage_feed_chunks(chunks, feed)

    stream = (
        spark.readStream.schema(CHANGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP, watermark_delay="10 seconds")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _norm(spark.table("sessions_out").toPandas())
    assert got == want  # every real session emitted exactly once
