"""Policy plugin surface (SURVEY.md §2.8, operators M8-M15, W2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from marc_data_migration_spark.policy import (
    DefaultPolicy,
    TranscriptPolicy,
    apply_conditional_moves,
    load_policy,
)

ROWS = pd.DataFrame(
    [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello [local] Inventory:03/14/2021 x", "tool": "python", "ts": pd.Timestamp("2026-01-01"), "lsn": 1},
        {"conv_id": "c1", "turn_idx": 1, "role": "tool", "text": "plain", "tool": "DEPRECATED", "ts": pd.Timestamp("2026-01-01"), "lsn": 2},
        {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "t", "tool": "webcrawler-x", "ts": pd.Timestamp("2026-01-01"), "lsn": 3},
    ]
)


def test_load_policy_dotted_path():
    p = load_policy("marc_data_migration_spark.policy.TranscriptPolicy")
    assert isinstance(p, TranscriptPolicy)


def test_transcript_policy_transforms(spark):
    df = spark.createDataFrame(ROWS)
    out = {(r.conv_id, r.turn_idx): r for r in TranscriptPolicy().transform(df).collect()}
    r0 = out[("c1", 0)]
    assert r0.is_local is True
    assert r0.inventory_date == "20210314"  # F8: mm/dd/yyyy → yyyymmdd
    assert r0.location == "sandbox"  # J4 map lookup
    r1 = out[("c1", 1)]
    assert r1.tool is None  # M15: noise tool deleted
    r2 = out[("c2", 0)]
    assert r2.location == "web"  # prefix-rule fallback


def test_conditional_move(spark):
    """M9: move only when no replacement is provided."""
    df = spark.createDataFrame(ROWS)
    # provide a new tool only for c1/0 → c1/0 keeps tool, others move it
    provided = {"tool": F.when((F.col("conv_id") == "c1") & (F.col("turn_idx") == 0), F.lit("NEW"))}
    out = {
        (r.conv_id, r.turn_idx): r
        for r in apply_conditional_moves(df, [("tool", "tool_orig")], provided).collect()
    }
    assert out[("c1", 0)].tool == "NEW" and out[("c1", 0)].tool_orig is None
    assert out[("c1", 1)].tool is None and out[("c1", 1)].tool_orig == "DEPRECATED"
    assert out[("c2", 0)].tool_orig == "webcrawler-x"


def test_local_id_deterministic(spark):
    df = spark.createDataFrame(ROWS)
    p = DefaultPolicy()
    a = [r[0] for r in df.select(p.local_id(df)).collect()]
    b = [r[0] for r in df.select(p.local_id(df)).collect()]
    assert a == b and len(set(a)) == len(a)


def test_decode_media_default_rejects_non_image(spark):
    """The default codec is the REAL image parser: non-image payloads
    (synthesize_media emits utf-8 text blobs) must fail loudly in-task,
    not silently produce features."""
    import pytest as _pytest

    from marc_data_migration_spark.operators.multimodal import (
        decode_media,
        synthesize_media,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["abc"], "n_chars": [3]})
    )
    with _pytest.raises(Exception, match="image_features|unsupported image"):
        decode_media(synthesize_media(docs)).collect()


def test_resize_media_stub_contract(spark):
    """resize_media: binary in → binary out at the target size, metadata
    updated; the default (real image) resizer rejects non-image blobs."""
    import pytest

    from marc_data_migration_spark.operators.multimodal import (
        fake_resize,
        resize_media,
        synthesize_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = synthesize_media(docs)
    with pytest.raises(Exception, match="image_resize|unsupported image"):
        resize_media(media).collect()
    out = resize_media(media, target_bytes=32, resizer=fake_resize).collect()
    assert len(out) == 20
    assert all(len(r.payload) == 32 for r in out)
    assert all(r.meta["resized_bytes"] == "32" for r in out)


def test_analyze_type_flags(spark):
    """analyze_type (pnca_policy.py:131-172 analogue): declared tool vs
    text-content consistency labels, null when consistent or when the
    default policy is in force."""
    rows = pd.DataFrame(
        [
            {"conv_id": "c", "turn_idx": 0, "tool": "video-player", "text": "shows a video of a cat"},
            {"conv_id": "c", "turn_idx": 1, "tool": "video-player", "text": "plain words only"},
            {"conv_id": "c", "turn_idx": 2, "tool": "browser", "text": "fetched http://x.test"},
            {"conv_id": "c", "turn_idx": 3, "tool": "browser", "text": "no link here"},
            {"conv_id": "c", "turn_idx": 4, "tool": "calculator", "text": "result: 42"},
            {"conv_id": "c", "turn_idx": 5, "tool": "calculator", "text": "result pending"},
            {"conv_id": "c", "turn_idx": 6, "tool": None, "text": None},
        ]
    )
    df = spark.createDataFrame(rows)
    pol = TranscriptPolicy()
    got = {
        r.turn_idx: r.m
        for r in df.withColumn("m", pol.analyze_type(df)).collect()
    }
    assert got == {
        0: None,
        1: "video-undescribed",
        2: None,
        3: "web-no-url",
        4: None,
        5: "calc-no-number",
        6: None,
    }
    base = DefaultPolicy()
    assert all(
        r.m is None for r in df.withColumn("m", base.analyze_type(df)).collect()
    )
