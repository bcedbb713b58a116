"""The Iceberg sink's SQL builders — the production MERGE path has no
runtime jar in this sandbox (SURVEY.md §7 risk 1), so the exact SQL
text the engine issues on a real cluster is pinned here."""

from __future__ import annotations

from marc_data_migration_spark.streaming.sink_iceberg import (
    create_table_sql,
    evolve_sql,
    merge_sql,
)


def test_create_table_buckets_by_conv():
    sql = create_table_sql("lake.db.transcripts", n_buckets=512)
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(512, conv_id))" in sql
    assert "'write.merge.mode'='copy-on-write'" in sql


def test_merge_sql_clauses():
    sql = merge_sql("lake.db.transcripts", "batch_latest", ["role", "text", "tool", "ts"])
    # keyed on the composite primary key
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    # LSN guard on every mutating clause -> replays are no-ops
    assert "WHEN MATCHED AND s.op = 'D' AND s.lsn > t.lsn THEN DELETE" in sql
    assert "s.op <> 'D' AND s.lsn > t.lsn AND s.gate_ok" in sql
    # field-level replace_and_add: null source fields preserve target
    assert "t.text = coalesce(s.text, t.text)" in sql
    assert "t.lsn = s.lsn" in sql
    # unmatched inserts carry the full payload
    assert "WHEN NOT MATCHED AND s.op <> 'D' THEN" in sql
    assert "INSERT (conv_id, turn_idx, role, text, tool, ts, lsn)" in sql


def test_evolve_sql_additive():
    assert (
        evolve_sql("lake.db.transcripts", {"tool_meta": "string"})
        == "ALTER TABLE lake.db.transcripts ADD COLUMNS (tool_meta string)"
    )


def test_prepare_source_gate(spark):
    """prepare_source computes the gate_ok column merge_sql assumes:
    deduped per key, gated only on matched non-delete rows, True
    everywhere else (inserts, deletes, gate off)."""
    import pandas as pd

    from marc_data_migration_spark.streaming.sink_iceberg import prepare_source

    EP = pd.Timestamp("2026-01-01")
    ch = pd.DataFrame(
        [
            # matched key, same text -> gate passes
            dict(op="U", lsn=1, commit_ts=EP, conv_id="c1", turn_idx=0,
                 role="user", text="hello world", tool="t", ts=EP),
            # matched key, disjoint text -> gate fails
            dict(op="U", lsn=2, commit_ts=EP, conv_id="c1", turn_idx=1,
                 role="user", text="zzz qqq xxx", tool="t", ts=EP),
            # stale duplicate of (c1,1): dedup must keep lsn=2 only
            dict(op="U", lsn=0, commit_ts=EP, conv_id="c1", turn_idx=1,
                 role="user", text="hello world", tool="t", ts=EP),
            # unmatched insert -> gate trivially True
            dict(op="I", lsn=3, commit_ts=EP, conv_id="c9", turn_idx=0,
                 role="user", text="new", tool="t", ts=EP),
            # matched delete -> gate trivially True (deletes aren't gated)
            dict(op="D", lsn=4, commit_ts=EP, conv_id="c1", turn_idx=2,
                 role=None, text=None, tool=None, ts=pd.NaT),
        ]
    )
    ch["turn_idx"] = ch["turn_idx"].astype("int32")
    tgt = pd.DataFrame(
        [
            dict(conv_id="c1", turn_idx=0, text="hello world"),
            dict(conv_id="c1", turn_idx=1, text="hello world"),
            dict(conv_id="c1", turn_idx=2, text="bye"),
        ]
    )
    tgt["turn_idx"] = tgt["turn_idx"].astype("int32")
    src, bad = prepare_source(
        spark.createDataFrame(ch), spark.createDataFrame(tgt), fuzzy_gate=True
    )
    assert bad.count() == 0
    out = src.toPandas().set_index(["conv_id", "turn_idx"])
    assert len(out) == 4  # stale lsn=0 deduped away
    assert bool(out.loc[("c1", 0)].gate_ok) is True
    assert bool(out.loc[("c1", 1)].gate_ok) is False  # disjoint text
    assert bool(out.loc[("c9", 0)].gate_ok) is True  # insert
    assert bool(out.loc[("c1", 2)].gate_ok) is True  # delete
    assert out.loc[("c1", 1)].lsn == 2  # max-LSN survivor


def test_prepare_source_gate_null_target_text(spark):
    """A matched target row with NULL text must still be gated — compared
    against '' exactly like operators/merge.py apply_changes — so the two
    'same semantics' sinks agree: a dissimilar update against a null-text
    row is a conflict in both, not silently applied by the Iceberg path."""
    import datetime as dt

    from marc_data_migration_spark.streaming.sink_iceberg import prepare_source

    EP = dt.datetime(2026, 1, 1)
    ch = spark.createDataFrame(
        [("U", 1, EP, "c1", 0, "user", "completely new text", "t", EP)],
        "op string, lsn long, commit_ts timestamp, conv_id string, "
        "turn_idx int, role string, text string, tool string, ts timestamp",
    )
    tgt = spark.createDataFrame(
        [("c1", 0, None)], "conv_id string, turn_idx int, text string"
    )
    src, _ = prepare_source(ch, tgt, fuzzy_gate=True)
    row = src.collect()[0]
    assert row.gate_ok is False  # ratio('completely new text','') = 0 < 50


def test_merge_sql_replace_only_omits_insert():
    sql = merge_sql("t", "s", ["text"], strategy="replace_only")
    assert "WHEN NOT MATCHED" not in sql  # M3: update-without-insert
    assert "UPDATE SET" in sql
