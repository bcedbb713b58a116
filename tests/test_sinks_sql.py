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
