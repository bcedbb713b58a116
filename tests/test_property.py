"""Property tests (SURVEY.md §5 item 4): for arbitrary small change
feeds over a tiny key space — every I/U/D interleaving hypothesis can
produce — the distributed apply equals the sequential pandas replay.
Fixed-seed variants (tests/test_merge_oracle.py) pin the realistic
shapes; this net catches interleavings nobody thought to write down.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marc_data_migration_spark import oracle
from marc_data_migration_spark.operators.merge import apply_changes
from marc_data_migration_spark.schemas import KEY_COLS

EPOCH = pd.Timestamp("2026-01-01")


def _base_pdf() -> pd.DataFrame:
    rows = [
        {
            "conv_id": f"conv-{c}",
            "turn_idx": t,
            "role": "user",
            "text": f"base-{c}-{t}",
            "tool": "none",
            "ts": EPOCH,
            "lsn": 0,
        }
        for c in range(2)
        for t in range(3)
    ]
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["lsn"] = pdf["lsn"].astype("int64")
    return pdf


def _changes_pdf(events: list[tuple[str, int, int]]) -> pd.DataFrame:
    rows = []
    for i, (op, c, t) in enumerate(events):
        is_del = op == "D"
        rows.append(
            {
                "op": op,
                "lsn": i + 1,
                "commit_ts": EPOCH + pd.Timedelta(seconds=i),
                "conv_id": f"conv-{c}",
                "turn_idx": t,
                "role": None if is_del else "assistant",
                "text": None if is_del else f"t{i}",
                "tool": None if is_del else "x",
                "ts": pd.NaT if is_del else EPOCH + pd.Timedelta(seconds=i),
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["lsn"] = pdf["lsn"].astype("int64")
    return pdf


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["I", "U", "D"]),
            st.integers(0, 3),  # conv-2/3 never exist in base: insert paths
            st.integers(0, 2),
        ),
        min_size=1,
        max_size=25,
    ),
    strategy=st.sampled_from(["replace_and_add", "replace_only"]),
)
def test_random_feed_matches_oracle(spark, events, strategy):
    base_pdf = _base_pdf()
    ch_pdf = _changes_pdf(events)
    res = apply_changes(
        spark.createDataFrame(base_pdf),
        spark.createDataFrame(ch_pdf),
        strategy=strategy,
    )
    got = res.final.orderBy(*KEY_COLS).toPandas()
    want = oracle.replay(base_pdf, ch_pdf, strategy=strategy)
    assert list(zip(got.conv_id, got.turn_idx)) == list(zip(want.conv_id, want.turn_idx))
    assert got.text.fillna("<N>").tolist() == want.text.fillna("<N>").tolist()
    assert got.lsn.tolist() == want.lsn.tolist()
    assert got.role.fillna("<N>").tolist() == want.role.fillna("<N>").tolist()
    assert got.tool.fillna("<N>").tolist() == want.tool.fillna("<N>").tolist()
