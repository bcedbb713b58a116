"""As-of join edge semantics (operators/asof.py): inclusive match at
equal timestamps, null before the first version, latest-version wins,
per-key isolation."""

from __future__ import annotations

import pandas as pd

from marc_data_migration_spark.operators.asof import asof_join

EP = pd.Timestamp("2026-03-01")


def _ts(s):
    return EP + pd.Timedelta(seconds=s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            [
                {"k": "a", "ts": _ts(5), "ev": "before-any"},
                {"k": "a", "ts": _ts(10), "ev": "exact-tie"},
                {"k": "a", "ts": _ts(25), "ev": "between"},
                {"k": "a", "ts": _ts(40), "ev": "after-last"},
                {"k": "b", "ts": _ts(100), "ev": "other-key"},
            ]
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            [
                {"k": "a", "ts": _ts(10), "v": "v1"},
                {"k": "a", "ts": _ts(30), "v": "v2"},
                {"k": "b", "ts": _ts(90), "v": "bv"},
            ]
        )
    )
    out = {
        r.ev: (r.r_v, r.r_ts)
        for r in asof_join(left, right, key_cols=["k"], ts_col="ts").collect()
    }
    assert out["before-any"] == (None, None)  # no version yet
    assert out["exact-tie"][0] == "v1"  # inclusive: version at ts counts
    assert out["between"][0] == "v1"  # latest version <= ts
    assert out["after-last"][0] == "v2"
    assert out["other-key"][0] == "bv"  # keys isolated
    assert out["after-last"][1] == _ts(30).to_pydatetime().replace(tzinfo=None)


def test_range_join_invariant(spark):
    """The range-join's self-consistency claim, asserted: every event
    joins into exactly its containing session, so per-session joined
    counts equal the session's own n_events (a shared systematic error
    in both engines would hash-match — this pins the invariant itself)."""
    from marc_data_migration_spark.entry_queries import QUERIES

    pdf = QUERIES["range_join_session_events"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(pdf) > 0
    assert (pdf.n_joined == pdf.n_events).all()
