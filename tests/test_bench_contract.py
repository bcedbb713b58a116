"""The driver parses ONE json line from the last ~2000 chars of
bench.py stdout; r04's payload overflowed that window and recorded an
unparseable BENCH_r04.json. These tests pin the contract-line builder
(bench.contract_line) without starting Spark: the line always parses,
always fits the window, and degrades in the documented order."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import contract_line  # noqa: E402


def _payload(n_queries: int, name_len: int = 18) -> dict:
    qs = {f"q{'x' * name_len}{i:04d}": round(0.1 + i * 0.013, 3) for i in range(n_queries)}
    return {
        "metric": "headline query suite wall time",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "construct_sec": {k: 9.9 for k in qs},  # detail-only key
        "sf": 0.1,
        "events_per_sec": 156006,
        "stream_events_per_sec": 99034,
        "ingest_docs_per_sec": 2978,
        "regression_gate": {
            "baseline": "BENCH_r04.json",
            "n_shared": n_queries,
            "median_ratio": 0.906,
            "threshold_x": 2.0,
            "flagged": {},
            "expected": {"q0": {"reason": "definition change"}},
        },
    }


def test_line_parses_and_fits_at_current_registry_size():
    out = _payload(32)
    line = contract_line(out, "BENCH/bench_detail_sf0.1.json")
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["metric"] == out["metric"]
    assert d["value"] == out["value"]
    assert d["sf"] == 0.1
    assert d["queries"] == out["queries"]
    assert d["events_per_sec"] == 156006
    assert d["stream_events_per_sec"] == 99034
    assert d["ingest_docs_per_sec"] == 2978
    assert d["regression_flagged"] == 0
    assert d["detail"].endswith("bench_detail_sf0.1.json")
    # the bulky detail-only keys never leak onto the contract line
    assert "construct_sec" not in d and "regression_gate" not in d


def test_flagged_count_surfaces():
    out = _payload(10)
    out["regression_gate"]["flagged"] = {"qa": {}, "qb": {}}
    d = json.loads(contract_line(out, None))
    assert d["regression_flagged"] == 2
    assert "detail" not in d


def test_gate_error_dict_counts_as_zero():
    out = _payload(10)
    out["regression_gate"] = {"error": "FileNotFoundError: BENCH_r04.json"}
    d = json.loads(contract_line(out, None))
    assert d["regression_flagged"] == 0


def test_overflow_drops_optional_keys_before_queries():
    # sized to sit just over the cap with the optional keys and under
    # it once they're dropped — queries stay intact.
    out = _payload(57, name_len=14)
    full = contract_line(out, "BENCH/bench_detail_sf0.1.json", window=10**6)
    assert len(full) > 1900  # the premise: over the cap before degrading
    line = contract_line(out, "BENCH/bench_detail_sf0.1.json")
    assert len(line) <= 1900
    d = json.loads(line)
    assert len(d["queries"]) == 57
    assert "detail" not in d  # dropped first


def test_pathological_overflow_truncates_to_top40_and_still_parses():
    out = _payload(400, name_len=30)
    line = contract_line(out, "BENCH/bench_detail_sf0.1.json")
    d = json.loads(line)
    assert len(d["queries"]) == 40
    # the kept 40 are the most expensive ones
    kept = set(d["queries"])
    top40 = {k for k, _ in sorted(out["queries"].items(), key=lambda kv: -kv[1])[:40]}
    assert kept == top40
    assert d["metric"] == out["metric"] and d["value"] == out["value"]
