"""The bench regression gate is part of the per-round contract (the
driver records its JSON), so its classification logic is pinned here:
median normalization cancels VM-throttle phases, real outliers land in
"flagged", and SEMANTICS_CHANGED entries land in "expected" with the
reason instead of failing the gate. No Spark needed — the gate is pure
arithmetic over two timing dicts."""

import bench


def _with_prior(monkeypatch, prev: dict):
    monkeypatch.setattr(
        bench, "_load_prior_bench", lambda sf: ("BENCH_rTEST.json", {"queries": prev})
    )


def test_gate_clean_when_phase_shifts_uniformly(monkeypatch):
    prev = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 0.5}
    cur = {q: t * 3.0 for q, t in prev.items()}  # VM 3x slower across the board
    _with_prior(monkeypatch, prev)
    gate = bench.regression_gate(cur, sf=0.1)
    assert gate["flagged"] == {} and gate["expected"] == {}
    assert abs(gate["median_ratio"] - 3.0) < 1e-9


def test_gate_flags_per_query_outlier(monkeypatch):
    prev = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 0.5}
    cur = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 1.3}  # d alone regressed 2.6x
    _with_prior(monkeypatch, prev)
    gate = bench.regression_gate(cur, sf=0.1)
    assert list(gate["flagged"]) == ["d"]
    assert gate["flagged"]["d"]["normalized_ratio"] > 2.0


def test_gate_routes_semantics_changed_to_expected(monkeypatch):
    prev = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 0.5}
    cur = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 1.3}
    _with_prior(monkeypatch, prev)
    monkeypatch.setitem(bench.SEMANTICS_CHANGED, "d", "definition changed in test")
    gate = bench.regression_gate(cur, sf=0.1)
    assert gate["flagged"] == {}
    assert gate["expected"]["d"]["reason"] == "definition changed in test"


def test_gate_none_without_prior_or_enough_shared(monkeypatch):
    monkeypatch.setattr(bench, "_load_prior_bench", lambda sf: None)
    assert bench.regression_gate({"a": 1.0}, sf=0.1) is None
    _with_prior(monkeypatch, {"a": 1.0, "b": 1.0})
    assert bench.regression_gate({"a": 1.0, "b": 1.0}, sf=0.1) is None
