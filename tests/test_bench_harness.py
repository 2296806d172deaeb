"""Unit tests for bench.py's prior-round regression flag.

VERDICT r7 #1: `_prior_bench` read `"queries"` off the top level of the
newest BENCH_r*.json, but driver-written files nest the payload under
`"parsed"` — so the flag was dead code.  These tests feed BOTH file
shapes and assert a synthetic 1.5x regression actually fires.
"""

import importlib.util
import json
import os

import pytest


def _load_bench(tmp_path, monkeypatch):
    """Import bench.py with its HERE constant patched to tmp_path so
    _prior_bench scans our synthetic BENCH files, not the repo's.
    Patching the module-level constant keeps the process-global
    os.path untouched (ADVICE r8)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(repo, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    return mod


@pytest.mark.parametrize("shape", ["flat", "driver"])
def test_prior_bench_reads_both_file_shapes(tmp_path, monkeypatch, shape):
    payload = {"metric": "m", "value": 1.0, "queries": {"q1": 2.0, "q2": 0.5}}
    if shape == "driver":
        # The driver wraps bench.py's JSON line: {n, rc, tail, parsed}.
        body = {"n": 1, "rc": 0, "tail": "...", "parsed": payload}
    else:
        body = payload
    (tmp_path / "BENCH_r07.json").write_text(json.dumps(body))
    mod = _load_bench(tmp_path, monkeypatch)
    assert mod._prior_bench() == {"q1": 2.0, "q2": 0.5}


def test_regression_flag_fires_on_synthetic_regression(tmp_path, monkeypatch):
    prior_payload = {"queries": {"fast": 1.0, "slow": 1.0, "gone": 1.0}}
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"n": 1, "rc": 0, "parsed": prior_payload}))
    mod = _load_bench(tmp_path, monkeypatch)
    prior = mod._prior_bench()
    timings = {"fast": 0.9, "slow": 1.6, "new": 5.0}  # slow regressed 1.6x
    flagged = sorted(
        n for n, t in timings.items()
        if n in prior and prior[n] > 0 and t > 1.5 * prior[n])
    assert flagged == ["slow"]


def test_prior_bench_newest_file_wins(tmp_path, monkeypatch):
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"queries": {"q": 9.0}}))
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"parsed": {"queries": {"q": 1.0}}}))
    mod = _load_bench(tmp_path, monkeypatch)
    assert mod._prior_bench() == {"q": 1.0}


def test_prior_bench_empty_dir(tmp_path, monkeypatch):
    mod = _load_bench(tmp_path, monkeypatch)
    assert mod._prior_bench() == {}


def test_prior_bench_ignores_variant_artifacts(tmp_path, monkeypatch):
    """VERDICT r15 what's-wrong #4: the driver also writes variant
    artifacts like BENCH_r15_c8.json (8-core scaling run), and
    "_c8" sorts after ".json" — a loose prefix match would baseline
    32-core times against 8-core ones.  Only BENCH_r<digits>.json
    may ever be the regression baseline."""
    (tmp_path / "BENCH_r15.json").write_text(
        json.dumps({"queries": {"q": 1.0}}))
    (tmp_path / "BENCH_r15_c8.json").write_text(
        json.dumps({"queries": {"q": 0.1}}))
    mod = _load_bench(tmp_path, monkeypatch)
    assert mod._prior_bench() == {"q": 1.0}
    # variant-only directory: no baseline at all, not the c8 file
    os.remove(tmp_path / "BENCH_r15.json")
    assert mod._prior_bench() == {}


def test_prior_bench_orders_rounds_numerically(tmp_path, monkeypatch):
    """Round 9 vs round 10: unpadded numerics must not be compared
    lexicographically ("BENCH_r9.json" > "BENCH_r10.json" as strings)."""
    (tmp_path / "BENCH_r9.json").write_text(
        json.dumps({"queries": {"q": 9.0}}))
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"queries": {"q": 10.0}}))
    mod = _load_bench(tmp_path, monkeypatch)
    assert mod._prior_bench() == {"q": 10.0}


def test_drift_median_ratio(tmp_path, monkeypatch):
    """VERDICT r15 what's-wrong #5: the diagnostics line carries the
    median now/prior ratio over all common rows so a uniform machine
    shift is visible in the artifact itself."""
    mod = _load_bench(tmp_path, monkeypatch)
    prior = {"a": 1.0, "b": 2.0, "c": 4.0, "zero": 0.0}
    now = {"a": 1.25, "b": 2.5, "c": 6.0, "new": 1.0, "zero": 3.0}
    # ratios: 1.25, 1.25, 1.5 -> median 1.25 ("new" and zero-prior skipped)
    assert mod._drift(now, prior) == 1.25
    # even count averages the middle pair
    assert mod._drift({"a": 1.0, "b": 3.0}, {"a": 1.0, "b": 2.0}) == 1.25
    assert mod._drift({"x": 1.0}, {}) is None


def test_confirm_flags_requeried_adjudication(tmp_path, monkeypatch):
    """VERDICT r12 next-round #2: a first-pass regression flag is
    confirmed only if the warm-JVM re-measure still exceeds 1.5x the
    prior median; a requery back inside the band drops the flag (it
    was ambient-load noise), and a MISSING requery keeps it."""
    mod = _load_bench(tmp_path, monkeypatch)
    prior = {"noise": 1.0, "real": 1.0, "lost": 1.0}
    flagged = ["noise", "real", "lost"]
    requeried = {"noise": 1.1, "real": 1.8}  # "lost" never re-measured
    assert mod._confirm_flags(flagged, prior, requeried) == ["lost", "real"]
    assert mod._confirm_flags([], prior, {}) == []


def test_metric_line_is_last_parseable_and_tail_sized():
    """VERDICT r13 #7: the metric line must survive the driver's ~2 KB
    stdout tail — compact separators, diagnostics moved to their own
    earlier line, and a 2-decimal fallback if the registry's bench set
    ever outgrows the budget."""
    import json

    import bench

    from presto_spark.queries import REGISTRY

    # the real bench set must fit with EVERY row present; since the
    # r15 set (58 rows) outgrew the 3-decimal form, the documented
    # degradation ladder's first rung (2-decimal values) is the
    # contract: no row dropped, values within 5 ms of the input
    real = {n: 12.345 for n, q in REGISTRY.items() if "bench" in q.tags}
    line = bench._metric_line(740.7, real, 0.1, [])
    assert len(line) <= 2000 - len("\n")
    parsed = json.loads(line)
    assert parsed["metric"] == "tpch_suite_wall_sec"
    assert parsed["sf"] == 0.1
    assert "queries_truncated" not in parsed
    assert set(parsed["queries"]) == set(real)
    assert all(abs(parsed["queries"][n] - v) <= 0.005
               for n, v in real.items())
    # r15 fix: a long confirmed-regression list must degrade to a
    # count BEFORE any queries entry is dropped (the contract forbids
    # removing queries rows; the full list lives on the diagnostics
    # line).  The r15 cross-machine run hit exactly this: 11 confirmed
    # names evicted 10 queries rows.
    confirmed = sorted(real)[:11]
    line = bench._metric_line(740.7, real, 0.1, confirmed)
    assert len(line) <= 2000 - len("\n")
    parsed = json.loads(line)
    assert "queries_truncated" not in parsed
    assert set(parsed["queries"]) == set(real)
    assert (parsed.get("regressed_vs_prior") == confirmed
            or parsed.get("regr_n") == len(confirmed))
    # a pathologically large set degrades loudly (slowest kept,
    # truncation counted) instead of overflowing the tail
    big = {f"a_rather_long_query_name_{i:02d}": 12.345 + (i == 7)
           for i in range(80)}
    line = bench._metric_line(990.7, big, 0.1, [])
    assert len(line) <= 2000 - len("\n")
    parsed = json.loads(line)
    assert parsed["queries_truncated"] >= 1
    assert "a_rather_long_query_name_07" in parsed["queries"]
