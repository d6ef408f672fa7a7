"""Smoke test for bench.py — the driver runs it unattended on the real chip
at round end, so its glue must never break silently.

Runs the whole bench in a subprocess with VIDEOGPA_BENCH_TINY=1 (every model
swapped for its tiny() preset, shapes derived from the config — same code
paths) and VIDEOGPA_BENCH_CPU=1 (CPU backend, interpreted Pallas kernels),
with all sub-benches enabled. The int8/W8A8 extras are switched off here:
their numerics are covered by tests/test_quant.py and they double the
runtime without touching unique glue.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_denoise_block_fast():
    """Default-gate smoke: ONE bench block through the real subprocess
    orchestration (parent spawns child, merges JSON). The full-scoreboard
    smokes below are slow-marked; this keeps the driver-facing glue
    exercised on every default run."""
    env = dict(os.environ)
    env.update(
        VIDEOGPA_BENCH_TINY="1",
        VIDEOGPA_BENCH_CPU="1",
        VIDEOGPA_BENCH_WAN="0",
        VIDEOGPA_BENCH_REWARD="0",
        VIDEOGPA_BENCH_INT8="0",
        VIDEOGPA_BENCH_W8A8="0",
        VIDEOGPA_BENCH_COG15="0",
        VIDEOGPA_BENCH_TRAIN="0",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["metric"] == "denoise_steps_per_sec_per_chip"
    assert result["tiny"] is True
    assert result["value"] > 0, result
    errors = {k: v for k, v in result.items() if k.endswith("_error")}
    assert not errors, errors


@pytest.mark.slow
def test_bench_tiny_cpu_end_to_end():
    env = dict(os.environ)
    env.update(
        VIDEOGPA_BENCH_TINY="1",
        VIDEOGPA_BENCH_CPU="1",
        VIDEOGPA_BENCH_INT8="0",
        VIDEOGPA_BENCH_W8A8="0",
        VIDEOGPA_OVERLAP_EXACT="1",
        VIDEOGPA_BENCH_WAN="1",
        VIDEOGPA_BENCH_REWARD="1",
        VIDEOGPA_BENCH_TRAIN="1",
        VIDEOGPA_BENCH_OVERLAP="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    result = json.loads(line)

    assert result["metric"] == "denoise_steps_per_sec_per_chip"
    assert result["tiny"] is True
    assert result["value"] > 0
    # every enabled sub-bench must have produced its number, not an _error
    for key in (
        "wan_steps_per_sec",
        "reward_clips_per_min",
        "reward_clips_per_min_batched",
        "dpo_steps_per_sec_tiny",
        "genscore_clips_per_min_sequential",
        "genscore_clips_per_min_overlapped",
    ):
        assert key in result, (key, result)
        assert result[key] > 0, (key, result)
    # the three nested north-star blocks (what BENCH_r* records for the judge)
    for block, value_key in (
        ("denoise", "steps_per_sec"),
        ("wan", "steps_per_sec"),
        ("reward", "clips_per_min"),
    ):
        assert block in result, result
        assert result[block][value_key] > 0, (block, result[block])
        assert "vs_baseline" in result[block], (block, result[block])
    errors = {k: v for k, v in result.items() if k.endswith("_error")}
    assert not errors, errors


@pytest.mark.slow
def test_bench_budget_gates_extras_not_north_stars():
    """With a zero budget the extras (int8/W8A8/cog15) must be skipped and
    recorded, while the three north stars still run — the driver's
    BENCH_r*.json must carry the exact scoreboard even on a stall day."""
    env = dict(os.environ)
    env.update(
        VIDEOGPA_BENCH_TINY="1",
        VIDEOGPA_BENCH_CPU="1",
        VIDEOGPA_BENCH_BUDGET_S="0.000001",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    # north stars present
    assert result["value"] > 0
    assert result["wan_steps_per_sec"] > 0
    assert result["reward_clips_per_min_batched"] > 0
    # extras gated and recorded
    assert "int8_steps_per_sec" not in result
    assert "w8a8_steps_per_sec" not in result
    assert "cog15_steps_per_sec" not in result
    assert "denoise int8" in result.get("budget_skipped", []), result


def test_bench_retries_transient_resource_exhausted(monkeypatch, capsys):
    """A block whose child dies RESOURCE_EXHAUSTED once (previous child's
    HBM not yet released server-side — observed r05 on the cog15 W8A8
    block) is retried after a settle and the retry's result wins."""
    import importlib

    bench = importlib.import_module("bench")

    calls = {"n": 0}

    def fake_spawn(name, timeout_s):
        assert name == "denoise"
        calls["n"] += 1
        if calls["n"] == 1:
            return {"denoise_error": "RESOURCE_EXHAUSTED: TPU backend "
                                     "error (ResourceExhausted)."}, None
        return {"value": 0.5, "vs_baseline": 3.333}, None

    monkeypatch.setattr(bench, "_spawn_block", fake_spawn)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    for var in ("WAN", "REWARD", "INT8", "W8A8", "COG15", "TRAIN", "OVERLAP"):
        monkeypatch.setenv(f"VIDEOGPA_BENCH_{var}", "0")
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    out = json.loads(line)
    assert calls["n"] == 2
    assert out["value"] == 0.5
    assert "denoise_error" not in out


def test_bench_fallback_success_is_not_retried(monkeypatch, capsys):
    """A block that SUCCEEDED via its sequential fallback carries an
    informational ``*_batched_error`` mentioning RESOURCE_EXHAUSTED next to
    a valid result — the retry keys on the block's own error key, so this
    must NOT trigger a duplicate multi-minute run."""
    import importlib

    bench = importlib.import_module("bench")

    calls = {"n": 0}

    def fake_spawn(name, timeout_s):
        calls[name] = calls.get(name, 0) + 1
        calls["n"] += 1
        if name == "cog15":
            return {
                "cog15_steps_per_sec": 0.033,
                "cog15_mode": "sequential",
                "cog15_batched_error": "RESOURCE_EXHAUSTED: batched pair "
                                       "does not fit",
            }, None
        return {"value": 0.5, "vs_baseline": 3.333}, None

    monkeypatch.setattr(bench, "_spawn_block", fake_spawn)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    for var in ("WAN", "REWARD", "INT8", "W8A8", "TRAIN", "OVERLAP"):
        monkeypatch.setenv(f"VIDEOGPA_BENCH_{var}", "0")
    monkeypatch.setenv("VIDEOGPA_BENCH_COG15", "1")  # w8a8 off gates cog15 w8a8
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    out = json.loads(line)
    assert calls["cog15"] == 1, calls  # no duplicate run
    assert out["cog15_steps_per_sec"] == 0.033
    assert "RESOURCE_EXHAUSTED" in out["cog15_batched_error"]
