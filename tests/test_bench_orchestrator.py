"""bench.py orchestration: the round scoreboard must be un-losable.

Round-3 postmortem (VERDICT r3): the TPU tunnel's remote compile helper
stalled AFTER a passing probe, bench.py printed nothing before the driver's
timeout, and the round recorded no number despite in-session measurements.
These tests drive the parent orchestrator end-to-end in subprocesses:

  * a healthy (CPU) run prints a parseable contract line the moment the
    flagship child finishes, then a final line;
  * a HUNG flagship child (simulated via _BENCH_FAKE_HANG, which sleeps
    before importing jax) still yields a parseable line by the watchdog
    deadline — from the cache when a same-platform measurement exists,
    loudly labeled FAILED otherwise.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _run(env_extra, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # explicit: parent skips the probe
    env.update(env_extra)
    proc = subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=timeout)
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    return proc, lines


def _assert_contract(d):
    assert set(d) == {"metric", "value", "unit", "vs_baseline", "extra"}
    assert isinstance(d["value"], (int, float))
    assert d["unit"] == "frames/sec"


def test_hung_flagship_no_cache_emits_failed_line(tmp_path):
    proc, lines = _run({
        "_BENCH_FAKE_HANG": "flagship",
        "_BENCH_FLAGSHIP_TIMEOUT_S": "4",
        "_BENCH_FLUSH_S": "3",
        "_BENCH_ONLY": "",
        "_BENCH_CACHE_PATH": str(tmp_path / "cache.json"),
    }, timeout=120)
    assert lines, f"no parseable line; stderr:\n{proc.stderr}"
    for d in lines:
        _assert_contract(d)
    last = lines[-1]
    assert last["value"] == 0.0
    assert "FAILED" in last["metric"]


def test_hung_flagship_with_cache_emits_cached_line(tmp_path):
    cache = tmp_path / "cache.json"
    cache.write_text(json.dumps({"flagship": {
        "value": 123.45, "platform_class": "cpu",
        "commit": "deadbee", "when": "2026-08-19 00:00Z"}}))
    proc, lines = _run({
        "_BENCH_FAKE_HANG": "flagship",
        "_BENCH_FLAGSHIP_TIMEOUT_S": "4",
        "_BENCH_FLUSH_S": "3",
        "_BENCH_ONLY": "",
        "_BENCH_CACHE_PATH": str(cache),
    }, timeout=120)
    assert lines, f"no parseable line; stderr:\n{proc.stderr}"
    last = lines[-1]
    _assert_contract(last)
    assert last["value"] == 123.45
    assert "CACHED" in last["metric"] and "deadbee" in last["metric"]


def test_tpu_cache_never_serves_a_cpu_run(tmp_path):
    """A cached TPU number must not masquerade as a CPU measurement
    (and vice versa on the real driver)."""
    cache = tmp_path / "cache.json"
    cache.write_text(json.dumps({"flagship": {
        "value": 116.75, "platform_class": "tpu",
        "commit": "deadbee", "when": "2026-08-19 00:00Z"}}))
    proc, lines = _run({
        "_BENCH_FAKE_HANG": "flagship",
        "_BENCH_FLAGSHIP_TIMEOUT_S": "4",
        "_BENCH_FLUSH_S": "3",
        "_BENCH_ONLY": "",
        "_BENCH_CACHE_PATH": str(cache),
    }, timeout=120)
    last = lines[-1]
    assert last["value"] == 0.0
    assert "FAILED" in last["metric"]


def test_hung_extra_with_cache_serves_cached_value(tmp_path):
    """An extra whose child hangs (stuck compile helper) must fall back to
    its last cached same-platform value, labeled under extra._cached —
    not report an opaque error while a measured number exists."""
    cache = tmp_path / "cache.json"
    cache.write_text(json.dumps({
        "flagship@cpu": {"value": 11.0, "platform_class": "cpu",
                         "commit": "deadbee", "when": "2026-08-19 00:00Z"},
        "train_fps@cpu": {"value": 5.5, "platform_class": "cpu",
                          "commit": "deadbee", "when": "2026-08-19 00:00Z"},
    }))
    proc, lines = _run({
        "_BENCH_FAKE_HANG": "flagship,train_fps",
        "_BENCH_FLAGSHIP_TIMEOUT_S": "4",
        "_BENCH_METRIC_TIMEOUT_S": "4",
        "_BENCH_FLUSH_S": "3",
        "_BENCH_ONLY": "train_fps",
        "_BENCH_CACHE_PATH": str(cache),
    }, timeout=120)
    last = lines[-1]
    _assert_contract(last)
    assert last["extra"]["train_fps"] == 5.5
    assert "deadbee" in last["extra"]["_cached"]["train_fps"]
    assert "timeout" in last["extra"]["_cached"]["train_fps"]


def _run_tunnel_down(env_extra, timeout=120):
    """Run bench with the accelerator probe FORCED to fail (0.2s timeout
    kills the probe subprocess before python even starts), exercising the
    cpu_fallback path without JAX_PLATFORMS=cpu."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "_BENCH_PROBE_TIMEOUT": "0.2",
        "_BENCH_PROBE_RETRY_PAUSE": "0",
    })
    env.update(env_extra)
    proc = subprocess.run([sys.executable, BENCH], env=env,
                          capture_output=True, text=True, timeout=timeout)
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    return proc, lines


def test_tunnel_down_headlines_cached_tpu_flagship(tmp_path):
    """VERDICT r4 #1: with the tunnel down and a measured TPU flagship in
    the cache, the headline must be the cached TPU number (with provenance)
    — never a CPU smoke figure — and cached @tpu extras must be served."""
    cache = tmp_path / "cache.json"
    cache.write_text(json.dumps({
        "flagship@tpu": {"value": 160.75, "platform_class": "tpu",
                         "commit": "21af9b2", "when": "2026-08-19 21:39Z"},
        "train_fps@tpu": {"value": 36.29, "platform_class": "tpu",
                          "commit": "0ee3387", "when": "2026-08-19 22:02Z"},
    }))
    # the live CPU smoke children hang -> only cached values can appear
    proc, lines = _run_tunnel_down({
        "_BENCH_FAKE_HANG": "flagship,train_fps",
        "_BENCH_FLAGSHIP_TIMEOUT_S": "4",
        "_BENCH_METRIC_TIMEOUT_S": "4",
        "_BENCH_FLUSH_S": "3",
        "_BENCH_ONLY": "train_fps",
        "_BENCH_CACHE_PATH": str(cache),
    })
    assert lines, f"no parseable line; stderr:\n{proc.stderr}"
    for d in lines:
        _assert_contract(d)
    last = lines[-1]
    assert last["value"] == 160.75
    assert "CACHED TPU measurement" in last["metric"]
    assert "21af9b2" in last["metric"]
    assert "NOT a TPU number" not in last["metric"]
    # the TPU-config description, not the CPU smoke one
    assert "batch 32" in last["metric"]
    assert last["extra"]["train_fps"] == 36.29
    assert "0ee3387" in last["extra"]["_cached"]["train_fps"]
    # live CPU smoke failures land under cpu_smoke_*, not the real slots
    assert "error" in str(last["extra"].get("cpu_smoke_train_fps", "error"))


def test_tunnel_down_without_tpu_cache_keeps_cpu_fallback_label(tmp_path):
    """No TPU measurement ever cached -> the old loud CPU-fallback labeling
    must survive (a CPU number must never masquerade as TPU)."""
    cache = tmp_path / "cache.json"
    cache.write_text(json.dumps({
        "flagship@cpu": {"value": 32.63, "platform_class": "cpu",
                         "commit": "9544830", "when": "2026-08-19 19:18Z"},
    }))
    proc, lines = _run_tunnel_down({
        "_BENCH_FAKE_HANG": "flagship",
        "_BENCH_FLAGSHIP_TIMEOUT_S": "4",
        "_BENCH_FLUSH_S": "3",
        "_BENCH_ONLY": "",
        "_BENCH_CACHE_PATH": str(cache),
    })
    assert lines, f"no parseable line; stderr:\n{proc.stderr}"
    last = lines[-1]
    _assert_contract(last)
    assert last["value"] == 32.63
    assert "NOT a TPU number" in last["metric"]


@pytest.mark.slow
def test_healthy_cpu_run_prints_flagship_then_final(tmp_path):
    """Full healthy path: flagship child really compiles + measures the CPU
    smoke config; the parent prints a line immediately and caches it."""
    cache = tmp_path / "cache.json"
    proc, lines = _run({
        "_BENCH_ONLY": "",
        "_BENCH_CACHE_PATH": str(cache),
        "_BENCH_FLUSH_S": "500",
    }, timeout=560)
    assert len(lines) >= 2, f"stderr:\n{proc.stderr}"  # immediate + final
    for d in lines:
        _assert_contract(d)
    assert lines[-1]["value"] > 0
    assert "FAILED" not in lines[-1]["metric"]
    saved = json.loads(cache.read_text())
    assert saved["flagship@cpu"]["platform_class"] == "cpu"
    assert saved["flagship@cpu"]["value"] == lines[-1]["value"]
