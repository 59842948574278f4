"""bench.py harness contract tests (no accelerator required).

The round driver runs `python bench.py` and records the last stdout JSON
line; these tests pin the watchdog-parent contract: a healthy child's JSON
is relayed verbatim, an unresponsive child (the downed-tunnel failure mode
observed 2026-08-17/18) degrades to an honest cpu-fallback JSON instead of
hanging, and test-hook CPU runs never masquerade as TPU evidence.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@pytest.fixture()
def bench(monkeypatch, tmp_path):
  spec = importlib.util.spec_from_file_location(
      "bench_under_test", os.path.join(REPO, "bench.py"))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  # Redirect every artifact write into the sandbox.
  monkeypatch.setattr(mod, "CACHE_PATH", str(tmp_path / "cpu_cache.json"))
  monkeypatch.setattr(mod, "LAST_TPU_PATH", str(tmp_path / "last_tpu.json"))
  # bench.main() os.environ.setdefault's the bench's matmul-precision choice
  # ('default', 1-pass bf16); pin it via monkeypatch so the write is undone
  # after the test -- leaking it flips later precision-sensitive tests
  # (tests/ops Pallas-vs-XLA comparisons run at the library default 'high').
  monkeypatch.setenv("QHBM_MATMUL_PRECISION", mod.PRECISION)
  return mod


def _parse_last_json(capsys):
  out = capsys.readouterr().out.strip().splitlines()
  return json.loads(out[-1])


def test_relay_on_healthy_child(bench, monkeypatch, capsys):
  child_json = json.dumps({
      "metric": "vqt_train_steps_per_sec_24q", "value": 2.5,
      "unit": "steps/s", "vs_baseline": 800.0, "extra": {}}) + "\n"
  monkeypatch.setattr(bench, "_run_accel_child", lambda: (0, child_json))
  monkeypatch.setattr(sys, "argv", ["bench.py"])
  bench.main()
  assert _parse_last_json(capsys)["value"] == 2.5
  # A successful accelerator run is recorded for future fallbacks.
  with open(bench.LAST_TPU_PATH) as f:
    recorded = json.load(f)
  assert recorded["value"] == 2.5 and "recorded_utc" in recorded


def test_fallback_on_hung_child_reemits_recorded_tpu(bench, monkeypatch,
                                                     capsys):
  """With a recorded accelerator run of the same workload, the fallback
  headline is that measurement, explicitly labeled stale (a CPU headline
  with vs_baseline 1.0 would misread as 'no speedup')."""
  monkeypatch.setattr(bench, "_run_accel_child", lambda: (None, ""))
  monkeypatch.setattr(bench, "cpu_baseline", lambda name, cfg: 0.003)
  with open(bench.LAST_TPU_PATH, "w") as f:
    json.dump({"value": 2.45, "metric": "vqt_train_steps_per_sec_24q",
               "vs_baseline": 827.1, "recorded_utc": "2026-08-17T12:00:00Z"},
              f)
  monkeypatch.setattr(sys, "argv", ["bench.py"])
  bench.main()
  parsed = _parse_last_json(capsys)
  assert parsed["metric"] == "vqt_train_steps_per_sec_24q"
  assert parsed["value"] == 2.45
  assert parsed["vs_baseline"] == 827.1
  assert parsed["extra"]["platform"] == "tpu-recorded-stale"
  assert parsed["extra"]["recorded_utc"] == "2026-08-17T12:00:00Z"
  assert parsed["extra"]["cpu_fresh_steps_per_sec"] == 0.003
  assert "NOT a fresh run" in parsed["extra"]["note"]


def test_fallback_on_hung_child_without_recording_is_cpu(bench, monkeypatch,
                                                         capsys):
  """With NO recorded accelerator measurement, the fallback stays an honest
  CPU number with vs_baseline 1.0."""
  monkeypatch.setattr(bench, "_run_accel_child", lambda: (None, ""))
  monkeypatch.setattr(bench, "cpu_baseline", lambda name, cfg: 0.003)
  monkeypatch.setattr(sys, "argv", ["bench.py"])
  bench.main()
  parsed = _parse_last_json(capsys)
  assert parsed["value"] == 0.003
  assert parsed["vs_baseline"] == 1.0
  assert parsed["extra"]["platform"] == "cpu-fallback"


def test_cpu_platform_child_is_not_recorded_as_tpu(bench):
  """A child that silently initialized the CPU backend (no accelerator
  plugin) must not produce accelerator evidence."""
  out = json.dumps({"value": 5.0, "metric": "vqt_train_steps_per_sec_24q",
                    "extra": {"platform": "cpu"}}) + "\n"
  bench._record_last_tpu(out)
  assert not os.path.exists(bench.LAST_TPU_PATH)


def test_smoke_workload_never_overwrites_headline_record(bench):
  out = json.dumps({
      "value": 99.0, "metric": "vqt_train_steps_per_sec_24q",
      "extra": {"platform": "axon",
                "workload": {"n": 24, "layers": 1, "samples": 10,
                             "max_unique": 2}}}) + "\n"
  bench._record_last_tpu(out)
  assert not os.path.exists(bench.LAST_TPU_PATH)


def test_fallback_rejects_workload_mismatch(bench, monkeypatch, capsys):
  """A recording of a DIFFERENT workload config under the same metric name
  must not be re-emitted as 'this exact workload'."""
  monkeypatch.setattr(bench, "_run_accel_child", lambda: (None, ""))
  monkeypatch.setattr(bench, "cpu_baseline", lambda name, cfg: 0.003)
  with open(bench.LAST_TPU_PATH, "w") as f:
    json.dump({"value": 99.0, "metric": "vqt_train_steps_per_sec_24q",
               "vs_baseline": 12345.0,
               "extra": {"workload": {"n": 24, "layers": 1, "samples": 10,
                                      "max_unique": 2}}}, f)
  monkeypatch.setattr(sys, "argv", ["bench.py"])
  bench.main()
  parsed = _parse_last_json(capsys)
  assert parsed["extra"]["platform"] == "cpu-fallback"
  assert parsed["value"] == 0.003


def test_stale_reemission_is_never_rerecorded(bench):
  stale = json.dumps({"value": 2.45,
                      "extra": {"platform": "tpu-recorded-stale"}}) + "\n"
  bench._record_last_tpu(stale)
  assert not os.path.exists(bench.LAST_TPU_PATH)


def test_fallback_respects_env_workload(bench, monkeypatch, capsys):
  monkeypatch.setenv("QHBM_BENCH_QUBITS", "12")
  monkeypatch.setattr(bench, "_run_accel_child", lambda: (1, ""))
  monkeypatch.setattr(bench, "cpu_baseline", lambda name, cfg: 9.6)
  monkeypatch.setattr(sys, "argv", ["bench.py"])
  bench.main()
  assert _parse_last_json(capsys)["metric"] == "vqt_train_steps_per_sec_12q"


def test_cpu_hook_runs_are_not_recorded_as_tpu(bench, monkeypatch):
  monkeypatch.setenv("QHBM_BENCH_PLATFORM", "cpu")
  bench._record_last_tpu(json.dumps({"value": 1.0}) + "\n")
  assert not os.path.exists(bench.LAST_TPU_PATH)


def test_fallback_json_is_never_recorded_as_tpu(bench):
  fallback = json.dumps({"value": 0.003,
                         "extra": {"platform": "cpu-fallback"}}) + "\n"
  bench._record_last_tpu(fallback)
  assert not os.path.exists(bench.LAST_TPU_PATH)
