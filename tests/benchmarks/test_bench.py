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
  """A healthy child's stdout is relayed live INSIDE _run_accel_child (see
  test_relay_streams_and_watchdog_kill_preserves_output); main() must only
  record the result -- re-emitting it here would duplicate the headline."""
  child_json = json.dumps({
      "metric": "vqt_train_steps_per_sec_24q", "value": 2.5,
      "unit": "steps/s", "vs_baseline": 800.0, "extra": {}}) + "\n"
  monkeypatch.setattr(bench, "_run_accel_child", lambda: (0, child_json))
  monkeypatch.setattr(sys, "argv", ["bench.py"])
  bench.main()
  assert capsys.readouterr().out == ""  # no duplicate emission
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
  monkeypatch.setattr(bench, "cpu_baseline", lambda name, cfg, **kw: 0.003)
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
  monkeypatch.setattr(bench, "cpu_baseline", lambda name, cfg, **kw: 0.003)
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
  monkeypatch.setattr(bench, "cpu_baseline", lambda name, cfg, **kw: 0.003)
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
  monkeypatch.setattr(bench, "cpu_baseline", lambda name, cfg, **kw: 9.6)
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


# ---- round-5 kill-proofing contract (VERDICT r4 next #1) ----------------


def test_choose_headline_keeps_default_under_gate(bench):
  value, precision, demoted = bench.choose_headline(5.2, 2.5, 0.009)
  assert (value, demoted) == (5.2, False)


def test_choose_headline_demotes_on_gate_breach(bench):
  value, precision, demoted = bench.choose_headline(5.2, 2.5, 0.011)
  assert (value, precision, demoted) == (2.5, "high", True)


def test_choose_headline_breach_without_high_measurement(bench):
  """No high-mode number to demote to: keep default (the extra still
  carries the measured gate error for the record)."""
  value, _, demoted = bench.choose_headline(5.2, None, 0.02)
  assert (value, demoted) == (5.2, False)
  value, _, demoted = bench.choose_headline(5.2, float("nan"), 0.02)
  assert (value, demoted) == (5.2, False)


def test_choose_headline_unmeasured_gate_keeps_default(bench):
  value, _, demoted = bench.choose_headline(5.2, 2.5, None)
  assert (value, demoted) == (5.2, False)


def test_forwarded_provisional_suppresses_fallback(bench, monkeypatch,
                                                   capsys):
  """A child killed AFTER its provisional headline reached stdout must not
  have that fresh measurement overridden by a stale fallback emission (the
  last JSON line is what the driver records)."""
  provisional = json.dumps({
      "metric": "vqt_train_steps_per_sec_24q", "value": 5.1,
      "unit": "steps/s", "vs_baseline": 1550.0,
      "extra": {"provisional": True}}) + "\n"
  monkeypatch.setattr(bench, "_run_accel_child", lambda: (None, provisional))
  with open(bench.LAST_TPU_PATH, "w") as f:
    json.dump({"value": 2.45, "metric": "vqt_train_steps_per_sec_24q",
               "vs_baseline": 827.1,
               "recorded_utc": "2026-08-17T12:00:00Z"}, f)
  monkeypatch.setattr(sys, "argv", ["bench.py"])
  bench.main()
  # In the real flow the provisional line was already relayed live by
  # _run_accel_child's stdout pump; main() must add NOTHING after it.
  assert capsys.readouterr().out == ""


def test_provisional_line_is_never_recorded_as_tpu(bench):
  line = json.dumps({"metric": "vqt_train_steps_per_sec_24q", "value": 5.1,
                     "extra": {"provisional": True,
                               "platform": "axon"}}) + "\n"
  bench._record_last_tpu(line)
  assert not os.path.exists(bench.LAST_TPU_PATH)


def test_relay_streams_and_watchdog_kill_preserves_output(bench, monkeypatch,
                                                          capfd):
  """_run_accel_child must relay child stdout AS IT ARRIVES and return
  whatever was relayed when the watchdog kills a hung child -- the exact
  round-4 loss mode (provisional printed, then a hang, then a kill)."""
  import subprocess as sp
  fake_child = (
      "import json, sys, time\n"
      "sys.stderr.write('[bench:fake] devices: [FakeDev]\\n')\n"
      "sys.stderr.flush()\n"
      "print(json.dumps({'metric': 'vqt_train_steps_per_sec_24q',\n"
      "                  'value': 5.1, 'unit': 'steps/s',\n"
      "                  'vs_baseline': None,\n"
      "                  'extra': {'provisional': True}}), flush=True)\n"
      "time.sleep(600)\n")
  real_popen = sp.Popen

  def fake_popen(cmd, **kw):
    return real_popen([sys.executable, "-c", fake_child], **kw)

  monkeypatch.setattr(bench.subprocess, "Popen", fake_popen)
  monkeypatch.setenv("QHBM_BENCH_TOTAL_TIMEOUT", "6")
  monkeypatch.setenv("QHBM_BENCH_INIT_TIMEOUT", "6")
  t0 = __import__("time").time()
  rc, out = bench._run_accel_child()
  assert rc is None  # watchdog kill, not a clean exit
  assert __import__("time").time() - t0 < 30
  parsed = json.loads(out.strip().splitlines()[-1])
  assert parsed["value"] == 5.1
  # ...and the line reached THIS process's stdout while the child still ran.
  assert '"value": 5.1' in capfd.readouterr().out
  assert bench._has_json_line(out)


def test_budget_guard_skips_uncached_baseline(bench, monkeypatch, capsys):
  """On a cache miss with no remaining watchdog budget the baseline is NaN
  (headline survives), never a 7200s subprocess (round-4 failure mode)."""
  base = bench.cpu_baseline("24q", bench.WORKLOADS["24q"], budget_s=30.0)
  assert base != base  # NaN
  base = bench.independent_baseline("24q", bench.WORKLOADS["24q"],
                                    budget_s=30.0)
  assert base != base


def test_watchdog_default_beats_driver_budget(bench):
  """The internal watchdog MUST fire before the driver's ~3600s kill, or
  the fallback emitter never runs (BENCH_r04.json rc=124)."""
  assert bench.TOTAL_TIMEOUT_DEFAULT <= 3000


def test_external_sigkill_after_provisional_leaves_parseable_json(tmp_path):
  """End-to-end: run the REAL bench (CPU hook, tiny workload), SIGKILL the
  whole process tree the moment the provisional headline appears on stdout,
  and assert the captured stdout still ends in a parseable headline JSON --
  the driver-contract guarantee round 4 lacked."""
  import signal
  import subprocess as sp
  import time as _time

  env = dict(os.environ,
             QHBM_BENCH_PLATFORM="cpu",
             QHBM_BENCH_QUBITS="6", QHBM_BENCH_LAYERS="1",
             QHBM_BENCH_SAMPLES="8", QHBM_BENCH_MAX_UNIQUE="2",
             QHBM_BENCH_HANG_AFTER_PROVISIONAL="1",
             QHBM_BENCH_TOTAL_TIMEOUT="600",
             QHBM_MATMUL_PRECISION="default")
  proc = sp.Popen([sys.executable, os.path.join(REPO, "bench.py")],
                  stdout=sp.PIPE, stderr=sp.DEVNULL, text=True,
                  start_new_session=True, env=env, cwd=tmp_path)
  lines = []
  try:
    deadline = _time.time() + 300
    while _time.time() < deadline:
      line = proc.stdout.readline()
      if not line:
        break
      lines.append(line)
      if '"provisional": true' in line:
        break
    else:
      pytest.fail("no provisional line within 300s")
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
  finally:
    try:
      os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
      pass
    proc.wait()
  assert lines, "bench printed nothing before the kill"
  parsed = json.loads(lines[-1])
  assert parsed["metric"] == "vqt_train_steps_per_sec_6q"
  assert parsed["value"] > 0
  assert parsed["extra"]["provisional"] is True
