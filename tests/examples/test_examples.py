"""Smoke tests: every example script runs end to end (shrunk step counts).

The examples double as living documentation for users migrating from the
reference library (docs/migration.md), so CI must catch them rotting.
"""

import pathlib
import runpy


EXAMPLES = pathlib.Path(__file__).resolve().parent.parent.parent / "examples"


def _run(name, monkeypatch, steps):
  # conftest.py already forces the CPU platform + 8 virtual devices; the
  # examples' own QHBM_EXAMPLE_PLATFORM hook must stay unset (a live-config
  # platform update after backend init would raise).
  monkeypatch.delenv("QHBM_EXAMPLE_PLATFORM", raising=False)
  monkeypatch.delenv("QHBM_EXAMPLE_VIRTUAL_DEVICES", raising=False)
  monkeypatch.setenv("QHBM_EXAMPLE_STEPS", str(steps))
  return runpy.run_path(str(EXAMPLES / name), run_name="not_main")


def test_vqt_thermal_state_example(monkeypatch):
  mod = _run("vqt_thermal_state.py", monkeypatch, steps=60)
  fid = mod["main"]()
  assert 0.5 < fid <= 1.0


def test_qmhl_modular_hamiltonian_example(monkeypatch):
  mod = _run("qmhl_modular_hamiltonian.py", monkeypatch, steps=80)
  fid = mod["main"]()
  assert 0.5 < fid <= 1.0


def test_multichip_sharded_vqt_example(monkeypatch):
  mod = _run("multichip_sharded_vqt.py", monkeypatch, steps=12)
  losses = mod["main"]()
  assert losses[-1] < losses[0]
