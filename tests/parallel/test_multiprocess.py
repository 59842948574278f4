"""Multi-process SPMD integration: a real process boundary under the mesh.

The single-process parallel tests (test_sharded_sv.py etc.) validate the
sharded programs on one process's 8 virtual devices; these tests add what
those cannot cover -- `jax.distributed` runtime join, cross-process gloo
collectives (the ICI/DCN transport analog on CPU), global-mesh construction
from non-addressable devices, and the `topology.sync_params` replicated-
input contract.  SURVEY.md section 2.3 names this as the communication-
backend plan; the reference has no multi-process story at all.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "mp_vqt_worker.py")


def _free_port():
  with socket.socket() as s:
    s.bind(("localhost", 0))
    return s.getsockname()[1]


def _run_workers(nproc, devices_per_proc, data, state):
  port = _free_port()
  env = dict(os.environ)
  env.pop("XLA_FLAGS", None)  # worker pins its own device count
  procs = [
      subprocess.Popen([sys.executable, WORKER, str(i), str(nproc),
                        str(port), str(devices_per_proc), str(data),
                        str(state)], env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.PIPE, text=True)
      for i in range(nproc)
  ]
  results = {}
  for i, p in enumerate(procs):
    out, err = p.communicate(timeout=600)
    assert p.returncode == 0, f"worker {i} failed:\n{err[-4000:]}"
    m = re.search(r"RESULT pid=(\d+) loss=(\S+) gsum=(\S+) psum=(\S+)", out)
    assert m, f"worker {i} printed no RESULT:\n{out}\n{err[-2000:]}"
    results[int(m.group(1))] = tuple(float(m.group(j)) for j in (2, 3, 4))
  assert set(results) == set(range(nproc))
  return results


def _assert_agree(results):
  # Outputs of one SPMD program over replicated inputs: processes must agree
  # (each already self-checked against its local dense oracle).
  vals = list(results.values())
  for loss, gsum, psum in vals[1:]:
    assert abs(loss - vals[0][0]) < 1e-6, results
    assert abs(gsum - vals[0][1]) < 1e-5, results
    assert abs(psum - vals[0][2]) < 1e-5, results


@pytest.mark.slow
def test_two_process_sharded_vqt_matches_dense():
  """2 processes x 2 devices, ('data'=2, 'state'=2): the state axis lives
  within each process; the data-axis gradient psum crosses the boundary."""
  _assert_agree(_run_workers(nproc=2, devices_per_proc=2, data=2, state=2))


@pytest.mark.slow
def test_two_process_mixed_mesh_dress_rehearsal():
  """2 processes x 4 devices, ('data'=2, 'state'=4): the multi-host dress
  rehearsal for real v5p-8 runs -- amplitude sharding at width 4 under a
  cross-process data axis, one full VQT train step (loss + adjoint grads +
  data psum + Adam update) agreeing bit-for-bit between processes."""
  _assert_agree(_run_workers(nproc=2, devices_per_proc=4, data=2, state=4))
