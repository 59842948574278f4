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


@pytest.mark.slow
def test_two_process_sharded_vqt_matches_dense():
  nproc = 2
  port = _free_port()
  env = dict(os.environ)
  env.pop("XLA_FLAGS", None)  # worker pins its own 2-device count
  procs = [
      subprocess.Popen([sys.executable, WORKER, str(i), str(nproc),
                        str(port)], env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.PIPE, text=True)
      for i in range(nproc)
  ]
  results = {}
  for i, p in enumerate(procs):
    out, err = p.communicate(timeout=600)
    assert p.returncode == 0, f"worker {i} failed:\n{err[-4000:]}"
    m = re.search(r"RESULT pid=(\d+) loss=(\S+) gsum=(\S+)", out)
    assert m, f"worker {i} printed no RESULT:\n{out}\n{err[-2000:]}"
    results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))

  assert set(results) == {0, 1}
  # Outputs of one SPMD program over replicated inputs: processes must agree
  # (each already self-checked against its local dense oracle).
  loss0, gsum0 = results[0]
  loss1, gsum1 = results[1]
  assert abs(loss0 - loss1) < 1e-6, results
  assert abs(gsum0 - gsum1) < 1e-5, results
