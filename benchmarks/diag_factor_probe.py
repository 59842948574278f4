#!/usr/bin/env python
"""A/B: materialized [R,C] diag phasor vs rank-factored row/col phasors.

The current `_apply_diag_segment` builds the full [R, C] phase-angle
array (one parity-sign matmul), takes a 2^n-element complex exp (two
VPU transcendental sweeps), and multiplies the state.  But on 1D-chain
workloads (TFIM + brick-wall HEA) almost every parity factor touches
only row (major) or only column (minor) qubits -- the only mixed factor
is the bond crossing the major/minor boundary.  The phasor then factors:

  exp(i*phase)[r,c] =
      e_r[r] * e_c[c] * prod_cross (cos w_k + i sin w_k * s_k[r] t_k[c])

with e_r = exp(i * row_phase) needing only R transcendentals (128x fewer)
and the cross factors needing SCALAR trig.  This probe times both on the
headline's diag segment (Z^b every qubit + full brick-wall CZ layer).

  python -m benchmarks.diag_factor_probe [--qubits 24] [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from benchmarks import _cache

_cache.enable_if_accelerator()

import jax
import jax.numpy as jnp

from qhbmlib_tpu.ops import circuit_ir as ir
from qhbmlib_tpu.ops import statevector as sv


def diag_segment(n):
  b = ir.CircuitBuilder(n)
  for q in range(n):
    b.zp(q, f"z_{q}")
  for q in range(0, n - 1, 2):
    b.cz(q, q + 1, f"cz_e_{q}")
  for q in range(1, n - 1, 2):
    b.cz(q, q + 1, f"cz_o_{q}")
  circ = b.build()
  return list(circ.gates)


def factored_apply(gates, angles, state):
  """The production factored path (ops/statevector.py)."""
  factors = sv.diag_segment_phasor_factors(gates, angles, state.shape)
  assert factors is not None, "segment unexpectedly exceeds _CROSS_MAX"
  (out,) = sv.apply_diag_segment_phasor(factors, (state,))
  return out


def materialized_apply(gates, angles, state):
  """The pre-round-4 materialized [R, C] phase path."""
  total = sv.diag_segment_phase(gates, angles, state.shape)
  return state * jnp.exp(1j * total.astype(sv.COMPLEX_DTYPE))


def _chain(step, n, iters):
  @jax.jit
  def run(values):
    state = sv.basis_state(n, jnp.zeros([n], jnp.int8))

    def body(carry, _):
      state, vals = carry
      state = step(vals, state)
      probe = jnp.real(state.reshape(-1)[0]).astype(jnp.float32)
      return (state, vals + 1e-6 * probe), probe

    (state, _), probes = jax.lax.scan(body, (state, values), None,
                                      length=iters)
    return jnp.sum(probes) + jnp.real(state.reshape(-1)[1])

  return run


def time_fn(fn, values, reps=3):
  r = fn(values)
  jax.block_until_ready(r)
  best = float("inf")
  for _ in range(reps):
    t0 = time.perf_counter()
    r = fn(values)
    jax.block_until_ready(r)
    best = min(best, time.perf_counter() - t0)
  return best


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--qubits", type=int, default=24)
  ap.add_argument("--iters", type=int, default=64)
  args = ap.parse_args()
  n = args.qubits
  gates = diag_segment(n)
  k = len(gates)
  values = jnp.linspace(0.1, 1.0, k)

  def cur(vals, state):
    return materialized_apply(gates, [vals[i] for i in range(k)], state)

  def fac(vals, state):
    return factored_apply(gates, [vals[i] for i in range(k)], state)

  # correctness first (single apply; complex construction stays under jit --
  # eager complex ops poison the axon tunnel)
  def _mk_state():
    re = jax.random.normal(jax.random.PRNGKey(0), (2 ** (n - 7), 128),
                           jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), re.shape, jnp.float32)
    return jax.lax.complex(re, im)

  a = jax.jit(lambda v: cur(v, _mk_state()))(values)
  b = jax.jit(lambda v: fac(v, _mk_state()))(values)
  err = float(jnp.max(jnp.abs(a - b)))

  out = {"qubits": n, "factors": k, "max_abs_err": err}
  for name, step in (("materialized", cur), ("factored", fac)):
    fn = _chain(step, n, args.iters)
    s = time_fn(fn, values)
    out[name + "_ms"] = round(s / args.iters * 1e3, 3)
    print(f"[diag_factor] {name}: {out[name + '_ms']} ms/apply",
          file=sys.stderr, flush=True)
  out["speedup"] = round(out["materialized_ms"] / out["factored_ms"], 2)
  print(json.dumps(out))


if __name__ == "__main__":
  main()
