"""HBM-floor probe MATRIX: is the ~0.8 ms/pass big-state cost the chip's
true achievable stream rate, or a layout/measurement artifact?

Round-2 accepted an empirical "memory floor" (docs/design.md section 6:
a bare elementwise pass over a 24q f32 plane costs 0.79-0.83 ms) without
testing whether layout parameters move it.  This probe varies, at a fixed
qubit count:

  * minor-axis width: [2^(n-m), 2^m] for m in 7..10 (the engine's
    QHBM_MINOR_BITS layout knob);
  * flat 1-D [2^n] vs the 2-D plane;
  * element dtype: f32 vs bf16 (half the bytes for the same elements);
  * streams per pass: 1-array scale (r+w), 2-array add (2r+w), complex64
    plane scale (the engine's actual traffic shape);
  * state size: n-2 / n / n+2 (a fixed per-pass latency component shows
    up as sub-linear ms scaling).

All timings follow the chained-scan discipline (K dependent iterations
inside ONE jit, host-transfer sync, min over repeats -- tunnel timings
are bimodal; see .claude/skills/verify/SKILL.md).

  python -m benchmarks.hbm_matrix [--qubits 24] [--iters 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks import _cache

_cache.enable_if_accelerator()


def _chain(step, make_x, iters):
  """K dependent iterations of `step` inside one jit; `make_x` builds the
  initial array(s) INSIDE the jit so HBM residency matches the engine.

  DCE-proofing (round-3 lesson): the first probe version observed only
  element [0] of the carried array each iteration, and every shape from
  4KB to 268MB measured the SAME ~0.78 ms/iter at iters=32 -- XLA had
  sliced the observation out of the stream (or the cost was all
  per-call dispatch; both defeat the probe).  Each iteration now feeds a
  FULL reduction of the carried array back into the carry, so the whole
  plane must be materialized every step and no algebraic folding across
  iterations is possible (the step is data-dependent via p)."""

  @jax.jit
  def run(v):
    x = make_x()

    def body(carry, _):
      x, v = carry
      x = step(v, x)
      leaves = jax.tree_util.tree_leaves(x)
      # Full read of the produced array: sums feed v, so neither the
      # write nor the read can be eliminated or narrowed.
      p = sum(jnp.sum(jnp.real(l)).astype(jnp.float32) for l in leaves)
      return (x, v + 1e-9 * p), p

    (x, _), ps = jax.lax.scan(body, (x, v), None, length=iters)
    tail = jax.tree_util.tree_leaves(x)[0].reshape(-1)[1]
    return jnp.sum(ps) + jnp.real(tail).astype(jnp.float32)

  return run


def _time(name, run, iters, traffic_gb, results, repeats=3):
  v = jnp.float32(1.0001)
  float(np.asarray(run(v)))  # compile
  best = 1e9
  for r in range(repeats):
    t0 = time.perf_counter()
    float(np.asarray(run(v + 1e-5 * r)))
    best = min(best, (time.perf_counter() - t0) / iters * 1e3)
  rate = traffic_gb / (best / 1e3)
  print(f"[hbm_matrix] {name}: {best:.3f} ms -> {rate:.0f} GB/s",
        file=sys.stderr)
  results[name] = {"ms": round(best, 4), "gb_per_s": round(rate)}


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--qubits", type=int, default=24)
  p.add_argument("--iters", type=int, default=32)
  args = p.parse_args()
  n, iters = args.qubits, args.iters
  print(f"[hbm_matrix] devices: {jax.devices()}", file=sys.stderr)
  results = {}

  def f32_plane(r, c):
    return lambda: jnp.zeros((r, c), jnp.float32).at[0, 0].set(1.0)

  # 1. minor-width sweep (f32 scale, r+w traffic)
  for m in (7, 8, 9, 10):
    r, c = 2**(n - m), 2**m
    gb = 2 * (2**n) * 4 / 1e9
    _time(f"scale_f32_minor{m}", _chain(lambda v, x: x * v, f32_plane(r, c),
                                        iters), iters, gb, results)

  # 2. flat 1-D
  gb = 2 * (2**n) * 4 / 1e9
  _time("scale_f32_flat",
        _chain(lambda v, x: x * v,
               lambda: jnp.zeros((2**n,), jnp.float32).at[0].set(1.0),
               iters),
        iters, gb, results)

  # 3. bf16 plane (half the bytes)
  r, c = 2**(n - 7), 128
  gb = 2 * (2**n) * 2 / 1e9
  _time("scale_bf16_minor7",
        _chain(lambda v, x: x * v.astype(jnp.bfloat16),
               lambda: jnp.zeros((r, c), jnp.bfloat16).at[0, 0].set(1.0),
               iters),
        iters, gb, results)

  # 4. two-stream add (2 reads + 1 write over two resident arrays)
  gb = 3 * (2**n) * 4 / 1e9

  def make_pair():
    a = jnp.zeros((r, c), jnp.float32).at[0, 0].set(1.0)
    b = jnp.ones((r, c), jnp.float32)
    return (a, b)

  _time("add_f32_2stream",
        _chain(lambda v, xs: (xs[0] * v + xs[1], xs[1]), make_pair, iters),
        iters, gb, results)

  # 5. complex64 plane scale (the engine's real state traffic: 8B/elem)
  gb = 2 * (2**n) * 8 / 1e9
  _time("scale_c64_minor7",
        _chain(lambda v, x: x * (v + 0j),
               lambda: jnp.zeros((r, c), jnp.complex64).at[0, 0].set(1.0),
               iters),
        iters, gb, results)

  # 0b. per-iteration overhead floor: the SAME chained-scan body over a
  # tiny (4KB) array.  Whatever this costs is scan/dispatch latency, not
  # HBM traffic -- subtract it before reading a bandwidth off the others.
  _time("overhead_tiny",
        _chain(lambda v, x: x * v, f32_plane(8, 128), iters),
        iters, 2 * 8 * 128 * 4 / 1e9, results)

  # 6. size scaling: fixed-latency component shows as sub-linear ms
  for nn in (n - 2, n + 2):
    rr, cc = 2**(nn - 7), 128
    gb = 2 * (2**nn) * 4 / 1e9
    _time(f"scale_f32_n{nn}",
          _chain(lambda v, x: x * v, f32_plane(rr, cc), iters),
          iters, gb, results)

  print(json.dumps({"qubits": n, "iters": iters, "results": results}))


if __name__ == "__main__":
  main()
