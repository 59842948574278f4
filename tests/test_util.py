"""Shared test fixtures and numerical-gradient checkers.

Mirrors the reference's tests/test_util.py: the five-point-stencil
`approximate_gradient` (reference test_util.py:186-309) and the random
QHBM factory (reference test_util.py:70-95).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from qhbmlib_tpu import models, nn
from qhbmlib_tpu.inference import ebm, qnn, qhbm
from qhbmlib_tpu.models import circuit_utils
from qhbmlib_tpu.ops import paulis


def approximate_gradient(f: Callable, params, delta: float = 1e-2):
  """Five-point-stencil numerical gradient of scalar f w.r.t. a pytree.

  f must be deterministic (fix all seeds/keys inside).
  """
  leaves, treedef = jax.tree_util.tree_flatten(params)
  grads = []
  for i, leaf in enumerate(leaves):
    leaf = np.asarray(leaf, np.float64)
    flat = leaf.reshape(-1)
    g = np.zeros_like(flat)
    for j in range(flat.size):
      def f_at(eps):
        pert = flat.copy()
        pert[j] += eps
        new_leaves = list(leaves)
        new_leaves[i] = jnp.asarray(pert.reshape(leaf.shape), jnp.float32)
        return float(f(jax.tree_util.tree_unflatten(treedef, new_leaves)))
      g[j] = (f_at(-2 * delta) - 8 * f_at(-delta) + 8 * f_at(delta) -
              f_at(2 * delta)) / (12 * delta)
    grads.append(jnp.asarray(g.reshape(leaf.shape), jnp.float32))
  return jax.tree_util.tree_unflatten(treedef, grads)


def approximate_jacobian(f: Callable, params, delta: float = 1e-2):
  """Five-point-stencil Jacobian of vector-valued f w.r.t. a pytree
  (analog of reference test_util.py:252-309).

  Returns a pytree matching `params` where each leaf has shape
  f(params).shape + leaf.shape.
  """
  leaves, treedef = jax.tree_util.tree_flatten(params)
  out_shape = np.asarray(f(params)).shape
  jacs = []
  for i, leaf in enumerate(leaves):
    leaf = np.asarray(leaf, np.float64)
    flat = leaf.reshape(-1)
    j_cols = np.zeros(out_shape + (flat.size,))
    for j in range(flat.size):
      def f_at(eps):
        pert = flat.copy()
        pert[j] += eps
        new_leaves = list(leaves)
        new_leaves[i] = jnp.asarray(pert.reshape(leaf.shape), jnp.float32)
        return np.asarray(
            f(jax.tree_util.tree_unflatten(treedef, new_leaves)), np.float64)
      j_cols[..., j] = (f_at(-2 * delta) - 8 * f_at(-delta) +
                        8 * f_at(delta) - f_at(2 * delta)) / (12 * delta)
    jacs.append(jnp.asarray(j_cols.reshape(out_shape + leaf.shape),
                            jnp.float32))
  return jax.tree_util.tree_unflatten(treedef, jacs)


def jit_toggle(f: Callable) -> Callable:
  """Runs f both traced (jit) and eagerly, asserting identical results.

  The JAX analog of the reference's `eager_mode_toggle`
  (reference tests/test_util.py:169-183), which wrapped every behavioral
  test in tf.function and re-ran it eagerly.  Returns the jitted value.
  """

  def wrapped(*args, **kwargs):
    eager = f(*args, **kwargs)
    with jax.disable_jit(False):
      traced = jax.jit(lambda: f(*args, **kwargs))()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5), eager, traced)
    return traced

  return wrapped


def random_pauli_sum(num_qubits: int, num_terms: int, seed: int = 0):
  """Random Hermitian PauliSum."""
  rng = np.random.RandomState(seed)
  terms = []
  for _ in range(num_terms):
    qmap = {}
    for q in range(num_qubits):
      c = rng.randint(0, 4)
      if c:
        qmap[q] = int(c)
    if not qmap:
      qmap[rng.randint(num_qubits)] = 3
    terms.append((float(rng.uniform(-1, 1)), qmap))
  return paulis.pauli_sum_from_strings(num_qubits, terms)


def get_random_hamiltonian_and_inference(num_qubits: int,
                                         num_layers: int,
                                         name: str,
                                         num_samples: int,
                                         ebm_seed=None,
                                         initializer_seed: int = 0,
                                         exact: bool = False,
                                         sampled_qnn: bool = False,
                                         qnn_samples: int = 1000):
  """Random 2-local KOBE + hardware-efficient-ansatz QHBM
  (analog of reference test_util.py:70-95)."""
  energy = models.KOBE(
      list(range(num_qubits)), 2,
      nn.RandomUniform(-1, 1, seed=initializer_seed))
  e_infer = ebm.AnalyticEnergyInference(
      energy, num_samples, initial_seed=ebm_seed, exact=exact,
      name=f"{name}_ebm")
  pqc = circuit_utils.hardware_efficient_ansatz(num_qubits, num_layers,
                                                name=f"{name}_p")
  circ = models.DirectQuantumCircuit(
      pqc, nn.RandomUniform(-1, 1, seed=initializer_seed + 1))
  if sampled_qnn:
    q_infer = qnn.SampledQuantumInference(circ, qnn_samples,
                                          initial_seed=initializer_seed + 2)
  else:
    q_infer = qnn.AnalyticQuantumInference(circ)
  qhbm_infer = qhbm.QHBM(e_infer, q_infer, name=name)
  return qhbm_infer.modular_hamiltonian, qhbm_infer


def random_mixed_density_matrix(num_qubits: int, seed: int = 0):
  """Random full-rank density matrix via random unitary + dirichlet probs."""
  rng = np.random.RandomState(seed)
  dim = 2**num_qubits
  z = rng.randn(dim, dim) + 1j * rng.randn(dim, dim)
  q, r = np.linalg.qr(z)
  q = q * (np.diagonal(r) / np.abs(np.diagonal(r)))
  probs = rng.dirichlet(np.ones(dim))
  rho = (q * probs) @ q.conj().T
  return jnp.asarray(rho, jnp.complex64)
