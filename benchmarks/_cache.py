"""Persistent-XLA-compile-cache opt-in shared by the benchmark drivers.

Accelerator compiles through the axon tunnel cost 30s-8min; the
persistent cache makes re-runs (A/B repeats, ladder re-measurements)
load the executable instead.  Gated on an accelerator plugin actually
being CONFIGURED -- not just on env vars -- because on a CPU-only host
the cache would store XLA:CPU AOT entries, which are machine-feature-
pinned and can SIGILL when the cache dir is reused from a host with
different CPU features.
"""

from __future__ import annotations

import os

import jax


def _accel_plugin_installed() -> bool:
  """True if a PJRT accelerator plugin is installed (checked WITHOUT
  initializing any backend -- `jax.devices()` would hang on a downed
  tunnel)."""
  try:
    import importlib.metadata as md
    if list(md.entry_points(group="jax_plugins")):
      return True
    import jax_plugins  # namespace package populated by installed plugins
    return bool(list(getattr(jax_plugins, "__path__", [])))
  except Exception:
    return False


def enable_if_accelerator() -> bool:
  """Points jax at the repo-local .jax_compile_cache/ when an accelerator
  backend is configured.  Returns whether the cache was enabled."""
  if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # The env var alone is IGNORED when an accelerator plugin is present
    # (see .claude/skills/verify/SKILL.md) -- force the CPU platform so a
    # downed tunnel can't hang backend init.
    jax.config.update("jax_platforms", "cpu")
    return False
  if not (any(p in (jax.config.jax_platforms or "") for p in ("axon", "tpu"))
          or _accel_plugin_installed()):
    return False
  try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return True
  except Exception:
    return False
