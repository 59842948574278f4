"""Import hygiene: importing the library must not initialize a jax backend.

`__graft_entry__.dryrun_multichip` relies on forcing `jax_platforms='cpu'`
AFTER `import qhbmlib_tpu...` but BEFORE any backend initialization (see
__graft_entry__._pick_devices).  A single module-level eager jnp op anywhere
in the package silently defeats that (jax.config.update raises post-init and
the dryrun falls back to one device) — and in environments where the
accelerator plugin is present but broken, the eager dispatch crashes the
process outright (round-1 MULTICHIP failure mode).  This test pins the
invariant in a fresh subprocess.
"""

import subprocess
import sys


_PROBE = """
import jax._src.xla_bridge as xb
import qhbmlib_tpu
import qhbmlib_tpu.models
import qhbmlib_tpu.ops
import qhbmlib_tpu.inference
import qhbmlib_tpu.parallel
import qhbmlib_tpu.data
import qhbmlib_tpu.utils
assert not xb._backends, (
    "importing qhbmlib_tpu initialized a jax backend: %r" % (xb._backends,))
# The dryrun's platform forcing must still work post-import.
import jax
jax.config.update("jax_platforms", "cpu")
print("IMPORT_HYGIENE_OK")
"""


def test_package_import_does_not_init_backend():
  out = subprocess.run([sys.executable, "-c", _PROBE],
                       capture_output=True, text=True, timeout=300)
  assert out.returncode == 0, out.stderr
  assert "IMPORT_HYGIENE_OK" in out.stdout


def test_graft_entry_import_does_not_init_backend():
  probe = """
import jax._src.xla_bridge as xb
import __graft_entry__
assert not xb._backends, (
    "importing __graft_entry__ initialized a jax backend: %r" % (xb._backends,))
print("IMPORT_HYGIENE_OK")
"""
  out = subprocess.run([sys.executable, "-c", probe],
                       capture_output=True, text=True, timeout=300,
                       cwd="/root/repo")
  assert out.returncode == 0, out.stderr
  assert "IMPORT_HYGIENE_OK" in out.stdout
