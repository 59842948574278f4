#!/usr/bin/env bash
# Static checks: syntax + import sanity for every module, then the
# stdlib format/lint pass (scripts/style_check.py -- reference-CI parity
# with yapf/pylint, see its docstring).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m compileall -q qhbmlib_tpu baselines tests bench.py __graft_entry__.py
python - <<'EOF'
import importlib, pkgutil
import qhbmlib_tpu
bad = []
for mod in pkgutil.walk_packages(qhbmlib_tpu.__path__, "qhbmlib_tpu."):
    try:
        importlib.import_module(mod.name)
    except Exception as e:  # noqa: BLE001
        bad.append((mod.name, repr(e)))
if bad:
    for name, err in bad:
        print(f"IMPORT FAIL {name}: {err}")
    raise SystemExit(1)
print("all modules import cleanly")
EOF
python scripts/style_check.py
