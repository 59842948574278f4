#!/usr/bin/env bash
# Unit suite on an 8-virtual-device CPU mesh (mirrors CI).
# With no path arguments, runs the whole tests/ tree; CI's sharded fast
# lane passes explicit subdirectories instead.
set -euo pipefail
cd "$(dirname "$0")/.."
has_path=0
for arg in "$@"; do
  case "$arg" in
    tests/*|tests) has_path=1 ;;
  esac
done
if [ "$has_path" = "1" ]; then
  exec python -m pytest -q "$@"
fi
exec python -m pytest tests/ -q "$@"
