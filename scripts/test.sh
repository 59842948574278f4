#!/usr/bin/env bash
# Full unit suite on an 8-virtual-device CPU mesh (mirrors CI).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q "$@"
