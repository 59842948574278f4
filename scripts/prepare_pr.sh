#!/usr/bin/env bash
# Pre-PR gate: style + lint + full test suite, mirroring the reference's
# scripts/prepare_pr.sh (yapf in-place, check_lint.sh, pytest --cov).
#
# Differences forced by this environment (no installs allowed):
#   * formatting/lint is the stdlib checker (scripts/style_check.py) rather
#     than yapf/pylint -- check-only, so style failures list findings
#     instead of being auto-fixed;
#   * `pytest --cov` runs only when pytest-cov is importable (it is not
#     baked into this image); otherwise the plain suite runs and a note is
#     printed.  Line/branch-coverage numbers are a reporting nicety, not a
#     gate, in the reference too.
set -euo pipefail
cd "$(dirname "$0")/.."

./scripts/lint.sh

if python -c "import pytest_cov" 2>/dev/null; then
  python -m pytest tests/ -q --cov=qhbmlib_tpu --cov=baselines \
    --cov-report=term-missing "$@"
else
  echo "[prepare_pr] pytest-cov not installed; running suite without coverage"
  ./scripts/test.sh "$@"
fi
