#!/usr/bin/env bash
# Pre-PR gate: lint (if available) + full hermetic test suite.
set -euo pipefail
cd "$(dirname "$0")/.."

if command -v ruff >/dev/null 2>&1; then
    ruff check lshrs_tpu tests
    ruff format --check lshrs_tpu tests
else
    echo "ruff not installed; skipping lint"
fi

python -m pytest tests/ -q
