#!/usr/bin/env bash
# Build and publish to PyPI (requires credentials / trusted publishing).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -rf dist/
python -m build
python -m twine upload dist/*
