#!/usr/bin/env bash
# Tag the version from pyproject.toml and push the tag (triggers CD).
set -euo pipefail
cd "$(dirname "$0")/.."
VERSION=$(python -c "import tomllib; print(tomllib.load(open('pyproject.toml','rb'))['project']['version'])")
git tag "v${VERSION}"
git push origin "v${VERSION}"
