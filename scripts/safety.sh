#!/bin/bash
# CI gate (reference scripts/safety.sh analog: ruff + pytest-cov + bandit).
# ruff/bandit are not installable in the build image; when absent,
# `python -m compileall` stands in for lint and the pytest suite carries
# coverage of the golden properties.
set -euo pipefail
if command -v ruff >/dev/null 2>&1; then
  ruff check gtcrn_micro_tpu tests
  ruff format --check gtcrn_micro_tpu tests
else
  python -m compileall -q gtcrn_micro_tpu
fi
if command -v bandit >/dev/null 2>&1; then
  bandit -q -r gtcrn_micro_tpu
fi
# coverage reporting when pytest-cov exists (reference pyproject.toml:48-49
# runs `pytest --cov=gtcrn_micro`); plain pytest otherwise
if python -c "import pytest_cov" >/dev/null 2>&1; then
  python -m pytest tests/ -q --cov=gtcrn_micro_tpu --cov-report=term-missing:skip-covered
else
  python -m pytest tests/ -q
fi
