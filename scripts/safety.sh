#!/bin/bash
# CI gate (reference scripts/safety.sh analog): compile-check + test suite.
# ruff/bandit are not in this environment; python -m compileall stands in
# for lint and the pytest suite carries coverage of the golden properties.
set -euo pipefail
python -m compileall -q gtcrn_micro_tpu
python -m pytest tests/ -q
