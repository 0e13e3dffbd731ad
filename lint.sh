#!/usr/bin/env bash
# Lint runner (parity: Dassl.pytorch/linter.sh — isort/yapf/flake8).
# This repo standardizes on isort + flake8; yapf is run only if installed.
set -u
echo "Running isort"
python -m isort fsvlm_tpu tests tools train.py bench.py parse_test_res.py 2>/dev/null \
  || echo "(isort not installed — skipped)"
echo "Running flake8"
python -m flake8 fsvlm_tpu tests tools train.py bench.py parse_test_res.py \
  || true
echo "Done"
