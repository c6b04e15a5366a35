#!/bin/sh
# One-shot verification: tests, correctness oracles, benchmark.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python scripts/check_oracle.py "${1:-/root/testdata/sf0.01}"
python bench.py
