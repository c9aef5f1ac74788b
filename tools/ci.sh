#!/usr/bin/env bash
# Full local verification: unit/integration tests, the DuckDB
# differential gate at driver scale, the physical-plan audit, and the
# benchmark. Mirrors everything the driver checks. Takes ~55 minutes at the round-14 suite size.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle gate (sf0.01) =="
python tools/verify_local.py /root/testdata/sf0.01

echo "== plan audit =="
python tools/plan_audit.py /root/testdata/sf0.01

echo "== bench (sf0.1) =="
python bench.py
