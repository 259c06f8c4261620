#!/bin/bash
# Structural sweep of the grid's cell scale x test block at 1M tris on
# the CPU backend (iterations and tri tests are backend-independent; the
# TPU pass time is iters x per-iter cost(block), so this sweep brackets
# the production defaults before burning chip time).
cd "$(dirname "$0")/.." || exit 1
for s in 0.75 1.0 1.25 1.5; do
  for b in 4 8; do
    echo "=== scale=$s block=$b ==="
    TPURT_GRID_SCALE=$s TPURT_GRID_BLOCK=$b \
      timeout 1800 python -u benchmarks/probe_grid_cpu.py 2>&1 | tail -4
  done
done
