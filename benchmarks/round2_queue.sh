#!/bin/bash
# Round-2 TPU measurement queue (one process at a time on the chip).
# Run from the repo root when the tunnel is up:
#   nohup bash benchmarks/round2_queue.sh > /tmp/queue.log 2>&1 &
# Logs land in /tmp/m_*.log; inspect as each completes.
cd "$(dirname "$0")/.." || exit 1
# pre-flight: abort early if the TPU tunnel is down (init hangs forever)
if ! timeout 300 python -c "import jax; print(jax.devices())"; then
  echo "TPU tunnel down - aborting queue"; exit 1
fi
set -x
# 1. grid vs split kernel on the bounce workload + grid build cost
timeout 2800 python -u benchmarks/probe_grid.py > /tmp/m_grid.log 2>&1
# 1b. finer cells (structural winner on iterations; build cost is the
#     open question) and a bigger test block at the default scale
TPURT_GRID_SCALE=0.75 timeout 2800 python -u benchmarks/probe_grid.py \
  > /tmp/m_grid_s075.log 2>&1
TPURT_GRID_BLOCK=8 timeout 2800 python -u benchmarks/probe_grid.py \
  > /tmp/m_grid_b8.log 2>&1
# 2. SAH vs bucket tree quality through the flagship kernel (host-stepped SAH)
timeout 2800 python -u benchmarks/probe_tree.py > /tmp/m_tree.log 2>&1
# 3. split-build stage profile after the two-tier table + ladder cap
timeout 1800 python -u benchmarks/profile_build.py > /tmp/m_build.log 2>&1
# 4. headline bench: auto-calibrated (default), forced split, leaf-sort
timeout 3000 python -u bench.py > /tmp/m_bench.log 2>&1
TPURT_BOUNCE_TRACER=split timeout 2400 python -u bench.py > /tmp/m_bench_split.log 2>&1
TPURT_BOUNCE_SORT=leaf TPURT_BOUNCE_TRACER=split timeout 2400 python -u bench.py > /tmp/m_bench_leafsort.log 2>&1
echo DONE
