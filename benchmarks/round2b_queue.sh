#!/bin/bash
# Round-2b TPU measurement queue (restart after the session reset lost
# /tmp/m_*.log). Headline bench first — it is the judged number.
cd "$(dirname "$0")/.." || exit 1
if ! timeout 300 python -c "import jax; print(jax.devices())"; then
  echo "TPU tunnel down - aborting queue"; exit 1
fi
set -x
timeout 3600 python -u bench.py > /tmp/m_bench.log 2>&1
timeout 1800 python -u benchmarks/profile_build.py > /tmp/m_build.log 2>&1
timeout 2800 python -u benchmarks/probe_grid.py > /tmp/m_grid.log 2>&1
timeout 2800 python -u benchmarks/probe_tree.py > /tmp/m_tree.log 2>&1
echo DONE
