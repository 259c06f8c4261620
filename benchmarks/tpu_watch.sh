#!/bin/bash
# Probe the TPU tunnel every 10 min; when it answers, run the round-2
# measurement queue once and exit. Status lines -> /tmp/tpu_watch.log.
cd "$(dirname "$0")/.." || exit 1
while true; do
  if timeout 300 python -c "
import jax
import jax.numpy as jnp
d = jax.devices()[0]
assert d.platform != 'cpu', d
x = jnp.ones((128, 128))
float((x @ x)[0, 0])
print('TPU OK:', d)
" >> /tmp/tpu_watch.log 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP - starting queue" >> /tmp/tpu_watch.log
    bash benchmarks/round2_queue.sh > /tmp/queue.log 2>&1
    echo "$(date -u +%FT%TZ) queue finished" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel down" >> /tmp/tpu_watch.log
  sleep 600
done
