"""Pay the 1M-scale SAH level-step compile once and write the bench's
warm marker.

The binned-SAH trace tree halves traversal pops (probe_tree.py), but
its host-stepped frontier's level step embeds a multi-payload stable
sort whose 1M compile runs >90 minutes cold — far past any bench
window. This warmer runs the exact build the bench's frame-0 attempt
runs (same shapes => same compile cache entries), then writes
``sah_ok_<n>`` next to the compile cache so bench.py's 'auto' tree
choice knows the attempt is safe on this machine.

TPURT_BENCH_TRIS scales (default 1M, the headline config).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TPURT_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp


def main():
    num_tris = int(os.environ.get("TPURT_BENCH_TRIS", 1_000_000))
    from tpu_raytracing.bvh.split_convert import build_sah_split
    from tpu_raytracing.scene import procedural
    from tpu_raytracing.trace import split_pallas as sp

    scene = procedural.terrain(num_tris)
    tris = jnp.asarray(scene.triangles)
    print(f"warm_sah: {num_tris} tris on {jax.devices()[0]}",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    split, packed = build_sah_split(
        tris, enable_pairs=True, leaf_width=sp.LEAFW, host_stepped=True)
    ni = int(split.num_inner)
    dt = time.perf_counter() - t0
    print(f"warm_sah: built {ni} inner rows in {dt:.0f} s",
          file=sys.stderr, flush=True)
    marker = os.path.join(cache_dir, f"sah_ok_{num_tris}")
    open(marker, "w").close()
    print(f"warm_sah: marker {marker}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
