"""Multi-chip rendering via shard_map over a device mesh.

The reference is a single-GPU program (SURVEY.md §2: no distributed backend
exists); scaling across TPU chips is a new capability with the natural
decomposition: the acceleration structure, scene and camera are replicated,
the ray/pixel axis is sharded over the mesh, and the framebuffer is
assembled from per-device row bands. Collectives ride ICI: a psum reduces
the box-test counters, and the gather of the framebuffer happens in the
output sharding (XLA inserts the all-gather only if the caller asks for a
replicated image).

The same mesh recipe drives the per-frame pipeline in __graft_entry__'s
multi-chip dry run.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_raytracing.scene.types import DeviceScene
from tpu_raytracing.trace.modes import RenderType
from tpu_raytracing.trace.render import render_frame
from tpu_raytracing.trace.traverse import PackedPairs, TraversalBVH, trace_rays
from tpu_raytracing.trace.ray import Rays, generate_primary_rays


def make_mesh(devices=None, axis: str = "rays") -> Mesh:
    """1-D mesh over all (or the given) devices; the single axis shards the
    ray/pixel dimension."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def render_frame_sharded(
    mesh: Mesh,
    trav: TraversalBVH,
    pairs: PackedPairs,
    scene: DeviceScene,
    camera: dict,
    width: int,
    height: int,
    render_type: RenderType = RenderType.DEPTH,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one frame with pixel rows sharded across the mesh.

    height must divide by the mesh size (pad rows if needed). Returns the
    full [H, W, 4] image and the global box-test total (psum over chips).
    """
    axis = mesh.axis_names[0]
    num_dev = mesh.shape[axis]
    assert height % num_dev == 0, "height must be divisible by the mesh size"
    band = height // num_dev

    # Rays for the full frame, then shard by row band. Per-device ray-gen
    # would also work; generating once keeps NDC math identical to the
    # single-chip path.
    rays = generate_primary_rays(camera, width, height)

    def shard_rays(r):
        return jax.tree.map(lambda a: a.reshape(height, width, *a.shape[1:]), r)

    rays2d = shard_rays(rays)

    from tpu_raytracing.trace.ray import ray_spread
    from tpu_raytracing.trace.render import shade_rays

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def device_render(trav_, pairs_, scene_, rays_band):
        flat = jax.tree.map(lambda a: a.reshape(band * width, *a.shape[2:]), rays_band)
        img, _tests = shade_rays(
            trav_, pairs_, scene_, camera, flat, ray_spread(width), render_type
        )
        tests = jax.lax.psum(_tests, axis)
        return img.reshape(band, width, 4), tests

    img, tests = device_render(trav, pairs, scene, rays2d)
    return img.reshape(height, width, 4), tests


def render_frame_auto_sharded(
    mesh: Mesh,
    trav: TraversalBVH,
    pairs: PackedPairs,
    scene: DeviceScene,
    camera: dict,
    width: int,
    height: int,
    render_type: RenderType = RenderType.DEPTH,
):
    """Full-featured multi-chip render: any render mode, sharded by the GSPMD
    partitioner. The AS/scene are replicated; XLA propagates the ray-axis
    sharding from the jit output sharding constraint."""
    axis = mesh.axis_names[0]
    out_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    trav = jax.device_put(trav, repl)
    pairs = jax.device_put(pairs, repl)
    scene = jax.device_put(scene, repl)

    img, tests = jax.jit(
        render_frame,
        static_argnames=("width", "height", "render_type"),
        out_shardings=(out_sharding, repl),
    )(trav, pairs, scene, camera, width, height, render_type)
    return img, tests
