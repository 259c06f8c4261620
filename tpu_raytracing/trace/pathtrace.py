"""Wavefront diffuse path tracer with ray compaction (BASELINE configs 3/5).

The reference's megakernel handles one bounce (primary + shadow); multi-
bounce path tracing is the wavefront generalization promised by the north
star: a Python-level bounce loop over jitted stages. The traversal kernel is
compiled ONCE and reused for the primary, shadow and bounce passes of every
frame (inlining it per pass quadruples compile time and overflows this
backend's remote-compile payload limit); the per-bounce shading/NEE/sampling
math is a second jitted stage.

Lighting model: Lambertian surfaces (material diffuse albedo), cosine-
weighted hemisphere bounces keyed by *pixel id* (so compaction permutations
don't change the image), sky radiance on miss, and next-event estimation
toward the scene point light with a shadow trace per bounce. Compaction
stable-sorts live rays to the front so the traversal batch drains
coherently.
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time as _time
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_raytracing.scene.types import DeviceScene
from tpu_raytracing.trace import shade
from tpu_raytracing.trace.ray import Rays, generate_primary_rays
from tpu_raytracing.trace.render import SHADOW_TMIN, _gather_hit_context, _shadow_rays
from tpu_raytracing.trace.traverse import trace_rays

SKY_HORIZON = (1.0, 1.0, 1.0)
SKY_ZENITH = (0.5, 0.7, 1.0)


def _sky(direction):
    t = 0.5 * (direction[:, 1] + 1.0)
    horizon = jnp.array(SKY_HORIZON, jnp.float32)
    zenith = jnp.array(SKY_ZENITH, jnp.float32)
    return horizon[None, :] * (1.0 - t[:, None]) + zenith[None, :] * t[:, None]


def _cosine_sample(normal, u):
    """Cosine-weighted hemisphere directions; ``u`` is [R, 2] uniforms
    indexed by pixel, so results are invariant under compaction."""
    r = jnp.sqrt(u[:, 0])
    phi = 2.0 * jnp.pi * u[:, 1]
    local = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(1.0 - u[:, 0], 0.0))],
        axis=-1,
    )
    n = normal
    sign = jnp.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = jnp.stack([1.0 + sign * n[:, 0] ** 2 * a, sign * b, -sign * n[:, 0]], axis=-1)
    bt = jnp.stack([b, sign + n[:, 1] ** 2 * a, -n[:, 1]], axis=-1)
    return t * local[:, 0:1] + bt * local[:, 1:2] + n * local[:, 2:3]


@partial(jax.jit, static_argnames=("compaction", "sort_cells", "cell_shift",
                                   "sample_next", "sort_kind", "leaf_shift"))
def _bounce_stage(scene, pairs, rays, rec, srec_hit, throughput, radiance,
                  alive, pixel, u_frame, max_t, pair_loc=None,
                  compaction: bool = True,
                  sort_cells: bool = False, cell_shift: int = 15,
                  sample_next: bool = True, sort_kind: str = "cell",
                  leaf_shift: int = 6):
    """Shading + NEE + next-ray sampling + compaction for one bounce.

    With ``sample_next=False`` (the final bounce) the sampling/compaction
    half is skipped entirely — the returned rays are never traced, so the
    argsort plus the 1M-row permutation gathers would be pure waste.
    """
    miss = alive & ~rec.hit
    radiance = radiance + jnp.where(
        miss[:, None], throughput * _sky(rays.direction), 0.0
    )
    alive = alive & rec.hit

    ctx = _gather_hit_context(scene, pairs, rec)
    albedo = ctx["mat_diffuse"]
    normal = shade.interpolate(ctx["normals3"], rec.bary_u, rec.bary_v)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20)
    normal = jnp.where(
        (jnp.sum(normal * rays.direction, axis=-1) > 0.0)[:, None], -normal, normal
    )
    hit_pos = rays.origin + rays.direction * rec.t[:, None]

    # Next-event estimation using the caller-provided shadow trace.
    srays_dir = _shadow_rays(scene, rays, rec).direction
    ndotl = jnp.maximum(jnp.sum(normal * srays_dir, axis=-1), 0.0)
    radiance = radiance + jnp.where(
        (alive & ~srec_hit)[:, None],
        throughput * albedo * ndotl[:, None] * shade.light_colour()[None, :],
        0.0,
    )

    if not sample_next:
        return radiance, throughput, alive, pixel, rays

    throughput = throughput * albedo
    num = pixel.shape[0]
    from tpu_raytracing.ops.gather import take_rows as _tr

    new_dir = _cosine_sample(normal, _tr(u_frame, pixel))
    new_rays = Rays(
        origin=hit_pos + normal * 1e-4,
        direction=new_dir,
        tmin=jnp.full((num,), SHADOW_TMIN, jnp.float32),
        tmax=jnp.full((num,), max_t, jnp.float32),
    )

    if compaction:
        from tpu_raytracing.ops.morton import morton3d

        # Packet divergence is origin-driven (measured: origin-sorting
        # occlusion rays with scattered origins is 7x; direction-major
        # keys REGRESS by scattering origins). Best-measured key for
        # bounce closest-hit (benchmarks/sweep_sort*.py, 2044 -> 1319 ms
        # at 1M): coarse origin cell MAJOR, direction octant MINOR —
        # packets then share both a subtree and a traversal order. The
        # sort rides the compaction permutation that was being paid
        # anyway, so downstream tracers consume the rays 'presorted'
        # with no per-pass argsort/un-permute of their own.
        if sort_cells:
            d = new_rays.direction
            octant = ((d[:, 0] > 0).astype(jnp.int32)
                      | ((d[:, 1] > 0).astype(jnp.int32) << 1)
                      | ((d[:, 2] > 0).astype(jnp.int32) << 2))
            if sort_kind == "tid_cell":
                # The probe's exact winning key (probe_lane_kernel
                # 'tid'): treelet major, octant, then coarse origin cell
                # MINOR — orders rays spatially WITHIN a (treelet,
                # octant) group too.
                from tpu_raytracing.ops.morton import morton3d as _m3

                tid = pair_loc[jnp.maximum(rec.tri_id >> 1, 0)]
                o = new_rays.origin
                lo_ = jnp.min(o, axis=0)
                hi_ = jnp.max(o, axis=0)
                cellm = _m3((o - lo_) / jnp.maximum(hi_ - lo_, 1e-20)
                            ).astype(jnp.int32)
                key = (((~alive).astype(jnp.int32) << 30)
                       | ((tid & 0xFFF) << 18) | (octant << 15)
                       | ((cellm >> 15) & 0x7FFF))
            elif sort_kind == "tid":
                # Subtree-locality key: the ORIGIN hit pair's treelet id
                # (bvh/treelet.py pair_tid). Measured best bounce sort at
                # 1M — 2518 (cell) / 1518 (128-pair blocks) / 1393 ms
                # (tid) through the split kernel: subtree-ALIGNED groups
                # beat same-granularity arbitrary blocks because a
                # treelet's pairs share their whole deep path.
                loc = pair_loc[jnp.maximum(rec.tri_id >> 1, 0)]
            elif sort_kind == "leaf":
                # Tree-locality key: the winning pair's index in the
                # SORTED pair array is a space-filling-curve position at
                # leaf granularity (finer than cell15 and aligned to the
                # actual tree windows); rays grouped by hit leaf share
                # the deep path of the next traversal.
                loc = jnp.maximum(rec.tri_id >> (1 + leaf_shift), 0)
            else:
                o = new_rays.origin
                lo = jnp.min(o, axis=0)
                hi = jnp.max(o, axis=0)
                norm = (o - lo) / jnp.maximum(hi - lo, 1e-20)
                loc = morton3d(norm).astype(jnp.int32) >> cell_shift
            if sort_kind != "tid_cell":  # tid_cell built its key above
                key = (((~alive).astype(jnp.int32) << 30)
                       | (loc << 3) | octant)
        else:
            key = (~alive).astype(jnp.int32)
        # NOTE: replacing this argsort + permutation gathers with two
        # multi-payload lax.sorts (the fused-build trick) CRASHED the
        # remote compile helper when composed with the shading graph —
        # the build's standalone payload sorts compile (slowly) but this
        # jit kills the toolchain. Keep the gather form here.
        from tpu_raytracing.ops.gather import take_rows

        perm = jnp.argsort(key, stable=True)
        new_rays = jax.tree.map(lambda a: take_rows(a, perm), new_rays)
        throughput = take_rows(throughput, perm)
        radiance = take_rows(radiance, perm)
        alive = alive[perm]
        pixel = pixel[perm]

    return radiance, throughput, alive, pixel, new_rays


_BOUNCE_STAGE_CACHE = {}


def _jit_bounce_stage(compaction: bool, sort_cells: bool, sample_next: bool,
                      sort_kind: str = "cell"):
    """One compiled program for the whole shade+NEE+sample+compact stage.

    Calling _bounce_stage eagerly dispatches its ~40 ops one by one to
    the device (measured 146 ms at 1M rays on the remote backend); under
    one jit the stage is a single fused program.
    """
    key = (compaction, sort_cells, sample_next, sort_kind)
    fn = _BOUNCE_STAGE_CACHE.get(key)
    if fn is None:
        fn = jax.jit(partial(
            _bounce_stage, compaction=compaction, sort_cells=sort_cells,
            sample_next=sample_next, sort_kind=sort_kind))
        _BOUNCE_STAGE_CACHE[key] = fn
    return fn


@jax.jit
def _finalize(radiance, pixel):
    # pixel is a permutation of [0, num) (the bounce compactions only
    # reorder), so the scatter radiance->pixel is the gather by the
    # inverse permutation. argsort is ~free on TPU while a 1M-row random
    # scatter measured ~97 ms vs ~15 ms for the equivalent gather
    # (benchmarks/profile_frame.py, docs/TPU_NOTES.md).
    from tpu_raytracing.ops.gather import take_rows
    inv = jnp.argsort(pixel)
    return take_rows(radiance, inv)


def path_trace(
    trav,
    pairs,
    scene: DeviceScene,
    camera: dict,
    width: int,
    height: int,
    num_bounces: int = 4,
    key=None,
    compaction: bool = True,
    tracer=trace_rays,
    shadow_tracer=None,
    shadow_tracer_bounce=None,
    bounce_tracer=None,
    bounce_trav=None,
    pair_loc=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ([H, W, 3] float32 radiance, total rays traced).

    ``pair_loc``: optional [P] int32 subtree-locality id per pair (e.g.
    TreeletBVH.pair_tid); enables the measured-best 'tid' bounce sort.

    Python-level bounce loop over two jitted stages (trace, shade); the
    tracer is jit-cached by identity so every pass reuses one compiled
    traversal program.

    ``bounce_trav``: optional traversal structure consumed by the
    bounce-pass tracers instead of ``trav`` — e.g. the uniform grid
    (bvh/grid.py) for the incoherent passes while primaries keep the
    split-BVH kernel. The pair table must be shared.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    traced = _jitted_tracer(tracer)
    # Occlusion-only tracer for the NEE shadow pass (e.g. the split
    # kernel's any-hit mode); defaults to the closest-hit tracer.
    # shadow_tracer_bounce handles bounce >= 1 shadows, whose origins (hit
    # points of scattered rays) need an origin sort (7x measured at 1M).
    shadow_traced = traced if shadow_tracer is None else _jitted_tracer(shadow_tracer)
    shadow_traced_b = (shadow_traced if shadow_tracer_bounce is None
                       else _jitted_tracer(shadow_tracer_bounce))
    # Optional closest-hit tracer for bounce >= 1 (e.g. smaller packets:
    # incoherent rays prefer 128-ray packets, coherent primaries 256).
    traced_b = traced if bounce_tracer is None else _jitted_tracer(bounce_tracer)

    rays = jax.jit(generate_primary_rays, static_argnames=("width", "height"))(
        camera, width, height
    )
    num = width * height
    pixel = jnp.arange(num, dtype=jnp.int32)
    throughput = jnp.ones((num, 3), jnp.float32)
    radiance = jnp.zeros((num, 3), jnp.float32)
    alive = jnp.ones((num,), bool)
    rays_traced = 0
    max_t = camera["max_depth"]

    # TPURT_PT_PROFILE=1: per-pass wall times to stderr (each pass gets
    # a completion fetch, so pipelining across passes is deliberately
    # broken — diagnosis mode, not the production timing path).
    _prof = _os.environ.get("TPURT_PT_PROFILE") == "1"

    def _tick(label, x, t0):
        if not _prof:
            return 0.0
        leaf = jax.tree.leaves(x)[0]
        float(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32)))
        ms = (_time.perf_counter() - t0) * 1000.0
        print(f"  pt pass {label}: {ms:.0f} ms", file=_sys.stderr,
              flush=True)
        return _time.perf_counter()

    # Bounce-shadow sort: occlusion rays originate at the NEW hit
    # points, so the ray array's compaction order (keyed by the
    # PREVIOUS bounce's hits) is stale for them. Round-4 ablation on
    # the real 1M scattered shadow set (benchmarks/probe_lane_kernel.py
    # pass H): hit-PAIR-index key 43 ms vs origin-Morton re-sort 293 ms
    # vs unsorted 363 ms — the hit pair is a finer space-filling-curve
    # position than any world-space cell. Default on; the shadow tracer
    # for bounce >= 1 should be a 'presorted' any-hit config.
    shadow_sort = _os.environ.get("TPURT_SHADOW_SORT", "pair")
    trav_b = trav if bounce_trav is None else bounce_trav
    for bounce in range(num_bounces + 1):
        key, k_dir = jax.random.split(key)
        t0 = _time.perf_counter()
        ct = traced if bounce == 0 else traced_b
        rec, _stats = ct(trav if bounce == 0 else trav_b, pairs, rays, alive)
        t0 = _tick(f"closest b{bounce}", rec.t, t0)
        st = shadow_traced if bounce == 0 else shadow_traced_b
        if bounce >= 1 and shadow_sort == "pair":
            srt, act_s, inv_s = _jit_shadow_pair(scene, rays, rec, alive)
            srec, _ = st(trav_b, pairs, srt, act_s)
            srec_hit = _jit_unperm(srec.hit, inv_s)
            n_shadow = jnp.sum(act_s.astype(jnp.int32))
        else:
            srec, _ = st(trav if bounce == 0 else trav_b, pairs,
                         _jit_shadow(scene, rays, rec), alive)
            srec_hit = srec.hit
            n_shadow = jnp.sum(alive.astype(jnp.int32))
        t0 = _tick(f"shadow  b{bounce}", srec_hit, t0)
        # honest accounting: the pair-sorted shadow pass masks rays
        # whose closest trace MISSED (they contribute no NEE term), so
        # only genuinely-traced shadow rays count toward the metric
        rays_traced = (rays_traced + jnp.sum(alive.astype(jnp.int32))
                       + n_shadow)

        u_frame = jax.random.uniform(k_dir, (num, 2))
        # Bounce-compaction sort (measured, docs/TPU_NOTES.md "Lane
        # kernel on hardware"): origin-subtree keys beat world-space
        # cells — 'tid' (exact treelet alignment, needs pair_loc) then
        # 'leaf' (pair-index blocks), both well ahead of 'cell'.
        sort_kind = _os.environ.get("TPURT_BOUNCE_SORT") or (
            "tid" if pair_loc is not None else "leaf")
        if sort_kind in ("tid", "tid_cell") and pair_loc is None:
            # env-forced 'tid' without a pair_loc table (e.g. the app's
            # non-lane paths) would index None — same-family fallback
            sort_kind = "leaf"
        radiance, throughput, alive, pixel, rays = _jit_bounce_stage(
            compaction, True, bounce < num_bounces, sort_kind)(
            scene, pairs, rays, rec, srec_hit, throughput, radiance, alive,
            pixel, u_frame, max_t, pair_loc,
        )
        _tick(f"shade   b{bounce}", radiance, t0)

    img = _finalize(radiance, pixel)
    return img.reshape(height, width, 3), rays_traced


_TRACER_CACHE = {}


def _jitted_tracer(tracer):
    if getattr(tracer, "host_staged", False):
        # Host-staged tracers (phased compaction) run their own jitted
        # stages; wrapping them in one jit would inline every stage.
        return lambda trav, pairs, rays, act: tracer(trav, pairs, rays, active=act)
    fn = _TRACER_CACHE.get(id(tracer))
    if fn is None:
        fn = jax.jit(lambda trav, pairs, rays, act: tracer(trav, pairs, rays, active=act))
        _TRACER_CACHE[id(tracer)] = fn
    return fn


_jit_shadow = jax.jit(_shadow_rays)


@jax.jit
def _jit_shadow_pair(scene, rays, rec, alive):
    """Bounce-shadow rays permuted by their origin HIT's pair index
    (see the ablation comment in path_trace); rays that missed are
    masked dead AND sunk to the back — they contribute no NEE term, so
    tracing them was pure waste. Returns (sorted rays, sorted active,
    inverse permutation for the .hit un-permute).

    Only the 3-channel hit POSITION is permuted; direction/tmin/tmax
    are recomputed from it after the gather (same math as
    render._shadow_rays) — half the permute bytes of sorting the built
    rays."""
    from tpu_raytracing.ops.gather import take_rows
    from tpu_raytracing.trace.render import SHADOW_TMIN as _ST

    act = alive & rec.hit
    key = (((~act).astype(jnp.int32) << 30)
           | (jnp.maximum(rec.tri_id, 0) >> 1))
    perm = jnp.argsort(key, stable=True)
    inv = jnp.argsort(perm)
    hit_pos = rays.origin + rays.direction * rec.t[:, None]
    hp = take_rows(hit_pos, perm)
    to_light = scene.light - hp
    dist = jnp.linalg.norm(to_light, axis=-1)
    srt = Rays(origin=hp,
               direction=to_light / jnp.maximum(dist, 1e-30)[:, None],
               tmin=jnp.full_like(dist, _ST),
               tmax=dist)
    return srt, act[perm], inv


@jax.jit
def _jit_unperm(hit, inv):
    return hit[inv]
