"""Two-level TLAS/BLAS instancing tests vs a flattened brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracing.bvh import lbvh, tlas
from tpu_raytracing.scene.procedural import icosphere
from tpu_raytracing.trace.brute import brute_force_trace
from tpu_raytracing.trace.instanced import trace_rays_instanced
from tpu_raytracing.trace.ray import Rays
from tpu_raytracing.trace.traverse import pack_pairs

_build = jax.jit(lbvh.build_lbvh)
_trace_inst = jax.jit(trace_rays_instanced)
_brute = jax.jit(brute_force_trace)


def _transforms(num, rng):
    """Random rigid+scale transforms [I, 3, 4]."""
    out = np.zeros((num, 3, 4), np.float32)
    for i in range(num):
        angle = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        scale = rng.uniform(0.5, 1.5)
        out[i, :, :3] = rot * scale
        out[i, :, 3] = rng.uniform(-5, 5, 3)
    return out


def _flatten(tris, transforms):
    """World-space copies of every instance's triangles (oracle geometry)."""
    r = transforms[:, None, None, :, :3]
    t = transforms[:, None, None, :, 3]
    world = np.einsum("iabjk,abk->iabj", np.broadcast_to(
        r, (transforms.shape[0], tris.shape[0], 3, 3, 3)), tris) + t
    return world.reshape(-1, 3, 3)


def _rays_grid(centre, extent, res=32):
    xs = np.linspace(-extent, extent, res, dtype=np.float32)
    ox, oy = np.meshgrid(xs, xs)
    origin = np.stack(
        [ox.ravel() + centre[0], oy.ravel() + centre[1],
         np.full(res * res, centre[2] - 3 * extent, np.float32)], axis=-1
    )
    direction = np.tile(np.array([[0, 0, 1]], np.float32), (res * res, 1))
    return Rays(
        origin=jnp.asarray(origin),
        direction=jnp.asarray(direction),
        tmin=jnp.full((res * res,), 1e-5),
        tmax=jnp.full((res * res,), 100.0),
    )


def test_instance_world_aabbs():
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    tf = jnp.asarray(
        np.array([[[2, 0, 0, 5], [0, 1, 0, 0], [0, 0, 1, -2]]], np.float32)
    )
    wmin, wmax = tlas.instance_world_aabbs(bmin, bmax, tf)
    np.testing.assert_allclose(np.asarray(wmin[0]), [3, -1, -3])
    np.testing.assert_allclose(np.asarray(wmax[0]), [7, 1, -1])


def test_invert_affine_roundtrip():
    rng = np.random.default_rng(0)
    tf = jnp.asarray(_transforms(5, rng))
    inv = tlas.invert_affine(tf)
    p = jnp.asarray(rng.random((5, 3), np.float32))
    world = jnp.einsum("ijk,ik->ij", tf[:, :, :3], p) + tf[:, :, 3]
    back = jnp.einsum("ijk,ik->ij", inv[:, :, :3], world) + inv[:, :, 3]
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)


def test_instanced_trace_matches_flattened_brute():
    rng = np.random.default_rng(7)
    mesh = icosphere(subdivisions=1, radius=0.8)  # 80 tris
    transforms = _transforms(12, rng)

    blas, pairs = _build(jnp.asarray(mesh))
    inst_as = jax.jit(tlas.build_instanced)(blas, jnp.asarray(transforms))

    rays = _rays_grid(np.zeros(3), 6.0)
    rec, inst_id, stats = _trace_inst(inst_as, pack_pairs(pairs), rays)

    flat = _flatten(mesh, transforms)
    ref = _brute(jnp.asarray(flat), rays)

    hit = np.asarray(rec.hit)
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], np.asarray(ref.t)[hit], rtol=2e-4, atol=1e-5
    )
    # Hit instances must be consistent: flattened oracle's winning triangle
    # maps to instance = tri // mesh_size.
    ref_inst = np.asarray(ref.prim_id) // mesh.shape[0]
    got_inst = np.asarray(inst_id)
    same_t = np.isclose(np.asarray(rec.t), np.asarray(ref.t), rtol=1e-4)
    check = hit & same_t
    np.testing.assert_array_equal(got_inst[check], ref_inst[check])


def test_instanced_grid_matches_flattened_brute():
    """Stackless two-phase instanced tracing (trace/grid_instanced.py)
    vs the flattened world-space oracle — same checks as the stack
    tracer's test above, plus any-hit occlusion equality."""
    from tpu_raytracing.trace.grid_instanced import (
        build_instanced_grid,
        check_instanced_grid_capacity,
        trace_rays_instanced_grid,
    )

    rng = np.random.default_rng(7)
    mesh = icosphere(subdivisions=1, radius=0.8)
    transforms = _transforms(12, rng)

    _, pairs = _build(jnp.asarray(mesh))
    packed = pack_pairs(pairs)
    ias = jax.jit(build_instanced_grid)(packed, jnp.asarray(transforms))
    rays = _rays_grid(np.zeros(3), 6.0)
    rec, inst_id, stats, ov = jax.jit(
        lambda i, p, r: trace_rays_instanced_grid(i, p, r, m_cand=16))(
        ias, packed, rays)
    check_instanced_grid_capacity(ov)

    flat = _flatten(mesh, transforms)
    ref = _brute(jnp.asarray(flat), rays)

    hit = np.asarray(rec.hit)
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], np.asarray(ref.t)[hit],
        rtol=2e-4, atol=1e-5)
    ref_inst = np.asarray(ref.prim_id) // mesh.shape[0]
    same_t = np.isclose(np.asarray(rec.t), np.asarray(ref.t), rtol=1e-4)
    check = hit & same_t
    np.testing.assert_array_equal(np.asarray(inst_id)[check],
                                  ref_inst[check])
    assert int(np.asarray(stats.tri_tests).sum()) > 0

    arec, _, _, ov2 = jax.jit(
        lambda i, p, r: trace_rays_instanced_grid(
            i, p, r, m_cand=16, any_hit=True))(ias, packed, rays)
    check_instanced_grid_capacity(ov2)
    np.testing.assert_array_equal(np.asarray(arec.hit),
                                  np.asarray(ref.hit))


def test_instanced_grid_overflow_guard():
    """A work list larger than work_factor * rays (stacked coincident
    instances, every ray overlapping all of them) must overflow loudly,
    not drop hits silently."""
    from tpu_raytracing.trace.grid_instanced import (
        build_instanced_grid,
        check_instanced_grid_capacity,
        trace_rays_instanced_grid,
    )

    mesh = icosphere(subdivisions=0, radius=0.8)
    tf = np.zeros((3, 3, 4), np.float32)
    for i in range(3):
        tf[i, :, :3] = np.eye(3, dtype=np.float32)
        tf[i, 2, 3] = i * 0.1  # three nearly coincident instances
    _, pairs = _build(jnp.asarray(mesh))
    packed = pack_pairs(pairs)
    ias = jax.jit(build_instanced_grid)(packed, jnp.asarray(tf))
    # 1024 rays x 3 overlapped instances > work_factor=1 * 1024 items
    rays = _rays_grid(np.zeros(3), 0.5, res=32)
    _, _, _, ov = jax.jit(
        lambda i, p, r: trace_rays_instanced_grid(i, p, r,
                                                  work_factor=1))(
        ias, packed, rays)
    with np.testing.assert_raises(RuntimeError):
        check_instanced_grid_capacity(ov)


def test_tlas_rebuild_is_jittable_per_frame():
    rng = np.random.default_rng(1)
    mesh = icosphere(subdivisions=1)
    blas, pairs = _build(jnp.asarray(mesh))
    build_fn = jax.jit(tlas.build_instanced)
    for frame in range(2):
        tf = jnp.asarray(_transforms(8, rng))
        inst_as = build_fn(blas, tf)
        assert inst_as.trav.rows.shape[0] == 2 * (8 - 1) + blas.num_slots


def test_single_instance_tlas():
    """A one-instance TLAS must still hit (Karras needs >= 2 leaves; the
    degenerate case emits the root pair directly)."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_raytracing.bvh.lbvh import build_lbvh_from_aabbs

    lo = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
    hi = lo + 1.0
    bvh = build_lbvh_from_aabbs(lo, hi, jnp.asarray([7], jnp.int32),
                                leaf_type=5)
    assert int(bvh.type[0]) == 5
    assert int(bvh.child[0]) == 7
    np.testing.assert_array_equal(np.asarray(bvh.node_min[0]),
                                  np.asarray(lo[0]))


def test_instanced_split_matches_flattened_brute():
    """Flagship shared-BLAS instanced tracer (trace/instanced_split.py:
    bitmask candidates + one object-space split-Pallas pass) vs the
    flattened world-space oracle."""
    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.trace import split_pallas as sp
    from tpu_raytracing.trace.instanced_split import (
        build_instanced_split,
        check_candidate_capacity,
        trace_rays_instanced_split,
    )

    rng = np.random.default_rng(7)
    mesh = icosphere(subdivisions=1, radius=0.8)
    transforms = _transforms(12, rng)

    split, packed = jax.jit(
        lambda t: bucket.emit_split(
            bucket.split_front(t, enable_pairs=True),
            leaf_width=sp.LEAFW))(jnp.asarray(mesh))
    views = jax.jit(sp.prep_split_views)(split, packed)
    blas_lo = jnp.min(jnp.asarray(mesh).reshape(-1, 3), axis=0)
    blas_hi = jnp.max(jnp.asarray(mesh).reshape(-1, 3), axis=0)
    ias = jax.jit(build_instanced_split)(
        views, packed, blas_lo, blas_hi, jnp.asarray(transforms))

    rays = _rays_grid(np.zeros(3), 6.0)
    rec, inst_id, stats, nov = jax.jit(
        lambda i, r: trace_rays_instanced_split(i, r, k_slots=8))(ias, rays)
    check_candidate_capacity(nov, 8)

    flat = _flatten(mesh, transforms)
    ref = _brute(jnp.asarray(flat), rays)

    hit = np.asarray(rec.hit)
    np.testing.assert_array_equal(hit, np.asarray(ref.hit))
    np.testing.assert_allclose(
        np.asarray(rec.t)[hit], np.asarray(ref.t)[hit],
        rtol=2e-4, atol=1e-5)
    ref_inst = np.asarray(ref.prim_id) // mesh.shape[0]
    same_t = np.isclose(np.asarray(rec.t), np.asarray(ref.t), rtol=1e-4)
    check = hit & same_t
    np.testing.assert_array_equal(
        np.asarray(inst_id)[check], ref_inst[check])


def test_instanced_split_item_budget_matches_full():
    """Live-item compaction (item_budget) must be hit-for-hit identical
    to the full [R*K] expansion, and the guard must raise when the
    budget is too small for the live-item total."""
    import pytest as _pytest

    from tpu_raytracing.bvh import bucket
    from tpu_raytracing.trace import split_pallas as sp
    from tpu_raytracing.trace.instanced_split import (
        InstancedCandidateOverflow,
        build_instanced_split,
        check_candidate_capacity,
        trace_rays_instanced_split,
    )

    rng = np.random.default_rng(11)
    mesh = icosphere(subdivisions=1, radius=0.8)
    transforms = _transforms(12, rng)
    split, packed = jax.jit(
        lambda t: bucket.emit_split(
            bucket.split_front(t, enable_pairs=True),
            leaf_width=sp.LEAFW))(jnp.asarray(mesh))
    views = jax.jit(sp.prep_split_views)(split, packed)
    m = jnp.asarray(mesh).reshape(-1, 3)
    ias = jax.jit(build_instanced_split)(
        views, packed, jnp.min(m, axis=0), jnp.max(m, axis=0),
        jnp.asarray(transforms))
    rays = _rays_grid(np.zeros(3), 6.0)

    rec_f, inst_f, _, g_f = jax.jit(
        lambda i, r: trace_rays_instanced_split(i, r, k_slots=8))(ias, rays)
    total_live = int(np.asarray(g_f)[1])
    budget = -(-max(total_live, 1) // 128) * 128 + 128
    rec_b, inst_b, _, g_b = jax.jit(
        lambda i, r: trace_rays_instanced_split(
            i, r, k_slots=8, item_budget=budget))(ias, rays)
    check_candidate_capacity(g_b, 8, budget)
    np.testing.assert_array_equal(np.asarray(rec_f.hit),
                                  np.asarray(rec_b.hit))
    hit = np.asarray(rec_f.hit)
    np.testing.assert_allclose(np.asarray(rec_f.t)[hit],
                               np.asarray(rec_b.t)[hit], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(inst_f), np.asarray(inst_b))

    with _pytest.raises(InstancedCandidateOverflow):
        check_candidate_capacity(
            np.array([4, total_live]), 8, item_budget=max(total_live - 8, 1))
