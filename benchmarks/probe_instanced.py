"""Stage profile of the flagship instanced path (config 4 shape):
candidate masks / peel / expand+sort / kernel / winner-reduce, timed
separately on the TPU with honest vary-and-fetch protocol."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
import numpy as np
from tpu_raytracing.bvh import bucket
from tpu_raytracing.bvh.lbvh import build_lbvh
from tpu_raytracing.scene import camera as cam, procedural
from tpu_raytracing.trace import split_pallas as sp
from tpu_raytracing.trace import instanced_split as isp
from tpu_raytracing.trace.ray import Rays, generate_primary_rays

def log(*a): print(*a, file=sys.stderr, flush=True)

n_inst, res, K = 1000, 512, 16
scene = procedural.sphere_scene(4)
tris = jnp.asarray(scene.triangles)
split_b, packed_s = jax.jit(lambda t: bucket.emit_split_views(
    bucket.split_front(t, enable_pairs=True), leaf_width=sp.LEAFW)[:2])(tris), None
views_b, packed_s = split_b[0], split_b[1]
rng = np.random.default_rng(3)
base_t = rng.uniform(-40, 40, (n_inst, 3)).astype(np.float32)
scale = rng.uniform(0.5, 1.5, (n_inst, 1, 1)).astype(np.float32)
eye = np.broadcast_to(np.eye(3, dtype=np.float32), (n_inst, 3, 3))
transforms = jnp.asarray(np.concatenate([(eye * scale), base_t[:, :, None]], axis=2))
blas_lo = jnp.min(tris.reshape(-1, 3), axis=0)
blas_hi = jnp.max(tris.reshape(-1, 3), axis=0)
ias = jax.jit(isp.build_instanced_split)(views_b, packed_s, blas_lo, blas_hi, transforms)
wmin, wmax = ias.wmin, ias.wmax
lo = jnp.min(wmin, axis=0); hi = jnp.max(wmax, axis=0)
class S: aabb_min = np.asarray(lo); aabb_max = np.asarray(hi)
camera = cam.camera_to_device(cam.update_camera(cam.initialise_camera(S.aabb_min, S.aabb_max)))
rays = jax.jit(generate_primary_rays, static_argnames=("width","height"))(camera, res, res)
num_r = res * res

def _fetch(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    float(jnp.sum(leaves[0][:64].astype(jnp.float32)))

def timeit(name, f, *args, vary=None, iters=3):
    """Honest protocol (docs/TPU_NOTES.md): vary an input every
    iteration (vary = index of a Rays arg to jitter; executions with
    identical args are memoized) and FETCH a value to time."""
    out = f(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(iters):
        a = list(args)
        if vary is not None:
            a[vary] = a[vary].replace(tmin=a[vary].tmin + (i + 1) * 1e-7)
        else:
            a[0] = a[0] + (1 if a[0].dtype in (jnp.int32, jnp.uint32)
                           else 1e-7)
        out = f(*a)
    _fetch(out)
    log(f"{name}: {(time.perf_counter()-t0)/iters*1000:.0f} ms")
    return out

j_masks = jax.jit(lambda wm, wx, r: isp.candidate_masks(wm, wx, r))
words, nov = timeit("candidate_masks", j_masks, wmin, wmax, rays, vary=2)
log(f"  live items total {int(jnp.sum(jnp.minimum(nov, K)))} of {num_r*K}; mean overlap {float(jnp.mean(nov)):.2f}")
j_peel = jax.jit(lambda w: isp.peel_candidates(w, K))
cand = timeit("peel_candidates", j_peel, words)

def expand_sort(ci, r):
    inst = ci.reshape(-1)
    live = inst >= 0
    ray_id = jnp.repeat(jnp.arange(num_r, dtype=jnp.int32), K)
    mflat = ias.inv_transforms.reshape(-1)
    mbase = jnp.maximum(inst, 0) * 12
    def mcoef(rr, c): return mflat[mbase + (rr * 4 + c)]
    ox, oy, oz = (r.origin[:, i][ray_id] for i in range(3))
    dx, dy, dz = (r.direction[:, i][ray_id] for i in range(3))
    oc, dc = [], []
    for rr in range(3):
        m0, m1, m2, m3 = (mcoef(rr, c) for c in range(4))
        oc.append(m0*ox + m1*oy + m2*oz + m3)
        dc.append(m0*dx + m1*dy + m2*dz)
    o_obj = jnp.stack(oc, axis=1); d_obj = jnp.stack(dc, axis=1)
    octant = ((d_obj[:,0]>0).astype(jnp.int32) | ((d_obj[:,1]>0).astype(jnp.int32)<<1) | ((d_obj[:,2]>0).astype(jnp.int32)<<2))
    key = ((~live).astype(jnp.int32) << 30) | (jnp.maximum(inst,0) << 3) | octant
    perm = jnp.argsort(key, stable=True)
    inv_perm = jnp.argsort(perm)
    srt = jax.tree.map(lambda a: a[perm], Rays(origin=o_obj, direction=d_obj, tmin=r.tmin[ray_id], tmax=r.tmax[ray_id]))
    return srt, live[perm], inv_perm, o_obj, d_obj
j_exp = jax.jit(expand_sort)
srt, act, inv_perm, o_obj, d_obj = timeit("expand+2sorts", j_exp, cand, rays, vary=1)

j_kern = jax.jit(lambda v, p, r, a: sp.trace_rays_split_pallas(v, p, r, active=a, k=256, c_slots=8, raw=True))
def k_wrap(r, a):
    return j_kern(views_b, packed_s, r, a)
(t_it, tri_it), _ = timeit("split kernel (RK items)", k_wrap, srt, act, vary=0)
log("done")

# ---- chunk sweep for candidate_masks (run as main appendix) ----
for ch in (256, 512, 1000):
    j = jax.jit(lambda wm, wx, r, c=ch: isp.candidate_masks(wm, wx, r, chunk=c))
    timeit(f"candidate_masks chunk={ch}", j, wmin, wmax, rays, vary=2)
