"""Two-level TLAS/BLAS with instancing.

The reference declares ChildType_Inst but never constructs it
(src/Common.cuh:40, SURVEY.md §2); this module supplies the real capability,
TPU-first: the TLAS is an LBVH over instance world AABBs whose leaves carry
instance ids (ChildType_Inst), the BLAS node array is appended after the
TLAS with child pointers rebased, and the instanced tracer pushes a BLAS
root entry tagged with the instance whenever a TLAS leaf is hit.

Per-frame TLAS rebuild over 1k+ instances is a single fused jit program
(transform corners -> Morton -> sort -> Karras -> refit).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from tpu_raytracing.bvh.lbvh import build_lbvh_from_aabbs
from tpu_raytracing.bvh.types import BVH, CHILD_INST
from tpu_raytracing.trace.traverse import TraversalBVH, pack_bvh


@flax.struct.dataclass
class InstancedAS:
    """Combined two-level acceleration structure."""

    trav: TraversalBVH  # TLAS slots [0, T) then rebased BLAS slots [T, T+B)
    inv_transforms: jnp.ndarray  # [I+1, 3, 4] object<-world; row 0 = identity
    blas_entry: jnp.ndarray  # [] int32 — packed (rebased blas root << 3 | count)


def instance_world_aabbs(blas_min, blas_max, transforms):
    """World AABB of each instance by transforming the BLAS root box.

    transforms: [I, 3, 4] world<-object affine. Uses the standard
    per-component min/max of R*corner extremes, exact for affine maps.
    """
    r = transforms[:, :, :3]  # [I, 3, 3]
    t = transforms[:, :, 3]  # [I, 3]
    lo = r * blas_min[None, None, :]  # [I, 3, 3] — R[j,k] * bmin_k
    hi = r * blas_max[None, None, :]
    wmin = t + jnp.sum(jnp.minimum(lo, hi), axis=2)
    wmax = t + jnp.sum(jnp.maximum(lo, hi), axis=2)
    return wmin, wmax


def invert_affine(transforms):
    """Invert [I, 3, 4] affine transforms."""
    r = transforms[:, :, :3]
    t = transforms[:, :, 3]
    r_inv = jnp.linalg.inv(r)
    t_inv = -jnp.einsum("ijk,ik->ij", r_inv, t)
    return jnp.concatenate([r_inv, t_inv[:, :, None]], axis=2)


def build_instanced(blas: BVH, transforms: jnp.ndarray) -> InstancedAS:
    """Build the TLAS over instances of one BLAS and pack both levels.

    The BLAS root group is the slot pair (root, root+1) for the bottom-up
    builders or the single root node for SAH — either way the packed entry
    (rebased root << 3 | root_count) is pushed when an instance leaf is hit.
    """
    num_inst = transforms.shape[0]
    root = blas.root.astype(jnp.int32)
    rc = blas.root_count.astype(jnp.int32)
    idx = jnp.arange(blas.num_slots)
    in_root = (idx >= root) & (idx < root + rc)
    blas_root_min = jnp.min(jnp.where(in_root[:, None], blas.node_min, jnp.inf), axis=0)
    blas_root_max = jnp.max(jnp.where(in_root[:, None], blas.node_max, -jnp.inf), axis=0)

    wmin, wmax = instance_world_aabbs(blas_root_min, blas_root_max, transforms)
    tlas = build_lbvh_from_aabbs(
        wmin, wmax, jnp.arange(num_inst, dtype=jnp.int32), leaf_type=CHILD_INST,
        leaf_count=1,
    )

    # Rebase BLAS child pointers (interior nodes only) and append.
    offset = jnp.int32(tlas.num_slots)
    from tpu_raytracing.bvh.types import CHILD_BOX

    blas_rebased = blas.replace(
        child=jnp.where(blas.type == CHILD_BOX, blas.child + offset, blas.child)
    )
    combined = BVH(
        node_min=jnp.concatenate([tlas.node_min, blas_rebased.node_min]),
        node_max=jnp.concatenate([tlas.node_max, blas_rebased.node_max]),
        child=jnp.concatenate([tlas.child, blas_rebased.child]),
        count=jnp.concatenate([tlas.count, blas_rebased.count]),
        type=jnp.concatenate([tlas.type, blas_rebased.type]),
        parent=jnp.concatenate([tlas.parent, blas_rebased.parent + offset]),
        root=tlas.root,
        root_count=tlas.root_count,
    )

    identity = jnp.concatenate(
        [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], axis=1
    )
    inv = jnp.concatenate([identity[None], invert_affine(transforms)], axis=0)
    blas_entry = ((root + offset) << 3) | rc
    return InstancedAS(
        trav=pack_bvh(combined),
        inv_transforms=inv.astype(jnp.float32),
        blas_entry=blas_entry,
    )
