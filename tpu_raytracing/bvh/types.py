"""Core BVH data types as SoA pytrees.

TPU-native re-design of the reference's pointer/bitfield node structures
(reference: src/Common.cuh:152-197). A `Node` in the reference is a 32-byte
struct with bitfield-packed child/type and parent/count words; here the BVH is
a struct-of-arrays pytree so every field is a dense, statically shaped jnp
array that XLA can tile and vectorize. Semantics are preserved exactly:

* 2-wide nodes addressed as *groups*: a stack entry is (index, count) and the
  children of an interior node are the contiguous slots
  ``nodes[child .. child+count)`` (reference: src/Tracer.cuh:4-10).
* ``type`` is the reference's ChildType enum (src/Common.cuh:36-42).
* A leaf's ``child`` indexes a TrianglePair; ``count > 0`` means the pair's
  second triangle is valid (reference: src/Tracer.cu:336-338).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

# ChildType enum values (reference: src/Common.cuh:36-42). Inst/Proc are used
# by the two-level TLAS extension (the reference declares but never builds
# them).
CHILD_NONE = 0
CHILD_BOX = 1
CHILD_TRI = 2
CHILD_INST = 3
CHILD_PROC = 4

# Traversal stack depth (reference: src/Tracer.cu:313).
STACK_DEPTH = 64


@flax.struct.dataclass
class TrianglePairs:
    """SoA of quad-compressed triangle pairs (reference: src/Common.cuh:161-197).

    A pair packs two triangles sharing an edge into 4 vertices: triangle A is
    (v0, v1, v2), triangle B is (v2, v1, v3). Unpaired entries store v3 == v2
    so the second triangle is degenerate and rejected by the intersector's
    epsilon test. ``rotations`` record how each original triangle was rotated
    to share the edge, undone at shading time (src/Tracer.cu:57-82).
    """

    v0: jnp.ndarray  # [P, 3] float32
    v1: jnp.ndarray  # [P, 3] float32
    v2: jnp.ndarray  # [P, 3] float32
    v3: jnp.ndarray  # [P, 3] float32
    prim_id_0: jnp.ndarray  # [P] int32 — source primitive of triangle A
    prim_id_1: jnp.ndarray  # [P] int32 — source primitive of triangle B
    rot_0: jnp.ndarray  # [P] int32 in {0,1,2}
    rot_1: jnp.ndarray  # [P] int32 in {0,1,2}

    @property
    def num_pairs(self) -> int:
        return self.v0.shape[0]


@flax.struct.dataclass
class BVH:
    """SoA BVH. Node slot `i` mirrors the reference `Node` (src/Common.cuh:152-159).

    ``root``/``root_count`` name the root *group* the traversal starts from
    (reference: src/main.cu:222-223 — SAH root is slot 0 with count 1, LBVH
    root is the sibling pair at slots 0..1 with count 2, hybrid's rebuilt top
    root pair starts at 2N+1).
    """

    node_min: jnp.ndarray  # [N, 3] float32
    node_max: jnp.ndarray  # [N, 3] float32
    child: jnp.ndarray  # [N] int32 — child group start (Box) or pair index (Tri)
    count: jnp.ndarray  # [N] int32 — child group size (Box); pair-valid flag (Tri)
    type: jnp.ndarray  # [N] int32 — ChildType
    parent: jnp.ndarray  # [N] int32 — parent slot (root slots: self)
    root: jnp.ndarray  # [] int32 — root group start slot
    root_count: jnp.ndarray  # [] int32 — root group size

    @property
    def num_slots(self) -> int:
        return self.child.shape[0]


def empty_bvh(num_slots: int) -> BVH:
    """Zero-initialised BVH arena with all slots ChildType_None."""
    f = jnp.zeros((num_slots, 3), jnp.float32)
    i = jnp.zeros((num_slots,), jnp.int32)
    return BVH(
        node_min=f + float(jnp.finfo(jnp.float32).max),
        node_max=f - float(jnp.finfo(jnp.float32).max),
        child=i,
        count=i,
        type=i,
        parent=i,
        root=jnp.int32(0),
        root_count=jnp.int32(1),
    )
