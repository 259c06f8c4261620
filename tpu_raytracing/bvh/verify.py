"""Host-side structural BVH validation (reference: src/Utilities.cpp).

Pure-NumPy oracles run after builds in tests and on frame 0 of the app, just
as the reference counts nodes and checks AABB inclusion on the first frame
(src/main.cu:248-259).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpu_raytracing.bvh.types import CHILD_BOX, CHILD_TRI


@dataclasses.dataclass
class HierarchyStats:
    num_nodes: int = 0
    num_tree_nodes: int = 0
    num_leaf_nodes: int = 0


def _as_numpy(bvh):
    return (
        np.asarray(bvh.node_min),
        np.asarray(bvh.node_max),
        np.asarray(bvh.child),
        np.asarray(bvh.count),
        np.asarray(bvh.type),
        int(bvh.root),
        int(bvh.root_count),
    )


def count_nodes(bvh) -> HierarchyStats:
    """Iterative port of CountNodes (src/Utilities.cpp:8-44)."""
    _, _, child, count, ntype, root, root_count = _as_numpy(bvh)
    stats = HierarchyStats()
    stack = [root + i for i in range(root_count) if ntype[root + i] == CHILD_BOX]
    stats.num_nodes += len(stack)
    stats.num_tree_nodes += len(stack)
    while stack:
        index = stack.pop()
        for i in range(count[index]):
            c = child[index] + i
            stats.num_nodes += 1
            if ntype[c] == CHILD_TRI:
                stats.num_leaf_nodes += 1
            elif ntype[c] == CHILD_BOX:
                stats.num_tree_nodes += 1
                stack.append(c)
    return stats


def verify_hierarchy(bvh, exact: bool = True) -> list:
    """Iterative port of VerifyHierarchy (src/Utilities.cpp:46-84): every
    interior AABB must equal the exact union of its children. Returns the
    list of offending node indices (empty == valid)."""
    node_min, node_max, child, count, ntype, root, root_count = _as_numpy(bvh)
    errors = []
    stack = [root + i for i in range(root_count) if ntype[root + i] == CHILD_BOX]
    while stack:
        index = stack.pop()
        c0 = child[index]
        n = count[index]
        kids = np.arange(c0, c0 + n)
        cmin = node_min[kids].min(axis=0)
        cmax = node_max[kids].max(axis=0)
        if exact:
            ok = np.array_equal(node_min[index], cmin) and np.array_equal(
                node_max[index], cmax
            )
        else:
            ok = np.all(node_min[index] <= cmin + 1e-6) and np.all(
                node_max[index] >= cmax - 1e-6
            )
        if not ok:
            errors.append(int(index))
        for k in kids:
            if ntype[k] == CHILD_BOX:
                stack.append(int(k))
    return errors


def leaf_primitive_ids(bvh, pairs) -> np.ndarray:
    """All primitive ids reachable from the root — used to check coverage."""
    _, _, child, count, ntype, root, root_count = _as_numpy(bvh)
    prim0 = np.asarray(pairs.prim_id_0)
    prim1 = np.asarray(pairs.prim_id_1)
    out = []
    stack = list(range(root, root + root_count))
    while stack:
        index = stack.pop()
        if ntype[index] == CHILD_TRI:
            out.append(prim0[child[index]])
            if prim1[child[index]] != prim0[child[index]]:
                out.append(prim1[child[index]])
        elif ntype[index] == CHILD_BOX:
            stack.extend(range(child[index], child[index] + count[index]))
    return np.sort(np.asarray(out, np.int64))
