"""Host-side BVH construction (NumPy) with an optional native C++ builder.

Algorithm parity with the reference builder (ref: src/instance.rs:175-310):
recursive median split on the longest *centroid*-bounds axis, leaves hold at
most `max_prims` triangles, empty meshes produce a single zeroed node.  The
flat node layout is {bbox_min, bbox_max, left, right, first, count}; a node
is a leaf iff count > 0.

Deviation (TPU-friendly): instead of storing a tri_indices indirection table
(reference: bvh_triangle_indices), we return `order`, the permutation of
triangles into leaf order.  The caller permutes the triangle SoA arrays once
at build time, so device traversal reads contiguous [first, first+count)
ranges with zero indirection — one less gather per leaf triangle.

An iterative explicit stack replaces recursion (Python recursion depth and
call overhead both hurt at 100k+ triangles); the splits and leaf contents are
identical to the reference's depth-first recursion, only the internal node
numbering differs (children are allocated eagerly rather than per-subtree).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BVH:
    bbox_min: np.ndarray  # (B, 3) f32
    bbox_max: np.ndarray  # (B, 3) f32
    left: np.ndarray      # (B,) i32
    right: np.ndarray     # (B,) i32
    first: np.ndarray     # (B,) i32
    count: np.ndarray     # (B,) i32
    order: np.ndarray     # (T,) i32 — triangle permutation into leaf order


def build_bvh(tri_min: np.ndarray, tri_max: np.ndarray, max_prims: int = 2) -> BVH:
    """Build the median-split BVH from per-triangle AABBs.

    tri_min/tri_max: (T, 3) float arrays. max_prims >= 1 triangles per leaf.
    Uses the native C++ builder when native/libtpurt_native.so is present
    (identical output — see tests/test_native.py); NumPy otherwise.
    """
    max_prims = max(int(max_prims), 1)
    T = int(tri_min.shape[0])
    if T > 0:
        from tpurt.utils.native import build_bvh_native
        nat = build_bvh_native(np.asarray(tri_min, np.float32),
                               np.asarray(tri_max, np.float32), max_prims)
        if nat is not None:
            return BVH(*nat)
    if T == 0:
        z3 = np.zeros((1, 3), np.float32)
        zi = np.zeros((1,), np.int32)
        return BVH(z3, z3, zi, zi, zi, zi, np.zeros((0,), np.int32))

    tri_min = np.asarray(tri_min, np.float32)
    tri_max = np.asarray(tri_max, np.float32)
    centroid = 0.5 * tri_min + 0.5 * tri_max

    nodes_min, nodes_max = [], []
    nodes_left, nodes_right, nodes_first, nodes_count = [], [], [], []
    order: list[int] = []

    # Depth-first build with an explicit stack of (node_idx, index_array)
    # entries: each pop allocates/splits its node in a single visit and the
    # PARENT writes its children's indices (left = next alloc, right after
    # the left subtree), reproducing the reference's recursive control flow
    # and leaf order exactly.
    def alloc():
        nodes_min.append(np.zeros(3, np.float32))
        nodes_max.append(np.zeros(3, np.float32))
        nodes_left.append(0)
        nodes_right.append(0)
        nodes_first.append(0)
        nodes_count.append(0)
        return len(nodes_min) - 1

    root = alloc()
    stack = [(root, np.arange(T, dtype=np.int64))]
    # Pushing right-then-left pops the left subtree first, so leaf triangles
    # land in `order` in the reference's depth-first left-to-right sequence.
    while stack:
        node, idx = stack.pop()
        bmin = tri_min[idx].min(axis=0)
        bmax = tri_max[idx].max(axis=0)
        nodes_min[node] = bmin
        nodes_max[node] = bmax
        n = len(idx)
        if n <= max_prims:
            nodes_first[node] = len(order)
            nodes_count[node] = n
            order.extend(idx.tolist())
            continue

        c = centroid[idx]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        d = cmax - cmin
        # Longest-axis rule with the reference's >= tie-breaking
        # (x wins ties with y and z; y wins ties with z). instance.rs:167-172.
        if d[0] >= d[1] and d[0] >= d[2]:
            dim = 0
        elif d[1] >= d[2]:
            dim = 1
        else:
            dim = 2

        srt = idx[np.argsort(c[:, dim], kind="stable")]
        mid = n // 2
        lchild = alloc()
        rchild = alloc()
        nodes_left[node] = lchild
        nodes_right[node] = rchild
        # Push right first so left is processed (and numbered) first.
        stack.append((rchild, srt[mid:]))
        stack.append((lchild, srt[:mid]))

    return BVH(
        bbox_min=np.stack(nodes_min).astype(np.float32),
        bbox_max=np.stack(nodes_max).astype(np.float32),
        left=np.asarray(nodes_left, np.int32),
        right=np.asarray(nodes_right, np.int32),
        first=np.asarray(nodes_first, np.int32),
        count=np.asarray(nodes_count, np.int32),
        order=np.asarray(order, np.int32),
    )


def validate_bvh(bvh: BVH, tri_min: np.ndarray, tri_max: np.ndarray, eps=1e-5) -> None:
    """Structural invariants: every triangle in exactly one leaf; parent boxes
    contain child boxes; leaf boxes contain their triangles. Raises on breach."""
    T = tri_min.shape[0]
    if T == 0:
        return
    seen = np.sort(bvh.order)
    if not np.array_equal(seen, np.arange(T)):
        raise AssertionError("BVH leaf order is not a permutation of triangles")
    B = bvh.bbox_min.shape[0]
    for i in range(B):
        if bvh.count[i] > 0:
            f, c = int(bvh.first[i]), int(bvh.count[i])
            tris = bvh.order[f:f + c]
            if (tri_min[tris] < bvh.bbox_min[i] - eps).any() or (tri_max[tris] > bvh.bbox_max[i] + eps).any():
                raise AssertionError(f"leaf {i} does not contain its triangles")
        else:
            for ch in (int(bvh.left[i]), int(bvh.right[i])):
                if ch == 0 and i != 0:
                    raise AssertionError(f"inner node {i} has null child")
                if (bvh.bbox_min[ch] < bvh.bbox_min[i] - eps).any() or (bvh.bbox_max[ch] > bvh.bbox_max[i] + eps).any():
                    raise AssertionError(f"node {i} does not contain child {ch}")
