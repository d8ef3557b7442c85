"""Tile-coherent DYNAMIC BVH traversal for triangle meshes in the Pallas
kernels — big-mesh support without static unrolling.

The static cull tree (tpurt.kernels.mega_pallas._tri_cull_tree) bakes every
triangle into the instruction stream: great throughput, but compile time and
code size grow linearly with the mesh (512 unrolled primitives measured
25 s-6 min — the spread is compile-service contention, README "First
run"), which caps fused-kernel scenes at ~1k triangles. This module
keeps the SAME whole-tile traversal idea — the tile is the traversal granule,
one scalar decision per node — but walks a *runtime* BVH:

  * node tables live in SMEM ((B, 8) f32 bounds + (B, 4) i32 topology),
    loaded as scalars during the walk;
  * an explicit stack is a small SMEM scratch (pl.run_scoped), exactly the
    device analogue of the reference's fixed 64-deep traversal stack
    (ref: src/kernels/mega_kernel.wgsl:395-428);
  * a node is descended only if SOME relevant lane's ray enters its AABB
    closer than that lane's current best hit (/ within its shadow range) —
    the whole-tile lax.cond vote of the static cull tree, applied to a
    dynamically indexed node;
  * leaf triangles are contiguous rows of the SMEM triangle table (the BVH
    builder's leaf-order permutation, tpurt.accel), swept with a dynamic-trip
    fori_loop of broadcast scalar loads.

Compile time is O(1) in mesh size; the same kernel binary serves any mesh up
to the table budget. The tree topology/splits are the reference's recursive
median split (ref: src/instance.rs:259-269) via tpurt.accel.build_bvh, with
a coarser leaf size than the XLA path (tile-level votes want 32-64
primitives per leaf for meshes, ~16 for the sphere walk — measured sweeps
in tpurt/config.py's pallas_bvh_leaf comment and docs/DESIGN.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.ops import soa as s
from tpurt.ops.bsdf import fr_dielectric
from tpurt.ops.spectra import DISPERSION_B

MISS = np.float32(1e30)
# SMEM table budgets. Triangles: (T, 16) f32 rows; nodes: (B, 8) f32 +
# (B, 4) i32. A median-split tree with leaf size K has < 2*ceil(T/K) nodes.
MAX_BVH_TRIS = 8192
MAX_BVH_SPHERES = 4096
STACK_DEPTH = 64  # ref: mega_kernel.wgsl:402 (fixed 64-deep stack)
# Chunked-mode DMA route: True stages each slab HBM -> VMEM -> SMEM (two
# local copies) instead of one direct HBM -> SMEM copy. The direct route
# faults the TPU worker when the slab tensor is actually HBM-resident
# (small ANY-space inputs get VMEM-placed and mask the fault); the staged
# route is the guide's supported pattern. Interpret mode accepts both.
CHUNK_DMA_VIA_VMEM = True


def build_tri_bvh_tables(triangles, leaf_size: int, sah: bool = False,
                         width: int = 0):
    """Host: coarse BVH over the frozen triangle tuple.

    Returns (tri_tab (T,16) f32, node_f (B,8) f32, node_i (B,4|10) i32) as
    numpy arrays; the triangle rows are permuted into THIS tree's leaf order
    so every leaf is a contiguous [first, first+count) row range.
    node_f: bmin xyz, bmax xyz, 0, 0. node_i: left, right, first, count
    (leaf iff count > 0), the reference's flat node layout
    (ref: src/instance.rs:175-184). sah: cfg.pallas_bvh_sah split rule
    (accel.build_bvh) — same layout, fewer leaf visits per walk.
    width >= 3 (cfg.pallas_bvh_width): collapse into a wide-branching tree
    (accel.collapse_wide); node_i grows to 10 columns [c0 c1 first count
    c2..c7], mapping to packed record fields 6,7,8,9,10..15 — a W<=8 node
    still fits ONE 16-field record. Leaf rows are identical either way
    (the collapse keeps the binary tree's leaves and permutation).
    """
    from tpurt.accel import build_bvh

    a = np.asarray([t.a for t in triangles], np.float32).reshape(-1, 3)
    e1 = np.asarray([t.e1 for t in triangles], np.float32).reshape(-1, 3)
    e2 = np.asarray([t.e2 for t in triangles], np.float32).reshape(-1, 3)
    v1 = a + e1
    v2 = a + e2
    tri_min = np.minimum(a, np.minimum(v1, v2))
    tri_max = np.maximum(a, np.maximum(v1, v2))
    bvh = build_bvh(tri_min, tri_max, max_prims=max(1, int(leaf_size)),
                    sah=sah)

    T = len(triangles)
    tri_tab = np.zeros((max(T, 1), 16), np.float32)
    for row, ti in enumerate(bvh.order):
        t = triangles[int(ti)]
        tri_tab[row, 0:3] = t.a
        tri_tab[row, 3:6] = t.e1
        tri_tab[row, 6:9] = t.e2
        tri_tab[row, 9:12] = t.n
        tri_tab[row, 12] = float(t.mat)

    node_f, node_i = _pack_nodes(bvh, width)
    return tri_tab, node_f, node_i


def _pack_nodes(bvh, width: int = 0):
    """Flat node arrays shared by the triangle and sphere builders:
    node_f = [bmin3 | bmax3 | pad2], node_i = [left right first count]
    (binary) or [c0 c1 first count c2..c7] (wide, width >= 3 — see
    build_tri_bvh_tables)."""
    if width >= 3:
        from tpurt.accel import collapse_wide, wide_max_stack
        wide = collapse_wide(bvh, width)
        hw = wide_max_stack(wide)
        if hw > STACK_DEPTH - 1:
            raise ValueError(
                f"wide BVH worst-case stack {hw} can overflow the "
                f"{STACK_DEPTH}-deep traversal stack")
        B = wide.bbox_min.shape[0]
        node_f = np.zeros((B, 8), np.float32)
        node_f[:, 0:3] = wide.bbox_min
        node_f[:, 3:6] = wide.bbox_max
        ch = np.zeros((B, 8), np.int32)
        ch[:, :wide.children.shape[1]] = wide.children
        node_i = np.concatenate(
            [ch[:, 0:2],
             np.stack([wide.first, wide.count], axis=1),
             ch[:, 2:8]], axis=1).astype(np.int32)
        return node_f, node_i
    _assert_stack_fits(bvh)
    B = bvh.bbox_min.shape[0]
    node_f = np.zeros((B, 8), np.float32)
    node_f[:, 0:3] = bvh.bbox_min
    node_f[:, 3:6] = bvh.bbox_max
    node_i = np.stack([bvh.left, bvh.right, bvh.first, bvh.count],
                      axis=1).astype(np.int32)
    return node_f, node_i


def _tree_depth(bvh) -> int:
    """Max root-to-leaf depth of the built tree (host-side, iterative)."""
    count = np.asarray(bvh.count)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    if count.shape[0] == 0:
        return 0
    depth = 0
    stack = [(0, 1)]
    while stack:
        node, d = stack.pop()
        depth = max(depth, d)
        if count[node] == 0:  # inner
            stack.append((int(left[node]), d + 1))
            stack.append((int(right[node]), d + 1))
    return depth


def _assert_stack_fits(bvh) -> None:
    """The walk's push guard DROPS pushes past STACK_DEPTH-1 occupancy —
    in the closest-hit walk a dropped push silently skips geometry (wrong
    hit / missed occlusion), so it must be structurally unreachable: verify
    at table-build time that the worst case (one stacked entry per level on
    the path + both children at the deepest inner node) fits."""
    d = _tree_depth(bvh)
    if d + 1 > STACK_DEPTH - 1:
        raise ValueError(
            f"BVH depth {d} can overflow the {STACK_DEPTH}-deep traversal "
            "stack; raise STACK_DEPTH or the leaf size")


MAX_ALWAYS_SPHERES = 8


def huge_sphere_mask(r: np.ndarray) -> np.ndarray:
    """Which radii count as scene-spanning (split_huge_spheres' rule) —
    ONE definition shared with count-level predicates (supports_scene)."""
    med = float(np.median(r))
    return r > max(10.0 * med, 1e-3)


def n_tree_spheres(r: np.ndarray) -> int:
    """How many spheres land on the TREE side of split_huge_spheres for
    the given radius array (r > 0 entries only; the always side caps at
    MAX_ALWAYS_SPHERES and overflow spills into the tree)."""
    r = np.asarray(r, np.float32)
    r = r[r > 0.0]
    if r.size == 0:
        return 0
    n_huge = int(huge_sphere_mask(r).sum())
    return int(r.size - min(n_huge, MAX_ALWAYS_SPHERES))


def split_huge_spheres(spheres):
    """(always, tree) partition: scene-spanning spheres (e.g. the r=1000
    ground, lib.rs:233) would bloat every node box and defeat near-to-far
    ordering — sweep them flat, BVH the rest (cf. _sphere_cull_tree).
    The always side is statically unrolled per kernel, so it is capped at
    the MAX_ALWAYS_SPHERES largest radii (a bimodal radius distribution
    must not reintroduce the compile-time blowup the BVH exists to avoid);
    overflow spheres go into the tree — correct, just less prunable."""
    if not spheres:
        return (), ()
    r = np.asarray([sp.r for sp in spheres], np.float32)
    huge = huge_sphere_mask(r)
    if int(huge.sum()) > MAX_ALWAYS_SPHERES:
        import warnings
        warnings.warn(
            f"{int(huge.sum())} scene-spanning spheres exceed the "
            f"{MAX_ALWAYS_SPHERES}-sphere flat-sweep cap; the overflow "
            "goes into the BVH where each one bloats every ancestor box "
            "and defeats near-to-far pruning (correct output, large perf "
            "cliff on bimodal-radius scenes)", stacklevel=2)
        # keep the N LARGEST radii (stable sort: ties break toward lower
        # index, deterministically) — selecting by index order instead
        # could demote the strictly-largest sphere into the tree, the
        # exact scene-spanning case this split exists to avoid
        huge_idx = np.flatnonzero(huge)
        keep = huge_idx[np.argsort(-r[huge_idx],
                                   kind="stable")[:MAX_ALWAYS_SPHERES]]
        huge = np.zeros_like(huge)
        huge[keep] = True
    return (tuple(sp for sp, h in zip(spheres, huge) if h),
            tuple(sp for sp, h in zip(spheres, huge) if not h))


def build_sphere_bvh_tables(spheres, leaf_size: int, sah: bool = False,
                            width: int = 0):
    """Host: coarse BVH over a (non-huge) frozen sphere tuple. Same packed
    layout as the triangle tables; sphere record = [cx cy cz r | mat mtype
    ior | pad] (the dynamic-sweep fields, cf. mega_pallas._prim_tables).
    Rows are permuted into leaf order; guard rows have r == 0.
    width: wide-branching collapse, see build_tri_bvh_tables."""
    from tpurt.accel import build_bvh

    c = np.asarray([sp.c for sp in spheres], np.float32).reshape(-1, 3)
    r = np.asarray([sp.r for sp in spheres], np.float32).reshape(-1, 1)
    bvh = build_bvh(c - r, c + r, max_prims=max(1, int(leaf_size)), sah=sah)

    S = len(spheres)
    sph_tab = np.zeros((max(S, 1), 16), np.float32)
    for row, si in enumerate(bvh.order):
        sp = spheres[int(si)]
        sph_tab[row, 0:3] = sp.c
        sph_tab[row, 3] = sp.r
        sph_tab[row, 4] = float(sp.mat)
        sph_tab[row, 5] = float(sp.mtype)
        sph_tab[row, 6] = sp.ior

    node_f, node_i = _pack_nodes(bvh, width)
    return sph_tab, node_f, node_i


class _PackedTable:
    """Accessor for a (rows, 128) SMEM table holding 16-float logical
    records 8 per row: SMEM windows pad the minor dimension to 128 lanes
    (measured: a (2303, 16) window allocates 2304x128 f32), so packing 8
    records per physical row is an 8x capacity win. Logical record r,
    field c lives at [base0 + r >> 3, ((base0 + r) & 7) * 16 + c]."""

    def __init__(self, ref, base0: int = 0):
        self.ref = ref
        self.base0 = base0

    def record(self, r):
        """(row, col_base) of logical record base0 + r (r may be traced)."""
        idx = self.base0 + r
        return idx >> 3, (idx & 7) * 16

    def field(self, rowcol, c: int):
        row, col = rowcol
        return self.ref[row, col + c]


def pack_tables(tri_tab: np.ndarray, node_f: np.ndarray,
                node_i: np.ndarray, leaf_size: int = 16) -> np.ndarray:
    """One (ceil((T+B)/8), 128) f32 SMEM table: T primitive records then B
    node records [bmin3 | bmax3 | left right first count | pad], 8 records
    per 128-lane row. Topology i32s stored as exact f32s (< 2^24).

    `leaf_size` zero guard records keep the statically-unrolled leaf sweep
    in-bounds: it reads `leaf_size` records from `first` regardless of the
    runtime count, so a short leaf near the end of the primitive region can
    read past the node records. The over-read records (node records or the
    zero guards) are NOT meaningful geometry — correctness comes from the
    `i < count` mask in every leaf body; the guards only guarantee the
    reads stay inside the allocated table."""
    B = node_f.shape[0]
    nrec = np.zeros((B, 16), np.float32)
    nrec[:, 0:6] = node_f[:, 0:6]
    nrec[:, 6:6 + node_i.shape[1]] = node_i.astype(np.float32)
    recs = np.concatenate([tri_tab, nrec], axis=0)
    n = recs.shape[0] + max(16, int(leaf_size))
    rows = (n + 7) // 8
    flat = np.zeros((rows * 8, 16), np.float32)
    flat[:recs.shape[0]] = recs
    return flat.reshape(rows, 128)


def packed_views(tab_ref, n_tris: int):
    """(nodes, tris) accessor views over the packed table."""
    return _PackedTable(tab_ref, base0=n_tris), _PackedTable(tab_ref, 0)


def _node_box_entry(nodes: _PackedTable, node, o, inv):
    """Slab test of all lanes vs ONE dynamically-indexed node box.
    Returns (t_near, t_far) planes (cf. mega_pallas._aabb_entry_exit)."""
    rc = nodes.record(node)
    tn = jnp.full_like(o[0], -np.float32(np.inf))
    tf = jnp.full_like(o[0], np.float32(np.inf))
    for c in range(3):
        bmin = nodes.field(rc, c)
        bmax = nodes.field(rc, c + 3)
        t0 = (bmin - o[c]) * inv[c]
        t1 = (bmax - o[c]) * inv[c]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return tn, tf


def _tri_record(tris: _PackedTable, ti):
    """One triangle's scalars from the packed table (dynamic record ti)."""
    rc = tris.record(ti)
    av = tuple(tris.field(rc, c) for c in range(0, 3))
    e1 = tuple(tris.field(rc, c) for c in range(3, 6))
    e2 = tuple(tris.field(rc, c) for c in range(6, 9))
    n = tuple(tris.field(rc, c) for c in range(9, 12))
    mat = tris.field(rc, 12).astype(jnp.int32)
    return av, e1, e2, n, mat


def build_tri_gmat(tri_tab: np.ndarray, leaf_cap: int) -> np.ndarray:
    """Host: the MXU all-pairs leaf-test matrix for an ALREADY leaf-ordered
    triangle table (build_tri_bvh_tables output — same permutation by
    construction). Moller-Trumbore is linear in the lane feature vector
    f = [d | o x d | o | 1] (docs/DESIGN.md, round-4 MXU-leaf section):

        det   = d . (-N)                    N = e1 x e2
        u*det = (o x d) . e2 + d . (a x e2)
        v*det = (o x d) . (-e1) + d . (e1 x a)
        t*det = o . N - a . N

    Returns (T + leaf_cap, 72) f32: per-triangle row = four 16-float
    blocks (det, u_num, v_num, t_num coefficient columns over f) + the
    shading payload [nx ny nz mat | pad 4] — sliced per leaf on the
    SUBLANE dim (pl.ds(first, leaf_cap)); the leaf_cap zero guard rows
    produce det == 0 -> invalid, so over-reads are inert."""
    T = tri_tab.shape[0]
    a = tri_tab[:, 0:3]
    e1 = tri_tab[:, 3:6]
    e2 = tri_tab[:, 6:9]
    n_unit = tri_tab[:, 9:12]
    mat = tri_tab[:, 12]
    N = np.cross(e1, e2)
    g = np.zeros((T + max(1, int(leaf_cap)), 72), np.float32)
    # block 0: det  (rows 0:3 = d coefficients)
    g[:T, 0:3] = -N
    # block 1: u_num (rows 0:3 = d, rows 3:6 = o x d)
    g[:T, 16:19] = np.cross(a, e2)
    g[:T, 19:22] = e2
    # block 2: v_num
    g[:T, 32:35] = np.cross(e1, a)
    g[:T, 35:38] = -e1
    # block 3: t_num (rows 6:9 = o, row 9 = const)
    g[:T, 48 + 6:48 + 9] = N
    g[:T, 48 + 9] = -np.einsum("ij,ij->i", a, N)
    # payload
    g[:T, 64:67] = n_unit
    g[:T, 67] = mat
    return g


def _make_mxu_leaf_fn(o, d, g_ref, leaf_cap: int):
    """Closest-hit leaf_fn over the MXU all-pairs representation: four
    (leaf, 16) x (16, 128) matmuls per 128-lane row against the leaf's
    G-matrix slice, a divide/compare epilogue, and an exclusive-first-min
    one-hot matmul for the winning triangle's normal/material.

    NOT bit-identical to the record sweep (different rounding at grazing
    hits — measured 99.7% hit/miss agreement, tools/probe_mxu_leaf.py);
    opt-in via cfg.pallas_mxu_leaf."""
    R = o[0].shape[0]
    oxd = (o[1] * d[2] - o[2] * d[1],
           o[2] * d[0] - o[0] * d[2],
           o[0] * d[1] - o[1] * d[0])
    feats = (*d, *oxd, *o, jnp.ones_like(o[0]))
    eps = jnp.float32(1.17549435e-38)

    def leaf_fn(first, count, st):
        g = g_ref[pl.ds(first, leaf_cap), :]      # (leaf, 72)
        sub = jax.lax.broadcasted_iota(jnp.int32, (leaf_cap, 128), 0)
        in_leaf = sub < count
        rows_t = []
        rows_nx = []
        rows_ny = []
        rows_nz = []
        rows_mat = []
        for r in range(R):
            fr = [f[r:r + 1, :] for f in feats]
            fr += [jnp.zeros_like(fr[0])] * (16 - len(fr))
            F = jnp.concatenate(fr, axis=0)       # (16, 128)
            det = jax.lax.dot(g[:, 0:16], F,
                              preferred_element_type=jnp.float32)
            un = jax.lax.dot(g[:, 16:32], F,
                             preferred_element_type=jnp.float32)
            vn = jax.lax.dot(g[:, 32:48], F,
                             preferred_element_type=jnp.float32)
            tn = jax.lax.dot(g[:, 48:64], F,
                             preferred_element_type=jnp.float32)
            s_ = jnp.where(det >= 0.0, 1.0, -1.0)
            ad = det * s_
            us = un * s_
            vs = vn * s_
            ts = tn / jnp.where(ad >= eps, det, 1.0)
            ok = (in_leaf & (ad >= eps) & (us >= 0.0) & (vs >= 0.0)
                  & (us <= ad) & (us + vs <= ad) & (ts > eps))
            tv = jnp.where(ok, ts, MISS)          # (leaf, 128)
            tmin = jnp.min(tv, axis=0, keepdims=True)       # (1, 128)
            # exclusive first-min one-hot (no cumsum: two min-reduces)
            eq = tv <= tmin
            fidx = jnp.min(jnp.where(eq, sub, jnp.int32(leaf_cap)),
                           axis=0, keepdims=True)
            onehot = jnp.where(sub == fidx, 1.0, 0.0)       # (leaf, 128)
            pay = jax.lax.dot(g[:, 64:68].T, onehot,
                              preferred_element_type=jnp.float32)  # (4,128)
            rows_t.append(tmin)
            rows_nx.append(pay[0:1])
            rows_ny.append(pay[1:2])
            rows_nz.append(pay[2:3])
            rows_mat.append(pay[3:4])
        t_new = jnp.concatenate(rows_t, axis=0)             # (R, 128)
        better = t_new < st["t"]
        return {
            **st,
            "t": jnp.where(better, t_new, st["t"]),
            "nx": jnp.where(better, jnp.concatenate(rows_nx, 0), st["nx"]),
            "ny": jnp.where(better, jnp.concatenate(rows_ny, 0), st["ny"]),
            "nz": jnp.where(better, jnp.concatenate(rows_nz, 0), st["nz"]),
            "mat": jnp.where(better,
                             jnp.concatenate(rows_mat, 0).astype(jnp.int32),
                             st["mat"]),
        }

    return leaf_fn


# Optimal/near-optimal compare-swap networks, ascending (Knuth v3 §5.3.4):
# the wide walk sorts child (key, id, go) triples with data-independent
# compare-swaps — the only sort shape that lowers to straight-line scalar
# selects inside the kernel.
_SORT_NETS = {
    3: ((0, 1), (1, 2), (0, 1)),
    4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
    5: ((0, 1), (3, 4), (2, 4), (2, 3), (1, 4), (0, 3), (0, 2), (1, 3),
        (1, 2)),
    6: ((1, 2), (4, 5), (0, 2), (3, 5), (0, 1), (3, 4), (2, 5), (0, 3),
        (1, 4), (2, 4), (1, 3), (2, 3)),
    7: ((1, 2), (3, 4), (5, 6), (0, 2), (3, 5), (4, 6), (0, 1), (4, 5),
        (2, 6), (0, 4), (1, 5), (0, 3), (2, 5), (1, 3), (2, 4), (2, 3)),
    8: ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)),
}

# Child-pointer fields of a wide packed node record: slots 0,1 reuse the
# binary layout's left/right fields (6,7); slots 2..7 take the pad fields
# (10..15). first/count stay at 8/9 — shared with leaves.
_WIDE_CHILD_FIELDS = (6, 7, 10, 11, 12, 13, 14, 15)


def _bvh_walk(nodes, o, inv, vote, t_cap, leaf_fn, state, ordered=True,
              leaf_want=False, leaf_node=False, stack_ref=None,
              width: int = 0):
    """Shared whole-tile stack walk. vote(state) -> relevance mask plane;
    t_cap(state) -> per-lane useful-entry bound; leaf_fn(first, count,
    state) -> state. `state` is a dict of planes (+ i32 scalars).
    leaf_node=True prepends the leaf's node index to leaf_fn's arguments
    (the chunked walk's phase-1 worklist needs it); stack_ref lets a
    caller supply an SMEM stack scoped around repeated walks (the chunked
    phase-2 per-chunk walks) instead of scoping one per call.

    At each inner node BOTH children are slab-tested and voted; unvoted
    children are never pushed, and (ordered=True) the majority-nearer child
    is pushed last so it pops first — near-to-far descent tightens the
    per-lane t_cap early and the far subtree prunes away (the whole-tile
    analogue of ordered per-ray BVH traversal). Pushes are branch-free:
    write the slot, then bump sp by the vote.

    width >= 3 (cfg.pallas_bvh_width): the table holds WIDE nodes
    (build_tri_bvh_tables width) and each inner visit tests up to `width`
    child boxes, orders the voted ones near-to-far by their earliest lane
    entry (min over voted lanes of tn — a scalar per child, sorted with a
    compare-swap network), and pushes far-first.  One pop + one
    leaf/inner cond then amortizes over ~log2(width) binary levels — the
    direct attack on the walk's measured scalar-issue serialization bound
    (docs/DESIGN.md roofline; SURVEY §7 "shallow wide-branching BVH").
    Absent child slots (id 0 — the root is never a child) are never
    pushed.

    Profiling: if `state` carries i32 scalar keys "_nodes"/"_leaves"/
    "_prims", they accumulate inner-node visits, leaf visits, and leaf
    primitive-sweep counts (the cost model's inputs; tools/probe_bvh.py).
    The keys are checked statically — absent keys cost nothing."""

    def walk(stack_ref):
        stack_ref[0] = jnp.int32(0)  # root

        def cond(carry):
            sp, _ = carry
            return sp > 0

        def body(carry):
            sp, st = carry
            sp = sp - 1
            node = stack_ref[sp]
            rc = nodes.record(node)
            count = nodes.field(rc, 9).astype(jnp.int32)

            def leaf_case(args):
                sp, st = args
                first = nodes.field(rc, 8).astype(jnp.int32)
                if isinstance(st, dict) and "_leaves" in st:
                    st = dict(st, _leaves=st["_leaves"] + 1,
                              _prims=st["_prims"] + count)
                pre = (node,) if leaf_node else ()
                if leaf_want:
                    # per-lane leaf-box vote for cluster-predicated sweeps
                    tn, tf = _node_box_entry(nodes, node, o, inv)
                    want = vote(st) & ~((tn > tf) | (tf <= 0.0)
                                        | (tn >= t_cap(st)))
                    return sp, leaf_fn(*pre, first, count, st, want)
                return sp, leaf_fn(*pre, first, count, st)

            def inner_case_wide(args):
                sp, st = args
                if isinstance(st, dict) and "_nodes" in st:
                    st = dict(st, _nodes=st["_nodes"] + 1)
                rel = vote(st)
                cap = t_cap(st)
                ids, gos, keys = [], [], []
                for f in _WIDE_CHILD_FIELDS[:width]:
                    cid = nodes.field(rc, f).astype(jnp.int32)
                    tn, tf = _node_box_entry(nodes, cid, o, inv)
                    # negated compares: NaN slab results vote HIT
                    v = rel & ~((tn > tf) | (tf <= 0.0) | (tn >= cap))
                    ids.append(cid)
                    if ordered:
                        # earliest voted-lane entry = near-to-far key;
                        # un-voted children key to MISS and sort last.
                        # ONE reduce serves both the key and the vote
                        # (key < MISS iff some lane voted: real boxes
                        # never produce tn == MISS). A lane's slab test
                        # can yield tn = NaN (0*inf on axis-aligned rays
                        # grazing a box plane); such lanes vote HIT by
                        # the negated compares above, but a NaN would
                        # poison the min (key NaN -> key < MISS False ->
                        # voted subtree silently DROPPED, unlike the
                        # binary path's any(v) push). Sanitize to -inf
                        # for the key only: the lane keeps its HIT vote,
                        # keys the child nearest, and the single reduce
                        # still doubles as the vote.
                        tn_key = jnp.where(jnp.isnan(tn),
                                           -np.float32(np.inf), tn)
                        key = jnp.min(jnp.where(v, tn_key, MISS))
                        keys.append(key)
                        gos.append((cid > 0) & (key < MISS))
                    else:
                        gos.append((cid > 0) & jnp.any(v))
                if ordered:
                    for i, j in _SORT_NETS[width]:
                        sw = keys[i] > keys[j]
                        keys[i], keys[j] = (
                            jnp.where(sw, keys[j], keys[i]),
                            jnp.where(sw, keys[i], keys[j]))
                        ids[i], ids[j] = (
                            jnp.where(sw, ids[j], ids[i]),
                            jnp.where(sw, ids[i], ids[j]))
                        gos[i], gos[j] = (
                            jnp.where(sw, gos[j], gos[i]),
                            jnp.where(sw, gos[i], gos[j]))
                # push far-first so the nearest pops first; same
                # stack-overflow guard contract as the binary path
                # (the builder PROVES the worst case fits —
                # accel.wide_max_stack in _pack_nodes)
                for i in reversed(range(width)):
                    fits = sp <= STACK_DEPTH - 2
                    stack_ref[sp] = ids[i]
                    sp = sp + jnp.where(gos[i] & fits, 1, 0)
                return sp, st

            def inner_case(args):
                sp, st = args
                if isinstance(st, dict) and "_nodes" in st:
                    st = dict(st, _nodes=st["_nodes"] + 1)
                left = nodes.field(rc, 6).astype(jnp.int32)
                right = nodes.field(rc, 7).astype(jnp.int32)
                rel = vote(st)
                cap = t_cap(st)
                tnl, tfl = _node_box_entry(nodes, left, o, inv)
                tnr, tfr = _node_box_entry(nodes, right, o, inv)
                # negated compares: NaN slab results vote HIT
                # (conservative, cf. mega_pallas._tree_sweep)
                vl = rel & ~((tnl > tfl) | (tfl <= 0.0) | (tnl >= cap))
                vr = rel & ~((tnr > tfr) | (tfr <= 0.0) | (tnr >= cap))
                go_l = jnp.any(vl)
                go_r = jnp.any(vr)
                if ordered:
                    # majority vote among lanes wanting both children
                    sign = jnp.where(vl & vr,
                                     jnp.where(tnl <= tnr, 1.0, -1.0), 0.0)
                    near_l = jnp.sum(sign) >= 0.0
                else:
                    near_l = True
                far_id = jnp.where(near_l, right, left)
                far_go = jnp.where(near_l, go_r, go_l)
                near_id = jnp.where(near_l, left, right)
                near_go = jnp.where(near_l, go_l, go_r)
                # branch-free conditional pushes, far first / near on top.
                # Stack-overflow guard: a dropped push would silently SKIP
                # GEOMETRY (wrong closest hit / missed occlusion), so
                # _assert_stack_fits proves at table-build time that the
                # tree's depth cannot reach this guard — it exists only to
                # bound the write index for the compiler.
                fits = sp <= STACK_DEPTH - 2
                stack_ref[sp] = far_id
                sp = sp + jnp.where(far_go & fits, 1, 0)
                stack_ref[sp] = near_id
                sp = sp + jnp.where(near_go & fits, 1, 0)
                return sp, st

            return jax.lax.cond(count > 0, leaf_case,
                                inner_case_wide if width >= 3
                                else inner_case, (sp, st))

        _, st = jax.lax.while_loop(cond, body, (jnp.int32(1), state))
        return st

    if stack_ref is not None:
        return walk(stack_ref)
    return pl.run_scoped(walk, pltpu.SMEM((STACK_DEPTH,), jnp.int32))


def _make_clustered_leaf_fn(o, d, record, body, leaf_size: int,
                            cluster_rows: int):
    """leaf_fn(first, count, st, want) that splits the VECTOR sweep into
    row-clusters, each gated by a lax.cond on that cluster's own leaf-box
    vote (`want`, computed by _bvh_walk's leaf_case). The leaf's scalar
    record loads are hoisted ONCE tile-wide before the cluster loop — the
    scalar-unit cost is unchanged; only per-lane intersection math is
    skipped for clusters that don't want the leaf. Plane-valued state
    entries are sliced/merged per cluster (disjoint rows, so cluster
    order cannot matter); scalar entries pass through untouched."""
    R = o[0].shape[0]

    def leaf_fn(first, count, st, want):
        recs = [record(first + jnp.int32(i)) for i in range(leaf_size)]
        planes = {k: v for k, v in st.items()
                  if getattr(v, "ndim", 0) == 2}
        # rebuild each plane by concatenating per-cluster chunks —
        # dynamic_update_slice has no Mosaic lowering inside the walk's
        # cond/while nest, and the row splits are static anyway
        chunks = []
        for r0 in range(0, R, cluster_rows):
            rsl = slice(r0, min(r0 + cluster_rows, R))
            o2 = tuple(x[rsl] for x in o)
            d2 = tuple(x[rsl] for x in d)

            def sweep(ch, o2=o2, d2=d2):
                for i, rec in enumerate(recs):
                    ch = body(o2, d2, rec, jnp.int32(i) < count, ch)
                return ch

            chunk = {k: v[rsl] for k, v in planes.items()}
            chunks.append(jax.lax.cond(jnp.any(want[rsl]), sweep,
                                       lambda ch: ch, chunk))
        merged = {k: jnp.concatenate([c[k] for c in chunks], axis=0)
                  for k in planes} if len(chunks) > 1 else chunks[0]
        return {**st, **merged}

    return leaf_fn


def _tri_closest_body(o2, d2, rec, count_ok, st):
    """Closest-hit triangle update — ONE definition shared by the
    single-table and chunked walks (divergence would break their pinned
    bit-exactness)."""
    av, e1, e2, n, mat = rec
    t, valid = s.triangle_hit_c(o2, d2, av, e1, e2)
    t = jnp.where(valid & count_ok, t, MISS)
    better = t < st["t"]
    return {
        "t": jnp.where(better, t, st["t"]),
        "nx": jnp.where(better, n[0], st["nx"]),
        "ny": jnp.where(better, n[1], st["ny"]),
        "nz": jnp.where(better, n[2], st["nz"]),
        "mat": jnp.where(better, mat, st["mat"]),
    }


def _tri_shadow_body(o2, d2, rec, count_ok, st):
    """Any-hit triangle occlusion update (shared, see _tri_closest_body;
    ref: mega_kernel.wgsl:540-562 — triangles occlude fully)."""
    av, e1, e2, _, _ = rec
    t, valid = s.triangle_hit_c(o2, d2, av, e1, e2)
    hit = valid & count_ok & (t < st["tm"])
    return dict(st, occ=jnp.maximum(st["occ"], jnp.where(hit, 1, 0)))


def _tri_closest_state(o):
    zero = jnp.zeros_like(o[0])
    return {"t": jnp.full_like(o[0], MISS),
            "nx": zero, "ny": zero, "nz": zero,
            "mat": jnp.zeros_like(o[0], jnp.int32)}


def closest_tri_bvh(nodes, tris, o, d, mask, leaf_size: int = 0,
                    stats: bool = False, cluster_rows: int = 0,
                    t_clip=None, mxu_g_ref=None, width: int = 0):
    """Closest triangle hit via the whole-tile BVH walk.
    Returns (best_t, best_n (3-tuple), best_mat) planes — same contract as
    mega_pallas._closest_tri_clustered's sweep state finish. leaf_size > 0
    unrolls the leaf sweep statically (masked by the runtime count).
    stats=True appends a (nodes, leaves, prims) i32 scalar visit-count
    tuple to the return (profiling only; tools/probe_bvh.py).
    cluster_rows > 0 (cfg.pallas_bvh_rows; requires leaf_size > 0)
    predicates each leaf's vector sweep per row-cluster.

    t_clip (optional per-lane plane): an EXTERNAL closest-hit bound —
    the sphere pass's best t (mega_pallas runs spheres first). Nodes
    entering at tn >= t_clip cannot contain the scene's nearest hit, so
    they prune exactly like the walk's own live caps. Bit-safe for the
    combined result: _combine_nearest takes the triangle only on STRICT
    t_tri < t_sph, and any pruned triangle has t >= its node's tn >=
    t_clip. (The returned best-TRI t may read MISS where an uncompetitive
    triangle hit was pruned — only the combined nearest is contractual.)"""
    inv = tuple(1.0 / d[c] for c in range(3))
    state = _tri_closest_state(o)
    if stats:
        state.update(_nodes=jnp.int32(0), _leaves=jnp.int32(0),
                     _prims=jnp.int32(0))

    if mxu_g_ref is not None:
        # cfg.pallas_mxu_leaf: MXU all-pairs leaf tests (numerically
        # different at grazing rays — see _make_mxu_leaf_fn). Its leaf_fn
        # takes (first, count, st) only, so the cluster-predication
        # leaf_want path (cluster_rows > 0) cannot combine with it — the
        # all-pairs matmul has no per-row-cluster gate to predicate anyway.
        assert leaf_size > 0, "pallas_mxu_leaf needs an unrolled leaf cap"
        leaf_fn = _make_mxu_leaf_fn(o, d, mxu_g_ref, leaf_size)
        cluster_rows = 0
    else:
        leaf_fn = _sweep_leaf_fn(tris, o, d, _tri_closest_body, leaf_size,
                                 cluster_rows)
    cap = ((lambda st: st["t"]) if t_clip is None
           else (lambda st: jnp.minimum(st["t"], t_clip)))
    st = _bvh_walk(nodes, o, inv,
                   vote=lambda st: mask, t_cap=cap,
                   leaf_fn=leaf_fn, state=state,
                   leaf_want=cluster_rows > 0, width=width)
    out = st["t"], (st["nx"], st["ny"], st["nz"]), st["mat"]
    if stats:
        out = out + ((st["_nodes"], st["_leaves"], st["_prims"]),)
    return out


def _sweep_leaf_fn(tris, o, d, prim_body, leaf_size: int, cluster_rows: int):
    """leaf_fn over a triangle-record view: cluster-predicated when
    cluster_rows > 0, else the plain (unrolled / dynamic-trip) sweep.
    Shared by the single-table and chunked walks."""
    record = lambda ti: _tri_record(tris, ti)
    if cluster_rows > 0:
        assert leaf_size > 0, "pallas_bvh_rows requires an unrolled leaf"
        return _make_clustered_leaf_fn(o, d, record, prim_body,
                                       leaf_size, cluster_rows)
    return _make_leaf_fn(
        lambda first, count, i, st:
            prim_body(o, d, record(first + i), i < count, st),
        leaf_size)


def _make_leaf_fn(tri_body, leaf_size: int):
    """leaf_size > 0: fully-unrolled masked sweep (median-split leaves are
    almost all full, and the unroll pipelines the scalar loads); 0: a
    dynamic-trip fori_loop."""
    def body(first, count, i, st):
        # merge so profiling counters (and any other carried keys) survive
        # bodies that rebuild only their own fields
        return {**st, **tri_body(first, count, i, st)}

    if leaf_size > 0:
        def leaf_fn(first, count, st):
            for i in range(leaf_size):
                st = body(first, count, jnp.int32(i), st)
            return st
    else:
        def leaf_fn(first, count, st):
            return jax.lax.fori_loop(
                0, count,
                lambda i, st: body(first, count, i, st), st)
    return leaf_fn


def tri_shadow_bvh(nodes, tris, o, d, t_max, mask, leaf_size: int = 0,
                   cluster_rows: int = 0, width: int = 0):
    """Any-hit occlusion via the whole-tile BVH walk: triangles occlude
    fully (ref: mega_kernel.wgsl:540-562). Returns a bool plane."""
    inv = tuple(1.0 / d[c] for c in range(3))
    state = {"occ": jnp.zeros_like(o[0], jnp.int32), "tm": t_max}

    leaf_fn = _sweep_leaf_fn(tris, o, d, _tri_shadow_body, leaf_size,
                             cluster_rows)

    # already-occluded lanes drop out of the vote; fully-dark tiles pop
    # the remaining stack at ~1 box test per node
    st = _bvh_walk(nodes, o, inv,
                   vote=lambda st: mask & ~(st["occ"] > 0),
                   t_cap=lambda st: st["tm"],
                   leaf_fn=leaf_fn, state=state,
                   leaf_want=cluster_rows > 0, width=width)
    return st["occ"] > 0


def _sphere_record(sphs: _PackedTable, si):
    """One sphere's scalars from the packed table (dynamic record si)."""
    rc = sphs.record(si)
    c = tuple(sphs.field(rc, k) for k in range(3))
    r = sphs.field(rc, 3)
    mat = sphs.field(rc, 4).astype(jnp.int32)
    mtype = sphs.field(rc, 5)
    ior = sphs.field(rc, 6)
    return c, r, mat, mtype, ior


def _make_sphere_closest_body(sphs, o, d, a):
    """(first, count, i, st) closest-hit sphere update over a record view
    — ONE definition shared by the single-table and chunked walks."""
    inv_a = 1.0 / a

    def sph_body(first, count, i, st):
        c, r, mat, _, _ = _sphere_record(sphs, first + i)
        oc = (o[0] - c[0], o[1] - c[1], o[2] - c[2])
        half_b = s.vdot(oc, d)
        cc = s.vdot(oc, oc) - r * r
        disc = half_b * half_b - a * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-half_b - sq) * inv_a
        t = jnp.where((disc > 0.0) & (t > 0.0) & (r > 0.0) & (i < count),
                      t, MISS)
        better = t < st["t"]
        return {
            "t": jnp.where(better, t, st["t"]),
            "cx": jnp.where(better, c[0], st["cx"]),
            "cy": jnp.where(better, c[1], st["cy"]),
            "cz": jnp.where(better, c[2], st["cz"]),
            "mat": jnp.where(better, mat, st["mat"]),
        }

    return sph_body


def _make_sphere_shadow_body(sphs, o, d, t_max, lam, a):
    """(first, count, i, st) Fresnel shadow-factor update (shared; ref:
    mega_kernel.wgsl:511-538 — dielectrics transmit (1-R1)(1-R2))."""
    inv_a = 1.0 / a
    cauchy = jnp.float32(DISPERSION_B) / ((lam * 1e-3) * (lam * 1e-3))

    def sph_body(first, count, i, st):
        c, r, _, mtype, ior = _sphere_record(sphs, first + i)
        cb = s.vbroadcast(c, o[0])
        oc = s.vsub(o, cb)
        half_b = s.vdot(oc, d)
        cc = s.vdot(oc, oc) - r * r
        disc = half_b * half_b - a * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-half_b - sq) * inv_a
        t1 = (-half_b + sq) * inv_a
        overlap = ((disc > 0.0) & (t1 > 0.0) & (t0 < t_max) & (r > 0.0)
                   & (i < count))
        t_entry = jnp.maximum(t0, 0.0)
        t_exit = jnp.minimum(t1, t_max)
        segment = t_entry < t_exit
        eta = ior + cauchy
        p1 = s.vadd(o, s.vscale(d, t_entry))
        n1 = s.vnormalize(s.vsub(p1, cb), eps=1e-30)
        R1 = fr_dielectric(-s.vdot(n1, d), eta)
        p2 = s.vadd(o, s.vscale(d, t_exit))
        n2 = s.vnormalize(s.vsub(p2, cb), eps=1e-30)
        R2 = fr_dielectric(-s.vdot(n2, d), eta)
        diel = jnp.where(segment, (1.0 - R1) * (1.0 - R2), 1.0)
        f = jnp.where(mtype == 1.0, diel, jnp.zeros_like(diel))
        return {"atten": st["atten"] * jnp.where(overlap, f, 1.0)}

    return sph_body


def closest_sphere_bvh(nodes, sphs, o, d, a, mask, state,
                       leaf_size: int = 0, width: int = 0):
    """Closest sphere hit via the whole-tile BVH walk, continuing from
    `state` = (best_t, best_c 3-tuple, best_mat) — the static 'always'
    sweep's result (same contract as mega_pallas._sweep_spheres_static).
    Guard records (r == 0) never pass the valid test."""
    inv = tuple(1.0 / d[c] for c in range(3))
    best_t, best_c, best_mat = state
    st = {"t": best_t, "cx": best_c[0], "cy": best_c[1], "cz": best_c[2],
          "mat": best_mat}

    leaf_fn = _make_leaf_fn(_make_sphere_closest_body(sphs, o, d, a),
                            leaf_size)
    st = _bvh_walk(nodes, o, inv,
                   vote=lambda st: mask, t_cap=lambda st: st["t"],
                   leaf_fn=leaf_fn, state=st, width=width)
    return st["t"], (st["cx"], st["cy"], st["cz"]), st["mat"]


def sphere_shadow_bvh(nodes, sphs, o, d, t_max, lam, a, mask, atten,
                      leaf_size: int = 0, width: int = 0):
    """Shadow-factor walk (ref: mega_kernel.wgsl:511-538): dielectric
    spheres transmit (1-R1)(1-R2) Fresnel, everything else occludes fully.
    Continues from `atten` (the static 'always' sweep); material types are
    runtime scalars, so both factors are computed and selected (cf.
    mega_pallas._shadow_dyn)."""
    inv = tuple(1.0 / d[c] for c in range(3))
    st = {"atten": atten}

    leaf_fn = _make_leaf_fn(
        _make_sphere_shadow_body(sphs, o, d, t_max, lam, a), leaf_size)
    st = _bvh_walk(nodes, o, inv,
                   vote=lambda st: mask & (st["atten"] > 0.0),
                   t_cap=lambda st: t_max,
                   leaf_fn=leaf_fn, state=st, width=width)
    return st["atten"]


# ----- chunked (any-size) triangle BVH: HBM slabs streamed per tile -----
#
# The single-table walk above is SMEM-resident, capping fused meshes at
# MAX_BVH_TRIS. Chunked mode removes the cap with a two-level scheme that
# maps the memory hierarchy the TPU way (software-managed tiers):
#
#   * host: a COARSE BVH (max_prims = chunk size) partitions the mesh into
#     contiguous chunks; each chunk gets its own sub-BVH and is packed into
#     a fixed-stride slab of the SAME record layout as pack_tables. All
#     slabs live in ONE HBM tensor; only the tiny top tree (coarse nodes)
#     is SMEM-resident.
#   * device, phase 1: walk the top tree (ordered near-to-far), appending
#     every voted chunk's top-leaf node index to an SMEM worklist — the
#     list comes out roughly front-to-back.
#   * device, phase 2: for each worklist entry, RE-vote the chunk's box
#     against the CURRENT per-lane t caps (phase 1 could not tighten them;
#     front-to-back order means earlier chunks' hits prune later chunks),
#     then DMA its slab HBM->SMEM scratch and run the normal inner walk
#     over the scratch views.
#
# Leaf sweeps dominate walk cost 14-34x over node tests (measured,
# docs/DESIGN.md), so the top-walk + DMA overhead is noise; per-chunk
# pruning quality is what matters, hence the re-vote.
#
# The reference keeps its whole mesh + BVH in GPU storage buffers and
# walks per thread (ref: src/kernels/mega_kernel.wgsl:395-428,
# src/instance.rs:175-310); this is the whole-tile, tiered-memory
# equivalent with no mesh-size cap.


def build_chunked_tri_tables(triangles, chunk_tris: int, leaf_size: int,
                             sah: bool = False, width: int = 0):
    """Host: (top_tab, slabs, meta) for the chunked triangle walk.

    top_tab: packed SMEM table of the coarse tree's nodes; a leaf's
    `first` field is rewritten to its CHUNK ORDINAL (slab index) and
    `count` to the chunk's triangle count.
    slabs: (n_chunks * rows_pc, 128) f32 — chunk c's slab is rows
    [c*rows_pc, (c+1)*rows_pc): triangle records of the chunk in its
    sub-BVH leaf order (padded to chunk_cap records), then the sub-BVH
    node records (chunk-local indices, padded to max_nodes), then
    leaf_size zero guard records (see pack_tables).
    meta: dict(chunk_cap, rows_pc, n_chunks) — chunk_cap is the static
    node-record base inside every slab.
    """
    a = np.asarray([t.a for t in triangles], np.float32).reshape(-1, 3)
    e1 = np.asarray([t.e1 for t in triangles], np.float32).reshape(-1, 3)
    e2 = np.asarray([t.e2 for t in triangles], np.float32).reshape(-1, 3)
    v1, v2 = a + e1, a + e2
    tri_min = np.minimum(a, np.minimum(v1, v2))
    tri_max = np.maximum(a, np.maximum(v1, v2))
    return _build_chunked(triangles, tri_min, tri_max, build_tri_bvh_tables,
                          chunk_tris, leaf_size, sah, width)


def build_chunked_sphere_tables(spheres, chunk_sph: int, leaf_size: int,
                                sah: bool = False, width: int = 0):
    """Host: (top_tab, slabs, meta) for the chunked SPHERE walk — same
    scheme as the triangle builder over the (non-huge) sphere records of
    build_sphere_bvh_tables (guard rows have r == 0, so over-read sweeps
    never hit)."""
    c = np.asarray([sp.c for sp in spheres], np.float32).reshape(-1, 3)
    r = np.asarray([sp.r for sp in spheres], np.float32).reshape(-1, 1)
    return _build_chunked(spheres, c - r, c + r, build_sphere_bvh_tables,
                          chunk_sph, leaf_size, sah, width)


def _build_chunked(prims, pmin, pmax, sub_builder, chunk_prims: int,
                   leaf_size: int, sah: bool = False, width: int = 0):
    """Shared chunked-table builder: coarse tree over (pmin, pmax),
    per-chunk sub tables via sub_builder(prims_subset, leaf_size).
    The COARSE tree stays median-split even under sah: its leaves are the
    chunks, and median halving keeps every chunk near chunk_prims full so
    the uniform slab stride (and each DMA) isn't sized by one outlier.
    width >= 3 applies the wide collapse to BOTH the top tree and every
    chunk's sub-BVH (build_tri_bvh_tables)."""
    from tpurt.accel import build_bvh

    coarse = build_bvh(pmin, pmax, max_prims=max(1, int(chunk_prims)))
    _assert_stack_fits(coarse)

    # chunks = coarse leaves, ordinal by ascending `first` (contiguous
    # ranges of coarse.order)
    leaf_nodes = np.flatnonzero(np.asarray(coarse.count) > 0)
    leaf_nodes = leaf_nodes[np.argsort(np.asarray(coarse.first)[leaf_nodes],
                                       kind="stable")]
    n_chunks = len(leaf_nodes)
    chunk_cap = int(max(1, chunk_prims))

    # build every chunk's sub-BVH first to size the uniform slab stride
    subs = []
    max_nodes = 1
    for node in leaf_nodes:
        first = int(coarse.first[node])
        cnt = int(coarse.count[node])
        tidx = [int(coarse.order[i]) for i in range(first, first + cnt)]
        sub_tab, sub_f, sub_i = sub_builder(
            [prims[i] for i in tidx], leaf_size, sah, width)
        subs.append((sub_tab, sub_f, sub_i))
        max_nodes = max(max_nodes, sub_f.shape[0])

    guard = max(16, int(leaf_size))
    recs_per_slab = chunk_cap + max_nodes + guard
    rows_pc = (recs_per_slab + 7) // 8
    slabs = np.zeros((n_chunks * rows_pc * 8, 16), np.float32)
    for c, (sub_tab, sub_f, sub_i) in enumerate(subs):
        base = c * rows_pc * 8
        slabs[base:base + sub_tab.shape[0]] = sub_tab
        nrec = np.zeros((sub_f.shape[0], 16), np.float32)
        nrec[:, 0:6] = sub_f[:, 0:6]
        nrec[:, 6:6 + sub_i.shape[1]] = sub_i.astype(np.float32)
        slabs[base + chunk_cap:base + chunk_cap + nrec.shape[0]] = nrec
    slabs = slabs.reshape(n_chunks * rows_pc, 128)

    # top table: coarse nodes with leaf first -> chunk ordinal. Under the
    # wide collapse node IDs change but leaves (and their `first` values,
    # unique per leaf) carry over verbatim, so the rewrite keys on first.
    node_f, node_i = _pack_nodes(coarse, width)
    first_to_ord = {int(coarse.first[n]): c
                    for c, n in enumerate(leaf_nodes)}
    # column 2 is `first` in BOTH layouts ([l r first count] / [c0 c1
    # first count c2..c7]); column 3 is `count`
    for row in range(node_i.shape[0]):
        if node_i[row, 3] > 0:
            node_i[row, 2] = first_to_ord[int(node_i[row, 2])]
    top_tab = pack_tables(np.zeros((0, 16), np.float32), node_f, node_i)

    # per-chunk AABBs in ordinal order (wavefront global ray reordering:
    # wf_chunk_sort keys each pool slot by its nearest-entry chunk)
    boxes = np.concatenate([np.asarray(coarse.bbox_min)[leaf_nodes],
                            np.asarray(coarse.bbox_max)[leaf_nodes]],
                           axis=1).astype(np.float32)
    meta = dict(chunk_cap=chunk_cap, rows_pc=int(rows_pc),
                n_chunks=int(n_chunks), boxes=boxes)
    return top_tab, slabs, meta


def _chunked_walk(top_nodes, chunk_ref, scratch, o, d, vote, t_cap,
                  leaf_fn_over, state, chunk_cap: int, rows_pc: int,
                  n_chunks: int, prefetch: bool = False,
                  leaf_want: bool = False, kind_tag: int = 0,
                  t_cap0=None, stats=None, width: int = 0):
    """Two-phase chunked walk (see module comment). leaf_fn_over(tris_view)
    builds the inner leaf sweep over the scratch slab's triangle view.
    `scratch` = (smem_ref, sem, res) direct route or (smem_ref,
    vmem_ref, sem, sem2, res) staged route (CHUNK_DMA_VIA_VMEM), where
    `res` is the MANDATORY resident-slab tag cell; build and initialize
    the tuple via mega_pallas.chunk_scratch_shapes /
    chunk_scratch_reset, not by hand. Returns the final state.

    kind_tag disambiguates the primitive kind sharing the scratch slab
    (0 = triangles, 1 = spheres): the resident tag is cid * 2 + kind_tag,
    so a sphere chunk never masquerades as the triangle chunk of the same
    ordinal.  t_cap0 (optional per-lane plane) bounds the PHASE-1 top
    walk: shadow rays know t_max up front, so chunks entirely beyond the
    light never enter the worklist (closest-hit walks start unbounded
    and pass None).  stats=(stats_ref, base) accumulates diagnostics into
    the SMEM scalar cells stats_ref[base] += worklist length and
    stats_ref[base+1] += chunks actually swept (re-vote survivors) —
    cfg.count_walk_stats instrumentation, docs/DESIGN.md."""
    if CHUNK_DMA_VIA_VMEM:
        scratch_ref, vmem_ref, sem, sem2, res_ref = scratch
    else:
        (scratch_ref, sem, res_ref), vmem_ref, sem2 = scratch, None, None
    inv = tuple(1.0 / d[c] for c in range(3))
    far = jnp.full_like(o[0], MISS)
    nodes_v = _PackedTable(scratch_ref, base0=chunk_cap)
    leaf_fn = leaf_fn_over(_PackedTable(scratch_ref, 0))

    def run(wl_ref, stack_ref):
        # slot 0 pre-seeded with the top ROOT id: an empty worklist's
        # clamped prefetch lookahead then reads a valid record instead of
        # uninitialized SMEM (the chunk-id clip already bounds the DMA)
        wl_ref[0] = jnp.int32(0)

        # phase 1: worklist of voted chunks, near-to-far. No t caps yet
        # (phase 2 re-votes with live caps), so prune on boxes only.
        def note(node, first, count, st):
            wl_ref[st["_wl"]] = node
            return dict(st, _wl=st["_wl"] + 1)

        st1 = _bvh_walk(top_nodes, o, inv,
                        vote=lambda st: vote(state),
                        t_cap=(lambda st: far) if t_cap0 is None
                        else (lambda st: t_cap0),
                        leaf_fn=note, state={"_wl": jnp.int32(0)},
                        leaf_node=True, stack_ref=stack_ref, width=width)

        if stats is not None:
            st_ref, st_base = stats
            st_ref[st_base] = st_ref[st_base] + \
                st1["_wl"].astype(jnp.float32)

        # phase 2: re-vote each chunk against the LIVE caps, DMA, walk.
        # The non-prefetch DMA is GATED with pl.when (resident-slab skip
        # below): an early lax.cond-wrapped DMA faulted Mosaic, but a
        # pl.when region around start/wait works — the later resident-tag
        # change revalidated conditional DMAs with the supported predicate
        # form. The prefetch pipeline keeps its copies unconditional (its
        # start/wait counts must balance). Destinations are sliced to THIS
        # kind's stride — the scratch is shared across chunked primitive
        # kinds and sized to the largest stride
        # (mega_pallas.chunk_scratch_shapes).
        n_found = st1["_wl"]
        dst = scratch_ref.at[pl.ds(0, rows_pc)]

        def entry_cid(i):
            # clip: reads past the worklist (prefetch lookahead, empty
            # list) stay in [0, n_chunks) so every DMA is in-bounds
            nid = wl_ref[jnp.minimum(i, jnp.maximum(n_found - 1, 0))]
            rc = top_nodes.record(nid)
            cid = top_nodes.field(rc, 8).astype(jnp.int32)
            return jnp.clip(cid, 0, n_chunks - 1)

        def hbm_to_vmem(i):
            src = chunk_ref.at[pl.ds(entry_cid(i) * rows_pc, rows_pc)]
            bounce = vmem_ref.at[pl.ds(0, rows_pc)]
            return pltpu.make_async_copy(src, bounce, sem)

        # prefetch (cfg.pallas_chunk_prefetch): overlap the NEXT
        # worklist entry's HBM -> VMEM read with the current chunk's SMEM
        # sweep. Start/wait counts balance even for an empty worklist:
        # 1 warmup start + n in-loop starts vs n in-loop waits + 1 drain.
        pf = CHUNK_DMA_VIA_VMEM and prefetch
        if pf:
            hbm_to_vmem(jnp.int32(0)).start()

        def body(i, st):
            nid = wl_ref[i]
            rc = top_nodes.record(nid)
            tn, tf = _node_box_entry(top_nodes, nid, o, inv)
            want = vote(st) & ~((tn > tf) | (tf <= 0.0) | (tn >= t_cap(st)))
            tag = entry_cid(i) * 2 + kind_tag
            if pf:
                hbm_to_vmem(i).wait()
                bounce = vmem_ref.at[pl.ds(0, rows_pc)]
                dma2 = pltpu.make_async_copy(bounce, dst, sem2)
                dma2.start()
                dma2.wait()
                res_ref[0] = tag        # keep the resident invariant
                # bounce is free again — overlap the next slab's HBM read
                # with this chunk's sweep
                hbm_to_vmem(i + 1).start()
            else:
                # resident-slab skip: consecutive walks of a tile (closest
                # hit, then the bounce's shadow sweep, then the next
                # bounce) mostly revisit the SAME front chunk, and the
                # serialized DMA waits — not HBM bandwidth — were the
                # measured cost of chunked mode. Only load when some lane
                # wants the chunk AND the scratch holds a different slab.
                need = jnp.any(want) & (res_ref[0] != tag)

                @pl.when(need)
                def _load():
                    src = chunk_ref.at[pl.ds(entry_cid(i) * rows_pc,
                                             rows_pc)]
                    if CHUNK_DMA_VIA_VMEM:
                        bounce = vmem_ref.at[pl.ds(0, rows_pc)]
                        dma = pltpu.make_async_copy(src, bounce, sem)
                        dma.start()
                        dma.wait()
                        dma2 = pltpu.make_async_copy(bounce, dst, sem2)
                        dma2.start()
                        dma2.wait()
                    else:
                        dma = pltpu.make_async_copy(src, dst, sem)
                        dma.start()
                        dma.wait()
                    res_ref[0] = tag

            any_want = jnp.any(want)
            if stats is not None:
                st_ref, st_base = stats
                st_ref[st_base + 1] = st_ref[st_base + 1] + \
                    jnp.where(any_want, jnp.float32(1.0), jnp.float32(0.0))

            def sweep(st):
                return _bvh_walk(nodes_v, o, inv, vote, t_cap, leaf_fn, st,
                                 leaf_want=leaf_want, stack_ref=stack_ref,
                                 width=width)

            return jax.lax.cond(any_want, sweep, lambda s_: s_, st)

        out = jax.lax.fori_loop(0, n_found, body, state)
        if pf:
            hbm_to_vmem(n_found).wait()  # drain the outstanding lookahead
        return out

    return pl.run_scoped(run, pltpu.SMEM((max(n_chunks, 1),), jnp.int32),
                         pltpu.SMEM((STACK_DEPTH,), jnp.int32))


def _chunked_walk_interleaved(top_nodes, chunk_ref, scratch, o, d, vote,
                              t_cap, leaf_fn_over, state, chunk_cap: int,
                              rows_pc: int, n_chunks: int,
                              kind_tag: int = 0, leaf_want: bool = False,
                              width: int = 0):
    """Single-phase chunked walk: the chunk DMA + sub-BVH sweep happen AT
    the top tree's leaves, inside ONE ordered near-to-far descent under
    the LIVE per-lane t-caps.  The two-phase walk (_chunked_walk) runs
    its phase-1 top walk capless — every box-overlapping chunk enters
    the worklist and is DMA'd + swept even when the nearest chunk's hits
    would have pruned it — whereas here chunk k's sweep tightens the
    caps BEFORE the walk decides whether to descend into chunk k+1's
    subtree at all: far chunks are never voted, never DMA'd, never
    swept.  (Same record layouts; the two-phase form remains for the
    prefetch pipeline, which needs the explicit worklist to look ahead.)

    The resident-slab tag (kind_tag, see _chunked_walk) still skips the
    DMA when consecutive walks of a tile revisit the same chunk."""
    if CHUNK_DMA_VIA_VMEM:
        scratch_ref, vmem_ref, sem, sem2, res_ref = scratch
    else:
        (scratch_ref, sem, res_ref), vmem_ref, sem2 = scratch, None, None
    inv = tuple(1.0 / d[c] for c in range(3))
    nodes_v = _PackedTable(scratch_ref, base0=chunk_cap)
    leaf_fn = leaf_fn_over(_PackedTable(scratch_ref, 0))
    dst = scratch_ref.at[pl.ds(0, rows_pc)]

    def run(top_stack, sub_stack):
        def chunk_leaf(node, first, count, st):
            rc = top_nodes.record(node)
            cid = jnp.clip(top_nodes.field(rc, 8).astype(jnp.int32),
                           0, n_chunks - 1)
            tag = cid * 2 + kind_tag

            @pl.when(res_ref[0] != tag)
            def _load():
                src = chunk_ref.at[pl.ds(cid * rows_pc, rows_pc)]
                if CHUNK_DMA_VIA_VMEM:
                    bounce = vmem_ref.at[pl.ds(0, rows_pc)]
                    dma = pltpu.make_async_copy(src, bounce, sem)
                    dma.start()
                    dma.wait()
                    dma2 = pltpu.make_async_copy(bounce, dst, sem2)
                    dma2.start()
                    dma2.wait()
                else:
                    dma = pltpu.make_async_copy(src, dst, sem)
                    dma.start()
                    dma.wait()
                res_ref[0] = tag

            return _bvh_walk(nodes_v, o, inv, vote, t_cap, leaf_fn, st,
                             leaf_want=leaf_want, stack_ref=sub_stack,
                             width=width)

        return _bvh_walk(top_nodes, o, inv, vote, t_cap, chunk_leaf,
                         state, leaf_node=True, stack_ref=top_stack,
                         width=width)

    return pl.run_scoped(run, pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                         pltpu.SMEM((STACK_DEPTH,), jnp.int32))


def closest_tri_bvh_chunked(top_nodes, chunk_ref, scratch, o, d,
                            mask, chunk_cap: int, rows_pc: int,
                            n_chunks: int, leaf_size: int = 0,
                            cluster_rows: int = 0, prefetch: bool = False,
                            interleave: bool = False, stats=None,
                            t_clip=None, width: int = 0):
    """Chunked closest triangle hit — same contract as closest_tri_bvh
    (incl. the bit-safe external t_clip bound — here it also caps the
    PHASE-1 top walk, so chunks entirely beyond the sphere hit never
    enter the worklist). `scratch` = the chunk-DMA scratch refs (see
    _chunked_walk); stats = optional (smem_ref, base) diagnostic cells
    (two-phase walk only — the interleaved walk has no worklist)."""
    state = _tri_closest_state(o)

    cap = ((lambda st: st["t"]) if t_clip is None
           else (lambda st: jnp.minimum(st["t"], t_clip)))
    kw = dict(vote=lambda st: mask, t_cap=cap,
              leaf_fn_over=lambda tris: _sweep_leaf_fn(
                  tris, o, d, _tri_closest_body, leaf_size, cluster_rows),
              state=state, chunk_cap=chunk_cap, rows_pc=rows_pc,
              n_chunks=n_chunks, leaf_want=cluster_rows > 0, width=width)
    if interleave and not prefetch:
        st = _chunked_walk_interleaved(top_nodes, chunk_ref, scratch,
                                       o, d, **kw)
    else:
        st = _chunked_walk(top_nodes, chunk_ref, scratch, o, d,
                           prefetch=prefetch, stats=stats, t_cap0=t_clip,
                           **kw)
    return st["t"], (st["nx"], st["ny"], st["nz"]), st["mat"]


def tri_shadow_bvh_chunked(top_nodes, chunk_ref, scratch, o, d,
                           t_max, mask, chunk_cap: int, rows_pc: int,
                           n_chunks: int, leaf_size: int = 0,
                           cluster_rows: int = 0, prefetch: bool = False,
                           interleave: bool = False, stats=None,
                           width: int = 0):
    """Chunked any-hit occlusion — same contract as tri_shadow_bvh."""
    state = {"occ": jnp.zeros_like(o[0], jnp.int32), "tm": t_max}

    kw = dict(vote=lambda st: mask & ~(st["occ"] > 0),
              t_cap=lambda st: st["tm"],
              leaf_fn_over=lambda tris: _sweep_leaf_fn(
                  tris, o, d, _tri_shadow_body, leaf_size, cluster_rows),
              state=state, chunk_cap=chunk_cap, rows_pc=rows_pc,
              n_chunks=n_chunks, leaf_want=cluster_rows > 0, width=width)
    if interleave and not prefetch:
        st = _chunked_walk_interleaved(top_nodes, chunk_ref, scratch,
                                       o, d, **kw)
    else:
        st = _chunked_walk(top_nodes, chunk_ref, scratch, o, d,
                           prefetch=prefetch, t_cap0=t_max, stats=stats,
                           **kw)
    return st["occ"] > 0


def closest_sphere_bvh_chunked(top_nodes, chunk_ref, scratch, o, d, a,
                               mask, state, chunk_cap: int, rows_pc: int,
                               n_chunks: int, leaf_size: int = 0,
                               prefetch: bool = False,
                               interleave: bool = False, stats=None,
                               width: int = 0):
    """Chunked closest sphere hit — same contract as closest_sphere_bvh
    (continues from the static 'always' sweep's state)."""
    best_t, best_c, best_mat = state
    st = {"t": best_t, "cx": best_c[0], "cy": best_c[1], "cz": best_c[2],
          "mat": best_mat}

    def leaf_fn_over(sphs):
        return _make_leaf_fn(_make_sphere_closest_body(sphs, o, d, a),
                             leaf_size)

    kw = dict(vote=lambda st: mask, t_cap=lambda st: st["t"],
              leaf_fn_over=leaf_fn_over, state=st, chunk_cap=chunk_cap,
              rows_pc=rows_pc, n_chunks=n_chunks, kind_tag=1, width=width)
    if interleave and not prefetch:
        st = _chunked_walk_interleaved(top_nodes, chunk_ref, scratch,
                                       o, d, **kw)
    else:
        st = _chunked_walk(top_nodes, chunk_ref, scratch, o, d,
                           prefetch=prefetch, stats=stats, **kw)
    return st["t"], (st["cx"], st["cy"], st["cz"]), st["mat"]


def sphere_shadow_bvh_chunked(top_nodes, chunk_ref, scratch, o, d, t_max,
                              lam, a, mask, atten, chunk_cap: int,
                              rows_pc: int, n_chunks: int,
                              leaf_size: int = 0, prefetch: bool = False,
                              interleave: bool = False, stats=None,
                              width: int = 0):
    """Chunked shadow-factor walk — same contract as sphere_shadow_bvh
    (continues from `atten`; ref: mega_kernel.wgsl:511-538)."""
    st = {"atten": atten}

    def leaf_fn_over(sphs):
        return _make_leaf_fn(
            _make_sphere_shadow_body(sphs, o, d, t_max, lam, a), leaf_size)

    kw = dict(vote=lambda st: mask & (st["atten"] > 0.0),
              t_cap=lambda st: t_max,
              leaf_fn_over=leaf_fn_over, state=st, chunk_cap=chunk_cap,
              rows_pc=rows_pc, n_chunks=n_chunks, kind_tag=1, width=width)
    if interleave and not prefetch:
        st = _chunked_walk_interleaved(top_nodes, chunk_ref, scratch,
                                       o, d, **kw)
    else:
        st = _chunked_walk(top_nodes, chunk_ref, scratch, o, d,
                           prefetch=prefetch, t_cap0=t_max, stats=stats,
                           **kw)
    return st["atten"]
