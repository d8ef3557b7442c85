"""Pallas TPU megakernel: the fused per-tile path tracer + photon pass.

This is the hot loop of the renderer (ref: src/kernels/mega_kernel.wgsl:
cs_main :984-1021, recursive_trace :865-982, trace_photon :745-861), built
for the TPU instead of translated from WGSL:

  * One ``pallas_call`` advances the whole frame: grid = pixel tiles, each
    program owns `pallas_lanes` pixels laid out as (R, 128) float32 planes —
    full 8x128 VPU tiles, no (N, 3) padding waste (see tpurt.ops.soa).
  * The ENTIRE bounce loop runs with path state resident in VMEM/registers.
    The XLA path round-trips loop state through HBM every bounce; here HBM
    traffic is one block-in + block-out of the 16 accumulation/vispoint
    planes per tile, double-buffered by the BlockSpec pipeline.
  * **The scene is a compile-time constant** (``freeze_scene``): sphere
    centers, materials and lights bake into the instruction stream, exactly
    like the reference hard-codes its scene at startup (ref: lib.rs:220-447).
    Mosaic then constant-folds aggressively — diffuse occluders skip the
    whole Fresnel transmission chain, padding primitives vanish, and
    point-vs-area light branches resolve at trace time.
  * Vispoints are masked-written straight to the output block inside the
    bounce loop instead of being carried: a while_loop carry is a live
    register for the whole loop, and spilling 13 extra planes is what caps
    the tile size (measured: quadratic slowdown with R before this change).
  * Bounce loops are ``lax.while_loop``s that exit as soon as every lane in
    the tile is dead — the tile-coherent analogue of the reference's
    per-thread ``break`` (wgsl :885,903,981).

RNG draw order matches tpurt.integrate *exactly*, so the kernel and the XLA
integrator produce the same image for the same seed (up to float
reassociation); tests/test_mega_pallas.py asserts this.

Scope: sphere + small-mesh scenes (every benchmark config). Meshes beyond
the SMEM-table budget (BVH territory) fall back to the XLA integrator —
see the dispatch in tpurt.render.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.config import RenderConfig
from tpurt.ops import rng as rngmod
from tpurt.ops import soa as s
from tpurt.ops.bsdf import INV_PI, fr_dielectric
from tpurt.ops.spectra import (
    DISPERSION_B,
    VISIBLE_MIN,
    VISIBLE_RANGE,
    blackbody,
    hero_emission_table,
)

EPS = 1e-5
MISS = np.float32(1e30)  # numpy scalar: kernels can't capture device arrays
_HIT = np.float32(MISS * 0.5)
PHOTON_CONE_COS = 0.707  # ref: mega_kernel.wgsl:103

N_CHANNELS = 16  # rgb_sum 3 | vis_pos 3 | vis_norm 3 | vis_wo 3 | vis_tp 3 | vis_mat 1
# cfg.count_walk_stats diagnostic cells (regen kernel scratch): 0-3 regen
# phase counters, 4-7 chunked-walk worklist/swept pairs, 8-11 cull-tree
# branch-mix pairs (closest visited/taken, shadow visited/taken — the
# roofline's measured cond mix, VERDICT r4 item 4)
N_STAT_CELLS = 12
# channel index bases for the persistent planes
_VPOS, _VNORM, _VWO, _VTP, _VMAT = 3, 6, 9, 12, 15

# Scenes up to cfg.pallas_static_unroll spheres are unrolled into the
# instruction stream (constant folding: diffuse occluders lose their Fresnel
# chains, padding vanishes). Above it, spheres live in an SMEM table swept by
# a fori_loop — same physics, runtime material branches. Tradeoff measured at
# 257 spheres on v5e: unroll = 25s-6min Mosaic compile (contention
# noise, README 'First run') / 66 Mrays/s steady;
# SMEM sweep = seconds of compile / 15 Mrays/s (the loop serializes).
MAX_DYNAMIC_SPHERES = 512  # SMEM table budget (S x 8 f32)
MAX_DYNAMIC_TRIS = 256     # SMEM table budget (T x 16 f32)


def _mask_i32(m):
    # bool mask -> i32 carry (Mosaic while_loops cannot yield i1 vectors)
    return jnp.where(m, jnp.int32(1), jnp.int32(0))


def _mask_f32(m):
    return jnp.where(m, jnp.float32(1.0), jnp.float32(0.0))


# ----- frozen (compile-time) scene -----

@dataclasses.dataclass(frozen=True)
class _FSphere:
    c: tuple        # (cx, cy, cz)
    r: float
    mat: int
    mtype: int      # resolved material type (shadow pass)
    ior: float      # resolved base IOR (shadow pass)


@dataclasses.dataclass(frozen=True)
class _FMaterial:
    color: tuple    # (r, g, b)
    rough: float
    ior: float
    mtype: int


@dataclasses.dataclass(frozen=True)
class _FLight:
    pos: tuple
    hw: float
    color: tuple
    intensity: float
    temp: float
    ltype: int
    normal: tuple   # unit, y <= 0 (ref: light.rs:39-40)
    tangent: tuple  # frame of `normal` (square sampling / cosine emission)
    bitangent: tuple
    cone_axis: tuple      # normalize(origin - pos) (photon emission)
    cone_t: tuple         # frame of cone_axis
    cone_b: tuple


@dataclasses.dataclass(frozen=True)
class _FTriangle:
    a: tuple
    e1: tuple
    e2: tuple
    n: tuple        # unit geometric normal (leaf order, see tpurt.scene)
    mat: int


@dataclasses.dataclass(frozen=True)
class FrozenScene:
    spheres: tuple
    materials: tuple
    lights: tuple
    triangles: tuple = ()


def _np_tangent_frame(n):
    """Host mirror of soa.build_tangent_frame_c (ref: mega_kernel.wgsl:677-681)."""
    n = np.asarray(n, np.float32)
    if abs(float(n[1])) > 0.99999:
        t = np.array([1.0, 0.0, 0.0], np.float32)
    else:
        t = np.array([n[2], 0.0, -n[0]], np.float32)
        t = t / np.sqrt(max(float(t @ t), 1e-30))
    b = np.cross(n, t)
    return tuple(float(x) for x in t), tuple(float(x) for x in b)


def freeze_scene(scene) -> FrozenScene:
    """Concrete Scene pytree -> hashable compile-time constants.

    Must be called OUTSIDE jit (needs concrete values). The reference bakes
    its scene into host code at startup (lib.rs:220-447); we bake it into the
    kernel at compile time — a scene change costs one recompile, exactly like
    the reference costs a rebuild.
    """
    cen = np.asarray(scene.sph_center, np.float32)
    rad = np.asarray(scene.sph_radius, np.float32)
    smat = np.asarray(scene.sph_mat, np.int32)
    smtype = np.asarray(scene.sph_mtype, np.int32)
    sior = np.asarray(scene.sph_ior, np.float32)
    spheres = tuple(
        _FSphere(c=tuple(float(x) for x in cen[i]), r=float(rad[i]),
                 mat=int(smat[i]), mtype=int(smtype[i]), ior=float(sior[i]))
        for i in range(cen.shape[0]) if float(rad[i]) > 0.0
    )
    mc = np.asarray(scene.mat_color, np.float32)
    mr = np.asarray(scene.mat_rough, np.float32)
    mi = np.asarray(scene.mat_ior, np.float32)
    mt = np.asarray(scene.mat_type, np.int32)
    materials = tuple(
        _FMaterial(color=tuple(float(x) for x in mc[i]), rough=float(mr[i]),
                   ior=float(mi[i]), mtype=int(mt[i]))
        for i in range(mc.shape[0])
    )
    lp = np.asarray(scene.light_pos, np.float32)
    lhw = np.asarray(scene.light_hw, np.float32)
    lc = np.asarray(scene.light_color, np.float32)
    li = np.asarray(scene.light_intensity, np.float32)
    lt = np.asarray(scene.light_temp, np.float32)
    lty = np.asarray(scene.light_type, np.int32)
    ln = np.asarray(scene.light_normal, np.float32)
    lights = []
    for j in range(lp.shape[0]):
        normal = tuple(float(x) for x in ln[j])
        tangent, bitangent = _np_tangent_frame(normal)
        pos = tuple(float(x) for x in lp[j])
        axis = -np.asarray(pos, np.float32)
        axis = axis / np.sqrt(max(float(axis @ axis), 1e-30))
        cone_t, cone_b = _np_tangent_frame(axis)
        lights.append(_FLight(
            pos=pos, hw=float(lhw[j]), color=tuple(float(x) for x in lc[j]),
            intensity=float(li[j]), temp=float(lt[j]), ltype=int(lty[j]),
            normal=normal, tangent=tangent, bitangent=bitangent,
            cone_axis=tuple(float(x) for x in axis),
            cone_t=cone_t, cone_b=cone_b,
        ))
    ta = np.asarray(scene.tri_a, np.float32)
    te1 = np.asarray(scene.tri_e1, np.float32)
    te2 = np.asarray(scene.tri_e2, np.float32)
    tn = np.asarray(scene.tri_n, np.float32)
    tm = np.asarray(scene.tri_mat, np.int32)
    tup = lambda v: tuple(float(x) for x in v)
    triangles = tuple(
        _FTriangle(a=tup(ta[i]), e1=tup(te1[i]), e2=tup(te2[i]),
                   n=tup(tn[i]), mat=int(tm[i]))
        for i in range(ta.shape[0])
    )
    return FrozenScene(spheres=spheres, materials=materials,
                       lights=tuple(lights), triangles=triangles)


def supports_scene(scene, cfg=None) -> bool:
    """The Pallas megakernel covers sphere + mesh scenes: primitives unroll
    below cfg.pallas_static_unroll (clustered with AABB culling above
    4x pallas_cluster_size); above it, triangles run the whole-tile dynamic
    BVH walk (kernels/bvh_pallas.py, budget MAX_BVH_TRIS) and spheres the
    SMEM-table sweep (MAX_DYNAMIC budget). Scenes beyond run on XLA."""
    tri_cap = sph_cap = 0
    tri_dyn = MAX_DYNAMIC_TRIS
    sph_dyn = MAX_DYNAMIC_SPHERES
    if cfg is not None:
        tri_cap = sph_cap = cfg.pallas_static_unroll
        if cfg.pallas_bvh:
            from tpurt.kernels.bvh_pallas import MAX_BVH_TRIS
            tri_dyn = MAX_BVH_TRIS
            # chunked mode lifts the cap ONLY where it actually engages
            # (the SAME predicate the dispatch uses): a raised threshold
            # leaves a gap band that must fall back to XLA, not the flat
            # sweep
            if _tri_chunk_engages(scene.num_triangles, cfg):
                tri_dyn = scene.num_triangles
        if cfg.pallas_sphere_bvh:
            from tpurt.kernels.bvh_pallas import (MAX_BVH_SPHERES,
                                                  n_tree_spheres)
            # the BVH/chunk budgets bound the TREE side of the huge-sphere
            # split, not the total (up to MAX_ALWAYS_SPHERES huge spheres
            # sweep flat regardless of count)
            tree = n_tree_spheres(scene.sph_radius)
            if tree <= MAX_BVH_SPHERES or _sph_chunk_engages(tree, cfg):
                sph_dyn = max(sph_dyn, scene.num_spheres)
    return (scene.num_triangles <= max(tri_dyn, tri_cap)
            and scene.num_spheres <= max(sph_dyn, sph_cap))


# ----- component-form integrator pieces (mirror tpurt.integrate) -----

def _sweep_spheres_static(spheres, o, d, a, state):
    """Winner sweep over constant spheres, continuing from `state`
    (best_t, best_center, best_mat) — the unrolled inner loop shared by the
    flat and clustered intersectors (wgsl :342-354)."""
    best_t, best_c, best_mat = state
    inv_a = 1.0 / a  # one reciprocal per lane; multiplies per sphere
    for sp in spheres:
        oc = (o[0] - sp.c[0], o[1] - sp.c[1], o[2] - sp.c[2])
        half_b = s.vdot(oc, d)
        c = s.vdot(oc, oc) - sp.r * sp.r
        disc = half_b * half_b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-half_b - sq) * inv_a
        t = jnp.where((disc > 0.0) & (t > 0.0), t, MISS)
        better = t < best_t
        best_t = jnp.where(better, t, best_t)
        best_c = s.vwhere(better, s.vbroadcast(sp.c, o[0]), best_c)
        best_mat = jnp.where(better, np.int32(sp.mat), best_mat)
    return best_t, best_c, best_mat


def _sphere_state_init(o):
    return (jnp.full_like(o[0], MISS), (jnp.zeros_like(o[0]),) * 3,
            jnp.zeros_like(o[0], jnp.int32))


def _sphere_state_finish(o, d, state):
    best_t, best_c, best_mat = state
    loc = s.vadd(o, s.vscale(d, best_t * 0.9999))
    nrm = s.vnormalize(s.vsub(loc, best_c), eps=1e-30)
    return best_t, loc, nrm, best_mat


def _closest_sphere_static(spheres, o, d):
    """Unrolled winner loop over constant spheres (wgsl :342-354)."""
    a = s.vdot(d, d)
    state = _sweep_spheres_static(spheres, o, d, a, _sphere_state_init(o))
    return _sphere_state_finish(o, d, state)


def _shadow_sweep_static(spheres, o, d, t_max, lam, a, atten):
    """Shadow-factor sweep over constant spheres, continuing from `atten`
    (wgsl :511-538). Static material types let diffuse occluders skip the
    entire Fresnel chain: their factor is just `overlap ? 0 : 1`."""
    inv_a = 1.0 / a
    for sp in spheres:
        cb = s.vbroadcast(sp.c, o[0])
        oc = s.vsub(o, cb)
        half_b = s.vdot(oc, d)
        c = s.vdot(oc, oc) - sp.r * sp.r
        disc = half_b * half_b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-half_b - sq) * inv_a
        t1 = (-half_b + sq) * inv_a
        overlap = (disc > 0.0) & (t1 > 0.0) & (t0 < t_max)
        if sp.mtype != 1:  # diffuse and metal occlude fully
            atten = atten * jnp.where(overlap, 0.0, 1.0)
            continue
        t_entry = jnp.maximum(t0, 0.0)
        t_exit = jnp.minimum(t1, t_max)
        segment = t_entry < t_exit
        eta = sp.ior + jnp.float32(DISPERSION_B) / ((lam * 1e-3) * (lam * 1e-3))
        p1 = s.vadd(o, s.vscale(d, t_entry))
        n1 = s.vnormalize(s.vsub(p1, cb), eps=1e-30)
        R1 = fr_dielectric(-s.vdot(n1, d), eta)
        p2 = s.vadd(o, s.vscale(d, t_exit))
        n2 = s.vnormalize(s.vsub(p2, cb), eps=1e-30)
        R2 = fr_dielectric(-s.vdot(n2, d), eta)
        f = jnp.where(segment, (1.0 - R1) * (1.0 - R2), 1.0)
        atten = atten * jnp.where(overlap, f, 1.0)
    return atten


def _shadow_static(spheres, o, d, t_max, lam):
    a = s.vdot(d, d)
    return _shadow_sweep_static(spheres, o, d, t_max, lam, a,
                                jnp.ones_like(o[0]))


# ----- tile-coherent cull tree (whole-tile BVH traversal) -----
#
# The instanced-scene sweep (e.g. BASELINE config 3: 257 spheres) is the
# one place the megakernel is compute-bound on pure intersection math. A
# per-lane BVH walk is hostile to the (R,128) SIMD model (divergent stacks,
# per-lane gathers), but a TILE-level traversal works with it: primitives
# are median-split (same rule as accel.build_bvh, instance.rs:259-269) into
# a BVH whose every node is a lax.cond — the whole tile descends into a
# node only if SOME relevant lane's ray enters its AABB closer than that
# lane's current best hit (/ shadow t_max). Leaves are unrolled constant
# sweeps. Coherent tiles (camera rays, shadow rays toward one light,
# ground-local bounces) prune whole subtrees; fully incoherent tiles
# degrade to the flat sweep + ~2N/leaf box tests, never worse
# asymptotically. Block-shaped tiles (pallas_block_tiles) keep the votes
# coherent.

class _CullNode(NamedTuple):
    bmin: tuple
    bmax: tuple
    children: tuple   # of _CullNode; () for a leaf
    prims: tuple      # leaf primitives; () for internal nodes


class _CullTree(NamedTuple):
    always: tuple     # swept unconditionally (scene-spanning bounds)
    root: object      # _CullNode or None


def _build_cull_tree(prims, lo, hi, leaf_size: int, always_mask) -> _CullTree:
    """Host-side recursive median split on the longest centroid axis.
    lo/hi: (N, 3) primitive AABBs; always_mask: primitives whose bounds
    span the scene (culling them is useless — sweep flat)."""
    always = tuple(p for p, h in zip(prims, always_mask) if h)
    keep = np.flatnonzero(~np.asarray(always_mask))

    def build(idx):
        bmin = tuple(float(x) for x in lo[idx].min(axis=0))
        bmax = tuple(float(x) for x in hi[idx].max(axis=0))
        if len(idx) <= leaf_size:
            return _CullNode(bmin, bmax, (),
                             tuple(prims[i] for i in idx))
        cen = (lo[idx] + hi[idx]) * 0.5
        ax = int((cen.max(axis=0) - cen.min(axis=0)).argmax())
        order = idx[np.argsort(cen[:, ax], kind="stable")]
        h = len(order) // 2
        return _CullNode(bmin, bmax,
                         (build(order[:h]), build(order[h:])), ())

    root = build(keep) if len(keep) else None
    return _CullTree(always=always, root=root)


def _aabb_entry_exit(bmin, bmax, o, inv):
    """Slab test (wgsl :358-393): per-lane (t_near, t_far) for a constant
    box. Degenerate-direction NaNs fall out as non-hits in the compare."""
    tn = jnp.full_like(o[0], -np.float32(np.inf))
    tf = jnp.full_like(o[0], np.float32(np.inf))
    for c in range(3):
        t0 = (np.float32(bmin[c]) - o[c]) * inv[c]
        t1 = (np.float32(bmax[c]) - o[c]) * inv[c]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return tn, tf


def _tree_leaves(node):
    if node is None:
        return []
    if node.prims:
        return [node]
    return [lf for ch in node.children for lf in _tree_leaves(ch)]


def _tree_sweep(node, o, inv, state, vote, t_cap, leaf_fn, counter=None):
    """Whole-tile conditional sweep over the cull tree's LEAVES (DFS
    order): one lax.cond per leaf box. Measured on the 257-sphere 1080p
    scene, gating the internal nodes too (true nested descent) is ~5%
    SLOWER — the top boxes almost never prune for a whole tile, so their
    conds are pure overhead; all the pruning power is at the leaves.

    vote(state) -> lanes whose result still matters; t_cap(state) ->
    per-lane upper bound on useful entry distance (current best hit /
    shadow range); leaf_fn(prims, state) -> state after the unrolled
    leaf sweep.

    counter = (stats_ref, base): cfg.count_walk_stats branch-mix cells —
    stats_ref[base] += leaf-cond sites visited, stats_ref[base+1] +=
    sweeps actually TAKEN (the measured take-rate that collapses the
    roofline's cond min/max interval into a point estimate; VERDICT r4
    item 4, tpurt/roofline.py cluster_leaf_ops). The writes sit OUTSIDE
    the cond (pred is already a traced scalar), so the counted kernel's
    control flow is unchanged."""
    for leaf in _tree_leaves(node):
        tn, tf = _aabb_entry_exit(leaf.bmin, leaf.bmax, o, inv)
        # negated compares: a NaN slab test (d component exactly 0 with o
        # exactly on the plane -> 0*inf) must vote HIT (conservative — an
        # extra sweep never changes results; a dropped vote can cull a
        # leaf some lane actually hits)
        pred = jnp.any(vote(state) & ~((tn > tf) | (tf <= 0.0)
                                       | (tn >= t_cap(state))))
        if counter is not None:
            ref, base = counter
            ref[base] = ref[base] + jnp.float32(1.0)
            ref[base + 1] = ref[base + 1] + jnp.where(
                pred, jnp.float32(1.0), jnp.float32(0.0))
        state = jax.lax.cond(
            pred,
            lambda st, lf=leaf: leaf_fn(lf.prims, st),
            lambda st: st,
            state)
    return state


def _sphere_cull_tree(spheres, leaf_size: int) -> _CullTree:
    from tpurt.kernels.bvh_pallas import huge_sphere_mask
    c = np.asarray([sp.c for sp in spheres], np.float32).reshape(-1, 3)
    r = np.asarray([sp.r for sp in spheres], np.float32).reshape(-1, 1)
    # THE shared scene-spanning predicate (bvh_pallas.huge_sphere_mask) —
    # an inline copy here would let the static cull tree and the BVH walk
    # drift on which spheres count as "always" for the same scene
    huge = huge_sphere_mask(r[:, 0]) if len(spheres) else np.zeros(0, bool)
    return _build_cull_tree(tuple(spheres), c - r, c + r, leaf_size, huge)


def _cull_tree_node_table(tree: _CullTree):
    """Host: flat node table for the ORDERED walk over the static cull
    tree (cfg.pallas_cluster_ordered) — boxes/topology packed exactly like
    a bvh_pallas SMEM table (leaf `first` = leaf ordinal, `count` = 1);
    primitive data is NOT in the table — leaves stay baked constants
    inside lax.switch branches. Returns (packed (rows, 128) np.f32,
    leaf-prims list in ordinal order)."""
    from tpurt.kernels import bvh_pallas
    nodes_f, nodes_i, leaves = [], [], []

    def rec(n):
        idx = len(nodes_f)
        nodes_f.append(list(n.bmin) + list(n.bmax) + [0.0, 0.0])
        nodes_i.append([0, 0, 0, 0])
        if n.prims:
            nodes_i[idx] = [0, 0, len(leaves), 1]
            leaves.append(n.prims)
        else:
            nodes_i[idx][0] = rec(n.children[0])
            nodes_i[idx][1] = rec(n.children[1])
        return idx

    rec(tree.root)
    packed = bvh_pallas.pack_tables(
        np.zeros((0, 16), np.float32), np.asarray(nodes_f, np.float32),
        np.asarray(nodes_i, np.int32), leaf_size=0)
    return packed, leaves


def _closest_sphere_clustered_ordered(tree: _CullTree, leaves, node_ref,
                                      o, d, mask):
    """_closest_sphere_clustered with the leaf visits driven by the
    near-to-far stack walk (bvh_pallas._bvh_walk) instead of fixed DFS
    order: the lax.switch branches are the SAME baked unrolled sweeps,
    but nearer leaves sweep first, so the per-lane t-cap tightens early
    and far leaves prune away (the ordering that measured +40% in the
    all-dynamic walk; docs/DESIGN.md)."""
    from tpurt.kernels import bvh_pallas
    a = s.vdot(d, d)
    state = _sweep_spheres_static(tree.always, o, d, a,
                                  _sphere_state_init(o))
    inv = tuple(1.0 / d[c] for c in range(3))
    nodes = bvh_pallas._PackedTable(node_ref, base0=0)
    branches = [
        (lambda st, prims=prims: _sweep_spheres_static(prims, o, d, a, st))
        for prims in leaves]

    def leaf_fn(first, count, st):
        return jax.lax.switch(first, branches, st)

    st = bvh_pallas._bvh_walk(
        nodes, o, inv, vote=lambda st: mask, t_cap=lambda st: st[0],
        leaf_fn=leaf_fn, state=state)
    return _sphere_state_finish(o, d, st)


def _closest_sphere_clustered(tree: _CullTree, o, d, mask, counter=None):
    a = s.vdot(d, d)
    state = _sweep_spheres_static(tree.always, o, d, a,
                                  _sphere_state_init(o))
    if tree.root is None:
        return _sphere_state_finish(o, d, state)
    inv = tuple(1.0 / d[c] for c in range(3))
    state = _tree_sweep(
        tree.root, o, inv, state,
        vote=lambda st: mask, t_cap=lambda st: st[0],
        leaf_fn=lambda prims, st: _sweep_spheres_static(prims, o, d, a, st),
        counter=counter)
    return _sphere_state_finish(o, d, state)


def _shadow_clustered(tree: _CullTree, o, d, t_max, lam, mask,
                      counter=None):
    a = s.vdot(d, d)
    atten = _shadow_sweep_static(tree.always, o, d, t_max, lam, a,
                                 jnp.ones_like(o[0]))
    if tree.root is None:
        return atten
    inv = tuple(1.0 / d[c] for c in range(3))
    # already-black lanes can't get darker: drop them from the vote
    return _tree_sweep(
        tree.root, o, inv, atten,
        vote=lambda at: mask & (at > 0.0), t_cap=lambda at: t_max,
        leaf_fn=lambda prims, at: _shadow_sweep_static(prims, o, d, t_max,
                                                       lam, a, at),
        counter=counter)


def _closest_sphere_dyn(sph_ref, S, o, d):
    """fori_loop winner sweep over an SMEM sphere table (S, 8) — used above
    the static-unroll budget, where baking every sphere into the
    instruction stream would explode compile time (measured: 257 unrolled
    spheres -> 25s-6min Mosaic compile; this mode -> seconds)."""
    a = s.vdot(d, d)
    inv_a = 1.0 / a

    def body(si, carry):
        best_t, bcx, bcy, bcz, best_mat = carry
        cx, cy, cz = sph_ref[si, 0], sph_ref[si, 1], sph_ref[si, 2]
        r = sph_ref[si, 3]
        oc = (o[0] - cx, o[1] - cy, o[2] - cz)
        half_b = s.vdot(oc, d)
        c = s.vdot(oc, oc) - r * r
        disc = half_b * half_b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-half_b - sq) * inv_a
        t = jnp.where((disc > 0.0) & (t > 0.0) & (r > 0.0), t, MISS)
        better = t < best_t
        best_t = jnp.where(better, t, best_t)
        bcx = jnp.where(better, cx, bcx)
        bcy = jnp.where(better, cy, bcy)
        bcz = jnp.where(better, cz, bcz)
        best_mat = jnp.where(better, sph_ref[si, 4].astype(jnp.int32),
                             best_mat)
        return best_t, bcx, bcy, bcz, best_mat

    z = jnp.zeros_like(o[0])
    best_t, bcx, bcy, bcz, best_mat = jax.lax.fori_loop(
        0, S, body,
        (jnp.full_like(o[0], MISS), z, z, z,
         jnp.zeros_like(o[0], jnp.int32)))
    loc = s.vadd(o, s.vscale(d, best_t * 0.9999))
    nrm = s.vnormalize(s.vsub(loc, (bcx, bcy, bcz)), eps=1e-30)
    return best_t, loc, nrm, best_mat


def _shadow_dyn(sph_ref, S, o, d, t_max, lam):
    """fori_loop shadow sweep over the SMEM sphere table. Material types are
    runtime scalars here, so both the diffuse and dielectric factors are
    computed and selected (the static mode folds this away)."""
    a = s.vdot(d, d)
    inv_a = 1.0 / a
    cauchy = jnp.float32(DISPERSION_B) / ((lam * 1e-3) * (lam * 1e-3))

    def body(si, atten):
        cx, cy, cz = sph_ref[si, 0], sph_ref[si, 1], sph_ref[si, 2]
        r = sph_ref[si, 3]
        mtype = sph_ref[si, 5]
        ior = sph_ref[si, 6]
        cb = s.vbroadcast((cx, cy, cz), o[0])
        oc = s.vsub(o, cb)
        half_b = s.vdot(oc, d)
        c = s.vdot(oc, oc) - r * r
        disc = half_b * half_b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-half_b - sq) * inv_a
        t1 = (-half_b + sq) * inv_a
        overlap = (disc > 0.0) & (t1 > 0.0) & (t0 < t_max) & (r > 0.0)
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
        # only dielectrics (mtype 1) transmit; diffuse and metal occlude
        f = jnp.where(mtype == 1.0, diel, jnp.zeros_like(diel))
        return atten * jnp.where(overlap, f, 1.0)

    return jax.lax.fori_loop(0, S, body, jnp.ones_like(o[0]))


def _sweep_tris_static(tris, o, d, state):
    """Unrolled Moller-Trumbore winner loop over constant triangles,
    continuing from `state` (wgsl :303-338, :395-428 — the brute-force
    equivalent of the BVH walk)."""
    best_t, best_n, best_mat = state
    for tr in tris:
        t, valid = s.triangle_hit_c(o, d, tr.a, tr.e1, tr.e2)
        t = jnp.where(valid, t, MISS)
        better = t < best_t
        best_t = jnp.where(better, t, best_t)
        best_n = s.vwhere(better, s.vbroadcast(tr.n, o[0]), best_n)
        best_mat = jnp.where(better, np.int32(tr.mat), best_mat)
    return best_t, best_n, best_mat


def _tri_state_init(o):
    return (jnp.full_like(o[0], MISS), (jnp.zeros_like(o[0]),) * 3,
            jnp.zeros_like(o[0], jnp.int32))


def _tri_state_finish(o, d, state):
    best_t, best_n, best_mat = state
    # hit point offset along the geometric normal like the reference
    loc = s.vadd(s.vadd(o, s.vscale(best_n, 1e-5)), s.vscale(d, best_t))
    return best_t, loc, best_n, best_mat


def _closest_tri_static(tris, o, d):
    return _tri_state_finish(o, d,
                             _sweep_tris_static(tris, o, d,
                                                _tri_state_init(o)))


def _tri_occ_sweep_static(tris, o, d, t_max, occluded):
    """Binary triangle occlusion (wgsl :540-562: all triangles block)."""
    for tr in tris:
        t, valid = s.triangle_hit_c(o, d, tr.a, tr.e1, tr.e2)
        occluded = occluded | (valid & (t < t_max))
    return occluded


def _tri_shadow_static(tris, o, d, t_max):
    return _tri_occ_sweep_static(tris, o, d, t_max,
                                 jnp.zeros_like(o[0], bool))


# ----- clustered triangle sweep (same tile-coherent cull tree) -----

def _tri_cull_tree(tris, leaf_size: int) -> _CullTree:
    if not tris:
        return _CullTree(always=(), root=None)
    verts = np.asarray(
        [[tr.a,
          [tr.a[c] + tr.e1[c] for c in range(3)],
          [tr.a[c] + tr.e2[c] for c in range(3)]] for tr in tris],
        np.float32)                      # (T, 3 verts, 3)
    lo, hi = verts.min(axis=1), verts.max(axis=1)
    diag = np.linalg.norm(hi - lo, axis=1)
    med = float(np.median(diag))
    huge = diag > max(10.0 * med, 1e-3)  # scene-spanning ground quads etc.
    return _build_cull_tree(tuple(tris), lo, hi, leaf_size, huge)


def _closest_tri_clustered(tree: _CullTree, o, d, mask):
    state = _sweep_tris_static(tree.always, o, d, _tri_state_init(o))
    if tree.root is None:
        return _tri_state_finish(o, d, state)
    inv = tuple(1.0 / d[c] for c in range(3))
    state = _tree_sweep(
        tree.root, o, inv, state,
        vote=lambda st: mask, t_cap=lambda st: st[0],
        leaf_fn=lambda prims, st: _sweep_tris_static(prims, o, d, st))
    return _tri_state_finish(o, d, state)


def _tri_shadow_clustered(tree: _CullTree, o, d, t_max, mask):
    occ = _tri_occ_sweep_static(tree.always, o, d, t_max,
                                jnp.zeros_like(o[0], bool))
    if tree.root is None:
        return occ
    inv = tuple(1.0 / d[c] for c in range(3))
    # the cond carry is an i32 mask, not bool: Mosaic rejects i1 vector
    # carries (see the sphere sweeps' _mask_i32 convention)
    occ_i = _tree_sweep(
        tree.root, o, inv, _mask_i32(occ),
        vote=lambda oc: mask & (oc == 0), t_cap=lambda oc: t_max,
        leaf_fn=lambda prims, oc: _mask_i32(
            _tri_occ_sweep_static(prims, o, d, t_max, oc > 0)))
    return occ_i > 0


def _closest_tri_dyn(tri_ref, T, o, d):
    """fori_loop MT winner sweep over an SMEM triangle table (T, 16):
    ax,ay,az, e1x,e1y,e1z, e2x,e2y,e2z, nx,ny,nz, mat, 0,0,0."""
    def body(ti, carry):
        best_t, bnx, bny, bnz, best_mat = carry
        a = (tri_ref[ti, 0], tri_ref[ti, 1], tri_ref[ti, 2])
        e1 = (tri_ref[ti, 3], tri_ref[ti, 4], tri_ref[ti, 5])
        e2 = (tri_ref[ti, 6], tri_ref[ti, 7], tri_ref[ti, 8])
        t, valid = s.triangle_hit_c(o, d, a, e1, e2)
        t = jnp.where(valid, t, MISS)
        better = t < best_t
        best_t = jnp.where(better, t, best_t)
        bnx = jnp.where(better, tri_ref[ti, 9], bnx)
        bny = jnp.where(better, tri_ref[ti, 10], bny)
        bnz = jnp.where(better, tri_ref[ti, 11], bnz)
        best_mat = jnp.where(better, tri_ref[ti, 12].astype(jnp.int32),
                             best_mat)
        return best_t, bnx, bny, bnz, best_mat

    z = jnp.zeros_like(o[0])
    best_t, bnx, bny, bnz, best_mat = jax.lax.fori_loop(
        0, T, body, (jnp.full_like(o[0], MISS), z, z, z,
                     jnp.zeros_like(o[0], jnp.int32)))
    n = (bnx, bny, bnz)
    loc = s.vadd(s.vadd(o, s.vscale(n, 1e-5)), s.vscale(d, best_t))
    return best_t, loc, n, best_mat


def _tri_shadow_dyn(tri_ref, T, o, d, t_max):
    def body(ti, occ):
        a = (tri_ref[ti, 0], tri_ref[ti, 1], tri_ref[ti, 2])
        e1 = (tri_ref[ti, 3], tri_ref[ti, 4], tri_ref[ti, 5])
        e2 = (tri_ref[ti, 6], tri_ref[ti, 7], tri_ref[ti, 8])
        t, valid = s.triangle_hit_c(o, d, a, e1, e2)
        return jnp.maximum(occ, _mask_i32(valid & (t < t_max)))
    occ = jax.lax.fori_loop(0, T, body, jnp.zeros_like(o[0], jnp.int32))
    return occ > 0


def _combine_nearest(h1, h2):
    """Nearest-of-two winner (ref: mega_kernel.wgsl:874-878)."""
    t1, loc1, n1, m1 = h1
    t2, loc2, n2, m2 = h2
    take2 = t2 < t1
    return (jnp.where(take2, t2, t1),
            s.vwhere(take2, loc2, loc1),
            s.vwhere(take2, n2, n1),
            jnp.where(take2, m2, m1))


def _single_lambda_em_c(lights, lam):
    """Per-light spectral emission at one wavelength, component form
    (ref: mega_kernel.wgsl:574-578): color*intensity*range * blackbody *
    cie_rgb. Returns a flat list of 3*L planes. This is both the C=1
    emission and the hero's post-collapse emission (the dispersive dirac
    continuation keeps FULL weight — only the hero technique can generate
    such a path, cf. pbrt-v4 SampledWavelengths::TerminateSecondary)."""
    cie = s.cie_to_rgb_c(lam)
    out = []
    for lt in lights:
        spd = (blackbody(lam, np.float32(lt.temp))
               if lt.temp > 0.0 else 1.0)
        for c in range(3):
            out.append(np.float32(lt.color[c] * lt.intensity
                                  * VISIBLE_RANGE) * spd * cie[c])
    return out


def _sky_em_c(cfg, lam):
    """Untinted spectral sky emission planes at lam, component form
    (EXTENSION — see integrate.sky_emission_rgb; the reference's sky is
    black, mega_kernel.wgsl:617-620). Same emission form as the lights."""
    cie = s.cie_to_rgb_c(lam)
    spd = (blackbody(lam, np.float32(cfg.sky_temp))
           if cfg.sky_temp > 0.0 else 1.0)
    k = np.float32(cfg.sky_intensity * VISIBLE_RANGE)
    return tuple(k * spd * cie[c] for c in range(3))


def _sky_tint_c(cfg, d):
    """cfg.sky_color as per-channel factors; with cfg.sky_gradient the
    tint lerps white -> (.5,.7,1) by direction height (the legacy
    wavefront ramp, wavefront.wgsl:129-131)."""
    if not cfg.sky_gradient:
        return tuple(np.float32(c) for c in cfg.sky_color)
    dn = s.vnormalize(d, eps=1e-30)
    t = 0.5 * (dn[1] + 1.0)
    return tuple(np.float32(cfg.sky_color[c])
                 * ((1.0 - t) + t * np.float32(g))
                 for c, g in enumerate((0.5, 0.7, 1.0)))


def _flat_em_c(lam):
    """Flat-spectrum emission base at lam (cie * range), component form —
    the lambda-only factor of type-3 emissive materials (the intensity is
    folded into the material color; see scene.Material.emissive)."""
    cie = s.cie_to_rgb_c(lam)
    return tuple(np.float32(VISIBLE_RANGE) * cie[c] for c in range(3))


def _is_emissive_static(materials, mat_id):
    """Per-lane type-3 mask via the same unrolled select chain as
    _material_lookup_static."""
    is_em = jnp.zeros_like(mat_id, bool)
    for m, mat in enumerate(materials):
        if mat.mtype == 3:
            is_em = is_em | (mat_id == m)
    return is_em


def _material_lookup_static(materials, mat_id):
    """Per-lane material attributes via an unrolled constant select chain.
    Returns (color, rough, ior, is_diffuse, is_metal)."""
    zero = jnp.zeros_like(mat_id, jnp.float32)
    cr, cg, cb_, rough, ior = zero, zero, zero, zero, zero
    is_diffuse = jnp.zeros_like(mat_id, bool)
    is_metal = jnp.zeros_like(mat_id, bool)
    for m, mat in enumerate(materials):
        sel = mat_id == m
        cr = jnp.where(sel, np.float32(mat.color[0]), cr)
        cg = jnp.where(sel, np.float32(mat.color[1]), cg)
        cb_ = jnp.where(sel, np.float32(mat.color[2]), cb_)
        rough = jnp.where(sel, np.float32(mat.rough), rough)
        ior = jnp.where(sel, np.float32(mat.ior), ior)
        if mat.mtype == 0:
            is_diffuse = is_diffuse | sel
        elif mat.mtype == 2:
            is_metal = is_metal | sel
    return (cr, cg, cb_), rough, ior, is_diffuse, is_metal


def _schlick_c(cos_t, f0):
    """Schlick Fresnel, component form; f0 vec3 tuple, cos (R,128)."""
    c = jnp.clip(jnp.abs(cos_t), 0.0, 1.0)
    m = 1.0 - c
    w = m * m * m * m * m
    return tuple(f0[i] + (1.0 - f0[i]) * w for i in range(3))


def _scatter_metal_c(wo, normal, f0, alpha, u2a, u2b):
    """GGX conductor scatter (material type 2; see scene.Material.metal).
    Smooth: mirror + Schlick F. Rough: VNDF sample, tp = F * G2/G1.
    Returns (wi, tp (vec3), valid)."""
    cos_t = s.vdot(wo, normal)
    wi_sm = s.reflect_c(wo, normal)
    tp_sm = _schlick_c(cos_t, f0)
    valid_sm = s.vdot(wi_sm, normal) * cos_t > 0.0

    T = s.build_tangent_frame_c(normal)
    B = s.vcross(normal, T)
    wo_l = s.to_local_c(wo, normal, T, B)
    wm = s.tr_sample_wm_c(wo_l, u2a, u2b, alpha)
    wi_l = s.reflect_c(wo_l, wm)
    valid_r = wo_l[2] * wi_l[2] > 0.0
    F = _schlick_c(s.vdot(wo_l, wm), f0)
    G2 = s.tr_g_c(wo_l[2], wi_l[2], alpha)
    G1 = s.tr_g1_c(wo_l[2], alpha)
    w = G2 / jnp.maximum(G1, 1e-10)
    tp_r = s.vscale(F, w)
    wi_rough = s.to_world_c(wi_l, normal, T, B)

    smooth = alpha < 1e-3
    wi = s.vwhere(smooth, wi_sm, wi_rough)
    tp = s.vwhere(smooth, tp_sm, tp_r)
    valid = (smooth & valid_sm) | (~smooth & valid_r)
    return wi, tp, valid


def _scatter_dielectric_c(wo, normal, eta, alpha, u2a, u2b, u_choice, camera_pdf):
    """Component-form mirror of tpurt.integrate._scatter_dielectric
    (ref: mega_kernel.wgsl:914-973 camera, :795-852 photon).

    camera_pdf: True/False selects the camera path's VNDF pdf vs the photon
    path's Lambda+1 approximation statically; a per-lane MASK computes both
    pdf variants (the only terms that differ) and selects — the regenerative
    kernel uses this so mixed camera/photon lanes share one scatter pass."""
    # --- effectively smooth ---
    cos_t = s.vdot(wo, normal)
    R_s = fr_dielectric(jnp.abs(cos_t), eta)
    reflect_s = u_choice < R_s
    wi_refl_s = s.reflect_c(wo, normal)
    wi_refr_s, refr_ok = s.refract_c(wo, normal, eta)
    etap_s = jnp.where(cos_t < 0.0, 1.0 / eta, eta)
    tp_refr_s = 1.0 / (etap_s * etap_s)
    wi_smooth = s.vwhere(reflect_s, wi_refl_s, wi_refr_s)
    tp_smooth = jnp.where(reflect_s, 1.0, tp_refr_s)
    off_smooth = jnp.where(reflect_s, EPS, -EPS)
    valid_smooth = reflect_s | refr_ok

    # --- rough GGX ---
    T = s.build_tangent_frame_c(normal)
    B = s.vcross(normal, T)
    wo_l = s.to_local_c(wo, normal, T, B)
    wm = s.tr_sample_wm_c(wo_l, u2a, u2b, alpha)
    dot_wowm = jnp.abs(s.vdot(wo_l, wm))
    R = fr_dielectric(dot_wowm, eta)
    Tns = 1.0 - R
    choose_reflect = u_choice < R / jnp.maximum(R + Tns, 1e-10)

    D = s.tr_d_c(wm[2], alpha)

    wi_l_refl = s.reflect_c(wo_l, wm)
    refl_ok = wo_l[2] * wi_l_refl[2] > 0.0
    G_r = s.tr_g_c(wo_l[2], wi_l_refl[2], alpha)
    ct_i_r = jnp.abs(wi_l_refl[2])
    ct_o = jnp.abs(wo_l[2])
    bsdf_r = D * G_r * R / jnp.maximum(4.0 * ct_i_r * ct_o, 1e-10)
    static_pdf = isinstance(camera_pdf, bool)
    if (not static_pdf) or camera_pdf:
        G1 = s.tr_g1_c(wo_l[2], alpha)
        pdf_wm = (G1 / jnp.maximum(ct_o, 1e-10)) * D * dot_wowm
        pdf_r_cam = jnp.maximum(pdf_wm / jnp.maximum(4.0 * dot_wowm, 1e-10),
                                1e-10) * (R / jnp.maximum(R + Tns, 1e-10))
    if (not static_pdf) or not camera_pdf:
        pdf_r_ph = s.tr_lambda_c(wo_l[2], alpha) + 1.0
    if static_pdf:
        pdf_r = pdf_r_cam if camera_pdf else pdf_r_ph
    else:
        pdf_r = jnp.where(camera_pdf, pdf_r_cam, pdf_r_ph)
    tp_r = bsdf_r * ct_i_r / jnp.maximum(pdf_r, 1e-10)

    wi_l_refr, refr_l_ok = s.refract_c(wo_l, wm, eta)
    trans_ok = refr_l_ok & ~(wo_l[2] * wi_l_refr[2] > 0.0)
    G_t = s.tr_g_c(wo_l[2], wi_l_refr[2], alpha)
    ct_i_t = jnp.abs(wi_l_refr[2])
    denom = s.vdot(wi_l_refr, wm) + s.vdot(wo_l, wm) / eta
    bsdf_t = Tns * D * G_t * jnp.abs(
        s.vdot(wi_l_refr, wm) * s.vdot(wo_l, wm)
        / jnp.maximum(ct_i_t * ct_o * denom * denom, 1e-10)
    )
    if (not static_pdf) or camera_pdf:
        dwm_dwi = jnp.abs(s.vdot(wi_l_refr, wm)) / jnp.maximum(denom * denom, 1e-10)
        G1 = s.tr_g1_c(wo_l[2], alpha)
        pdf_t_cam = jnp.maximum(
            (G1 / jnp.maximum(ct_o, 1e-10)) * D * dot_wowm * dwm_dwi
            * (Tns / jnp.maximum(R + Tns, 1e-10)),
            1e-10,
        )
    if (not static_pdf) or not camera_pdf:
        pdf_t_ph = s.tr_lambda_c(wo_l[2], alpha) + 1.0
    if static_pdf:
        pdf_t = pdf_t_cam if camera_pdf else pdf_t_ph
    else:
        pdf_t = jnp.where(camera_pdf, pdf_t_cam, pdf_t_ph)
    etap_t = jnp.where(wo_l[2] < 0.0, 1.0 / eta, eta)
    tp_t = bsdf_t * ct_i_t / jnp.maximum(pdf_t, 1e-10) / (etap_t * etap_t)

    wi_l = s.vwhere(choose_reflect, wi_l_refl, wi_l_refr)
    wi_rough = s.to_world_c(wi_l, normal, T, B)
    tp_rough = jnp.where(choose_reflect, tp_r, tp_t)
    off_rough = jnp.where(choose_reflect, EPS, -EPS)
    # boolean algebra instead of select: Mosaic has no i1-vector select
    valid_rough = (choose_reflect & refl_ok) | (~choose_reflect & trans_ok)

    smooth = alpha < 1e-3
    wi = s.vwhere(smooth, wi_smooth, wi_rough)
    tp_mult = jnp.where(smooth, tp_smooth, tp_rough)
    offset = jnp.where(smooth, off_smooth, off_rough)
    valid = (smooth & valid_smooth) | (~smooth & valid_rough)
    return wi, tp_mult, offset, valid


def _evaluate_bsdf_c(wo, wi, n, color, rough, ior_eta, is_diff, is_metal):
    """Photon-gather BSDF (wgsl :725-743): Oren-Nayar diffuse or
    GGX-reflection-only dielectric/metal. ior_eta is the pre-dispersed eta."""
    f_diff = s.oren_nayar_c(wo, wi, n, color, rough)
    ndotv = s.vdot(n, wo)
    ndotl = s.vdot(n, wi)
    refl = ndotv * ndotl > 0.0
    alpha = jnp.sqrt(rough)
    wm = s.vnormalize(s.vadd(wi, wo), eps=1e-30)
    R = fr_dielectric(s.vdot(wo, wm), ior_eta)
    T = s.build_tangent_frame_c(n)
    B = s.vcross(n, T)
    wo_l = s.to_local_c(wo, n, T, B)
    wi_l = s.to_local_c(wi, n, T, B)
    wm_l = s.to_local_c(wm, n, T, B)
    D = s.tr_d_c(wm_l[2], alpha)
    G = s.tr_g_c(wo_l[2], wi_l[2], alpha)
    denom = jnp.maximum(4.0 * jnp.abs(wi_l[2]) * jnp.abs(wo_l[2]), 1e-10)
    spec = jnp.where(refl, D * G * R / denom, 0.0)
    # metal: same lobe, Schlick RGB Fresnel (color = F0)
    F_m = _schlick_c(s.vdot(wo, wm), color)
    dg = jnp.where(refl, D * G / denom, 0.0)
    f_metal = s.vscale(F_m, dg)
    f_spec = s.vwhere(is_metal, f_metal, (spec, spec, spec))
    return s.vwhere(is_diff, f_diff, f_spec)


def _diffuse_scatter_c(wo, n, color, rough, u2a, u2b):
    """Cosine scatter + Oren-Nayar throughput (wgsl :906-912)."""
    rn = s.unit_vec_from_u_c(u2a, u2b)
    wi_d = s.vnormalize(s.vadd(n, rn), eps=1e-30)
    cosw = jnp.maximum(s.vdot(n, wi_d), 1e-10)
    pdf_d = cosw * jnp.float32(INV_PI)
    f_diff = s.oren_nayar_c(s.vnormalize(wo, eps=1e-30), wi_d, n, color, rough)
    tpm_d = s.vscale(f_diff, cosw / jnp.maximum(pdf_d, 1e-10))
    return wi_d, tpm_d


def nee_direct_c(LIGHTS, loc, n, lam, rng, shadow, shadow_mask_fn, emv_fn,
                 z3, mode="all"):
    """THE NEE light loop (wgsl :568-615) shared by every fused kernel body
    (tile-sync camera, regen interleaved, wavefront sweep, wavefront fused
    — the photon walk has no NEE). The bodies differ only in the shadow
    liveness mask and the emission source, injected as closures so each
    caller's ops are emitted exactly where its old inline copy emitted
    them (byte-identical jaxprs were asserted when this was extracted):

      shadow_mask_fn() -> mask plane, re-evaluated per light like the old
        inline `active & found & is_diffuse` chains;
      emv_fn(li) -> (r, g, b) emission for light li, called after that
        light's weight is ready (closures may load refs / select on
        collapse state in place).

    mode (static) = cfg.light_sample: "all" loops every light (reference
    semantics, 2 draws + 1 shadow segment per light); "power"/"spatial"
    delegate to the O(1)-shadow-rays branch below (3 draws + 1 shadow
    segment total).

    Returns (direct, rng): 2 rng draws consumed per light ("all" mode).
    """
    if mode in ("power", "spatial") and LIGHTS:
        return _nee_direct_power_c(LIGHTS, loc, n, lam, rng, shadow,
                                   shadow_mask_fn, emv_fn, z3, mode)
    direct = z3
    for li, lt in enumerate(LIGHTS):
        u1, rng = rngmod.rand_1f(rng)
        u2, rng = rngmod.rand_1f(rng)
        if lt.ltype == 1:
            su = (u1 - 0.5) * np.float32(2.0 * lt.hw)
            sv = (u2 - 0.5) * np.float32(2.0 * lt.hw)
            lp = tuple(
                np.float32(lt.pos[c]) + su * np.float32(lt.tangent[c])
                + sv * np.float32(lt.bitangent[c]) for c in range(3))
        else:
            lp = s.vbroadcast(lt.pos, u1)
        to_light = s.vsub(lp, loc)
        dist = jnp.sqrt(jnp.maximum(s.vdot(to_light, to_light), 1e-30))
        ldir = s.vscale(to_light, 1.0 / dist)
        ndotl = s.vdot(n, ldir)
        live = (dist >= EPS) & (ndotl > 0.0)
        if lt.ltype == 1:
            cos_light = jnp.maximum(
                0.0, -(lt.normal[0] * ldir[0] + lt.normal[1] * ldir[1]
                       + lt.normal[2] * ldir[2]))
            live = live & (cos_light > 0.0) & (lt.hw > 0.0)
            geom = ndotl * cos_light * np.float32(
                max(4.0 * lt.hw * lt.hw, 1e-10))
        else:
            geom = ndotl
        so = s.vadd(loc, s.vscale(n, EPS))
        atten = shadow(so, ldir, dist - EPS, lam, shadow_mask_fn() & live)
        w = jnp.where(live, geom * atten / (dist * dist), 0.0)
        direct = s.vadd(direct, s.vscale(emv_fn(li), w))
    return direct, rng


def _nee_direct_power_c(LIGHTS, loc, n, lam, rng, shadow, shadow_mask_fn,
                        emv_fn, z3, mode):
    """cfg.light_sample == "power"/"spatial" NEE for the fused kernels
    (EXTENSION; twin of integrate._sample_direct_power, same 3-draw
    layout: select uniform, then the 2f light sample). ONE selected
    light per lane, weighted by 1/pmf — one shadow sweep per bounce
    regardless of light count. "spatial" divides each base power by the
    lane's squared distance to the light center (unshadowed-contribution
    heuristic). The base power terms are compile-time constants here
    (frozen scene), traced scalars in the XLA path; the selection
    arithmetic is the same f32 chain either way (ops/sampling). Callers
    count ONE shadow segment per live lane.
    """
    from tpurt.ops.sampling import light_powers, select_from_powers
    u_sel, rng = rngmod.rand_1f(rng)
    powers = light_powers(
        [np.float32(lt.intensity) for lt in LIGHTS],
        [np.float32(lt.hw) for lt in LIGHTS],
        [lt.ltype == 1 for lt in LIGHTS])
    if mode == "spatial":
        sp = []
        for li, lt in enumerate(LIGHTS):
            dx = np.float32(lt.pos[0]) - loc[0]
            dy = np.float32(lt.pos[1]) - loc[1]
            dz = np.float32(lt.pos[2]) - loc[2]
            d2 = dx * dx + dy * dy + dz * dz
            sp.append(powers[li] / jnp.maximum(d2, jnp.float32(1e-4)))
        powers = sp
    sels, inv_pmf = select_from_powers(u_sel, powers)
    u1, rng = rngmod.rand_1f(rng)
    u2, rng = rngmod.rand_1f(rng)

    zero = jnp.zeros_like(u_sel)
    lp, lnorm_sel, emv = z3, z3, z3
    hw_sel, area_sel = zero, zero
    for li, lt in enumerate(LIGHTS):
        if lt.ltype == 1:
            su = (u1 - 0.5) * np.float32(2.0 * lt.hw)
            sv = (u2 - 0.5) * np.float32(2.0 * lt.hw)
            lp_i = tuple(
                np.float32(lt.pos[c]) + su * np.float32(lt.tangent[c])
                + sv * np.float32(lt.bitangent[c]) for c in range(3))
        else:
            lp_i = s.vbroadcast(lt.pos, u_sel)
        m = sels[li]
        lp = s.vwhere(m, lp_i, lp)
        lnorm_sel = s.vwhere(m, s.vbroadcast(lt.normal, u_sel), lnorm_sel)
        hw_sel = jnp.where(m, np.float32(lt.hw), hw_sel)
        area_sel = jnp.where(m, np.float32(1.0 if lt.ltype == 1 else 0.0),
                             area_sel)
        emv = s.vwhere(m, emv_fn(li), emv)

    to_light = s.vsub(lp, loc)
    dist = jnp.sqrt(jnp.maximum(s.vdot(to_light, to_light), 1e-30))
    ldir = s.vscale(to_light, 1.0 / dist)
    ndotl = s.vdot(n, ldir)
    is_area = area_sel > 0.5
    cos_light = jnp.maximum(0.0, -(lnorm_sel[0] * ldir[0]
                                   + lnorm_sel[1] * ldir[1]
                                   + lnorm_sel[2] * ldir[2]))
    live = (dist >= EPS) & (ndotl > 0.0)
    # boolean algebra (Mosaic has no i1-vector select): area lights also
    # require a front-facing sample point and a positive half-width
    live = live & (~is_area | ((cos_light > 0.0) & (hw_sel > 0.0)))
    inv_pdf = jnp.where(is_area,
                        jnp.maximum(4.0 * hw_sel * hw_sel, 1e-10),
                        jnp.float32(1.0))
    geom = ndotl * jnp.where(is_area, cos_light, jnp.float32(1.0))
    so = s.vadd(loc, s.vscale(n, EPS))
    atten = shadow(so, ldir, dist - EPS, lam, shadow_mask_fn() & live)
    w = jnp.where(live,
                  geom * atten * inv_pdf * inv_pmf / (dist * dist), 0.0)
    return s.vscale(emv, w), rng


def scatter_rr_c(cfg, wo, n, loc, color, rough, is_diffuse, is_metal, tp,
                 rng, *, any_dielectric, any_metal, eta_fn, camera_pdf,
                 rr_thresh_fn, strata_fn=None, post_dielectric=None,
                 rr_scale_fn=None):
    """THE scatter-select + Russian-roulette block (wgsl :906-979 camera,
    :782-853 photon) shared by all five fused kernel bodies. Per-site
    variation is injected, each closure emitting its ops exactly where
    the old inline copy emitted them (byte-identical jaxprs were asserted
    when this was extracted):

      eta_fn() -> dielectric eta plane (dispersion rule differs per phase;
        the wavefront kernels compute cauchy here from lam);
      camera_pdf: bool or per-lane plane (regen mixes phases per lane);
      rr_thresh_fn() -> RR threshold (scalar const, or the regen kernel's
        per-lane camera/photon select);
      strata_fn(u2a, u2b, u_choice) -> remapped triple (bounce strata);
      post_dielectric(is_diel) -> arbitrary extra (hero-collapse updates),
        returned as `extra`;
      rr_scale_fn() -> RR survival-probability scale (scalar const, or a
        per-lane camera/photon select) for cfg.photon_rr_scale != 1.0;
        None (the default, and ALWAYS at scale 1.0) emits the reference's
        RR ops unchanged.

    Consumes exactly 4 rng draws. Returns
    (wi, new_tp, new_o, scat_ok, rr_live, rng, extra).
    """
    u2a, rng = rngmod.rand_1f(rng)
    u2b, rng = rngmod.rand_1f(rng)
    u_choice, rng = rngmod.rand_1f(rng)
    u_rr, rng = rngmod.rand_1f(rng)
    if strata_fn is not None:
        u2a, u2b, u_choice = strata_fn(u2a, u2b, u_choice)

    wi_d, tpm_d = _diffuse_scatter_c(wo, n, color, rough, u2a, u2b)
    wi, tpm = wi_d, tpm_d
    off = jnp.full_like(u2a, EPS)
    scat_ok = jnp.ones_like(u2a, bool)
    alpha = jnp.sqrt(rough)
    extra = None
    if any_dielectric:
        wi_s, tpm_s, off_s, valid_s = _scatter_dielectric_c(
            wo, n, eta_fn(), alpha, u2a, u2b, u_choice,
            camera_pdf=camera_pdf)
        is_diel = ~(is_diffuse | is_metal)
        wi = s.vwhere(is_diel, wi_s, wi)
        tpm = s.vwhere(is_diel, (tpm_s, tpm_s, tpm_s), tpm)
        off = jnp.where(is_diel, off_s, off)
        scat_ok = (is_diel & valid_s) | (~is_diel & scat_ok)
        if post_dielectric is not None:
            extra = post_dielectric(is_diel)
    if any_metal:
        wi_m, tpm_m, valid_m = _scatter_metal_c(wo, n, color, alpha,
                                                u2a, u2b)
        wi = s.vwhere(is_metal, wi_m, wi)
        tpm = s.vwhere(is_metal, tpm_m, tpm)
        scat_ok = (is_metal & valid_m) | (~is_metal & scat_ok)

    new_tp = s.vmul(tp, tpm)
    new_o = s.vadd(loc, s.vscale(n, off))
    prob = s.vmax_comp(new_tp)
    if rr_scale_fn is None:
        rr_live = (prob >= rr_thresh_fn()) & (u_rr <= prob)
        new_tp = s.vscale(new_tp, 1.0 / jnp.maximum(prob, 1e-30))
    else:
        # EXTENSION (cfg.photon_rr_scale): extra thinning composed with
        # the reference's RR — survive with min(prob,1)*sc, reweight by
        # 1/(prob*sc); per-bounce expectation equals the reference's for
        # every prob (twin of integrate.scatter_and_rr, see the rationale
        # there). Lanes with sc == 1 (regen camera lanes) reduce exactly
        # to the reference ops: u_rr < 1 makes the min(prob,1) kill
        # equivalent to the unclamped one, and the division is by prob.
        sc = rr_scale_fn()
        p = jnp.minimum(prob, jnp.float32(1.0)) * sc
        rr_live = (prob >= rr_thresh_fn()) & (u_rr <= p)
        new_tp = s.vscale(new_tp, 1.0 / jnp.maximum(prob * sc, 1e-30))
    return wi, new_tp, new_o, scat_ok, rr_live, rng, extra




def _use_tri_bvh(fscene: FrozenScene, cfg: RenderConfig) -> bool:
    from tpurt.kernels.bvh_pallas import MAX_BVH_TRIS
    return (cfg.pallas_bvh
            and cfg.pallas_static_unroll
            < len(fscene.triangles) <= MAX_BVH_TRIS
            and not _use_tri_chunked(fscene, cfg))


def _use_mxu_leaf(fscene: FrozenScene, cfg: RenderConfig) -> bool:
    """cfg.pallas_mxu_leaf engages on the single-table triangle walk only
    (regen kernel; chunked slabs would need a second slab stream)."""
    return cfg.pallas_mxu_leaf and _use_tri_bvh(fscene, cfg)


@functools.lru_cache(maxsize=4)
def _gmat_build_cached(triangles, leaf: int, sah: bool):
    from tpurt.kernels import bvh_pallas
    tri_tab, _, _ = bvh_pallas.build_tri_bvh_tables(triangles, leaf, sah)
    return jnp.asarray(bvh_pallas.build_tri_gmat(tri_tab, leaf))


def _gmat_table(fscene: FrozenScene, cfg: RenderConfig):
    """() or (G,) — the MXU leaf-test matrix (VMEM input; see
    bvh_pallas.build_tri_gmat). Built from the SAME leaf-ordered table as
    the walk's SMEM nodes, so `first` indexes both consistently."""
    if not _use_mxu_leaf(fscene, cfg):
        return ()
    return (_gmat_build_cached(fscene.triangles, cfg.pallas_bvh_leaf,
                               cfg.pallas_bvh_sah),)


def _tri_chunk_engages(n_tris: int, cfg: RenderConfig) -> bool:
    """Count-level chunk-engagement predicate — ONE definition shared by
    the dispatch (_use_tri_chunked) and supports_scene, so the two can
    never drift apart (the gap-band class of bug)."""
    from tpurt.kernels.bvh_pallas import MAX_BVH_TRIS
    thresh = cfg.pallas_bvh_chunk_threshold or MAX_BVH_TRIS
    return (cfg.pallas_bvh and cfg.pallas_bvh_chunk > 0
            and n_tris > max(thresh, cfg.pallas_static_unroll))


def _sph_chunk_engages(n_tree: int, cfg: RenderConfig) -> bool:
    """Count-level sphere chunk predicate (n_tree = TREE side of
    split_huge_spheres); see _tri_chunk_engages."""
    from tpurt.kernels.bvh_pallas import MAX_BVH_SPHERES
    thresh = cfg.pallas_bvh_chunk_threshold or MAX_BVH_SPHERES
    return (cfg.pallas_sphere_bvh and cfg.pallas_bvh_chunk > 0
            and n_tree > max(thresh, 16))


def _use_tri_chunked(fscene: FrozenScene, cfg: RenderConfig) -> bool:
    """Chunked (any-size) mesh mode: beyond the single-SMEM-table budget
    (or a test-lowered threshold), triangles stream HBM slab -> SMEM
    scratch per voted chunk (bvh_pallas.build_chunked_tri_tables)."""
    return _tri_chunk_engages(len(fscene.triangles), cfg)


@functools.lru_cache(maxsize=4)
def _chunk_build_cached(triangles, chunk: int, leaf: int, sah: bool,
                        width: int = 0):
    from tpurt.kernels import bvh_pallas
    return bvh_pallas.build_chunked_tri_tables(triangles, chunk, leaf, sah,
                                               width)


@functools.lru_cache(maxsize=4)
def _chunk_build_sph_cached(tree_sph, chunk: int, leaf: int, sah: bool,
                            width: int = 0):
    from tpurt.kernels import bvh_pallas
    return bvh_pallas.build_chunked_sphere_tables(tree_sph, chunk, leaf,
                                                  sah, width)


def _chunk_tables(fscene: FrozenScene, cfg: RenderConfig):
    """(slab_tensors, meta) for chunked modes — the HBM slab tensors the
    kernel wrappers pass (([], None) when no chunking; ordinary scenes
    keep their exact pre-chunking signatures). Order: triangle slab
    first (if tri-chunked), then sphere slab (if sphere-chunked). The
    packed TOP tables ride the ordinary tri_tab/sph_tab SMEM slots
    (see _prim_tables). meta = {"tri": ..., "sph": ..., "rows": max
    slab stride} — "rows" sizes the shared SMEM/VMEM scratch (the two
    walks never overlap in time, so one scratch serves both kinds)."""
    tabs, mt, ms = [], None, None
    if _use_tri_chunked(fscene, cfg):
        _, slabs, mt = _chunk_build_cached(
            fscene.triangles, cfg.pallas_bvh_chunk, cfg.pallas_bvh_leaf,
            cfg.pallas_bvh_sah, cfg.pallas_bvh_width)
        tabs.append(jnp.asarray(slabs))
    if _use_sph_chunked(fscene, cfg):
        from tpurt.kernels.bvh_pallas import split_huge_spheres
        _, tree_sph = split_huge_spheres(fscene.spheres)
        _, slabs, ms = _chunk_build_sph_cached(
            tree_sph, cfg.pallas_bvh_chunk, cfg.pallas_bvh_leaf,
            cfg.pallas_bvh_sah, cfg.pallas_bvh_width)
        tabs.append(jnp.asarray(slabs))
    if not tabs:
        return [], None
    rows = max(m["rows_pc"] for m in (mt, ms) if m)
    return tabs, {"tri": mt, "sph": ms, "rows": rows}


def chunk_sort_boxes(fscene: FrozenScene, cfg: RenderConfig):
    """(n_chunks, 6) f32 chunk AABBs (bmin|bmax, ordinal order) for the
    wavefront's global ray reordering (cfg.wf_chunk_sort), or None when
    no chunked mode engages.  Triangle chunks win when both kinds chunk
    (they are the slab-sweep cost the reordering amortizes)."""
    if _use_tri_chunked(fscene, cfg):
        _, _, meta = _chunk_build_cached(
            fscene.triangles, cfg.pallas_bvh_chunk, cfg.pallas_bvh_leaf,
            cfg.pallas_bvh_sah, cfg.pallas_bvh_width)
        return meta["boxes"]
    if _use_sph_chunked(fscene, cfg):
        from tpurt.kernels.bvh_pallas import split_huge_spheres
        _, tree_sph = split_huge_spheres(fscene.spheres)
        _, _, meta = _chunk_build_sph_cached(
            tree_sph, cfg.pallas_bvh_chunk, cfg.pallas_bvh_leaf,
            cfg.pallas_bvh_sah, cfg.pallas_bvh_width)
        return meta["boxes"]
    return None


def chunk_scratch_shapes(meta):
    """scratch_shapes entries for the chunk DMA ([] when chunking off —
    ordinary scenes compile with untouched signatures). The staged route
    (bvh_pallas.CHUNK_DMA_VIA_VMEM) adds a VMEM bounce buffer + 2nd sem."""
    if not meta:
        return []
    from tpurt.kernels.bvh_pallas import CHUNK_DMA_VIA_VMEM
    rows = meta["rows"]
    shapes = [pltpu.SMEM((rows, 128), jnp.float32)]
    if CHUNK_DMA_VIA_VMEM:
        shapes.append(pltpu.VMEM((rows, 128), jnp.float32))
    shapes.append(pltpu.SemaphoreType.DMA(()))
    if CHUNK_DMA_VIA_VMEM:
        shapes.append(pltpu.SemaphoreType.DMA(()))
    # resident-slab tag (bvh_pallas._chunked_walk): which (kind, chunk) the
    # SMEM scratch currently holds, so consecutive walks over the same
    # chunk skip the HBM->SMEM DMA entirely. Kernel bodies must reset it
    # via chunk_scratch_reset before the first walk of a tile.
    shapes.append(pltpu.SMEM((1,), jnp.int32))
    return shapes


def chunk_scratch_reset(chunk):
    """Invalidate the resident-slab tag at tile start (chunk = the
    (slab_refs, scratch_refs) pair or None). MUST run before the first
    chunked walk of every kernel invocation: the SMEM scratch is
    uninitialized per tile, and a stale/garbage tag that happened to
    match a valid (kind, chunk) id would skip the DMA that loads it."""
    if chunk is not None:
        chunk[1][-1][0] = jnp.int32(-1)


def _use_sph_bvh(fscene: FrozenScene, cfg: RenderConfig) -> bool:
    """Sphere dynamic-BVH mode: enough non-huge spheres that ordered
    near-to-far descent has a tree to prune, within the SMEM table
    budget (beyond it, chunked mode or XLA)."""
    if not cfg.pallas_sphere_bvh:
        return False
    from tpurt.kernels.bvh_pallas import MAX_BVH_SPHERES, split_huge_spheres
    return (16 < len(split_huge_spheres(fscene.spheres)[1])
            <= MAX_BVH_SPHERES
            and not _use_sph_chunked(fscene, cfg))


def _use_sph_chunked(fscene: FrozenScene, cfg: RenderConfig) -> bool:
    """Chunked sphere mode: sphere counts beyond the single-SMEM-table
    budget stream HBM slabs like chunked meshes (same threshold
    override for tests)."""
    from tpurt.kernels.bvh_pallas import split_huge_spheres
    return _sph_chunk_engages(len(split_huge_spheres(fscene.spheres)[1]),
                              cfg)


def _use_clusters(fscene: FrozenScene, cfg: RenderConfig) -> bool:
    return (cfg.pallas_cluster_size > 0
            and len(fscene.spheres) > 4 * cfg.pallas_cluster_size
            and len(fscene.spheres) <= cfg.pallas_static_unroll
            and not _use_sph_bvh(fscene, cfg))


def _prim_tables(fscene: FrozenScene, cfg: RenderConfig):
    """SMEM primitive tables, consumed only above the static-unroll budget.
    spheres: (cx, cy, cz, r, mat, mtype, ior, 0); triangles: (a, e1, e2, n,
    mat, pad3) — or, in BVH mode, the packed triangle+node table of
    kernels/bvh_pallas.py. In ORDERED cluster mode the sphere slot carries
    the cull tree's tiny node table instead (sphere data stays baked).
    Shared by every Pallas kernel wrapper."""
    if _use_sph_chunked(fscene, cfg):
        from tpurt.kernels import bvh_pallas
        _, tree_sph = bvh_pallas.split_huge_spheres(fscene.spheres)
        top_tab, _, _ = _chunk_build_sph_cached(
            tree_sph, cfg.pallas_bvh_chunk, cfg.pallas_bvh_leaf,
            cfg.pallas_bvh_sah, cfg.pallas_bvh_width)
        sph_tab = jnp.asarray(top_tab)  # coarse tree rides the sph slot
    elif _use_sph_bvh(fscene, cfg):
        from tpurt.kernels import bvh_pallas
        _, tree_sph = bvh_pallas.split_huge_spheres(fscene.spheres)
        sph_tab = jnp.asarray(bvh_pallas.pack_tables(
            *bvh_pallas.build_sphere_bvh_tables(tree_sph,
                                                cfg.pallas_bvh_leaf,
                                                cfg.pallas_bvh_sah,
                                                cfg.pallas_bvh_width),
            leaf_size=cfg.pallas_bvh_leaf))
    elif len(fscene.spheres) > cfg.pallas_static_unroll:
        sph_tab = jnp.asarray(
            [[sp.c[0], sp.c[1], sp.c[2], sp.r,
              float(sp.mat), float(sp.mtype), sp.ior, 0.0]
             for sp in fscene.spheres], jnp.float32)
    elif cfg.pallas_cluster_ordered and _use_clusters(fscene, cfg):
        tree = _sphere_cull_tree(fscene.spheres, cfg.pallas_cluster_size)
        if tree.root is not None:
            sph_tab = jnp.asarray(_cull_tree_node_table(tree)[0])
        else:
            sph_tab = jnp.zeros((1, 8), jnp.float32)
    else:
        sph_tab = jnp.zeros((1, 8), jnp.float32)
    if _use_tri_chunked(fscene, cfg):
        top_tab, _, _ = _chunk_build_cached(
            fscene.triangles, cfg.pallas_bvh_chunk, cfg.pallas_bvh_leaf,
            cfg.pallas_bvh_sah, cfg.pallas_bvh_width)
        tri_tab = jnp.asarray(top_tab)  # coarse tree rides the tri slot
    elif _use_tri_bvh(fscene, cfg):
        from tpurt.kernels import bvh_pallas
        tri_tab = jnp.asarray(bvh_pallas.pack_tables(
            *bvh_pallas.build_tri_bvh_tables(fscene.triangles,
                                             cfg.pallas_bvh_leaf,
                                             cfg.pallas_bvh_sah,
                                             cfg.pallas_bvh_width),
            leaf_size=cfg.pallas_bvh_leaf))
    elif len(fscene.triangles) > cfg.pallas_static_unroll:
        tri_tab = jnp.asarray(
            [list(tr.a) + list(tr.e1) + list(tr.e2) + list(tr.n)
             + [float(tr.mat), 0.0, 0.0, 0.0]
             for tr in fscene.triangles], jnp.float32)
    else:
        tri_tab = jnp.zeros((1, 16), jnp.float32)
    return sph_tab, tri_tab


def _make_scene_fns(fscene: FrozenScene, cfg: RenderConfig, sph_ref, tri_ref,
                    chunk=None, stats_ref=None, mxu_g_ref=None):
    """(intersect, shadow) closures over the frozen scene + SMEM tables,
    picking clustered / static-unroll / dynamic-sweep mode per primitive
    kind. Both take a lanes-relevance mask (the lanes whose result is
    consumed), used only for tile-level culling votes — per-lane results
    for masked-out lanes stay well-defined. `chunk` = (chunk_ref,
    scratch_refs_tuple) for chunked mesh mode (chunk_scratch_shapes
    order); only _use_tri_chunked scenes consume it. `stats_ref`
    (cfg.count_walk_stats) = an SMEM scalar-cell ref the chunked walks
    accumulate diagnostics into: cells 4/5 = closest-walk worklist length
    / chunks swept, 6/7 = the shadow-walk pair (cells 0-3 belong to the
    regen kernel's phase counters)."""
    SPH, TRIS = fscene.spheres, fscene.triangles
    use_clusters = _use_clusters(fscene, cfg)
    tri_chunked = _use_tri_chunked(fscene, cfg)
    if _use_sph_chunked(fscene, cfg):
        from tpurt.kernels import bvh_pallas
        assert chunk is not None, "chunked sphere mode needs chunk refs"
        chunk_refs, chunk_scratch = chunk
        sph_slab = chunk_refs[1] if tri_chunked else chunk_refs[0]
        ALWAYS, TREE_SPH = bvh_pallas.split_huge_spheres(SPH)
        _, _, smeta = _chunk_build_sph_cached(
            TREE_SPH, cfg.pallas_bvh_chunk, cfg.pallas_bvh_leaf,
            cfg.pallas_bvh_sah, cfg.pallas_bvh_width)
        SCC, SRPC, SNCH = (smeta["chunk_cap"], smeta["rows_pc"],
                           smeta["n_chunks"])

        def sph_hit(o, d, m):
            a = s.vdot(d, d)
            st = _sweep_spheres_static(ALWAYS, o, d, a,
                                       _sphere_state_init(o))
            top_nodes = bvh_pallas._PackedTable(sph_ref, 0)
            st = bvh_pallas.closest_sphere_bvh_chunked(
                top_nodes, sph_slab, chunk_scratch, o, d, a, m, st,
                SCC, SRPC, SNCH, leaf_size=cfg.pallas_bvh_leaf,
                prefetch=cfg.pallas_chunk_prefetch,
                interleave=cfg.pallas_chunk_interleave,
                stats=None if stats_ref is None else (stats_ref, 4),
                width=cfg.pallas_bvh_width)
            return _sphere_state_finish(o, d, st)

        def sph_shadow(o, d, tm, lam_, m):
            a = s.vdot(d, d)
            atten = _shadow_sweep_static(ALWAYS, o, d, tm, lam_, a,
                                         jnp.ones_like(o[0]))
            top_nodes = bvh_pallas._PackedTable(sph_ref, 0)
            return bvh_pallas.sphere_shadow_bvh_chunked(
                top_nodes, sph_slab, chunk_scratch, o, d, tm, lam_, a,
                m & (atten > 0.0), atten, SCC, SRPC, SNCH,
                leaf_size=cfg.pallas_bvh_leaf,
                prefetch=cfg.pallas_chunk_prefetch,
                interleave=cfg.pallas_chunk_interleave,
                stats=None if stats_ref is None else (stats_ref, 6),
                width=cfg.pallas_bvh_width)
    elif _use_sph_bvh(fscene, cfg):
        from tpurt.kernels import bvh_pallas
        ALWAYS, TREE_SPH = bvh_pallas.split_huge_spheres(SPH)

        def sph_hit(o, d, m):
            a = s.vdot(d, d)
            st = _sweep_spheres_static(ALWAYS, o, d, a,
                                       _sphere_state_init(o))
            nodes, sphs_v = bvh_pallas.packed_views(sph_ref, len(TREE_SPH))
            st = bvh_pallas.closest_sphere_bvh(
                nodes, sphs_v, o, d, a, m, st,
                leaf_size=cfg.pallas_bvh_leaf,
                width=cfg.pallas_bvh_width)
            return _sphere_state_finish(o, d, st)

        def sph_shadow(o, d, tm, lam_, m):
            a = s.vdot(d, d)
            atten = _shadow_sweep_static(ALWAYS, o, d, tm, lam_, a,
                                         jnp.ones_like(o[0]))
            nodes, sphs_v = bvh_pallas.packed_views(sph_ref, len(TREE_SPH))
            return bvh_pallas.sphere_shadow_bvh(
                nodes, sphs_v, o, d, tm, lam_, a, m & (atten > 0.0), atten,
                leaf_size=cfg.pallas_bvh_leaf,
                width=cfg.pallas_bvh_width)
    elif use_clusters:
        CL = _sphere_cull_tree(SPH, cfg.pallas_cluster_size)
        # branch-mix cells (cfg.count_walk_stats; VERDICT r4 item 4):
        # 8/9 = closest cull-tree leaf conds visited/taken, 10/11 = the
        # shadow-walk pair.  The ordered closest walk lives inside a
        # while loop — its ops are in the roofline's `nested` bucket, so
        # only the STRAIGHT-LINE _tree_sweep conds need the mix.
        cnt_c = None if stats_ref is None else (stats_ref, 8)
        cnt_s = None if stats_ref is None else (stats_ref, 10)
        if cfg.pallas_cluster_ordered and CL.root is not None:
            LEAVES = _cull_tree_node_table(CL)[1]
            sph_hit = lambda o, d, m: _closest_sphere_clustered_ordered(
                CL, LEAVES, sph_ref, o, d, m)
        else:
            sph_hit = lambda o, d, m: _closest_sphere_clustered(
                CL, o, d, m, counter=cnt_c)
        sph_shadow = lambda o, d, tm, lam_, m: _shadow_clustered(
            CL, o, d, tm, lam_, m, counter=cnt_s)
    elif len(SPH) > cfg.pallas_static_unroll:
        sph_hit = lambda o, d, m: _closest_sphere_dyn(sph_ref, len(SPH), o, d)
        sph_shadow = lambda o, d, tm, lam_, m: _shadow_dyn(
            sph_ref, len(SPH), o, d, tm, lam_)
    else:
        sph_hit = lambda o, d, m: _closest_sphere_static(SPH, o, d)
        sph_shadow = lambda o, d, tm, lam_, m: _shadow_static(
            SPH, o, d, tm, lam_)
    if not TRIS:
        return sph_hit, sph_shadow
    tri_clusters = (cfg.pallas_cluster_size > 0
                    and len(TRIS) > 4 * cfg.pallas_cluster_size
                    and len(TRIS) <= cfg.pallas_static_unroll)
    if tri_chunked:
        from tpurt.kernels import bvh_pallas
        assert chunk is not None, "chunked mesh mode needs chunk refs"
        chunk_refs, chunk_scratch = chunk
        chunk_ref = chunk_refs[0]
        _, _, meta = _chunk_build_cached(
            fscene.triangles, cfg.pallas_bvh_chunk, cfg.pallas_bvh_leaf,
            cfg.pallas_bvh_sah, cfg.pallas_bvh_width)
        CC, RPC, NCH = (meta["chunk_cap"], meta["rows_pc"],
                        meta["n_chunks"])

        def tri_hit(o, d, m, t_clip=None):
            top_nodes = bvh_pallas._PackedTable(tri_ref, 0)
            res = bvh_pallas.closest_tri_bvh_chunked(
                top_nodes, chunk_ref, chunk_scratch, o, d, m,
                CC, RPC, NCH, leaf_size=cfg.pallas_bvh_leaf,
                cluster_rows=cfg.pallas_bvh_rows,
                prefetch=cfg.pallas_chunk_prefetch,
                interleave=cfg.pallas_chunk_interleave,
                stats=None if stats_ref is None else (stats_ref, 4),
                t_clip=t_clip, width=cfg.pallas_bvh_width)
            return _tri_state_finish(o, d, res)

        def tri_occ(o, d, tm, m):
            top_nodes = bvh_pallas._PackedTable(tri_ref, 0)
            return bvh_pallas.tri_shadow_bvh_chunked(
                top_nodes, chunk_ref, chunk_scratch, o, d, tm,
                m, CC, RPC, NCH, leaf_size=cfg.pallas_bvh_leaf,
                cluster_rows=cfg.pallas_bvh_rows,
                prefetch=cfg.pallas_chunk_prefetch,
                interleave=cfg.pallas_chunk_interleave,
                stats=None if stats_ref is None else (stats_ref, 6),
                width=cfg.pallas_bvh_width)
    elif tri_clusters:
        TCL = _tri_cull_tree(TRIS, cfg.pallas_cluster_size)
        tri_hit = lambda o, d, m, t_clip=None: _closest_tri_clustered(
            TCL, o, d, m)
        tri_occ = lambda o, d, tm, m: _tri_shadow_clustered(TCL, o, d, tm, m)
    elif _use_tri_bvh(fscene, cfg):
        from tpurt.kernels import bvh_pallas

        def tri_hit(o, d, m, t_clip=None):
            nodes, tris_v = bvh_pallas.packed_views(tri_ref, len(TRIS))
            best_t, best_n, best_mat = bvh_pallas.closest_tri_bvh(
                nodes, tris_v, o, d, m, leaf_size=cfg.pallas_bvh_leaf,
                cluster_rows=cfg.pallas_bvh_rows, t_clip=t_clip,
                mxu_g_ref=mxu_g_ref, width=cfg.pallas_bvh_width)
            return _tri_state_finish(o, d, (best_t, best_n, best_mat))

        def tri_occ(o, d, tm, m):
            nodes, tris_v = bvh_pallas.packed_views(tri_ref, len(TRIS))
            return bvh_pallas.tri_shadow_bvh(
                nodes, tris_v, o, d, tm, m, leaf_size=cfg.pallas_bvh_leaf,
                cluster_rows=cfg.pallas_bvh_rows,
                width=cfg.pallas_bvh_width)
    elif len(TRIS) > cfg.pallas_static_unroll:
        tri_hit = lambda o, d, m, t_clip=None: _closest_tri_dyn(
            tri_ref, len(TRIS), o, d)
        tri_occ = lambda o, d, tm, m: _tri_shadow_dyn(
            tri_ref, len(TRIS), o, d, tm)
    else:
        tri_hit = lambda o, d, m, t_clip=None: _closest_tri_static(
            TRIS, o, d)
        tri_occ = lambda o, d, tm, m: _tri_shadow_static(TRIS, o, d, tm)

    def intersect(o, d, m):
        # spheres first (cheap static sweeps / small trees), then the
        # triangle pass CLIPPED at the sphere-hit distance: ground hits
        # bound nearly every bounce, so mesh nodes/chunks beyond them
        # prune away before any sweep. Bit-safe — _combine_nearest takes
        # the triangle only on strict t_tri < t_sph (see closest_tri_bvh).
        # cfg.pallas_tri_clip=False restores the independent passes.
        hs = sph_hit(o, d, m)
        clip = hs[0] if cfg.pallas_tri_clip else None
        return _combine_nearest(hs, tri_hit(o, d, m, clip))

    def shadow(o, d, tm, lam_, m):
        return jnp.where(tri_occ(o, d, tm, m), 0.0,
                         sph_shadow(o, d, tm, lam_, m))

    return intersect, shadow


# ----- the kernel body -----

def _make_kernel(fscene: FrozenScene, cfg: RenderConfig, depth: int,
                 lanes: int):
    R = lanes // 128
    W, H = cfg.width, cfg.height
    SPH = fscene.spheres
    MATS = fscene.materials
    LIGHTS = fscene.lights
    TRIS = fscene.triangles
    L = len(LIGHTS)
    any_dielectric = any(m.mtype == 1 for m in MATS)
    any_metal = any(m.mtype == 2 for m in MATS)
    ANY_EM = any(m.mtype == 3 for m in MATS)

    n_slabs = (int(_use_tri_chunked(fscene, cfg))
               + int(_use_sph_chunked(fscene, cfg)))

    def kernel(planes_ref, cam_ref, seed_ref, rad_ref, base_ref, sph_ref,
               tri_ref, *rest):
        # chunked modes add (slab inputs, scratch refs); the signature is
        # conditional so ordinary scenes compile unchanged
        if n_slabs:
            out_ref, rays_ref = rest[n_slabs:n_slabs + 2]
            chunk = (list(rest[:n_slabs]), tuple(rest[n_slabs + 2:]))
        else:
            (out_ref, rays_ref), chunk = rest, None
        chunk_scratch_reset(chunk)
        intersect, shadow = _make_scene_fns(fscene, cfg, sph_ref, tri_ref,
                                            chunk=chunk)
        # base_ref: global tile offset of this shard (0 single-chip; device
        # slab start under shard_map) — keeps pixel ids / RNG streams global.
        tile = pl.program_id(0)
        gtile = base_ref[0, 0] + tile
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        if cfg.pallas_block_tiles:
            # tile = (R x 128) image block: a far narrower frustum than a
            # `lanes`-pixel row slab -> tile-level culling votes prune more
            NBX = -(-W // 128)
            px = (gtile % NBX) * 128 + col
            py = (gtile // NBX) * R + row
            valid_px = (px < W) & (py < H)  # padding lanes never trace
            px = jnp.minimum(px, W - 1)
            py = jnp.minimum(py, H - 1)
        else:
            idx = gtile * lanes + row * 128 + col
            px = jnp.remainder(idx, W)
            py = jnp.minimum(idx // W, H - 1)
            valid_px = idx < W * H

        # persistent planes: carry last frame's vispoints into the output
        # block; the bounce loop masked-updates them in place (cheaper than
        # 13 extra while_loop carries, which spill at useful tile sizes).
        for ch in range(3, N_CHANNELS):
            out_ref[ch] = planes_ref[ch]

        rng = rngmod.seed_pixels(seed_ref[0, 0], px, py)
        photon_radius = rad_ref[0, 0]

        # --- camera ray (ref: camera.rs:21-53; draw order = integrate.py) ---
        # cfg.qmc: spawn draws from the Owen-scrambled Sobol stream
        # (seed_ref[0,2]=base seed, [0,3]=global sample index); the path
        # PCG stream then starts at position 0 — same shift as the XLA
        # backend, so cross-backend pairing holds (integrate.render_tile)
        if cfg.qmc:
            from tpurt.ops import qmc as qmcmod
            src = qmcmod.spawn_stream(seed_ref[0, 2], seed_ref[0, 3],
                                      px, py)
        else:
            src = rng
        uj1, src = rngmod.rand_1f(src)
        uj2, src = rngmod.rand_1f(src)
        u = (px.astype(jnp.float32) + uj1) / jnp.float32(W)
        v = (py.astype(jnp.float32) + uj2) / jnp.float32(H)
        cam_o = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
        cam_h = (cam_ref[1, 0], cam_ref[1, 1], cam_ref[1, 2])
        cam_v = (cam_ref[2, 0], cam_ref[2, 1], cam_ref[2, 2])
        cam_ll = (cam_ref[3, 0], cam_ref[3, 1], cam_ref[3, 2])
        if cfg.motion_blur:
            cam_do = (cam_ref[4, 0], cam_ref[4, 1], cam_ref[4, 2])
            cam_dh = (cam_ref[5, 0], cam_ref[5, 1], cam_ref[5, 2])
            cam_dv = (cam_ref[6, 0], cam_ref[6, 1], cam_ref[6, 2])
            cam_dll = (cam_ref[7, 0], cam_ref[7, 1], cam_ref[7, 2])
            ut, src = rngmod.rand_1f(src)
            ch = tuple(cam_h[c] + ut * cam_dh[c] for c in range(3))
            cv = tuple(cam_v[c] + ut * cam_dv[c] for c in range(3))
            co = tuple(cam_o[c] + ut * cam_do[c] for c in range(3))
            d0 = tuple(cam_ll[c] + ut * cam_dll[c]
                       + u * ch[c] + v * cv[c] - co[c] for c in range(3))
            o0 = co
        else:
            ch, cv = cam_h, cam_v
            d0 = tuple(
                cam_ll[c] + u * cam_h[c] + v * cam_v[c] - cam_o[c] for c in range(3)
            )
            o0 = s.vbroadcast(cam_o, u)
        if cfg.aperture > 0.0:
            from tpurt.camera import lens_perturb_c
            o0, d0, src = lens_perturb_c(cfg.aperture, cfg.focus_dist,
                                         src, o0, d0, ch, cv,
                                         rngmod.rand_1f)

        # --- one (hero) wavelength per sample (wgsl :995) ---
        u_lam, src = rngmod.rand_1f(src)
        if not cfg.qmc:
            rng = src
        lam = jnp.float32(VISIBLE_MIN) + u_lam * jnp.float32(VISIBLE_RANGE)

        # --- per-frame spectral precomputes (lambda-invariant per path) ---
        lam_um = lam * jnp.float32(1e-3)
        cauchy_add = jnp.float32(DISPERSION_B) / (lam_um * lam_um)

        # Per-light emission spectra (the reference recomputes these per
        # bounce, wgsl :574-578; they only depend on lambda, so hoist).
        # C_HERO > 1: average C rotated wavelengths (hero sampling); the
        # hero-only share is kept for post-collapse lanes.
        C_HERO = max(1, int(cfg.hero_wavelengths))
        track_collapse = (C_HERO > 1 and cfg.dispersion_in_camera_path
                          and any_dielectric)
        if C_HERO == 1 or track_collapse:
            # the single-lambda emission: the C=1 estimator, and the
            # post-collapse hero emission at FULL weight (the dispersive
            # dirac continuation is hero-only; no 1/C)
            flat = _single_lambda_em_c(LIGHTS, lam)
            hero_rgb = [tuple(flat[3 * li + c] for c in range(3))
                        for li in range(L)]
        if C_HERO > 1:
            delta = VISIBLE_RANGE / C_HERO
            light_rgb = [
                s.hero_em_lookup_c(
                    hero_emission_table(lt.color, lt.intensity, lt.temp,
                                        C_HERO), delta, lam)
                for lt in LIGHTS]
        else:
            light_rgb = hero_rgb

        # Environment emission (cfg.sky_intensity > 0): hoisted like the
        # light emissions; the direction tint is applied at miss time.
        SKY_ON = float(cfg.sky_intensity) > 0.0
        if SKY_ON:
            if C_HERO == 1 or track_collapse:
                sky_hero = _sky_em_c(cfg, lam)
            if C_HERO > 1:
                sky_rgb = s.hero_em_lookup_c(
                    hero_emission_table((1.0, 1.0, 1.0), cfg.sky_intensity,
                                        cfg.sky_temp, C_HERO), delta, lam)
            else:
                sky_rgb = sky_hero

        # type-3 emissive materials: the lambda-only emission base
        # (intensity lives in the material color; see Material.emissive)
        if ANY_EM:
            if C_HERO > 1:
                emB_avg = s.hero_em_lookup_c(
                    hero_emission_table((1.0, 1.0, 1.0), 1.0, 0.0, C_HERO),
                    delta, lam)
            else:
                emB_avg = _flat_em_c(lam)
            emB_flat = _flat_em_c(lam) if track_collapse else None

        zero = jnp.zeros_like(u)
        z3 = (zero, zero, zero)

        # =========== camera path (wgsl :865-982 / integrate.py) ===========
        st = {
            "b": jnp.int32(0), "anylive": jnp.int32(1),
            "o": o0, "d": d0, "tp": (zero + 1.0,) * 3, "rad": z3,
            "active": _mask_i32(valid_px), "rng": rng,
            "vp_stored": jnp.zeros_like(u, jnp.int32),
            "rays": jnp.float32(0.0),
        }
        if track_collapse:
            st["coll"] = jnp.zeros_like(u, jnp.int32)

        def cam_cond(st):
            return (st["b"] < depth) & (st["anylive"] > 0)

        def cam_body(st):
            o, d, tp, rad = st["o"], st["d"], st["tp"], st["rad"]
            active, rng = st["active"] > 0, st["rng"]
            rays = st["rays"]
            if cfg.count_rays:
                rays = rays + jnp.sum(_mask_f32(active))

            t, loc, n, mat = intersect(o, d, active)
            found = t < _HIT

            # environment emission on miss (black sky otherwise, :617-620)
            if SKY_ON:
                em = (s.vwhere(st["coll"] > 0, sky_hero, sky_rgb)
                      if track_collapse else sky_rgb)
                tint = _sky_tint_c(cfg, d)
                miss = active & ~found
                rad = tuple(jnp.where(miss, rad[c] + tp[c] * em[c] * tint[c],
                                      rad[c]) for c in range(3))

            color, rough, ior, is_diffuse, is_metal = \
                _material_lookup_static(MATS, mat)
            wo = s.vneg(d)

            # type-3 emitter hit: add emission, lane terminates below
            if ANY_EM:
                is_em = _is_emissive_static(MATS, mat)
                emb = (s.vwhere(st["coll"] > 0, emB_flat, emB_avg)
                       if track_collapse else emB_avg)
                hit_em = active & found & is_em
                rad = tuple(jnp.where(hit_em,
                                      rad[c] + tp[c] * color[c] * emb[c],
                                      rad[c]) for c in range(3))

            # vispoint store at first diffuse hit (wgsl :893-900):
            # masked in-place update of the persistent output planes.
            store = active & found & is_diffuse & ~(st["vp_stored"] > 0)
            for k_, val in ((_VPOS, loc), (_VNORM, n), (_VWO, wo), (_VTP, tp)):
                out_ref[k_] = jnp.where(store, val[0], out_ref[k_])
                out_ref[k_ + 1] = jnp.where(store, val[1], out_ref[k_ + 1])
                out_ref[k_ + 2] = jnp.where(store, val[2], out_ref[k_ + 2])
            out_ref[_VMAT] = jnp.where(store, mat.astype(jnp.float32),
                                       out_ref[_VMAT])
            vp_stored = jnp.maximum(st["vp_stored"], _mask_i32(store))

            # NEE over all lights (wgsl :568-615); light type is static.
            if track_collapse:
                def emv_fn(li):
                    return s.vwhere(st["coll"] > 0, hero_rgb[li],
                                    light_rgb[li])
            else:
                def emv_fn(li):
                    return light_rgb[li]
            direct, rng = nee_direct_c(
                LIGHTS, loc, n, lam, rng, shadow,
                lambda: active & found & is_diffuse, emv_fn, z3,
                mode=cfg.light_sample)

            lane_d = active & found & is_diffuse
            nee = s.vmul(s.vmul(tp, color), direct)
            rad = s.vadd(rad, s.vwhere(lane_d, nee, z3))
            if cfg.count_rays:
                rays = rays + jnp.sum(_mask_f32(lane_d)) * (
                    min(1, L) if cfg.light_sample != "all" else L)

            # shared scatter draws (order = integrate.py); camera scatter
            # cells are tile-shared per (sample, bounce) when strata are on
            if cfg.photon_strata and cfg.camera_strata_bounce:
                def strata_fn(a, b, c):
                    return rngmod.apply_bounce_strata(
                        seed_ref[0, 1], rngmod.CAMERA_STRATA_K, st["b"],
                        rngmod.strata_counts(cfg)[1], a, b, c)
            else:
                strata_fn = None
            if cfg.dispersion_in_camera_path:
                def eta_fn():
                    return ior + cauchy_add
            else:
                def eta_fn():
                    return ior  # reference quirk (wgsl :915)
            wi, new_tp, new_o, scat_ok, rr_live, rng, _ = scatter_rr_c(
                cfg, wo, n, loc, color, rough, is_diffuse, is_metal, tp,
                rng, any_dielectric=any_dielectric, any_metal=any_metal,
                eta_fn=eta_fn, camera_pdf=True,
                rr_thresh_fn=lambda: cfg.rr_threshold, strata_fn=strata_fn)

            cont = active & found & scat_ok & rr_live
            if ANY_EM:
                cont = cont & ~is_em
            cont_i = _mask_i32(cont)
            out = {
                "b": st["b"] + 1, "anylive": jnp.max(cont_i),
                "o": s.vwhere(cont, new_o, o),
                "d": s.vwhere(cont, wi, d),
                "tp": s.vwhere(cont, new_tp, tp),
                "rad": rad, "active": cont_i, "rng": rng,
                "vp_stored": vp_stored,
                "rays": rays,
            }
            if track_collapse:
                # hero collapse on dispersive interaction (see mega_regen)
                out["coll"] = jnp.maximum(st["coll"], _mask_i32(
                    active & found & ~(is_diffuse | is_metal)))
            return out

        st = jax.lax.while_loop(cam_cond, cam_body, st)
        rad = st["rad"]
        # Independent per-photon streams (rng.photon_stream): draw
        # positions depend only on (pixel, sample, k) — never on early
        # exits, tile geometry, or other lanes.
        rays_total = st["rays"]

        # =========== photon pass (wgsl :745-861, :998-1015) ===========
        contrib = z3
        if cfg.enable_photons and L > 0:
            vis_pos = (out_ref[_VPOS], out_ref[_VPOS + 1], out_ref[_VPOS + 2])
            vp_ok = (jnp.sqrt(s.vdot(vis_pos, vis_pos)) > 0.001) & valid_px
            vp_ok_i = _mask_i32(vp_ok)
            inv_pi_r2 = 1.0 / jnp.maximum(
                jnp.float32(np.pi) * photon_radius * photon_radius, 1e-10)

            for k in range(cfg.k_photons):
                rng = rngmod.photon_stream(seed_ref[0, 0], px, py, k)
                lt = LIGHTS[k % L]

                # point: cone toward origin (1f + 2f draws, wgsl :710-721)
                uc, rng = rngmod.rand_1f(rng)
                up1, rng = rngmod.rand_1f(rng)
                _up2, rng = rngmod.rand_1f(rng)  # drawn, unused (ref parity)
                ue1, rng = rngmod.rand_1f(rng)
                ue2, rng = rngmod.rand_1f(rng)
                uh1, rng = rngmod.rand_1f(rng)
                uh2, rng = rngmod.rand_1f(rng)
                if cfg.photon_strata:
                    # tile-coherent emission cell per (sample, k)
                    uc, up1, ue1, ue2, uh1, uh2 = \
                        rngmod.apply_emission_strata(
                            seed_ref[0, 1], rngmod.strata_k(cfg, k),
                            *rngmod.strata_counts(cfg),
                            uc, up1, ue1, ue2, uh1, uh2)

                if lt.ltype == 0:
                    ct = 1.0 - uc * np.float32(1.0 - PHOTON_CONE_COS)
                    stn = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
                    phi = jnp.float32(s.TWO_PI) * up1
                    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
                    ph_d = tuple(
                        stn * cphi * np.float32(lt.cone_t[c])
                        + stn * sphi * np.float32(lt.cone_b[c])
                        + ct * np.float32(lt.cone_axis[c]) for c in range(3))
                    ph_o = s.vbroadcast(lt.pos, uc)
                    cone_factor = (1.0 - PHOTON_CONE_COS) * 0.5
                    ph_tp = s.vbroadcast(tuple(
                        lt.color[c] * lt.intensity / cfg.k_photons * cone_factor
                        for c in range(3)), uc)
                else:
                    su = (ue1 - 0.5) * np.float32(2.0 * lt.hw)
                    sv = (ue2 - 0.5) * np.float32(2.0 * lt.hw)
                    ph_o = tuple(
                        np.float32(lt.pos[c] + lt.normal[c] * EPS)
                        + su * np.float32(lt.tangent[c])
                        + sv * np.float32(lt.bitangent[c]) for c in range(3))
                    theta = jnp.float32(s.TWO_PI) * uh1
                    r_ = jnp.sqrt(uh2)
                    x_ = r_ * jnp.cos(theta)
                    y_ = r_ * jnp.sin(theta)
                    z_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - r_ * r_))
                    ph_d = tuple(
                        x_ * np.float32(lt.tangent[c])
                        + y_ * np.float32(lt.bitangent[c])
                        + z_ * np.float32(lt.normal[c]) for c in range(3))
                    ph_tp = s.vbroadcast(tuple(
                        lt.color[c] * lt.intensity / cfg.k_photons
                        for c in range(3)), uc)

                pst = {
                    "b": jnp.int32(0), "anylive": jnp.max(vp_ok_i),
                    "o": ph_o, "d": ph_d, "tp": ph_tp,
                    "active": vp_ok_i, "rng": rng,
                    "contrib": z3, "rays": jnp.float32(0.0),
                }

                def ph_cond(pst):
                    return (pst["b"] < cfg.max_photon_bounces) & (pst["anylive"] > 0)

                def ph_body(pst):
                    o, d, tp = pst["o"], pst["d"], pst["tp"]
                    active, rng = pst["active"] > 0, pst["rng"]
                    rays = pst["rays"]
                    if cfg.count_rays:
                        rays = rays + jnp.sum(_mask_f32(active))

                    t, loc, n, mat = intersect(o, d, active)
                    found = t < _HIT
                    live = active & found

                    # density estimation at this lane's vispoint (wgsl :774-780)
                    # vispoints re-read from the output block each bounce:
                    # keeps them out of the loop carry (register pressure).
                    vpos = (out_ref[_VPOS], out_ref[_VPOS + 1], out_ref[_VPOS + 2])
                    vnorm = (out_ref[_VNORM], out_ref[_VNORM + 1], out_ref[_VNORM + 2])
                    vwo = (out_ref[_VWO], out_ref[_VWO + 1], out_ref[_VWO + 2])
                    vtp = (out_ref[_VTP], out_ref[_VTP + 1], out_ref[_VTP + 2])
                    vmat = out_ref[_VMAT].astype(jnp.int32)
                    v_color, v_rough, v_ior, v_isdiff, v_ismetal = \
                        _material_lookup_static(MATS, vmat)
                    dvec = s.vsub(loc, vpos)
                    dist = jnp.sqrt(jnp.maximum(s.vdot(dvec, dvec), 0.0))
                    near = dist < photon_radius
                    f = _evaluate_bsdf_c(vwo, s.vneg(d), vnorm,
                                         v_color, v_rough, v_ior + cauchy_add,
                                         v_isdiff, v_ismetal)
                    kern = (1.0 - dist / photon_radius) * inv_pi_r2
                    dens = s.vscale(s.vmul(s.vmul(vtp, f), tp), kern)
                    c = s.vadd(pst["contrib"], s.vwhere(live & near, dens, z3))

                    # scatter (wgsl :782-853)
                    color, rough, ior, is_diffuse, is_metal = \
                        _material_lookup_static(MATS, mat)
                    wo = s.vneg(d)

                    if cfg.photon_strata and cfg.photon_strata_bounce:
                        # tile-shared (sample, k, bounce) scatter cell
                        def strata_fn(a, b, c):
                            return rngmod.apply_bounce_strata(
                                seed_ref[0, 1], rngmod.strata_k(cfg, k),
                                pst["b"], rngmod.strata_counts(cfg)[1],
                                a, b, c)
                    else:
                        strata_fn = None
                    wi, new_tp, new_o, scat_ok, rr_live, rng, _ = \
                        scatter_rr_c(
                            cfg, wo, n, loc, color, rough, is_diffuse,
                            is_metal, tp, rng,
                            any_dielectric=any_dielectric,
                            any_metal=any_metal,
                            # photons disperse (wgsl :797)
                            eta_fn=lambda: ior + cauchy_add,
                            camera_pdf=False,
                            rr_thresh_fn=lambda: cfg.photon_rr_threshold,
                            strata_fn=strata_fn,
                            rr_scale_fn=None if cfg.photon_rr_scale == 1.0
                            else (lambda: jnp.float32(cfg.photon_rr_scale)))

                    cont = live & scat_ok & rr_live
                    if ANY_EM:
                        # type-3 emitters absorb photons
                        cont = cont & ~_is_emissive_static(MATS, mat)
                    cont_i = _mask_i32(cont)
                    return {
                        "b": pst["b"] + 1, "anylive": jnp.max(cont_i),
                        "o": s.vwhere(cont, new_o, o),
                        "d": s.vwhere(cont, wi, d),
                        "tp": s.vwhere(cont, new_tp, tp),
                        "active": cont_i, "rng": rng,
                        "contrib": c, "rays": rays,
                    }

                pst = jax.lax.while_loop(ph_cond, ph_body, pst)
                contrib = s.vadd(contrib, pst["contrib"])
                rays_total = rays_total + pst["rays"]

        # =========== accumulate (wgsl :1017-1021) ===========
        total = s.vadd(rad, contrib)
        if cfg.radiance_clamp > 0.0:
            cl = jnp.float32(cfg.radiance_clamp)
            total = tuple(jnp.minimum(t, cl) for t in total)
        out_ref[0] = planes_ref[0] + total[0]
        out_ref[1] = planes_ref[1] + total[1]
        out_ref[2] = planes_ref[2] + total[2]
        rays_ref[tile, 0] = rays_total  # full-array SMEM block; own row only

    return kernel


# ----- pallas_call wrapper -----

@functools.partial(jax.jit,
                   static_argnames=("fscene", "cfg", "depth", "interpret"))
def megakernel_step(fscene: FrozenScene, cfg: RenderConfig, camera, planes,
                    seed, photon_radius, depth: int, interpret: bool = False,
                    tile_base=0, strata_seed=None, qmc_ctx=None):
    """Advance every pixel by one progressive sample via the Pallas kernel.

    planes: (16, TR, 128) f32 state (see N_CHANNELS layout); returns
    (new_planes, rays_per_tile (n_tiles,)). tile_base is the global tile
    offset of this planes shard (nonzero under shard_map pixel sharding).
    strata_seed: the (possibly window-epoch) seed the emission stratum
    hashes — defaults to `seed` (photon_strata_window == 1).
    qmc_ctx: (base_seed, global_sample_index), required when cfg.qmc
    (rides two extra seed_arr slots; non-qmc signatures are unchanged).
    """
    lanes = cfg.pallas_lanes
    assert lanes % 128 == 0, "pallas_lanes must be a multiple of 128"
    R = lanes // 128
    TR = planes.shape[1]
    assert TR % R == 0, (TR, R)
    n_tiles = TR // R

    if cfg.motion_blur:
        from tpurt.camera import motion_rows
        cam = motion_rows(camera)                 # (8, 3): basis + deltas
    else:
        cam = jnp.stack([camera.origin, camera.horizontal,
                         camera.vertical, camera.lower_left])
    if strata_seed is None:
        strata_seed = seed
    seed_vals = [jnp.asarray(seed, jnp.uint32),
                 jnp.asarray(strata_seed, jnp.uint32)]
    if cfg.qmc:
        if qmc_ctx is None:
            raise ValueError("cfg.qmc=True requires qmc_ctx="
                             "(base_seed, global_sample_index)")
        seed_vals += [jnp.asarray(qmc_ctx[0], jnp.uint32),
                      jnp.asarray(qmc_ctx[1], jnp.int32).astype(jnp.uint32)]
    seed_arr = jnp.stack(seed_vals).reshape(1, len(seed_vals))
    rad_arr = jnp.asarray(photon_radius, jnp.float32).reshape(1, 1)
    base_arr = jnp.asarray(tile_base, jnp.int32).reshape(1, 1)

    sph_tab, tri_tab = _prim_tables(fscene, cfg)
    chunk_tab, chunk_meta = _chunk_tables(fscene, cfg)

    kernel = _make_kernel(fscene, cfg, depth, lanes)

    new_planes, rays = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((N_CHANNELS, R, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(chunk_tab),
        out_specs=[
            pl.BlockSpec((N_CHANNELS, R, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(planes.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.float32),
        ],
        scratch_shapes=chunk_scratch_shapes(chunk_meta),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(planes, cam, seed_arr, rad_arr, base_arr, sph_tab, tri_tab,
      *chunk_tab)
    return new_planes, rays[:, 0]


# ----- RenderState <-> planes conversion (XLA side) -----

def block_grid(cfg: RenderConfig):
    """(nbx, nby) image-block tile grid, or None for linear slab tiles."""
    if not cfg.pallas_block_tiles:
        return None
    R = cfg.pallas_lanes // 128
    return (-(-cfg.width // 128), -(-cfg.height // R))


def pixels_to_planes_order(cfg: RenderConfig, flat):
    """Linear-pixel-order channels (C, P) -> plane-order (C, P): each tile
    becomes an (R x 128) image block (row-major over the block grid).
    Identity when block tiles are off. Pure permutation — exact inverse of
    planes_pixel_order."""
    g = block_grid(cfg)
    if g is None:
        return flat
    nbx, nby = g
    R = cfg.pallas_lanes // 128
    C, P = flat.shape
    img = flat[:, :cfg.n_pixels].reshape(C, cfg.height, cfg.width)
    img = jnp.pad(img, ((0, 0), (0, nby * R - cfg.height),
                        (0, nbx * 128 - cfg.width)))
    out = img.reshape(C, nby, R, nbx, 128).transpose(0, 1, 3, 2, 4)
    out = out.reshape(C, nbx * nby * cfg.pallas_lanes)
    if P > out.shape[1]:  # n_dev-rounding tiles carry no pixels
        out = jnp.pad(out, ((0, 0), (0, P - out.shape[1])))
    return out


def planes_pixel_order(cfg: RenderConfig, flat):
    """Plane-order channels (C, P) -> linear-pixel-order (C, P)."""
    g = block_grid(cfg)
    if g is None:
        return flat
    nbx, nby = g
    R = cfg.pallas_lanes // 128
    C, P = flat.shape
    body = flat[:, : nbx * nby * cfg.pallas_lanes]
    img = body.reshape(C, nby, nbx, R, 128).transpose(0, 1, 3, 2, 4)
    img = img.reshape(C, nby * R, nbx * 128)[:, :cfg.height, :cfg.width]
    out = img.reshape(C, cfg.n_pixels)
    if P > cfg.n_pixels:
        out = jnp.pad(out, ((0, 0), (0, P - cfg.n_pixels)))
    return out


def state_to_planes(state, cfg: RenderConfig):
    """RenderState arrays (P, 3)/(P,) -> (16, TR, 128) f32 planes (block
    order when cfg.pallas_block_tiles)."""
    P = state.rgb_sum.shape[0]
    TR = P // 128
    cols = [state.rgb_sum[:, c] for c in range(3)]
    for arr in (state.vis_pos, state.vis_norm, state.vis_wo, state.vis_tp):
        cols.extend(arr[:, c] for c in range(3))
    cols.append(state.vis_mat.astype(jnp.float32))
    flat = pixels_to_planes_order(cfg, jnp.stack(cols))
    return flat.reshape(N_CHANNELS, TR, 128)


@functools.partial(jax.jit,
                   static_argnames=("fscene", "cfg", "depth", "interpret"))
def _render_pallas_jit(fscene, cfg, camera, state, base_seed, spp, depth,
                       interpret):
    # spp is a TRACED fori_loop bound: one compile serves any sample count
    # (the Mosaic kernel compile is the expensive part; don't repeat it).
    from tpurt.render import _frame_seed

    planes = state_to_planes(state, cfg)

    def body(_, carry):
        planes, it, radius, rays = carry
        seed = _frame_seed(base_seed, it)
        strata_seed = None
        if cfg.photon_strata and cfg.photon_strata_window > 1:
            from tpurt.ops.rng import strata_epoch
            strata_seed = _frame_seed(base_seed, strata_epoch(cfg, it))
        new_planes, tile_rays = megakernel_step(
            fscene, cfg, camera, planes, seed, radius, depth,
            interpret=interpret, strata_seed=strata_seed,
            qmc_ctx=(base_seed, it) if cfg.qmc else None)
        it_new = it + 1
        from tpurt.render import sppm_radius_step
        r_new = sppm_radius_step(cfg, it_new.astype(jnp.float32), radius)
        return (new_planes, it_new, r_new, rays + jnp.sum(tile_rays))

    planes, it, radius, rays = jax.lax.fori_loop(
        0, spp, body,
        (planes, state.iteration, state.photon_radius, state.rays))

    P = planes.shape[1] * 128
    flat = planes_pixel_order(cfg, planes.reshape(N_CHANNELS, P))
    v3 = lambda a: jnp.stack([flat[a], flat[a + 1], flat[a + 2]], axis=-1)
    return dataclasses.replace(
        state,
        rgb_sum=v3(0),
        n_samples=state.n_samples + spp.astype(jnp.float32),
        vis_pos=v3(3), vis_norm=v3(6), vis_wo=v3(9), vis_tp=v3(12),
        vis_mat=flat[15].astype(jnp.int32),
        iteration=it, photon_radius=radius, rays=rays,
    )


def xla_fallback(scene, cfg: RenderConfig, camera, state, base_seed,
                 spp, depth: int | None = None):
    """Out-of-budget fallback shared by the fused-kernel entry points:
    the same progressive algorithm through the XLA integrator (any scene
    size), honoring a preview depth override."""
    from tpurt.render import _render_step_xla, _render_xla
    if depth is None or depth == cfg.depth:
        return _render_xla(scene, cfg, camera, state, base_seed, int(spp))
    st = state
    for _ in range(int(spp)):
        st = _render_step_xla(scene, cfg, camera, st, base_seed, int(depth))
    return st


def render_pallas(scene, cfg: RenderConfig, camera, state, base_seed,
                  spp: int, depth: int | None = None,
                  interpret: bool | None = None):
    """Run `spp` progressive samples with the tile planes resident on device.

    The scene must be concrete (not traced): it is frozen into compile-time
    constants. The (P, 3) <-> planes layout conversion is paid ONCE per
    call — on TPU the narrow (P, 3) arrays live in a padded tiled layout, so
    per-step transposes would cost ~100x the kernel itself (measured).

    Scenes beyond the fused-kernel budgets run the SAME algorithm through
    the XLA integrator instead (render()'s dispatch checks supports_scene
    before coming here; direct callers get the identical fallback rather
    than an SMEM-table blowup).
    """
    if not supports_scene(scene, cfg):
        return xla_fallback(scene, cfg, camera, state, base_seed, spp, depth)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fscene = freeze_scene(scene)
    return _render_pallas_jit(fscene, cfg, camera, state,
                              jnp.asarray(base_seed, jnp.uint32),
                              jnp.asarray(spp, jnp.int32),
                              cfg.depth if depth is None else depth,
                              interpret)


def render_step_pallas(scene, cfg: RenderConfig, camera, state, base_seed,
                       depth: int, interpret: bool | None = None):
    """Single progressive sample via the Pallas backend (pays the layout
    conversion both ways; use render_pallas for multi-spp rendering)."""
    return render_pallas(scene, cfg, camera, state, base_seed, 1, depth,
                         interpret=interpret)
