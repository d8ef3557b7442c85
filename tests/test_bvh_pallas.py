"""Whole-tile dynamic BVH traversal (tpurt/kernels/bvh_pallas.py).

Correctness is pinned three ways: the packed-table encoding round-trips,
the raw traversal matches a brute-force Möller-Trumbore oracle on a random
triangle soup (closest hit, misses, occlusion), and the full fused kernel
on a mesh scene forced through the BVH path agrees with the XLA integrator
(exact ray counts, image tolerance) — the same cross-backend contract as
the static-unroll modes (tests/test_mega_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt import (RenderConfig, init_state, instanced_scene, make_camera,
                   render, resolve_image, torus_mesh_scene)
from tpurt.kernels.bvh_pallas import (MAX_BVH_TRIS, build_sphere_bvh_tables,
                                      build_tri_bvh_tables,
                                      closest_sphere_bvh, closest_tri_bvh,
                                      pack_tables, packed_views,
                                      sphere_shadow_bvh, split_huge_spheres,
                                      tri_shadow_bvh)


class _FT:
    def __init__(self, a, e1, e2, n, mat):
        self.a, self.e1, self.e2, self.n = (tuple(map(float, v))
                                            for v in (a, e1, e2, n))
        self.mat = int(mat)


def _soup(T, seed=3):
    rng = np.random.default_rng(seed)
    ctr = rng.uniform(-6, 6, (T, 3)).astype(np.float32)
    a = ctr + rng.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (T, 3)).astype(np.float32)
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    tris = [_FT(a[i], e1[i], e2[i], n[i], i % 7) for i in range(T)]
    return tris, a, e1, e2


def _brute_force(ro, rd, a, e1, e2):
    oc = ro[:, None, :] - a[None, :, :]
    h = np.cross(rd[:, None, :], e2[None, :, :])
    det = np.einsum("tk,ntk->nt", e1, h)
    eps = np.float32(1.17549435e-38)
    inv = 1.0 / np.where(np.abs(det) < eps, 1.0, det)
    u = inv * np.einsum("ntk,ntk->nt", oc, h)
    q = np.cross(oc, e1[None, :, :])
    v = inv * np.einsum("nk,ntk->nt", rd, q)
    tt = inv * np.einsum("tk,ntk->nt", e2, q)
    valid = ((np.abs(det) >= eps) & (u >= 0) & (u <= 1)
             & (v >= 0) & (u + v <= 1) & (tt > eps))
    return np.where(valid, tt, 1e30)


def test_packed_table_roundtrip():
    tris, *_ = _soup(100)
    tri_tab, node_f, node_i = build_tri_bvh_tables(tris, leaf_size=4)
    packed = pack_tables(tri_tab, node_f, node_i)
    assert packed.shape[1] == 128
    recs = packed.reshape(-1, 16)
    T, B = tri_tab.shape[0], node_f.shape[0]
    np.testing.assert_array_equal(recs[:T], tri_tab)
    np.testing.assert_array_equal(recs[T:T + B, 0:6], node_f[:, 0:6])
    np.testing.assert_array_equal(recs[T:T + B, 6:10].astype(np.int32),
                                  node_i)
    # leaves cover every triangle exactly once, contiguously
    leaf = node_i[:, 3] > 0
    spans = sorted((int(f), int(c))
                   for f, c in zip(node_i[leaf, 2], node_i[leaf, 3]))
    covered = [i for f, c in spans for i in range(f, f + c)]
    assert covered == list(range(T))


@pytest.mark.parametrize("S,leaf", [(50, 48), (17, 64)])
def test_guard_rows_cover_unrolled_leaf(S, leaf):
    """A short trailing leaf's unrolled sweep reads leaf_size records from
    `first`; the guard rows must keep that in-bounds (review finding:
    fixed 16 guards under-covered leaf sizes above ~32)."""
    rng = np.random.default_rng(2)
    c = rng.uniform(-4, 4, (S, 3)).astype(np.float32)
    sphs = [_FS(c[i], 0.3, 0) for i in range(S)]
    sph_tab, node_f, node_i = build_sphere_bvh_tables(sphs, leaf_size=leaf)
    packed = pack_tables(sph_tab, node_f, node_i, leaf_size=leaf)
    n_recs = packed.reshape(-1, 16).shape[0]
    leaves = node_i[node_i[:, 3] > 0]
    worst = int((leaves[:, 2] + leaf).max())
    assert worst <= n_recs, (worst, n_recs)


def test_sah_build_invariants():
    """SAH trees (cfg.pallas_bvh_sah) keep every structural contract of the
    median build: permutation leaf order, containment, leaf occupancy
    <= max_prims, stack-depth budget — including on degenerate input where
    every centroid coincides (falls back to median splits)."""
    from tpurt import accel
    from tpurt.kernels.bvh_pallas import _assert_stack_fits

    rng = np.random.default_rng(5)
    # mixed-density soup: clusters + sparse spread + oversized boxes
    lo = np.concatenate([
        rng.normal((0, 0, 0), 0.7, (500, 3)),
        rng.normal((6, 1, 2), 0.4, (300, 3)),
        rng.uniform(-12, 12, (60, 3))]).astype(np.float32)
    ext = np.concatenate([
        rng.uniform(0.01, 0.05, (800, 3)),
        rng.uniform(1.0, 4.0, (60, 3))]).astype(np.float32)
    hi = lo + ext
    for K in (4, 32):
        b = accel.build_bvh(lo, hi, max_prims=K, sah=True)
        accel.validate_bvh(b, lo, hi)
        assert int(b.count.max()) <= K
        _assert_stack_fits(b)
    z = np.zeros((64, 3), np.float32)
    b = accel.build_bvh(z, z + 0.5, max_prims=4, sah=True)
    accel.validate_bvh(b, z, z + 0.5)


@pytest.mark.parametrize("T,sah", [(40, False), (300, False), (300, True)])
def test_walk_matches_brute_force(T, sah):
    tris, a, e1, e2 = _soup(T)
    tri_tab, node_f, node_i = build_tri_bvh_tables(tris, leaf_size=8, sah=sah)
    packed = jnp.asarray(pack_tables(tri_tab, node_f, node_i))

    R, NT = 2, 2
    NR = NT * R * 128
    rng = np.random.default_rng(11)
    ro = rng.uniform(-8, 8, (NR, 3)).astype(np.float32)
    rd = rng.uniform(-1, 1, (NR, 3)).astype(np.float32)
    ro[: NR // 2] = (np.float32([0, 0, -10.0])
                     + rng.uniform(-0.1, 0.1, (NR // 2, 3)).astype(np.float32))
    rd[: NR // 2] = (rng.uniform(-6, 6, (NR // 2, 3)).astype(np.float32)
                     - ro[: NR // 2])

    def kernel(rays_ref, tab_ref, out_ref):
        o = (rays_ref[0], rays_ref[1], rays_ref[2])
        d = (rays_ref[3], rays_ref[4], rays_ref[5])
        mask = jnp.ones_like(o[0], bool)
        nodes, tv = packed_views(tab_ref, T)
        t, nrm, mat = closest_tri_bvh(nodes, tv, o, d, mask)
        occ = tri_shadow_bvh(nodes, tv, o, d,
                             jnp.full_like(o[0], 4.0), mask)
        out_ref[0] = t
        out_ref[1] = mat.astype(jnp.float32)
        out_ref[2] = jnp.where(occ, 1.0, 0.0)

    rays = jnp.asarray(
        np.stack([ro[:, 0], ro[:, 1], ro[:, 2],
                  rd[:, 0], rd[:, 1], rd[:, 2]])
        .reshape(6, NT, R, 128).swapaxes(0, 1).reshape(NT * 6, R, 128))
    out = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((6, R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((3, R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT * 3, R, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(rays, packed)
    out = np.asarray(out).reshape(NT, 3, R, 128)
    t_k = out[:, 0].reshape(-1)
    occ_k = out[:, 2].reshape(-1) > 0.5

    tt = _brute_force(ro, rd, a, e1, e2)
    t_ref = tt.min(axis=1)
    hit = t_ref < 1e29
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(t_k > 1e29, ~hit)
    np.testing.assert_array_equal(occ_k, (tt < 4.0).any(axis=1))


class TestFusedKernelBVHMode:
    """Mesh scene forced through the dynamic-BVH path of the fused
    megakernel vs the XLA integrator — same contract as the static modes."""

    def _cfgs(self):
        kw = dict(width=128, height=64, depth=5, pallas_lanes=1024,
                  pallas_cluster_size=0)
        # static_unroll=8 pushes the 256-triangle torus into BVH mode
        return (RenderConfig(backend="pallas", pallas_static_unroll=8,
                             pallas_bvh=True, pallas_bvh_leaf=8, **kw),
                RenderConfig(backend="xla", **kw))

    def test_exact_ray_counts_and_image(self):
        from tpurt.kernels.mega_pallas import _use_tri_bvh, freeze_scene
        scene = torus_mesh_scene(8, 4)  # 64 triangles + spheres + ground
        cfg_p, cfg_x = self._cfgs()
        assert _use_tri_bvh(freeze_scene(scene), cfg_p)
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=2.0)
        st_p = render(scene, cfg_p, cam, init_state(cfg_p), 77, 2)
        st_x = render(scene, cfg_x, cam, init_state(cfg_x), 77, 2)
        assert float(st_p.rays) == float(st_x.rays) != 0.0
        img_p = np.asarray(resolve_image(cfg_p, st_p))
        img_x = np.asarray(resolve_image(cfg_x, st_x))
        # identical paths up to float reassociation: ulp-level t differences
        # through the glass spheres blow up on rare caustic fireflies, so
        # (like the fused-wavefront suite) bound the divergent-pixel
        # fraction instead of demanding allclose everywhere
        diff = (np.abs(img_p - img_x) > 1e-4).any(axis=-1)
        assert diff.mean() < 0.02, f"{diff.mean():.4f} of pixels diverge"

    def test_sah_tree_same_estimator(self):
        """cfg.pallas_bvh_sah only re-shapes the tree: ray counts stay
        EXACTLY equal to the XLA backend (which never sees a tree) and the
        image agrees within the same reassociation bound as the median
        tree — the estimator is tree-independent."""
        scene = torus_mesh_scene(8, 4)
        cfg_p, cfg_x = self._cfgs()
        cfg_p = cfg_p.with_(pallas_bvh_sah=True)
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=2.0)
        st_p = render(scene, cfg_p, cam, init_state(cfg_p), 77, 2)
        st_x = render(scene, cfg_x, cam, init_state(cfg_x), 77, 2)
        assert float(st_p.rays) == float(st_x.rays) != 0.0
        img_p = np.asarray(resolve_image(cfg_p, st_p))
        img_x = np.asarray(resolve_image(cfg_x, st_x))
        diff = (np.abs(img_p - img_x) > 1e-4).any(axis=-1)
        assert diff.mean() < 0.02, f"{diff.mean():.4f} of pixels diverge"

    def test_supports_scene_budget(self):
        from tpurt.kernels.mega_pallas import supports_scene
        scene = torus_mesh_scene(8, 4)
        cfg_p, _ = self._cfgs()
        assert supports_scene(scene, cfg_p)
        assert scene.num_triangles <= MAX_BVH_TRIS

    def test_cluster_rows_identical(self):
        """pallas_bvh_rows predicates each leaf's vector sweep per
        row-cluster of lanes; a skipped cluster is one no lane of which
        could be improved by the leaf, so results are identical to the
        whole-tile sweep."""
        scene = torus_mesh_scene(8, 4)
        cfg_w, _ = self._cfgs()
        cfg_c = cfg_w.with_(pallas_bvh_rows=2)
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=2.0)
        st_w = render(scene, cfg_w, cam, init_state(cfg_w), 77, 2)
        st_c = render(scene, cfg_c, cam, init_state(cfg_c), 77, 2)
        assert float(st_w.rays) == float(st_c.rays) != 0.0
        np.testing.assert_array_equal(np.asarray(st_w.rgb_sum),
                                      np.asarray(st_c.rgb_sum))


class _FS:
    def __init__(self, c, r, mat, mtype=0, ior=1.0):
        self.c = tuple(map(float, c))
        self.r = float(r)
        self.mat = int(mat)
        self.mtype = int(mtype)
        self.ior = float(ior)


@pytest.mark.parametrize("leaf", [0, 8])
def test_sphere_walk_matches_brute_force(leaf):
    S = 120
    rng = np.random.default_rng(5)
    c = rng.uniform(-6, 6, (S, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.6, S).astype(np.float32)
    sphs = [_FS(c[i], r[i], i % 5, mtype=int(i % 3 == 0), ior=1.5)
            for i in range(S)]
    sph_tab, node_f, node_i = build_sphere_bvh_tables(sphs, leaf_size=8)
    packed = jnp.asarray(pack_tables(sph_tab, node_f, node_i))

    R, NT = 2, 2
    NR = NT * R * 128
    ro = rng.uniform(-8, 8, (NR, 3)).astype(np.float32)
    rd = rng.uniform(-1, 1, (NR, 3)).astype(np.float32)

    def kernel(rays_ref, tab_ref, out_ref):
        o = (rays_ref[0], rays_ref[1], rays_ref[2])
        d = (rays_ref[3], rays_ref[4], rays_ref[5])
        mask = jnp.ones_like(o[0], bool)
        a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        nodes, sv = packed_views(tab_ref, S)
        init = (jnp.full_like(o[0], 1e30), (jnp.zeros_like(o[0]),) * 3,
                jnp.zeros_like(o[0], jnp.int32))
        t, _, mat = closest_sphere_bvh(nodes, sv, o, d, a, mask, init,
                                       leaf_size=leaf)
        atten = sphere_shadow_bvh(nodes, sv, o, d,
                                  jnp.full_like(o[0], 4.0),
                                  jnp.full_like(o[0], 550.0), a, mask,
                                  jnp.ones_like(o[0]), leaf_size=leaf)
        out_ref[0] = t
        out_ref[1] = mat.astype(jnp.float32)
        out_ref[2] = atten

    rays = jnp.asarray(
        np.stack([ro[:, 0], ro[:, 1], ro[:, 2],
                  rd[:, 0], rd[:, 1], rd[:, 2]])
        .reshape(6, NT, R, 128).swapaxes(0, 1).reshape(NT * 6, R, 128))
    out = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((6, R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((3, R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT * 3, R, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(rays, packed)
    out = np.asarray(out).reshape(NT, 3, R, 128)
    t_k = out[:, 0].reshape(-1)
    mat_k = out[:, 1].reshape(-1).astype(np.int32)
    at_k = out[:, 2].reshape(-1)

    # brute-force sphere oracle (same near-root-only formula)
    a_np = np.einsum("nk,nk->n", rd, rd)
    oc = ro[:, None, :] - c[None, :, :]
    half_b = np.einsum("nsk,nk->ns", oc, rd)
    cc = np.einsum("nsk,nsk->ns", oc, oc) - (r * r)[None, :]
    disc = half_b * half_b - a_np[:, None] * cc
    sq = np.sqrt(np.maximum(disc, 0.0))
    tt = (-half_b - sq) / a_np[:, None]
    tt = np.where((disc > 0) & (tt > 0), tt, 1e30)
    t_ref = tt.min(axis=1)
    best = tt.argmin(axis=1)
    hit = t_ref < 1e29
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(t_k > 1e29, ~hit)
    np.testing.assert_array_equal(mat_k[hit], best[hit] % 5)
    # shadow: fully-occluding (non-dielectric) sphere inside [0, 4) -> 0.
    # overlap uses the RAW near root (origin-inside-sphere has t0 < 0 and
    # still occludes, wgsl :520)
    t0_raw = (-half_b - sq) / a_np[:, None]
    t1 = (-half_b + sq) / a_np[:, None]
    overlap = (disc > 0) & (t1 > 0) & (t0_raw < 4.0)
    occ_full = (overlap & (np.arange(S)[None, :] % 3 != 0)).any(axis=1)
    assert (at_k[occ_full] == 0.0).all()
    assert (at_k[~overlap.any(axis=1)] == 1.0).all()


class TestFusedKernelSphereBVH:
    """Instanced sphere scene through the dynamic sphere-BVH walk vs the
    XLA integrator AND vs the static cull tree: exact ray counts, image
    bound (same contract as TestFusedKernelBVHMode)."""

    def test_exact_ray_counts_and_image(self):
        from tpurt.kernels.mega_pallas import _use_sph_bvh, freeze_scene
        scene = instanced_scene(48)
        cfg_b = RenderConfig(width=128, height=64, depth=5,
                             pallas_lanes=1024, backend="pallas",
                             pallas_sphere_bvh=True, pallas_bvh_leaf=8)
        cfg_x = RenderConfig(width=128, height=64, depth=5, backend="xla")
        assert _use_sph_bvh(freeze_scene(scene), cfg_b)
        assert len(split_huge_spheres(freeze_scene(scene).spheres)[0]) >= 1
        cam = make_camera((0, 10, -14), (0, 1, 8), vfov=55.0,
                          aspect_ratio=2.0)
        st_b = render(scene, cfg_b, cam, init_state(cfg_b), 77, 2)
        st_x = render(scene, cfg_x, cam, init_state(cfg_x), 77, 2)
        assert float(st_b.rays) == float(st_x.rays) != 0.0
        img_b = np.asarray(resolve_image(cfg_b, st_b))
        img_x = np.asarray(resolve_image(cfg_x, st_x))
        diff = (np.abs(img_b - img_x) > 1e-4).any(axis=-1)
        assert diff.mean() < 0.02, f"{diff.mean():.4f} of pixels diverge"


# ---- chunked (any-size) mesh mode --------------------------------------

@pytest.mark.parametrize("sah", [False, True])
def test_chunked_walk_matches_single_table(sah):
    """The two-phase chunked walk (top-tree worklist + per-chunk HBM->SMEM
    DMA, bvh_pallas.closest_tri_bvh_chunked) returns bit-identical planes
    to the single-SMEM-table walk, and both match the brute-force oracle —
    including with SAH sub-trees (different trees, same hits: per-triangle
    intersection math is tree-independent)."""
    from tpurt.kernels.bvh_pallas import (CHUNK_DMA_VIA_VMEM,
                                          _PackedTable,
                                          build_chunked_tri_tables,
                                          closest_tri_bvh_chunked,
                                          tri_shadow_bvh_chunked)
    T, LEAF, CHUNK, R = 460, 8, 64, 2
    tris, a, e1, e2 = _soup(T, seed=9)
    tab1 = jnp.asarray(pack_tables(*build_tri_bvh_tables(tris, LEAF,
                                                         sah=sah),
                                   leaf_size=LEAF))
    top_tab, slabs, meta = build_chunked_tri_tables(tris, CHUNK, LEAF, sah)
    top_tab, slabs = jnp.asarray(top_tab), jnp.asarray(slabs)
    assert meta["n_chunks"] > 4  # actually exercises multiple chunks

    NR = R * 128
    rng = np.random.default_rng(4)
    ro = rng.uniform(-8, 8, (NR, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (NR, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    o_j = jnp.asarray(ro.T.reshape(3, R, 128))
    d_j = jnp.asarray(rd.T.reshape(3, R, 128))

    def kern1(o_ref, d_ref, tab_ref, out_ref):
        o = (o_ref[0], o_ref[1], o_ref[2])
        d = (d_ref[0], d_ref[1], d_ref[2])
        mask = jnp.ones_like(o[0], bool)
        nodes, tv = packed_views(tab_ref, T)
        t, nrm, mat = closest_tri_bvh(nodes, tv, o, d, mask,
                                      leaf_size=LEAF)
        occ = tri_shadow_bvh(nodes, tv, o, d, jnp.full_like(o[0], 5.0),
                             mask, leaf_size=LEAF)
        out_ref[0] = t
        out_ref[1] = mat.astype(jnp.float32)
        out_ref[2] = jnp.where(occ, 1.0, 0.0)
        out_ref[3] = nrm[0]

    def kern2(o_ref, d_ref, top_ref, hbm_ref, out_ref, *scratch):
        from tpurt.kernels.mega_pallas import chunk_scratch_reset
        chunk_scratch_reset((None, scratch))   # invalidate resident tag
        o = (o_ref[0], o_ref[1], o_ref[2])
        d = (d_ref[0], d_ref[1], d_ref[2])
        mask = jnp.ones_like(o[0], bool)
        top_nodes = _PackedTable(top_ref, 0)
        t, nrm, mat = closest_tri_bvh_chunked(
            top_nodes, hbm_ref, scratch, o, d, mask,
            meta["chunk_cap"], meta["rows_pc"], meta["n_chunks"],
            leaf_size=LEAF)
        occ = tri_shadow_bvh_chunked(
            top_nodes, hbm_ref, scratch, o, d,
            jnp.full_like(o[0], 5.0), mask,
            meta["chunk_cap"], meta["rows_pc"], meta["n_chunks"],
            leaf_size=LEAF)
        out_ref[0] = t
        out_ref[1] = mat.astype(jnp.float32)
        out_ref[2] = jnp.where(occ, 1.0, 0.0)
        out_ref[3] = nrm[0]

    interp = jax.default_backend() != "tpu"
    out1 = pl.pallas_call(
        kern1,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, R, 128), jnp.float32),
        interpret=interp,
    )(o_j, d_j, tab1)
    out2 = pl.pallas_call(
        kern2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, R, 128), jnp.float32),
        # scratch OVERSIZED by 3 rows: pins that the DMA slices its
        # destination to the slab stride (the scratch is shared across
        # chunked primitive kinds and sized to the largest stride)
        scratch_shapes=(
            [pltpu.SMEM((meta["rows_pc"] + 3, 128), jnp.float32)]
            + ([pltpu.VMEM((meta["rows_pc"] + 3, 128), jnp.float32)]
               if CHUNK_DMA_VIA_VMEM else [])
            + [pltpu.SemaphoreType.DMA(())] * (2 if CHUNK_DMA_VIA_VMEM
                                               else 1)
            + [pltpu.SMEM((1,), jnp.int32)]),   # resident-slab tag
        interpret=interp,
    )(o_j, d_j, top_tab, slabs)
    out1, out2 = np.asarray(out1), np.asarray(out2)
    np.testing.assert_array_equal(out1, out2)

    tt = _brute_force(ro, rd, a, e1, e2)
    t_ref = tt.min(axis=1)
    hit = t_ref < 1e29
    t_k = out2[0].reshape(-1)
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        out2[2].reshape(-1) > 0.5, (tt < 5.0).any(axis=1))


class TestFusedKernelChunkedMode:
    """Mesh scene forced through CHUNKED mode (threshold lowered) in the
    regenerative megakernel vs the XLA integrator — and vs the same scene
    through the single-table walk (identical estimator, so identical ray
    counts everywhere)."""

    def _kw(self):
        return dict(width=64, height=32, depth=4, pallas_static_unroll=8,
                    pallas_bvh=True, pallas_bvh_leaf=16, pallas_lanes=256,
                    pallas_cluster_size=0)

    def test_exact_ray_counts_and_image(self):
        from tpurt.kernels.mega_pallas import (_use_tri_bvh,
                                               _use_tri_chunked,
                                               freeze_scene)
        scene = torus_mesh_scene(16, 8)  # ~256 triangles
        kw = self._kw()
        cfg_c = RenderConfig(backend="pallas", pallas_bvh_chunk=64,
                             pallas_bvh_chunk_threshold=100, **kw)
        cfg_s = RenderConfig(backend="pallas", **kw)
        cfg_x = RenderConfig(backend="xla", **kw)
        fs = freeze_scene(scene)
        assert _use_tri_chunked(fs, cfg_c) and not _use_tri_bvh(fs, cfg_c)
        assert _use_tri_bvh(fs, cfg_s) and not _use_tri_chunked(fs, cfg_s)
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=2.0)
        st_c = render(scene, cfg_c, cam, init_state(cfg_c), 77, 2)
        st_s = render(scene, cfg_s, cam, init_state(cfg_s), 77, 2)
        st_x = render(scene, cfg_x, cam, init_state(cfg_x), 77, 2)
        assert float(st_c.rays) == float(st_s.rays) == float(st_x.rays) \
            != 0.0
        # chunked and single-table walk the same tree topology per chunk
        # but in different leaf orders, so allow reassociation flips vs
        # XLA while demanding the two pallas modes agree closely
        img_c = np.asarray(resolve_image(cfg_c, st_c))
        img_x = np.asarray(resolve_image(cfg_x, st_x))
        diff = (np.abs(img_c - img_x) > 1e-4).any(axis=-1)
        assert diff.mean() < 0.02, f"{diff.mean():.4f} of pixels diverge"

    def test_supports_any_size(self):
        from tpurt.kernels.mega_pallas import supports_scene
        scene = torus_mesh_scene(16, 8)
        cfg = RenderConfig(backend="pallas", pallas_bvh_chunk=64,
                           pallas_bvh_chunk_threshold=100, **self._kw())
        assert supports_scene(scene, cfg)
        # chunked off -> the same threshold would reject a huge mesh only
        # beyond MAX_BVH_TRIS (unchanged single-table contract)
        assert supports_scene(scene, cfg.with_(pallas_bvh_chunk=0))


class TestFusedKernelChunkedSpheres:
    """Instanced sphere scene forced through CHUNKED sphere mode
    (threshold lowered) vs the XLA integrator and vs the single-table
    sphere walk — same contract as TestFusedKernelSphereBVH. NOTE: the
    comparison scene/camera must be tie-free (symmetric sphere grids can
    produce exact-equal closest-hit t for mirrored spheres, where sweep
    ORDER picks the winner — a pre-existing reorder sensitivity shared
    by the non-chunked walk, not a chunking defect)."""

    def test_exact_ray_counts_and_image(self):
        from tpurt.kernels.mega_pallas import (_use_sph_bvh,
                                               _use_sph_chunked,
                                               freeze_scene)
        scene = instanced_scene(48)
        kw = dict(width=128, height=64, depth=5, pallas_lanes=1024,
                  pallas_sphere_bvh=True, pallas_bvh_leaf=8)
        cfg_c = RenderConfig(backend="pallas", pallas_bvh_chunk=16,
                             pallas_bvh_chunk_threshold=20, **kw)
        cfg_s = RenderConfig(backend="pallas", **kw)
        cfg_x = RenderConfig(width=128, height=64, depth=5, backend="xla")
        fs = freeze_scene(scene)
        assert _use_sph_chunked(fs, cfg_c) and not _use_sph_bvh(fs, cfg_c)
        assert _use_sph_bvh(fs, cfg_s)
        cam = make_camera((0, 10, -14), (0, 1, 8), vfov=55.0,
                          aspect_ratio=2.0)
        st_c = render(scene, cfg_c, cam, init_state(cfg_c), 77, 2)
        st_s = render(scene, cfg_s, cam, init_state(cfg_s), 77, 2)
        st_x = render(scene, cfg_x, cam, init_state(cfg_x), 77, 2)
        assert float(st_c.rays) == float(st_s.rays) == float(st_x.rays) \
            != 0.0
        img_c = np.asarray(resolve_image(cfg_c, st_c))
        img_x = np.asarray(resolve_image(cfg_x, st_x))
        diff = (np.abs(img_c - img_x) > 1e-4).any(axis=-1)
        assert diff.mean() < 0.02, f"{diff.mean():.4f} of pixels diverge"


def test_dual_chunked_tri_and_spheres():
    """A scene where BOTH primitive kinds exceed their (test-lowered)
    chunk thresholds: two HBM slab inputs share one SMEM scratch (the
    walks never overlap in time). Ray counts must still be exact vs the
    XLA integrator."""
    import math as _math
    from tpurt.kernels.mega_pallas import (_use_sph_chunked,
                                           _use_tri_chunked, freeze_scene)
    from tpurt.scene import (Light, Material, MeshData, Sphere,
                             build_scene, torus_mesh_scene)
    base = torus_mesh_scene(16, 8)  # ~256 triangles
    # rebuild with a grid of extra spheres so the sphere side chunks too
    rng = np.random.default_rng(5)
    materials = [Material.diffuse((0.75, 0.75, 0.75)),
                 Material.dielectric(1.5, 0.0),
                 Material.diffuse((0.85, 0.25, 0.2))]
    spheres = [Sphere(0, 1000.0, (0.0, -1000.0, 0.0))]
    for i in range(40):
        x = (i % 8 - 4) * 1.7 + float(rng.uniform(-0.3, 0.3))
        z = (i // 8 - 2) * 1.7 + 4.0 + float(rng.uniform(-0.3, 0.3))
        r = float(rng.uniform(0.25, 0.5))
        spheres.append(Sphere(int(rng.integers(0, 3)), r, (x, r, z)))
    verts = np.empty((16 * 8, 3), np.float32)
    for i in range(16):
        for j in range(8):
            u = 2.0 * _math.pi * i / 16
            v = 2.0 * _math.pi * j / 8
            verts[i * 8 + j] = ((1.6 + 0.55 * _math.cos(v)) * _math.cos(u),
                                0.55 * _math.sin(v) + 1.55,
                                (1.6 + 0.55 * _math.cos(v)) * _math.sin(u))
    faces = []
    for i in range(16):
        for j in range(8):
            a0 = i * 8 + j
            b0 = ((i + 1) % 16) * 8 + j
            c0 = ((i + 1) % 16) * 8 + (j + 1) % 8
            d0 = i * 8 + (j + 1) % 8
            faces.append((a0, c0, b0))
            faces.append((a0, d0, c0))
    mesh = MeshData(material_id=2, translation=(0.0, 0.0, 6.0))
    mesh.add_triangles(verts, np.asarray(faces, np.int32))
    lights = [Light.square_area([3, 8, 2], [-0.4, -1.0, 0.3], 2.5,
                                [1.0, 1.0, 1.0], 6.0, 5000.0)]
    scene = build_scene(materials, spheres, [mesh], lights)

    kw = dict(width=64, height=32, depth=4, pallas_static_unroll=8,
              pallas_bvh=True, pallas_sphere_bvh=True, pallas_bvh_leaf=16,
              pallas_bvh_chunk=32, pallas_bvh_chunk_threshold=20,
              pallas_lanes=256, pallas_cluster_size=0)
    cfg_c = RenderConfig(backend="pallas", **kw)
    cfg_x = RenderConfig(backend="xla", **kw)
    fs = freeze_scene(scene)
    assert _use_tri_chunked(fs, cfg_c) and _use_sph_chunked(fs, cfg_c)
    cam = make_camera((0, 4, -7), (0, 1.2, 2), vfov=55.0,
                      aspect_ratio=2.0)
    st_c = render(scene, cfg_c, cam, init_state(cfg_c), 31, 2)
    st_x = render(scene, cfg_x, cam, init_state(cfg_x), 31, 2)
    assert float(st_c.rays) == float(st_x.rays) != 0.0
    img_c = np.asarray(resolve_image(cfg_c, st_c))
    img_x = np.asarray(resolve_image(cfg_x, st_x))
    diff = (np.abs(img_c - img_x) > 1e-4).any(axis=-1)
    assert diff.mean() < 0.02, f"{diff.mean():.4f} of pixels diverge"


def test_chunked_with_cluster_rows_and_prefetch():
    """Chunked mode composed with pallas_bvh_rows (cluster-predicated
    leaf sweeps — the inner walk must request the per-leaf want vote) and
    pallas_chunk_prefetch: both must be bit-identical to the plain
    chunked render. The camera also leaves some tiles entirely off-mesh,
    exercising the empty-worklist prefetch warmup."""
    scene = torus_mesh_scene(16, 8)
    kw = dict(width=64, height=32, depth=4, pallas_static_unroll=8,
              pallas_bvh=True, pallas_bvh_leaf=16, pallas_bvh_chunk=64,
              pallas_bvh_chunk_threshold=100, pallas_lanes=256,
              pallas_cluster_size=0, backend="pallas")
    cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0, aspect_ratio=2.0)
    base = RenderConfig(**kw)
    st0 = render(scene, base, cam, init_state(base), 77, 2)
    for variant in (base.with_(pallas_bvh_rows=1),
                    base.with_(pallas_chunk_prefetch=True),
                    base.with_(pallas_bvh_rows=1,
                               pallas_chunk_prefetch=True)):
        st = render(scene, variant, cam, init_state(variant), 77, 2)
        assert float(st.rays) == float(st0.rays) != 0.0
        np.testing.assert_array_equal(np.asarray(st.rgb_sum),
                                      np.asarray(st0.rgb_sum))


def test_supports_scene_chunk_gap_band():
    """A raised chunk threshold must NOT claim support for counts in the
    gap band (MAX_BVH_TRIS, threshold] — those scenes have no fused mode
    and must fall back to XLA, not the flat SMEM sweep."""
    from tpurt.kernels.mega_pallas import supports_scene
    scene = torus_mesh_scene(32, 16)  # 1024 triangles
    kw = dict(pallas_bvh=True, pallas_static_unroll=8, backend="pallas")
    # threshold above the scene size: chunked does NOT engage, and the
    # single-table walk only covers <= MAX_BVH_TRIS; 1024 fits -> True
    assert supports_scene(scene, RenderConfig(
        pallas_bvh_chunk=64, pallas_bvh_chunk_threshold=2000, **kw))
    # gap band: threshold raised past the count while the count exceeds
    # the single-table budget -> unsupported (simulated by shrinking the
    # budget comparison via a threshold between; use a scene > threshold)
    cfg_gap = RenderConfig(pallas_bvh_chunk=64,
                           pallas_bvh_chunk_threshold=100, **kw)
    assert supports_scene(scene, cfg_gap)  # 1024 > 100 -> chunked engages
    from tpurt.kernels.mega_pallas import _use_tri_chunked, freeze_scene
    assert _use_tri_chunked(freeze_scene(scene), cfg_gap)
    # and with chunking disabled the same scene still fits the
    # single-table walk (1024 <= MAX_BVH_TRIS)
    assert supports_scene(scene, RenderConfig(pallas_bvh_chunk=0, **kw))
    # the TRUE gap band: a mesh past the single-table budget whose
    # threshold is raised beyond its size -> no fused mode -> False
    big = torus_mesh_scene(105, 105)  # 22050 > MAX_BVH_TRIS
    assert not supports_scene(big, RenderConfig(
        pallas_bvh_chunk=2048, pallas_bvh_chunk_threshold=30000, **kw))
    assert supports_scene(big, RenderConfig(pallas_bvh_chunk=2048, **kw))


def test_supports_scene_huge_spheres_over_total_budget():
    """The sphere BVH/chunk budgets bound the TREE side of the
    huge-sphere split: a scene whose tree side fits MAX_BVH_SPHERES must
    stay supported even when huge always-swept spheres push the TOTAL
    past it."""
    from tpurt.kernels.bvh_pallas import (MAX_BVH_SPHERES,
                                          n_tree_spheres)
    from tpurt.kernels.mega_pallas import supports_scene
    from tpurt.scene import Light, Material, Sphere, build_scene
    rng = np.random.default_rng(2)
    mats = [Material.diffuse((0.7, 0.7, 0.7))]
    spheres = [Sphere(0, 1000.0, (0.0, -1000.0, 0.0)),
               Sphere(0, 900.0, (0.0, 0.0, 3000.0))]
    n_small = MAX_BVH_SPHERES - 1
    for i in range(n_small):
        spheres.append(Sphere(0, 0.5,
                              (float(rng.uniform(-99, 99)), 0.5,
                               float(rng.uniform(-99, 99)))))
    lights = [Light.point((0, 50, 0), (1, 1, 1), 10.0, 5500.0)]
    scene = build_scene(mats, spheres, [], lights)
    assert scene.num_spheres == n_small + 2 > MAX_BVH_SPHERES
    assert n_tree_spheres(scene.sph_radius) == n_small <= MAX_BVH_SPHERES
    cfg = RenderConfig(backend="pallas", pallas_sphere_bvh=True)
    assert supports_scene(scene, cfg)
    assert supports_scene(scene, cfg.with_(pallas_bvh_chunk=0))


def test_split_huge_keeps_largest_radii_over_cap():
    """When more than MAX_ALWAYS_SPHERES spheres are scene-spanning, the
    always set must keep the N LARGEST radii — in particular the strictly
    largest sphere must never be demoted into the tree by index order."""
    import warnings

    from tpurt.kernels.bvh_pallas import MAX_ALWAYS_SPHERES
    from tpurt.kernels.mega_pallas import _FSphere

    def fs(r, i):
        return _FSphere(c=(float(i), 0.0, 0.0), r=float(r), mat=0,
                        mtype=0, ior=1.0)

    # 8 equal huge spheres first, the strictly-largest LAST, plus a
    # population of small ones so the median keeps them all "huge"
    spheres = tuple(fs(100.0, i) for i in range(MAX_ALWAYS_SPHERES)) \
        + (fs(1000.0, 99),) + tuple(fs(1.0, 200 + i) for i in range(24))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        always, tree = split_huge_spheres(spheres)
    assert len(always) == MAX_ALWAYS_SPHERES
    assert max(sp.r for sp in always) == 1000.0, \
        "largest sphere must be on the always side"
    assert sum(1 for sp in tree if sp.r == 100.0) == 1  # one tie demoted
    assert len(always) + len(tree) == len(spheres)


def test_fused_entry_points_fall_back_to_xla_beyond_budget():
    """Direct render_regen/render_pallas calls on a scene beyond the fused
    budgets (chunked mode disabled) must run the XLA integrator — never
    build the oversized SMEM tables (VERDICT-r2 review finding)."""
    from tpurt import (RenderConfig, init_state, make_camera,
                       torus_mesh_scene)
    from tpurt.kernels import mega_pallas as mp
    from tpurt.kernels import mega_regen as mr
    from tpurt.render import _render_xla

    scene = torus_mesh_scene(72, 60)  # 8640 tris > MAX_BVH_TRIS
    cfg = RenderConfig(width=32, height=16, depth=2, backend="pallas",
                       pallas_lanes=256, pallas_bvh_chunk=0,
                       k_photons=1, max_photon_bounces=1)
    assert not mp.supports_scene(scene, cfg)
    cam = make_camera((0.0, 3.0, -6.0), (0.0, 1.5, 0.0), vfov=55.0,
                      aspect_ratio=2.0)
    ref = _render_xla(scene, cfg, cam, init_state(cfg), 7, 1)

    st_r = mr.render_regen(scene, cfg, cam, init_state(cfg), 7, 1)
    st_p = mp.render_pallas(scene, cfg, cam, init_state(cfg), 7, 1)
    for st in (st_r, st_p):
        assert float(st.rays) == float(ref.rays) != 0.0
        np.testing.assert_array_equal(np.asarray(st.rgb_sum),
                                      np.asarray(ref.rgb_sum))

    # preview depth override goes through the same fallback
    st_d = mr.render_regen(scene, cfg, cam, init_state(cfg), 7, 1, depth=1)
    assert 0.0 < float(st_d.rays) < float(ref.rays)


# ----- wide-branching BVH (cfg.pallas_bvh_width, round 5) -----

def test_collapse_wide_invariants():
    """accel.collapse_wide keeps the binary tree's leaves and permutation
    verbatim, produces a contained/reachable-once wide tree, and its
    worst-case traversal stack fits the kernel budget."""
    from tpurt import accel
    from tpurt.kernels.bvh_pallas import STACK_DEPTH

    tris, a, e1, e2 = _soup(700, seed=13)
    v1, v2 = a + e1, a + e2
    lo = np.minimum(a, np.minimum(v1, v2))
    hi = np.maximum(a, np.maximum(v1, v2))
    for K in (2, 8):
        b = accel.build_bvh(lo, hi, max_prims=K)
        for w in (3, 4, 8):
            wide = accel.collapse_wide(b, w)
            accel.validate_wide_bvh(wide, b)
            assert wide.children.shape[1] == w
            assert accel.wide_max_stack(wide) <= STACK_DEPTH - 1
            # the collapse must actually widen: fewer nodes than binary
            assert wide.bbox_min.shape[0] < b.bbox_min.shape[0]
    # single-leaf tree (root is a leaf)
    b1 = accel.build_bvh(lo[:3], hi[:3], max_prims=4)
    w1 = accel.collapse_wide(b1, 4)
    accel.validate_wide_bvh(w1, b1)


@pytest.mark.parametrize("width,leaf", [(4, 8), (8, 0), (8, 8)])
def test_wide_walk_matches_brute_force(width, leaf):
    """The wide walk (single-table) returns the same hits as the
    brute-force oracle AND bit-identical planes to the binary walk on a
    tie-free random soup — the tree shape changes visit order only."""
    T = 300
    tris, a, e1, e2 = _soup(T)
    tabs = {}
    for w in (0, width):
        tri_tab, node_f, node_i = build_tri_bvh_tables(tris, leaf_size=8,
                                                       width=w)
        tabs[w] = jnp.asarray(pack_tables(tri_tab, node_f, node_i,
                                          leaf_size=max(8, leaf)))

    R = 2
    NR = R * 128
    rng = np.random.default_rng(11)
    ro = rng.uniform(-8, 8, (NR, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (NR, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    o_j = jnp.asarray(ro.T.reshape(3, R, 128))
    d_j = jnp.asarray(rd.T.reshape(3, R, 128))

    def make_kernel(w):
        def kernel(o_ref, d_ref, tab_ref, out_ref):
            o = (o_ref[0], o_ref[1], o_ref[2])
            d = (d_ref[0], d_ref[1], d_ref[2])
            mask = jnp.ones_like(o[0], bool)
            nodes, tv = packed_views(tab_ref, T)
            t, nrm, mat = closest_tri_bvh(nodes, tv, o, d, mask,
                                          leaf_size=leaf, width=w)
            occ = tri_shadow_bvh(nodes, tv, o, d,
                                 jnp.full_like(o[0], 4.0), mask,
                                 leaf_size=leaf, width=w)
            out_ref[0] = t
            out_ref[1] = mat.astype(jnp.float32)
            out_ref[2] = jnp.where(occ, 1.0, 0.0)
            out_ref[3] = nrm[0]
        return kernel

    outs = {}
    for w in (0, width):
        outs[w] = np.asarray(pl.pallas_call(
            make_kernel(w),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, R, 128), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(o_j, d_j, tabs[w]))
    np.testing.assert_array_equal(outs[0], outs[width])

    tt = _brute_force(ro, rd, a, e1, e2)
    t_ref = tt.min(axis=1)
    hit = t_ref < 1e29
    t_k = outs[width][0].reshape(-1)
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(t_k > 1e29, ~hit)
    np.testing.assert_array_equal(outs[width][2].reshape(-1) > 0.5,
                                  (tt < 4.0).any(axis=1))


@pytest.mark.parametrize("width", [4, 8])
def test_wide_walk_nan_slab_votes_hit(width):
    """Axis-aligned rays whose origin sits EXACTLY on a node-box plane
    with a zero direction component produce tn = NaN (0*inf) in the slab
    test.  The negated compares make such lanes vote HIT (conservative,
    like the binary walk), and the ordered wide walk's single key-reduce
    must not let the NaN poison the push vote — a poisoned key silently
    DROPPED the whole voted subtree for every lane of the tile
    (regression: the key is NaN-sanitized to -inf; the binary walk was
    never affected, its push vote is any(v))."""
    G, Z = 6, 4          # 6x6 quad grid at z = 1..4  ->  288 tris
    tris = []
    a_l, e1_l, e2_l = [], [], []
    for z in range(1, Z + 1):
        for i in range(G):
            for j in range(G):
                for (av, e1v, e2v) in (
                        ((i, j, z), (1, 0, 0), (0, 1, 0)),
                        ((i + 1, j + 1, z), (-1, 0, 0), (0, -1, 0))):
                    tris.append(_FT(av, e1v, e2v, (0, 0, 1),
                                    len(tris) % 7))
                    a_l.append(av); e1_l.append(e1v); e2_l.append(e2v)
    T = len(tris)
    a = np.array(a_l, np.float32)
    e1 = np.array(e1_l, np.float32)
    e2 = np.array(e2_l, np.float32)

    tabs = {}
    for w in (0, width):
        tri_tab, node_f, node_i = build_tri_bvh_tables(tris, leaf_size=8,
                                                       width=w)
        tabs[w] = jnp.asarray(pack_tables(tri_tab, node_f, node_i,
                                          leaf_size=8))

    # all rays fire straight down +z (d.x = d.y = 0); x/y mix EXACT
    # integer box planes (the NaN lanes) with interior half-integers
    R = 2
    NR = R * 128
    xs = np.tile(np.arange(NR) % (G + 1), 1).astype(np.float32)      # 0..6
    ys = ((np.arange(NR) // (G + 1)) % (2 * G)).astype(np.float32) / 2.0
    ro = np.stack([xs, ys, np.full(NR, -3.0, np.float32)], axis=1)
    rd = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (NR, 1))
    o_j = jnp.asarray(ro.T.reshape(3, R, 128))
    d_j = jnp.asarray(rd.T.reshape(3, R, 128))

    def make_kernel(w):
        def kernel(o_ref, d_ref, tab_ref, out_ref):
            o = (o_ref[0], o_ref[1], o_ref[2])
            d = (d_ref[0], d_ref[1], d_ref[2])
            mask = jnp.ones_like(o[0], bool)
            nodes, tv = packed_views(tab_ref, T)
            t, nrm, mat = closest_tri_bvh(nodes, tv, o, d, mask, width=w)
            occ = tri_shadow_bvh(nodes, tv, o, d,
                                 jnp.full_like(o[0], 5.5), mask, width=w)
            out_ref[0] = t
            out_ref[1] = jnp.where(occ, 1.0, 0.0)
        return kernel

    outs = {}
    for w in (0, width):
        outs[w] = np.asarray(pl.pallas_call(
            make_kernel(w),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, R, 128), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(o_j, d_j, tabs[w]))
    # t and occlusion planes must match the binary walk exactly (shared-
    # edge hits tie at the same t, so the t plane is order-independent)
    np.testing.assert_array_equal(outs[0], outs[width])

    tt = _brute_force(ro, rd, a, e1, e2)
    t_ref = tt.min(axis=1)
    hit = t_ref < 1e29
    assert hit.sum() > NR // 2     # the grid rays really do hit geometry
    t_k = outs[width][0].reshape(-1)
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(t_k > 1e29, ~hit)


@pytest.mark.parametrize("width", [4, 8])
def test_wide_sphere_walk_matches_binary(width):
    """Sphere closest-hit + Fresnel shadow walks under the wide collapse
    return bit-identical planes to the binary walk."""
    S = 120
    rng = np.random.default_rng(21)
    c = rng.uniform(-5, 5, (S, 3)).astype(np.float32)
    r = rng.uniform(0.2, 0.6, S).astype(np.float32)
    sphs = [_FS(c[i], r[i], i % 5, mtype=int(i % 3 == 0), ior=1.5)
            for i in range(S)]

    R = 2
    NR = R * 128
    ro = rng.uniform(-7, 7, (NR, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (NR, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    o_j = jnp.asarray(ro.T.reshape(3, R, 128))
    d_j = jnp.asarray(rd.T.reshape(3, R, 128))

    outs = {}
    for w in (0, width):
        tab = jnp.asarray(pack_tables(
            *build_sphere_bvh_tables(sphs, leaf_size=8, width=w),
            leaf_size=8))

        def kernel(o_ref, d_ref, tab_ref, out_ref, w=w):
            o = (o_ref[0], o_ref[1], o_ref[2])
            d = (d_ref[0], d_ref[1], d_ref[2])
            mask = jnp.ones_like(o[0], bool)
            a_ = jnp.ones_like(o[0])
            nodes, sv = packed_views(tab_ref, S)
            st0 = (jnp.full_like(o[0], 1e30), (jnp.zeros_like(o[0]),) * 3,
                   jnp.zeros_like(o[0], jnp.int32))
            t, cc, mat = closest_sphere_bvh(nodes, sv, o, d, a_, mask, st0,
                                            leaf_size=8, width=w)
            att = sphere_shadow_bvh(nodes, sv, o, d,
                                    jnp.full_like(o[0], 6.0),
                                    jnp.full_like(o[0], 550.0), a_, mask,
                                    jnp.ones_like(o[0]), leaf_size=8,
                                    width=w)
            out_ref[0] = t
            out_ref[1] = mat.astype(jnp.float32)
            out_ref[2] = att

        outs[w] = np.asarray(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, R, 128), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(o_j, d_j, tab))
    np.testing.assert_array_equal(outs[0], outs[width])
    assert (outs[width][0] < 1e29).any()     # some hits
    assert (outs[width][2] < 1.0).any()      # some occlusion


def test_wide_chunked_matches_binary_chunked():
    """Chunked mode with wide top + sub trees returns bit-identical planes
    to binary chunked mode (same record layout; `first` stays column 2)."""
    from tpurt.kernels.bvh_pallas import (CHUNK_DMA_VIA_VMEM, _PackedTable,
                                          build_chunked_tri_tables,
                                          closest_tri_bvh_chunked,
                                          tri_shadow_bvh_chunked)
    T, LEAF, CHUNK, R = 460, 8, 64, 2
    tris, a, e1, e2 = _soup(T, seed=9)

    NR = R * 128
    rng = np.random.default_rng(4)
    ro = rng.uniform(-8, 8, (NR, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (NR, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    o_j = jnp.asarray(ro.T.reshape(3, R, 128))
    d_j = jnp.asarray(rd.T.reshape(3, R, 128))

    outs = {}
    for w in (0, 4):
        top_tab, slabs, meta = build_chunked_tri_tables(tris, CHUNK, LEAF,
                                                        width=w)
        top_tab, slabs = jnp.asarray(top_tab), jnp.asarray(slabs)
        assert meta["n_chunks"] > 4

        def kern(o_ref, d_ref, top_ref, hbm_ref, out_ref, *scratch,
                 w=w, meta=meta):
            from tpurt.kernels.mega_pallas import chunk_scratch_reset
            chunk_scratch_reset((None, scratch))
            o = (o_ref[0], o_ref[1], o_ref[2])
            d = (d_ref[0], d_ref[1], d_ref[2])
            mask = jnp.ones_like(o[0], bool)
            top_nodes = _PackedTable(top_ref, 0)
            t, nrm, mat = closest_tri_bvh_chunked(
                top_nodes, hbm_ref, scratch, o, d, mask,
                meta["chunk_cap"], meta["rows_pc"], meta["n_chunks"],
                leaf_size=LEAF, width=w)
            occ = tri_shadow_bvh_chunked(
                top_nodes, hbm_ref, scratch, o, d,
                jnp.full_like(o[0], 5.0), mask,
                meta["chunk_cap"], meta["rows_pc"], meta["n_chunks"],
                leaf_size=LEAF, width=w)
            out_ref[0] = t
            out_ref[1] = mat.astype(jnp.float32)
            out_ref[2] = jnp.where(occ, 1.0, 0.0)
            out_ref[3] = nrm[0]

        outs[w] = np.asarray(pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, R, 128), jnp.float32),
            scratch_shapes=(
                [pltpu.SMEM((meta["rows_pc"], 128), jnp.float32)]
                + ([pltpu.VMEM((meta["rows_pc"], 128), jnp.float32)]
                   if CHUNK_DMA_VIA_VMEM else [])
                + [pltpu.SemaphoreType.DMA(())] * (2 if CHUNK_DMA_VIA_VMEM
                                                   else 1)
                + [pltpu.SMEM((1,), jnp.int32)]),
            interpret=jax.default_backend() != "tpu",
        )(o_j, d_j, top_tab, slabs))
    np.testing.assert_array_equal(outs[0], outs[4])

    tt = _brute_force(ro, rd, a, e1, e2)
    t_ref = tt.min(axis=1)
    hit = t_ref < 1e29
    t_k = outs[4][0].reshape(-1)
    np.testing.assert_allclose(t_k[hit], t_ref[hit], rtol=1e-5, atol=1e-5)


class TestFusedKernelWideBVH:
    """Mesh scene through the fused kernel with pallas_bvh_width=4/8 vs
    the binary walk: identical estimator (exact ray counts), image equal
    up to visit-order tie flips (same contract as the SAH tree test)."""

    def _cfgs(self, width):
        kw = dict(width=128, height=64, depth=5, pallas_lanes=1024,
                  pallas_cluster_size=0, pallas_static_unroll=8,
                  pallas_bvh=True, pallas_bvh_leaf=8)
        return (RenderConfig(backend="pallas", pallas_bvh_width=width,
                             **kw),
                RenderConfig(backend="pallas", **kw))

    @pytest.mark.parametrize("width", [4, 8])
    def test_matches_binary_walk(self, width):
        from tpurt.kernels.mega_pallas import _use_tri_bvh, freeze_scene
        scene = torus_mesh_scene(8, 4)
        cfg_w, cfg_b = self._cfgs(width)
        assert _use_tri_bvh(freeze_scene(scene), cfg_w)
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=2.0)
        st_w = render(scene, cfg_w, cam, init_state(cfg_w), 77, 2)
        st_b = render(scene, cfg_b, cam, init_state(cfg_b), 77, 2)
        assert float(st_w.rays) == float(st_b.rays) != 0.0
        img_w = np.asarray(resolve_image(cfg_w, st_w))
        img_b = np.asarray(resolve_image(cfg_b, st_b))
        diff = (np.abs(img_w - img_b) > 1e-4).any(axis=-1)
        assert diff.mean() < 0.02, f"{diff.mean():.4f} of pixels diverge"
