"""Intersection ops vs scalar oracles (mega_kernel.wgsl:279-428,500-564) and
BVH-vs-brute-force equivalence on random rays."""

import numpy as np
import jax.numpy as jnp

from tpurt import accel
from tpurt.ops import intersect as I

rng = np.random.default_rng(11)


def sphere_oracle(o, d, c, r):
    oc = o - c
    a = d @ d
    hb = oc @ d
    cc = oc @ oc - r * r
    disc = hb * hb - a * cc
    if disc <= 0:
        return None
    return (-hb - np.sqrt(disc)) / a


def mt_oracle(o, d, a, b, c):
    eps = 1.17549435e-38
    e1, e2 = b - a, c - a
    h = np.cross(d, e2)
    det = e1 @ h
    if abs(det) < eps:
        return None
    inv = 1.0 / det
    s = o - a
    u = inv * (s @ h)
    if u < 0 or u > 1:
        return None
    q = np.cross(s, e1)
    v = inv * (d @ q)
    if v < 0 or u + v > 1:
        return None
    t = inv * (e2 @ q)
    return t if t > eps else None


def _random_rays(n):
    o = rng.normal(size=(n, 3)).astype(np.float32) * 3
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return o, d


def test_sphere_candidates_vs_oracle():
    o, d = _random_rays(128)
    centers = rng.normal(size=(16, 3)).astype(np.float32) * 2
    radii = rng.uniform(0.2, 2.0, 16).astype(np.float32)
    t, valid = I.sphere_candidates(jnp.asarray(o), jnp.asarray(d),
                                   jnp.asarray(centers), jnp.asarray(radii))
    t, valid = np.asarray(t), np.asarray(valid)
    for i in range(128):
        for j in range(16):
            want = sphere_oracle(o[i].astype(np.float64), d[i].astype(np.float64),
                                 centers[j].astype(np.float64), float(radii[j]))
            if want is not None and want > 1e-4:
                assert valid[i, j], (i, j)
                np.testing.assert_allclose(t[i, j], want, rtol=1e-3, atol=1e-4)
            elif want is None:
                assert not valid[i, j] or t[i, j] <= 1e-4


def test_closest_sphere_hit_semantics():
    # ray through two spheres picks the nearer; hit point pulled back 0.9999
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    centers = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 3.0]])
    radii = jnp.asarray([1.0, 0.5])
    mats = jnp.asarray([0, 1], jnp.int32)
    h = I.closest_sphere_hit(o, d, centers, radii, mats)
    assert abs(float(h["t"][0]) - 2.5) < 1e-5
    assert int(h["mat"][0]) == 1
    np.testing.assert_allclose(np.asarray(h["loc"])[0], [0, 0, 2.5 * 0.9999], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h["normal"])[0], [0, 0, -1], atol=1e-3)


def test_closest_sphere_miss():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    centers = jnp.asarray([[0.0, -5.0, 0.0]])
    radii = jnp.asarray([1.0])
    h = I.closest_sphere_hit(o, d, centers, radii, jnp.asarray([0], jnp.int32))
    assert float(h["t"][0]) >= float(I.MISS)


def test_triangle_candidates_vs_oracle():
    o, d = _random_rays(128)
    a = rng.normal(size=(32, 3)).astype(np.float32) * 2
    b = a + rng.normal(size=(32, 3)).astype(np.float32)
    c = a + rng.normal(size=(32, 3)).astype(np.float32)
    t, valid = I.triangle_candidates(jnp.asarray(o), jnp.asarray(d),
                                     jnp.asarray(a), jnp.asarray(b - a), jnp.asarray(c - a))
    t, valid = np.asarray(t), np.asarray(valid)
    for i in range(0, 128, 4):
        for j in range(32):
            want = mt_oracle(o[i].astype(np.float64), d[i].astype(np.float64),
                             a[j].astype(np.float64), b[j].astype(np.float64),
                             c[j].astype(np.float64))
            if want is not None and want > 1e-4:
                assert valid[i, j]
                np.testing.assert_allclose(t[i, j], want, rtol=1e-3, atol=1e-4)


def test_degenerate_triangle_padding_never_hits():
    o, d = _random_rays(32)
    z = jnp.zeros((8, 3))
    t, valid = I.triangle_candidates(jnp.asarray(o), jnp.asarray(d), z, z, z)
    assert not bool(np.asarray(valid).any())


def test_ray_aabb_basic():
    o = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 0.0, -5.0], [5.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    bmin = jnp.asarray([-1.0, -1.0, -1.0])
    bmax = jnp.asarray([1.0, 1.0, 1.0])
    hit = np.asarray(I.ray_aabb(o, d, bmin, bmax))
    assert list(hit) == [True, False, False]


def test_ray_aabb_inside_and_parallel():
    # origin inside the box always hits; parallel ray outside slab misses
    o = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    bmin = jnp.asarray([-1.0, -1.0, -1.0])
    bmax = jnp.asarray([1.0, 1.0, 1.0])
    hit = np.asarray(I.ray_aabb(o, d, bmin, bmax))
    assert list(hit) == [True, False]


def _random_mesh(T=200):
    a = rng.normal(size=(T, 3)).astype(np.float32) * 4
    b = a + rng.normal(size=(T, 3)).astype(np.float32) * 0.8
    c = a + rng.normal(size=(T, 3)).astype(np.float32) * 0.8
    return a, b, c


def test_bvh_traversal_equals_brute_force():
    a, b, c = _random_mesh()
    e1, e2 = b - a, c - a
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    mat = rng.integers(0, 4, a.shape[0]).astype(np.int32)

    tri_min = np.minimum(np.minimum(a, b), c)
    tri_max = np.maximum(np.maximum(a, b), c)
    bvh = accel.build_bvh(tri_min, tri_max, max_prims=2)
    accel.validate_bvh(bvh, tri_min, tri_max)

    p = bvh.order
    bvh_dict = {
        "bbox_min": jnp.asarray(bvh.bbox_min), "bbox_max": jnp.asarray(bvh.bbox_max),
        "left": jnp.asarray(bvh.left), "right": jnp.asarray(bvh.right),
        "first": jnp.asarray(bvh.first), "count": jnp.asarray(bvh.count),
        "tri_a": jnp.asarray(a[p]), "tri_e1": jnp.asarray(e1[p]),
        "tri_e2": jnp.asarray(e2[p]), "tri_n": jnp.asarray(n[p]),
        "tri_mat": jnp.asarray(mat[p]),
    }

    o, d = _random_rays(256)
    brute = I.closest_triangle_hit(
        jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(a[p]), jnp.asarray(e1[p]), jnp.asarray(e2[p]),
        jnp.asarray(n[p]), jnp.asarray(mat[p]))
    via_bvh = I.bvh_hit(jnp.asarray(o), jnp.asarray(d), bvh_dict, max_leaf=2)

    bt, vt = np.asarray(brute["t"]), np.asarray(via_bvh["t"])
    hit_b = bt < 1e29
    hit_v = vt < 1e29
    np.testing.assert_array_equal(hit_b, hit_v)
    np.testing.assert_allclose(bt[hit_b], vt[hit_v], rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(brute["mat"])[hit_b], np.asarray(via_bvh["mat"])[hit_v])


def test_shadow_attenuation_semantics():
    # diffuse sphere blocks fully; dielectric sphere transmits (1-R1)(1-R2)
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 3)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    t_max = jnp.asarray([10.0, 10.0, 2.0])  # 3rd ray stops before sphere
    centers = jnp.asarray([[0.0, 0.0, 5.0]])
    radii = jnp.asarray([1.0])
    lam = jnp.full((3,), 550.0)
    empty3 = jnp.zeros((0, 3))

    # diffuse occluder
    a0 = I.shadow_attenuation(o, d, t_max, lam, centers, radii,
                              jnp.asarray([0], jnp.int32), jnp.asarray([1.0]),
                              empty3, empty3, empty3)
    a0 = np.asarray(a0)
    assert a0[0] == 0.0 and a0[1] == 0.0 and a0[2] == 1.0

    # dielectric occluder: normal incidence R = ((n-1)/(n+1))^2 at both faces
    from tpurt.ops.spectra import cauchy_ior
    eta = float(cauchy_ior(jnp.float32(1.5), jnp.float32(550.0)))
    R = ((eta - 1) / (eta + 1)) ** 2
    a1 = I.shadow_attenuation(o, d, t_max, lam, centers, radii,
                              jnp.asarray([1], jnp.int32), jnp.asarray([1.5]),
                              empty3, empty3, empty3)
    np.testing.assert_allclose(np.asarray(a1)[0], (1 - R) ** 2, rtol=1e-4)
    assert np.asarray(a1)[2] == 1.0


def test_sphere_shadow_factor_c_metal_occludes():
    """The component-form shadow mirror must occlude metal (mtype 2) fully
    like the batched twin and the reference (wgsl :521) — regression: it
    used to let everything but diffuse transmit like glass."""
    from tpurt.ops.soa import sphere_shadow_factor_c
    o = tuple(jnp.zeros((4,)) for _ in range(3))
    d = (jnp.zeros((4,)), jnp.zeros((4,)), jnp.ones((4,)))
    t_max = jnp.full((4,), 10.0)
    lam = jnp.full((4,), 550.0)
    for mtype, expect_dark in ((0, True), (2, True), (1, False)):
        f = np.asarray(sphere_shadow_factor_c(
            o, d, t_max, lam, (0.0, 0.0, 5.0), 1.0, float(mtype), 1.5))
        if expect_dark:
            assert (f == 0.0).all(), (mtype, f)
        else:
            assert (0.0 < f).all() and (f < 1.0).all(), (mtype, f)


def test_shadow_triangles_block():
    o = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t_max = jnp.asarray([10.0, 10.0])
    lam = jnp.full((2,), 550.0)
    # big triangle at z=3 covering the origin ray only
    a = jnp.asarray([[-2.0, -2.0, 3.0]])
    e1 = jnp.asarray([[4.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 4.0, 0.0]])
    at = I.shadow_attenuation(o, d, t_max, lam,
                              jnp.zeros((0, 3)), jnp.zeros((0,)),
                              jnp.zeros((0,), jnp.int32), jnp.zeros((0,)),
                              a, e1, e2)
    at = np.asarray(at)
    assert at[0] == 0.0 and at[1] == 1.0
