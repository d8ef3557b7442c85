"""Public ray-query API (tpurt/query.py): batched closest-hit and
occlusion queries exposing the render path's intersector
(ref: mega_kernel.wgsl:330-428 intersect, :505-566 shadow_factor).

Contracts:
  * closest-hit agrees with analytic sphere math (and with the AOV pass,
    which uses the same intersector through a camera);
  * miss lanes are fully masked (hit=False, mat_id=mtype=-1, zeros);
  * unnormalized directions return t in units of |d| (reference camera
    rays are unnormalized, wgsl :897);
  * occlusion: opaque blocks, empty space passes, smooth glass passes
    the squared Fresnel transmission (the render path's shadow rule).
"""

import pytest
import numpy as np

from tpurt import (Light, Material, RenderConfig, Sphere, build_scene,
                   occlusion, trace_rays)


def _scene(extra_mats=(), extra_sph=()):
    mats = [Material.diffuse((0.8, 0.2, 0.1)),
            Material.dielectric(ior=1.5, roughness=0.0)] + list(extra_mats)
    sph = [Sphere(0, 1.0, (0.0, 0.0, 5.0))] + list(extra_sph)
    lights = [Light.point([0.0, 5.0, 0.0], [1, 1, 1], 1.0, 0.0)]
    return build_scene(mats, sph, [], lights)


def test_closest_hit_analytic():
    scene = _scene()
    o = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    d = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    h = trace_rays(scene, o, d)
    hit = np.asarray(h.hit)
    assert hit.tolist() == [True, False, False]
    # unit sphere at z=5: entry at t=4 (pulled back by the render path's
    # 0.9999 in position only; t itself is the exact root)
    assert abs(float(h.t[0]) - 4.0) < 1e-4
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(h.albedo[0]), [0.8, 0.2, 0.1],
                               atol=1e-5)
    assert int(h.mat_id[0]) == 0 and int(h.mtype[0]) == 0
    # miss lanes fully masked
    assert int(h.mat_id[1]) == -1 and int(h.mtype[1]) == -1
    assert np.all(np.asarray(h.position[1]) == 0.0)
    assert np.all(np.asarray(h.albedo[2]) == 0.0)


def test_unnormalized_direction_scales_t():
    scene = _scene()
    o = np.zeros((1, 3))
    h1 = trace_rays(scene, o, [[0.0, 0.0, 1.0]])
    h2 = trace_rays(scene, o, [[0.0, 0.0, 2.0]])
    assert abs(float(h2.t[0]) * 2.0 - float(h1.t[0])) < 1e-4
    np.testing.assert_allclose(np.asarray(h1.position[0]),
                               np.asarray(h2.position[0]), atol=1e-4)


def test_matches_aov_pass():
    """Same intersector as the deterministic AOV feature pass: center-ray
    depths through a camera equal trace_rays on the generated rays."""
    from tpurt import make_camera, render_aovs
    from tpurt.camera import generate_rays
    import jax.numpy as jnp
    scene = _scene()
    cfg = RenderConfig(width=16, height=8)
    cam = make_camera((0, 0, 0), (0, 0, 5), vfov=60.0, aspect_ratio=2.0)
    aovs = render_aovs(scene, cfg, cam)
    x = (np.arange(16, dtype=np.float32) + 0.5) / 16
    y = (np.arange(8, dtype=np.float32) + 0.5) / 8
    u, v = np.meshgrid(x, y)
    o, d = generate_rays(cam, jnp.asarray(u.ravel()), jnp.asarray(v.ravel()))
    h = trace_rays(scene, o, d, cfg)
    depth = np.where(np.asarray(h.hit), np.asarray(h.t), 0.0)
    np.testing.assert_allclose(depth.reshape(8, 16),
                               np.asarray(aovs.depth), rtol=1e-6)


def test_light_probe_inverse_square():
    """Point-light NEE at a unit-albedo diffuse point: reflected radiance
    scales as cos/d^2, so two probe points at distances d and 2d under
    the same light differ 4x (cos identical: light straight above)."""
    from tpurt import light_probe
    scene = _scene()
    nrm = np.array([[0.0, 1.0, 0.0]], np.float32)
    # light at (0,5,0): distances 1.0 and 2.5; one lane per call so both
    # draw the SAME spectral sequence (lane-0 stream) and the ratio is
    # exactly d^2 despite lambda-dependent emission
    e1 = np.asarray(light_probe(scene, [[0.0, 4.0, 0.0]], nrm, samples=4))
    e2 = np.asarray(light_probe(scene, [[0.0, 2.5, 0.0]], nrm, samples=4))
    assert e1.shape == (1, 3) and np.isfinite(e1).all()
    assert float(e1.mean()) > 0.0
    np.testing.assert_allclose(e1[0], e2[0] * 2.5 ** 2, rtol=1e-3)
    # facing away: zero
    e3 = np.asarray(light_probe(scene, [[0.0, 4.0, 0.0]], -nrm, samples=4))
    assert float(np.abs(e3).max()) == 0.0


def test_light_probe_rejects_zero_samples():
    from tpurt import light_probe
    with pytest.raises(ValueError, match="samples"):
        light_probe(_scene(), [[0.0, 4.0, 0.0]], [[0.0, 1.0, 0.0]],
                    samples=0)


def test_light_probe_shadowed():
    from tpurt import light_probe
    scene = _scene()       # opaque unit sphere at (0,0,5), light at (0,5,0)
    # directly under the sphere: the light is occluded; off to the side: lit
    pts = np.array([[0.0, -1.5, 5.0], [3.0, -1.5, 5.0]], np.float32)
    nrm = np.tile([[0.0, 1.0, 0.0]], (2, 1)).astype(np.float32)
    e = np.asarray(light_probe(scene, pts, nrm, samples=8))
    assert float(np.abs(e[0]).max()) == 0.0       # fully blocked
    assert float(e[1].mean()) > 0.0


def test_occlusion_rules():
    scene = _scene(extra_sph=[Sphere(1, 1.0, (0.0, 0.0, -5.0))])  # glass
    o = np.zeros((3, 3))
    d = np.array([[0.0, 0.0, 1.0],    # through the diffuse sphere: blocked
                  [0.0, 1.0, 0.0],    # empty space: clear
                  [0.0, 0.0, -1.0]])  # through smooth glass: Fresnel^2
    a = np.asarray(occlusion(scene, o, d, t_max=10.0))
    assert a[0] == 0.0
    assert a[1] == 1.0
    # normal-incidence Fresnel for ior 1.5 is ((1.5-1)/(1.5+1))^2 = 0.04;
    # the shadow rule squares the transmission (entry+exit): (1-R)^2
    assert abs(a[2] - 0.96 ** 2) < 5e-3
    # t_max short of the occluder: clear
    a2 = np.asarray(occlusion(scene, o[:1], d[:1], t_max=3.5))
    assert a2[0] == 1.0
