"""Pallas resolve+tonemap (blit) kernel vs the jnp implementation."""

import numpy as np

from tpurt import RenderConfig, cornell_spheres_scene, make_camera
from tpurt.kernels import mega_pallas as mp
from tpurt.kernels.tonemap_pallas import image_from_planes
from tpurt.render import init_state, render, resolve_image


def test_matches_jnp_blit():
    cfg = RenderConfig(width=64, height=32, depth=3, backend="pallas",
                       pallas_lanes=512, k_photons=1, max_photon_bounces=2)
    scene = cornell_spheres_scene()
    cam = make_camera((0.0, 5.0, -12.0), (0.0, 5.0, 0.0), vfov=60.0,
                      aspect_ratio=2.0)
    st = render(scene, cfg, cam, init_state(cfg), 5, 4)
    ref = np.asarray(resolve_image(cfg, st))
    planes = mp.state_to_planes(st, cfg)
    out = np.asarray(image_from_planes(cfg, planes, 4.0))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # live knobs (ref: blit.rs:161-168)
    dark = np.asarray(image_from_planes(cfg, planes, 4.0, key=0.05))
    assert np.abs(dark - out).max() > 1e-3
    gray = np.asarray(image_from_planes(cfg, planes, 4.0, saturation=0.0))
    assert np.abs(gray[..., 0] - gray[..., 2]).max() < 1e-4
