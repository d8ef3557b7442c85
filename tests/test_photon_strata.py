"""Tile-coherent stratified photon emission (cfg.photon_strata, EXTENSION).

The stratum is a pure function of (frame seed, k) shared by every pixel and
every backend (ops/rng.emission_strata), so the flag must preserve the
cross-backend exactness contract; across samples the hash-uniform stratum
choice keeps the emission distribution exactly that of the reference
sampler, so the converged image must agree within MC noise.
"""

import numpy as np

from tpurt import (RenderConfig, cornell_spheres_scene, init_state,
                   make_camera, render, resolve_image)
from tpurt.ops import rng as rngmod


def _cam():
    return make_camera((0.0, 5.0, -12.0), (0.0, 5.0, 0.0), vfov=60.0,
                       aspect_ratio=2.0)


def test_strata_indices_pure_and_in_range():
    import jax.numpy as jnp
    s = jnp.uint32(12345)
    a = rngmod.emission_strata(s, 2, 8)
    b = rngmod.emission_strata(s, 2, 8)
    for x, y in zip(a, b):
        assert float(x) == float(y)
        assert 0.0 <= float(x) <= 7.0
    # different k -> (almost surely) different cell
    c = rngmod.emission_strata(s, 3, 8)
    assert any(float(x) != float(y) for x, y in zip(a, c))


def test_regen_tile_sync_exact_with_strata():
    """The regen and tile-sync kernels stay result-identical with the
    flag on (draw positions unchanged; only values are remapped)."""
    from tpurt.kernels.mega_regen import render_regen
    scene = cornell_spheres_scene()
    cfg = RenderConfig(width=64, height=32, depth=4, tile_size=2048,
                       pallas_lanes=512, k_photons=2,
                       max_photon_bounces=3, backend="pallas",
                       pallas_regen=False, photon_strata=8)
    st_m = render(scene, cfg, _cam(), init_state(cfg), 1234, 2)
    st_r = render_regen(scene, cfg, _cam(), init_state(cfg), 1234, 2)
    assert float(st_m.rays) == float(st_r.rays) != 0.0
    assert np.abs(np.asarray(st_m.rgb_sum)
                  - np.asarray(st_r.rgb_sum)).max() < 1e-3


def test_xla_kernel_parity_with_strata():
    """XLA vs regen with the flag on: the same contract as flag-off
    (exact counts on this config, tiny divergent-pixel fraction).
    dispersive_scene has a POINT light too, exercising the cone remap."""
    from tpurt import dispersive_scene
    for scene, cam in ((cornell_spheres_scene(), _cam()),
                       (dispersive_scene(),
                        make_camera((0.0, 3.0, -4.0), (0.0, 1.0, 5.0),
                                    vfov=55.0, aspect_ratio=2.0))):
        kw = dict(width=64, height=32, depth=3, tile_size=2048,
                  pallas_lanes=512, k_photons=2, max_photon_bounces=2,
                  photon_strata=8)
        cfg_x = RenderConfig(backend="xla", **kw)
        cfg_p = RenderConfig(backend="pallas", **kw)
        st_x = render(scene, cfg_x, cam, init_state(cfg_x), 5, 2)
        st_p = render(scene, cfg_p, cam, init_state(cfg_p), 5, 2)
        assert float(st_x.rays) == float(st_p.rays) != 0.0
        img_x = np.asarray(resolve_image(cfg_x, st_x))
        img_p = np.asarray(resolve_image(cfg_p, st_p))
        assert ((np.abs(img_x - img_p) > 1e-4).any(axis=-1)).mean() < 0.03


def test_strata_unbiased_vs_reference_sampler():
    """Means agree within MC noise of the photon share: strata change
    WHICH photons a sample draws, never their distribution."""
    scene = cornell_spheres_scene()
    kw = dict(width=48, height=24, depth=4, pallas_lanes=512,
              k_photons=2, max_photon_bounces=3)
    cfg_s = RenderConfig(backend="pallas", photon_strata=8, **kw)
    cfg_r = RenderConfig(backend="pallas", **kw)
    st_s = render(scene, cfg_s, _cam(), init_state(cfg_s), 1234, 32)
    st_r = render(scene, cfg_r, _cam(), init_state(cfg_r), 1234, 32)
    m_s = float(np.asarray(st_s.rgb_sum).mean())
    m_r = float(np.asarray(st_r.rgb_sum).mean())
    assert abs(m_s - m_r) < 5e-3 * max(m_r, 1e-6), (m_s, m_r)
