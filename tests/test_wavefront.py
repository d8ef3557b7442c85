"""Wavefront (persistent ray pool + regeneration) tests.

The wavefront tracer enumerates the same per-(pixel, sample) PCG streams as
the progressive renderer, so with photons disabled the two must agree to
float accumulation noise — a much stronger check than statistical matching.
(ref: src/wavefront.rs / src/kernels/wavefront.wgsl — the unfinished
reference component this replaces; see tpurt/wavefront.py docstring.)
"""

import numpy as np

from tpurt import RenderConfig, cornell_spheres_scene, make_camera
from tpurt.render import init_state, render
from tpurt.wavefront import wavefront_render


def _setup(**kw):
    cfg = RenderConfig(width=48, height=24, depth=4, tile_size=1152,
                       enable_photons=False, **kw)
    scene = cornell_spheres_scene()
    cam = make_camera((0.0, 5.0, -12.0), (0.0, 5.0, 0.0), vfov=60.0,
                      aspect_ratio=2.0)
    return cfg, scene, cam


class TestWavefront:
    def test_matches_progressive(self):
        cfg, scene, cam = _setup(wf_pool=2048)
        st_w = wavefront_render(scene, cfg, cam, init_state(cfg), 42, 3)
        st_p = render(scene, cfg, cam, init_state(cfg), 42, 3)
        n = cfg.n_pixels
        a = np.asarray(st_w.rgb_sum)[:n]
        b = np.asarray(st_p.rgb_sum)[:n]
        # identical work items -> identical segment count
        assert float(st_w.rays) == float(st_p.rays) != 0.0
        np.testing.assert_allclose(a, b, atol=2e-2, rtol=1e-3)

    def test_every_pixel_gets_spp_samples(self):
        cfg, scene, cam = _setup(wf_pool=512)  # pool << pixel count
        st = wavefront_render(scene, cfg, cam, init_state(cfg), 7, 2)
        ns = np.asarray(st.n_samples)[:cfg.n_pixels]
        assert (ns == 2.0).all()

    def test_progressive_continuation_draws_new_samples(self):
        """Two 2-spp calls must equal one 4-spp call: the second call's
        samples are offset by the carried iteration (regression: they
        used to re-trace samples 0-1 bit-identically — no convergence)."""
        cfg, scene, cam = _setup(wf_pool=2048)
        st_a = wavefront_render(scene, cfg, cam, init_state(cfg), 42, 2)
        st_a = wavefront_render(scene, cfg, cam, st_a, 42, 2)
        st_b = wavefront_render(scene, cfg, cam, init_state(cfg), 42, 4)
        assert int(st_a.iteration) == int(st_b.iteration) == 4
        assert float(st_a.rays) == float(st_b.rays) != 0.0
        n = cfg.n_pixels
        np.testing.assert_allclose(np.asarray(st_a.rgb_sum)[:n],
                                   np.asarray(st_b.rgb_sum)[:n],
                                   atol=1e-5, rtol=1e-5)

    def test_small_pool_same_image(self):
        """Pool capacity must not change the result, only the schedule."""
        cfg_a, scene, cam = _setup(wf_pool=256)
        cfg_b, _, _ = _setup(wf_pool=4096)
        st_a = wavefront_render(scene, cfg_a, cam, init_state(cfg_a), 9, 2)
        st_b = wavefront_render(scene, cfg_b, cam, init_state(cfg_b), 9, 2)
        n = cfg_a.n_pixels
        np.testing.assert_allclose(np.asarray(st_a.rgb_sum)[:n],
                                   np.asarray(st_b.rgb_sum)[:n],
                                   atol=2e-2, rtol=1e-3)
        assert float(st_a.rays) == float(st_b.rays)

    def test_sky_gradient_flag(self):
        """Legacy wavefront sky (wavefront.wgsl:129-131) adds energy on
        miss; black sky (mega kernel) does not."""
        cfg, scene, cam = _setup(wf_pool=1024)
        cfg_sky = cfg.with_(sky_gradient=True)
        st_k = wavefront_render(scene, cfg, cam, init_state(cfg), 3, 1)
        st_s = wavefront_render(scene, cfg_sky, cam, init_state(cfg_sky), 3, 1)
        n = cfg.n_pixels
        assert np.asarray(st_s.rgb_sum)[:n].sum() > np.asarray(st_k.rgb_sum)[:n].sum()


class TestWavefrontBackendDispatch:
    """cfg.backend makes every wavefront tracer reachable through the
    public render() entry point (VERDICT r1: config 5 needed a lambda)."""

    def test_backend_wavefront_bit_identical(self):
        # both paths use the SAME cfg: the dispatch pads the state to the
        # pool-lane multiple (render.padded_pixels), so a direct call with
        # an xla-backend cfg would differ in state SHAPE (not values)
        cfg, scene, cam = _setup(wf_pool=2048)
        wcfg = cfg.with_(backend="wavefront")
        st_d = render(scene, wcfg, cam, init_state(wcfg), 42, 2)
        st_w = wavefront_render(scene, wcfg, cam, init_state(wcfg), 42, 2)
        np.testing.assert_array_equal(np.asarray(st_d.rgb_sum),
                                      np.asarray(st_w.rgb_sum))
        assert float(st_d.rays) == float(st_w.rays) != 0.0

    def test_backend_wavefront_fused_bit_identical(self):
        from tpurt.kernels.wavefront_pallas import wavefront_render_fused
        cfg, scene, cam = _setup(backend="wavefront_fused",
                                 pallas_lanes=512)
        st_d = render(scene, cfg, cam, init_state(cfg), 42, 2)
        st_f = wavefront_render_fused(scene, cfg, cam, init_state(cfg),
                                      42, 2)
        np.testing.assert_array_equal(np.asarray(st_d.rgb_sum),
                                      np.asarray(st_f.rgb_sum))
        assert float(st_d.rays) == float(st_f.rays) != 0.0

    def test_render_step_dispatches(self):
        cfg, scene, cam = _setup(wf_pool=1024, backend="wavefront")
        from tpurt.render import render_step
        st = render_step(scene, cfg, cam, init_state(cfg), 7)
        assert int(st.iteration) == 1
        assert float(st.rays) > 0


class TestWavefrontPallas:
    def test_pool_sweep_matches_xla(self):
        """Pool-based Pallas sweep == XLA wavefront (same streams)."""
        from tpurt.kernels.wavefront_pallas import wavefront_render_pallas
        cfg, scene, cam = _setup(wf_pool=1024, pallas_lanes=512)
        st_x = wavefront_render(scene, cfg, cam, init_state(cfg), 42, 2)
        st_p = wavefront_render_pallas(scene, cfg, cam, init_state(cfg), 42, 2)
        assert float(st_x.rays) == float(st_p.rays) != 0.0
        n = cfg.n_pixels
        a = np.asarray(st_x.rgb_sum)[:n]
        b = np.asarray(st_p.rgb_sum)[:n]
        # rare near-threshold branch flips under reassociation: bound the
        # fraction of diverged pixels, not every element
        # dispersive branch flips (reassociation) diverge whole pixels;
        # 2% tolerance like the other dielectric-scene parity tests
        assert (np.abs(a - b).max(axis=-1) > 1e-2).mean() < 0.02
        assert abs(a.mean() - b.mean()) < 5e-3 * max(abs(a.mean()), 1e-3)

    def test_fused_matches_xla(self):
        """Fused (in-kernel per-lane regeneration) == XLA wavefront."""
        from tpurt.kernels.wavefront_pallas import wavefront_render_fused
        cfg, scene, cam = _setup(backend="pallas", pallas_lanes=512)
        st_x = wavefront_render(scene, cfg, cam, init_state(cfg), 42, 3)
        st_f = wavefront_render_fused(scene, cfg, cam, init_state(cfg), 42, 3)
        assert float(st_x.rays) == float(st_f.rays) != 0.0
        n = cfg.n_pixels
        ns = np.asarray(st_f.n_samples)[:n]
        assert (ns == 3.0).all()
        a = np.asarray(st_x.rgb_sum)[:n]
        b = np.asarray(st_f.rgb_sum)[:n]
        # dispersive branch flips diverge whole pixels — 2% like above
        assert (np.abs(a - b).max(axis=-1) > 1e-2).mean() < 0.02
        assert abs(a.mean() - b.mean()) < 5e-3 * max(abs(a.mean()), 1e-3)
