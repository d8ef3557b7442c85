"""AOV pass + a-trous denoiser (tpurt/denoise.py — tpurt extension; the
reference has no denoiser)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpurt import RenderConfig, cornell_spheres_scene, make_camera, render
from tpurt.render import init_state, resolve_image
from tpurt.denoise import render_aovs, atrous_denoise, denoise_image


def _setup(w=96, h=64, **kw):
    cfg = RenderConfig(width=w, height=h, depth=4, backend="xla",
                       enable_photons=False, **kw)
    scene = cornell_spheres_scene()
    cam = make_camera((0., 5., -12.), (0., 5., 0.), vfov=60.0,
                      aspect_ratio=w / h)
    return cfg, scene, cam


class TestAOVs:
    def test_shapes_and_ranges(self):
        cfg, scene, cam = _setup()
        aov = render_aovs(scene, cfg, cam)
        assert aov.albedo.shape == (64, 96, 3)
        assert aov.normal.shape == (64, 96, 3)
        assert aov.depth.shape == (64, 96)
        a = np.asarray(aov.albedo)
        assert np.isfinite(a).all() and (a >= 0).all() and (a <= 1).all()
        d = np.asarray(aov.depth)
        assert np.isfinite(d).all() and (d >= 0).all()
        # the Cornell box fills the frame from this camera
        assert (d > 0).mean() > 0.95

    def test_normals_unit_where_hit(self):
        cfg, scene, cam = _setup()
        aov = render_aovs(scene, cfg, cam)
        d = np.asarray(aov.depth)
        n = np.asarray(aov.normal)
        ln = np.linalg.norm(n, axis=-1)
        assert np.abs(ln[d > 0] - 1.0).max() < 1e-3
        assert (ln[d == 0] == 0).all()

    def test_deterministic(self):
        cfg, scene, cam = _setup()
        a1 = render_aovs(scene, cfg, cam)
        a2 = render_aovs(scene, cfg, cam)
        assert (np.asarray(a1.albedo) == np.asarray(a2.albedo)).all()
        assert (np.asarray(a1.depth) == np.asarray(a2.depth)).all()


class TestAtrous:
    def _flat_features(self, h, w):
        albedo = jnp.ones((h, w, 3)) * 0.8
        normal = jnp.zeros((h, w, 3)).at[..., 1].set(1.0)
        depth = jnp.ones((h, w)) * 5.0
        return albedo, normal, depth

    def test_noise_reduction_preserves_mean(self):
        """On a geometrically flat region, heavy zero-mean noise must be
        strongly suppressed without shifting the mean."""
        h = w = 64
        rng = np.random.default_rng(0)
        clean = 0.5
        noisy = jnp.asarray(
            clean + rng.normal(0, 0.25, (h, w, 3)).astype(np.float32))
        albedo, normal, depth = self._flat_features(h, w)
        out = np.asarray(atrous_denoise(noisy, albedo, normal, depth,
                                        sigma_color=2.0))
        inner = out[8:-8, 8:-8]
        raw_std = float(np.asarray(noisy)[8:-8, 8:-8].std())
        assert inner.std() < raw_std / 5.0
        assert abs(inner.mean() - clean) < 0.02

    def test_edges_preserved_by_features(self):
        """A radiance step co-located with a normal+depth discontinuity
        must survive filtering (edge-stopping weights)."""
        h = w = 64
        rng = np.random.default_rng(1)
        img = np.full((h, w, 3), 0.2, np.float32)
        img[:, w // 2:] = 1.0
        img += rng.normal(0, 0.05, img.shape).astype(np.float32)
        albedo = jnp.ones((h, w, 3)) * 0.8
        normal = np.zeros((h, w, 3), np.float32)
        normal[:, :w // 2, 1] = 1.0
        normal[:, w // 2:, 0] = 1.0
        depth = np.full((h, w), 3.0, np.float32)
        depth[:, w // 2:] = 8.0
        out = np.asarray(atrous_denoise(
            jnp.asarray(img), albedo, jnp.asarray(normal),
            jnp.asarray(depth), sigma_color=2.0))
        left = out[:, : w // 2 - 4].mean()
        right = out[:, w // 2 + 4:].mean()
        assert right - left > 0.8 * (1.0 - 0.2) * 0.9
        # and each side is smooth
        assert out[8:-8, 8 : w // 2 - 8].std() < 0.02

    def test_albedo_demodulation_keeps_texture(self):
        """Radiance proportional to a high-frequency albedo pattern under
        flat lighting must come through unblurred (demodulate/remodulate)."""
        h = w = 64
        checker = ((np.arange(h)[:, None] // 4 + np.arange(w)[None, :] // 4)
                   % 2).astype(np.float32)
        albedo = jnp.asarray(
            np.repeat((0.2 + 0.6 * checker)[..., None], 3, axis=-1))
        normal = jnp.zeros((h, w, 3)).at[..., 1].set(1.0)
        depth = jnp.ones((h, w)) * 5.0
        img = albedo * 0.7  # flat irradiance times textured albedo
        out = np.asarray(atrous_denoise(img, albedo, normal, depth))
        assert np.abs(out - np.asarray(img)).max() < 1e-3


class TestDefocusRelax:
    def test_relax_map_shape(self):
        from tpurt.denoise import defocus_relax
        cfg = RenderConfig(width=64, height=32, aperture=0.5,
                           focus_dist=10.0)
        z = jnp.full((32, 64), 10.0)
        assert np.asarray(defocus_relax(cfg, z)).max() == 0.0   # in focus
        z_far = jnp.full((32, 64), 40.0)
        assert np.asarray(defocus_relax(cfg, z_far)).min() > 0.5  # blurred
        # misses (depth 0) never relax
        assert np.asarray(defocus_relax(cfg, jnp.zeros((32, 64)))).max() == 0
        # pinhole config: all zeros
        assert np.asarray(defocus_relax(
            cfg.with_(aperture=0.0), z_far)).max() == 0.0

    def test_relax_smooths_across_feature_edges(self):
        """With relax=1, a normal/depth discontinuity no longer stops the
        filter: a noisy but radiance-flat region denoises across it."""
        h = w = 64
        rng = np.random.default_rng(2)
        img = jnp.asarray(
            0.5 + rng.normal(0, 0.2, (h, w, 3)).astype(np.float32))
        albedo = jnp.ones((h, w, 3)) * 0.8
        normal = np.zeros((h, w, 3), np.float32)
        normal[:, : w // 2, 1] = 1.0
        normal[:, w // 2:, 0] = 1.0
        depth = np.full((h, w), 3.0, np.float32)
        depth[:, w // 2:] = 9.0
        kw = dict(sigma_color=2.0)
        out_stop = np.asarray(atrous_denoise(
            img, albedo, jnp.asarray(normal), jnp.asarray(depth), **kw))
        out_relax = np.asarray(atrous_denoise(
            img, albedo, jnp.asarray(normal), jnp.asarray(depth),
            relax=jnp.ones((h, w)), **kw))
        # near the feature edge the relaxed filter averages both sides ->
        # lower residual noise than the edge-stopped filter
        band = slice(w // 2 - 2, w // 2 + 2)
        assert out_relax[8:-8, band].std() < out_stop[8:-8, band].std()

    def test_local_sigma_smooths_heterogeneous_speckle(self):
        """Per-pixel auto sigma: a speckled patch inside an otherwise
        clean image is smoothed (all four quadrant means are noisy ->
        sigma boosted locally) while a clean color step survives (its
        quadrants are flat -> sigma stays at the global floor)."""
        h = w = 64
        rng = np.random.default_rng(3)
        img = np.full((h, w, 3), 2.0, np.float32)
        img[:, w // 2:] = 4.0                       # clean 2x color step
        patch = (slice(8, 24), slice(8, 24))
        img[patch] = np.maximum(
            rng.normal(3.0, 1.5, (16, 16, 3)), 0.0).astype(np.float32)
        albedo = jnp.ones((h, w, 3))
        normal = jnp.asarray(np.tile([0.0, 0.0, 1.0], (h, w, 1)),
                             jnp.float32)
        depth = jnp.full((h, w), 5.0)
        out = np.asarray(atrous_denoise(jnp.asarray(img), albedo, normal,
                                        depth))
        inner = (slice(11, 21), slice(11, 21))
        assert out[inner].std() < img[inner].std() * 0.3
        left = out[40:60, w // 2 - 8:w // 2 - 2].mean()
        right = out[40:60, w // 2 + 2:w // 2 + 8].mean()
        assert right / left > 1.7, (left, right)


class TestDenoiseImage:
    @pytest.mark.slow
    def test_end_to_end_reduces_noise(self):
        """Denoised low-spp render must be much closer to a high-spp
        reference than the raw low-spp resolve is."""
        cfg, scene, cam = _setup()
        st_lo = render(scene, cfg, cam, init_state(cfg), 11, 4)
        st_hi = render(scene, cfg, cam, init_state(cfg), 500, 64)
        ref = np.asarray(resolve_image(cfg, st_hi))
        raw = np.asarray(resolve_image(cfg, st_lo))
        den = np.asarray(denoise_image(scene, cfg, cam, st_lo))
        assert den.shape == raw.shape
        assert np.isfinite(den).all()
        mse_raw = float(((raw - ref) ** 2).mean())
        mse_den = float(((den - ref) ** 2).mean())
        assert mse_den < mse_raw / 2.0

    def test_aov_reuse_matches(self):
        cfg, scene, cam = _setup()
        st = render(scene, cfg, cam, init_state(cfg), 11, 2)
        aovs = render_aovs(scene, cfg, cam)
        a = np.asarray(denoise_image(scene, cfg, cam, st))
        b = np.asarray(denoise_image(scene, cfg, cam, st, aovs=aovs))
        assert (a == b).all()
