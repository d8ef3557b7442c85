"""Temporal reprojection (tpurt/temporal.py — tpurt extension; the
reference clears its accumulator on any camera change, lib.rs:514-526)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpurt import RenderConfig, cornell_spheres_scene, make_camera, render
from tpurt.denoise import render_aovs
from tpurt.render import init_state
from tpurt import tonemap as tm
from tpurt.temporal import TemporalState, reproject, temporal_blend


def _setup(w=96, h=64):
    cfg = RenderConfig(width=w, height=h, depth=3, backend="xla",
                       enable_photons=False)
    scene = cornell_spheres_scene()
    cam = make_camera((0., 5., -12.), (0., 5., 0.), vfov=60.0,
                      aspect_ratio=w / h)
    return cfg, scene, cam


def _linear(cfg, st):
    n = cfg.n_pixels
    return tm.resolve(st.rgb_sum[:n], st.n_samples[:n]) \
        .reshape(cfg.height, cfg.width, 3)


class TestReproject:
    def test_static_camera_is_identity(self):
        """Same camera both frames: every hit pixel reprojects onto itself
        (bilinear weights collapse) and passes the depth test."""
        cfg, scene, cam = _setup()
        aovs = render_aovs(scene, cfg, cam)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((64, 96, 3), np.float32))
        prev = TemporalState(img=img, depth=aovs.depth, camera=cam)
        warped, valid = reproject(prev, cam, aovs.depth)
        v = np.asarray(valid)
        hit = np.asarray(aovs.depth) > 0
        assert v[hit].mean() > 0.99
        err = np.abs(np.asarray(warped) - np.asarray(img))[v]
        assert err.max() < 1e-3

    def test_translated_camera_shifts_lookup(self):
        """A small camera translation: most pixels still reproject validly
        (same geometry), disoccluded/outside pixels are rejected."""
        cfg, scene, cam = _setup()
        cam2 = make_camera((0.4, 5., -12.), (0.4, 5., 0.), vfov=60.0,
                           aspect_ratio=96 / 64)
        aovs1 = render_aovs(scene, cfg, cam)
        aovs2 = render_aovs(scene, cfg, cam2)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((64, 96, 3), np.float32))
        prev = TemporalState(img=img, depth=aovs1.depth, camera=cam)
        warped, valid = reproject(prev, cam2, aovs2.depth)
        v = np.asarray(valid)
        assert 0.5 < v.mean() < 1.0
        assert np.isfinite(np.asarray(warped)).all()

    def test_miss_pixels_invalid(self):
        cfg, scene, cam = _setup()
        aovs = render_aovs(scene, cfg, cam)
        prev = TemporalState(img=jnp.zeros((64, 96, 3)),
                             depth=aovs.depth, camera=cam)
        _, valid = reproject(prev, cam, jnp.zeros((64, 96)))
        assert not np.asarray(valid).any()


class TestTemporalBlend:
    def test_first_frame_passthrough(self):
        cfg, scene, cam = _setup()
        aovs = render_aovs(scene, cfg, cam)
        img = jnp.ones((64, 96, 3)) * 0.3
        out, ts = temporal_blend(None, cam, aovs, img, alpha=0.8)
        assert (np.asarray(out) == 0.3).all()
        assert ts.camera is cam

    def test_alpha_clamped_no_feedback_blowup(self):
        """alpha > 1 would be a gain->infinity feedback loop (the history
        stores the blended output); temporal_blend clamps it to 1."""
        cfg, scene, cam = _setup()
        aovs = render_aovs(scene, cfg, cam)
        ts = None
        img = jnp.ones((64, 96, 3)) * 0.5
        for _ in range(12):
            out, ts = temporal_blend(ts, cam, aovs, img, alpha=1.7)
        o = np.asarray(out)
        assert np.isfinite(o).all()
        assert 0.0 <= o.min() and o.max() <= 0.5 + 1e-5

    @pytest.mark.slow
    def test_static_accumulation_reduces_noise(self):
        """Static camera, independent noisy frames: the EMA output drifts
        toward the converged image much closer than any single frame."""
        cfg, scene, cam = _setup()
        aovs = render_aovs(scene, cfg, cam)
        gt = _linear(cfg, render(scene, cfg, cam, init_state(cfg), 777, 96))
        ts = None
        frames = []
        for f in range(8):
            st = render(scene, cfg, cam, init_state(cfg), 10 + f, 2)
            lin = _linear(cfg, st)
            frames.append(np.asarray(lin))
            out, ts = temporal_blend(ts, cam, aovs, lin, alpha=0.8)
        mse_single = float(((frames[-1] - np.asarray(gt)) ** 2).mean())
        mse_temporal = float(((np.asarray(out) - np.asarray(gt)) ** 2).mean())
        assert mse_temporal < mse_single / 3.0
