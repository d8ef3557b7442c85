"""RenderConfig.preset (measured flag stacks) and render_until (render
to a noise target) — the production driving conveniences.

Contracts:
  * preset("reference") == RenderConfig() field-for-field; unknown names
    raise listing the options; overrides win over the stack;
  * render_until stops at min_batches when the target is loose, runs to
    max_spp when it is unreachable, never exceeds max_spp, and its
    accumulated state equals a plain render of the same total spp
    bit-for-bit (the stopping rule reads, never writes);
  * rel_err estimates shrink as spp grows.
"""

import dataclasses

import numpy as np
import pytest

from tpurt import (RenderConfig, cornell_spheres_scene, init_state,
                   make_camera, render, render_until)

W, H = 32, 16


def _setup():
    scene = cornell_spheres_scene()
    cam = make_camera((0, 5, -12), (0, 5, 0), vfov=60.0, aspect_ratio=W / H)
    cfg = RenderConfig(width=W, height=H, depth=3, backend="xla")
    return scene, cfg, cam


def test_preset_reference_is_default():
    assert RenderConfig.preset("reference") == RenderConfig()


def test_preset_stacks_and_overrides():
    q = RenderConfig.preset("quality", width=64)
    assert q.hero_wavelengths == 4 and q.qmc and q.width == 64
    f = RenderConfig.preset("fast", photon_rr_scale=0.7)
    assert f.photon_rr_scale == 0.7          # override wins
    assert f.qmc and f.hero_wavelengths == 4
    with pytest.raises(ValueError, match="reference"):
        RenderConfig.preset("qualtiy")       # typo lists valid names


def test_presets_render():
    scene, _, cam = _setup()
    for name in RenderConfig.PRESETS:
        cfg = RenderConfig.preset(name, width=W, height=H, depth=2,
                                  backend="xla")
        st = render(scene, cfg, cam, init_state(cfg), 5, 2)
        assert float(st.rays) > 0.0
        assert np.isfinite(np.asarray(st.rgb_sum)).all(), name


def test_until_loose_target_stops_at_min_batches():
    scene, cfg, cam = _setup()
    st, info = render_until(scene, cfg, cam, init_state(cfg), 7,
                            target_rel_err=1e9, batch_spp=2, max_spp=64)
    assert info["converged"] and info["batches"] == 2 and info["spp"] == 4
    assert float(st.iteration) == 4


def test_until_unreachable_target_hits_max():
    scene, cfg, cam = _setup()
    st, info = render_until(scene, cfg, cam, init_state(cfg), 7,
                            target_rel_err=0.0, batch_spp=3, max_spp=8)
    assert not info["converged"] and info["spp"] == 8
    assert float(st.iteration) == 8          # 3 + 3 + 2: capped exactly


def test_until_state_equals_plain_render():
    """The stopping rule only reads the accumulator: the final state is
    bit-identical to one render() of the same total spp."""
    scene, cfg, cam = _setup()
    st_u, info = render_until(scene, cfg, cam, init_state(cfg), 11,
                              target_rel_err=1e9, batch_spp=2, max_spp=32)
    st_p = render(scene, cfg, cam, init_state(cfg), 11, info["spp"])
    for f in dataclasses.fields(st_p):
        a = np.asarray(getattr(st_u, f.name))
        b = np.asarray(getattr(st_p, f.name))
        assert np.array_equal(a, b), f.name


def test_until_rel_err_shrinks():
    scene, cfg, cam = _setup()
    _, lo = render_until(scene, cfg, cam, init_state(cfg), 3,
                         target_rel_err=0.0, batch_spp=2, max_spp=4)
    _, hi = render_until(scene, cfg, cam, init_state(cfg), 3,
                         target_rel_err=0.0, batch_spp=2, max_spp=32)
    assert hi["rel_err"] < lo["rel_err"]
