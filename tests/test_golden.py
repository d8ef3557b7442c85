"""Integrator-level regression tests (SURVEY.md §4.3-4.4).

Golden data: fixed-seed Cornell render captured from the XLA integrator on
CPU (tests/golden/*.npz). The PCG streams are bit-exact by construction, so
drift beyond float-reassociation tolerance means a physics change.
"""

import pathlib

import numpy as np

from tpurt import (
    Material,
    RenderConfig,
    Sphere,
    build_scene,
    cornell_spheres_scene,
    make_camera,
)
from tpurt.render import (
    init_state,
    load_checkpoint,
    render,
    render_step,
    resolve_image,
    save_checkpoint,
)

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _cornell(**kw):
    cfg = RenderConfig(width=64, height=32, depth=6, tile_size=2048,
                       k_photons=2, max_photon_bounces=4, **kw)
    scene = cornell_spheres_scene()
    cam = make_camera((0.0, 5.0, -12.0), (0.0, 5.0, 0.0), vfov=60.0,
                      aspect_ratio=2.0)
    return cfg, scene, cam


class TestGolden:
    def test_cornell_fixed_seed(self):
        cfg, scene, cam = _cornell()
        st = render(scene, cfg, cam, init_state(cfg), 1234, 8)
        g = np.load(GOLDEN / "cornell_64x32_s1234_8spp.npz")
        rgb = np.asarray(st.rgb_sum)[: 64 * 32]
        # exact RNG parity -> the segment count must match exactly
        assert float(st.rays) == float(g["rays"])
        np.testing.assert_allclose(float(st.photon_radius),
                                   float(g["photon_radius"]), rtol=1e-6)
        diff = np.abs(rgb - g["rgb_sum"])
        # reassociation can flip rare near-threshold branches; bound both the
        # typical error and the count of diverged pixels
        assert np.median(diff) < 1e-4
        assert (diff.max(axis=-1) > 1e-2).mean() < 0.01


class TestIntegratorBehavior:
    def test_checkpoint_resume_bit_exact(self, tmp_path):
        """4 spp, checkpoint, 4 more == 8 spp straight (RNG is seeded from
        the iteration counter, so resume is exact — the capability the
        reference lacks entirely, SURVEY.md §5)."""
        cfg, scene, cam = _cornell()
        st = render(scene, cfg, cam, init_state(cfg), 1234, 4)
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, cfg, st)
        cfg2, st2 = load_checkpoint(p)
        assert cfg2 == cfg
        resumed = render(scene, cfg2, cam, st2, 1234, 4)
        straight = render(scene, cfg, cam, init_state(cfg), 1234, 8)
        np.testing.assert_array_equal(np.asarray(resumed.rgb_sum),
                                      np.asarray(straight.rgb_sum))
        assert float(resumed.rays) == float(straight.rays)

    def test_no_lights_renders_black(self):
        mats = [Material.diffuse((0.8, 0.8, 0.8))]
        scene = build_scene(
            materials=mats,
            spheres=[Sphere(material_id=0, scale=1.0, translation=(0, 0, 2))],
            lights=[],
        )
        cfg = RenderConfig(width=32, height=16, depth=4, tile_size=512)
        cam = make_camera((0, 0, -2), (0, 0, 1), vfov=60.0, aspect_ratio=2.0)
        st = render(scene, cfg, cam, init_state(cfg), 7, 4)
        assert float(np.abs(np.asarray(st.rgb_sum)).max()) == 0.0

    def test_mean_stable_across_spp(self):
        """Unbiasedness smoke test: the per-spp mean radiance at 4 spp and
        16 spp agree within MC tolerance."""
        cfg, scene, cam = _cornell()
        st4 = render(scene, cfg, cam, init_state(cfg), 5, 4)
        st16 = render(scene, cfg, cam, init_state(cfg), 5, 16)
        m4 = np.asarray(st4.rgb_sum)[: 64 * 32].mean() / 4.0
        m16 = np.asarray(st16.rgb_sum)[: 64 * 32].mean() / 16.0
        assert abs(m4 - m16) / m16 < 0.1

    def test_preview_depth_one(self):
        """Depth-1 preview (camera-move path, mega_kernel.rs:199-202) runs
        and deposits only direct lighting."""
        cfg, scene, cam = _cornell()
        st = render_step(scene, cfg, cam, init_state(cfg), 3, depth=1)
        assert int(st.iteration) == 1
        img = np.asarray(resolve_image(cfg, st))
        assert np.isfinite(img).all()

    def test_tonemap_live_knobs(self):
        cfg, scene, cam = _cornell()
        st = render(scene, cfg, cam, init_state(cfg), 3, 2)
        a = np.asarray(resolve_image(cfg, st, key=0.05))
        b = np.asarray(resolve_image(cfg, st, key=0.8))
        assert np.abs(a - b).max() > 1e-3
        c = np.asarray(resolve_image(cfg, st, saturation=0.0))
        # zero saturation -> grayscale
        assert np.abs(c[..., 0] - c[..., 1]).max() < 1e-6
