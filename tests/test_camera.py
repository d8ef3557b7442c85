"""Camera, controller, and viewer-internals tests
(ref: src/camera.rs:95-263 controller semantics)."""

import numpy as np

from tpurt import CameraController, make_camera, set_vfov
from tpurt.camera import generate_rays


class TestCamera:
    def test_basis_matches_rtiow_construction(self):
        cam = make_camera((0, 0, 0), (0, 0, 1), vfov=90.0, aspect_ratio=2.0)
        # vfov 90 -> half_height = 1, so vertical has length 2, horizontal 4
        assert np.isclose(np.linalg.norm(np.asarray(cam.vertical)), 2.0, atol=1e-5)
        assert np.isclose(np.linalg.norm(np.asarray(cam.horizontal)), 4.0, atol=1e-5)

    def test_center_ray_hits_look_at_direction(self):
        cam = make_camera((0, 0, 0), (0, 0, 5), vfov=60.0, aspect_ratio=1.0)
        import jax.numpy as jnp
        o, d = generate_rays(cam, jnp.asarray([0.5]), jnp.asarray([0.5]))
        d = np.asarray(d)[0]
        d = d / np.linalg.norm(d)
        assert np.allclose(d, [0, 0, 1], atol=1e-5)

    def test_set_vfov_zoom(self):
        cam = make_camera((0, 0, 0), (0, 0, 1), vfov=75.0, aspect_ratio=1.0)
        zoomed = set_vfov(cam, 30.0, 1.0)
        assert (np.linalg.norm(np.asarray(zoomed.vertical))
                < np.linalg.norm(np.asarray(cam.vertical)))

    def test_controller_moves_and_flags_change(self):
        cam = make_camera((0, 0, 0), (0, 0, 1), vfov=60.0, aspect_ratio=1.0)
        ctl = CameraController()
        ctl.set_key("forward", True)
        cam2, changed = ctl.update(cam, 1e5)
        assert changed
        assert float(np.asarray(cam2.origin)[2]) > 0.0
        ctl.set_key("forward", False)
        cam3, changed = ctl.update(cam2, 1e5)
        assert not changed
        np.testing.assert_array_equal(np.asarray(cam3.origin),
                                      np.asarray(cam2.origin))

    def test_controller_boost_doubles_speed(self):
        cam = make_camera((0, 0, 0), (0, 0, 1), vfov=60.0, aspect_ratio=1.0)
        ctl = CameraController()
        ctl.set_key("forward", True)
        a, _ = ctl.update(cam, 1e5)
        ctl.set_key("boost", True)
        b, _ = ctl.update(cam, 1e5)
        assert np.isclose(float(np.asarray(b.origin)[2]),
                          2.0 * float(np.asarray(a.origin)[2]), rtol=1e-5)

    def test_yaw_rotates_basis(self):
        cam = make_camera((0, 0, 0), (0, 0, 1), vfov=60.0, aspect_ratio=1.0)
        ctl = CameraController()
        ctl.mouse_move(100.0, 0.0)
        cam2, changed = ctl.update(cam, 1e5)
        assert changed
        h0 = np.asarray(cam.horizontal)
        h1 = np.asarray(cam2.horizontal)
        assert not np.allclose(h0, h1)
        # yaw preserves lengths
        assert np.isclose(np.linalg.norm(h0), np.linalg.norm(h1), rtol=1e-5)


class TestViewerInternals:
    def test_ansi_blit_shapes(self):
        import viewer
        img = np.random.default_rng(0).uniform(0, 1, (16, 32, 3)).astype(np.float32)
        out = viewer._ansi_blit(img, max_cols=20, max_rows=6)
        lines = out.split("\n")
        assert len(lines) == 6
        assert "▀" in lines[0]
