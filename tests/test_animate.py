"""Animation tool: camera-path math + end-to-end frame rendering/resume."""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from animate import orbit_camera, path_camera  # noqa: E402


def test_orbit_full_revolution_returns_to_start():
    eye0, at = (0.0, 5.0, -12.0), (0.0, 5.0, 0.0)
    c0 = orbit_camera(0, 8, eye0, at, 60.0, 16 / 9)
    c8 = orbit_camera(8, 8, eye0, at, 60.0, 16 / 9)
    np.testing.assert_allclose(np.asarray(c0.origin), np.asarray(c8.origin),
                               atol=1e-5)
    # half revolution mirrors the eye through the look-at axis
    c4 = orbit_camera(4, 8, eye0, at, 60.0, 16 / 9)
    np.testing.assert_allclose(np.asarray(c4.origin), [0.0, 5.0, 12.0],
                               atol=1e-5)
    # radius and height are preserved at every step
    for f in range(8):
        o = np.asarray(orbit_camera(f, 8, eye0, at, 60.0, 16 / 9).origin,
                       np.float64)
        assert abs(np.linalg.norm(o - np.asarray(at)) - 12.0) < 1e-4
        assert abs(o[1] - 5.0) < 1e-5


def test_path_interpolation_and_clamping():
    keys = [
        {"frame": 10, "eye": [0, 0, -10], "look_at": [0, 0, 0], "vfov": 60.0},
        {"frame": 20, "eye": [10, 0, -10], "look_at": [0, 2, 0], "vfov": 40.0},
    ]
    mid = path_camera(15, keys, 16 / 9)
    np.testing.assert_allclose(np.asarray(mid.origin), [5, 0, -10], atol=1e-5)
    # clamped outside the keyframe range
    before = path_camera(0, keys, 16 / 9)
    after = path_camera(99, keys, 16 / 9)
    np.testing.assert_allclose(np.asarray(before.origin), [0, 0, -10],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(after.origin), [10, 0, -10],
                               atol=1e-6)
    # vfov interpolates: the mid camera's viewport height is between the
    # endpoints' (horizontal/vertical lengths encode vfov)
    hv = [float(np.linalg.norm(np.asarray(c.vertical)))
          for c in (before, mid, after)]
    assert hv[2] < hv[1] < hv[0]


def test_end_to_end_render_and_resume(tmp_path):
    repo = os.path.join(os.path.dirname(__file__), "..")
    cmd = [sys.executable, "tools/animate.py", "--scene", "cornell",
           "--orbit", "--frames", "2", "--spp", "1", "--width", "32",
           "--height", "16", "--depth", "2", "--backend", "xla", "--cpu",
           "--out-dir", str(tmp_path)]
    out = subprocess.run(cmd, cwd=repo, capture_output=True, text=True,
                         timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["frames_rendered"] == 2
    assert (tmp_path / "frame_0000.png").exists()
    assert (tmp_path / "frame_0001.png").exists()

    # resume: nothing re-rendered
    out2 = subprocess.run(cmd, cwd=repo, capture_output=True, text=True,
                          timeout=500)
    assert out2.returncode == 0, out2.stderr[-2000:]
    stats2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert stats2["frames_rendered"] == 0
