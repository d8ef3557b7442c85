"""JSON scene files (tpurt/utils/scene_io.py): round-trip + render parity.

The reference has no scene format (hard-coded in src/lib.rs:220-447);
this is a beyond-reference extension over the builder API."""

import json

import numpy as np

from tpurt import RenderConfig, make_camera, torus_mesh_scene
from tpurt.render import init_state, render
from tpurt.utils.scene_io import load_scene_json, save_scene_json


def test_roundtrip_render_identical(tmp_path):
    scene = torus_mesh_scene(8, 4)  # spheres + mesh + area light
    p = tmp_path / "scene.json"
    save_scene_json(str(p), scene, camera={"eye": [0, 3, -6],
                                           "look_at": [0, 1.5, 0],
                                           "vfov": 55.0})
    loaded, cam_meta = load_scene_json(str(p))
    assert cam_meta["vfov"] == 55.0

    # sphere/material/light SoA identical
    for f in ("mat_color", "mat_rough", "mat_ior", "mat_type",
              "sph_center", "sph_radius", "sph_mat",
              "light_pos", "light_hw", "light_color", "light_intensity",
              "light_temp", "light_type", "light_normal"):
        np.testing.assert_allclose(np.asarray(getattr(scene, f)),
                                   np.asarray(getattr(loaded, f)),
                                   rtol=0, atol=1e-6, err_msg=f)
    assert loaded.num_triangles == scene.num_triangles

    # renders agree exactly (same geometry set; the reload re-runs the
    # deterministic BVH build over the same baked triangles)
    cfg = RenderConfig(width=32, height=16, depth=3, tile_size=512)
    cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0, aspect_ratio=2.0)
    st0 = render(scene, cfg, cam, init_state(cfg), 9, 2)
    st1 = render(loaded, cfg, cam, init_state(cfg), 9, 2)
    assert float(st0.rays) == float(st1.rays) != 0.0
    np.testing.assert_allclose(np.asarray(st0.rgb_sum),
                               np.asarray(st1.rgb_sum), rtol=0, atol=1e-5)


def test_schema_fields(tmp_path):
    """Hand-written JSON with every record type parses."""
    doc = {
        "materials": [
            {"type": "diffuse", "color": [0.8, 0.7, 0.6]},
            {"type": "dielectric", "ior": 1.5, "roughness": 0.02},
            {"type": "metal", "color": [1.0, 0.71, 0.29], "roughness": 0.1},
        ],
        "spheres": [{"material": 0, "radius": 1000.0,
                     "center": [0, -1000, 0]},
                    {"material": 1, "radius": 1.0, "center": [0, 1, 0]}],
        "meshes": [{"material": 2,
                    "positions": [[-1, 0, 3], [1, 0, 3], [0, 2, 3]],
                    "indices": [[0, 1, 2]]}],
        "lights": [
            {"type": "point", "position": [0, 5, 0],
             "color": [1, 1, 1], "intensity": 10, "color_temp": 5500},
            {"type": "square", "position": [0, 8, 0],
             "normal": [0, -1, 0], "half_width": 2.0,
             "color": [1, 1, 1], "intensity": 5, "color_temp": 6500},
        ],
    }
    p = tmp_path / "s.json"
    p.write_text(json.dumps(doc))
    scene, cam = load_scene_json(str(p))
    assert cam is None
    assert scene.num_spheres == 2
    assert scene.num_triangles == 1
    assert scene.num_lights == 2
    assert int(scene.mat_type[2]) == 2


def test_bad_material_index_rejected(tmp_path):
    doc = {"materials": [{"type": "diffuse", "color": [1, 1, 1]}],
           "meshes": [{"material": 7,
                       "positions": [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                       "indices": [[0, 1, 2]]}]}
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(doc))
    import pytest
    with pytest.raises(ValueError, match="material 7 out of range"):
        load_scene_json(str(p))


class TestConfigOverrides:
    """RenderConfig.parse_overrides — the shared `--set KEY=VAL` parser
    behind viewer.py / tools/animate.py / tools/probe.py."""

    def test_parses_and_validates(self):
        from tpurt.config import RenderConfig
        kw = RenderConfig.parse_overrides(
            ["qmc=True", "photon_strata=16", "backend=wavefront"])
        assert kw == {"qmc": True, "photon_strata": 16,
                      "backend": "wavefront"}
        cfg = RenderConfig(**kw)  # constructs cleanly
        assert cfg.qmc and cfg.photon_strata == 16

    def test_unknown_field_fails_fast(self):
        import pytest
        from tpurt.config import RenderConfig
        with pytest.raises(SystemExit, match="not a RenderConfig field"):
            RenderConfig.parse_overrides(["qcm=True"])

    def test_viewer_build_applies_set(self):
        import argparse
        import viewer
        ns = argparse.Namespace(
            scene="cornell", scene_file=None, width=64, height=32,
            depth=2, backend="xla", hero=1, dispersion=False,
            aperture=None, focus=None, clamp=0.0, shutter=0.0,
            set=["qmc=True", "tile_size=2048"])
        cfg, scene, cam, *_ = viewer._build(ns)
        assert cfg.qmc is True and cfg.tile_size == 2048


def test_torus_field_scene_builds_and_hits():
    """torus_field_scene (round 3: the spatially-distributed chunked-walk
    benchmark scene): 16 tori x 2*nu*nv triangles land where placed —
    rays down at each torus's grid cell hit SOME triangle, a ray down at
    a far-off point hits only the ground sphere, and the build is
    deterministic for a fixed seed."""
    import numpy as np
    from tpurt import RenderConfig, torus_field_scene
    from tpurt.query import trace_rays

    scene = torus_field_scene(4, 8, 6)          # 4 tori x 96 tris
    assert scene.num_triangles == 4 * 2 * 8 * 6
    assert scene.num_spheres == 2 and scene.num_lights == 1

    # torus grid (scene.py): side=2, nominal centers (±3.5 + U(-1,1),
    # 10 ∓ 3.5 + U(-1,1)). Centers are jittered, so probe a 16-ray ring
    # of downward rays at the nominal ring radius: by continuity at
    # least one lands on the true ring annulus (r in [1.05, 2.15] of
    # the true center) and must hit the tube ABOVE the ground (y>0.9
    # -> t < 19.1 from y=20).
    import math
    origins, dirs = [], []
    for gx, gz in ((0, 0), (1, 0), (0, 1), (1, 1)):
        x = (gx - 0.5) * 7.0
        z = (gz - 0.5) * 7.0 + 10.0
        for a in range(16):
            th = 2 * math.pi * a / 16
            origins.append((x + 1.6 * math.cos(th), 20.0,
                            z + 1.6 * math.sin(th)))
            dirs.append((0.0, -1.0, 0.0))
    origins.append((40.0, 20.0, 40.0))          # far off: ground only
    dirs.append((0.0, -1.0, 0.0))
    hits = trace_rays(scene, np.asarray(origins, np.float32),
                      np.asarray(dirs, np.float32),
                      cfg=RenderConfig(use_bvh=True))
    t = np.asarray(hits.t)
    assert np.all(np.isfinite(t)), t
    per_torus = t[:64].reshape(4, 16)
    assert np.all(per_torus.min(axis=1) < 19.1), per_torus.min(axis=1)
    assert t[64] > 19.5, t[64]                  # ground sphere only

    s2 = torus_field_scene(4, 8, 6)
    assert np.array_equal(np.asarray(scene.tri_a), np.asarray(s2.tri_a))
