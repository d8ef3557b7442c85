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
