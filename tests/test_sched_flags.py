"""Round-4 scheduling/pruning flags are SEMANTICS-FREE: pallas_tri_clip
(sphere-hit t-clip on the triangle walks) and pallas_regen_drift_cam
(camera-ahead drift scheduling) must leave ray counts AND images
bit-identical — they may only change when/what the kernel sweeps."""

import numpy as np

from tpurt import (RenderConfig, init_state, make_camera, render,
                   resolve_image, torus_mesh_scene)

BASE = dict(width=48, height=24, depth=3, backend="pallas",
            pallas_bvh=True, pallas_bvh_leaf=16, pallas_bvh_chunk=64,
            pallas_bvh_chunk_threshold=64, pallas_regen_drift=1,
            photon_strata=8, photon_strata_window=1)


def _render(**kw):
    cfg = RenderConfig(**{**BASE, **kw})
    scene = torus_mesh_scene(12, 6)
    cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                      aspect_ratio=2.0)
    st = render(scene, cfg, cam, init_state(cfg), 9, 2)
    return float(st.rays), np.asarray(resolve_image(cfg, st))


def test_tri_clip_and_drift_cam_bit_identical():
    rays0, img0 = _render()
    for kw in (dict(pallas_tri_clip=False),
               dict(pallas_regen_drift_cam=4)):
        rays, img = _render(**kw)
        assert rays == rays0, kw
        np.testing.assert_array_equal(img, img0, err_msg=str(kw))
