"""Geometry sharding (tpurt.parallel.geometry): triangles partitioned
across the 8-device virtual mesh, per-bounce hit/shadow combines via
collectives — must reproduce the single-chip XLA render BIT-exactly
(same RNG streams, same strict-< combine winners; VERDICT r3 item 7)."""

import numpy as np
import pytest

import jax

from tpurt import (RenderConfig, init_state, make_camera, render,
                   resolve_image, torus_mesh_scene)
from tpurt.parallel.geometry import (make_geometry_sharded_step,
                                     split_scene_triangles)
from tpurt.parallel.sharding import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")


def _setup(nu=11, nv=5, w=48, h=32):
    # 110 triangles: NOT divisible by 8, so shard padding (degenerate
    # triangles + unreachable BVH nodes) is exercised
    cfg = RenderConfig(width=w, height=h, depth=4, backend="xla")
    scene = torus_mesh_scene(nu, nv)
    cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                      aspect_ratio=w / h)
    return cfg, scene, cam


def test_matches_single_chip_bit_exact():
    cfg, scene, cam = _setup()
    s1 = render(scene, cfg, cam, init_state(cfg), 42, 2)

    mesh = make_mesh(8)
    cat = split_scene_triangles(scene, 8)
    step = make_geometry_sharded_step(mesh, cfg, spp=2)
    s8 = step(cat, cam, init_state(cfg), 42)

    assert float(s1.rays) == float(s8.rays)
    i1 = np.asarray(resolve_image(cfg, s1))
    i8 = np.asarray(resolve_image(cfg, s8))
    np.testing.assert_array_equal(i1, i8)


def test_continuation_equals_one_call():
    cfg, scene, cam = _setup()
    mesh = make_mesh(8)
    cat = split_scene_triangles(scene, 8)
    one = make_geometry_sharded_step(mesh, cfg, spp=2)
    two = make_geometry_sharded_step(mesh, cfg, spp=1)

    sa = one(cat, cam, init_state(cfg), 7)
    sb = two(cat, cam, two(cat, cam, init_state(cfg), 7), 7)
    assert float(sa.rays) == float(sb.rays)
    np.testing.assert_array_equal(np.asarray(sa.rgb_sum),
                                  np.asarray(sb.rgb_sum))


def test_brute_force_path_matches_too():
    # use_bvh=False drives the chunked brute sweep on the shards — the
    # combine semantics (first-min by global index) must hold there too
    cfg, scene, cam = _setup()
    cfg = cfg.with_(use_bvh=False)
    s1 = render(scene, cfg, cam, init_state(cfg), 5, 1)
    mesh = make_mesh(8)
    cat = split_scene_triangles(scene, 8)
    step = make_geometry_sharded_step(mesh, cfg, spp=1)
    s8 = step(cat, cam, init_state(cfg), 5)
    assert float(s1.rays) == float(s8.rays)
    np.testing.assert_array_equal(np.asarray(s1.rgb_sum),
                                  np.asarray(s8.rgb_sum))
