"""PIXEL x GEOMETRY 2-D mesh composition + measured collective traffic
(tpurt.parallel.comm; VERDICT r4 item 5).

The 2-D step must reproduce the single-chip render bit-exactly (same RNG
streams, same combine winners as the 1-D geometry path), and the
collective accounting — taken from the traced build, not predicted — must
satisfy the closed-form relations: spp scales call counts linearly, and
moving from the 1-D geometry mesh to the (px x geom) composition divides
every gather's operand bytes by the px-axis size."""

import numpy as np
import pytest

import jax

from tpurt import (RenderConfig, init_state, make_camera, render,
                   resolve_image, torus_mesh_scene)
from tpurt.parallel.comm import collective_stats
from tpurt.parallel.geometry import (init_state_2d, make_2d_mesh,
                                     make_2d_sharded_step,
                                     make_geometry_sharded_step,
                                     split_scene_triangles)
from tpurt.parallel.sharding import make_mesh, make_sharded_step

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")


def _setup(w=48, h=32):
    cfg = RenderConfig(width=w, height=h, depth=4, backend="xla")
    scene = torus_mesh_scene(11, 5)   # 110 tris: shard padding exercised
    cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                      aspect_ratio=w / h)
    return cfg, scene, cam


def test_2d_matches_single_chip_bit_exact():
    cfg, scene, cam = _setup()
    s1 = render(scene, cfg, cam, init_state(cfg), 42, 2)

    mesh2 = make_2d_mesh(4, 2)
    cat = split_scene_triangles(scene, 2)
    step = make_2d_sharded_step(mesh2, cfg, spp=2)
    s8 = step(cat, cam, init_state_2d(cfg, mesh2), 42)

    assert float(s1.rays) == float(s8.rays)
    i1 = np.asarray(resolve_image(cfg, s1))
    i8 = np.asarray(resolve_image(cfg, s8))
    np.testing.assert_array_equal(i1, i8)


def test_pixel_sharding_is_one_scalar_psum():
    """The pixel axis claims 'embarrassingly parallel, one scalar psum
    per call' — hold the accounting to it."""
    cfg, scene, cam = _setup()
    mesh = make_mesh(8)
    from tpurt.parallel.sharding import init_state_sharded
    step = make_sharded_step(mesh, cfg, spp=2)
    st = init_state_sharded(cfg, mesh)
    stats = collective_stats(step, scene, cam, st, jnp.uint32(7))
    assert set(stats["collectives"]) == {"psum"}
    ps = stats["collectives"]["psum"]
    assert ps["calls"] == 1          # scan accumulates, ONE psum after
    assert ps["bytes"] == 4          # one f32 scalar


def test_geometry_gather_scales_with_spp_and_divides_by_px():
    cfg, scene, cam = _setup()
    mesh1 = make_mesh(8)
    cat8 = split_scene_triangles(scene, 8)

    def stats_1d(spp):
        step = make_geometry_sharded_step(mesh1, cfg, spp=spp)
        return collective_stats(step, cat8, cam, init_state(cfg),
                                jnp.uint32(7))

    s1 = stats_1d(1)
    s2 = stats_1d(2)
    ag1 = s1["collectives"]["all_gather"]
    ag2 = s2["collectives"]["all_gather"]
    assert ag1["calls"] > 0 and "pmin" in s1["collectives"]
    # scan multiplier: spp=2 exactly doubles calls and bytes
    assert ag2["calls"] == 2 * ag1["calls"]
    assert ag2["bytes"] == 2 * ag1["bytes"]
    # the geometry hook's gathers sit inside the camera/photon BOUNCE
    # while_loops (integrate.py:642,880) — the accounting counts them
    # once per site, i.e. the unit is bytes per BOUNCE, and the flag
    # must say so
    assert s1["flags"] == ["collectives_inside_while_counted_once"]

    # 2-D (4 x 2): per-device ray-plane count N divides by the px-axis
    # size (4), so TOTAL gather operand bytes divide by 4.  The division
    # needs the image to actually split: use an explicit small tile and
    # a tile-divisible pixel count (with the default tile bigger than
    # the whole image, pixel sharding pads every device back to one full
    # tile and no bytes are saved — the accounting correctly showed 1x).
    cfgt = RenderConfig(width=64, height=32, depth=4, backend="xla",
                        tile_size=256)
    g1 = make_geometry_sharded_step(mesh1, cfgt, spp=1)
    s1t = collective_stats(g1, cat8, cam, init_state(cfgt), jnp.uint32(7))
    ag1t = s1t["collectives"]["all_gather"]
    mesh2 = make_2d_mesh(4, 2)
    cat2 = split_scene_triangles(scene, 2)
    step2 = make_2d_sharded_step(mesh2, cfgt, spp=1)
    s2d = collective_stats(step2, cat2, cam, init_state_2d(cfgt, mesh2),
                           jnp.uint32(7))
    ag2d = s2d["collectives"]["all_gather"]
    assert ag2d["bytes"] * 4 == ag1t["bytes"], (ag2d, ag1t)
