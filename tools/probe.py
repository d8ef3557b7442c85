"""One parameterized TPU perf probe (consolidates the round-1 probe_* scripts).

Scenes:
  config3   instanced_scene(256) @1080p with the bench.py config-3 camera
  spheres   instanced_scene(N) via the dynamic sphere-BVH walk
  mesh      torus_mesh_scene(~N tris) via the dynamic triangle-BVH walk
  cornell   cornell_spheres_scene @1080p (bench config 1)
  lights    many_light_scene(--n lights) @1080p (light_sample A/B)

Any RenderConfig field can be overridden with --set key=value (repeatable);
values are parsed as Python literals.  Prints ONE JSON line with the
steady-state Mrays/s, segments/pixel, and compile time.

Examples:
  timeout 3500 python tools/probe.py config3 --spp 8 --set photon_strata=16
  timeout 3500 python tools/probe.py mesh --n 4096 --set pallas_bvh_leaf=64
  timeout 3500 python tools/probe.py spheres --n 1024 --spp 8

NOTE (memory/tpu-probe-tooling): run strictly serially — the axon TPU
tunnel tolerates one client; cold Mosaic compiles can take 5-25 min.
"""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import math
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))
import jax


def parse_sets(pairs):
    # the shared validated parser (unknown field names fail fast instead
    # of silently producing a TypeError deep in RenderConfig)
    from tpurt.config import RenderConfig
    return RenderConfig.parse_overrides(pairs)


def build(args):
    from tpurt import (RenderConfig, cornell_spheres_scene, instanced_scene,
                       make_camera, torus_mesh_scene)
    kw = dict(width=1920, height=1080, depth=args.depth, backend="pallas")
    if args.scene == "config3":
        kw.update(pallas_static_unroll=512, pallas_cluster_size=32)
        kw.update(parse_sets(args.set))
        cfg = RenderConfig(**kw)
        scene = instanced_scene(256)
        cam = make_camera((0, 10, -14), (0, 1, 8), vfov=55.0,
                          aspect_ratio=16 / 9)
    elif args.scene == "spheres":
        kw.update(pallas_sphere_bvh=True, pallas_bvh_leaf=16)
        kw.update(parse_sets(args.set))
        cfg = RenderConfig(**kw)
        scene = instanced_scene(args.n)
        cam = make_camera((0, 18, -30), (0, 1, 8), vfov=55.0,
                          aspect_ratio=16 / 9)
        from tpurt.kernels.mega_pallas import (_use_sph_bvh,
                                               _use_sph_chunked,
                                               freeze_scene)
        fs = freeze_scene(scene)
        assert _use_sph_bvh(fs, cfg) or _use_sph_chunked(fs, cfg), \
            "sphere-BVH/chunked not engaged"
    elif args.scene == "mesh":
        kw.update(pallas_bvh=True, pallas_bvh_leaf=32)
        kw.update(parse_sets(args.set))
        cfg = RenderConfig(**kw)
        nu = max(4, int(round(math.sqrt(args.n / 2))))
        nv = max(2, args.n // (2 * nu))
        scene = torus_mesh_scene(nu, nv)
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=16 / 9)
        from tpurt.kernels.mega_pallas import (_use_tri_bvh,
                                               _use_tri_chunked,
                                               freeze_scene)
        fs = freeze_scene(scene)
        assert _use_tri_bvh(fs, cfg) or _use_tri_chunked(fs, cfg), \
            "tri-BVH/chunked not engaged"
    elif args.scene == "field":
        # spatially-distributed chunked-mesh scene (bench config 7):
        # --n ~ total triangles across 16 tori
        from tpurt import torus_field_scene
        kw.update(pallas_bvh=True, pallas_bvh_leaf=64)
        kw.update(parse_sets(args.set))
        cfg = RenderConfig(**kw)
        per = max(128, args.n // 16)
        nu = max(4, int(round(math.sqrt(per / 2))))
        nv = max(2, per // (2 * nu))
        scene = torus_field_scene(16, nu, nv)
        cam = make_camera((0, 14, -16), (0, 1, 10), vfov=55.0,
                          aspect_ratio=16 / 9)
        from tpurt.kernels.mega_pallas import (_use_tri_bvh,
                                               _use_tri_chunked,
                                               freeze_scene)
        fs = freeze_scene(scene)
        assert _use_tri_bvh(fs, cfg) or _use_tri_chunked(fs, cfg), \
            "tri-BVH/chunked not engaged"
    elif args.scene == "lights":
        # many-light NEE stress (--n = light count); A/B the modes with
        #   probe.py lights --n 16
        #   probe.py lights --n 16 --set light_sample=\"power\"
        from tpurt import many_light_scene
        kw.update(parse_sets(args.set))
        cfg = RenderConfig(**kw)
        scene = many_light_scene(args.n)
        cam = make_camera((0, 5, -12), (0, 5, 0), vfov=60.0,
                          aspect_ratio=16 / 9)
    else:  # cornell
        kw.update(parse_sets(args.set))
        cfg = RenderConfig(**kw)
        scene = cornell_spheres_scene()
        cam = make_camera((0, 5, -12), (0, 5, 0), vfov=60.0,
                          aspect_ratio=16 / 9)
    return cfg, scene, cam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", choices=["config3", "spheres", "mesh", "field",
                                      "cornell", "lights"])
    ap.add_argument("--n", type=int, default=1024,
                    help="spheres: count; mesh: ~triangle count; "
                         "lights: light count")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--set", action="append", metavar="KEY=VAL",
                    help="RenderConfig override, repeatable")
    args = ap.parse_args()

    from tpurt import init_state, render
    cfg, scene, cam = build(args)

    state = init_state(cfg)
    t0 = time.perf_counter()
    state = render(scene, cfg, cam, state, 1234, args.spp)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    r0 = float(state.rays)
    t0 = time.perf_counter()
    state = render(scene, cfg, cam, state, 1234, args.spp)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    rays = float(state.rays) - r0
    out = {
        "scene": args.scene, "n": args.n, "spp": args.spp,
        "overrides": parse_sets(args.set),
        "mrays": round(rays / dt / 1e6, 1),
        "segments_pp": round(rays / (cfg.n_pixels * args.spp), 2),
        "dt": round(dt, 3), "compile_s": round(compile_s, 1),
    }
    if cfg.count_walk_stats:
        # one more (untimed) call through the stats path: per-iteration
        # phase occupancy + chunked-walk worklist diagnostics
        from tpurt.kernels.mega_regen import render_regen_stats
        state, v = render_regen_stats(scene, cfg, cam, state, 1234,
                                      args.spp)
        v = [float(x) for x in v]
        iters, lanes = v[0], cfg.pallas_lanes
        out["stats"] = {
            "iters": iters,
            "cam_occ": round(v[1] / (iters * lanes), 4),
            "ph_occ": round(v[2] / (iters * lanes), 4),
            "straggler_frac": round(v[3] / iters, 4),
            "drift_stall_occ": round(v[4] / (iters * lanes), 4),
            "closest_wl_per_iter": round(v[5] / iters, 3),
            "closest_swept_per_iter": round(v[6] / iters, 3),
            "shadow_wl_per_iter": round(v[7] / iters, 3),
            "shadow_swept_per_iter": round(v[8] / iters, 3),
            # cull-tree branch mix (cells 8-11; 0 when no cull tree /
            # ordered-walk closest — see mega_pallas._make_scene_fns)
            "cull_closest_take": round(v[10] / max(v[9], 1.0), 4),
            "cull_shadow_take": round(v[12] / max(v[11], 1.0), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
