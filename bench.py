"""Benchmark: Mrays/sec/chip at 1080p on the Cornell-box sphere scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
driver.  vs_baseline is measured against the 300 Mrays/s/chip north-star
target (BASELINE.json — the reference publishes no numbers of its own).

Rays are *actually traced segments* counted in-kernel (camera path segments
+ shadow rays + photon segments), per BASELINE.md's metric definition — not
the theoretical maximum.

Usage: python bench.py [--small] [--config N] [--spp N] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# persistent compilation cache: helps on runtimes whose TPU plugin supports
# executable serialization (standard Cloud TPU); on the axon tunnel it only
# covers CPU-side jits — see README "First run" for the measured compile
# distribution
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import jax


def build_bench(config_id: int, small: bool):
    from tpurt import (
        RenderConfig,
        cornell_spheres_scene,
        dispersive_scene,
        instanced_scene,
        make_camera,
    )

    if small:
        w, h = 640, 360
    else:
        w, h = 1920, 1080

    # Pallas megakernel backend: sphere scenes render in the fused kernel;
    # scenes beyond its static budget (e.g. config 3's 256 instances) fall
    # back to the XLA integrator automatically in tpurt.render.
    kw = dict(backend="pallas")
    if config_id == 0:  # BASELINE config 1 AT SPEC (BASELINE.json:7):
        # "3 diffuse spheres + ground + 1 light, 256x256, 4 spp, 2-bounce
        # megakernel" — measured exactly as specified (VERDICT r3 item 6;
        # bench config 1 remains the 1080p north-star scene). The tiny
        # 4-spp frame is launch-overhead-visible by design; the artifact
        # records the spec, not a steady-state flattering variant.
        from tpurt.scene import Light, Material, Sphere, build_scene
        w = h = 256 if not small else 128
        cfg = RenderConfig(width=w, height=h, depth=2, **kw)
        materials = [
            Material.diffuse((0.8, 0.8, 0.8)),
            Material.diffuse((0.65, 0.05, 0.05)),
            Material.diffuse((0.12, 0.45, 0.15)),
            Material.diffuse((0.2, 0.3, 0.9)),
        ]
        spheres = [
            Sphere(0, 1000.0, (0.0, -1000.0, 0.0)),  # ground
            Sphere(1, 1.0, (-2.2, 1.0, 0.0)),
            Sphere(2, 1.0, (0.0, 1.0, 0.0)),
            Sphere(3, 1.0, (2.2, 1.0, 0.0)),
        ]
        lights = [Light.square_area([0.0, 6.0, -2.0], [0.0, -1.0, 0.0],
                                    2.0, [1.0, 1.0, 1.0], 4.0, 5500.0)]
        scene = build_scene(materials, spheres, [], lights)
        cam = make_camera((0, 2.5, -8), (0, 1, 0), vfov=50.0,
                          aspect_ratio=1.0)
    elif config_id == 2:  # Cornell 512x512 64spp 8-bounce (BASELINE config 2)
        w = h = 512 if not small else 256
        cfg = RenderConfig(width=w, height=h, depth=8, **kw)
        scene = cornell_spheres_scene()
        cam = make_camera((0, 5, -12), (0, 5, 0), vfov=60.0, aspect_ratio=w / h)
    elif config_id == 3:  # >=256 instances 1080p (BASELINE config 3)
        # full static unroll: a one-off Mosaic compile (warmup, not timed;
        # artifact median ~25 s, but compile_s is contention noise — see
        # README "First run" for the measured 6 s-6 min distribution) buys
        # ~4x the steady-state throughput of the SMEM sweep.
        # Sampler stack (all unbiased, docs/DESIGN.md; estimator variance
        # measured by tools/quality.py): tile-stratified photon emission
        # with fine direction cells + shared-k + bounce strata makes the
        # photon phase vote-prunable.  WINDOW choice (round 5, VERDICT r4
        # item 2): this row ships the QUALITY-PER-SECOND winner, window
        # 16 — by mrays_quality (= Mrays/s x eff_rgb, emitted below) w16
        # beats the round-4 window-64 epoch fold ~3x (w16: ~335 x ~101 vs
        # w64: ~415 x ~26, QUALITY.json spp-64 rows), so the w64 number
        # is a raw-throughput frontier datum (README), not this line.
        # pallas_cluster_ordered drives the baked leaf sweeps in near-to-
        # far stack order (bit-identical results, +2% measured: 304->310).
        cfg = RenderConfig(width=w, height=h, depth=30,
                           pallas_static_unroll=512,
                           pallas_cluster_size=32,
                           pallas_cluster_ordered=True,
                           photon_strata=16, photon_strata_dir=256,
                           photon_strata_shared_k=True,
                           photon_strata_bounce=True,
                           camera_strata_bounce=True,
                           photon_strata_window=16,
                           pallas_regen_drift=1,
                           hero_wavelengths=8, **kw)
        scene = instanced_scene(256)
        cam = make_camera((0, 10, -14), (0, 1, 8), vfov=55.0, aspect_ratio=w / h)
    elif config_id == 4:  # dispersive spectral scene (BASELINE config 4:
        # "dispersive glass + metal materials, hero-wavelength sampling")
        cfg = RenderConfig(width=w, height=h, depth=30,
                           dispersion_in_camera_path=True,
                           hero_wavelengths=4, **kw)
        scene = dispersive_scene()
        cam = make_camera((0, 3, -4), (0, 1, 5), vfov=55.0, aspect_ratio=w / h)
    elif config_id == 5:  # wavefront tracer, mixed materials (config 5)
        cfg = RenderConfig(width=w, height=h, depth=30,
                           backend="wavefront_fused",
                           enable_photons=False, wf_pool=262144)
        scene = dispersive_scene()  # diffuse + dielectric + metal materials
        cam = make_camera((0, 3, -4), (0, 1, 5), vfov=55.0, aspect_ratio=w / h)
    elif config_id == 6:  # EXTRA (not in BASELINE): 4k-tri mesh through the
        # dynamic whole-tile BVH walk, with the measured-best mesh sampler
        # stack (docs/DESIGN.md) — makes mesh throughput a driver-visible
        # artifact instead of a README claim.
        from tpurt import torus_mesh_scene
        cfg = RenderConfig(width=w, height=h, depth=30,
                           pallas_bvh=True, pallas_bvh_leaf=64,
                           photon_strata=16, photon_strata_dir=4096,
                           photon_strata_shared_k=True,
                           photon_strata_bounce=True,
                           camera_strata_bounce=True,
                           photon_strata_window=1,
                           pallas_regen_drift=1,
                           hero_wavelengths=4, **kw)
        scene = torus_mesh_scene(45, 45)  # 4050 triangles
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=w / h)
    elif config_id == 7:  # EXTRA (not in BASELINE): chunked any-size mode
        # (VERDICT r2 item 1): a 64,800-triangle torus through
        # pallas_bvh_chunk — the mesh exceeds MAX_BVH_TRIS (8192), so the
        # fused walk streams per-chunk sub-BVH slabs HBM->SMEM with a
        # near-to-far worklist + live-t re-vote (kernels/bvh_pallas.py).
        # Sampler stack = the measured mesh stack; width-8 wide BVH nodes
        # (round 5 in-session ladder on this scene: 108.9 -> 117.1 (w4)
        # -> 122.6 (w8); field scene 56.4 -> 63.6 -> 64.4 — DESIGN.md
        # 'Wide-branching BVH').
        from tpurt import torus_mesh_scene
        cfg = RenderConfig(width=w, height=h, depth=30,
                           pallas_bvh=True, pallas_bvh_leaf=16,
                           pallas_bvh_chunk=1024,
                           pallas_bvh_width=8,
                           photon_strata=16, photon_strata_dir=4096,
                           photon_strata_shared_k=True,
                           photon_strata_bounce=True,
                           camera_strata_bounce=True,
                           photon_strata_window=1,
                           pallas_regen_drift=1,
                           hero_wavelengths=4, **kw)
        scene = torus_mesh_scene(180, 180)  # 64,800 triangles
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=w / h)
        from tpurt.kernels.mega_pallas import _use_tri_chunked, freeze_scene
        assert _use_tri_chunked(freeze_scene(scene), cfg), \
            "config 7 must exercise the chunked walk"
    elif config_id == 8:  # EXTRA: chunked SPHERE mode (VERDICT r2 item 1's
        # ">=16k-sphere scene"): 16,385 instances — the non-huge tree side
        # exceeds MAX_BVH_SPHERES (4096), so the dynamic walk streams
        # per-chunk sphere slabs exactly like config 7's triangles.
        cfg = RenderConfig(width=w, height=h, depth=30,
                           pallas_sphere_bvh=True, pallas_bvh_leaf=16,
                           pallas_bvh_chunk=1024,
                           pallas_bvh_width=8,
                           photon_strata=16, photon_strata_dir=4096,
                           photon_strata_shared_k=True,
                           photon_strata_bounce=True,
                           camera_strata_bounce=True,
                           photon_strata_window=1,
                           pallas_regen_drift=1,
                           hero_wavelengths=4, **kw)
        scene = instanced_scene(16384)
        cam = make_camera((0, 18, -30), (0, 1, 8), vfov=55.0,
                          aspect_ratio=w / h)
        from tpurt.kernels.mega_pallas import _use_sph_chunked, freeze_scene
        assert _use_sph_chunked(freeze_scene(scene), cfg), \
            "config 8 must exercise the chunked sphere walk"
    elif config_id == 9:  # EXTRA: spatially-distributed chunked geometry —
        # 16 tori x 4,050 tris spread over the ground plane
        # (torus_field_scene): the realistic scene SHAPE whose shadow/
        # photon cross-traffic touches many objects' chunks per bounce
        # (docs/DESIGN.md chunked-mode findings; VERDICT r3 item 1).
        from tpurt import torus_field_scene
        cfg = RenderConfig(width=w, height=h, depth=30,
                           pallas_bvh=True, pallas_bvh_leaf=16,
                           pallas_bvh_chunk=1024,
                           pallas_bvh_width=8,
                           photon_strata=16, photon_strata_dir=4096,
                           photon_strata_shared_k=True,
                           photon_strata_bounce=True,
                           camera_strata_bounce=True,
                           photon_strata_window=1,
                           pallas_regen_drift=1,
                           hero_wavelengths=4, **kw)
        scene = torus_field_scene(16, 45, 45)
        cam = make_camera((0, 14, -16), (0, 1, 10), vfov=55.0,
                          aspect_ratio=w / h)
        from tpurt.kernels.mega_pallas import _use_tri_chunked, freeze_scene
        assert _use_tri_chunked(freeze_scene(scene), cfg), \
            "config 9 must exercise the chunked walk"
    else:  # headline: Cornell sphere scene @1080p, reference defaults
        cfg = RenderConfig(width=w, height=h, depth=30, **kw)
        scene = cornell_spheres_scene()
        cam = make_camera((0, 5, -12), (0, 5, 0), vfov=60.0, aspect_ratio=w / h)
    return cfg, scene, cam


# Quality normalization (VERDICT r4 item 3): configs whose sampler stack
# differs from the reference sampler carry eff_rgb (variance efficiency
# vs reference sampling at equal spp, tools/quality.py) and
# mrays_quality = Mrays/s x eff_rgb — the number a stack choice must win
# by, not raw throughput.  Each entry names the QUALITY.json (scene,
# stack) row that measures this config's estimator; configs 7/8 use the
# same-stack shrunk twins (mesh / instanced-sphere scene family) since
# variance efficiency is an estimator property, not a geometry-size one.
_QUALITY_KEY = {
    3: ("config3", "K2h8_w16"),
    6: ("mesh", "mesh_ship_w1"),
    7: ("mesh", "mesh_ship_w1"),
    8: ("config3", "mesh_ship_w1"),
    9: ("field", "mesh_ship_w1"),
}


def quality_fields(config_id: int, spp: int, mrays: float) -> dict:
    """eff_rgb / mrays_quality fields from the committed QUALITY.json
    artifact (nearest-spp row; eff_spp recorded when it differs from the
    bench spp). Empty when the config runs the reference sampler or no
    measurement exists yet."""
    key = _QUALITY_KEY.get(config_id)
    if key is None:
        return {}
    qscene, qstack = key
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "QUALITY.json")
    try:
        with open(path) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
    except OSError:
        return {}
    cand = [r for r in rows
            if r.get("scene") == qscene and r.get("stack") == qstack
            and "eff_rgb" in r]
    if not cand:
        return {}
    best = min(cand, key=lambda r: abs(r.get("spp", 0) - spp))
    out = {"eff_rgb": best["eff_rgb"],
           "mrays_quality": round(mrays * best["eff_rgb"], 1),
           "quality_scene": qscene, "quality_stack": qstack}
    if best.get("spp") != spp:
        out["eff_spp"] = best["spp"]
    return out


def run_config(config_id: int, small: bool, spp: int, verbose: bool) -> dict:
    cfg, scene, cam = build_bench(config_id, small)
    from tpurt import init_state, render

    dev = jax.devices()[0]
    if verbose:
        print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
              file=sys.stderr)
        print(f"scene: {scene.num_spheres} spheres, {scene.num_triangles} tris, "
              f"{scene.num_lights} lights; {cfg.width}x{cfg.height} depth={cfg.depth}",
              file=sys.stderr)

    # Roofline accounting (VERDICT r3 item 2): the TIMED region uses the
    # plain shipped kernel; the loop-iteration counter (cfg.count_iters,
    # compiled out of shipped kernels) runs in ONE separate untimed
    # stats call afterwards — same scene/config, adjacent progressive
    # state, so the occupancy ratio matches the timed region to noise.
    roofline = None
    step = render
    if cfg.backend == "pallas" and cfg.pallas_regen:
        from tpurt.kernels.mega_pallas import supports_scene
        if supports_scene(scene, cfg):
            from tpurt import roofline as rl
            from tpurt.kernels.mega_pallas import freeze_scene
            roofline = rl.regen_iteration_cost(freeze_scene(scene), cfg)
    elif cfg.backend == "wavefront_fused":
        from tpurt.kernels.mega_pallas import supports_scene
        if supports_scene(scene, cfg):
            from tpurt import roofline as rl
            roofline = rl.fused_wavefront_iteration_cost(cfg, scene)

    state = init_state(cfg)
    # Warmup with the SAME spp (spp is a static jit arg — a different count
    # would recompile inside the timed region) + primes vispoints.
    t0 = time.perf_counter()
    state = step(scene, cfg, cam, state, 1234, spp)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    if verbose:
        print(f"compile+warmup ({spp} spp): {compile_s:.1f}s",
              file=sys.stderr)

    rays_before = float(state.rays)
    t0 = time.perf_counter()
    state = step(scene, cfg, cam, state, 1234, spp)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    rays = float(state.rays) - rays_before
    mrays = rays / dt / 1e6
    samples_per_sec = cfg.n_pixels * spp / dt

    result = {
        "metric": "Mrays/sec/chip (1080p Cornell-box sphere scene)"
                  if config_id == 1 and not small
                  else f"Mrays/sec/chip (config {config_id}{', small' if small else ''})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 300.0, 4),
        # run parameters (ADVICE r1): spp and sampler extensions change the
        # measurement, so record them to keep rounds comparable
        "spp": spp,
        "backend": cfg.backend,
        # compile+warmup wall-clock for this config in THIS process.
        # Highly environment-dependent: 9 replicates of the IDENTICAL
        # headline kernel measured 5.9-313s (median ~17s) — the spread is
        # shared-compile-service contention, not program cost. See README
        # "First run" for the distribution and what the persistent cache
        # does (and does not) cover here.
        "compile_s": round(compile_s, 1),
        # full sampler stack (ADVICE r1): every flag that changes the
        # estimator is recorded so round-over-round numbers stay comparable
        "sampler": {
            "photon_strata": cfg.photon_strata,
            "photon_strata_dir": cfg.photon_strata_dir,
            "photon_strata_shared_k": cfg.photon_strata_shared_k,
            "photon_strata_bounce": cfg.photon_strata_bounce,
            "camera_strata_bounce": cfg.camera_strata_bounce,
            "photon_strata_window": cfg.photon_strata_window,
            "hero_wavelengths": cfg.hero_wavelengths,
            "pallas_regen_drift": cfg.pallas_regen_drift,
        },
    }
    result.update(quality_fields(config_id, spp, mrays))
    # the two-point t(spp) line needs a second point strictly above the
    # measured spp (an spp >= 64 override would divide by zero / invert)
    if config_id == 0 and spp < 64:
        # Launch-overhead decomposition (VERDICT r4 item 6): config 0 is
        # tiny (256^2 x 4 spp, ~2.6 ms of work), so the per-call fixed
        # cost (dispatch + host sync) dominates BY MEASUREMENT, not
        # assertion.  Two-point line t(spp): the same scene/kernel at
        # spp 64 gives the slope (per-sample cost); the intercept is the
        # fixed launch cost.  mrays_spp64 shows the same kernel's
        # throughput once the fixed cost amortizes.
        st64 = init_state(cfg)
        st64 = step(scene, cfg, cam, st64, 1234, 64)
        jax.block_until_ready(st64)
        rb64 = float(st64.rays)
        t0 = time.perf_counter()
        st64 = step(scene, cfg, cam, st64, 1234, 64)
        jax.block_until_ready(st64)
        dt64 = time.perf_counter() - t0
        rays64 = float(st64.rays) - rb64
        slope = (dt64 - dt) / (64 - spp)        # s per spp
        intercept_ms = max(dt - slope * spp, 0.0) * 1e3
        result.update(
            mrays_spp64=round(rays64 / dt64 / 1e6, 2),
            launch_intercept_ms=round(intercept_ms, 2),
            launch_pct_of_spec_run=round(100.0 * intercept_ms / (dt * 1e3),
                                         1))
    if roofline is not None:
        from tpurt import roofline as rl
        cull_mix = None
        if cfg.backend == "wavefront_fused":
            from tpurt.kernels.wavefront_pallas import wavefront_fused_stats
            state, iters = wavefront_fused_stats(scene, cfg, cam, state,
                                                 1234, spp)
        else:
            from tpurt.kernels.mega_regen import render_regen_stats
            from tpurt.kernels.mega_pallas import (_use_clusters,
                                                   freeze_scene)
            fsc = freeze_scene(scene)
            if _use_clusters(fsc, cfg):
                # MEASURED cond mix (VERDICT r4 item 4): the cull tree's
                # vote-gated leaf-sweep conds dominate the jaxpr model's
                # [min,max] interval on this config — run the stats pass
                # with the branch-mix cells and collapse it.
                state, vec = render_regen_stats(
                    scene, cfg.with_(count_walk_stats=True), cam, state,
                    1234, spp)
                vec = [float(v) for v in vec]
                iters = vec[0]
                cull_mix = {"closest_visited": vec[9],
                            "closest_taken": vec[10],
                            "shadow_visited": vec[11],
                            "shadow_taken": vec[12],
                            "leaf_ops": rl.cluster_leaf_ops(fsc, cfg)}
            else:
                state, iters = render_regen_stats(scene, cfg, cam, state,
                                                  1234, spp)
        jax.block_until_ready(state)
        ops_hi = roofline["ops_per_iter"]
        ops_lo = roofline["ops_per_iter_lo"]
        if cull_mix is not None and float(iters) > 0:
            lo_ops = cull_mix["leaf_ops"]
            it = float(iters)
            for cls in ("closest", "shadow"):
                taken = cull_mix[f"{cls}_taken"] / it
                skipped = (cull_mix[f"{cls}_visited"]
                           - cull_mix[f"{cls}_taken"]) / it
                ops_hi -= skipped * lo_ops[cls]
                ops_lo += taken * lo_ops[cls]
            result["cond_mix_measured"] = True
            result["cull_take_rate"] = {
                cls: round(cull_mix[f"{cls}_taken"]
                           / max(cull_mix[f"{cls}_visited"], 1.0), 3)
                for cls in ("closest", "shadow")}
        result.update(rl.roofline_fields(
            ops_hi, float(iters), rays,
            cfg.pallas_lanes, dt,
            ops_per_iter_lo=ops_lo))
        # walk/chunk configs carry nested loops counted once, not
        # multiplied — pct_peak is then a LOWER bound (tpurt/roofline.py)
        if roofline["nested"]:
            result["roofline_lower_bound"] = True
        if verbose:
            print(f"roofline: {result['gflops']} GFLOP-eq/s issued "
                  f"({result['pct_peak_vpu']}% of v5e VPU peak), "
                  f"occupancy {result['occupancy']}", file=sys.stderr)
    if verbose:
        print(f"{spp} spp in {dt:.2f}s -> {mrays:.1f} Mrays/s, "
              f"{samples_per_sec / 1e6:.2f} Msamples/s, "
              f"{rays / (cfg.n_pixels * spp):.1f} segments/pixel/spp",
              file=sys.stderr)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="640x360 quick mode")
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--all", action="store_true",
                    help="run configs 0-9: the 5 BASELINE configs (plus "
                         "config 0 = BASELINE config 1 at spec) and the "
                         "scale extras 6 (4k mesh), 7 (64.8k chunked), "
                         "8 (16k spheres), 9 (field scene), one JSON "
                         "line each")
    ap.add_argument("--spp", type=int, default=0,
                    help="timed samples (0 = per-config default: 256 for the "
                         "sub-second wavefront config 5, else 64)")
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    if not args.all and args.config not in range(10):
        ap.error(f"--config must be 0-9, got {args.config} (a typo here "
                 "used to silently benchmark the config-1 scene)")
    configs = list(range(10)) if args.all else [args.config]
    # Per-config spp defaults follow the BASELINE.json specs where one is
    # given (VERDICT r3 item 6): config 0 at its specified 4 spp, config 4
    # at 256 spp, config 5 at 1024 spp; the unspecified configs time a
    # 64-spp steady-state region.
    SPEC_SPP = {0: 4, 4: 256, 5: 1024}
    for cid in configs:
        spp = args.spp or SPEC_SPP.get(cid, 64)
        result = run_config(cid, args.small, spp, not args.json_only)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
