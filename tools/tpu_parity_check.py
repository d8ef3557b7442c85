"""TPU <-> CPU identical-seed agreement check (SURVEY §4 item 4: the
multi-backend golden test the CI suite can't run because tests force CPU).

Renders small fixed-seed scenes on the real TPU (regen megakernel) and on
CPU (same kernel, interpret mode), and asserts the images agree except for
rare reassociation branch flips — the same contract the CPU-only suites pin
between integrators. Run manually on a TPU host: python tools/tpu_parity_check.py
"""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import numpy as np


def _render(platform: str, scene_name: str):
    # separate process per platform would be cleaner; jax allows switching
    # the default device only before init, so run CPU via interpret mode
    # explicitly instead (same code path the tests drive).
    import jax
    from tpurt import (RenderConfig, cornell_spheres_scene, init_state,
                       make_camera, render, resolve_image, torus_mesh_scene)

    if scene_name == "cornell":
        scene = cornell_spheres_scene()
        cam = make_camera((0, 5, -12), (0, 5, 0), vfov=60.0,
                          aspect_ratio=16 / 9)
        cfg = RenderConfig(width=192, height=108, depth=8, backend="pallas")
    elif scene_name == "qmc":
        # the Sobol/Owen uint32 ALU path through Mosaic (+ lens dims)
        scene = cornell_spheres_scene()
        cam = make_camera((0, 5, -12), (0, 5, 0), vfov=60.0,
                          aspect_ratio=16 / 9)
        cfg = RenderConfig(width=192, height=108, depth=8, backend="pallas",
                           qmc=True, aperture=0.4, focus_dist=12.0)
    elif scene_name == "instanced":
        # the config-3 production stack: ordered static cull tree
        # (lax.switch leaf dispatch + SMEM stack) + photon strata + hero —
        # the Mosaic-heaviest static path. Smaller frame/spp than the other
        # rows: the CPU side runs the same kernel in interpret mode.
        from tpurt.scene import instanced_scene
        scene = instanced_scene(64)
        cam = make_camera((0, 8, -20), (0, 2, 0), vfov=60.0,
                          aspect_ratio=16 / 9)
        cfg = RenderConfig(width=128, height=72, depth=6, backend="pallas",
                           pallas_static_unroll=64, pallas_cluster_size=8,
                           pallas_cluster_ordered=True,
                           photon_strata=8, photon_strata_dir=64,
                           photon_strata_shared_k=True,
                           photon_strata_bounce=True,
                           photon_strata_window=4,
                           hero_wavelengths=4)
    elif scene_name == "chunked_wide":
        # round-5 production path for configs 7-9: SMEM chunk streaming
        # (forced via a small chunk/threshold) + the width-8 wide-BVH walk
        # on BOTH the top tree and the per-chunk sub-trees.
        scene = torus_mesh_scene(8, 4)
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=16 / 9)
        cfg = RenderConfig(width=160, height=90, depth=5, backend="pallas",
                           pallas_static_unroll=8, pallas_bvh=True,
                           pallas_bvh_leaf=8, pallas_bvh_chunk=16,
                           pallas_bvh_chunk_threshold=32,
                           pallas_bvh_width=8)
    else:
        scene = torus_mesh_scene(8, 4)
        cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0,
                          aspect_ratio=16 / 9)
        cfg = RenderConfig(width=192, height=108, depth=6, backend="pallas",
                           pallas_static_unroll=8, pallas_bvh=True)
    state = init_state(cfg)
    interpret = platform == "cpu"
    # bound the interpret runs
    spp = 4 if scene_name in ("instanced", "chunked_wide") else 8
    from tpurt.kernels.mega_regen import render_regen
    with jax.default_device(jax.devices(platform)[0]):
        st = render_regen(scene, cfg, cam, state, 1234, spp,
                          interpret=interpret)
        img = np.asarray(resolve_image(cfg, st))
    return img, float(st.rays)


def main():
    import jax
    has_tpu = any(d.platform == "tpu" for d in jax.devices())
    if not has_tpu:
        print("SKIP: no TPU attached (run on a TPU host)")
        return 0
    # Cross-HARDWARE bounds (measured 2026-08-17, v5e vs x86): the TPU
    # fuses multiply-adds and runs with excess precision, so float results
    # differ at ulp level (median abs diff ~1e-6, p90 ~4e-5) and a few
    # grazing-boundary branches (RR, refraction, triangle det) flip —
    # amplified to full-pixel diffs by the x400 single-wavelength weights
    # at low spp. Contract: ray counts within 1e-5 relative (flips are
    # countable-rare), <5% of pixels with >1% relative radiance diff.
    ok = True
    results = []
    for scene in ("cornell", "mesh", "qmc", "instanced", "chunked_wide"):
        img_t, rays_t = _render("tpu", scene)
        img_c, rays_c = _render("cpu", scene)
        rays_ok = abs(rays_t - rays_c) <= 1e-5 * max(rays_t, 1.0)
        rel = np.abs(img_t - img_c) / np.maximum(np.abs(img_c), 1e-2)
        frac = float((rel > 0.01).any(axis=-1).mean())
        med = float(np.median(np.abs(img_t - img_c)))
        passed = rays_ok and frac < 0.05 and med < 1e-4
        ok &= passed
        print(f"{scene}: rays tpu={rays_t:.0f} cpu={rays_c:.0f} "
              f"(ok={rays_ok})  branch-flip pixels={frac:.4%}  "
              f"median abs diff={med:.2e}  {'PASS' if passed else 'FAIL'}")
        results.append({"scene": scene, "rays_tpu": rays_t,
                        "rays_cpu": rays_c, "branch_flip_frac": frac,
                        "median_abs_diff": med, "pass": passed})
    # driver-visible artifact (VERDICT r1 weak-item 8)
    import json
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPU_PARITY.json")
    with open(out, "w") as f:
        json.dump({"pass": ok, "scenes": results}, f, indent=1)
    print(f"wrote {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
