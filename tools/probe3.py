"""Probe config-3 variants: where does the time go?"""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))
import jax

from tpurt import (RenderConfig, instanced_scene, make_camera, init_state,
                   render)

VARIANTS = {
    "base":        dict(),
    "base32":      dict(),            # spp=32 (README comparability)
    "no_photons":  dict(enable_photons=False),
    "lanes2048":   dict(pallas_lanes=2048),
    "cluster16":   dict(pallas_cluster_size=16),
    "cluster64":   dict(pallas_cluster_size=64),
    "lanes8192":   dict(pallas_lanes=8192),
    "tilesync":    dict(pallas_regen=False, pallas_lanes=1024),
    # coherence probes: depth-1 camera-only = perfectly coherent tiles
    "depth1":      dict(enable_photons=False),
    "noclusters":  dict(pallas_cluster_size=0),
    # tile-coherent stratified photon emission
    "strata8":     dict(photon_strata=8),
    "strata16":    dict(photon_strata=16),
    "strata4":     dict(photon_strata=4),
    "strata8c16":  dict(photon_strata=8, pallas_cluster_size=16),
    "strata16c8":  dict(photon_strata=16, pallas_cluster_size=8),
    # dynamic sphere BVH walk (ordered near-to-far descent)
    "sphbvh8":     dict(pallas_sphere_bvh=True, pallas_bvh_leaf=8),
    "sphbvh16":    dict(pallas_sphere_bvh=True, pallas_bvh_leaf=16),
    "sphbvh32":    dict(pallas_sphere_bvh=True, pallas_bvh_leaf=32),
}

name = sys.argv[1]
kw = dict(VARIANTS[name])
depth = kw.pop("depth", 1 if name == "depth1" else 30)
base = dict(width=1920, height=1080, depth=depth,
            pallas_static_unroll=512, pallas_cluster_size=32,
            backend="pallas")
base.update(kw)
cfg = RenderConfig(**base)
scene = instanced_scene(256)
cam = make_camera((0, 10, -14), (0, 1, 8), vfov=55.0, aspect_ratio=16/9)
spp = 32 if name == "base32" else 8
state = init_state(cfg)
t0 = time.perf_counter()
state = render(scene, cfg, cam, state, 1234, spp)
jax.block_until_ready(state)
compile_s = time.perf_counter() - t0
r0 = float(state.rays)
t0 = time.perf_counter()
state = render(scene, cfg, cam, state, 1234, spp)
jax.block_until_ready(state)
dt = time.perf_counter() - t0
rays = float(state.rays) - r0
print(json.dumps({"variant": name, "mrays": round(rays/dt/1e6, 1),
                  "segments_pp": round(rays/(cfg.n_pixels*spp), 2),
                  "dt": round(dt, 3), "compile_s": round(compile_s, 1)}))
