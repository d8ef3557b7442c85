"""Probe: fused megakernel on MANY-sphere scenes via the dynamic sphere
BVH (the static unroll / cull tree cannot reach these counts)."""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))
import jax

from tpurt import (RenderConfig, instanced_scene, make_camera, init_state,
                   render)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
leaf = int(sys.argv[3]) if len(sys.argv) > 3 else 16
scene = instanced_scene(n)
cfg = RenderConfig(width=1920, height=1080, depth=30, backend="pallas",
                   pallas_sphere_bvh=True, pallas_bvh_leaf=leaf)
from tpurt.kernels.mega_pallas import _use_sph_bvh, freeze_scene
assert _use_sph_bvh(freeze_scene(scene), cfg), "sphere-BVH mode not engaged"
cam = make_camera((0, 18, -30), (0, 1, 8), vfov=55.0, aspect_ratio=16/9)
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
print(json.dumps({"spheres": scene.num_spheres, "leaf": leaf, "spp": spp,
                  "mrays": round(rays/dt/1e6, 1),
                  "segments_pp": round(rays/(cfg.n_pixels*spp), 2),
                  "dt": round(dt, 3), "compile_s": round(compile_s, 1)}))
