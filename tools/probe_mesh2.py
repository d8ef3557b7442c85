"""Probe: fused megakernel on mesh scenes via the dynamic BVH path."""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time, json, math
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))
import jax

from tpurt import (RenderConfig, torus_mesh_scene, make_camera, init_state,
                   render)

ntri = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
leaf = int(sys.argv[3]) if len(sys.argv) > 3 else 16
nu = max(4, int(round(math.sqrt(ntri / 2))))
nv = max(2, ntri // (2 * nu))
scene = torus_mesh_scene(nu, nv)
cfg = RenderConfig(width=1920, height=1080, depth=30, backend="pallas",
                   pallas_bvh=True, pallas_bvh_leaf=leaf)
cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0, aspect_ratio=16/9)
from tpurt.kernels.mega_pallas import _use_tri_bvh, freeze_scene
assert _use_tri_bvh(freeze_scene(scene), cfg), "BVH mode not engaged"
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
print(json.dumps({"ntri": scene.num_triangles, "leaf": leaf, "spp": spp,
                  "mrays": round(rays/dt/1e6, 1),
                  "segments_pp": round(rays/(cfg.n_pixels*spp), 2),
                  "dt": round(dt, 3), "compile_s": round(compile_s, 1)}))
