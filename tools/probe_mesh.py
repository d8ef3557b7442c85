"""Probe: large-mesh throughput on the XLA+BVH fallback path."""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))
import jax

from tpurt import (RenderConfig, torus_mesh_scene, make_camera, init_state,
                   render)

ntri = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 2
import math
nu = int(math.sqrt(ntri / 2))
nv = max(2, ntri // (2 * nu))
scene = torus_mesh_scene(nu, nv)
cfg = RenderConfig(width=1920, height=1080, depth=30, backend="xla",
                   use_bvh=True)
cam = make_camera((0, 3, -6), (0, 1.5, 0), vfov=55.0, aspect_ratio=16/9)
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
print(json.dumps({"ntri": scene.num_triangles, "spp": spp,
                  "mrays": round(rays/dt/1e6, 2),
                  "segments_pp": round(rays/(cfg.n_pixels*spp), 2),
                  "dt": round(dt, 3), "compile_s": round(compile_s, 1)}))
