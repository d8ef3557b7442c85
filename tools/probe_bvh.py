"""Prototype: whole-tile dynamic BVH traversal kernel — correctness vs
brute force + throughput/SMEM-capacity probe. Usage: probe_bvh.py [T] [cpu]"""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
on_cpu = len(sys.argv) > 2 and sys.argv[2] == "cpu"
if on_cpu:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.kernels.bvh_pallas import (build_tri_bvh_tables, pack_tables,
                                      packed_views, closest_tri_bvh,
                                      tri_shadow_bvh)

# triangle soup: little triangles scattered in a box (like a chopped mesh)
rng = np.random.default_rng(3)
ctr = rng.uniform(-6, 6, (T, 3)).astype(np.float32)
a = ctr + rng.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
e1 = rng.uniform(-0.5, 0.5, (T, 3)).astype(np.float32)
e2 = rng.uniform(-0.5, 0.5, (T, 3)).astype(np.float32)
n = np.cross(e1, e2)
n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)

class FT:
    def __init__(s_, i):
        s_.a = tuple(a[i]); s_.e1 = tuple(e1[i]); s_.e2 = tuple(e2[i])
        s_.n = tuple(n[i]); s_.mat = int(i % 7)

tris = [FT(i) for i in range(T)]
WIDTH = int(os.environ.get("PROBE_WIDTH", "0"))  # 0=binary, 4/8=wide
tri_tab, node_f, node_i = build_tri_bvh_tables(tris, leaf_size=16,
                                               width=WIDTH)
packed = jnp.asarray(pack_tables(tri_tab, node_f, node_i))
B = node_f.shape[0]
print(f"T={T} nodes={B} packed={packed.shape} "
      f"({packed.size*4/1024:.0f} KB SMEM)", file=sys.stderr)

R = 8  # (R,128) = 1024-lane tiles
LANES = R * 128
N_TILES = 16

LEAF_UNROLL = int(os.environ.get("PROBE_LEAF_UNROLL", "0"))


def kernel(rays_ref, tab_ref, out_ref):
    o = (rays_ref[0], rays_ref[1], rays_ref[2])
    d = (rays_ref[3], rays_ref[4], rays_ref[5])
    mask = jnp.ones_like(o[0], bool)
    nodes, tri = packed_views(tab_ref, T)
    t, nrm, mat, (nv, lv, pv) = closest_tri_bvh(
        nodes, tri, o, d, mask, leaf_size=LEAF_UNROLL, stats=True,
        width=WIDTH)
    occ = tri_shadow_bvh(nodes, tri, o, d, jnp.full_like(o[0], 4.0), mask,
                         leaf_size=LEAF_UNROLL, width=WIDTH)
    out_ref[0] = t
    out_ref[1] = nrm[0]
    out_ref[2] = nrm[1]
    out_ref[3] = nrm[2]
    out_ref[4] = mat.astype(jnp.float32)
    out_ref[5] = jnp.where(occ, 1.0, 0.0)
    # per-tile closest-walk visit counters in lanes 0..2 of row 0
    row = jax.lax.broadcasted_iota(jnp.int32, o[0].shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, o[0].shape, 1)
    vals = jnp.where(lane == 0, nv.astype(jnp.float32),
                     jnp.where(lane == 1, lv.astype(jnp.float32),
                               jnp.where(lane == 2, pv.astype(jnp.float32),
                                         0.0)))
    out_ref[6] = jnp.where(row == 0, vals, 0.0)

@jax.jit
def run(rays, packed):
    return pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((6, R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((7, R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TILES * 7, R, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(rays, packed)

# rays: half coherent-ish (from a point, toward box), half random
NR = N_TILES * LANES
ro = rng.uniform(-8, 8, (NR, 3)).astype(np.float32)
rd = rng.uniform(-1, 1, (NR, 3)).astype(np.float32)
ro[: NR // 2] = np.float32([0, 0, -10.0]) + rng.uniform(-0.1, 0.1, (NR // 2, 3)).astype(np.float32)
tgt = rng.uniform(-6, 6, (NR // 2, 3)).astype(np.float32)
rd[: NR // 2] = tgt - ro[: NR // 2]

rays = jnp.asarray(
    np.stack([ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]])
    .reshape(6, N_TILES, R, 128).swapaxes(0, 1).reshape(N_TILES * 6, R, 128))

t0 = time.perf_counter()
out = np.asarray(jax.block_until_ready(run(rays, packed)))
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
REPS = 20 if not on_cpu else 1
for _ in range(REPS):
    out = run(rays, packed)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / REPS

out = np.asarray(out).reshape(N_TILES, 7, R, 128)
t_k = out[:, 0].reshape(-1)
mat_k = out[:, 4].reshape(-1)
occ_k = out[:, 5].reshape(-1)
nv = out[:, 6, 0, 0]     # per-tile closest-walk visit counters
lv = out[:, 6, 0, 1]
pv = out[:, 6, 0, 2]

# brute force oracle
oc = ro[:, None, :] - a[None, :, :]
h = np.cross(rd[:, None, :], e2[None, :, :])
det = np.einsum("tk,ntk->nt", e1, h)
eps = np.float32(1.17549435e-38)
inv = 1.0 / np.where(np.abs(det) < eps, 1.0, det)
u = inv * np.einsum("ntk,ntk->nt", oc, h)
q = np.cross(oc, e1[None, :, :])
v = inv * np.einsum("nk,ntk->nt", rd, q)
tt = inv * np.einsum("tk,ntk->nt", e2, q)
valid = (np.abs(det) >= eps) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (tt > eps)
tt = np.where(valid, tt, 1e30)
t_ref = tt.min(axis=1)
occ_ref = (tt < 4.0).any(axis=1)

hit = t_ref < 1e29
match_t = np.allclose(t_k[hit], t_ref[hit], rtol=1e-5, atol=1e-5)
match_occ = ((occ_k > 0.5) == occ_ref).mean()
rays_per_s = 2 * NR / dt  # closest + shadow walks per ray
print(json.dumps({
    "T": T, "nodes": B, "match_t": bool(match_t),
    "occ_agree": float(match_occ),
    "miss_agree": float(((t_k > 1e29) == ~hit).mean()),
    "mrays": round(rays_per_s / 1e6, 1),
    "dt_ms": round(dt * 1e3, 3), "compile_s": round(compile_s, 1),
    # closest-walk visit counters (coherent tiles = first half)
    "nodes_coh": round(float(nv[: N_TILES // 2].mean()), 1),
    "nodes_inc": round(float(nv[N_TILES // 2:].mean()), 1),
    "leaves_coh": round(float(lv[: N_TILES // 2].mean()), 1),
    "leaves_inc": round(float(lv[N_TILES // 2:].mean()), 1),
    "prims_coh": round(float(pv[: N_TILES // 2].mean()), 1),
    "prims_inc": round(float(pv[N_TILES // 2:].mean()), 1),
    "leaf_unroll": LEAF_UNROLL}))
