"""Prototype probe: MXU all-pairs triangle leaf tests vs the VPU sweep.

The walk configs are serialization-bound in their leaf sweeps (roofline,
docs/DESIGN.md): 64 sequential per-triangle tests of ~40 vector ops each,
fed by 16 scalar SMEM loads per triangle. This probe measures the
alternative representation: Moller-Trumbore is LINEAR in the lane feature
vector f = [d | o x d | o | 1] —

    det   = d . (-N)                     (N = e1 x e2, unnormalized)
    u*det = (o x d) . e2  + d . (a x e2)
    v*det = (o x d) . (-e1) + d . (e1 x a)
    t*det = o . N - a . N

so ONE (lanes, 16) x (16, T) matmul per output per row computes every
(ray, triangle) pair on the MXU, with a divide/compare/min epilogue on
the (T, 128) result planes. Not bit-identical to the sweep (different
rounding), so any integration would be an opt-in mode — this probe only
answers "is the MXU route faster at all?".

Usage: probe_mxu_leaf.py [T] [cpu]   (T = triangles per leaf, default 64)
"""
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 64
on_cpu = len(sys.argv) > 2 and sys.argv[2] == "cpu"
if on_cpu:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.kernels.bvh_pallas import (build_tri_bvh_tables, pack_tables,
                                      packed_views, _sweep_leaf_fn,
                                      _tri_closest_body,
                                      _tri_closest_state)

MISS = np.float32(1e30)
R = 32               # (R, 128) lanes per tile (the production tile shape)
LANES = R * 128
N_TILES = 8
REPS = 32            # leaf sweeps per kernel call (amortize launch)

rng = np.random.default_rng(3)
ctr = rng.uniform(-6, 6, (T, 3)).astype(np.float32)
a = ctr + rng.uniform(-0.3, 0.3, (T, 3)).astype(np.float32)
e1 = rng.uniform(-0.5, 0.5, (T, 3)).astype(np.float32)
e2 = rng.uniform(-0.5, 0.5, (T, 3)).astype(np.float32)
n = np.cross(e1, e2)
nn = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)


class FT:
    def __init__(s_, i):
        s_.a = tuple(a[i]); s_.e1 = tuple(e1[i]); s_.e2 = tuple(e2[i])
        s_.n = tuple(nn[i]); s_.mat = int(i % 7)


# ---- kernel A: the production unrolled VPU sweep over ONE leaf ----
tris_obj = [FT(i) for i in range(T)]
tri_tab, node_f, node_i = build_tri_bvh_tables(tris_obj, leaf_size=T)
packed = jnp.asarray(pack_tables(tri_tab, node_f, node_i, leaf_size=T))


def kernel_sweep(rays_ref, tab_ref, out_ref):
    o = (rays_ref[0], rays_ref[1], rays_ref[2])
    d = (rays_ref[3], rays_ref[4], rays_ref[5])
    _, tri = packed_views(tab_ref, T)
    leaf_fn = _sweep_leaf_fn(tri, o, d, _tri_closest_body, T, 0)
    st = _tri_closest_state(o)
    for _ in range(REPS):
        st = dict(st, t=jnp.full_like(o[0], MISS))
        st = leaf_fn(jnp.int32(0), jnp.int32(T), st)
    out_ref[0] = st["t"]


# ---- kernel B: MXU all-pairs ----
# G matrices (16, T): rows = [d(0:3) | oxd(3:6) | o(6:9) | const(9)]
G_det = np.zeros((16, T), np.float32)
G_u = np.zeros((16, T), np.float32)
G_v = np.zeros((16, T), np.float32)
G_t = np.zeros((16, T), np.float32)
G_det[0:3] = -n.T
G_u[3:6] = e2.T
G_u[0:3] = np.cross(a, e2).T
G_v[3:6] = -e1.T
G_v[0:3] = np.cross(e1, a).T
G_t[6:9] = n.T
G_t[9] = -np.einsum("ij,ij->i", a, n)
G_all = jnp.asarray(np.stack([G_det, G_u, G_v, G_t]))  # (4, 16, T)

EPS_DET = np.float32(1.17549435e-38)


def kernel_mxu(rays_ref, g_ref, out_ref):
    o = (rays_ref[0], rays_ref[1], rays_ref[2])
    d = (rays_ref[3], rays_ref[4], rays_ref[5])
    oxd = (o[1] * d[2] - o[2] * d[1],
           o[2] * d[0] - o[0] * d[2],
           o[0] * d[1] - o[1] * d[0])
    feats = (*d, *oxd, *o, jnp.ones_like(o[0]))  # 10 planes of (R, 128)

    best = jnp.full_like(o[0], MISS)
    for _ in range(REPS):
        best = jnp.full_like(o[0], MISS)
        rows = []
        for r in range(R):
            # F_r: (16, 128) — stack feature rows (pad to 16)
            fr = [f[r:r + 1, :] for f in feats]
            fr += [jnp.zeros_like(fr[0])] * (16 - len(fr))
            F = jnp.concatenate(fr, axis=0)
            # four (T,16)@(16,128) matmuls on the MXU
            det = jax.lax.dot(g_ref[0].T, F,
                              preferred_element_type=jnp.float32)
            un = jax.lax.dot(g_ref[1].T, F,
                             preferred_element_type=jnp.float32)
            vn = jax.lax.dot(g_ref[2].T, F,
                             preferred_element_type=jnp.float32)
            tn = jax.lax.dot(g_ref[3].T, F,
                             preferred_element_type=jnp.float32)
            s = jnp.where(det >= 0.0, 1.0, -1.0)
            ad = det * s
            us = un * s
            vs = vn * s
            ts = tn / jnp.where(ad >= EPS_DET, det, 1.0)
            ok = ((ad >= EPS_DET) & (us >= 0.0) & (vs >= 0.0)
                  & (us <= ad) & (us + vs <= ad) & (ts > EPS_DET))
            tvals = jnp.where(ok, ts, MISS)
            rows.append(jnp.min(tvals, axis=0, keepdims=True))  # (1,128)
        best = jnp.concatenate(rows, axis=0)  # (R, 128)
    out_ref[0] = best


def run(kernel, extra, n_extra_rows):
    @jax.jit
    def go(rays, extra):
        return pl.pallas_call(
            kernel,
            grid=(N_TILES,),
            in_specs=[pl.BlockSpec((6, R, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)
                      if extra is packed else
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_TILES, R, 128), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(rays, extra)
    t0 = time.perf_counter()
    out = np.asarray(jax.block_until_ready(go(rays_j, extra)))
    compile_s = time.perf_counter() - t0
    best = None
    t0 = time.perf_counter()
    loops = 3 if not on_cpu else 1
    for _ in range(loops):
        best = go(rays_j, extra)
    jax.block_until_ready(best)
    dt = (time.perf_counter() - t0) / loops
    return np.asarray(best), dt, compile_s


# rays: half coherent, half random (as probe_bvh.py)
NR = N_TILES * LANES
ro = rng.uniform(-8, 8, (NR, 3)).astype(np.float32)
rd = rng.uniform(-1, 1, (NR, 3)).astype(np.float32)
ro[: NR // 2] = np.float32([0, 0, -10.0]) + rng.uniform(
    -0.1, 0.1, (NR // 2, 3)).astype(np.float32)
tgt = rng.uniform(-6, 6, (NR // 2, 3)).astype(np.float32)
rd[: NR // 2] = tgt - ro[: NR // 2]
rays_j = jnp.asarray(
    np.stack([ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]])
    .reshape(6, N_TILES, R, 128).swapaxes(0, 1).reshape(N_TILES * 6, R, 128))

outs = {}
for name, (kern, extra) in {
        "sweep": (kernel_sweep, packed),
        "mxu": (kernel_mxu, G_all)}.items():
    best, dt, compile_s = run(kern, extra, 0)
    tests_per_s = NR * T * REPS / dt
    outs[name] = dict(dt_ms=round(dt * 1e3, 3),
                      mtests=round(tests_per_s / 1e6, 1),
                      compile_s=round(compile_s, 1))
    outs[name + "_best"] = best.reshape(-1)

# brute-force oracle
oc = ro[:, None, :] - a[None, :, :]
h = np.cross(rd[:, None, :], e2[None, :, :])
det = np.einsum("tk,ntk->nt", e1, h)
eps = np.float32(1.17549435e-38)
inv = 1.0 / np.where(np.abs(det) < eps, 1.0, det)
u = inv * np.einsum("ntk,ntk->nt", oc, h)
q = np.cross(oc, e1[None, :, :])
v = inv * np.einsum("nk,ntk->nt", rd, q)
tt = inv * np.einsum("tk,ntk->nt", e2, q)
valid = ((np.abs(det) >= eps) & (u >= 0) & (u <= 1) & (v >= 0)
         & (u + v <= 1) & (tt > eps))
t_ref = np.where(valid, tt, MISS).min(axis=1)
hit = t_ref < 1e29

res = {"T": T, "reps": REPS, "lanes": LANES, "tiles": N_TILES}
for name in ("sweep", "mxu"):
    b = outs.pop(name + "_best")
    res[name] = outs[name]
    res[name]["match"] = bool(
        np.allclose(b[hit], t_ref[hit], rtol=1e-4, atol=1e-4))
    res[name]["hit_agree"] = float(((b < 1e29) == hit).mean())
res["mxu_speedup"] = round(res["sweep"]["dt_ms"] / res["mxu"]["dt_ms"], 2)
print(json.dumps(res))
