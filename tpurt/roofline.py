"""Absolute-utilization (roofline) accounting for the fused kernels.

Answers the question BENCH numbers alone cannot: is 1057 Mrays/s near the
chip's limit or 10x below it?  (VERDICT r3 item 2.)

Model
-----
The regenerative megakernel executes ONE loop body per tile-iteration;
every lane runs the full body's vector math regardless of how many lanes
are active (masked SIMD).  So the ISSUED vector-op rate is

    issued_ops/s = (sum of per-tile loop iterations / s) * ops_per_iter

where ops_per_iter is counted mechanically from the kernel's own jaxpr
(every elementwise vector primitive, weighted by element count; see
count_jaxpr_ops), and the iteration counts come from the in-kernel
counter (mega_regen rays_ref[:, 1]).  Useful work is the subset done for
ACTIVE lanes:

    occupancy    = traced_segments / (iterations * lanes)
    useful_ops/s = issued_ops/s * occupancy        (to first order)

pct_peak compares issued_ops/s against the v5e VPU peak below.  A config
is COMPUTE-bound when pct_peak is high (>~50%), SCHEDULING-bound when
pct_peak is high but occupancy low (the VPU is busy on masked-out lanes),
and MEMORY/SERIALIZATION-bound when pct_peak is low (the VPU idles on
scalar walks, SMEM loads, or DMA waits — the BVH-walk configs).

v5e peak derivation (documented, not vendor-quoted)
---------------------------------------------------
Public v5e spec: 197 TFLOP/s bf16 on 4 MXUs of 128x128 MACs ->
clock = 197e12 / (4 * 128 * 128 * 2) = 1.50 GHz.  The VPU is an (8, 128)
vector unit with 4 independent ALUs per lane slot (scaling-book model), so

    VPU peak = 1024 lanes * 4 ALUs * 1.50 GHz = 6.1e12 vector ops/s

counting one op per element per issue (an FMA would count 2 FLOPs but
one op; transcendentals cost several issues — weighted below).  HBM
bandwidth 819 GB/s (public v5e spec) for the memory-bound check.

Caveats (kept honest):
  * lax.cond branches are counted at the MAX of their branches.  In the
    regen kernel the cond-gated spawn blocks run on nearly every
    steady-state iteration (lanes desynchronize), so max-branch is the
    realistic steady-state cost, not a loose upper bound.
  * Nested while/fori loops (the dynamic BVH walks, chunked-mode sweeps)
    are NOT multiplied out — their bodies are counted once and reported
    separately in `nested`.  For walk configs ops_per_iter is therefore a
    LOWER bound and pct_peak an UNDER-estimate of issue pressure; the
    DESIGN roofline section says so explicitly.
  * Scalar (SMEM) ops, DMA issue, and the scalar unit are not modeled;
    walk configs are dominated by exactly those, which the low pct_peak
    then exposes as "the VPU is starved", the correct diagnosis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---- v5e peak constants (see module docstring for the derivation) ----
V5E_CLOCK_HZ = 1.50e9
V5E_VPU_LANES = 8 * 128
V5E_VPU_ALUS = 4
V5E_VPU_PEAK_OPS = V5E_VPU_LANES * V5E_VPU_ALUS * V5E_CLOCK_HZ  # 6.1e12
V5E_HBM_BYTES_S = 819e9

# elementwise primitive weights: issue slots per element (estimates; the
# transcendental weight is an average of Mosaic's expansion sequences)
_ARITH = {
    "add", "sub", "mul", "div", "neg", "abs", "max", "min", "floor",
    "ceil", "round", "sign", "rem", "clamp", "nextafter",
    "and", "or", "xor", "not", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "eq", "ne", "lt", "le", "gt", "ge",
    "select_n", "convert_element_type", "bitcast_convert_type",
    "is_finite", "square",
}
_TRANS = {
    "exp", "log", "log1p", "expm1", "sin", "cos", "tan", "asin", "acos",
    "atan", "atan2", "sinh", "cosh", "tanh", "sqrt", "rsqrt", "pow",
    "integer_pow", "cbrt", "erf", "logistic",
}
TRANS_WEIGHT = 8.0

# call-like primitives to recurse through: param name holding the jaxpr
_CALL_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _subjaxprs(eqn):
    """(label, jaxpr, multiplier) sub-jaxprs of a call-like eqn. cond is
    handled by the caller (max over branches)."""
    out = []
    prim = eqn.primitive.name
    if prim == "scan":
        out.append(("scan", eqn.params["jaxpr"].jaxpr,
                    float(eqn.params.get("length", 1))))
        return out
    for name in _CALL_PARAMS:
        if name in eqn.params:
            j = eqn.params[name]
            j = getattr(j, "jaxpr", j)
            out.append((prim, j, 1.0))
            return out
    return out


def count_jaxpr_ops(jaxpr, min_elems: int = 128):
    """Weighted elementwise vector-op count of one pass through `jaxpr`.

    Counts every elementwise primitive whose output has >= min_elems
    elements (vector planes; scalar bookkeeping excluded), weighted by
    element count (and TRANS_WEIGHT for transcendentals).  lax.cond
    counts the MAX branch; nested while bodies are counted ONCE into the
    separate `nested` list, NOT multiplied (trip counts are runtime
    data — see module docstring).

    Returns dict(ops=float hi-bound, ops_lo=float lo-bound, trans_ops,
    nested=[(name, ops), ...]).  ops vs ops_lo bracket the truth: lax.cond
    contributes its MAX branch to `ops` and its MIN branch to `ops_lo`.
    For the regen kernel's spawn conds the hi bound is the realistic
    steady-state value (they fire nearly every iteration); for the static
    cull tree's vote-gated leaf sweeps the truth sits between the bounds
    (take-rates are runtime data) — configs whose interval is wide are
    flagged via roofline_fields' pct_peak_vpu_lo.
    """
    total = 0.0
    total_lo = 0.0
    trans = 0.0
    nested = []
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "cond":
            branches = eqn.params["branches"]
            counts = [count_jaxpr_ops(b.jaxpr, min_elems) for b in branches]
            best = max(counts, key=lambda c: c["ops"])
            total += best["ops"]
            total_lo += min(c["ops_lo"] for c in counts)
            trans += best["trans_ops"]
            nested += best["nested"]
            continue
        if prim == "while":
            body = count_jaxpr_ops(eqn.params["body_jaxpr"].jaxpr,
                                   min_elems)
            condc = count_jaxpr_ops(eqn.params["cond_jaxpr"].jaxpr,
                                    min_elems)
            nested.append(("while",
                           body["ops"] + condc["ops"],
                           body["nested"] + condc["nested"]))
            continue
        subs = _subjaxprs(eqn)
        if subs:
            for _, sub, mult in subs:
                c = count_jaxpr_ops(sub, min_elems)
                total += c["ops"] * mult
                total_lo += c["ops_lo"] * mult
                trans += c["trans_ops"] * mult
                nested += c["nested"]
            continue
        if prim in _ARITH or prim in _TRANS:
            elems = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
                        if v.aval.shape and np.prod(v.aval.shape)
                        >= min_elems)
            if elems:
                w = TRANS_WEIGHT if prim in _TRANS else 1.0
                total += elems * w
                total_lo += elems * w
                if prim in _TRANS:
                    trans += elems * w
    return {"ops": total, "ops_lo": total_lo, "trans_ops": trans,
            "nested": nested}


def _find_pallas_kernels(jaxpr, out=None):
    """All pallas_call kernel jaxprs reachable from `jaxpr`."""
    if out is None:
        out = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn.params["jaxpr"])
            continue
        if eqn.primitive.name == "cond":
            for b in eqn.params["branches"]:
                _find_pallas_kernels(b.jaxpr, out)
            continue
        if eqn.primitive.name == "while":
            _find_pallas_kernels(eqn.params["body_jaxpr"].jaxpr, out)
            continue
        for _, sub, _m in _subjaxprs(eqn):
            _find_pallas_kernels(sub, out)
    return out


def regen_iteration_cost(fscene, cfg):
    """ops_per_iter of the regenerative megakernel's main loop for this
    (scene, config): trace the render step, find the pallas kernel, find
    its top-level while (the regen loop), count one body pass.

    Returns dict(ops_per_iter, trans_ops, nested) where ops_per_iter is
    vector-op issues per TILE-iteration (element-weighted, so already
    scaled by the R*128 lane count)."""
    from tpurt.config import RenderConfig  # noqa: F401  (docs)
    from tpurt.kernels import mega_regen as mr
    from tpurt.kernels.mega_pallas import N_CHANNELS
    from tpurt.camera import make_camera

    lanes = cfg.pallas_lanes
    R = lanes // 128
    n_px = cfg.width * cfg.height
    TR = -(-n_px // 128)
    TR = -(-TR // R) * R  # pad to tile rows, as init_state does
    planes = jnp.zeros((N_CHANNELS, TR, 128), jnp.float32)
    cam = make_camera((0.0, 0.0, 0.0), (0.0, 0.0, 1.0), vfov=60.0,
                      aspect_ratio=cfg.width / cfg.height)

    def step(planes):
        return mr.regen_call(fscene, cfg, cam, planes, jnp.uint32(1),
                             jnp.int32(4), jnp.int32(0), jnp.float32(2.0),
                             0, interpret=False)

    return _main_loop_cost(step, planes)


def _main_loop_cost(step, *args):
    """Trace `step`, find its Pallas kernel's top-level while (the
    per-lane regeneration loop) and count one body pass."""
    jaxpr = jax.make_jaxpr(step)(*args)
    kernels = _find_pallas_kernels(jaxpr.jaxpr)
    if not kernels:
        raise ValueError("no pallas_call found — not a Pallas config?")
    kj = kernels[0]
    whiles = [e for e in kj.eqns if e.primitive.name == "while"]
    if not whiles:
        raise ValueError("no top-level while in the kernel jaxpr")
    body = count_jaxpr_ops(whiles[0].params["body_jaxpr"].jaxpr)
    return {
        "ops_per_iter": body["ops"],
        "ops_per_iter_lo": body["ops_lo"],
        "trans_ops_per_iter": body["trans_ops"],
        # walk/chunk loops, counted once each (LOWER-bound caveat)
        "nested": [(n, o) for n, o, *_ in body["nested"]],
    }


def fused_wavefront_iteration_cost(cfg, scene):
    """regen_iteration_cost's twin for the fused wavefront kernel
    (bench config 5): same extraction, the wavefront's main loop.
    Takes the concrete scene (freezes internally)."""
    from tpurt.camera import make_camera
    from tpurt.kernels import wavefront_pallas as wf
    from tpurt.render import init_state

    cam = make_camera((0.0, 0.0, 0.0), (0.0, 0.0, 1.0), vfov=60.0,
                      aspect_ratio=cfg.width / cfg.height)
    state = init_state(cfg)
    fscene = wf.freeze_scene(scene)

    def step(st):
        out = wf._fused_wavefront_jit(fscene, cfg, cam, st,
                                      jnp.uint32(1), jnp.int32(4), False)
        return (out[0] if cfg.count_iters else out).rgb_sum

    return _main_loop_cost(step, state)


def cluster_leaf_ops(fscene, cfg) -> dict:
    """Mean vector-op cost of ONE static cull-tree leaf sweep, per walk
    class (closest winner sweep / Fresnel shadow sweep) — the per-take
    weight for the MEASURED branch mix (VERDICT r4 item 4).

    The jaxpr model counts every straight-line lax.cond at [min,max] of
    its branches; on cull-tree configs (bench config 3) the vote-gated
    leaf sweeps are the dominant cond class and blow the interval wide
    open (24-271%).  cfg.count_walk_stats cells 8-11 measure how many of
    those conds actually TAKE the sweep; combining the counts with these
    per-sweep costs collapses the interval:

        ops_hi' = ops_per_iter    - skipped/iter * leaf_ops
        ops_lo' = ops_per_iter_lo + taken/iter   * leaf_ops

    Returns dict(closest, shadow, n_leaves): mean ops per leaf sweep
    (element-weighted like count_jaxpr_ops, i.e. already scaled by the
    R*128 lane count)."""
    from tpurt.kernels import mega_pallas as mp
    from tpurt.ops import soa as s

    tree = mp._sphere_cull_tree(fscene.spheres, cfg.pallas_cluster_size)
    leaves = mp._tree_leaves(tree.root) if tree.root is not None else []
    if not leaves:
        return {"closest": 0.0, "shadow": 0.0, "n_leaves": 0}
    R = cfg.pallas_lanes // 128
    plane = jnp.zeros((R, 128), jnp.float32)
    o = d = (plane, plane, plane)

    def closest(n):
        def fn(o, d):
            a = s.vdot(d, d)
            st = mp._sphere_state_init(o)
            for leaf in leaves[:n]:
                st = mp._sweep_spheres_static(leaf.prims, o, d, a, st)
            return st
        return count_jaxpr_ops(jax.make_jaxpr(fn)(o, d).jaxpr)["ops"]

    def shadow(n):
        def fn(o, d, tm, lam):
            a = s.vdot(d, d)
            at = jnp.ones_like(o[0])
            for leaf in leaves[:n]:
                at = mp._shadow_sweep_static(leaf.prims, o, d, tm, lam, a,
                                             at)
            return at
        return count_jaxpr_ops(
            jax.make_jaxpr(fn)(o, d, plane, plane).jaxpr)["ops"]

    n = len(leaves)
    # subtract the zero-leaf baseline so only the per-sweep cost remains
    return {"closest": (closest(n) - closest(0)) / n,
            "shadow": (shadow(n) - shadow(0)) / n,
            "n_leaves": n}


def roofline_fields(ops_per_iter: float, iters_total: float,
                    rays_total: float, lanes: int, dt_s: float,
                    ops_per_iter_lo: float | None = None) -> dict:
    """The artifact fields: issued GFLOP-equivalents/s, pct of VPU peak,
    lane occupancy, useful ops/s.

    Occupancy can slightly EXCEED 1: `rays` counts active lanes per
    iteration PLUS the NEE shadow segments traced inside the same
    iteration, so a fully-busy tile with shadow work reads ~1.0-1.3.

    When ops_per_iter_lo is given and differs from ops_per_iter (cond-
    heavy kernels: the static cull tree's vote-gated sweeps), the _lo
    variants bracket the truth from below; gflops/pct_peak_vpu are then
    UPPER bounds, not point estimates."""
    issued_ops_s = iters_total * ops_per_iter / dt_s
    occ = rays_total / max(iters_total * lanes, 1.0)
    out = {
        "gflops": round(issued_ops_s / 1e9, 1),
        "pct_peak_vpu": round(100.0 * issued_ops_s / V5E_VPU_PEAK_OPS, 1),
        "occupancy": round(occ, 3),
        "useful_gflops": round(issued_ops_s * occ / 1e9, 1),
    }
    if ops_per_iter_lo is not None and ops_per_iter_lo < ops_per_iter:
        lo_s = iters_total * ops_per_iter_lo / dt_s
        out["gflops_lo"] = round(lo_s / 1e9, 1)
        out["pct_peak_vpu_lo"] = round(100.0 * lo_s / V5E_VPU_PEAK_OPS, 1)
    return out
