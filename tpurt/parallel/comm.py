"""MEASURED inter-chip communication accounting for the sharded steps.

VERDICT r4 item 5: geometry sharding's DESIGN analysis *predicted*
~0.46 GB/bounce/device at 1080p x 8 but nothing measured it.  Collective
sizes are static in the compiled program, so the honest measurement is
taken from the build itself: trace the EXACT jitted step the user runs,
walk its jaxpr (through shard_map / scan / cond / while bodies), and sum
every collective primitive's operand bytes — psum, all_gather, pmin,
pmax, ppermute, all_to_all, reduce_scatter.  Counts inside `scan` are
multiplied by the trip count (the spp loop; lax.map over tiles lowers to
scan and is multiplied too); `while` bodies are counted ONCE and flagged
— which for the geometry-sharded step is exactly the right unit: the
hook's all_gather/pmin sit inside the camera/photon BOUNCE while_loops
(integrate.py:642,880), so a flagged count reads as bytes per BOUNCE per
site, the same unit as the 1-D docstring's 0.46 GB/bounce prediction.

This is the communication the XLA partitioner was *asked* to do; XLA may
fuse or reorder but cannot change the semantic bytes of an explicit
collective.  Cross-checked against the closed-form prediction in
tests/test_comm_bytes.py.

Per-axis interpretation:
  * pixel sharding  — one scalar psum per step (4 B): embarrassingly
    parallel, ICI-negligible.
  * sample sharding — psum of the accumulator deltas (rgb_sum +
    n_samples + vispoints) once per call.
  * geometry sharding — all_gather of the 8-plane hit record per bounce
    per phase + pmin per NEE shadow: the capacity-only axis; compose
    with pixel sharding on a 2-D mesh to divide N (make_2d_sharded_step
    in tpurt.parallel.geometry).
"""

from __future__ import annotations

import numpy as np

import jax

_COLLECTIVES = ("psum", "pmin", "pmax", "all_gather", "all_to_all",
                "ppermute", "reduce_scatter", "all_reduce")

# call-like params to recurse through (cf. tpurt.roofline._subjaxprs)
_CALL_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _aval_bytes(v) -> int:
    a = v.aval
    if not hasattr(a, "shape"):
        return 0
    return int(np.prod(a.shape, dtype=np.int64) * np.dtype(a.dtype).itemsize)


def _walk(jaxpr, mult: float, out: dict, flags: set):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if any(prim.startswith(c) for c in _COLLECTIVES):
            b = sum(_aval_bytes(v) for v in eqn.invars
                    if hasattr(v, "aval"))
            rec = out.setdefault(prim, {"calls": 0.0, "bytes": 0.0})
            rec["calls"] += mult
            rec["bytes"] += mult * b
            continue
        if prim == "scan":
            _walk(eqn.params["jaxpr"].jaxpr,
                  mult * float(eqn.params.get("length", 1)), out, flags)
            continue
        if prim == "while":
            # deep snapshot: the inner {calls, bytes} dicts are mutated
            # in place, so a shallow dict(out) would alias them and the
            # flag would miss whenever the body's collective name was
            # already recorded outside the loop.
            before = {k: dict(v) for k, v in out.items()}
            _walk(eqn.params["body_jaxpr"].jaxpr, mult, out, flags)
            _walk(eqn.params["cond_jaxpr"].jaxpr, mult, out, flags)
            if out != before:
                flags.add("collectives_inside_while_counted_once")
            continue
        if prim == "cond":
            for b in eqn.params["branches"]:
                _walk(b.jaxpr, mult, out, flags)
            continue
        if prim == "shard_map":
            _walk(eqn.params["jaxpr"], mult, out, flags)
            continue
        for name in _CALL_PARAMS:
            if name in eqn.params:
                j = eqn.params[name]
                _walk(getattr(j, "jaxpr", j), mult, out, flags)
                break


def collective_stats(fn, *args) -> dict:
    """Trace fn(*args) and return
    {prim: {calls, bytes}} + {"total_bytes": N, "flags": [...]} — the
    per-device collective traffic of ONE call of the step (operand bytes;
    an all_gather's received bytes are (D-1)/D of D x operand)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    out: dict = {}
    flags: set = set()
    _walk(jaxpr.jaxpr, 1.0, out, flags)
    total = sum(r["bytes"] for r in out.values())
    return {"collectives": {k: {"calls": int(v["calls"]),
                                "bytes": int(v["bytes"])}
                            for k, v in sorted(out.items())},
            "total_bytes": int(total),
            "flags": sorted(flags)}
