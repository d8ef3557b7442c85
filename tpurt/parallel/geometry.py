"""GEOMETRY sharding: the scene's triangles partitioned across the mesh.

Pixel sharding and sample sharding (tpurt.parallel.sharding) replicate the
scene on every chip, so a chip's HBM caps the scene size.  This module
adds the third axis (VERDICT r3 item 7): each device holds 1/D of the
triangles (with its own sub-BVH), every device traces ALL pixels against
its local shard, and the per-bounce intersection results are combined
across the mesh with XLA collectives:

  * closest hit  — all_gather the per-device hit records, take the
    first-minimum t over the device axis (argmin picks the lowest device
    index on exact ties).  Matches single-chip bit-for-bit except on an
    EXACT float-t tie between triangles on different shards: the
    single-chip winner there is decided by global-BVH traversal order
    (leaf order), not global triangle index, so a ray through a shared
    edge split across shards may pick the other (equal-t) triangle;
  * shadow       — lax.pmin of the local attenuations (the sphere
    transmission factor is replicated — identical on every device — and
    the local triangle occlusion term only ZEROES it, so the mesh-wide
    minimum IS the global attenuation, exactly).

The combine happens inside integrate.intersect_scene/_shadow via the
trace-time _GEOM_HOOK, so the whole integrator stack — NEE, camera loop,
photon walk — is sharding-unaware.  This is the bounce-synchronous XLA
path by design: a fused Pallas kernel's in-kernel bounce loop cannot host
per-bounce ICI collectives (Pallas remote copies are sender-initiated —
no random-access remote reads), so geometry scaling rides the integrator
where collectives compose with lax control flow.

Communication volume — MEASURED from the traced build (round 5,
tpurt.parallel.comm.collective_stats; table in docs/DESIGN.md): per
intersect, all_gather of 8 f32 planes per 4096-pixel tile (131072 B
operand) -> at 1080p x 8 devices each device receives 507 tiles x
128 KiB x 7 = 465 MB per bounce (the round-4 closed-form prediction,
confirmed); per NEE shadow, a pmin of one f32 plane.  Geometry sharding
trades ICI bandwidth for HBM capacity and is the right axis ONLY when
the scene does not fit one chip; make_2d_sharded_step composes it with
pixel sharding on a (px, geom) mesh — measured 16.6 MB/bounce/device on
the 4x2 mesh, ~28x less.

Works identically on the virtual 8-device CPU mesh (tests/dryrun) and a
real slice.  Ref for the capability being scaled: the reference keeps the
whole mesh in GPU storage buffers (src/instance.rs:175-310) — one GPU,
one memory.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpurt.config import RenderConfig
from tpurt.parallel.sharding import AXIS
from tpurt.render import RenderState
from tpurt.scene import Scene


class _TriShardHook:
    """The trace-time combine hook installed into tpurt.integrate."""

    def __init__(self, axis: str = AXIS):
        self.axis = axis

    def combine_hit(self, hit: dict) -> dict:
        g = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, self.axis), hit)
        # first minimum over the device axis = lowest device on ties
        i = jnp.argmin(g["t"], axis=0)

        def take(a):
            idx = i.reshape(i.shape + (1,) * (a.ndim - 1 - i.ndim))
            idx = jnp.broadcast_to(idx, (1,) + a.shape[1:])
            return jnp.take_along_axis(a, idx, axis=0)[0]

        return {k: take(v) for k, v in g.items()}

    def combine_shadow(self, atten):
        return jax.lax.pmin(atten, self.axis)


def split_scene_triangles(scene: Scene, n_dev: int) -> Scene:
    """Host: a Scene whose triangle + BVH arrays are the CONCATENATION of
    n_dev equal-size shards (range partition of the triangle list, each
    shard re-packed in its own sub-BVH's leaf order and padded with
    degenerate triangles).  Sharding the arrays with P(AXIS) then hands
    each device exactly its shard-local arrays — local shapes match a
    normal Scene, so the integrator runs unmodified.

    Spheres / materials / lights stay replicated (they are small; the
    capacity problem is triangles)."""
    from tpurt.accel import build_bvh

    T = scene.num_triangles
    if T == 0:
        raise ValueError("geometry sharding needs a triangle mesh")
    per = -(-T // n_dev)

    tri = {k: np.asarray(getattr(scene, k))
           for k in ("tri_a", "tri_e1", "tri_e2", "tri_n", "tri_mat")}

    shards = []
    for d in range(n_dev):
        lo, hi = d * per, min((d + 1) * per, T)
        sub = {k: v[lo:hi] for k, v in tri.items()}
        n = hi - lo
        if n > 0:
            v1 = sub["tri_a"] + sub["tri_e1"]
            v2 = sub["tri_a"] + sub["tri_e2"]
            tmin = np.minimum(sub["tri_a"], np.minimum(v1, v2))
            tmax = np.maximum(sub["tri_a"], np.maximum(v1, v2))
            bvh = build_bvh(tmin, tmax,
                            max_prims=int(scene.bvh_max_leaf))
            order = np.asarray(bvh.order, np.int64)
            sub = {k: v[order] for k, v in sub.items()}
            nodes = dict(bvh_min=np.asarray(bvh.bbox_min),
                         bvh_max=np.asarray(bvh.bbox_max),
                         bvh_left=np.asarray(bvh.left),
                         bvh_right=np.asarray(bvh.right),
                         bvh_first=np.asarray(bvh.first),
                         bvh_count=np.asarray(bvh.count))
        else:
            # Empty shard (num_triangles < n_dev * per): the placeholder
            # root must be a LEAF (count=1 over the zero-padded degenerate
            # triangle row, which can never hit — MT det underflows the
            # subnormal epsilon).  A count=0 root would read as an inner
            # node whose left=right=0 self-reference re-pushes node 0
            # forever: _bvh_hit_single's while_loop never terminates.
            # (An "inverted" bbox would NOT save it — the slab test sorts
            # t0/t1 per axis, so a min>max box tests like a huge box.)
            nodes = dict(bvh_min=np.zeros((1, 3), np.float32),
                         bvh_max=np.zeros((1, 3), np.float32),
                         bvh_left=np.zeros((1,), np.int32),
                         bvh_right=np.zeros((1,), np.int32),
                         bvh_first=np.zeros((1,), np.int32),
                         bvh_count=np.ones((1,), np.int32))
        shards.append((sub, nodes))

    # pad every shard to the same triangle / node counts (degenerate
    # triangles never hit; padded nodes are unreachable from the root)
    t_pad = max(max(s["tri_a"].shape[0] for s, _ in shards), 1)
    b_pad = max(n["bvh_min"].shape[0] for _, n in shards)

    def pad_to(a, rows):
        if a.shape[0] == rows:
            return a
        fill = np.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)
        return np.concatenate([a, fill], axis=0)

    cat = {}
    for k in tri:
        cat[k] = jnp.asarray(np.concatenate(
            [pad_to(s[k], t_pad) for s, _ in shards], axis=0))
    for k in ("bvh_min", "bvh_max", "bvh_left", "bvh_right",
              "bvh_first", "bvh_count"):
        cat[k] = jnp.asarray(np.concatenate(
            [pad_to(n[k], b_pad) for _, n in shards], axis=0))
    # The builder can emit leaves LARGER than max_prims (build_scene guards
    # the same way, scene.py:348); _bvh_hit_single sweeps only
    # scene.bvh_max_leaf records per leaf, so an oversized shard leaf
    # would silently skip triangles — re-derive the bound from the shard
    # trees actually built.
    max_leaf = max(int(scene.bvh_max_leaf),
                   max(int(n["bvh_count"].max()) for _, n in shards))
    return dataclasses.replace(scene, bvh_max_leaf=max_leaf, **cat)


def scene_geometry_specs(scene: Scene, axis: str = AXIS) -> Scene:
    """shard_map PartitionSpecs for a split_scene_triangles scene: the
    triangle/BVH leaves split on `axis`, everything else replicated."""
    specs = jax.tree_util.tree_map(lambda _: P(), scene)
    return dataclasses.replace(
        specs,
        tri_a=P(axis, None), tri_e1=P(axis, None), tri_e2=P(axis, None),
        tri_n=P(axis, None), tri_mat=P(axis),
        bvh_min=P(axis, None), bvh_max=P(axis, None),
        bvh_left=P(axis), bvh_right=P(axis),
        bvh_first=P(axis), bvh_count=P(axis))


def make_geometry_sharded_step(mesh: Mesh, cfg: RenderConfig,
                               depth: int | None = None, spp: int = 1):
    """Build the jitted geometry-sharded render step.

    Returns f(scene_cat, camera, state, base_seed) -> state, where
    scene_cat comes from split_scene_triangles(scene, mesh.devices.size).
    State and image are REPLICATED (every device traces every pixel
    against its triangle shard; collectives merge per bounce) — use the
    ordinary single-chip init_state. Ray counts are identical on every
    device (the combined hits are), so no psum is needed."""
    from tpurt import integrate
    from tpurt.render import _step_body

    d = cfg.depth if depth is None else depth
    hook = _TriShardHook(AXIS)

    def body(scene, camera, state, base_seed):
        Pn = state.rgb_sum.shape[0]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (Pn, 1), 0)[:, 0]
        px = gidx % cfg.width
        py = jnp.minimum(gidx // cfg.width, cfg.height - 1)
        valid = gidx < cfg.n_pixels

        prev = integrate._GEOM_HOOK
        integrate._GEOM_HOOK = hook     # trace-time install
        try:
            def one(st, _):
                return _step_body(scene, cfg, camera, st, base_seed, d,
                                  px, py, valid, cfg.tile_size,
                                  rays_reduce=None), None
            st, _ = jax.lax.scan(one, state, None, length=spp)
        finally:
            integrate._GEOM_HOOK = prev
        return st

    # state: everything replicated (identical on all devices by
    # construction — the combined hits are)
    state_specs = jax.tree_util.tree_map(lambda _: P(), _state_template())

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(scene_geometry_specs(_scene_template()), P(),
                  state_specs, P()),
        out_specs=state_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


GEOM_AXIS = "geom"


def make_2d_mesh(n_px: int, n_geom: int) -> Mesh:
    """(px, geom) 2-D device mesh: rows share a triangle shard, columns
    share a pixel slab."""
    devs = jax.devices()
    n = n_px * n_geom
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(n_px, n_geom),
                (AXIS, GEOM_AXIS))


def init_state_2d(cfg: RenderConfig, mesh2: Mesh) -> RenderState:
    """State pixel-sharded over the px axis, replicated over geom."""
    from jax.sharding import NamedSharding
    from tpurt.parallel.sharding import padded_pixels_sharded

    n_px = mesh2.shape[AXIS]
    Pn = padded_pixels_sharded(cfg, n_px)
    sh1 = NamedSharding(mesh2, P(AXIS))
    sh3 = NamedSharding(mesh2, P(AXIS, None))
    rep = NamedSharding(mesh2, P())
    z3 = jnp.zeros((Pn, 3), jnp.float32, device=sh3)
    return RenderState(
        rgb_sum=z3,
        n_samples=jnp.zeros((Pn,), jnp.float32, device=sh1),
        vis_pos=z3, vis_norm=z3, vis_wo=z3, vis_tp=z3,
        vis_mat=jnp.zeros((Pn,), jnp.int32, device=sh1),
        iteration=jnp.zeros((), jnp.int32, device=rep),
        photon_radius=jnp.asarray(cfg.photon_radius_init, jnp.float32,
                                  device=rep),
        rays=jnp.zeros((), jnp.float32, device=rep))


def make_2d_sharded_step(mesh2: Mesh, cfg: RenderConfig,
                         depth: int | None = None, spp: int = 1):
    """PIXEL x GEOMETRY 2-D composition (VERDICT r4 item 5): pixels split
    over the `px` mesh axis, triangles over `geom`.  Each device traces
    ITS pixel slab against ITS triangle shard; per-bounce hits combine
    with all_gather/pmin over `geom` ONLY — so the gathered plane count N
    (the 1-D analysis' ~0.46 GB/bounce/device at 1080p x 8) is divided by
    the px-axis size, exactly the composition the 1-D docstring
    recommends.  State comes from init_state_2d; the scene from
    split_scene_triangles(scene, mesh2.shape['geom']).

    Returns f(scene_cat, camera, state, base_seed) -> state."""
    from tpurt import integrate
    from tpurt.render import _step_body

    d = cfg.depth if depth is None else depth
    hook = _TriShardHook(GEOM_AXIS)

    def body(scene, camera, state, base_seed):
        import dataclasses as _dc
        me = jax.lax.axis_index(AXIS)
        Pl = state.rgb_sum.shape[0]
        gidx = me * Pl + jax.lax.broadcasted_iota(jnp.int32, (Pl, 1), 0)[:, 0]
        px = gidx % cfg.width
        py = jnp.minimum(gidx // cfg.width, cfg.height - 1)
        valid = gidx < cfg.n_pixels
        rays0 = state.rays

        prev = integrate._GEOM_HOOK
        integrate._GEOM_HOOK = hook     # trace-time install
        try:
            def one(st, _):
                return _step_body(scene, cfg, camera, st, base_seed, d,
                                  px, py, valid, cfg.tile_size,
                                  rays_reduce=None), None
            st, _ = jax.lax.scan(one, state, None, length=spp)
        finally:
            integrate._GEOM_HOOK = prev
        # ray counts are identical across the geom axis (the combined
        # hits are), so the global count sums over px only
        return _dc.replace(
            st, rays=rays0 + jax.lax.psum(st.rays - rays0, AXIS))

    state_specs = jax.tree_util.tree_map(lambda _: P(), _state_template())
    state_specs = dataclasses.replace(
        state_specs,
        rgb_sum=P(AXIS, None), n_samples=P(AXIS),
        vis_pos=P(AXIS, None), vis_norm=P(AXIS, None),
        vis_wo=P(AXIS, None), vis_tp=P(AXIS, None), vis_mat=P(AXIS))

    sharded = jax.shard_map(
        body, mesh=mesh2,
        in_specs=(scene_geometry_specs(_scene_template(), GEOM_AXIS), P(),
                  state_specs, P()),
        out_specs=state_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


_TEMPLATES = {}


def _scene_template() -> Scene:
    """A structural Scene template for building spec pytrees (leaf VALUES
    are ignored — only the pytree structure matters)."""
    if "scene" not in _TEMPLATES:
        z3 = jnp.zeros((1, 3), jnp.float32)
        z1 = jnp.zeros((1,), jnp.float32)
        zi = jnp.zeros((1,), jnp.int32)
        _TEMPLATES["scene"] = Scene(
            sph_center=z3, sph_radius=z1, sph_mat=zi, sph_mtype=zi,
            sph_ior=z1, mat_color=z3, mat_rough=z1, mat_ior=z1,
            mat_type=zi, tri_a=z3, tri_e1=z3, tri_e2=z3, tri_n=z3,
            tri_mat=zi, bvh_min=z3, bvh_max=z3, bvh_left=zi,
            bvh_right=zi, bvh_first=zi, bvh_count=zi, light_pos=z3,
            light_hw=z1, light_color=z3, light_intensity=z1,
            light_temp=z1, light_type=zi, light_normal=z3)
    return _TEMPLATES["scene"]


def _state_template() -> RenderState:
    if "state" not in _TEMPLATES:
        z3 = jnp.zeros((1, 3), jnp.float32)
        z1 = jnp.zeros((1,), jnp.float32)
        _TEMPLATES["state"] = RenderState(
            rgb_sum=z3, n_samples=z1, vis_pos=z3, vis_norm=z3, vis_wo=z3,
            vis_tp=z3, vis_mat=jnp.zeros((1,), jnp.int32),
            iteration=jnp.zeros((), jnp.int32),
            photon_radius=jnp.zeros((), jnp.float32),
            rays=jnp.zeros((), jnp.float32))
    return _TEMPLATES["state"]
