"""Pallas wavefront tracer: the persistent ray pool's extend+shade sweep as
a fused TPU kernel.

tpurt.wavefront implements the TPU-native wavefront architecture
(fixed-capacity pool + compaction-by-regeneration, see its docstring) with
XLA sweeps. This module swaps the hot stage — one bounce of every pool slot
— for a Pallas kernel built from the same component-form pieces as the
megakernel (tpurt.kernels.mega_pallas), with the pool resident in plane
layout across the whole render:

  regen  (XLA)    dead slots claim the next (pixel, sample) work items:
                  cumsum ranking, camera rays, per-slot PCG streams, and the
                  lambda-dependent CIE/emission factors (MXU one-hot matmul,
                  computed ONCE per path here rather than per sweep in the
                  kernel — the 81-entry select chain costs ~40% of a sweep)
  sweep  (Pallas) intersect + NEE + scatter + RR for all Q slots — exactly
                  the megakernel's bounce body, full material set
  splat  (XLA)    terminated slots scatter-add into the image

Pool plane layout (QR = Q/128):
  f32 (13+3L[+3][+3], QR, 128): o xyz | d xyz | tp rgb | rad rgb | lam |
      em[l] rgb... [| sky-em rgb when cfg.sky_intensity] [| type-3
      emission base rgb under hero-collapse tracking — see _layout_flags]
  i32 (3, QR, 128):     pix | bounce | active
  u32 (QR, 128):        PCG stream

Draw order matches tpurt.wavefront exactly, so the two implementations
produce the same image for the same seed (tests assert equal ray counts).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt import camera as camera_mod
from tpurt.config import RenderConfig
from tpurt.kernels.mega_pallas import (
    EPS,
    _HIT,
    FrozenScene,
    _diffuse_scatter_c,
    nee_direct_c,
    scatter_rr_c,
    _mask_f32,
    _mask_i32,
    _chunk_tables,
    _make_scene_fns,
    chunk_scratch_shapes,
    chunk_scratch_reset,
    _material_lookup_static,
    _prim_tables,
    _scatter_dielectric_c,
    _scatter_metal_c,
    _single_lambda_em_c,
    _sky_em_c,
    _sky_tint_c,
    _flat_em_c,
    _is_emissive_static,
    freeze_scene,
    supports_scene,
)
from tpurt.ops import rng as rngmod
from tpurt.ops import soa as s
from tpurt.ops.spectra import (DISPERSION_B, VISIBLE_MIN, VISIBLE_RANGE,
                               hero_emission_table)
from tpurt.render import RenderState, _frame_seed

# f32 channel bases (emission channels follow, 3 per light; with the
# environment emitter on, 3 sky-emission channels follow those — the sky
# is one more lambda-dependent emitter whose planes spawn hero-averaged
# and collapse to the hero's share exactly like the light em planes)
_O, _D, _TP, _RAD, _LAM = 0, 3, 6, 9, 12
_EM = 13


def _n_fchannels(L: int, sky: bool = False, emb: bool = False) -> int:
    return _EM + 3 * L + (3 if sky else 0) + (3 if emb else 0)


def _layout_flags(fscene, cfg) -> tuple:
    """(sky, emb): whether the pool carries 3 sky-emission planes
    (cfg.sky_intensity > 0) and 3 type-3 emission-base planes. The emB
    planes exist only under hero-collapse tracking — without it the
    emissive base is recomputed from the lane's lambda at hit time."""
    sky = float(cfg.sky_intensity) > 0.0
    any_diel = any(m.mtype == 1 for m in fscene.materials)
    any_em = any(m.mtype == 3 for m in fscene.materials)
    emb = (any_em and max(1, int(cfg.hero_wavelengths)) > 1
           and cfg.dispersion_in_camera_path and any_diel)
    return sky, emb


# ----- the sweep kernel -----

def _make_sweep_kernel(fscene: FrozenScene, cfg: RenderConfig, lanes: int):
    R = lanes // 128
    MATS = fscene.materials
    LIGHTS = fscene.lights
    L = len(LIGHTS)
    any_dielectric = any(m.mtype == 1 for m in MATS)
    any_metal = any(m.mtype == 2 for m in MATS)
    # hero-wavelength collapse (see RenderConfig.hero_wavelengths): the em
    # planes hold the C-averaged emission; a dispersive interaction
    # REWRITES them to the hero's share (recomputed from lam, cond-gated),
    # so no extra planes or collapse bit are needed.
    C_HERO = max(1, int(cfg.hero_wavelengths))
    track_collapse = (C_HERO > 1 and cfg.dispersion_in_camera_path
                      and any_dielectric)
    SKY_ON = float(cfg.sky_intensity) > 0.0
    _SKY = _EM + 3 * L
    ANY_EM = any(m.mtype == 3 for m in MATS)
    _, EMB_PLANES = _layout_flags(fscene, cfg)
    _EMB = _SKY + (3 if SKY_ON else 0)

    from tpurt.kernels.mega_pallas import (_use_sph_chunked,
                                           _use_tri_chunked)
    n_slabs = (int(_use_tri_chunked(fscene, cfg))
               + int(_use_sph_chunked(fscene, cfg)))

    def kernel(pf_ref, pi_ref, rng_ref, sph_ref, tri_ref, *rest):
        if n_slabs:
            pf_out, pi_out, rng_out, term_ref, rays_ref = \
                rest[n_slabs:n_slabs + 5]
            chunk = (list(rest[:n_slabs]), tuple(rest[n_slabs + 5:]))
        else:
            (pf_out, pi_out, rng_out, term_ref, rays_ref), chunk = \
                rest, None
        chunk_scratch_reset(chunk)
        tile = pl.program_id(0)

        intersect, shadow = _make_scene_fns(fscene, cfg, sph_ref, tri_ref,
                                            chunk=chunk)

        o = (pf_ref[_O], pf_ref[_O + 1], pf_ref[_O + 2])
        d = (pf_ref[_D], pf_ref[_D + 1], pf_ref[_D + 2])
        tp = (pf_ref[_TP], pf_ref[_TP + 1], pf_ref[_TP + 2])
        rad = (pf_ref[_RAD], pf_ref[_RAD + 1], pf_ref[_RAD + 2])
        lam = pf_ref[_LAM]
        rng = rng_ref[...]
        bounce = pi_ref[1]
        active = pi_ref[2] > 0

        rays = jnp.sum(_mask_f32(active)) if cfg.count_rays else jnp.float32(0.0)
        z3 = (jnp.zeros_like(lam),) * 3

        t, loc, n, mat = intersect(o, d, active)
        found = t < _HIT

        color, rough, ior, is_diffuse, is_metal = \
            _material_lookup_static(MATS, mat)
        wo = s.vneg(d)

        # miss: black sky (mega kernel), the spectral environment emitter
        # (cfg.sky_intensity — planes spawned/collapsed like the light em
        # planes), or the legacy RGB wavefront gradient
        if SKY_ON:
            tint = _sky_tint_c(cfg, d)
            miss = active & ~found
            rad = tuple(jnp.where(miss,
                                  rad[c] + tp[c] * pf_ref[_SKY + c]
                                  * tint[c], rad[c]) for c in range(3))
        elif cfg.sky_gradient:
            dn = s.vnormalize(d, eps=1e-30)
            t_sky = 0.5 * (dn[1] + 1.0)
            sky = tuple((1.0 - t_sky) + t_sky * np.float32(c)
                        for c in (0.5, 0.7, 1.0))
            miss = active & ~found
            rad = tuple(jnp.where(miss, rad[c] + tp[c] * sky[c], rad[c])
                        for c in range(3))

        # NEE over all lights; emission factors precomputed at regen
        direct, rng = nee_direct_c(
            LIGHTS, loc, n, lam, rng, shadow,
            lambda: active & found & is_diffuse,
            lambda li: (pf_ref[_EM + 3 * li], pf_ref[_EM + 3 * li + 1],
                        pf_ref[_EM + 3 * li + 2]), z3,
            mode=cfg.light_sample)

        # type-3 emitter hit: add emission; lane terminates below
        if ANY_EM:
            is_em = _is_emissive_static(MATS, mat)
            if EMB_PLANES:
                emB = (pf_ref[_EMB], pf_ref[_EMB + 1], pf_ref[_EMB + 2])
            elif C_HERO > 1:
                emB = s.hero_em_lookup_c(
                    hero_emission_table((1.0, 1.0, 1.0), 1.0, 0.0, C_HERO),
                    VISIBLE_RANGE / C_HERO, lam)
            else:
                emB = _flat_em_c(lam)
            hit_em = active & found & is_em
            rad = tuple(jnp.where(hit_em,
                                  rad[c] + tp[c] * color[c] * emB[c],
                                  rad[c]) for c in range(3))

        lane_d = active & found & is_diffuse
        nee = s.vmul(s.vmul(tp, color), direct)
        rad = tuple(jnp.where(lane_d, rad[c] + nee[c], rad[c])
                    for c in range(3))
        if cfg.count_rays:
            rays = rays + jnp.sum(_mask_f32(lane_d)) * (
                min(1, L) if cfg.light_sample != "all" else L)

        # scatter draws (order = tpurt.wavefront._sweep)
        def eta_fn():
            lam_um = lam * jnp.float32(1e-3)
            cauchy_add = jnp.float32(DISPERSION_B) / (lam_um * lam_um)
            return ior + cauchy_add if cfg.dispersion_in_camera_path else ior
        wi, new_tp, new_o, scat_ok, rr_live, rng, _ = scatter_rr_c(
            cfg, wo, n, loc, color, rough, is_diffuse, is_metal, tp, rng,
            any_dielectric=any_dielectric, any_metal=any_metal,
            eta_fn=eta_fn, camera_pdf=True,
            rr_thresh_fn=lambda: cfg.rr_threshold)

        depth_ok = (bounce + 1) < cfg.depth
        cont = active & found & scat_ok & rr_live & depth_ok
        if ANY_EM:
            cont = cont & ~is_em
        terminated = active & ~cont

        for c in range(3):
            pf_out[_O + c] = jnp.where(cont, new_o[c], o[c])
            pf_out[_D + c] = jnp.where(cont, wi[c], d[c])
            pf_out[_TP + c] = jnp.where(cont, new_tp[c], tp[c])
            pf_out[_RAD + c] = rad[c]
        pf_out[_LAM] = lam
        if track_collapse:
            coll_now = active & found & ~(is_diffuse | is_metal)

            # post-collapse hero emission at FULL weight (dirac
            # continuation is hero-only; no 1/C) — the sky and type-3
            # emission-base channels collapse alongside the light channels
            n_em = 3 * L + (3 if SKY_ON else 0) + (3 if EMB_PLANES else 0)

            def _collapse_vals(_):
                vals = tuple(_single_lambda_em_c(LIGHTS, lam))
                if SKY_ON:
                    vals = vals + _sky_em_c(cfg, lam)
                if EMB_PLANES:
                    vals = vals + _flat_em_c(lam)
                return vals

            em_h = jax.lax.cond(
                jnp.any(coll_now), _collapse_vals,
                lambda _: (jnp.zeros_like(lam),) * n_em, 0)
            for i, ch in enumerate(range(_EM, _EM + n_em)):
                pf_out[ch] = jnp.where(coll_now, em_h[i], pf_ref[ch])
        else:
            for ch in range(_EM, _EM + 3 * L + (3 if SKY_ON else 0)
                            + (3 if EMB_PLANES else 0)):
                pf_out[ch] = pf_ref[ch]
        pi_out[0] = pi_ref[0]            # pix unchanged
        pi_out[1] = bounce + 1
        pi_out[2] = _mask_i32(cont)
        rng_out[...] = rng
        term_ref[...] = _mask_i32(terminated)
        rays_ref[tile, 0] = rays

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("fscene", "cfg", "interpret"))
def sweep_pallas(fscene, cfg: RenderConfig, pf, pi, rng, interpret=False):
    """One extend+shade sweep over the pool planes. Returns
    (pf, pi, rng, terminated (QR,128) i32, rays_per_tile)."""
    lanes = cfg.pallas_lanes
    R = lanes // 128
    QR = pf.shape[1]
    assert QR % R == 0
    n_tiles = QR // R
    L = len(fscene.lights)
    C = _n_fchannels(L, *_layout_flags(fscene, cfg))

    sph_tab, tri_tab = _prim_tables(fscene, cfg)
    chunk_tab, chunk_meta = _chunk_tables(fscene, cfg)

    kernel = _make_sweep_kernel(fscene, cfg, lanes)
    vb = lambda c: pl.BlockSpec((c, R, 128), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    v1 = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    pf2, pi2, rng2, term, rays = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[vb(C), vb(3), v1, sm, sm]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(chunk_tab),
        out_specs=[vb(C), vb(3), v1, v1, sm],
        out_shape=[
            jax.ShapeDtypeStruct(pf.shape, jnp.float32),
            jax.ShapeDtypeStruct(pi.shape, jnp.int32),
            jax.ShapeDtypeStruct(rng.shape, jnp.uint32),
            jax.ShapeDtypeStruct(rng.shape, jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.float32),
        ],
        scratch_shapes=chunk_scratch_shapes(chunk_meta),
        input_output_aliases={0: 0, 1: 1, 2: 2},
        interpret=interpret,
    )(pf, pi, rng, sph_tab, tri_tab, *chunk_tab)
    return pf2, pi2, rng2, term, rays[:, 0]


# ----- XLA regen + splat driver -----

def _regen_planar(scene, cfg: RenderConfig, camera, pf, pi, rng,
                  next_sample, next_pix, spp, base_seed, it0,
                  hero_tabs=None, emb_planes=False):
    """Dead slots claim the next (pixel, sample) items; all math stays in
    the (QR, 128) plane shape (no pool-sized relayouts). Mirrors
    tpurt.wavefront._regen including draw order."""
    from tpurt.integrate import light_emission_rgb
    from tpurt.ops.spectra import sample_wavelength

    QR = pf.shape[1]
    n_pix = cfg.n_pixels
    dead = pi[2] == 0
    flat_dead = dead.reshape(-1)
    rank = (jnp.cumsum(flat_dead.astype(jnp.int32)) - 1).reshape(QR, 128)
    p = next_pix + rank
    sample = next_sample + p // n_pix
    pix = (p % n_pix).astype(jnp.int32)
    have_work = dead & (sample < spp)
    px = pix % cfg.width
    py = pix // cfg.width

    # iteration offset: progressive continuation draws NEW samples
    seed = _frame_seed(base_seed, it0 + sample)
    new_rng = rngmod.seed_pixels(seed, px, py)

    # cfg.qmc: spawn draws from the Owen-scrambled Sobol stream (same
    # pairing as integrate.render_tile; path PCG stream untouched)
    if cfg.qmc:
        from tpurt.ops import qmc as qmcmod
        src = qmcmod.spawn_stream(base_seed, it0 + sample, px, py)
    else:
        src = new_rng
    uj1, src = rngmod.rand_1f(src)
    uj2, src = rngmod.rand_1f(src)
    u = (px.astype(jnp.float32) + uj1) / jnp.float32(cfg.width)
    v = (py.astype(jnp.float32) + uj2) / jnp.float32(cfg.height)
    # component-form camera ray (camera basis is a (3,) array here; a
    # 3-tuple of lane arrays under motion blur)
    if cfg.motion_blur:
        ut, src = rngmod.rand_1f(src)
        ll, ho, ve, og = camera_mod.lerp_components_c(camera, ut)
    else:
        ll, ho, ve, og = (camera.lower_left, camera.horizontal,
                          camera.vertical, camera.origin)
    rd = tuple(ll[c] + u * ho[c] + v * ve[c] - og[c] for c in range(3))
    ro = tuple(jnp.broadcast_to(og[c], u.shape) for c in range(3))
    if cfg.aperture > 0.0:
        ro, rd, src = camera_mod.lens_perturb_c(
            cfg.aperture, cfg.focus_dist, src, ro, rd,
            tuple(ho[c] for c in range(3)), tuple(ve[c] for c in range(3)),
            rngmod.rand_1f)

    u_lam, src = rngmod.rand_1f(src)
    if not cfg.qmc:
        new_rng = src
    lam = sample_wavelength(u_lam)

    # lambda-dependent emission, once per path (MXU one-hot in XLA);
    # hero-wavelength mode stores the C-averaged emission (tables are
    # scene constants hoisted by the caller out of the sweep while_loop)
    C_HERO = max(1, int(cfg.hero_wavelengths))
    if C_HERO > 1:
        from tpurt.ops.spectra import hero_emission_lookup
        ems = [hero_emission_lookup(hero_tabs[li], C_HERO, lam.reshape(-1))
               for li in range(scene.num_lights)]
    else:
        ems = light_emission_rgb(scene, lam.reshape(-1))  # list of (Q, 3)

    sel = have_work
    f = lambda new, ch: jnp.where(sel, new, pf[ch])
    cols = [f(ro[0], _O), f(ro[1], _O + 1), f(ro[2], _O + 2),
            f(rd[0], _D), f(rd[1], _D + 1), f(rd[2], _D + 2),
            f(jnp.ones_like(u), _TP), f(jnp.ones_like(u), _TP + 1),
            f(jnp.ones_like(u), _TP + 2),
            f(jnp.zeros_like(u), _RAD), f(jnp.zeros_like(u), _RAD + 1),
            f(jnp.zeros_like(u), _RAD + 2),
            f(lam, _LAM)]
    for li, em in enumerate(ems):
        for c in range(3):
            cols.append(f(em[:, c].reshape(QR, 128), _EM + 3 * li + c))
    sky_on = float(cfg.sky_intensity) > 0.0
    if sky_on:
        from tpurt.integrate import sky_emission_rgb
        if C_HERO > 1:
            from tpurt.ops.spectra import (hero_emission_lookup,
                                           hero_emission_table_jnp)
            sky_em = hero_emission_lookup(
                hero_emission_table_jnp(jnp.ones((3,), jnp.float32),
                                        cfg.sky_intensity, cfg.sky_temp,
                                        C_HERO), C_HERO, lam.reshape(-1))
        else:
            sky_em = sky_emission_rgb(cfg, lam.reshape(-1))
        base = _EM + 3 * scene.num_lights
        for c in range(3):
            cols.append(f(sky_em[:, c].reshape(QR, 128), base + c))
    if emb_planes:
        # type-3 emission base (white, hero-averaged; collapses in-kernel)
        from tpurt.ops.spectra import (hero_emission_lookup,
                                       hero_emission_table_jnp)
        emb = hero_emission_lookup(
            hero_emission_table_jnp(jnp.ones((3,), jnp.float32), 1.0, 0.0,
                                    C_HERO), C_HERO, lam.reshape(-1))
        base = _EM + 3 * scene.num_lights + (3 if sky_on else 0)
        for c in range(3):
            cols.append(f(emb[:, c].reshape(QR, 128), base + c))
    pf = jnp.stack(cols)

    pi = jnp.stack([
        jnp.where(sel, pix, pi[0]),
        jnp.where(sel, 0, pi[1]),
        jnp.where(sel, 1, pi[2]),
    ])
    rng = jnp.where(sel, new_rng, rng)

    issued = jnp.sum(have_work.astype(jnp.int32))
    np2 = next_pix + issued
    return pf, pi, rng, next_sample + np2 // n_pix, np2 % n_pix


def _chunk_sort_pool(boxes, pf, pi, rng):
    """GLOBAL ray reordering by chunk (cfg.wf_chunk_sort): key every pool
    slot by the chunk whose AABB its ray enters FIRST (nearest entry
    distance over the (n_chunks, 6) ordinal boxes), stable-sort the whole
    pool by that key, and permute the plane state.  Tiles then hold
    chunk-coherent rays, so each tile's chunked walk DMAs/sweeps ~one
    slab instead of every slab any of its rays crosses — the cross-tile
    form of the reference's unfinished queue-compaction design
    (ref: src/kernels/wavefront.wgsl:28-31, queues declared never used).

    Scheduling-only: slots carry their own (pixel, sample) PCG streams
    and the sweep is slot-independent, so traced rays are EXACTLY
    unchanged; the image can differ only by scatter-add reassociation
    when two samples of one pixel terminate in the same sweep."""
    n_chunks = boxes.shape[0]
    bmin = boxes[:, 0:3]                      # (n_chunks, 3)
    bmax = boxes[:, 3:6]
    o = pf[_O:_O + 3].reshape(3, -1)          # (3, Q)
    d = pf[_D:_D + 3].reshape(3, -1)
    # sign-preserving epsilon: clamping tiny NEGATIVE components to
    # +1e-20 would run that axis's slab test with the wrong sign and
    # key the ray to a chunk behind it (scheduling-only wrong — the
    # sweep is exact either way — but it costs the coherence the sort
    # exists to buy)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d < 0, -1e-20, 1e-20), d)
    t0 = (bmin.T[:, :, None] - o[:, None, :]) * inv[:, None, :]
    t1 = (bmax.T[:, :, None] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=0)  # (n_chunks, Q)
    tf = jnp.min(jnp.maximum(t0, t1), axis=0)
    hit = (tf >= tn) & (tf > 0.0)
    entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.float32(np.inf))
    key = jnp.argmin(entry, axis=0).astype(jnp.int32)          # (Q,)
    key = jnp.where(jnp.any(hit, axis=0), key, jnp.int32(n_chunks))
    key = jnp.where(pi[2].reshape(-1) > 0, key,
                    jnp.int32(n_chunks + 1))   # dead slots last
    order = jnp.argsort(key, stable=True)
    C = pf.shape[0]
    QR = pf.shape[1]
    pf = pf.reshape(C, -1)[:, order].reshape(C, QR, 128)
    pi = pi.reshape(3, -1)[:, order].reshape(3, QR, 128)
    rng = rng.reshape(-1)[order].reshape(QR, 128)
    return pf, pi, rng


@functools.partial(jax.jit,
                   static_argnames=("fscene", "cfg", "interpret"))
def _wavefront_pallas_jit(fscene, scene, cfg, camera, state, base_seed, spp,
                          interpret):
    Q = cfg.wf_pool
    assert Q % 128 == 0, "wf_pool must be a multiple of 128"
    QR = Q // 128
    L = len(fscene.lights)

    pf = jnp.zeros((_n_fchannels(L, *_layout_flags(fscene, cfg)),
                    QR, 128), jnp.float32)
    pi = jnp.zeros((3, QR, 128), jnp.int32)
    rng = jnp.zeros((QR, 128), jnp.uint32)
    C_HERO = max(1, int(cfg.hero_wavelengths))
    if C_HERO > 1:
        from tpurt.ops.spectra import hero_emission_table_jnp
        hero_tabs = [hero_emission_table_jnp(
            scene.light_color[li], scene.light_intensity[li],
            scene.light_temp[li], C_HERO) for li in range(len(fscene.lights))]
    else:
        hero_tabs = None

    def cond(carry):
        pf, pi, rng, ns_, npx, rgb, nsamp, rays, sweeps = carry
        return ((ns_ < spp) | jnp.any(pi[2] > 0)) & (sweeps < cfg.wf_max_sweeps)

    from tpurt.kernels.mega_pallas import chunk_sort_boxes
    _boxes = chunk_sort_boxes(fscene, cfg) if cfg.wf_chunk_sort else None
    sort_boxes = jnp.asarray(_boxes) if _boxes is not None else None

    def body(carry):
        pf, pi, rng, ns_, npx, rgb, nsamp, rays, sweeps = carry
        pf, pi, rng, ns_, npx = _regen_planar(
            scene, cfg, camera, pf, pi, rng, ns_, npx, spp, base_seed,
            state.iteration, hero_tabs,
            emb_planes=_layout_flags(fscene, cfg)[1])
        if sort_boxes is not None:
            pf, pi, rng = _chunk_sort_pool(sort_boxes, pf, pi, rng)
        pf, pi, rng, term, trays = sweep_pallas(fscene, cfg, pf, pi, rng,
                                                interpret=interpret)
        pix = pi[0].reshape(-1)
        t = (term.reshape(-1) > 0)
        radf = pf[_RAD:_RAD + 3].reshape(3, -1)
        if cfg.radiance_clamp > 0.0:
            radf = jnp.minimum(radf, jnp.float32(cfg.radiance_clamp))
        rgb = rgb.at[pix].add(
            jnp.where(t[:, None], jnp.transpose(radf), 0.0), mode="drop")
        nsamp = nsamp.at[pix].add(jnp.where(t, 1.0, 0.0), mode="drop")
        return (pf, pi, rng, ns_, npx, rgb, nsamp,
                rays + jnp.sum(trays), sweeps + 1)

    carry = (pf, pi, rng, jnp.int32(0), jnp.int32(0),
             state.rgb_sum, state.n_samples, state.rays, jnp.int32(0))
    carry = jax.lax.while_loop(cond, body, carry)
    _, _, _, _, _, rgb, nsamp, rays, _ = carry

    return dataclasses.replace(
        state, rgb_sum=rgb, n_samples=nsamp,
        iteration=state.iteration + spp, rays=rays)


def wavefront_render_pallas(scene, cfg: RenderConfig, camera,
                            state: RenderState, base_seed, spp,
                            interpret: bool | None = None) -> RenderState:
    """Wavefront render with the Pallas sweep kernel. Scene must be concrete
    (frozen into the kernel); falls back to the XLA wavefront for scenes
    beyond the kernel's budget."""
    from tpurt.render import _check_camera_kind   # deferred: import cycle
    _check_camera_kind(cfg, camera)
    if not supports_scene(scene, cfg):
        from tpurt.wavefront import wavefront_render
        return wavefront_render(scene, cfg, camera, state, base_seed, spp)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fscene = freeze_scene(scene)
    return _wavefront_pallas_jit(fscene, scene, cfg, camera, state,
                                 jnp.asarray(base_seed, jnp.uint32),
                                 jnp.asarray(spp, jnp.int32), interpret)


# ======================================================================
# Fused wavefront: per-lane sample regeneration INSIDE the kernel
# ======================================================================
#
# The pool-based sweep above keeps the wavefront's regen/splat stages in
# XLA; on TPU the per-sweep image scatter (262k random-index adds) costs
# ~10x the sweep kernel itself. The fused form removes the host stages
# entirely: each lane owns one pixel, loops over its own spp samples, and
# RESPAWNS ITS NEXT SAMPLE THE MOMENT ITS PATH DIES — per-lane occupancy
# stays ~100% with zero scatters (accumulation is a masked add into the
# lane's own output element). This is what GPU queue compaction buys,
# expressed as lane-local regeneration instead of cross-lane sorting.
#
# Draw streams are the same per-(pixel, sample) PCG sequences as
# tpurt.wavefront, so all three wavefront implementations are
# cross-checkable (equal ray counts).

def _make_fused_kernel(fscene: FrozenScene, cfg: RenderConfig, lanes: int,
                       budget_mode: bool = False):
    """budget_mode adds two VMEM planes — per-lane sample budgets and
    per-lane base counts (the pixel's accumulated n_samples, for
    progressive continuation) — and bounds each lane's regeneration loop
    by its own budget instead of the scalar spp (adaptive sampling,
    tpurt/adaptive.py). With budget_mode=False the emitted kernel is
    UNCHANGED (byte-identical jaxpr — the production path carries zero
    risk from this extension)."""
    R = lanes // 128
    W, H = cfg.width, cfg.height
    MATS = fscene.materials
    LIGHTS = fscene.lights
    L = len(LIGHTS)
    any_dielectric = any(m.mtype == 1 for m in MATS)
    any_metal = any(m.mtype == 2 for m in MATS)
    C_HERO = max(1, int(cfg.hero_wavelengths))
    track_collapse = (C_HERO > 1 and cfg.dispersion_in_camera_path
                      and any_dielectric)
    if C_HERO > 1:
        HERO_TABS = [hero_emission_table(lt.color, lt.intensity, lt.temp,
                                         C_HERO) for lt in LIGHTS]
        HERO_DELTA = VISIBLE_RANGE / C_HERO
    # environment emitter: 3 more per-lane emission entries after the
    # light em entries, spawned hero-averaged / collapsed to the hero's
    # share exactly like them (see the sweep kernel / module docstring)
    SKY_ON = float(cfg.sky_intensity) > 0.0
    ANY_EM = any(m.mtype == 3 for m in MATS)
    _, EMB_PLANES = _layout_flags(fscene, cfg)
    N_EM = 3 * L + (3 if SKY_ON else 0) + (3 if EMB_PLANES else 0)
    if SKY_ON and C_HERO > 1:
        SKY_TAB = hero_emission_table((1.0, 1.0, 1.0), cfg.sky_intensity,
                                      cfg.sky_temp, C_HERO)
    if EMB_PLANES:
        EMB_TAB = hero_emission_table((1.0, 1.0, 1.0), 1.0, 0.0, C_HERO)

    from tpurt.kernels.mega_pallas import (_use_sph_chunked,
                                           _use_tri_chunked)
    n_slabs = (int(_use_tri_chunked(fscene, cfg))
               + int(_use_sph_chunked(fscene, cfg)))

    def kernel(acc_ref, cam_ref, seed_ref, spp_ref, base_ref, sph_ref,
               tri_ref, *rest):
        if budget_mode:
            bud_ref, cnt_ref = rest[0], rest[1]
            rest = rest[2:]
        if n_slabs:
            out_ref, rays_ref = rest[n_slabs:n_slabs + 2]
            chunk = (list(rest[:n_slabs]), tuple(rest[n_slabs + 2:]))
        else:
            (out_ref, rays_ref), chunk = rest, None
        chunk_scratch_reset(chunk)
        tile = pl.program_id(0)
        gtile = base_ref[0, 0] + tile
        cam_o = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
        cam_h = (cam_ref[1, 0], cam_ref[1, 1], cam_ref[1, 2])
        cam_v = (cam_ref[2, 0], cam_ref[2, 1], cam_ref[2, 2])
        cam_ll = (cam_ref[3, 0], cam_ref[3, 1], cam_ref[3, 2])
        if cfg.motion_blur:
            cam_do = (cam_ref[4, 0], cam_ref[4, 1], cam_ref[4, 2])
            cam_dh = (cam_ref[5, 0], cam_ref[5, 1], cam_ref[5, 2])
            cam_dv = (cam_ref[6, 0], cam_ref[6, 1], cam_ref[6, 2])
            cam_dll = (cam_ref[7, 0], cam_ref[7, 1], cam_ref[7, 2])
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        idx = gtile * lanes + row * 128 + col
        px = jnp.remainder(idx, W)
        py = jnp.minimum(idx // W, H - 1)
        valid_px = idx < W * H
        base_seed = seed_ref[0, 0]
        spp = spp_ref[0, 0]
        it0_i = spp_ref[0, 1]   # starting iteration (continuation)
        if budget_mode:
            spp = bud_ref[...]      # (R, 128) per-lane sample budget
            it0_i = cnt_ref[...]    # per-lane progressive base index

        intersect, shadow = _make_scene_fns(fscene, cfg, sph_ref, tri_ref,
                                            chunk=chunk)

        # accumulation lives in the output block (masked adds in-loop)
        for c in range(3):
            out_ref[c] = acc_ref[c]

        zero = jnp.zeros_like(px, jnp.float32)
        z3 = (zero, zero, zero)
        st = {
            "anywork": jnp.int32(1),
            "sample": jnp.zeros_like(px),          # i32: next/current sample
            "active": jnp.zeros_like(px),          # i32 mask: path in flight
            "bounce": jnp.zeros_like(px),
            "o": z3, "d": z3, "tp": z3, "rad": z3,
            "lam": zero,
            "em": tuple(zero for _ in range(N_EM)),
            "rng": jnp.zeros_like(px).astype(jnp.uint32),
            "rays": jnp.float32(0.0),
        }
        if cfg.count_iters:
            # roofline/occupancy loop counter (cfg.count_iters — compiled
            # out of shipped kernels; see kernels/mega_regen.py)
            st["iters"] = jnp.float32(0.0)

        def cond(st):
            return st["anywork"] > 0

        def body(st):
            active = st["active"] > 0
            sample = st["sample"]

            # ---- per-lane regeneration: spawn this lane's next sample ----
            # lax.cond-gated like mega_regen's camera spawn: iterations
            # where no lane respawns (the drain tail) skip the seed/ray/
            # emission chain entirely
            regen = ~active & (sample < spp) & valid_px

            def _spawn_vals(_):
                seed = _frame_seed(base_seed, it0_i + sample)
                rng_new = rngmod.seed_pixels(seed, px, py)
                # cfg.qmc: Sobol spawn draws (pairing = integrate.py)
                if cfg.qmc:
                    from tpurt.ops import qmc as qmcmod
                    src = qmcmod.spawn_stream(base_seed, it0_i + sample,
                                              px, py)
                else:
                    src = rng_new
                uj1, src = rngmod.rand_1f(src)
                uj2, src = rngmod.rand_1f(src)
                u = (px.astype(jnp.float32) + uj1) / jnp.float32(W)
                v = (py.astype(jnp.float32) + uj2) / jnp.float32(H)
                if cfg.motion_blur:
                    ut, src = rngmod.rand_1f(src)
                    ch = tuple(cam_h[c] + ut * cam_dh[c] for c in range(3))
                    cv = tuple(cam_v[c] + ut * cam_dv[c] for c in range(3))
                    co = tuple(cam_o[c] + ut * cam_do[c] for c in range(3))
                    d0 = tuple(cam_ll[c] + ut * cam_dll[c]
                               + u * ch[c] + v * cv[c] - co[c]
                               for c in range(3))
                    o0 = co
                else:
                    ch, cv = cam_h, cam_v
                    d0 = tuple(
                        cam_ll[c] + u * cam_h[c] + v * cam_v[c] - cam_o[c]
                        for c in range(3))
                    o0 = s.vbroadcast(cam_o, u)
                if cfg.aperture > 0.0:
                    o0, d0, src = camera_mod.lens_perturb_c(
                        cfg.aperture, cfg.focus_dist, src, o0, d0,
                        ch, cv,
                        rngmod.rand_1f)
                ulam, src = rngmod.rand_1f(src)
                if not cfg.qmc:
                    rng_new = src
                lam_new = (jnp.float32(VISIBLE_MIN)
                           + ulam * jnp.float32(VISIBLE_RANGE))
                # hero-wavelength mode: em = the C-averaged emission via the
                # folded table (collapse rewrites it to the hero below)
                if C_HERO > 1:
                    em_new = []
                    for tab in HERO_TABS:
                        em_new.extend(s.hero_em_lookup_c(tab, HERO_DELTA,
                                                         lam_new))
                    if SKY_ON:
                        em_new.extend(s.hero_em_lookup_c(SKY_TAB, HERO_DELTA,
                                                         lam_new))
                    if EMB_PLANES:
                        em_new.extend(s.hero_em_lookup_c(EMB_TAB, HERO_DELTA,
                                                         lam_new))
                else:
                    em_new = list(_single_lambda_em_c(LIGHTS, lam_new))
                    if SKY_ON:
                        em_new.extend(_sky_em_c(cfg, lam_new))
                return (*o0, *d0, lam_new, rng_new, *em_new)

            def _spawn_skip(_):
                return (zero,) * 7 \
                    + (jnp.zeros_like(px).astype(jnp.uint32),) \
                    + (zero,) * N_EM

            vals = jax.lax.cond(jnp.any(regen), _spawn_vals, _spawn_skip, 0)
            o0 = vals[0:3]
            d0 = vals[3:6]
            lam_new = vals[6]
            rng_new = vals[7]
            em_new = vals[8:8 + N_EM]

            o = s.vwhere(regen, o0, st["o"])
            d = s.vwhere(regen, d0, st["d"])
            tp = s.vwhere(regen, (zero + 1.0,) * 3, st["tp"])
            rad = s.vwhere(regen, z3, st["rad"])
            lam = jnp.where(regen, lam_new, st["lam"])
            em = tuple(jnp.where(regen, em_new[i], st["em"][i])
                       for i in range(N_EM))
            rng = jnp.where(regen, rng_new, st["rng"])
            bounce = jnp.where(regen, 0, st["bounce"])
            active = active | regen

            rays = st["rays"]
            if cfg.count_rays:
                rays = rays + jnp.sum(_mask_f32(active))

            # ---- one bounce (identical physics to the sweep kernel) ----
            t, loc, n, mat = intersect(o, d, active)
            found = t < _HIT
            color, rough, ior, is_diffuse, is_metal = \
                _material_lookup_static(MATS, mat)
            wo = s.vneg(d)

            if SKY_ON:
                tint = _sky_tint_c(cfg, d)
                miss = active & ~found
                rad = tuple(jnp.where(miss,
                                      rad[c] + tp[c] * em[3 * L + c]
                                      * tint[c], rad[c]) for c in range(3))
            elif cfg.sky_gradient:
                dn = s.vnormalize(d, eps=1e-30)
                t_sky = 0.5 * (dn[1] + 1.0)
                sky = tuple((1.0 - t_sky) + t_sky * np.float32(c)
                            for c in (0.5, 0.7, 1.0))
                miss = active & ~found
                rad = tuple(jnp.where(miss, rad[c] + tp[c] * sky[c], rad[c])
                            for c in range(3))

            # type-3 emitter hit: add emission; lane terminates below
            if ANY_EM:
                is_em = _is_emissive_static(MATS, mat)
                if EMB_PLANES:
                    base = 3 * L + (3 if SKY_ON else 0)
                    emB = (em[base], em[base + 1], em[base + 2])
                elif C_HERO > 1:
                    emB = s.hero_em_lookup_c(
                        hero_emission_table((1.0, 1.0, 1.0), 1.0, 0.0,
                                            C_HERO), HERO_DELTA, lam)
                else:
                    emB = _flat_em_c(lam)
                hit_em = active & found & is_em
                rad = tuple(jnp.where(hit_em,
                                      rad[c] + tp[c] * color[c] * emB[c],
                                      rad[c]) for c in range(3))

            direct, rng = nee_direct_c(
                LIGHTS, loc, n, lam, rng, shadow,
                lambda: active & found & is_diffuse,
                lambda li: (em[3 * li], em[3 * li + 1], em[3 * li + 2]), z3,
                mode=cfg.light_sample)

            lane_d = active & found & is_diffuse
            nee = s.vmul(s.vmul(tp, color), direct)
            rad = tuple(jnp.where(lane_d, rad[c] + nee[c], rad[c])
                        for c in range(3))
            if cfg.count_rays:
                rays = rays + jnp.sum(_mask_f32(lane_d)) * (
                    min(1, L) if cfg.light_sample != "all" else L)

            def eta_fn():
                lam_um = lam * jnp.float32(1e-3)
                cauchy_add = jnp.float32(DISPERSION_B) / (lam_um * lam_um)
                return (ior + cauchy_add if cfg.dispersion_in_camera_path
                        else ior)

            if track_collapse:
                def post_diel(is_diel):
                    # dispersive interaction: em collapses to the hero's
                    # share (cond-gated recompute; idempotent)
                    coll_now = active & found & is_diel

                    def _coll_vals(_):
                        vals = tuple(_single_lambda_em_c(LIGHTS, lam))
                        if SKY_ON:
                            vals = vals + _sky_em_c(cfg, lam)
                        if EMB_PLANES:
                            vals = vals + _flat_em_c(lam)
                        return vals

                    em_h = jax.lax.cond(
                        jnp.any(coll_now), _coll_vals,
                        lambda _: (jnp.zeros_like(lam),) * N_EM, 0)
                    return tuple(jnp.where(coll_now, em_h[i], em[i])
                                 for i in range(N_EM))
            else:
                post_diel = None

            wi, new_tp, new_o, scat_ok, rr_live, rng, em_new = scatter_rr_c(
                cfg, wo, n, loc, color, rough, is_diffuse, is_metal, tp,
                rng, any_dielectric=any_dielectric, any_metal=any_metal,
                eta_fn=eta_fn, camera_pdf=True,
                rr_thresh_fn=lambda: cfg.rr_threshold,
                post_dielectric=post_diel)
            if track_collapse and any_dielectric:
                em = em_new

            depth_ok = (bounce + 1) < cfg.depth
            cont = active & found & scat_ok & rr_live & depth_ok
            if ANY_EM:
                cont = cont & ~is_em
            terminated = active & ~cont

            # lane-local "splat": masked add into this lane's own texel
            rad_s = rad
            if cfg.radiance_clamp > 0.0:
                cl = jnp.float32(cfg.radiance_clamp)
                rad_s = tuple(jnp.minimum(r, cl) for r in rad)
            for c in range(3):
                out_ref[c] = jnp.where(terminated, out_ref[c] + rad_s[c],
                                       out_ref[c])
            sample = jnp.where(terminated, sample + 1, sample)
            cont_i = _mask_i32(cont)
            anywork = jnp.max(_mask_i32(((sample < spp) & valid_px)
                                        | (cont_i > 0)))
            out = {
                "anywork": anywork,
                "sample": sample, "active": cont_i,
                "bounce": bounce + 1,
                "o": s.vwhere(cont, new_o, o),
                "d": s.vwhere(cont, wi, d),
                "tp": s.vwhere(cont, new_tp, tp),
                "rad": rad, "lam": lam, "em": em, "rng": rng,
                "rays": rays,
            }
            if "iters" in st:
                out["iters"] = st["iters"] + 1.0
            return out

        st = jax.lax.while_loop(cond, body, st)
        rays_ref[tile, 0] = st["rays"]
        if "iters" in st:
            rays_ref[tile, 1] = st["iters"]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("fscene", "cfg", "interpret"))
def _fused_wavefront_jit(fscene, cfg, camera, state, base_seed, spp,
                         interpret):
    lanes = cfg.pallas_lanes
    R = lanes // 128
    P = state.rgb_sum.shape[0]
    TR = P // 128
    assert TR % R == 0, (
        f"state rows {TR} not divisible by pallas tile rows {R}; "
        "init the state with cfg.backend='pallas'")
    n_tiles = TR // R

    # accumulation planes from state (conversion paid once per call)
    acc = jnp.stack([state.rgb_sum[:, c] for c in range(3)]).reshape(3, TR, 128)
    if cfg.motion_blur:
        cam = camera_mod.motion_rows(camera)      # (8, 3): basis + deltas
    else:
        cam = jnp.stack([camera.origin, camera.horizontal,
                         camera.vertical, camera.lower_left])
    seed_arr = jnp.asarray(base_seed, jnp.uint32).reshape(1, 1)
    spp_arr = jnp.stack([jnp.asarray(spp, jnp.int32),
                         state.iteration.astype(jnp.int32)]).reshape(1, 2)
    base_arr = jnp.zeros((1, 1), jnp.int32)
    sph_tab, tri_tab = _prim_tables(fscene, cfg)
    chunk_tab, chunk_meta = _chunk_tables(fscene, cfg)

    kernel = _make_fused_kernel(fscene, cfg, lanes)
    vb3 = pl.BlockSpec((3, R, 128), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    new_acc, rays = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[vb3, sm, sm, sm, sm, sm, sm]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(chunk_tab),
        out_specs=[vb3, sm],
        out_shape=[
            jax.ShapeDtypeStruct(acc.shape, jnp.float32),
            # col 1 (cfg.count_iters): loop iterations — roofline probe
            jax.ShapeDtypeStruct((n_tiles, 2 if cfg.count_iters else 1),
                                 jnp.float32),
        ],
        scratch_shapes=chunk_scratch_shapes(chunk_meta),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(acc, cam, seed_arr, spp_arr, base_arr, sph_tab, tri_tab,
      *chunk_tab)

    flat = new_acc.reshape(3, P)
    rgb = jnp.stack([flat[0], flat[1], flat[2]], axis=-1)
    st = dataclasses.replace(
        state,
        rgb_sum=rgb,
        n_samples=state.n_samples + spp.astype(jnp.float32),
        iteration=state.iteration + spp,
        rays=state.rays + jnp.sum(rays[:, 0]),
    )
    return (st, jnp.sum(rays[:, 1])) if cfg.count_iters else st


@functools.partial(jax.jit,
                   static_argnames=("fscene", "cfg", "max_budget",
                                    "interpret"))
def _fused_budget_jit(fscene, cfg, camera, state, base_seed, budgets,
                      max_budget, interpret):
    lanes = cfg.pallas_lanes
    R = lanes // 128
    P = state.rgb_sum.shape[0]
    TR = P // 128
    assert TR % R == 0, (
        f"state rows {TR} not divisible by pallas tile rows {R}; "
        "init the state with cfg.backend='pallas'")
    n_tiles = TR // R

    # clip to the contract and zero the pad tail (the kernel's valid_px
    # would skip pad lanes anyway, but n_samples must not count them)
    budgets = jnp.clip(budgets.astype(jnp.int32), 0, max_budget)
    budgets = jnp.where(jnp.arange(P) < cfg.n_pixels, budgets, 0)
    bud = budgets.reshape(TR, 128)
    cnt = state.n_samples.astype(jnp.int32).reshape(TR, 128)

    acc = jnp.stack([state.rgb_sum[:, c] for c in range(3)]).reshape(3, TR, 128)
    if cfg.motion_blur:
        cam = camera_mod.motion_rows(camera)      # (8, 3): basis + deltas
    else:
        cam = jnp.stack([camera.origin, camera.horizontal,
                         camera.vertical, camera.lower_left])
    seed_arr = jnp.asarray(base_seed, jnp.uint32).reshape(1, 1)
    # scalar spp/it0 are superseded by the budget/count planes in
    # budget_mode; passed for signature symmetry only
    spp_arr = jnp.stack([jnp.int32(max_budget),
                         state.iteration.astype(jnp.int32)]).reshape(1, 2)
    base_arr = jnp.zeros((1, 1), jnp.int32)
    sph_tab, tri_tab = _prim_tables(fscene, cfg)
    chunk_tab, chunk_meta = _chunk_tables(fscene, cfg)

    kernel = _make_fused_kernel(fscene, cfg, lanes, budget_mode=True)
    vb3 = pl.BlockSpec((3, R, 128), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    vb1 = pl.BlockSpec((R, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    new_acc, rays = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[vb3, sm, sm, sm, sm, sm, sm, vb1, vb1]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(chunk_tab),
        out_specs=[vb3, sm],
        out_shape=[
            jax.ShapeDtypeStruct(acc.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.float32),
        ],
        scratch_shapes=chunk_scratch_shapes(chunk_meta),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(acc, cam, seed_arr, spp_arr, base_arr, sph_tab, tri_tab, bud, cnt,
      *chunk_tab)

    flat = new_acc.reshape(3, P)
    rgb = jnp.stack([flat[0], flat[1], flat[2]], axis=-1)
    return dataclasses.replace(
        state,
        rgb_sum=rgb,
        n_samples=state.n_samples + budgets.astype(jnp.float32),
        iteration=state.iteration + jnp.int32(max_budget),
        rays=state.rays + jnp.sum(rays),
    )


def wavefront_render_budget_fused(scene, cfg: RenderConfig, camera,
                                  state: RenderState, base_seed, budgets,
                                  max_budget: int,
                                  interpret: bool | None = None
                                  ) -> RenderState:
    """Fused wavefront render under a per-pixel budget map (adaptive
    sampling, tpurt/adaptive.py): each lane loops over its own pixel's
    budget, continuing at the pixel's accumulated count — the in-kernel
    form of adaptive.wavefront_render_budget (same per-(pixel, sample)
    streams; exact ray-count parity). Falls back to the XLA budget
    renderer for scenes beyond the kernel budget."""
    from tpurt.render import _check_camera_kind   # deferred: import cycle
    _check_camera_kind(cfg, camera)
    if not supports_scene(scene, cfg):
        from tpurt.adaptive import wavefront_render_budget
        return wavefront_render_budget(scene, cfg, camera, state,
                                       base_seed, budgets, max_budget)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fscene = freeze_scene(scene)
    return _fused_budget_jit(fscene, cfg, camera, state,
                             jnp.asarray(base_seed, jnp.uint32),
                             budgets, int(max_budget), interpret)


def wavefront_render_fused(scene, cfg: RenderConfig, camera,
                           state: RenderState, base_seed, spp,
                           interpret: bool | None = None) -> RenderState:
    """Fully-fused wavefront render: per-lane sample regeneration inside one
    Pallas kernel (see module notes) — no host stages between bounces.
    Same per-(pixel, sample) streams as tpurt.wavefront; falls back to the
    XLA wavefront for scenes beyond the kernel budget.

    With cfg.count_iters the plain RenderState is still returned (the
    iteration total is dropped here — use wavefront_fused_stats)."""
    from tpurt.render import _check_camera_kind   # deferred: import cycle
    _check_camera_kind(cfg, camera)
    if not supports_scene(scene, cfg):
        from tpurt.wavefront import wavefront_render
        return wavefront_render(scene, cfg, camera, state, base_seed, spp)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fscene = freeze_scene(scene)
    out = _fused_wavefront_jit(fscene, cfg, camera, state,
                               jnp.asarray(base_seed, jnp.uint32),
                               jnp.asarray(spp, jnp.int32), interpret)
    return out[0] if cfg.count_iters else out


def wavefront_fused_stats(scene, cfg: RenderConfig, camera, state,
                          base_seed, spp, interpret: bool | None = None):
    """wavefront_render_fused + total kernel loop iterations (the
    occupancy/roofline probe — twin of mega_regen.render_regen_stats)."""
    if not supports_scene(scene, cfg):
        raise ValueError("roofline stats need the fused kernel; scene "
                         "exceeds its budget")
    if not cfg.count_iters:
        cfg = cfg.with_(count_iters=True)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fscene = freeze_scene(scene)
    return _fused_wavefront_jit(fscene, cfg, camera, state,
                                jnp.asarray(base_seed, jnp.uint32),
                                jnp.asarray(spp, jnp.int32), interpret)
