"""Directional / positional sampling routines used by the integrators.

Reference semantics (ref: src/kernels/mega_kernel.wgsl):
  sample_cosine_hemisphere_dir :698-708
  sample_cone_toward           :710-721  (photon emission from point lights)
  sample_square_point          :688-696  (area light surface sampling)
  light_normal                 :683-686  (normal repacked from (x, z), y<=0)

All functions are batched over a leading lane axis and thread explicit RNG
state (see tpurt.ops.rng), so they run unchanged in XLA and Pallas.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpurt.ops.bsdf import TWO_PI, build_tangent_frame, cross, normalize
from tpurt.ops.rng import rand_1f, rand_2f

PHOTON_CONE_COS = 0.707  # ref: mega_kernel.wgsl:103


def light_normal(normal_x, normal_z):
    """Reconstruct the area-light normal from its packed (x, z):
    y = -sqrt(1 - x^2 - z^2), always facing downward."""
    ny_sq = jnp.maximum(0.0, 1.0 - normal_x * normal_x - normal_z * normal_z)
    ny = -jnp.sqrt(ny_sq)
    return jnp.stack(jnp.broadcast_arrays(normal_x, ny, normal_z), axis=-1)


def sample_square_point(center, half_width, normal, u):
    """Uniform point on a square area light. u: (..., 2) uniforms.
    pdf = 1 / (4 * half_width^2)."""
    T = build_tangent_frame(normal)
    B = cross(normal, T)
    su = (u[..., 0] - 0.5) * 2.0 * half_width
    sv = (u[..., 1] - 0.5) * 2.0 * half_width
    return center + su[..., None] * T + sv[..., None] * B


def cosine_hemisphere_from_u(normal, u0, u1):
    """Cosine-weighted hemisphere direction about `normal` from two
    pre-drawn uniforms (the construction the reference uses)."""
    theta = jnp.float32(TWO_PI) * u0
    r = jnp.sqrt(u1)
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - r * r))
    T = build_tangent_frame(normal)
    B = cross(normal, T)
    return x[..., None] * T + y[..., None] * B + z[..., None] * normal


def sample_cosine_hemisphere(normal, state):
    """Draws 2f and builds the cosine direction. Returns (dir, new_state)."""
    u, state = rand_2f(state)
    return cosine_hemisphere_from_u(normal, u[..., 0], u[..., 1]), state


def cone_from_u(origin, target, uc, uphi, cos_half=PHOTON_CONE_COS):
    """Direction in a cone from `origin` aimed at `target` from two
    pre-drawn uniforms (polar uc, azimuth uphi)."""
    axis = normalize(target - origin, eps=1e-30)
    T = build_tangent_frame(axis)
    B = cross(axis, T)
    ct = 1.0 - uc * (1.0 - cos_half)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = jnp.float32(TWO_PI) * uphi
    return (st * jnp.cos(phi))[..., None] * T \
        + (st * jnp.sin(phi))[..., None] * B + ct[..., None] * axis


def sample_cone_toward(origin, target, state, cos_half=PHOTON_CONE_COS):
    """Direction in a cone from `origin` aimed at `target` (photon emission
    from point lights). Draws one 1f then one 2f, in reference order.
    Returns (dir, new_state)."""
    uc, state = rand_1f(state)
    u, state = rand_2f(state)
    return cone_from_u(origin, target, uc, u[..., 0], cos_half), state


# ----- many-light NEE: power-proportional light selection (EXTENSION;
# the reference loops NEE over every light, wgsl :568-615) -----

def light_powers(intensities, hws, is_areas):
    """Per-light selection weights for cfg.light_sample="power":
    p_i = intensity * (4*hw^2 for area lights, 1 for points) — emitted
    flux up to the lambda-dependent color/blackbody factor, which stays
    O(1) across lights. intensities / hws: length-L sequences of f32
    scalars — python floats in the frozen kernels, traced jnp scalars in
    the XLA path; is_areas: bools (python or traced). Fixed f32 op chain
    in one order, so both forms produce bit-identical weights (the
    cross-backend exactness contract)."""
    powers = []
    for i in range(len(intensities)):
        area_w = jnp.float32(4.0) * hws[i] * hws[i]
        p = intensities[i] * jnp.where(is_areas[i], area_w,
                                       jnp.float32(1.0))
        powers.append(p)
    return powers


def select_from_powers(u_sel, powers):
    """Pick ONE light per lane with probability proportional to powers
    (length-L sequence of f32 scalars OR per-lane planes — the spatial
    heuristic passes planes), for the O(1)-shadow-rays NEE modes.

    ANY positive p_i is unbiased (the contribution is weighted by
    1/pmf); a floor keeps zero-power lights selectable so their (zero)
    contribution never divides by zero.

    Returns (sels, inv_pmf): L boolean planes (exactly one true per
    lane) and the selected light's 1/pmf plane.
    """
    powers = [jnp.maximum(p, jnp.float32(1e-20)) for p in powers]
    cdf = []
    tot = jnp.float32(0.0)
    for p in powers:
        tot = tot + p
        cdf.append(tot)
    r = u_sel * tot
    sels = []
    prev = jnp.float32(0.0)
    inv_pmf = jnp.zeros_like(u_sel)
    for i, p in enumerate(powers):
        # the last bucket is open-ended: u_sel within an ulp of 1 can
        # put r at/above tot, and it must still select a light
        m = (r >= prev) if i == len(powers) - 1 else \
            (r >= prev) & (r < cdf[i])
        sels.append(m)
        inv_pmf = jnp.where(m, tot / p, inv_pmf)
        prev = cdf[i]
    return sels, inv_pmf


def light_select_power(u_sel, intensities, hws, is_areas):
    """cfg.light_sample="power" selection: light_powers -> select."""
    return select_from_powers(u_sel, light_powers(intensities, hws,
                                                  is_areas))


def select_chain(sels, values):
    """Per-lane gather by chained selects: values[i] under sels[i].
    values: (N,)/(N,3) arrays, or scalars/(3,) rows (broadcast); exactly
    one sel true per lane (light_select_power's postcondition)."""
    out = None
    for m, v in zip(sels, values):
        v = jnp.asarray(v)
        mm = m[..., None] if v.ndim > m.ndim else m
        out = jnp.where(mm, v, 0.0) if out is None else jnp.where(mm, v, out)
    return out
