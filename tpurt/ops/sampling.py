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


def sample_cosine_hemisphere(normal, state, strat=None, strata=None):
    """Cosine-weighted hemisphere direction about `normal` via the concentric
    disk construction the reference uses. Returns (dir, new_state).
    strat/strata: optional (remap_fn, (sa, sb)) stratification of the two
    uniforms (photon emission coherence, cfg.photon_strata)."""
    u, state = rand_2f(state)
    u0, u1 = u[..., 0], u[..., 1]
    if strat is not None:
        u0, u1 = strat(u0, strata[0]), strat(u1, strata[1])
    theta = jnp.float32(TWO_PI) * u0
    r = jnp.sqrt(u1)
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - r * r))
    T = build_tangent_frame(normal)
    B = cross(normal, T)
    d = x[..., None] * T + y[..., None] * B + z[..., None] * normal
    return d, state


def sample_cone_toward(origin, target, state, cos_half=PHOTON_CONE_COS,
                       strat=None, strata=None):
    """Direction in a cone from `origin` aimed at `target` (photon emission
    from point lights). Draws one 1f then one 2f, in reference order.
    Returns (dir, new_state). strat/strata as in sample_cosine_hemisphere
    (stratifies the polar and azimuth uniforms)."""
    axis = normalize(target - origin, eps=1e-30)
    T = build_tangent_frame(axis)
    B = cross(axis, T)
    uc, state = rand_1f(state)
    u, state = rand_2f(state)
    if strat is not None:
        uc = strat(uc, strata[0])
        u = jnp.stack([strat(u[..., 0], strata[1]), u[..., 1]], axis=-1)
    ct = 1.0 - uc * (1.0 - cos_half)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = jnp.float32(TWO_PI) * u[..., 0]
    d = (st * jnp.cos(phi))[..., None] * T + (st * jnp.sin(phi))[..., None] * B + ct[..., None] * axis
    return d, state
