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
