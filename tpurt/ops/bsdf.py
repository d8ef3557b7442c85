"""BSDF models: Oren-Nayar diffuse, Trowbridge-Reitz (GGX) microfacets with
VNDF sampling, and dielectric Fresnel / reflect / refract.

Semantics match the reference kernel (ref: src/kernels/mega_kernel.wgsl:
oren_nayar_f :182-209, tr_d/tr_lambda/tr_g :213-230, tr_sample_wm :235-256,
fr_dielectric :624-635, reflect_dir :637-639, refract_dir :641-651,
build_tangent_frame :677-681), rewritten as branch-free batched jnp so the
same functions run in the XLA integrator and inside Pallas pixel-tile kernels.

Conventions: all vectors are (..., 3) float32, shading-local frames put the
normal on +z.  Branches in the scalar reference become jnp.where selects.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979
INV_PI = 0.3183098861837907
TWO_PI = 6.283185307179586


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def normalize(v, eps=0.0):
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))
    return v / n


def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def tan2_theta(w):
    """tan^2(theta) with the reference's 1e20 saturation at grazing.

    NOTE (reference quirk, kept deliberately): the saturation returns
    EXACTLY 1e20 while tr_d/tr_lambda guard with a STRICT `tan2 > 1e20`,
    so those guards never fire — at grazing, lambda evaluates huge
    (G -> 0) instead of pbrt's return-0 (G -> 1). The reference WGSL has
    the identical dead guard (mega_kernel.wgsl:171-226); changing the
    compare to >= would diverge from it."""
    c2 = cos2_theta(w)
    safe = jnp.maximum(c2, 1e-10)
    t2 = (1.0 - c2) / safe
    return jnp.where(c2 < 1e-10, jnp.float32(1e20), t2)


def same_hemisphere(wo, wi):
    return wo[..., 2] * wi[..., 2] > 0.0


# ----- Oren-Nayar diffuse -----

def oren_nayar_f(wo, wi, n, albedo, sigma):
    """Oren-Nayar BRDF value, world-space wo/wi/n, per-lane albedo (...,3)
    and sigma (...,). Zero when either direction is below the surface."""
    ndotv = jnp.maximum(dot(n, wo), 0.0)
    ndotl = jnp.maximum(dot(n, wi), 0.0)

    sig2 = sigma * sigma
    A = 1.0 - 0.5 * sig2 / (sig2 + 0.33)
    B = 0.45 * sig2 / (sig2 + 0.09)

    sin2_v = jnp.maximum(0.0, 1.0 - ndotv * ndotv)
    sin2_l = jnp.maximum(0.0, 1.0 - ndotl * ndotl)
    sin_v = jnp.sqrt(sin2_v)
    sin_l = jnp.sqrt(sin2_l)

    wo_t = wo - ndotv[..., None] * n
    wi_t = wi - ndotl[..., None] * n
    denom = jnp.maximum(sin_v * sin_l, 1e-20)
    cos_phi_raw = jnp.clip(dot(wo_t, wi_t) / denom, -1.0, 1.0)
    cos_phi_diff = jnp.where((sin_v > 1e-6) & (sin_l > 1e-6), cos_phi_raw, 1.0)

    sin_alpha = jnp.maximum(sin_v, sin_l)
    tan_beta = jnp.minimum(sin_v, sin_l) / jnp.maximum(jnp.maximum(ndotv, ndotl), 1e-20)

    f = albedo * jnp.float32(INV_PI) * (
        A + B * jnp.maximum(0.0, cos_phi_diff) * sin_alpha * tan_beta
    )[..., None]
    valid = (ndotv >= 1e-6) & (ndotl >= 1e-6)
    return jnp.where(valid[..., None], f, 0.0)


# ----- Trowbridge-Reitz (GGX) -----

def roughness_to_alpha(roughness):
    return jnp.sqrt(roughness)


def effectively_smooth(alpha):
    return alpha < 1e-3


def tr_d(wm, alpha):
    """GGX normal distribution D(wm), local frame."""
    tan2 = tan2_theta(wm)
    cos4 = cos2_theta(wm) * cos2_theta(wm)
    a2 = alpha * alpha
    e = tan2 / jnp.maximum(a2, 1e-20)
    d = 1.0 / jnp.maximum(jnp.float32(PI) * a2 * cos4 * (1.0 + e) * (1.0 + e), 1e-30)
    return jnp.where(tan2 > 1e20, 0.0, d)


def tr_lambda(w, alpha):
    """Smith Lambda for GGX."""
    tan2 = tan2_theta(w)
    a2 = alpha * alpha
    lam = (jnp.sqrt(1.0 + a2 * tan2) - 1.0) * 0.5
    return jnp.where(tan2 > 1e20, 0.0, lam)


def tr_g(wo, wi, alpha):
    """Smith height-correlated masking-shadowing G."""
    return 1.0 / (1.0 + tr_lambda(wo, alpha) + tr_lambda(wi, alpha))


def tr_g1(w, alpha):
    return 1.0 / (1.0 + tr_lambda(w, alpha))


def tr_sample_wm(wo, u, alpha):
    """Sample a visible normal (VNDF, Heitz 2018) in the local frame.

    wo: (...,3) local outgoing, u: (...,2) uniforms, alpha (...,).
    Matches the reference construction exactly (ref: mega_kernel.wgsl:235-256),
    including the max(nh.z, 1e-6) clamp.
    """
    a = alpha[..., None]
    wh = normalize(jnp.stack([a[..., 0] * wo[..., 0], a[..., 0] * wo[..., 1], wo[..., 2]], axis=-1), eps=1e-30)
    wh = jnp.where(wh[..., 2:3] < 0.0, -wh, wh)

    z_axis = jnp.zeros_like(wh).at[..., 2].set(1.0)
    t1_raw = normalize(cross(z_axis, wh), eps=1e-30)
    x_axis = jnp.zeros_like(wh).at[..., 0].set(1.0)
    t1 = jnp.where(jnp.abs(wh[..., 2:3]) > 0.99999, x_axis, t1_raw)
    t2 = cross(wh, t1)

    r = jnp.sqrt(u[..., 1])
    phi = jnp.float32(TWO_PI) * u[..., 0]
    px = r * jnp.cos(phi)
    py = r * jnp.sin(phi)
    h = jnp.sqrt(jnp.maximum(0.0, 1.0 - px * px))
    py = h + ((1.0 + wh[..., 2]) * 0.5) * (py - h)  # mix(h, py, (1+z)/2)

    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - px * px - py * py))
    nh = px[..., None] * t1 + py[..., None] * t2 + pz[..., None] * wh

    wm = jnp.stack([
        a[..., 0] * nh[..., 0],
        a[..., 0] * nh[..., 1],
        jnp.maximum(nh[..., 2], 1e-6),
    ], axis=-1)
    return normalize(wm, eps=1e-30)


# ----- Fresnel / reflect / refract -----

def fr_dielectric(cos_theta_i, eta):
    """Unpolarized dielectric Fresnel reflectance.

    Handles rays arriving from inside (cos<0 -> eta := 1/eta) and total
    internal reflection (returns 1), matching ref: mega_kernel.wgsl:624-635.
    """
    ct = jnp.clip(cos_theta_i, -1.0, 1.0)
    inside = ct < 0.0
    e = jnp.where(inside, 1.0 / eta, eta)
    ct = jnp.abs(ct)
    sin2_ti = 1.0 - ct * ct
    sin2_tt = sin2_ti / (e * e)
    tir = sin2_tt >= 1.0
    ct_t = jnp.sqrt(jnp.maximum(1.0 - sin2_tt, 0.0))
    r_parl = (e * ct - ct_t) / jnp.maximum(e * ct + ct_t, 1e-20)
    r_perp = (ct - e * ct_t) / jnp.maximum(ct + e * ct_t, 1e-20)
    fr = (r_parl * r_parl + r_perp * r_perp) * 0.5
    return jnp.where(tir, 1.0, fr)


def reflect_dir(wo, n):
    """Mirror wo about n (wo points away from the surface)."""
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract_dir(wo, n, eta):
    """Refract wo through interface with normal n and relative IOR eta.

    Returns (wi, valid) where valid=False flags total internal reflection
    (the reference returns a zero vector and callers test length<0.5,
    ref: mega_kernel.wgsl:641-651).
    """
    ct = dot(n, wo)
    inside = ct < 0.0
    e = jnp.where(inside, 1.0 / eta, eta)
    na = jnp.where(inside[..., None], -n, n)
    ct = jnp.abs(ct)
    sin2_ti = jnp.maximum(0.0, 1.0 - ct * ct)
    sin2_tt = sin2_ti / (e * e)
    tir = sin2_tt >= 1.0
    ct_t = jnp.sqrt(jnp.maximum(1.0 - sin2_tt, 0.0))
    wi = -wo / e[..., None] + (ct / e - ct_t)[..., None] * na
    wi = jnp.where(tir[..., None], 0.0, wi)
    return wi, ~tir


def fr_schlick(cos_theta_i, f0):
    """Schlick Fresnel for conductors: F0 + (1-F0)(1-cos)^5.
    f0 is (..., 3) RGB reflectance at normal incidence; cos (...,)."""
    c = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)
    m = 1.0 - c
    m2 = m * m
    w = (m2 * m2 * m)[..., None]
    return f0 + (1.0 - f0) * w


# ----- Shading frames -----

def build_tangent_frame(n):
    """Tangent T for normal n: normalize(cross(+Y, n)), or +X when n ~ +/-Y
    (ref: mega_kernel.wgsl:677-681). Bitangent is cross(n, T)."""
    up = jnp.zeros_like(n).at[..., 1].set(1.0)
    t_raw = normalize(cross(up, n), eps=1e-30)
    x_axis = jnp.zeros_like(n).at[..., 0].set(1.0)
    return jnp.where(jnp.abs(n[..., 1:2]) > 0.99999, x_axis, t_raw)


def to_local(w, n, t, b):
    """World -> local (z = n) frame."""
    return jnp.stack([dot(w, t), dot(w, b), dot(w, n)], axis=-1)


def to_world(w, n, t, b):
    """Local (z = n) -> world frame."""
    return w[..., 0:1] * t + w[..., 1:2] * b + w[..., 2:3] * n
