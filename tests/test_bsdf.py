"""BSDF ops vs scalar NumPy oracles transcribing the reference formulas
(mega_kernel.wgsl:182-263, 624-651, 677-681)."""

import numpy as np
import jax.numpy as jnp

from tpurt.ops import bsdf as B

rng = np.random.default_rng(3)


def _rand_dirs(n, upper=False):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if upper:
        v[:, 2] = np.abs(v[:, 2])
    return v.astype(np.float32)


# ----- oracles -----

def oren_nayar_oracle(wo, wi, n, albedo, sigma):
    ndotv = max(np.dot(n, wo), 0.0)
    ndotl = max(np.dot(n, wi), 0.0)
    if ndotv < 1e-6 or ndotl < 1e-6:
        return np.zeros(3)
    sig2 = sigma * sigma
    A = 1.0 - 0.5 * sig2 / (sig2 + 0.33)
    Bc = 0.45 * sig2 / (sig2 + 0.09)
    sin_v = np.sqrt(max(0.0, 1 - ndotv ** 2))
    sin_l = np.sqrt(max(0.0, 1 - ndotl ** 2))
    if sin_v > 1e-6 and sin_l > 1e-6:
        wo_t = wo - ndotv * n
        wi_t = wi - ndotl * n
        cos_phi = np.clip(np.dot(wo_t, wi_t) / (sin_v * sin_l), -1, 1)
    else:
        cos_phi = 1.0
    sin_alpha = max(sin_v, sin_l)
    tan_beta = min(sin_v, sin_l) / max(ndotv, ndotl)
    return albedo / np.pi * (A + Bc * max(0.0, cos_phi) * sin_alpha * tan_beta)


def fr_oracle(ct, eta):
    ct = np.clip(ct, -1, 1)
    if ct < 0:
        eta = 1 / eta
        ct = -ct
    s2t = (1 - ct * ct) / (eta * eta)
    if s2t >= 1:
        return 1.0
    ctt = np.sqrt(1 - s2t)
    rp = (eta * ct - ctt) / (eta * ct + ctt)
    rs = (ct - eta * ctt) / (ct + eta * ctt)
    return 0.5 * (rp * rp + rs * rs)


def refract_oracle(wo, n, eta):
    ct = np.dot(n, wo)
    if ct < 0:
        eta = 1 / eta
        ct = -ct
        n = -n
    s2t = max(0.0, 1 - ct * ct) / (eta * eta)
    if s2t >= 1:
        return np.zeros(3), False
    ctt = np.sqrt(1 - s2t)
    return -wo / eta + (ct / eta - ctt) * n, True


def tr_d_oracle(wm, alpha):
    c2 = wm[2] ** 2
    if c2 < 1e-10:
        return 0.0
    t2 = (1 - c2) / c2
    if t2 > 1e20:
        return 0.0
    cos4 = c2 * c2
    e = t2 / (alpha * alpha)
    return 1.0 / (np.pi * alpha * alpha * cos4 * (1 + e) ** 2)


def tr_lambda_oracle(w, alpha):
    c2 = w[2] ** 2
    if c2 < 1e-10:
        return 0.0
    t2 = (1 - c2) / c2
    if t2 > 1e20:
        return 0.0
    return (np.sqrt(1 + alpha * alpha * t2) - 1) / 2


# ----- tests -----

def test_oren_nayar_vs_oracle():
    n = np.array([0.0, 0.0, 1.0], np.float32)
    albedo = np.array([0.8, 0.5, 0.3], np.float32)
    wos = _rand_dirs(64)
    wis = _rand_dirs(64)
    for sigma in (0.0, 0.01, 0.3):
        got = np.asarray(B.oren_nayar_f(
            jnp.asarray(wos), jnp.asarray(wis),
            jnp.broadcast_to(jnp.asarray(n), (64, 3)),
            jnp.broadcast_to(jnp.asarray(albedo), (64, 3)),
            jnp.full((64,), sigma),
        ))
        for i in range(64):
            want = oren_nayar_oracle(wos[i], wis[i], n, albedo, sigma)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-6)


def test_oren_nayar_sigma0_is_lambert():
    """sigma = 0 reduces Oren-Nayar to albedo/pi."""
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 16)
    wos = jnp.asarray(_rand_dirs(16, upper=True))
    wis = jnp.asarray(_rand_dirs(16, upper=True))
    alb = jnp.full((16, 3), 0.7)
    f = np.asarray(B.oren_nayar_f(wos, wis, n, alb, jnp.zeros(16)))
    np.testing.assert_allclose(f, 0.7 / np.pi, rtol=1e-5)


def test_fresnel_vs_oracle():
    for eta in (1.5, 1.0 / 1.5, 2.4):
        cts = np.linspace(-1, 1, 41).astype(np.float32)
        got = np.asarray(B.fr_dielectric(jnp.asarray(cts), jnp.float32(eta)))
        for i, ct in enumerate(cts):
            np.testing.assert_allclose(got[i], fr_oracle(ct, eta), rtol=1e-4, atol=1e-6)


def test_fresnel_limits():
    # normal incidence: ((eta-1)/(eta+1))^2 ; grazing: -> 1
    eta = 1.5
    f0 = float(B.fr_dielectric(jnp.float32(1.0), jnp.float32(eta)))
    assert abs(f0 - ((eta - 1) / (eta + 1)) ** 2) < 1e-6
    fg = float(B.fr_dielectric(jnp.float32(1e-4), jnp.float32(eta)))
    assert fg > 0.99


def test_reflect():
    wo = jnp.asarray([[0.3, -0.2, 0.9]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    r = np.asarray(B.reflect_dir(wo, n))[0]
    np.testing.assert_allclose(r, [-0.3, 0.2, 0.9], atol=1e-6)


def test_refract_vs_oracle_and_tir():
    n = np.array([0.0, 0.0, 1.0], np.float32)
    for eta in (1.5, 1.33):
        wos = _rand_dirs(128)
        got, ok = B.refract_dir(jnp.asarray(wos), jnp.broadcast_to(jnp.asarray(n), (128, 3)), jnp.float32(eta))
        got, ok = np.asarray(got), np.asarray(ok)
        for i in range(128):
            want, valid = refract_oracle(wos[i], n, eta)
            assert bool(ok[i]) == valid
            if valid:
                np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_snells_law():
    """Refracted direction satisfies Snell's law for above-surface rays."""
    eta = 1.5
    wo = np.array([0.6, 0.0, 0.8], np.float32)
    wi, ok = B.refract_dir(jnp.asarray(wo[None]), jnp.asarray([[0.0, 0.0, 1.0]]), jnp.float32(eta))
    wi = np.asarray(wi)[0]
    assert bool(np.asarray(ok)[0])
    sin_i = np.linalg.norm(wo[:2]) / np.linalg.norm(wo)
    sin_t = np.linalg.norm(wi[:2]) / np.linalg.norm(wi)
    assert abs(sin_i - eta * sin_t) < 1e-5


def test_tr_functions_vs_oracle():
    ws = _rand_dirs(64, upper=True)
    for alpha in (0.05, 0.3, 0.9):
        d = np.asarray(B.tr_d(jnp.asarray(ws), jnp.full((64,), alpha)))
        lam = np.asarray(B.tr_lambda(jnp.asarray(ws), jnp.full((64,), alpha)))
        for i in range(64):
            np.testing.assert_allclose(d[i], tr_d_oracle(ws[i], alpha), rtol=2e-3, atol=1e-5)
            np.testing.assert_allclose(lam[i], tr_lambda_oracle(ws[i], alpha), rtol=2e-3, atol=1e-6)


def test_tr_d_normalization():
    """Integral of D(wm) cos(theta) over the hemisphere must be ~1."""
    alpha = 0.4
    n = 200000
    u = rng.random((n, 2)).astype(np.float32)
    # uniform hemisphere sampling
    z = u[:, 0]
    phi = 2 * np.pi * u[:, 1]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    wm = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    d = np.asarray(B.tr_d(jnp.asarray(wm), jnp.full((n,), alpha)))
    integral = (d * z).mean() * 2 * np.pi
    assert abs(integral - 1.0) < 0.02


def test_vndf_sampling_properties():
    """Sampled microfacet normals lie in the upper hemisphere and follow the
    VNDF: statistical check that E[G1 D dot(wo,wm)/cos_o / pdf] ~ 1 via
    self-normalization (weak but catches gross construction errors)."""
    alpha = 0.5
    n = 4096
    wo = np.array([0.4, 0.1, 0.91], np.float32)
    wo /= np.linalg.norm(wo)
    u = rng.random((n, 2)).astype(np.float32)
    wm = np.asarray(B.tr_sample_wm(
        jnp.broadcast_to(jnp.asarray(wo), (n, 3)), jnp.asarray(u), jnp.full((n,), alpha)))
    assert (wm[:, 2] > 0).all()
    norms = np.linalg.norm(wm, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # mean microfacet normal should tilt toward wo's azimuth
    mean = wm.mean(axis=0)
    assert mean[0] * wo[0] > 0


def test_tangent_frame_orthonormal():
    ns = jnp.asarray(_rand_dirs(64))
    t = np.asarray(B.build_tangent_frame(ns))
    b = np.asarray(B.cross(ns, jnp.asarray(t)))
    ns = np.asarray(ns)
    for i in range(64):
        assert abs(np.dot(t[i], ns[i])) < 1e-5
        assert abs(np.linalg.norm(t[i]) - 1) < 1e-5
        assert abs(np.dot(b[i], t[i])) < 1e-5


def test_tangent_frame_degenerate_y():
    t = np.asarray(B.build_tangent_frame(jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])))
    np.testing.assert_allclose(t, [[1, 0, 0], [1, 0, 0]], atol=1e-7)
