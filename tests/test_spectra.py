"""Spectral machinery vs scalar NumPy oracles (mega_kernel.wgsl:434-458,
260-263; spectrum.rs:270-295)."""

import numpy as np
import jax.numpy as jnp

from tpurt.ops import spectra as S


def blackbody_oracle(lam_nm, temp):
    h, c, k = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    c1 = 2.0 * h * c * c
    c2 = h * c / k
    l = lam_nm * 1e-9
    return c1 / (l ** 5 * (np.exp(c2 / (l * temp)) - 1.0)) * 1e-14


def cie_oracle(lam_nm):
    t = (lam_nm - 380.0) / 5.0
    i = int(t)
    f = t - i
    a, b = min(i, 80), min(i + 1, 80)
    x = S.CIE_X[a] * (1 - f) + S.CIE_X[b] * f
    y = S.CIE_Y[a] * (1 - f) + S.CIE_Y[b] * f
    z = S.CIE_Z[a] * (1 - f) + S.CIE_Z[b] * f
    return S.XYZ_TO_SRGB @ np.array([x, y, z])


def test_blackbody_matches_oracle():
    lams = jnp.asarray([380.0, 471.3, 555.0, 650.0, 779.9])
    for T in (1500.0, 3200.0, 5500.0, 6500.0):
        got = np.asarray(S.blackbody(lams, T))
        want = blackbody_oracle(np.asarray(lams, np.float64), T)
        np.testing.assert_allclose(got, want, rtol=2e-4)


def test_blackbody_peak_wien():
    # Wien displacement: peak of Planck's law at ~2.898e6/T nm.
    lams = jnp.linspace(380.0, 780.0, 4001)
    for T in (4500.0, 5500.0, 7000.0):
        vals = np.asarray(S.blackbody(lams, T))
        peak = float(lams[vals.argmax()])
        expected = 2.8977719e6 / T
        if 380 < expected < 780:
            assert abs(peak - expected) < 5.0


def test_cie_to_rgb_matches_oracle():
    for lam in (380.0, 385.0, 433.7, 555.0, 700.2, 779.0):
        got = np.asarray(S.cie_to_rgb(jnp.asarray([lam])))[0]
        want = cie_oracle(lam)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_cie_integrates_to_white():
    """Equal-energy spectrum integrated over the visible range must land near
    the sRGB white point direction (E -> roughly equal rgb)."""
    lams = jnp.linspace(380.0, 779.999, 2000)
    rgb = np.asarray(S.cie_to_rgb(lams)).mean(axis=0) * 400.0  # * range / n
    assert (rgb > 0).all()
    # E illuminant in sRGB: channels within ~25% of each other
    assert rgb.max() / rgb.min() < 1.35


def test_cauchy_ior():
    got = float(S.cauchy_ior(jnp.float32(1.5), jnp.float32(500.0)))
    want = 1.5 + 0.004 / (0.5 ** 2)
    assert abs(got - want) < 1e-6
    # dispersion: blue bends more than red
    nb = float(S.cauchy_ior(jnp.float32(1.5), jnp.float32(400.0)))
    nr = float(S.cauchy_ior(jnp.float32(1.5), jnp.float32(700.0)))
    assert nb > nr


def test_sample_wavelength_range():
    u = jnp.asarray([0.0, 0.5, 0.999999])
    lam = np.asarray(S.sample_wavelength(u))
    assert lam[0] == 380.0 and abs(lam[1] - 580.0) < 1e-3 and lam[2] < 780.0
