"""Bit-exact tests of the PCG RXS-M-XS 32/32 generator against a NumPy
scalar oracle implementing the reference hash (mega_kernel.wgsl:655-675)."""

import numpy as np
import jax.numpy as jnp

from tpurt.ops import rng as R


def pcg_oracle(state: int):
    """Scalar reference implementation (uint32 semantics via Python ints)."""
    M = 0xFFFFFFFF
    old = state & M
    shift = ((old >> 28) + 4) & 31
    res = (((old >> shift) ^ old) * 277803737) & M
    out = ((res >> 22) ^ res) & M
    new = (old * 747796405 + 2891336453) & M
    return out, new


def test_rand_u32_bit_exact():
    states = np.array([0, 1, 42, 0xDEADBEEF, 0xFFFFFFFF, 1203793 * 7 + 12345],
                      dtype=np.uint32)
    out, new = R.rand_u32(jnp.asarray(states))
    for i, s in enumerate(states):
        o_exp, n_exp = pcg_oracle(int(s))
        assert int(out[i]) == o_exp, f"output mismatch at state {s:#x}"
        assert int(new[i]) == n_exp, f"state mismatch at state {s:#x}"


def test_rand_u32_sequence():
    s = np.uint32(12345)
    state = jnp.asarray([s])
    oracle_state = int(s)
    for _ in range(100):
        out, state = R.rand_u32(state)
        o_exp, oracle_state = pcg_oracle(oracle_state)
        assert int(out[0]) == o_exp


def test_rand_1f_matches_wgsl_scaling():
    # f32(0xFFFFFFFFu) rounds to 2^32 in f32, so the scale is exactly 2^-32.
    state = jnp.asarray([7], dtype=jnp.uint32)
    val, _ = R.rand_1f(state)
    o_exp, _ = pcg_oracle(7)
    expected = np.float32(o_exp) * np.float32(1.0 / 4294967296.0)
    assert np.float32(val[0]) == expected


def test_rand_1f_range_and_uniformity():
    state = R.seed_pixels(99, jnp.arange(100000), jnp.zeros(100000, jnp.int32))
    u, _ = R.rand_1f(state)
    u = np.asarray(u)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.01


def test_seed_pixels_matches_reference_stream():
    # seed + 1203793*x + 7*y with uint32 wraparound (mega_kernel.wgsl:991)
    s = R.seed_pixels(0xFFFFFFF0, jnp.asarray([3000]), jnp.asarray([2000]))
    expected = (0xFFFFFFF0 + 1203793 * 3000 + 7 * 2000) & 0xFFFFFFFF
    assert int(s[0]) == expected


def test_unit_vec_distribution():
    state = R.seed_pixels(5, jnp.arange(50000), jnp.zeros(50000, jnp.int32))
    v, _ = R.rand_unit_vec(state)
    v = np.asarray(v)
    n = np.linalg.norm(v, axis=-1)
    assert np.allclose(n, 1.0, atol=1e-5)
    # Mean should vanish for a uniform sphere distribution.
    assert np.abs(v.mean(axis=0)).max() < 0.02


def test_strata_window_must_be_power_of_two():
    """Non-power-of-two windows would REPEAT cell epochs (biased photon
    estimate) under the bitmask windowing — loud error instead."""
    import pytest

    from tpurt import RenderConfig
    from tpurt.ops.rng import strata_epoch

    cfg = RenderConfig(width=8, height=8, photon_strata=16,
                       photon_strata_window=12)
    with pytest.raises(ValueError, match="power of two"):
        strata_epoch(cfg, 5)
    ok = RenderConfig(width=8, height=8, photon_strata=16,
                      photon_strata_window=8)
    assert int(strata_epoch(ok, 13)) == 8
