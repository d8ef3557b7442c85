"""Resolve + tonemap: the blit stage (ref: src/kernels/blit.wgsl:28-40).

resolve: average = rgb_sum / max(sample_count, 1)
tonemap: c = avg*key; c = c/(1+c); saturation lerp around Rec.709 luminance.
Pure jnp; also reused inside the Pallas tonemap kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

LUMA = (0.2126, 0.7152, 0.0722)


def resolve(rgb_sum, n_samples):
    return rgb_sum / jnp.maximum(n_samples, 1.0)[..., None]


def tonemap(avg, key=0.8, saturation=1.0):
    c = avg * key
    c = c / (1.0 + c)
    lum = (
        c[..., 0] * LUMA[0] + c[..., 1] * LUMA[1] + c[..., 2] * LUMA[2]
    )[..., None]
    return lum + saturation * (c - lum)
