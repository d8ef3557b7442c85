"""Pallas resolve + tonemap kernel: the blit stage on-device.

ref: src/kernels/blit.wgsl:28-40 — resolve = rgb / max(alpha, 1), then the
Reinhard-style tonemap c*key/(1+c*key) with a luminance-lerp saturation.

Operates directly on the megakernel's plane state (16, TR, 128): reads the
three rgb_sum channels, divides by the sample count, tonemaps, and writes a
(3, TR, 128) image — so a full progressive render + present never leaves
the plane layout (the (P,3) conversion is only for interop/checkpoints).

The sample count is PER-PIXEL, exactly like the reference texture's alpha
channel (blit.wgsl:38 divides each pixel by its own count): wavefront
states mid-drain have non-uniform n_samples, and they resolve correctly
here.  Scalar counts (the megakernel's uniform case) broadcast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.tonemap import LUMA

N_CHANNELS = 16


def _kernel(key_sat_ref, planes_ref, ns_ref, out_ref):
    key = key_sat_ref[0, 0]
    sat = key_sat_ref[0, 1]
    # per-pixel resolve: rgb / max(alpha, 1) (ref: blit.wgsl:38).  True
    # division + the same op order as tonemap.resolve/tonemap — a
    # reciprocal-multiply here differs by an ulp, and v/(1+v) near v=-1
    # (negative out-of-gamut spectral sums) amplifies that ulp past any
    # sane tolerance; identical ops keep the kernel bit-exact vs jnp.
    n = jnp.maximum(ns_ref[...], 1.0)
    c = []
    for ch in range(3):
        v = (planes_ref[ch] / n) * key
        v = v / (1.0 + v)
        c.append(v)
    lum = c[0] * jnp.float32(LUMA[0]) + c[1] * jnp.float32(LUMA[1]) \
        + c[2] * jnp.float32(LUMA[2])
    for ch in range(3):
        out_ref[ch] = lum + sat * (c[ch] - lum)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tonemap_planes(planes, n_samples, key=0.8, saturation=1.0,
                   interpret: bool = False):
    """planes (C, TR, 128) + sample count -> tonemapped (3, TR, 128).

    n_samples may be a scalar (uniform count: the megakernel adds exactly
    one sample per pixel per step), a (TR, 128) plane, or a flat (TR*128,)
    vector — per-pixel counts match the reference texture's per-pixel
    alpha (blit.wgsl:38), which wavefront-accumulated states need.
    """
    C, TR, _ = planes.shape
    R = min(TR, 256)
    while TR % R:
        R -= 1
    n_tiles = TR // R
    key_sat = jnp.asarray([key, saturation], jnp.float32).reshape(1, 2)
    ns = jnp.asarray(n_samples, jnp.float32)
    if ns.ndim == 0:
        ns = jnp.full((TR, 128), ns, jnp.float32)
    else:
        ns = ns.reshape(TR, 128)
    return pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, R, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, R, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, TR, 128), jnp.float32),
        interpret=interpret,
    )(key_sat, planes, ns)


def image_from_planes(cfg, planes, n_samples, key=None, saturation=None,
                      interpret: bool | None = None):
    """Tonemapped (H, W, 3) image straight from plane state."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from tpurt.kernels.mega_pallas import planes_pixel_order
    out = tonemap_planes(
        planes, n_samples,
        cfg.tonemap_key if key is None else key,
        cfg.tonemap_saturation if saturation is None else saturation,
        interpret=interpret)
    flat = planes_pixel_order(cfg, out.reshape(3, -1))[:, : cfg.n_pixels]
    return jnp.transpose(flat).reshape(cfg.height, cfg.width, 3)


def resolve_state_pallas(cfg, state, key=None, saturation=None,
                         interpret: bool | None = None):
    """render.resolve_image, but through the Pallas blit kernel: resolves a
    RenderState (linear pixel order, per-pixel n_samples) on-device.
    Correct for wavefront states whose sample counts are non-uniform
    mid-drain (ref: blit.wgsl:38 per-pixel alpha divide)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = state.rgb_sum.shape[0]
    planes = jnp.transpose(state.rgb_sum).reshape(3, P // 128, 128)
    out = tonemap_planes(
        planes, state.n_samples,
        cfg.tonemap_key if key is None else key,
        cfg.tonemap_saturation if saturation is None else saturation,
        interpret=interpret)
    flat = out.reshape(3, P)[:, : cfg.n_pixels]
    return jnp.transpose(flat).reshape(cfg.height, cfg.width, 3)
