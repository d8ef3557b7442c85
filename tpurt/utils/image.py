"""Image output: PNG (stdlib-zlib, no external deps) and PPM writers.

The reference presents via a swapchain (ref: src/blit.rs); this renderer is
offline-first, so "present" = encode the tonemapped frame to disk.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_srgb8(img_linear: np.ndarray) -> np.ndarray:
    """Linear [0,1] float -> sRGB-encoded uint8 (the swapchain's sRGB format
    did this conversion implicitly in the reference, ref: lib.rs:166-171)."""
    x = np.clip(np.asarray(img_linear, np.float32), 0.0, 1.0)
    srgb = np.where(x <= 0.0031308, 12.92 * x, 1.055 * np.power(x, 1.0 / 2.4) - 0.055)
    return (srgb * 255.0 + 0.5).astype(np.uint8)


def png_bytes(img: np.ndarray, assume_srgb8: bool = False) -> bytes:
    """Encode (H, W, 3) image as PNG bytes. Float input is treated as
    linear RGB and sRGB-encoded; uint8 input is encoded as-is."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = to_srgb8(img)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)

    raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))
    compressed = zlib.compress(raw, 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", compressed) + chunk(b"IEND", b""))


def write_png(path: str, img: np.ndarray, assume_srgb8: bool = False) -> None:
    """Write (H, W, 3) image to PNG (see png_bytes)."""
    with open(path, "wb") as f:
        f.write(png_bytes(img, assume_srgb8))


def write_pfm(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) float32 linear radiance to PFM (HDR, no deps; the
    companion of render.resolve_radiance). PFM stores rows bottom-to-top;
    negative scale declares little-endian."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"write_pfm needs (H, W, 3) or (H, W), got {img.shape}")
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"PF\n{w} {h}\n-1.0\n".encode())
        f.write(np.ascontiguousarray(img[::-1]).astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    """Read a PFM written by write_pfm back to (H, W, 3) float32."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"PF", "only 3-channel PF supported"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, 3)[::-1].astype(np.float32)
    if abs(scale) != 1.0:  # spec: |scale| multiplies the stored samples
        img = img * np.float32(abs(scale))
    return img


def write_ppm(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) image to binary PPM (P6)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = to_srgb8(img)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())
