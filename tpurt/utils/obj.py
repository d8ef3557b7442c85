"""Minimal Wavefront OBJ loader (positions + triangulated faces).

Equivalent capability to the reference's tobj usage with single_index +
triangulate (ref: src/instance.rs:56-106): only vertex positions matter to
this renderer (no normals/uvs are consumed by the kernels), polygon faces are
fan-triangulated, and 1-based / negative indices are handled per the spec.
"""

from __future__ import annotations

import numpy as np


def parse_obj(path: str):
    """Returns (positions (V, 3) float32, indices (T, 3) int32).

    Uses the native C++ parser when native/libtpurt_native.so is present
    (identical output — see tests/test_native.py); pure Python otherwise.
    """
    from tpurt.utils.native import parse_obj_native
    nat = parse_obj_native(path)
    if nat is not None:
        return nat
    positions: list[list[float]] = []
    faces: list[tuple[int, int, int]] = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if parts[0] == "v" and len(parts) >= 4:
                positions.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "f" and len(parts) >= 4:
                idx = []
                for tok in parts[1:]:
                    vi = tok.split("/")[0]
                    i = int(vi)
                    idx.append(i - 1 if i > 0 else len(positions) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0], idx[k], idx[k + 1]))
    if not positions:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return (
        np.asarray(positions, np.float32),
        np.asarray(faces, np.int32).reshape(-1, 3),
    )
