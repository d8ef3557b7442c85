"""Native C++ runtime (native/libtpurt_native.so) vs NumPy reference parity.

The native BVH builder and OBJ parser must produce BIT-IDENTICAL output to
the Python implementations (tpurt/accel.py, tpurt/utils/obj.py) — same
median splits, same stable-sort ordering, same node numbering. The suite
builds the library on the fly if g++ is available and the .so is missing.
"""

import os
import pathlib
import shutil
import subprocess
import textwrap

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def native_lib():
    so = REPO / "native" / "libtpurt_native.so"
    if not so.exists():
        if shutil.which("g++") is None:
            pytest.skip("no native library and no g++")
        subprocess.run(["make", "-C", str(REPO / "native")], check=True,
                       capture_output=True)
    from tpurt.utils import native
    native._TRIED = False
    native._LIB = None
    lib = native.load()
    if lib is None:
        pytest.skip("native library failed to load")
    return lib


def _numpy_bvh(tri_min, tri_max, max_prims):
    os.environ["TPURT_NO_NATIVE"] = "1"
    try:
        from tpurt import accel
        return accel.build_bvh(tri_min, tri_max, max_prims)
    finally:
        del os.environ["TPURT_NO_NATIVE"]


def _numpy_sah_build(tri_min, tri_max, max_prims):
    os.environ["TPURT_NO_NATIVE"] = "1"
    try:
        from tpurt import accel
        return accel.build_bvh(tri_min, tri_max, max_prims, sah=True)
    finally:
        del os.environ["TPURT_NO_NATIVE"]


class TestNativeBVH:
    @pytest.mark.parametrize("n_tris,max_prims", [(1, 2), (7, 1), (64, 2),
                                                  (333, 4), (2048, 2)])
    def test_bit_identical_to_numpy(self, native_lib, n_tris, max_prims):
        from tpurt.utils.native import build_bvh_native
        rng = np.random.default_rng(n_tris)
        lo = rng.uniform(-10, 10, (n_tris, 3)).astype(np.float32)
        ext = rng.uniform(0, 2, (n_tris, 3)).astype(np.float32)
        tri_min, tri_max = lo, (lo + ext).astype(np.float32)

        ref = _numpy_bvh(tri_min, tri_max, max_prims)
        nat = build_bvh_native(tri_min, tri_max, max_prims)
        assert nat is not None
        bbox_min, bbox_max, left, right, first, count, order = nat
        np.testing.assert_array_equal(bbox_min, ref.bbox_min)
        np.testing.assert_array_equal(bbox_max, ref.bbox_max)
        np.testing.assert_array_equal(left, ref.left)
        np.testing.assert_array_equal(right, ref.right)
        np.testing.assert_array_equal(first, ref.first)
        np.testing.assert_array_equal(count, ref.count)
        np.testing.assert_array_equal(order, ref.order)

    def test_invariants_hold(self, native_lib):
        from tpurt import accel
        rng = np.random.default_rng(0)
        lo = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
        tri_min, tri_max = lo, (lo + 0.5).astype(np.float32)
        bvh = accel.build_bvh(tri_min, tri_max, 2)  # native path
        accel.validate_bvh(bvh, tri_min, tri_max)


class TestNativeSahBVH:
    """The binned-SAH builder's C++ twin must be bit-identical to
    accel._build_bvh_py(sah=True) — same bin costs (float64), same
    float32-area median candidate, same tie-breaking and partitions."""

    def _mesh(self, trial, n_tris, rng):
        kind = trial % 4
        if kind == 0:   # uniform
            c = rng.uniform(-10, 10, (n_tris, 3)).astype(np.float32)
        elif kind == 1:  # clustered: SAH should win many splits
            centers = rng.uniform(-50, 50, (max(1, n_tris // 20), 3))
            c = (centers[rng.integers(0, len(centers), n_tris)]
                 + rng.normal(0, 0.5, (n_tris, 3))).astype(np.float32)
        elif kind == 2:  # degenerate: all centroids identical
            c = np.tile(rng.uniform(-1, 1, (1, 3)),
                        (n_tris, 1)).astype(np.float32)
        else:            # collinear along x
            c = np.zeros((n_tris, 3), np.float32)
            c[:, 0] = np.linspace(0, 100, n_tris)
        h = rng.uniform(0.01, 2.0, (n_tris, 3)).astype(np.float32)
        return (c - h).astype(np.float32), (c + h).astype(np.float32)

    @pytest.mark.parametrize("trial,n_tris,max_prims",
                             [(0, 200, 2), (1, 333, 4), (2, 64, 2),
                              (3, 128, 1), (1, 900, 64), (0, 1, 2)])
    def test_bit_identical_to_numpy_sah(self, native_lib, trial, n_tris,
                                        max_prims):
        from tpurt import accel
        from tpurt.utils.native import build_bvh_native
        rng = np.random.default_rng(1000 * trial + n_tris)
        tri_min, tri_max = self._mesh(trial, n_tris, rng)

        ref = accel._build_bvh_py(tri_min, tri_max, max_prims, sah=True)
        nat = build_bvh_native(tri_min, tri_max, max_prims, sah=True)
        assert nat is not None
        for got, want in zip(nat, (ref.bbox_min, ref.bbox_max, ref.left,
                                   ref.right, ref.first, ref.count,
                                   ref.order)):
            np.testing.assert_array_equal(got, want)

    def test_build_bvh_sah_dispatches_native(self, native_lib):
        """accel.build_bvh(sah=True) uses the native builder and still
        honors the node-count envelope / validity invariants."""
        from tpurt import accel
        rng = np.random.default_rng(7)
        tri_min, tri_max = self._mesh(1, 400, rng)
        bvh = accel.build_bvh(tri_min, tri_max, 4, sah=True)
        accel.validate_bvh(bvh, tri_min, tri_max)
        ref = _numpy_sah_build(tri_min, tri_max, 4)
        np.testing.assert_array_equal(bvh.bbox_min, ref.bbox_min)
        np.testing.assert_array_equal(bvh.order, ref.order)


class TestNativeObj:
    def test_matches_python_parser(self, native_lib, tmp_path):
        obj = textwrap.dedent("""\
            # comment
            v 0.0 0.0 0.0
            v 1.0 0.0 0.0
            v 1.0 1.0 0.0
            v 0.0 1.0 0.0
            v 0.0 0.0 1.0
            f 1 2 3 4
            f 1/2/3 2/4 5//6
            f -3 -2 -1
        """)
        p = tmp_path / "quad.obj"
        p.write_text(obj)

        from tpurt.utils.native import parse_obj_native
        nat_pos, nat_idx = parse_obj_native(str(p))

        os.environ["TPURT_NO_NATIVE"] = "1"
        try:
            from tpurt.utils import obj as objmod
            ref_pos, ref_idx = objmod.parse_obj(str(p))
        finally:
            del os.environ["TPURT_NO_NATIVE"]

        np.testing.assert_array_equal(nat_pos, ref_pos)
        np.testing.assert_array_equal(nat_idx, ref_idx)
        assert nat_idx.shape == (2 + 1 + 1, 3)  # quad fan + tri + tri


def test_obj_malformed_inputs_match_python(tmp_path):
    """The C++ parser must never silently mis-index where the Python parser
    raises: on any token Python rejects, the native open fails and the
    fallback raises the identical error (review finding: strtol returned 0
    for garbage tokens -> index one past the last vertex)."""
    import numpy as np
    import pytest

    from tpurt.utils.native import parse_obj_native
    from tpurt.utils.obj import parse_obj

    # well-formed edge cases stay native-parsed and identical
    good = tmp_path / "good.obj"
    good.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                    "# comment\n"
                    "f 1/2/3 2//1 3/4\n"      # slash forms
                    "f -1 -2 -3\n"            # negative indices
                    "f 1 2\n")                # degenerate: skipped, no tris
    nat = parse_obj_native(str(good))
    assert nat is not None
    pos, idx = parse_obj(str(good))
    np.testing.assert_array_equal(pos, nat[0])
    np.testing.assert_array_equal(idx, nat[1])
    assert idx.shape == (2, 3)

    # malformed face index: Python raises ValueError; native must defer
    # (return None) so parse_obj raises the same way, not mis-index
    bad_face = tmp_path / "bad_face.obj"
    bad_face.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf a b c\n")
    assert parse_obj_native(str(bad_face)) is None
    with pytest.raises(ValueError):
        parse_obj(str(bad_face))

    # malformed vertex float on a full 3-coordinate line: same contract
    bad_vert = tmp_path / "bad_vert.obj"
    bad_vert.write_text("v 0 zero 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    assert parse_obj_native(str(bad_vert)) is None
    with pytest.raises(ValueError):
        parse_obj(str(bad_vert))

    # a face line Python SKIPS (< 3 vertex tokens) must not fail natively,
    # even with a garbage token
    skip = tmp_path / "skip.obj"
    skip.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 a\nf 1 2 3\n")
    nat = parse_obj_native(str(skip))
    assert nat is not None
    pos, idx = parse_obj(str(skip))
    np.testing.assert_array_equal(idx, nat[1])
    assert idx.shape == (1, 3)

    # >8191-char polygon line: native defers to Python (no line cap there)
    long_line = tmp_path / "long.obj"
    nv = 2400
    verts = "".join(f"v {i} 0 0\n" for i in range(1, nv + 1))
    long_line.write_text(verts + "f " + " ".join(
        str(i) for i in range(1, nv + 1)) + "\n")
    assert parse_obj_native(str(long_line)) is None
    pos, idx = parse_obj(str(long_line))
    assert idx.shape == (nv - 2, 3)
