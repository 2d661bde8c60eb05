"""Native (C++) layer: parity with the NumPy/Python fallbacks.

The native builder/parser must be drop-in identical — the NumPy BVH builder
(ops/bvh.py) and the Python OBJ parser (io/obj.py) are the behavioral spec.
"""
import os
import shutil

import numpy as np
import pytest

from rayzath_tpu import native
from rayzath_tpu.io.load_result import LoadResult
from rayzath_tpu.io.obj import parse_obj, _parse_obj_py
from rayzath_tpu.ops.bvh import (FlatBVH, build_bvh, build_bvh_numpy,
                                 validate_bvh)


def test_native_available_when_toolchain_present():
    if shutil.which("g++") is None:
        pytest.skip("no g++ in environment")
    assert native.available(), "native library should build with g++ present"


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library unavailable")


@needs_native
@pytest.mark.parametrize("n,leaf", [(1, 8), (7, 8), (9, 2), (100, 8),
                                    (1000, 8), (5000, 4)])
def test_bvh_native_identical_to_numpy(n, leaf):
    rng = np.random.default_rng(n)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 1.0, (n, 3)).astype(np.float32)
    pmin, pmax = c - h, c + h
    out = native.bvh_build(pmin, pmax, leaf, 31)
    assert out is not None
    bn = FlatBVH(*out)
    bp = build_bvh_numpy(pmin, pmax, leaf_size=leaf)
    validate_bvh(bn, pmin, pmax)
    assert bn.n_nodes == bp.n_nodes
    np.testing.assert_array_equal(bn.node_begin, bp.node_begin)
    np.testing.assert_array_equal(bn.node_count, bp.node_count)
    np.testing.assert_array_equal(bn.node_axis, bp.node_axis)
    np.testing.assert_array_equal(bn.order, bp.order)
    np.testing.assert_allclose(bn.node_min, bp.node_min)
    np.testing.assert_allclose(bn.node_max, bp.node_max)


@needs_native
def test_bvh_degenerate_identical_centroids():
    # all centroids equal -> median-split fallback path
    n = 40
    pmin = np.zeros((n, 3), np.float32)
    pmax = np.ones((n, 3), np.float32)
    bn = FlatBVH(*native.bvh_build(pmin, pmax, 8, 31))
    bp = build_bvh_numpy(pmin, pmax)
    validate_bvh(bn, pmin, pmax)
    np.testing.assert_array_equal(bn.order, bp.order)
    np.testing.assert_array_equal(bn.node_count, bp.node_count)


@needs_native
def test_bvh_empty():
    bn = FlatBVH(*native.bvh_build(np.zeros((0, 3), np.float32),
                                   np.zeros((0, 3), np.float32), 8, 31))
    assert bn.n_nodes == 1
    assert bn.node_count[0] == 0


def test_build_bvh_dispatch_matches_numpy():
    # public build_bvh (native when available) must agree with the oracle
    rng = np.random.default_rng(7)
    c = rng.uniform(-5, 5, (321, 3)).astype(np.float32)
    pmin, pmax = c - 0.1, c + 0.1
    a = build_bvh(pmin, pmax)
    b = build_bvh_numpy(pmin, pmax)
    np.testing.assert_array_equal(a.order, b.order)
    np.testing.assert_array_equal(a.node_begin, b.node_begin)


OBJ_TEXT = """
mtllib lib.mtl
o first
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1
g second
v 2 0 0
v 3 0 0
v 2 1 0
v 3 1 0
usemtl blue
usemtl red
f 4 5 6 7
f -1 -2 -3
f 1//1 2//1 3//1
vn 0 0 0
v bad vertex
f 1 2
f 99 100 101
unknown_stmt 1 2
unknown_stmt 3
"""


@needs_native
def test_obj_native_identical_to_python(tmp_path):
    p = tmp_path / "scene.obj"
    p.write_text(OBJ_TEXT)
    rn, rp = LoadResult(), LoadResult()
    mn, ln = parse_obj(str(p), rn)          # dispatches to native
    mp, lp = _parse_obj_py(str(p), rp)      # spec
    assert ln == lp
    assert len(mn) == len(mp) == 2
    for a, b in zip(mn, mp):
        assert a.mesh.name == b.mesh.name
        assert a.material_slots == b.material_slots
        for f in ("vertices", "texcrds", "normals",
                  "tri_v", "tri_t", "tri_n", "tri_mat"):
            np.testing.assert_array_equal(getattr(a.mesh, f),
                                          getattr(b.mesh, f), err_msg=f)
    # same number of diagnostics (native formats match the python messages)
    assert len(rn.errors) == len(rp.errors)
    assert len(rn.warnings) == len(rp.warnings)


@needs_native
def test_obj_native_statement_before_object(tmp_path):
    p = tmp_path / "s.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\no late\nf 1 2 3\n")
    rn, rp = LoadResult(), LoadResult()
    mn, _ = parse_obj(str(p), rn)
    mp, _ = _parse_obj_py(str(p), rp)
    assert len(mn) == len(mp) == 1
    np.testing.assert_array_equal(mn[0].mesh.tri_v, mp[0].mesh.tri_v)
    np.testing.assert_array_equal(mn[0].mesh.vertices, mp[0].mesh.vertices)
    assert len(rn.warnings) == len(rp.warnings) == 1


def test_rz_native_env_disables(monkeypatch, tmp_path):
    # RZ_NATIVE=0 forces the fallback without breaking anything
    monkeypatch.setenv("RZ_NATIVE", "0")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.get_lib() is None
    pmin = np.zeros((4, 3), np.float32)
    pmax = np.ones((4, 3), np.float32)
    b = build_bvh(pmin, pmax)   # falls back to numpy
    validate_bvh(b, pmin, pmax)
