"""Native (C++) BVH builder must be bit-identical to the NumPy builder."""

import time

import numpy as np
import pytest

from wgpu_path_tracing_tpu.accel.bvh import build_bvh as build_numpy
from wgpu_path_tracing_tpu.accel import native

requires_native = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def _tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    v1 = base + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    v2 = base + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    return base, v1, v2


@requires_native
@pytest.mark.parametrize("n", [1, 4, 5, 37, 1000, 20000])
def test_native_matches_numpy(n):
    v0, v1, v2 = _tris(n, seed=n)
    a = build_numpy(v0, v1, v2)
    b = native.build_bvh_native(v0, v1, v2)
    assert a.num_nodes == b.num_nodes
    np.testing.assert_array_equal(a.meta, b.meta)
    np.testing.assert_array_equal(a.order, b.order)
    np.testing.assert_array_equal(a.aabb_min, b.aabb_min)
    np.testing.assert_array_equal(a.aabb_max, b.aabb_max)


@requires_native
def test_native_is_faster_at_scale():
    v0, v1, v2 = _tris(120_000, seed=7)
    t0 = time.perf_counter()
    b = native.build_bvh_native(v0, v1, v2)
    native_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    a = build_numpy(v0, v1, v2)
    numpy_s = time.perf_counter() - t0
    np.testing.assert_array_equal(a.meta, b.meta)
    # The point of the native path: meaningful speedup on big scenes.
    assert native_s < numpy_s, (native_s, numpy_s)


@requires_native
def test_dispatcher_prefers_native():
    v0, v1, v2 = _tris(100)
    out = native.build_bvh(v0, v1, v2)
    ref = build_numpy(v0, v1, v2)
    np.testing.assert_array_equal(out.meta, ref.meta)
