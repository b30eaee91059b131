"""Bit-identity of the vectorized _quad (round 5) vs the scalar
original it replaced — BVH builds, goldens, and parity all key off these
f64 values, so the vectorization must be EXACT, not approximate."""

import numpy as np

from wgpu_path_tracing_tpu.models.procedural import _quad


def _quad_scalar_reference(p0, p1, p2, p3, tess=1):
    """The pre-round-5 per-cell loop, verbatim."""
    p0, p1, p2, p3 = (np.asarray(p, np.float64) for p in (p0, p1, p2, p3))
    n = np.cross(p1 - p0, p3 - p0)
    n = n / np.linalg.norm(n)
    tris, uvs = [], []
    for i in range(tess):
        for j in range(tess):
            u0, u1 = i / tess, (i + 1) / tess
            v0_, v1_ = j / tess, (j + 1) / tess

            def pt(u, v):
                return (
                    p0 * (1 - u) * (1 - v)
                    + p1 * u * (1 - v)
                    + p2 * u * v
                    + p3 * (1 - u) * v
                )

            a, b, c, d = pt(u0, v0_), pt(u1, v0_), pt(u1, v1_), pt(u0, v1_)
            tris.append((a, b, c))
            uvs.append(((u0, v0_), (u1, v0_), (u1, v1_)))
            tris.append((a, c, d))
            uvs.append(((u0, v0_), (u1, v1_), (u0, v1_)))
    return tris, uvs, n


def test_quad_vectorization_bit_identical():
    rng = np.random.default_rng(11)
    for tess in (1, 2, 3, 7, 13):
        ps = rng.normal(0, 2, (4, 3))
        # keep the quad planar-ish but arbitrary: any 4 points are fine,
        # the math is pure bilinear interpolation
        got_t, got_u, got_n = _quad(*ps, tess=tess)
        ref_t, ref_u, ref_n = _quad_scalar_reference(*ps, tess=tess)
        np.testing.assert_array_equal(got_n, ref_n)
        assert got_t.shape == (2 * tess * tess, 3, 3)
        for k in range(got_t.shape[0]):
            a, b, c = ref_t[k]
            np.testing.assert_array_equal(got_t[k, 0], a, err_msg=f"k={k}")
            np.testing.assert_array_equal(got_t[k, 1], b, err_msg=f"k={k}")
            np.testing.assert_array_equal(got_t[k, 2], c, err_msg=f"k={k}")
            np.testing.assert_array_equal(
                got_u[k], np.asarray(ref_u[k], np.float64),
                err_msg=f"uv k={k}")


def test_quad_uv_order_matches_scalar():
    # uv corner ORDER matters (barycentric interpolation + RNG-pinned
    # texel choice): check the exact tuples for a 2x2 tessellation.
    t, u, n = _quad((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), tess=2)
    # cell (0,0) first tri: (u0,v0),(u1,v0),(u1,v1) = (0,0),(.5,0),(.5,.5)
    np.testing.assert_array_equal(u[0], [[0, 0], [0.5, 0], [0.5, 0.5]])
    # cell (0,0) second tri: (u0,v0),(u1,v1),(u0,v1)
    np.testing.assert_array_equal(u[1], [[0, 0], [0.5, 0.5], [0, 0.5]])
    # cell (0,1) follows (j-minor), then cell (1,0) (i-major)
    np.testing.assert_array_equal(u[2], [[0, 0.5], [0.5, 0.5], [0.5, 1]])
    np.testing.assert_array_equal(u[4], [[0.5, 0], [1, 0], [1, 0.5]])
