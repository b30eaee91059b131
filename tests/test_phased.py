"""Phased flat-group intersector correctness (ops/phased.py) — interpret
mode on CPU against the brute-force reference. The kernel shares the walk's
leaf slab table (accel/bvh8.py) but consumes it flat: all sub-cluster gate
tests in one vector phase, then fori-looped Möller-Trumbore in ascending
group order. Small block sizes force multiple grid steps; k_groups variants
exercise the loop-unroll tiling (padding groups must never contribute)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wgpu_path_tracing_tpu.models.procedural import cornell_box, random_triangles
from wgpu_path_tracing_tpu.models.types import pack_device_scene
from wgpu_path_tracing_tpu.ops.phased import closest_hit_phased
from wgpu_path_tracing_tpu.ops.intersect import closest_hit_brute


@pytest.fixture(scope="module")
def scene():
    return pack_device_scene(random_triangles(1500, seed=5))


def _aimed_rays(tri_isect, n, seed=1):
    rng = np.random.default_rng(seed)
    tri = np.asarray(tri_isect)
    cent = tri[:, 0:3] + (tri[:, 3:6] + tri[:, 6:9]) / 3.0
    tgt = cent[rng.integers(0, len(tri), n)]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(tgt - d * 14, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("bn,k_groups", [(256, 4), (256, 8), (1024, 16)])
def test_phased_matches_brute(scene, bn, k_groups):
    ro, rd = _aimed_rays(scene["tri_isect"], 1024)
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_p, i_p = closest_hit_phased(
        jnp.asarray(scene["walk_tris"]),
        ro,
        rd,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        bn=bn,
        k_groups=k_groups,
    )
    i_b, i_p, t_b, t_p = map(np.asarray, (i_b, i_p, t_b, t_p))
    hb = i_b >= 0
    np.testing.assert_array_equal(hb, i_p >= 0)
    assert hb.sum() > 900
    # Exact-t ties are group-order-dependent; everywhere else indices match.
    diff = i_b != i_p
    np.testing.assert_array_equal(t_b[diff], t_p[diff])
    np.testing.assert_allclose(t_b[hb], t_p[hb], rtol=1e-4, atol=1e-5)


def test_phased_shadow_limit(scene):
    """t_max semantics: the limit gates sub-box ENTRY only (phased.py:29
    — hits beyond t_max inside an admitted box may still be reported;
    any-hit callers compare t < t_max themselves), so the testable
    direction is the generous one: a limit that covers brute's closest
    hit must reproduce it, and brute-miss lanes must stay misses under
    a tiny limit."""
    ro, rd = _aimed_rays(scene["tri_isect"], 512, seed=7)
    nt = scene["tri_isect"].shape[0]
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_b, i_b = np.asarray(t_b), np.asarray(i_b)
    hb = i_b >= 0
    t_max = jnp.asarray(np.where(hb, t_b * 1.5, 1e-3), jnp.float32)
    t_p, i_p = closest_hit_phased(
        jnp.asarray(scene["walk_tris"]), ro, rd,
        active=jnp.ones((512,), bool), t_max=t_max,
        num_tris=nt, interpret=True, bn=256,
    )
    i_p = np.asarray(i_p)
    t_p = np.asarray(t_p)
    within = hb & (t_b <= np.asarray(t_max))
    assert within.any(), "fixture produced no hits — assertion vacuous"
    # Exact-t razor ties are group-order-dependent, as in the main test.
    diff = (i_p != i_b) & within
    np.testing.assert_array_equal(t_b[diff], t_p[diff])
    np.testing.assert_allclose(t_b[within], t_p[within],
                               rtol=1e-4, atol=1e-5)
    assert (i_p[~hb] == -1).all()


def test_phased_respects_active(scene):
    ro, rd = _aimed_rays(scene["tri_isect"], 512, seed=3)
    nt = scene["tri_isect"].shape[0]
    act = jnp.asarray(np.random.default_rng(0).uniform(size=512) < 0.5)
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_p, i_p = closest_hit_phased(
        jnp.asarray(scene["walk_tris"]), ro, rd, active=act,
        num_tris=nt, interpret=True, bn=256,
    )
    a = np.asarray(act)
    i_b, i_p, t_p = map(np.asarray, (i_b, i_p, t_p))
    diff = (i_b != i_p) & a
    np.testing.assert_array_equal(np.asarray(t_b)[diff], t_p[diff])
    assert (i_p[~a] == -1).all()
    assert np.isinf(t_p[~a]).all()


def test_phased_cornell_box():
    """End-to-end on a real scene shape (Cornell, 36 tris, 1 group)."""
    scene = pack_device_scene(cornell_box())
    nt = scene["tri_isect"].shape[0]
    ro, rd = _aimed_rays(scene["tri_isect"], 512, seed=9)
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_p, i_p = closest_hit_phased(
        jnp.asarray(scene["walk_tris"]), ro, rd,
        num_tris=nt, interpret=True, bn=256,
    )
    i_b, i_p = np.asarray(i_b), np.asarray(i_p)
    diff = i_b != i_p
    np.testing.assert_array_equal(np.asarray(t_b)[diff], np.asarray(t_p)[diff])
