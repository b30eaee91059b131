"""Pair-dispatch intersector correctness (ops/pairs.py) — interpret mode on
CPU against the brute-force reference. Window sizes are shrunk so the
while_loop takes several windows and blocks span window boundaries."""

import numpy as np
import jax.numpy as jnp
import pytest

from wgpu_path_tracing_tpu.models.procedural import cornell_box, random_triangles
from wgpu_path_tracing_tpu.models.types import pack_device_scene
from wgpu_path_tracing_tpu.ops.pairs import closest_hit_pairs
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


@pytest.mark.parametrize("window", [64, 4096])
def test_pairs_matches_brute(scene, window):
    ro, rd = _aimed_rays(scene["tri_isect"], 1024)
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_c, i_c = closest_hit_pairs(
        jnp.asarray(scene["pairs_super_aabb"]),
        jnp.asarray(scene["pairs_tris"]),
        ro,
        rd,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        window=window,
    )
    hb = np.asarray(i_b) >= 0
    np.testing.assert_array_equal(hb, np.asarray(i_c) >= 0)
    assert hb.sum() > 900
    np.testing.assert_array_equal(np.asarray(i_b)[hb], np.asarray(i_c)[hb])
    np.testing.assert_allclose(
        np.asarray(t_b)[hb], np.asarray(t_c)[hb], rtol=1e-4, atol=1e-5
    )


def test_pairs_shadow_any_hit(scene):
    ro, rd = _aimed_rays(scene["tri_isect"], 1024, seed=2)
    t_b, _ = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_max = jnp.full((1024,), 12.0)
    t_c, _ = closest_hit_pairs(
        jnp.asarray(scene["pairs_super_aabb"]),
        jnp.asarray(scene["pairs_tris"]),
        ro,
        rd,
        t_max=t_max,
        any_hit=True,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        window=512,
    )
    np.testing.assert_array_equal(
        np.asarray(t_c) < 12.0, np.asarray(t_b) < 12.0
    )


def test_pairs_respects_active(scene):
    ro, rd = _aimed_rays(scene["tri_isect"], 1024, seed=3)
    active = jnp.asarray(np.arange(1024) % 2 == 0)
    t_c, i_c = closest_hit_pairs(
        jnp.asarray(scene["pairs_super_aabb"]),
        jnp.asarray(scene["pairs_tris"]),
        ro,
        rd,
        active=active,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        window=512,
    )
    assert np.all(np.asarray(i_c)[~np.asarray(active)] == -1)
    assert np.asarray(i_c)[np.asarray(active)].max() >= 0


def test_pairs_cornell_box():
    """Small coherent scene (many all-miss blocks exercising the
    zero-candidate-block merge guard)."""
    scene = pack_device_scene(cornell_box(tessellation=4))
    n = 512
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    d = np.stack(
        [np.cos(ang), 0.3 * np.sin(3 * ang), np.sin(ang)], axis=1
    )
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)), jnp.float32)
    rd = jnp.asarray(d, jnp.float32)
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_c, i_c = closest_hit_pairs(
        jnp.asarray(scene["pairs_super_aabb"]),
        jnp.asarray(scene["pairs_tris"]),
        ro,
        rd,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        window=128,
    )
    i_b, i_c, t_b, t_c = map(np.asarray, (i_b, i_c, t_b, t_c))
    # Exact-t ties (rays through shared edges of coplanar tessellation
    # quads) are visit-order-dependent; everywhere else indices must match.
    diff = i_b != i_c
    np.testing.assert_array_equal(t_b[diff], t_c[diff])
    np.testing.assert_array_equal(i_b >= 0, i_c >= 0)
    hb = i_b >= 0
    np.testing.assert_allclose(t_b[hb], t_c[hb], rtol=1e-4, atol=1e-5)
