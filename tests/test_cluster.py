"""Cluster-dispatch intersector correctness (ops/cluster.py) — interpret
mode on CPU against the brute-force reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from wgpu_path_tracing_tpu.models.procedural import cornell_box, random_triangles
from wgpu_path_tracing_tpu.models.types import pack_device_scene
from wgpu_path_tracing_tpu.ops.cluster import build_clusters, closest_hit_cluster
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


def test_build_clusters_cover_and_bound():
    scene = pack_device_scene(cornell_box(tessellation=4))
    tris, aabb = build_clusters(scene["tri_isect"], k=64)
    t = scene["tri_isect"].shape[0]
    assert tris.shape[0] % 64 == 0 and tris.shape[0] >= t
    np.testing.assert_array_equal(tris[:t], scene["tri_isect"])
    assert np.all(tris[t:] == 0)
    # Every triangle's vertices inside its cluster AABB.
    for i in range(aabb.shape[0]):
        lo, hi = i * 64, min((i + 1) * 64, t)
        if lo >= t:
            continue
        seg = scene["tri_isect"][lo:hi]
        pts = np.concatenate(
            [seg[:, 0:3], seg[:, 0:3] + seg[:, 3:6], seg[:, 0:3] + seg[:, 6:9]]
        )
        assert np.all(pts >= aabb[i, 0:3] - 1e-5)
        assert np.all(pts <= aabb[i, 3:6] + 1e-5)


def test_cluster_matches_brute(scene):
    ro, rd = _aimed_rays(scene["tri_isect"], 1024)
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_c, i_c = closest_hit_cluster(
        jnp.asarray(scene["cluster_aabb"]),
        jnp.asarray(scene["cluster_tris"]),
        ro,
        rd,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
    )
    hb = np.asarray(i_b) >= 0
    np.testing.assert_array_equal(hb, np.asarray(i_c) >= 0)
    assert hb.sum() > 900
    np.testing.assert_array_equal(np.asarray(i_b)[hb], np.asarray(i_c)[hb])
    np.testing.assert_allclose(
        np.asarray(t_b)[hb], np.asarray(t_c)[hb], rtol=1e-4, atol=1e-5
    )


def test_cluster_shadow_any_hit(scene):
    ro, rd = _aimed_rays(scene["tri_isect"], 1024, seed=2)
    t_b, _ = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_max = jnp.full((1024,), 12.0)
    t_c, _ = closest_hit_cluster(
        jnp.asarray(scene["cluster_aabb"]),
        jnp.asarray(scene["cluster_tris"]),
        ro,
        rd,
        t_max=t_max,
        any_hit=True,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(t_c) < 12.0, np.asarray(t_b) < 12.0
    )


def test_cluster_respects_active(scene):
    ro, rd = _aimed_rays(scene["tri_isect"], 1024, seed=3)
    active = jnp.asarray(np.arange(1024) % 2 == 0)
    t_c, i_c = closest_hit_cluster(
        jnp.asarray(scene["cluster_aabb"]),
        jnp.asarray(scene["cluster_tris"]),
        ro,
        rd,
        active=active,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
    )
    assert np.all(np.asarray(i_c)[~np.asarray(active)] == -1)
    assert np.asarray(i_c)[np.asarray(active)].max() >= 0
