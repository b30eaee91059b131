"""Möller-Trumbore and slab-test unit tests (pt.wgsl:123-245 semantics)."""

import pytest
import numpy as np
import jax.numpy as jnp

from wgpu_path_tracing_tpu.ops.intersect import (
    closest_hit_brute,
    moller_trumbore,
    slab_test,
)


def _tri(v0, v1, v2):
    v0, v1, v2 = (np.asarray(p, np.float32) for p in (v0, v1, v2))
    return (
        jnp.asarray(v0[None]),
        jnp.asarray((v1 - v0)[None]),
        jnp.asarray((v2 - v0)[None]),
    )


def test_triangle_analytic_hit():
    v0, e1, e2 = _tri((-1, -1, -3), (1, -1, -3), (0, 1, -3))
    ro = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    rd = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    t, u, v, valid = moller_trumbore(ro, rd, v0, e1, e2)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-6)
    # barycentric check: hit point = (0,0) -> w*v0 + u*v1 + v*v2 = (0, 0, -3)
    w = 1 - float(u[0]) - float(v[0])
    p = w * np.array([-1, -1, -3]) + float(u[0]) * np.array([1, -1, -3]) + float(
        v[0]
    ) * np.array([0, 1, -3])
    np.testing.assert_allclose(p, [0, 0, -3], atol=1e-6)


def test_triangle_miss_and_parallel_and_behind():
    v0, e1, e2 = _tri((-1, -1, -3), (1, -1, -3), (0, 1, -3))
    cases = [
        ((5.0, 5.0, 0.0), (0.0, 0.0, -1.0)),  # outside
        ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0)),  # parallel to plane
        ((0.0, 0.0, -5.0), (0.0, 0.0, -1.0)),  # triangle behind origin
    ]
    for o, d in cases:
        _, _, _, valid = moller_trumbore(
            jnp.array([o], jnp.float32), jnp.array([d], jnp.float32), v0, e1, e2
        )
        assert not bool(valid[0]), (o, d)


def test_triangle_edge_epsilon():
    # A hit closer than EPSILON is rejected (t > EPSILON, pt.wgsl:157)
    v0, e1, e2 = _tri((-1, -1, -1e-7), (1, -1, -1e-7), (0, 1, -1e-7))
    ro = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    rd = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    _, _, _, valid = moller_trumbore(ro, rd, v0, e1, e2)
    assert not bool(valid[0])


def test_slab_test_inside_and_outside():
    ro = jnp.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0], [0.0, 0.0, 3.0]], jnp.float32)
    rd = jnp.array(
        [[0.0, 0.0, -1.0], [0.577, 0.577, 0.577], [0.0, 0.0, -1.0]], jnp.float32
    )
    bmin = jnp.array([-1.0, -1.0, -1.0], jnp.float32)
    bmax = jnp.array([1.0, 1.0, 1.0], jnp.float32)
    hit, _ = slab_test(ro, rd, bmin[None], bmax[None])
    assert bool(hit[0])  # origin inside
    assert not bool(hit[1])  # pointing away
    assert bool(hit[2])  # approaching along -z


def test_brute_force_first_hit_wins_ties():
    # Two coincident triangles: the lower index must win (strict <,
    # pt.wgsl:275 keeps the first).
    tri = np.zeros((2, 9), np.float32)
    for i in range(2):
        tri[i, 0:3] = (-1, -1, -3)
        tri[i, 3:6] = (2, 0, 0)
        tri[i, 6:9] = (1, 2, 0)
    t, idx = closest_hit_brute(
        jnp.asarray(tri),
        jnp.array([[0.0, 0.0, 0.0]], jnp.float32),
        jnp.array([[0.0, 0.0, -1.0]], jnp.float32),
    )
    assert int(idx[0]) == 0


def test_brute_force_chunking_consistency():
    rng = np.random.default_rng(5)
    base = rng.uniform(-3, 3, (97, 3)).astype(np.float32)  # odd count
    tri = np.zeros((97, 9), np.float32)
    tri[:, 0:3] = base
    tri[:, 3:6] = rng.uniform(-1, 1, (97, 3))
    tri[:, 6:9] = rng.uniform(-1, 1, (97, 3))
    ro = jnp.asarray(rng.uniform(-5, 5, (64, 3)), jnp.float32)
    d = rng.normal(size=(64, 3))
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    t1, i1 = closest_hit_brute(jnp.asarray(tri), ro, rd, chunk=8)
    t2, i2 = closest_hit_brute(jnp.asarray(tri), ro, rd, chunk=97)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    hit = np.asarray(i1) >= 0
    np.testing.assert_array_equal(np.asarray(t1)[hit], np.asarray(t2)[hit])


def test_tail_compaction_machinery_exact():
    """_with_tail_compaction's gather/scatter/cond machinery must be a
    no-op on results: wrapping a deterministic per-lane intersector
    (brute) gives bit-identical t/idx at any occupancy, dead lanes stay
    (inf, -1), and the full branch is taken when the live count exceeds
    every COMPACT_DIVS tier."""
    import jax.numpy as jnp

    from wgpu_path_tracing_tpu.models.procedural import random_triangles
    from wgpu_path_tracing_tpu.ops import intersect as I

    sc = random_triangles(200, seed=3)
    tri = np.zeros((200, 9), np.float32)
    tri[:, 0:3] = sc.tri_v0
    tri[:, 3:6] = sc.tri_v1 - sc.tri_v0
    tri[:, 6:9] = sc.tri_v2 - sc.tri_v0
    tri = jnp.asarray(tri)

    n = I.COMPACT_MIN_LANES  # smallest width the wrapper engages at
    rng = np.random.default_rng(9)
    cent = np.asarray(tri[:, 0:3] + (tri[:, 3:6] + tri[:, 6:9]) / 3.0)
    tgt = cent[rng.integers(0, 200, n)]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro3 = jnp.asarray((tgt - d * 14).T, jnp.float32)  # (3, N)
    rd3 = jnp.asarray(d.T, jnp.float32)

    def inner(ro3, rd3, active=None, t_max=None, any_hit=False):
        t, idx = I.closest_hit_brute(tri, ro3.T, rd3.T)
        if active is not None:
            t = jnp.where(active, t, jnp.inf)
            idx = jnp.where(active, idx, -1)
        if any_hit:
            del t_max  # brute already returns the closest; fine for a test
        return t, idx

    wrapped = I._with_tail_compaction(
        inner, jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0], jnp.float32)
    )
    for occupancy in (0.03, 0.5):  # compacted branch / full branch
        active = jnp.asarray(rng.random(n) < occupancy)
        t_ref, i_ref = inner(ro3, rd3, active=active)
        t_w, i_w = wrapped(ro3, rd3, active=active)
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_w))
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_w))
    # t_max must ride the compaction too (shadow-ray shape).
    t_max = jnp.full((n,), 7.0)
    active = jnp.asarray(rng.random(n) < 0.03)
    t_w, i_w = wrapped(ro3, rd3, active=active, t_max=t_max, any_hit=True)
    t_ref, i_ref = inner(ro3, rd3, active=active, t_max=t_max, any_hit=True)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_w))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_w))


def test_deep_compaction_tiers_exact(monkeypatch):
    """The n/32 and n/128 tiers (built for frames_per_trace-batched
    million-lane calls) must be bit-exact too. COMPACT_TIER_MIN_LANES is
    lowered so the deep tiers engage at a CPU-testable lane count; every
    occupancy lands in a different ladder branch."""
    import jax.numpy as jnp

    from wgpu_path_tracing_tpu.models.procedural import random_triangles
    from wgpu_path_tracing_tpu.ops import intersect as I

    monkeypatch.setattr(I, "COMPACT_TIER_MIN_LANES", 128)
    sc = random_triangles(150, seed=11)
    tri = np.zeros((150, 9), np.float32)
    tri[:, 0:3] = sc.tri_v0
    tri[:, 3:6] = sc.tri_v1 - sc.tri_v0
    tri[:, 6:9] = sc.tri_v2 - sc.tri_v0
    tri = jnp.asarray(tri)
    root = np.concatenate([sc.bvh_aabb_min[0], sc.bvh_aabb_max[0]])

    n = I.COMPACT_MIN_LANES
    rng = np.random.default_rng(5)
    cent = np.asarray(tri[:, 0:3] + (tri[:, 3:6] + tri[:, 6:9]) / 3.0)
    tgt = cent[rng.integers(0, 150, n)]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro3 = jnp.asarray((tgt - d * 14).T, jnp.float32)
    rd3 = jnp.asarray(d.T, jnp.float32)

    def inner(ro3, rd3, active=None, t_max=None, any_hit=False):
        t, idx = I.closest_hit_brute(tri, ro3.T, rd3.T)
        if active is not None:
            t = jnp.where(active, t, jnp.inf)
            idx = jnp.where(active, idx, -1)
        return t, idx

    wrapped = I._with_tail_compaction(inner, jnp.asarray(root, jnp.float32))
    # n/128 tier (<0.78%), n/32 (<3.1%), n/8, n/2, full
    for occupancy in (0.004, 0.02, 0.08, 0.4, 0.8):
        active = jnp.asarray(rng.random(n) < occupancy)
        t_ref, i_ref = inner(ro3, rd3, active=active)
        for reorder in (None, True):
            kw = {} if reorder is None else {"reorder": jnp.asarray(True)}
            t_w, i_w = wrapped(ro3, rd3, active=active, **kw)
            np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_w))
            np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_w))


def test_bucket_reorder_machinery_exact():
    """_with_bucket_reorder's counting sort must be a bijection: wrapping
    a deterministic per-lane intersector gives bit-identical results, at
    any occupancy, through every compaction tier (reorder=True)."""
    import jax.numpy as jnp

    from wgpu_path_tracing_tpu.models.procedural import random_triangles
    from wgpu_path_tracing_tpu.ops import intersect as I

    sc = random_triangles(100, seed=4)
    tri = np.zeros((100, 9), np.float32)
    tri[:, 0:3] = sc.tri_v0
    tri[:, 3:6] = sc.tri_v1 - sc.tri_v0
    tri[:, 6:9] = sc.tri_v2 - sc.tri_v0
    tri = jnp.asarray(tri)
    root = np.concatenate([sc.bvh_aabb_min[0], sc.bvh_aabb_max[0]])

    n = I.COMPACT_MIN_LANES
    rng = np.random.default_rng(2)
    cent = np.asarray(tri[:, 0:3] + (tri[:, 3:6] + tri[:, 6:9]) / 3.0)
    tgt = cent[rng.integers(0, 100, n)]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro3 = jnp.asarray((tgt - d * 14).T, jnp.float32)
    rd3 = jnp.asarray(d.T, jnp.float32)

    def inner(ro3, rd3, active=None, t_max=None, any_hit=False):
        t, idx = I.closest_hit_brute(tri, ro3.T, rd3.T)
        if active is not None:
            t = jnp.where(active, t, jnp.inf)
            idx = jnp.where(active, idx, -1)
        return t, idx

    wrapped = I._with_tail_compaction(inner, jnp.asarray(root, jnp.float32))
    for occupancy in (0.04, 0.3, 0.9):  # tail tier / mid tier / full
        active = jnp.asarray(rng.random(n) < occupancy)
        t_ref, i_ref = inner(ro3, rd3, active=active)
        t_w, i_w = wrapped(ro3, rd3, active=active, reorder=True)
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_w))
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_w))


def test_auto_selection_vmem_gate(monkeypatch):
    """make_closest_hit's auto mode picks the resident walk while its
    VMEM slabs fit WALK_VMEM_BUDGET_BYTES, the PAGED walk past it (tri
    slabs stay in HBM), and the pair dispatch only once even the interior
    tables outgrow PAGED_VMEM_BUDGET_BYTES (BASELINE.md capability
    ladder). Exercised by shrinking the budgets on a small scene; the
    .strategy tag records the choice."""
    import jax
    from wgpu_path_tracing_tpu.models.procedural import cornell_box
    from wgpu_path_tracing_tpu.models.types import pack_device_scene
    from wgpu_path_tracing_tpu.ops import intersect as I

    scene = pack_device_scene(cornell_box(tessellation=8))  # 2k tris
    assert "walk_tris" in scene
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    ch = I.make_closest_hit(scene, "auto", brute_max_tris=64, leaf_size=4)
    assert ch.strategy == "walk"
    monkeypatch.setattr(I, "WALK_VMEM_BUDGET_BYTES", 1024)
    ch = I.make_closest_hit(scene, "auto", brute_max_tris=64, leaf_size=4)
    assert ch.strategy == "walk_hbm"
    ch = I.make_closest_hit(scene, "walk_hbm", brute_max_tris=64,
                            leaf_size=4)
    assert ch.strategy == "walk_hbm"
    monkeypatch.setattr(I, "PAGED_VMEM_BUDGET_BYTES", 1024)
    ch = I.make_closest_hit(scene, "auto", brute_max_tris=64, leaf_size=4)
    assert ch.strategy == "pairs"
    # FORCING paged mode past its bounds must fail loudly (the int16
    # meta packing would silently wrap on wrong-geometry otherwise).
    with pytest.raises(ValueError, match="walk_hbm"):
        I.make_closest_hit(scene, "walk_hbm", brute_max_tris=64,
                           leaf_size=4)
    # Forced walk ignores the budget; brute threshold wins below it.
    ch = I.make_closest_hit(scene, "walk", brute_max_tris=64, leaf_size=4)
    assert ch.strategy == "walk"
    ch = I.make_closest_hit(scene, "auto", brute_max_tris=4096, leaf_size=4)
    assert ch.strategy == "brute"
