"""Wide-BVH block-walk intersector correctness (accel/bvh8.py +
ops/walk.py) — interpret mode on CPU against the brute-force reference.
Small block sizes force multiple grid steps; mixed-direction rays exercise
the majority-octant push ordering (correctness must not depend on it)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wgpu_path_tracing_tpu.models.procedural import cornell_box, random_triangles
from wgpu_path_tracing_tpu.models.types import pack_device_scene
from wgpu_path_tracing_tpu.accel.bvh8 import SUB, build_wide_bvh, group_rows
from wgpu_path_tracing_tpu.ops.walk import closest_hit_walk
from wgpu_path_tracing_tpu.ops.intersect import closest_hit_brute


@pytest.fixture(scope="module")
def scene():
    return pack_device_scene(random_triangles(1500, seed=5))


def _walk_args(scene):
    return (
        jnp.asarray(scene["walk_order"]),
        jnp.asarray(scene["walk_boxes"]),
        jnp.asarray(scene["walk_tris"]),
    )


def _aimed_rays(tri_isect, n, seed=1):
    rng = np.random.default_rng(seed)
    tri = np.asarray(tri_isect)
    cent = tri[:, 0:3] + (tri[:, 3:6] + tri[:, 6:9]) / 3.0
    tgt = cent[rng.integers(0, len(tri), n)]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(tgt - d * 14, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("bn,ways", [(256, 1), (256, 2), (1024, 2)])
def test_walk_matches_brute(scene, bn, ways):
    ro, rd = _aimed_rays(scene["tri_isect"], 1024)
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_w, i_w = closest_hit_walk(
        *_walk_args(scene),
        ro,
        rd,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        bn=bn,
        ways=ways,
    )
    i_b, i_w, t_b, t_w = map(np.asarray, (i_b, i_w, t_b, t_w))
    hb = i_b >= 0
    np.testing.assert_array_equal(hb, i_w >= 0)
    assert hb.sum() > 900
    # Exact-t ties are visit-order-dependent; everywhere else indices match.
    diff = i_b != i_w
    np.testing.assert_array_equal(t_b[diff], t_w[diff])
    np.testing.assert_allclose(t_b[hb], t_w[hb], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pack", ["none", "ffd", "slice"])
def test_walk_pack_modes_exact(scene, pack):
    """Every leaf-group packing mode (one-subtree-per-group, FFD bin-pack,
    DFS slicing across subtree boundaries) must stay exact vs brute: the
    packs change group membership and union boxes but never the triangle
    set, so hits and distances are invariant."""
    sc = random_triangles(1500, seed=5)
    tri = np.asarray(scene["tri_isect"])
    wb = build_wide_bvh(sc.bvh_aabb_min, sc.bvh_aabb_max, sc.bvh_meta,
                        tri, pack=pack, prefer_native=False)
    # Coverage: every global tri index appears exactly once in the slabs.
    grows = group_rows(SUB)
    idx_rows = wb.tris.reshape(-1, grows, 128)[:, 9, :]
    got = np.sort(idx_rows[idx_rows >= 0].astype(np.int64))
    np.testing.assert_array_equal(got, np.arange(tri.shape[0]))
    ro, rd = _aimed_rays(tri, 512, seed=11)
    t_b, i_b = closest_hit_brute(jnp.asarray(tri), ro, rd)
    t_w, i_w = closest_hit_walk(
        jnp.asarray(wb.order), jnp.asarray(wb.boxes), jnp.asarray(wb.tris),
        ro, rd, num_tris=tri.shape[0], interpret=True, bn=256,
    )
    i_b, i_w, t_b, t_w = map(np.asarray, (i_b, i_w, t_b, t_w))
    diff = i_b != i_w
    np.testing.assert_array_equal(t_b[diff], t_w[diff])
    np.testing.assert_array_equal(i_b >= 0, i_w >= 0)
    hb = i_b >= 0
    np.testing.assert_allclose(t_b[hb], t_w[hb], rtol=1e-4, atol=1e-5)


def test_walk_shadow_limit(scene):
    ro, rd = _aimed_rays(scene["tri_isect"], 512, seed=2)
    t_b, _ = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_max = jnp.full((512,), 12.0)
    t_w, _ = closest_hit_walk(
        *_walk_args(scene),
        ro,
        rd,
        t_max=t_max,
        any_hit=True,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        bn=256,
    )
    np.testing.assert_array_equal(
        np.asarray(t_w) < 12.0, np.asarray(t_b) < 12.0
    )


def test_walk_respects_active(scene):
    ro, rd = _aimed_rays(scene["tri_isect"], 512, seed=3)
    active = jnp.asarray(np.arange(512) % 2 == 0)
    t_w, i_w = closest_hit_walk(
        *_walk_args(scene),
        ro,
        rd,
        active=active,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        bn=256,
    )
    assert np.all(np.asarray(i_w)[~np.asarray(active)] == -1)
    assert np.asarray(i_w)[np.asarray(active)].max() >= 0


def test_walk_cornell_box():
    """Coherent scene with many all-miss rays (pop-time culling + empty
    sub-cluster NaN rows must reject, never hit)."""
    scene = pack_device_scene(cornell_box(tessellation=4))
    n = 512
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    d = np.stack([np.cos(ang), 0.3 * np.sin(3 * ang), np.sin(ang)], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ro = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)), jnp.float32)
    rd = jnp.asarray(d, jnp.float32)
    t_b, i_b = closest_hit_brute(jnp.asarray(scene["tri_isect"]), ro, rd)
    t_w, i_w = closest_hit_walk(
        *_walk_args(scene),
        ro,
        rd,
        num_tris=scene["tri_isect"].shape[0],
        interpret=True,
        bn=256,
    )
    i_b, i_w, t_b, t_w = map(np.asarray, (i_b, i_w, t_b, t_w))
    diff = i_b != i_w
    np.testing.assert_array_equal(t_b[diff], t_w[diff])
    np.testing.assert_array_equal(i_b >= 0, i_w >= 0)
    hb = i_b >= 0
    np.testing.assert_allclose(t_b[hb], t_w[hb], rtol=1e-4, atol=1e-5)


def test_wide_bvh_tables_cover_all_triangles(scene):
    """Every global triangle index appears exactly once across leaf slabs."""
    tris = np.asarray(scene["walk_tris"])
    grows = group_rows(SUB)
    idx_rows = tris.reshape(-1, grows, 128)[:, 9, :]
    got = np.sort(idx_rows[idx_rows >= 0].astype(np.int64))
    np.testing.assert_array_equal(got, np.arange(scene["tri_isect"].shape[0]))


def test_walk_big_leaf_groups(scene):
    """ls=256 leaf groups (two lane-slabs per group): exact vs brute."""
    sc = random_triangles(1500, seed=5)
    tri = np.asarray(scene["tri_isect"])
    wb = build_wide_bvh(sc.bvh_aabb_min, sc.bvh_aabb_max, sc.bvh_meta,
                        tri, leaf_slots=256, sub=32)
    ro, rd = _aimed_rays(tri, 512, seed=9)
    t_b, i_b = closest_hit_brute(jnp.asarray(tri), ro, rd)
    t_w, i_w = closest_hit_walk(
        jnp.asarray(wb.order), jnp.asarray(wb.boxes), jnp.asarray(wb.tris),
        ro, rd, num_tris=tri.shape[0], interpret=True, bn=256,
        leaf_slots=256, sub=32,
    )
    i_b, i_w, t_b, t_w = map(np.asarray, (i_b, i_w, t_b, t_w))
    diff = i_b != i_w
    np.testing.assert_array_equal(t_b[diff], t_w[diff])
    np.testing.assert_array_equal(i_b >= 0, i_w >= 0)
    hb = i_b >= 0
    np.testing.assert_allclose(t_b[hb], t_w[hb], rtol=1e-4, atol=1e-5)
    # Native twin stays bit-identical at the wide layout too.
    from wgpu_path_tracing_tpu.accel.native import native_available

    if native_available():
        nat = build_wide_bvh(sc.bvh_aabb_min, sc.bvh_aabb_max, sc.bvh_meta,
                             tri, leaf_slots=256, sub=32, pack="none",
                             prefer_native=True)
        py = build_wide_bvh(sc.bvh_aabb_min, sc.bvh_aabb_max, sc.bvh_meta,
                            tri, leaf_slots=256, sub=32, pack="none",
                            prefer_native=False)
        np.testing.assert_array_equal(
            py.tris.view(np.uint32), nat.tris.view(np.uint32)
        )
        np.testing.assert_array_equal(py.order, nat.order)


@pytest.mark.parametrize("pack", ["none", "ffd"])
def test_wide_native_matches_python(pack):
    """The C++ collapse (accel/cbvh/wide_collapse.cpp) must be
    bit-identical to the NumPy one — same expansion rule, FFD bin-pack and
    multi-range emission order, octant sort keys, and f32 sub-box sweeps."""
    from wgpu_path_tracing_tpu.accel.native import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    for seed, n in ((7, 2000), (11, 300)):
        sc = random_triangles(n, seed=seed)
        tri = np.zeros((n, 9), np.float32)
        tri[:, 0:3] = sc.tri_v0
        tri[:, 3:6] = sc.tri_v1 - sc.tri_v0
        tri[:, 6:9] = sc.tri_v2 - sc.tri_v0
        py = build_wide_bvh(sc.bvh_aabb_min, sc.bvh_aabb_max, sc.bvh_meta,
                            tri, prefer_native=False, pack=pack)
        nat = build_wide_bvh(sc.bvh_aabb_min, sc.bvh_aabb_max, sc.bvh_meta,
                             tri, prefer_native=True, pack=pack)
        np.testing.assert_array_equal(py.meta, nat.meta)
        np.testing.assert_array_equal(py.order, nat.order)
        np.testing.assert_array_equal(
            py.boxes.view(np.uint32), nat.boxes.view(np.uint32)
        )
        np.testing.assert_array_equal(
            py.tris.view(np.uint32), nat.tris.view(np.uint32)
        )


@pytest.mark.parametrize("pack", ["none", "ffd"])
def test_wide_native_oversized_before_small(pack):
    """Emission-order parity when an OVERSIZED elem precedes a small one
    in the expansion list: the C++ twin emits groups and child recursions
    in one interleaved pass over elems (pack=0), and group/node ids are
    allocation-order, so a smalls-first Python pass renumbers everything.
    Minimal trigger (first seen on a 50k random_triangles scene): a root
    whose LEFT child is an oversized leaf (chunked via a chained node)
    and whose RIGHT child is a small leaf."""
    from wgpu_path_tracing_tpu.accel.native import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    # meta rows: [left, right, tri_offset, tri_count]; leaf = count > 0.
    meta = np.array(
        [[1, 2, 0, 0],        # root (interior)
         [-1, -1, 0, 200],    # oversized leaf: 200 > LEAF_SLOTS=128
         [-1, -1, 200, 10]],  # small leaf
        np.int32,
    )
    amin = np.array([[0, 0, 0], [0, 0, 0], [2, 2, 2]], np.float32)
    amax = np.array([[3, 3, 3], [1, 1, 1], [3, 3, 3]], np.float32)
    rng = np.random.default_rng(3)
    tri = rng.normal(size=(210, 9)).astype(np.float32)
    py = build_wide_bvh(amin, amax, meta, tri, prefer_native=False,
                        pack=pack)
    nat = build_wide_bvh(amin, amax, meta, tri, prefer_native=True,
                         pack=pack)
    np.testing.assert_array_equal(py.meta, nat.meta)
    np.testing.assert_array_equal(py.order, nat.order)
    np.testing.assert_array_equal(
        py.boxes.view(np.uint32), nat.boxes.view(np.uint32)
    )
    np.testing.assert_array_equal(
        py.tris.view(np.uint32), nat.tris.view(np.uint32)
    )


def test_stack_depth_guard(monkeypatch):
    """A wide tree deeper than the kernel's DFS stack bound must be
    rejected by the builder (the count-ratio SAH always produces balanced
    trees, so this is a backstop), and pack_device_scene must then omit
    the walk tables so auto selection falls back to pair dispatch."""
    from wgpu_path_tracing_tpu.accel import bvh8

    nn = 100  # pure interior chain: depth 100 -> needs a 708-entry stack
    wmeta = np.zeros((nn, 8), np.int32)
    for i in range(nn - 1):
        wmeta[i, 0] = i + 1
        wmeta[i, 1] = -(i + 1)
    with pytest.raises(ValueError, match="pathologically deep"):
        bvh8._check_stack_depth(wmeta)

    def boom(*a, **k):
        raise bvh8.WideBVHDepthError("pathologically deep (simulated)")

    import wgpu_path_tracing_tpu.models.types as T

    monkeypatch.setattr(bvh8, "build_wide_bvh", boom)
    dev = T.pack_device_scene(cornell_box())
    assert "walk_tris" not in dev and "walk_order" not in dev
    # The auto intersector still works without the tables.
    from wgpu_path_tracing_tpu.ops.intersect import make_closest_hit

    ch = make_closest_hit(
        {k: jnp.asarray(v) for k, v in dev.items()}, "auto", 4, 4
    )
    assert ch is not None


def test_wide_bvh_degenerate_empty():
    from wgpu_path_tracing_tpu.accel.bvh8 import WideBVH

    wb = build_wide_bvh(
        np.zeros((1, 3), np.float32),
        np.zeros((1, 3), np.float32),
        np.zeros((1, 4), np.int32),
        np.zeros((0, 9), np.float32),
    )
    assert isinstance(wb, WideBVH)
    assert wb.num_nodes == 1
    t_w, i_w = closest_hit_walk(
        jnp.asarray(wb.order),
        jnp.asarray(wb.boxes),
        jnp.asarray(wb.tris),
        jnp.zeros((8, 3), jnp.float32),
        jnp.ones((8, 3), jnp.float32),
        interpret=True,
        bn=256,
    )
    assert np.all(np.asarray(i_w) == -1)


def test_walk_width16_exact(scene):
    """The experimental 16-ary interior collapse (build_wide_bvh(width=16),
    NumPy-only; TODO.md 16-ary item) must stay exact vs brute through the
    width-parameterized kernel — width is inferred from the order table
    (8 octants x 16 columns), halving interior visits at 2x slab rows."""
    sc = random_triangles(1500, seed=5)
    tri = np.asarray(scene["tri_isect"])
    wb = build_wide_bvh(sc.bvh_aabb_min, sc.bvh_aabb_max, sc.bvh_meta,
                        tri, prefer_native=False, width=16)
    assert wb.meta.shape[1] == 16
    assert wb.order.shape[1] == 8 * 16
    assert wb.boxes.shape == (wb.meta.shape[0] * 8 * 16, 8)
    # Coverage: every global tri index appears exactly once in the slabs.
    grows = group_rows(SUB)
    idx_rows = wb.tris.reshape(-1, grows, 128)[:, 9, :]
    got = np.sort(idx_rows[idx_rows >= 0].astype(np.int64))
    np.testing.assert_array_equal(got, np.arange(tri.shape[0]))
    ro, rd = _aimed_rays(tri, 512, seed=13)
    t_b, i_b = closest_hit_brute(jnp.asarray(tri), ro, rd)
    t_w, i_w = closest_hit_walk(
        jnp.asarray(wb.order), jnp.asarray(wb.boxes), jnp.asarray(wb.tris),
        ro, rd, num_tris=tri.shape[0], interpret=True, bn=256,
    )
    i_b, i_w, t_b, t_w = map(np.asarray, (i_b, i_w, t_b, t_w))
    diff = i_b != i_w
    np.testing.assert_array_equal(t_b[diff], t_w[diff])
    np.testing.assert_array_equal(i_b >= 0, i_w >= 0)
    hb = i_b >= 0
    np.testing.assert_allclose(t_b[hb], t_w[hb], rtol=1e-4, atol=1e-5)
    # 16-ary really is shallower/narrower on interiors.
    wb8 = build_wide_bvh(sc.bvh_aabb_min, sc.bvh_aabb_max, sc.bvh_meta,
                         tri, prefer_native=False)
    assert wb.meta.shape[0] < wb8.meta.shape[0]


@pytest.mark.parametrize("bn,ways", [(256, 1), (256, 2)])
def test_walk_paged_bitmatches_resident(scene, bn, ways):
    """paged=True (leaf slabs in HBM, DMA'd into the double-buffered VMEM
    ring with one-iteration prefetch) must be BIT-identical to the
    resident walk: the traversal math is shared; only residency changes.
    Multiple grid steps (small bn) exercise ring/semaphore reuse across
    blocks; ways=2 exercises per-way slot isolation."""
    ro, rd = _aimed_rays(scene["tri_isect"], 1024)
    nt = scene["tri_isect"].shape[0]
    kw = dict(num_tris=nt, interpret=True, bn=bn, ways=ways)
    t_r, i_r = closest_hit_walk(*_walk_args(scene), ro, rd, **kw)
    t_p, i_p = closest_hit_walk(*_walk_args(scene), ro, rd, paged=True,
                                **kw)
    np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(i_r), np.asarray(i_p))


def test_walk_paged_shadow_and_active(scene):
    """Paged mode under any_hit early-stop and inactive lanes: occlusion
    decisions match the resident walk (the culled-but-fetched slot class —
    a prefetch whose pop is culled by the tightened limit — must still
    consume its semaphore or later blocks would read stale slabs)."""
    ro, rd = _aimed_rays(scene["tri_isect"], 512, seed=2)
    nt = scene["tri_isect"].shape[0]
    t_max = jnp.full((512,), 12.0)
    t_r, _ = closest_hit_walk(*_walk_args(scene), ro, rd, t_max=t_max,
                              any_hit=True, num_tris=nt, interpret=True,
                              bn=256)
    t_p, _ = closest_hit_walk(*_walk_args(scene), ro, rd, t_max=t_max,
                              any_hit=True, num_tris=nt, interpret=True,
                              bn=256, paged=True)
    np.testing.assert_array_equal(np.asarray(t_p) < 12.0,
                                  np.asarray(t_r) < 12.0)
    active = jnp.asarray(np.arange(512) % 2 == 0)
    t_p, i_p = closest_hit_walk(*_walk_args(scene), ro, rd, active=active,
                                num_tris=nt, interpret=True, bn=256,
                                paged=True)
    assert np.all(np.asarray(i_p)[~np.asarray(active)] == -1)
    assert np.asarray(i_p)[np.asarray(active)].max() >= 0


def test_canonical_perm_packing_reconstructs_every_octant(scene):
    """The round-4 paged encoding stores each node's child metas ONCE
    (octant-0 canonical order) plus eight 24-bit permutation words; the
    kernel reconstructs meta/key/gate-bit positions at push time. This
    reconstructs all 8 octant orders host-side from the packed table and
    checks them against the full (Nn, 64) walk_order — the exact
    contract the kernel's push loop relies on (zero metas may map to any
    canonical zero: both read meta 0 and never push)."""
    order = np.asarray(scene["walk_order"])
    nn = order.shape[0]
    ordr = order.reshape(nn, 8, 8)
    canon = ordr[:, 0, :]
    pos = np.argmax(canon[:, None, None, :] == ordr[:, :, :, None], axis=-1)
    recon = np.take_along_axis(
        np.repeat(canon[:, None, :], 8, axis=1), pos, axis=-1
    )
    np.testing.assert_array_equal(recon, ordr)
    # Permutation words round-trip through the 24-bit packing.
    perm = (pos.astype(np.int64) << (3 * np.arange(8))).sum(axis=-1)
    assert perm.max() < (1 << 24)
    unpacked = np.stack([(perm >> (3 * j)) & 7 for j in range(8)], axis=-1)
    np.testing.assert_array_equal(unpacked, pos)
