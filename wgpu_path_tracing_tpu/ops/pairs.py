"""Large-scene intersection v2: entry-sorted pair dispatch over subtree
clusters.

Replaces ops/cluster.py's round dispatch (round 1: 95 ms per 262k-ray
traversal on the 95k-tri Cornell, ~half spent on idle grid steps). Three
measured facts drive this design (see TODO.md / memory notes):

* a Pallas grid step costs ~0.4-1.2 us in scalar machinery no matter how
  little it does, so the work list must be exact (no idle rounds) and each
  step must carry a fat tile;
* random ~4 KB tile DMAs sustain only ~10 GB/s (latency-bound double
  buffering); ~32 KB tiles reach ~40-60 GB/s;
* fixed-stride cluster cuts straddle BVH subtree boundaries: half of the
  stride-64 clusters on the tessellated Cornell had an extent over a
  quarter of the scene, inflating per-ray candidate counts ~3x over a true
  ordered BVH walk.

Pipeline:

* BUILD (host, models/types.py): the BVH is cut into maximal subtrees
  holding <= PAIRS_K triangles (accel/bvh.py::cut_subtree_clusters) — each
  cluster inherits its subtree's tight SAH box. GROUP consecutive clusters
  form a SUPER tile: one (GROUP*PAIRS_K, 16) row block = triangles
  [v0,e1,e2| cluster AABB | cluster base index], the per-pair DMA unit.
* PHASE 1 (device, dense): every ray slab-tests every SUPER AABB, reduced
  per BN-ray block to entry distances ((nb, Cs), inf = no overlap).
* PAIR LIST (device): per-block candidates sorted by entry
  (lax.sort_key_val); cumsum offsets give a flat block-major, entry-ordered
  enumeration of exactly the active (block, super) pairs.
* DISPATCH (device): a while_loop walks fixed windows of that list; the
  kernel keeps each block's running (best_t, best_idx) VMEM-resident across
  its contiguous pair run and, per pair, slab-tests each member cluster
  against the LIVE per-ray limits — skipping its Möller-Trumbore block when
  no lane can improve (nearest-first early-out at cluster granularity).

Correctness mirrors the reference's closest-hit semantics: strict ``<``
winner (pt.wgsl:275), misses return (inf, -1). Cluster visit order is
nearest-entry-first, which cannot change the winning t (culling is exact:
a subtree's triangles lie inside its box). Reference counterpart: the
per-thread stack walk of pt.wgsl:248-296, hostile to TPU lanes (measured
0.06-0.09 Mrays/s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-6
INF = np.float32(np.inf)

PAIRS_K = 64  # max triangles per (subtree) cluster
PAIRS_GROUP = 8  # clusters per super tile (the per-step DMA unit)
BN = 1024  # rays per block
PHASE1_CHUNK = 128  # super AABBs per phase-1 scan step
WINDOW = 4096  # pairs per Pallas dispatch window


def build_pair_tables(bvh_aabb, bvh_meta, tri_isect,
                      k: int = PAIRS_K, group: int = PAIRS_GROUP):
    """Host: subtree clusters -> (pairs_tris (Cs*group*k, 16),
    pairs_super_aabb (Cs, 6)).

    Row layout: cols 0:9 = [v0, e1, e2] (zero rows reject in Möller-Trumbore
    via a == 0); cols 9:15 = the owning CLUSTER's AABB replicated per row;
    col 15 = the cluster's base triangle index (exact in f32 below 2^24).
    Padding clusters carry an empty AABB (+inf min) so they never enter.
    """
    from wgpu_path_tracing_tpu.accel.bvh import cut_subtree_clusters

    t = tri_isect.shape[0]
    if t == 0:
        tris = np.zeros((group * k, 16), np.float32)
        tris[:, 9:15] = np.nan
        aabb = np.full((1, 6), np.nan, np.float32)  # no ray ever enters
        return tris, aabb

    clusters = cut_subtree_clusters(bvh_meta, k)
    c = len(clusters)
    cs = -(-c // group)
    tris = np.zeros((cs * group * k, 16), np.float32)
    # Padding-cluster AABBs are NaN: every slab comparison is then False and
    # the kernel's `enter` genuinely rejects them ((+inf, -inf) boxes would
    # yield tn = -inf/tf = +inf and ENTER — only the zero triangle rows'
    # a == 0 rejection would save correctness, at full MT cost).
    tris[:, 9:15] = np.nan
    super_aabb = np.zeros((cs, 6), np.float32)
    super_aabb[:, 0:3] = np.inf
    super_aabb[:, 3:6] = -np.inf
    for ci, (node, lo, cnt) in enumerate(clusters):
        assert cnt <= k, (cnt, k)  # cut_subtree_clusters splits large leaves
        base = ci * k
        tris[base : base + cnt, 0:9] = tri_isect[lo : lo + cnt]
        tris[base : base + k, 9:12] = bvh_aabb[node, 0:3]
        tris[base : base + k, 12:15] = bvh_aabb[node, 3:6]
        tris[base : base + k, 15] = np.float32(lo)
        s = ci // group
        super_aabb[s, 0:3] = np.minimum(super_aabb[s, 0:3], bvh_aabb[node, 0:3])
        super_aabb[s, 3:6] = np.maximum(super_aabb[s, 3:6], bvh_aabb[node, 3:6])
    return tris, super_aabb


def _pair_kernel(k: int, group: int, bn: int):
    """Grid step p: rays of block blk[p] x the member clusters of super
    cid[p]. flags[p]: bit0 = real pair, bit1 = first pair of this block in
    this window (seed the accumulator from the carried-in buffers).

    MT is gated per member cluster over the whole block — finer gating
    (lane quarters) was measured 2x SLOWER on v5e: the extra pl.when scalar
    branches and duplicated slab work cost more than the VPU they save."""

    def kernel(blk_ref, cid_ref, flags_ref, ray_ref, lim_ref, tin_ref,
               iin_ref, tri_ref, t_ref, idx_ref):
        p = pl.program_id(0)
        flags = flags_ref[p]
        first = (flags & 2) != 0
        act = (flags & 1) != 0

        t_ref[...] = jnp.where(first, tin_ref[...], t_ref[...])
        idx_ref[...] = jnp.where(first, iin_ref[...], idx_ref[...])

        ox = ray_ref[0:1, :]
        oy = ray_ref[1:2, :]
        oz = ray_ref[2:3, :]
        dx = ray_ref[3:4, :]
        dy = ray_ref[4:5, :]
        dz = ray_ref[5:6, :]
        lim0 = lim_ref[...]

        for s in range(group):
            r0 = s * k
            # Member cluster's tight AABB vs the LIVE per-ray limit.
            cur_t = t_ref[...]
            lim = jnp.minimum(cur_t, lim0)
            t1x = (tri_ref[r0 : r0 + 1, 9:10] - ox) / dx
            t2x = (tri_ref[r0 : r0 + 1, 12:13] - ox) / dx
            t1y = (tri_ref[r0 : r0 + 1, 10:11] - oy) / dy
            t2y = (tri_ref[r0 : r0 + 1, 13:14] - oy) / dy
            t1z = (tri_ref[r0 : r0 + 1, 11:12] - oz) / dz
            t2z = (tri_ref[r0 : r0 + 1, 14:15] - oz) / dz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            enter = (tf >= tn) & (tf >= 0.0) & (tn <= lim)

            @pl.when(act & jnp.any(enter))
            def _():
                v0x = tri_ref[r0 : r0 + k, 0:1]
                v0y = tri_ref[r0 : r0 + k, 1:2]
                v0z = tri_ref[r0 : r0 + k, 2:3]
                e1x = tri_ref[r0 : r0 + k, 3:4]
                e1y = tri_ref[r0 : r0 + k, 4:5]
                e1z = tri_ref[r0 : r0 + k, 5:6]
                e2x = tri_ref[r0 : r0 + k, 6:7]
                e2y = tri_ref[r0 : r0 + k, 7:8]
                e2z = tri_ref[r0 : r0 + k, 8:9]

                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                f = 1.0 / a
                sx = ox - v0x
                sy = oy - v0y
                sz = oz - v0z
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (dx * qx + dy * qy + dz * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)

                valid = (
                    (jnp.abs(a) >= EPSILON)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > EPSILON)
                )
                t_masked = jnp.where(valid, t, jnp.inf)
                min_t = jnp.min(t_masked, axis=0, keepdims=True)
                rows = jax.lax.broadcasted_iota(jnp.int32, t_masked.shape, 0)
                min_row = jnp.min(
                    jnp.where(t_masked == min_t, rows, 2**30),
                    axis=0,
                    keepdims=True,
                )
                base = tri_ref[r0 : r0 + 1, 15:16].astype(jnp.int32)
                cur = t_ref[...]
                better = min_t < cur
                t_ref[...] = jnp.where(better, min_t, cur)
                idx_ref[...] = jnp.where(
                    better, base + min_row, idx_ref[...]
                )

    return kernel


def _dispatch_window(blk, cid, flags, rays, lim, t_in, i_in, pairs_tris,
                     k: int, group: int, bn: int, interpret: bool):
    w = blk.shape[0]
    n = rays.shape[1]
    ray_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, bn), lambda p, b, c, fl: (0, b[p]), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((6, bn), lambda p, b, c, fl: (0, b[p]),
                         memory_space=pltpu.VMEM),
            ray_spec(),
            ray_spec(),
            ray_spec(),
            pl.BlockSpec((group * k, 16), lambda p, b, c, fl: (c[p], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[ray_spec(), ray_spec()],
    )
    return pl.pallas_call(
        _pair_kernel(k, group, bn),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(blk, cid, flags, rays, lim, t_in, i_in, pairs_tris)


@functools.partial(
    jax.jit,
    static_argnames=("num_tris", "any_hit", "interpret", "window", "bn"),
)
def closest_hit_pairs(
    super_aabb,
    pairs_tris,
    ro,
    rd,
    active=None,
    t_max=None,
    num_tris: int | None = None,
    any_hit: bool = False,
    interpret: bool = False,
    window: int = WINDOW,
    bn: int = BN,
):
    """Pair-dispatch closest hit. Returns (t, idx); idx == -1 on miss.

    super_aabb: (Cs, 6); pairs_tris: (Cs*GROUP*K, 16) from
    build_pair_tables; ro/rd: (3, N) SoA or (N, 3) AoS (detected by shape).
    """
    del any_hit  # limit-based culling handles shadow rays uniformly
    if ro.shape[0] == 3 and ro.shape[1] != 3:
        rays = jnp.concatenate([ro, rd], axis=0)
    else:
        rays = jnp.concatenate([ro.T, rd.T], axis=0)
    n = rays.shape[1]
    cs = super_aabb.shape[0]
    k, group = PAIRS_K, PAIRS_GROUP
    assert pairs_tris.shape[0] == cs * group * k, (
        pairs_tris.shape, cs, group, k,
    )
    pad = (-n) % bn
    if active is None:
        active_l = jnp.ones((n,), bool)
    else:
        active_l = active
    limit0 = jnp.where(active_l, INF if t_max is None else t_max, -INF)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
        limit0 = jnp.pad(limit0, (0, pad), constant_values=-jnp.inf)
    np_ = rays.shape[1]
    nb = np_ // bn
    lim_row = limit0.reshape(1, np_)

    # --- Phase 1: per-block entry distance per super tile ------------------
    rb = rays.reshape(6, nb, bn)
    lim_b = limit0.reshape(nb, bn)

    # Adaptive phase-1 chunk: small scenes must not pay for padding to a
    # full 128-super chunk (measured 3.5x wasted slab work on an 11.8k-tri
    # scene whose 37 supers padded to 128).
    p1_chunk = PHASE1_CHUNK if cs >= PHASE1_CHUNK else max(8, -(-cs // 8) * 8)
    cpad = (-cs) % p1_chunk
    aabb = super_aabb
    if cpad:
        filler = jnp.concatenate(
            [jnp.full((cpad, 3), jnp.inf), jnp.full((cpad, 3), -jnp.inf)],
            axis=1,
        )
        aabb = jnp.concatenate([aabb, filler.astype(jnp.float32)], axis=0)
    n_chunks = aabb.shape[0] // p1_chunk
    aabb_chunks = aabb.reshape(n_chunks, p1_chunk, 6)

    def p1_step(_, chunk):
        o = rb[0:3][:, :, :, None]  # (3, nb, bn, 1)
        d = rb[3:6][:, :, :, None]
        mn = chunk[:, 0:3].T[:, None, None, :]  # (3, 1, 1, CC)
        mx = chunk[:, 3:6].T[:, None, None, :]
        t1 = (mn - o) / d
        t2 = (mx - o) / d
        tmin = jnp.minimum(t1, t2)
        tmax_ = jnp.maximum(t1, t2)
        tn = jnp.maximum(jnp.maximum(tmin[0], tmin[1]), tmin[2])
        tf = jnp.minimum(jnp.minimum(tmax_[0], tmax_[1]), tmax_[2])
        hit = (tf >= tn) & (tf >= 0.0) & (tn <= lim_b[:, :, None])
        tn = jnp.where(hit, tn, jnp.inf)
        return None, jnp.min(tn, axis=1)  # (nb, CC)

    _, block_tn = jax.lax.scan(p1_step, None, aabb_chunks)
    block_tn = jnp.moveaxis(block_tn, 0, 1).reshape(nb, n_chunks * p1_chunk)
    block_tn = block_tn[:, :cs]  # (nb, Cs); inf == no candidate

    # --- Flat entry-ordered pair list --------------------------------------
    col = jax.lax.broadcasted_iota(jnp.int32, block_tn.shape, 1)
    sorted_tn, sorted_cid = jax.lax.sort_key_val(block_tn, col, dimension=1)
    counts = jnp.sum(jnp.isfinite(block_tn), axis=1).astype(jnp.int32)
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
    )  # (nb+1,)
    total = off[-1]

    best_t0 = jnp.full((1, np_), INF)
    best_i0 = jnp.full((1, np_), -1, jnp.int32)
    lane_block = (jnp.arange(np_, dtype=jnp.int32) // bn).reshape(1, np_)
    # Zero-candidate blocks are never visited by the kernel even when they
    # fall inside a window's block range; exclude their lanes from merges.
    lane_has_pairs = (counts > 0)[lane_block[0]].reshape(1, np_)

    def cond(state):
        start, _, _ = state
        return start < total

    def body(state):
        start, t_buf, i_buf = state
        p = start + jnp.arange(window, dtype=jnp.int32)
        valid = p < total
        blk = jnp.searchsorted(off, p, side="right").astype(jnp.int32) - 1
        blk = jnp.clip(blk, 0, nb - 1)
        rank = jnp.clip(p - off[blk], 0, cs - 1)
        cid = sorted_cid[blk, rank]
        first = valid & ((p == start) | (rank == 0))
        flags = valid.astype(jnp.int32) | (first.astype(jnp.int32) << 1)

        t_out, i_out = _dispatch_window(
            blk, cid, flags, rays, lim_row, t_buf, i_buf, pairs_tris,
            k, group, bn, interpret,
        )
        # Blocks untouched by this window carry stale kernel output; the
        # window's blocks form a contiguous range (pairs are block-major).
        hi_p = jnp.minimum(total - 1, start + window - 1)
        b_lo = blk[0]
        b_hi = jnp.clip(
            jnp.searchsorted(off, hi_p, side="right").astype(jnp.int32) - 1,
            0,
            nb - 1,
        )
        m = (lane_block >= b_lo) & (lane_block <= b_hi) & lane_has_pairs
        t_buf = jnp.where(m, t_out, t_buf)
        i_buf = jnp.where(m, i_out, i_buf)
        return start + window, t_buf, i_buf

    _, best_t, best_idx = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_i0)
    )

    t = best_t[0, :n]
    idx = best_idx[0, :n]
    if num_tris is not None:
        idx = jnp.where(idx >= num_tris, -1, idx)
    idx = jnp.where(jnp.isfinite(t), idx, -1)
    t = jnp.where(active_l, t, INF)
    idx = jnp.where(active_l, idx, -1)
    return t, idx
