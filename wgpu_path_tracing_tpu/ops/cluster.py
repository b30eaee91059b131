"""Large-scene intersection: cluster dispatch.

Per-ray BVH walks are hostile to the TPU (per-lane dynamic gathers measured
~10 GB/s; a 262k-ray linked-BVH walk ran at 0.06 Mrays/s). The TPU-native
replacement keeps all hot work dense and block-shaped:

* BUILD (host): the BVH-sorted triangle array (already spatially coherent in
  depth-first order) is cut into fixed-size clusters of K consecutive
  triangles; each cluster gets an AABB. No pointers survive to the device —
  just (C, 6) bounds and a (C*K, 9) triangle table.
* PHASE 1 (device, dense): every ray tests every cluster AABB (a (rays x
  clusters) slab sweep, scanned in chunks), reduced per RAY-BLOCK of BN rays
  to: which clusters does any ray in this block enter, and at what nearest
  entry distance.
* ROUNDS (device): while any block has candidate clusters, each block takes
  its nearest remaining candidate and a Pallas kernel with scalar-prefetched
  cluster ids (pltpu.PrefetchScalarGridSpec) runs the dense Möller-Trumbore
  block: rays of block i x the K triangles of cluster cid[i] — one VMEM
  tile, no gathers. Early termination: a cluster is culled when its entry
  distance exceeds every lane's current best (children of a BVH region lie
  inside it, so this is exact); shadow rays (any_hit) shrink the limit to
  t_max as soon as any hit lands.

Matches the reference's closest-hit semantics (strict <, pt.wgsl:275);
cluster visit order cannot change the winner because all non-culled
candidates are processed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-6
INF = np.float32(np.inf)  # np, not jnp: module-level jnp constants init the backend at import

CLUSTER_K = 128  # triangles per cluster
BN = 1024  # rays per block
PHASE1_CHUNK = 128  # cluster AABBs per phase-1 scan step


def build_clusters(tri_isect: np.ndarray, k: int = CLUSTER_K):
    """Host: cut the BVH-sorted (T, 9) [v0, e1, e2] table into clusters.

    Returns (cluster_tris (C*k, 9) f32 zero-padded, cluster_aabb (C, 6) f32).
    Padding triangles are all-zero -> Möller-Trumbore 'a == 0' rejects them.
    """
    t = tri_isect.shape[0]
    c = max(1, -(-t // k))
    tris = np.zeros((c * k, 9), np.float32)
    tris[:t] = tri_isect
    aabb = np.zeros((c, 6), np.float32)
    v0 = tri_isect[:, 0:3]
    p1 = v0 + tri_isect[:, 3:6]
    p2 = v0 + tri_isect[:, 6:9]
    for i in range(c):
        lo, hi = i * k, min((i + 1) * k, t)
        if lo >= t:
            aabb[i, 0:3] = np.inf  # empty cluster: never hit
            aabb[i, 3:6] = -np.inf
            continue
        pts = np.concatenate([v0[lo:hi], p1[lo:hi], p2[lo:hi]])
        aabb[i, 0:3] = pts.min(axis=0)
        aabb[i, 3:6] = pts.max(axis=0)
    return tris, aabb


def _round_kernel(cid_ref, active_ref, ray_ref, tri_ref, tin_ref, iin_ref,
                  t_ref, idx_ref):
    """One dispatch step: rays of block i x the K triangles of its j-th
    chosen cluster. Same math as pallas_kernels._brute_kernel."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    # The output block is revisited across j; seed it from the incoming
    # best on the first step, then accumulate in place.
    cur_t = jnp.where(j == 0, tin_ref[...], t_ref[...])
    cur_i = jnp.where(j == 0, iin_ref[...], idx_ref[...])

    @pl.when(active_ref[i, j] == 0)
    def _():
        t_ref[...] = cur_t
        idx_ref[...] = cur_i

    @pl.when(active_ref[i, j] != 0)
    def _():
        ox = ray_ref[0:1, :]
        oy = ray_ref[1:2, :]
        oz = ray_ref[2:3, :]
        dx = ray_ref[3:4, :]
        dy = ray_ref[4:5, :]
        dz = ray_ref[5:6, :]

        v0x = tri_ref[:, 0:1]
        v0y = tri_ref[:, 1:2]
        v0z = tri_ref[:, 2:3]
        e1x = tri_ref[:, 3:4]
        e1y = tri_ref[:, 4:5]
        e1z = tri_ref[:, 5:6]
        e2x = tri_ref[:, 6:7]
        e2y = tri_ref[:, 7:8]
        e2z = tri_ref[:, 8:9]

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
            jnp.where(t_masked == min_t, rows, 2**30), axis=0, keepdims=True
        )
        better = min_t < cur_t
        t_ref[...] = jnp.where(better, min_t, cur_t)
        idx_ref[...] = jnp.where(
            better, cid_ref[i, j] * tri_ref.shape[0] + min_row, cur_i
        )


def _dispatch_round(cids, block_active, rays, cluster_tris, best_t, best_idx,
                    k: int, interpret: bool):
    """cids/block_active: (NB, S) — each ray block processes its S chosen
    clusters in consecutive grid steps (output block stays VMEM-resident
    across the inner s axis)."""
    nb, s = cids.shape
    n = rays.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, s),
        in_specs=[
            pl.BlockSpec((6, BN), lambda i, j, cids, act: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 9), lambda i, j, cids, act: (cids[i, j], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j, cids, act: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j, cids, act: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BN), lambda i, j, cids, act: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j, cids, act: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    t_out, i_out = pl.pallas_call(
        _round_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(cids, block_active, rays, cluster_tris, best_t, best_idx)
    return t_out, i_out


@functools.partial(
    jax.jit, static_argnames=("k", "interpret", "max_rounds")
)
def closest_hit_cluster(
    cluster_aabb,
    cluster_tris,
    ro,
    rd,
    active=None,
    t_max=None,
    num_tris: int | None = None,
    k: int | None = None,
    any_hit: bool = False,
    interpret: bool = False,
    max_rounds: int = 0,
):
    """Cluster-dispatch closest hit. Returns (t, idx); idx == -1 on miss.

    cluster_aabb: (C, 6); cluster_tris: (C*k, 9); ro/rd: (3, N) SoA or
    (N, 3) AoS (detected by shape). k defaults to the table ratio.
    """
    if k is None:
        k = cluster_tris.shape[0] // cluster_aabb.shape[0]
    del any_hit  # the limit-based culling handles shadow rays uniformly
    if ro.shape[0] == 3 and ro.shape[1] != 3:
        rays = jnp.concatenate([ro, rd], axis=0)
    else:
        rays = jnp.concatenate([ro.T, rd.T], axis=0)
    n = rays.shape[1]
    c = cluster_aabb.shape[0]
    pad = (-n) % BN
    if active is None:
        active_l = jnp.ones((n,), bool)
    else:
        active_l = active
    limit0 = jnp.where(active_l, INF if t_max is None else t_max, -INF)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
        limit0 = jnp.pad(limit0, (0, pad), constant_values=-jnp.inf)
    np_ = rays.shape[1]
    nb = np_ // BN

    # --- Phase 1: block-level cluster summaries ---------------------------
    rb = rays.reshape(6, nb, BN)
    lim_b = limit0.reshape(nb, BN)

    cpad = (-c) % PHASE1_CHUNK
    aabb = cluster_aabb
    if cpad:
        filler = jnp.concatenate(
            [jnp.full((cpad, 3), jnp.inf), jnp.full((cpad, 3), -jnp.inf)], axis=1
        )
        aabb = jnp.concatenate([aabb, filler.astype(jnp.float32)], axis=0)
    n_chunks = aabb.shape[0] // PHASE1_CHUNK
    aabb_chunks = aabb.reshape(n_chunks, PHASE1_CHUNK, 6)

    def p1_step(_, chunk):
        # (nb, BN, CC) slab tests
        o = rb[0:3][:, :, :, None]  # (3, nb, BN, 1)
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
        block_tn = jnp.min(tn, axis=1)  # (nb, CC)
        return None, block_tn

    _, block_tn = jax.lax.scan(p1_step, None, aabb_chunks)
    block_tn = jnp.moveaxis(block_tn, 0, 1).reshape(nb, n_chunks * PHASE1_CHUNK)
    block_tn = block_tn[:, :c]  # (nb, C); inf == no candidate

    # --- Rounds ------------------------------------------------------------
    best_t0 = jnp.full((1, np_), INF)
    best_i0 = jnp.full((1, np_), -1, jnp.int32)

    def cond(state):
        block_tn, best_t, best_idx, rounds = state
        if max_rounds:
            return jnp.any(jnp.isfinite(block_tn)) & (rounds < max_rounds)
        return jnp.any(jnp.isfinite(block_tn))

    S_PER_ROUND = 8

    def body(state):
        block_tn, best_t, best_idx, rounds = state
        # Per-ray limit: anything beyond the current best (or the shadow
        # bound, already folded into limit0) cannot matter.
        limit = jnp.minimum(best_t.reshape(nb, BN), lim_b)
        block_limit = jnp.max(limit, axis=1)  # (nb,)
        block_tn = jnp.where(
            block_tn <= block_limit[:, None], block_tn, jnp.inf
        )
        # Take up to S nearest candidates per block this round (culling
        # refreshes between rounds; within a round slight over-processing
        # is possible but harmless).
        col_iota = jax.lax.broadcasted_iota(jnp.int32, block_tn.shape, 1)
        cids, acts = [], []
        for _ in range(S_PER_ROUND):
            cid = jnp.argmin(block_tn, axis=1).astype(jnp.int32)
            has = jnp.isfinite(jnp.min(block_tn, axis=1))
            safe_cid = jnp.where(has, cid, 0)
            cids.append(safe_cid)
            acts.append(has.astype(jnp.int32))
            block_tn = jnp.where(
                (col_iota == safe_cid[:, None]) & has[:, None],
                jnp.inf,
                block_tn,
            )
        t_new, i_new = _dispatch_round(
            jnp.stack(cids, axis=1), jnp.stack(acts, axis=1), rays,
            cluster_tris, best_t, best_idx, k, interpret,
        )
        return block_tn, t_new, i_new, rounds + 1

    _, best_t, best_idx, _ = jax.lax.while_loop(
        cond, body, (block_tn, best_t0, best_i0, jnp.int32(0))
    )

    t = best_t[0, :n]
    idx = best_idx[0, :n]
    if num_tris is not None:
        idx = jnp.where(idx >= num_tris, -1, idx)
    idx = jnp.where(jnp.isfinite(t), idx, -1)
    # Inactive lanes ride along in the block kernels; mask them out here.
    t = jnp.where(active_l, t, INF)
    idx = jnp.where(active_l, idx, -1)
    return t, idx
