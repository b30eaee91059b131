"""Large-scene intersection v3: in-kernel block-synchronous wide-BVH walk.

One Pallas grid step = one ray block's ENTIRE traversal. All tables are
VMEM-resident (constant index maps — loaded once, reused across steps), so
the per-step floor (~0.4-1.2 us, measured round 2) and the per-pair DMA
latency wall (~10 GB/s at 4 KB tiles) that bounded ops/pairs.py disappear;
what remains is pure VPU work proportional to the nodes/clusters the ray
block actually needs, with LIVE per-ray closest-t culling at every level of
the hierarchy — the in-path culling flat pair lists cannot express
(TODO.md: per-ray-perfect flat lists still test ~3.3k tris/ray vs a true
ordered walk's ~108).

Shapes (v5e vreg = 8 sublanes x 128 lanes):

* rays ride SUBLANES: the (bn, 16) block holds [o, d, 1/d] per ray row;
* an interior visit tests 8 children on LANES: (bn, 8) slab ops;
* a leaf visit tests a 128-slot triangle group on LANES: (bn, 128)
  Moller-Trumbore, gated per (leaf_slots/sub)-slot sub-cluster by a
  sub-box entry test (static lane slices) so narrow hits pay only the
  entered sub-clusters' VPU work;
* the DFS stack is a scalar SMEM array shared by the whole block (entries:
  >= 0 interior wide-node id, < 0 leaf group -(g+1)).

Traversal order is stack order (children pushed lane 7 -> 0, so lane 0
pops first); correctness does not depend on it (culling is exact: a
subtree's triangles lie inside its box, and the winner uses strict <
like pt.wgsl:275). Misses return (inf, -1).

Reference counterpart: traverseBVH's per-thread stack walk
(pt.wgsl:248-296); this kernel is its TPU-native reshape — one stack per
1024-lane ray block instead of per thread, hierarchy collapsed 8-wide so
the per-visit work is a full vector op, triangles pre-swizzled into
lane-major slabs (accel/bvh8.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgpu_path_tracing_tpu.accel.bvh8 import LEAF_SLOTS, SUB, WIDTH, group_rows

EPSILON = 1e-6
INF = np.float32(np.inf)

BN = 1024  # rays per block (one grid step)
MAX_STACK = 512


def _walk_kernel(bn: int, max_stack: int, stats: bool,
                 leaf_slots: int = LEAF_SLOTS, sub: int = SUB):
    sub_w = leaf_slots // sub
    grows = group_rows(sub)

    def kernel(meta_ref, ord_ref, rays_ref, lim_ref, box_ref, tri_ref,
               t_out, i_out, *rest):
        if stats:
            (stat_out, best_t, best_i, limcur, ctn, oct_s, wb, stack,
             stack_tn) = rest
        else:
            (best_t, best_i, limcur, ctn, oct_s, wb, stack,
             stack_tn) = rest
            stat_out = None
        # Lane-major per-ray state: every (1, bn) op costs bn/1024 vregs
        # (the (bn, 1) sublane-major layout costs 16x more — measured).
        ox = rays_ref[0:1, :]
        oy = rays_ref[1:2, :]
        oz = rays_ref[2:3, :]
        dx = rays_ref[3:4, :]
        dy = rays_ref[4:5, :]
        dz = rays_ref[5:6, :]
        ix = rays_ref[6:7, :]
        iy = rays_ref[7:8, :]
        iz = rays_ref[8:9, :]
        lim0 = lim_ref[...]

        best_t[...] = jnp.full((1, bn), INF)
        best_i[...] = jnp.full((1, bn), -1, jnp.int32)
        limcur[...] = lim0
        wb[0] = jnp.max(lim0)  # block-max live limit (pop-time culling)
        # Majority ray-direction octant selects the precomputed child push
        # order (one vector->scalar handoff per block).
        half = jnp.float32(bn / 2)
        b0 = jnp.sum((dx < 0).astype(jnp.float32)) > half
        b1 = jnp.sum((dy < 0).astype(jnp.float32)) > half
        b2 = jnp.sum((dz < 0).astype(jnp.float32)) > half
        oct_s[0] = (
            b0.astype(jnp.int32)
            + 2 * b1.astype(jnp.int32)
            + 4 * b2.astype(jnp.int32)
        ) * WIDTH
        stack[0] = jnp.int32(0)
        stack_tn[0] = jnp.float32(-jnp.inf)

        def entry_tn(slab, rows):
            # slab: (rows, 8) child-major bounds rows [min3|max3]; returns
            # (rows, 1) block-min entry distance (inf = no ray enters).
            mnx = slab[:, 0:1]
            mny = slab[:, 1:2]
            mnz = slab[:, 2:3]
            mxx = slab[:, 3:4]
            mxy = slab[:, 4:5]
            mxz = slab[:, 5:6]
            t1x = (mnx - ox) * ix
            t2x = (mxx - ox) * ix
            t1y = (mny - oy) * iy
            t2y = (mxy - oy) * iy
            t1z = (mnz - oz) * iz
            t2z = (mxz - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            enter = (tf >= tn) & (tf >= 0.0) & (tn <= limcur[...])
            return jnp.min(
                jnp.where(enter, tn, INF), axis=1, keepdims=True
            )

        oc = oct_s[0] // WIDTH  # octant index
        oc8 = oct_s[0]  # octant * WIDTH (ordered-meta row base)

        def body(carry):
            sp, n_int, n_leaf, n_sub = carry
            node = stack[sp - 1]
            tn_pushed = stack_tn[sp - 1]
            sp = sp - 1
            # Pop-time culling: everything in this subtree is farther than
            # the worst live per-ray limit recorded since the push.
            live = tn_pushed <= wb[0]
            is_interior = live & (node >= 0)
            is_leaf = live & (node < 0)
            safe_nid = jnp.where(node >= 0, node, 0)

            @pl.when(is_interior)
            def _interior():
                # Octant-ordered slab: row k = k-th child in push order.
                slab = box_ref[pl.ds((safe_nid * WIDTH + oc) * WIDTH, 8), :]
                ctn[...] = entry_tn(slab, WIDTH)  # (8, 1), push order

            @pl.when(is_leaf)
            def _leaf():
                g = -node - 1
                r0 = g * grows
                # Sub-cluster boxes: rows 10..10+sub, bounds on lanes 0..5.
                sb = tri_ref[pl.ds(r0 + 10, sub), 0:8]  # (sub, 8)
                sub_tn = entry_tn(sb, sub)  # (sub, 1)
                if sub < WIDTH:
                    sub_tn = jnp.concatenate(
                        [sub_tn, jnp.full((WIDTH - sub, 1), INF)], axis=0
                    )
                ctn[...] = sub_tn

            n_int = n_int + is_interior.astype(jnp.int32)
            n_leaf = n_leaf + is_leaf.astype(jnp.int32)

            # Leaf: Moller-Trumbore per entered sub-cluster.
            for c in range(sub):
                hit_sub = is_leaf & (ctn[c, 0] < INF)
                n_sub = n_sub + hit_sub.astype(jnp.int32)

                @pl.when(hit_sub)
                def _mt(c=c):
                    g = -node - 1
                    r0 = g * grows
                    lo, hi = c * sub_w, (c + 1) * sub_w
                    slab = tri_ref[pl.ds(r0, 10), lo:hi]  # (10, 32)
                    tr = jnp.swapaxes(slab, 0, 1)  # (32, 10): tri-major
                    v0x = tr[:, 0:1]
                    v0y = tr[:, 1:2]
                    v0z = tr[:, 2:3]
                    e1x = tr[:, 3:4]
                    e1y = tr[:, 4:5]
                    e1z = tr[:, 5:6]
                    e2x = tr[:, 6:7]
                    e2y = tr[:, 7:8]
                    e2z = tr[:, 8:9]
                    gidx = tr[:, 9:10]

                    hx = dy * e2z - dz * e2y
                    hy = dz * e2x - dx * e2z
                    hz = dx * e2y - dy * e2x
                    a = e1x * hx + e1y * hy + e1z * hz
                    fInv = 1.0 / a
                    sx = ox - v0x
                    sy = oy - v0y
                    sz = oz - v0z
                    u = fInv * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = fInv * (dx * qx + dy * qy + dz * qz)
                    tt = fInv * (e2x * qx + e2y * qy + e2z * qz)
                    valid = (
                        (jnp.abs(a) >= EPSILON)
                        & (u >= 0.0)
                        & (u <= 1.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (tt > EPSILON)
                        & (gidx >= 0.0)
                    )
                    t_masked = jnp.where(valid, tt, INF)  # (32, bn)
                    min_t = jnp.min(t_masked, axis=0, keepdims=True)
                    idx_m = jnp.where(t_masked == min_t, gidx, INF)
                    min_idx = jnp.min(idx_m, axis=0, keepdims=True)
                    cur = best_t[...]
                    better = min_t < cur
                    new_t = jnp.where(better, min_t, cur)
                    best_t[...] = new_t
                    best_i[...] = jnp.where(
                        better, min_idx.astype(jnp.int32), best_i[...]
                    )
                    lc = jnp.minimum(new_t, lim0)
                    limcur[...] = lc
                    wb[0] = jnp.max(lc)

            # Interior: push entered children in the precomputed
            # far-to-near octant order (LIFO pops nearest first). ctn is
            # already in push order (octant-ordered slabs), so each child
            # costs one static ctn read + one ordered-meta read.
            for k in range(WIDTH):
                tn_c = ctn[k, 0]
                m = ord_ref[safe_nid, oc8 + k]
                do_push = is_interior & (tn_c < INF) & (m != 0)
                old_n = stack[sp]
                old_t = stack_tn[sp]
                stack[sp] = jnp.where(do_push, m, old_n)
                stack_tn[sp] = jnp.where(do_push, tn_c, old_t)
                sp = sp + do_push.astype(jnp.int32)

            return sp, n_int, n_leaf, n_sub

        _, n_int, n_leaf, n_sub = jax.lax.while_loop(
            lambda c: c[0] > 0,
            body,
            (jnp.int32(1), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )

        t_out[...] = best_t[...]
        i_out[...] = best_i[...]
        if stats:
            stat_out[0:1, :] = jnp.full((1, 128), n_int, jnp.int32)
            stat_out[1:2, :] = jnp.full((1, 128), n_leaf, jnp.int32)
            stat_out[2:3, :] = jnp.full((1, 128), n_sub, jnp.int32)
            stat_out[3:4, :] = jnp.full((1, 128), n_int + n_leaf, jnp.int32)
            stat_out[4:8, :] = jnp.zeros((4, 128), jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_tris", "any_hit", "interpret", "bn", "stats",
                     "leaf_slots", "sub"),
)
def closest_hit_walk(
    walk_meta,
    walk_order,
    walk_boxes,
    walk_tris,
    ro,
    rd,
    active=None,
    t_max=None,
    num_tris: int | None = None,
    any_hit: bool = False,
    interpret: bool = False,
    bn: int = BN,
    stats: bool = False,
    leaf_slots: int = LEAF_SLOTS,
    sub: int = SUB,
):
    """Wide-BVH block walk closest hit. Returns (t, idx); idx == -1 on miss.

    walk_meta (Nn, 8) i32, walk_order (Nn, 64) i32, walk_boxes (Nn*64, 8)
    f32, walk_tris (Ng*group_rows(sub), 128) f32 from accel/bvh8.py;
    ro/rd: (3, N) SoA or (N, 3) AoS.
    """
    del any_hit  # limit-based culling handles shadow rays uniformly
    if ro.shape[0] == 3 and ro.shape[1] != 3:
        ro3, rd3 = ro, rd
    else:
        ro3, rd3 = ro.T, rd.T
    n = ro3.shape[1]
    if active is None:
        active_l = jnp.ones((n,), bool)
    else:
        active_l = active
    limit0 = jnp.where(active_l, INF if t_max is None else t_max, -INF)

    pad = (-n) % bn
    if pad:
        ro3 = jnp.pad(ro3, ((0, 0), (0, pad)))
        rd3 = jnp.pad(rd3, ((0, 0), (0, pad)), constant_values=1.0)
        limit0 = jnp.pad(limit0, (0, pad), constant_values=-INF)
    np_ = ro3.shape[1]
    nb = np_ // bn

    rays = jnp.concatenate(
        [ro3, rd3, 1.0 / rd3, jnp.zeros((7, np_), ro3.dtype)], axis=0
    )  # (16, np_): o, d, 1/d component rows, rays on lanes
    lim = limit0.reshape(1, np_)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((16, bn), lambda p, m, o: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda p, m, o: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(walk_boxes.shape, lambda p, m, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(walk_tris.shape, lambda p, m, o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bn), lambda p, m, o: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda p, m, o: (0, p),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((8, 128), lambda p, m, o: (0, p),
                           memory_space=pltpu.VMEM)] if stats else []),
        scratch_shapes=[
            pltpu.VMEM((1, bn), jnp.float32),  # best_t
            pltpu.VMEM((1, bn), jnp.int32),  # best_i
            pltpu.VMEM((1, bn), jnp.float32),  # limcur = min(best_t, lim0)
            pltpu.VMEM((WIDTH, 1), jnp.float32),  # per-child block entry tn
            pltpu.SMEM((1,), jnp.int32),  # octant * WIDTH (push-order base)
            pltpu.SMEM((1,), jnp.float32),  # worst live limit (pop culling)
            pltpu.SMEM((MAX_STACK,), jnp.int32),  # DFS stack: node ids
            pltpu.SMEM((MAX_STACK,), jnp.float32),  # entry tn at push
        ],
    )
    outs = pl.pallas_call(
        _walk_kernel(bn, MAX_STACK, stats, leaf_slots, sub),
        grid_spec=grid_spec,
        # The scene tables are deliberately VMEM-resident (loaded once,
        # reused every grid step); v5e has 128 MiB of VMEM, well above the
        # 16 MiB default scoped limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
        ] + ([jax.ShapeDtypeStruct((8, nb * 128), jnp.int32)]
             if stats else []),
        interpret=interpret,
    )(walk_meta, walk_order, rays, lim, walk_boxes, walk_tris)
    t_row, i_row = outs[0], outs[1]

    t = t_row[0, :n]
    idx = i_row[0, :n]
    if num_tris is not None:
        idx = jnp.where(idx >= num_tris, -1, idx)
    idx = jnp.where(jnp.isfinite(t), idx, -1)
    t = jnp.where(active_l, t, INF)
    idx = jnp.where(active_l, idx, -1)
    if stats:
        st = outs[2].reshape(8, nb, 128)[0:4, :, 0]  # (4, nb)
        return t, idx, st
    return t, idx
