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

``paged=True`` lifts the VMEM ceiling on scene size: the triangle slabs
stay in HBM and each visited leaf group's slab is DMA'd into a
double-buffered VMEM ring, prefetched one iteration ahead (the top
``pops`` stack entries at push time are exactly the next iteration's
pops). Measured bit-identical at +3.2% on the 103k scene — the DMA hides
behind the per-visit gate+MT work (BASELINE.md). The interior tables
still ride VMEM (boxes — canonical octant-0 rows only in paged width-8
mode, an 8x cut; the push loop permutes instead) and SMEM (order:
canonical int16 metas + eight 24-bit octant permutation words = 12 i32
words/node since round 4; SMEM's 1 MB — holding 2x the table, Mosaic
double-buffers prefetched operands — bounds the tree at ~10.2k wide
nodes ≈ 2.7M triangles, up from the int16-pair layout's ~3.8k/1M;
ops/intersect.py gates selection on all bounds).

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

from wgpu_path_tracing_tpu.accel.bvh8 import (
    LEAF_SLOTS,
    MAX_STACK,
    SUB,
    WIDTH,
    group_rows,
)

EPSILON = 1e-6
INF = np.float32(np.inf)

BN = 2048  # rays per block. 4096 measured best on camera-coherent sweeps
# (104.4 ms vs 117.3 at bn=1024), but production calls are dominated by
# in-pipeline bounce rays whose incoherent block unions visit most of the
# tree; there bn=2048 won ~10% on BOTH scene classes (round-3 in-process
# A/B on real bounce-2 rays) — smaller unions beat fewer blocks.
WAYS = 1  # independent blocks interleaved per grid step; >1 measured a
# wash on the 103k sweep (cost tracks visits, not handoffs) — kept as a
# tested knob for scenes with different visit/VPU balance
POPS = 2  # stack entries processed per while-loop iteration UNDER ONE
# scalar<->vector sync point: all pops read the stack before any of the
# iteration's pushes, every entry's gate test issues back-to-back in one
# vector phase, and the scalar core waits once for the last packed word.
# This is NOT the rejected round-2 unrolling (which chained K full
# pop->test->push visits and kept K sync points; TODO.md). Measured
# in-process A/B (round 3): +42% on the 48-node glass tree (58.7 ms vs
# 84.9 at pops=1), within noise on the 356-node 103k tree; pops>=4
# REJECTED on both (2x slower — the longer serialized body eats the
# fused-sync win). Production selection is per scene via
# accel.bvh8.pops_for_tree (unconditionally 2; a tree too deep for the
# pops=2 stack bound has its walk tables omitted at build time and auto
# selection falls back to the pair dispatch — models/types.py).


def slab_entry(slab, ox, oy, oz, ix, iy, iz, lim):
    """Shared slab (AABB) entry test over bounds rows — the one
    intersection-math definition for the walk AND phased kernels (their
    exactness equivalence is load-bearing for kernel selection, so an
    edit here changes both together). slab: (rows, 8) child/sub-cluster
    bounds rows [min3|max3|pad2]; o/i*: (1, bn) ray origins and NaN-safe
    reciprocal directions; lim: (1, bn) per-lane t limit. Returns
    (tn (rows, bn) entry distances, enter (rows, bn) bool)."""
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
    enter = (tf >= tn) & (tf >= 0.0) & (tn <= lim)
    return tn, enter


def mt_subcluster(tri_ref, r0, lo, hi, ox, oy, oz, dx, dy, dz):
    """Shared Moller-Trumbore over one sub-cluster lane slice of a leaf
    slab (pt.wgsl:176-204 semantics; the one MT definition for the walk
    AND phased kernels — see slab_entry). tri_ref rows r0..r0+9 hold
    [v0, e1, e2, global-index] on lanes; lanes [lo, hi) are the
    sub-cluster. Returns (min_t (1, bn), min_idx_f (1, bn)) — the
    winning t (INF = miss) and its f32 global triangle index (INF on
    miss; ties break to the smallest index, matching brute)."""
    slab = tri_ref[pl.ds(r0, 10), lo:hi]
    tr = jnp.swapaxes(slab, 0, 1)  # (sub_w, 10)
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
    t_masked = jnp.where(valid, tt, INF)
    min_t = jnp.min(t_masked, axis=0, keepdims=True)
    idx_m = jnp.where(t_masked == min_t, gidx, INF)
    min_idx = jnp.min(idx_m, axis=0, keepdims=True)
    return min_t, min_idx


def _walk_kernel(bn: int, max_stack: int, stats: bool,
                 leaf_slots: int = LEAF_SLOTS, sub: int = SUB,
                 ways: int = 1, any_hit: bool = False, pops: int = POPS,
                 width: int = WIDTH, paged: bool = False):
    sub_w = leaf_slots // sub
    grows = group_rows(sub)

    def kernel(ord_ref, rays_ref, lim_ref, box_ref, tri_ref,
               t_out, i_out, *rest):
        if paged:
            *rest, tri_slab, dma_sem = rest
        else:
            tri_slab = dma_sem = None
        if stats:
            (stat_out, best_t, best_i, limcur, oct_s, pk, wbq, stack,
             stack_tq) = rest
        else:
            (best_t, best_i, limcur, oct_s, pk, wbq, stack,
             stack_tq) = rest
            stat_out = None

        def slot_base(w, parity, k):
            # Double-buffered slab ring: per way, ``pops`` slots per
            # parity. The product form keeps the row base provably
            # grows-aligned for Mosaic's dynamic sublane loads; parity is
            # a Python int during the warm-up prefetch, traced afterwards.
            idx = ((w * 2 + parity) * pops + k) * grows
            return idx if isinstance(idx, int) else pl.multiple_of(
                idx, grows
            )

        def slab_dma(w, parity, k, g):
            # One leaf group's whole slab (grows x lanes, ~16 KB):
            # HBM -> VMEM ring slot. Started at push-peek time (end of
            # the PREVIOUS iteration), waited right before the sub-box
            # gate, so the transfer overlaps an iteration of compute.
            return pltpu.make_async_copy(
                tri_ref.at[pl.ds(g * grows, grows), :],
                tri_slab.at[pl.ds(slot_base(w, parity, k), grows), :],
                dma_sem.at[w, parity * pops + k],
            )

        def peek_and_start(w, parity, sp):
            # Prefetch the slabs the NEXT iteration's pops will need: the
            # top ``pops`` stack entries are exactly what it pops, and the
            # stack does not change until its own push phase. The start
            # predicate (valid slot holding a leaf) is recomputed
            # bit-identically at wait time so every started DMA is waited
            # exactly once — pop-time CULLING must not skip the wait.
            for k in range(pops):
                pos = sp - 1 - k
                nd = stack[w, jnp.maximum(pos, 0)]

                @pl.when((pos >= 0) & (nd < 0))
                def _start(w=w, parity=parity, k=k, nd=nd):
                    slab_dma(w, parity, k, -nd - 1).start()

        # ``ways`` independent ray blocks walk the tree concurrently inside
        # one grid step, each with its own stack/limit/octant state. The
        # per-visit serial chain (pop -> slab test -> reduce -> scalar push)
        # is LATENCY-bound, not VPU-bound; interleaving the ways' chains in
        # program order lets way B's vector work issue while way A's scalar
        # phase waits on its reduce, hiding most of the handoff latency.
        class Way:
            pass

        wv = []
        for w in range(ways):
            s = slice(w * bn, (w + 1) * bn)
            y = Way()
            # Lane-major per-ray state: every (1, bn) op costs bn/1024
            # vregs (the (bn, 1) sublane layout costs 16x more — measured).
            y.s = s
            y.ox = rays_ref[0:1, s]
            y.oy = rays_ref[1:2, s]
            y.oz = rays_ref[2:3, s]
            y.dx = rays_ref[3:4, s]
            y.dy = rays_ref[4:5, s]
            y.dz = rays_ref[5:6, s]
            y.ix = rays_ref[6:7, s]
            y.iy = rays_ref[7:8, s]
            y.iz = rays_ref[8:9, s]
            y.lim0 = lim_ref[0:1, s]
            wv.append(y)

        for w, y in enumerate(wv):
            best_t[0:1, y.s] = jnp.full((1, bn), INF)
            best_i[0:1, y.s] = jnp.full((1, bn), -1, jnp.int32)
            limcur[0:1, y.s] = y.lim0
            # Block-max live limit for pop-time culling, kept as a 16-bit
            # MONOTONIC KEY: for x >= 0, float32 bit patterns order like
            # the values, so (bits >> 16) is an order-preserving,
            # round-down quantization. Entry distances are stored
            # round-down and the limit round-up, so the quantized compare
            # never culls a subtree the exact compare would keep.
            # (bitcast before the max reduce: integer max of the bit
            # patterns IS the max's pattern, and Mosaic only lowers vector
            # bitcasts.)
            wbq[w] = (
                jnp.max(
                    jax.lax.bitcast_convert_type(
                        jnp.maximum(y.lim0, 0.0), jnp.int32
                    )
                )
                + 0xFFFF
            ) >> 16
            # Majority ray-direction octant selects the precomputed child
            # push order (one vector->scalar handoff per block).
            half = jnp.float32(bn / 2)
            b0 = jnp.sum((y.dx < 0).astype(jnp.float32)) > half
            b1 = jnp.sum((y.dy < 0).astype(jnp.float32)) > half
            b2 = jnp.sum((y.dz < 0).astype(jnp.float32)) > half
            oct_s[w] = (
                b0.astype(jnp.int32)
                + 2 * b1.astype(jnp.int32)
                + 4 * b2.astype(jnp.int32)
            ) * width
            stack[w, 0] = jnp.int32(0)
            stack_tq[w, 0] = jnp.int32(0)
            y.oc = oct_s[w] // width  # octant (hoisted out of the walk)
            y.oc8 = oct_s[w]  # octant * width (ordered-meta row base)

        if paged:
            # Warm-up prefetch for iteration 0 (parity 0): the stack holds
            # only the root (interior), so this usually starts nothing,
            # but the predicate is the same one every iteration uses.
            for w in range(ways):
                peek_and_start(w, 0, jnp.int32(1))

        def entry_tn(y, slab):
            # slab: (rows, 8) child-major bounds rows [min3|max3]; returns
            # (rows, 1) block-min entry distance (inf = no ray enters).
            # Math shared with the phased kernel via module-level
            # slab_entry — their exactness equivalence is load-bearing.
            tn, enter = slab_entry(
                slab, y.ox, y.oy, y.oz, y.ix, y.iy, y.iz,
                limcur[0:1, y.s],
            )
            return jnp.min(
                jnp.where(enter, tn, INF), axis=1, keepdims=True
            )

        def leaf_gate(w, y, om, src, row0):
            # The ONE sub-box gate definition for both residencies (the
            # paged/resident bit-identity contract is load-bearing for
            # kernel selection): slab rows row0+16..row0+16+sub hold the
            # sub-cluster boxes on lanes 0..5; writes the entered bitmask
            # to the entry's packed-word SMEM slot.
            sb = src[pl.ds(row0 + 16, sub), 0:8]
            sub_tn = entry_tn(y, sb)  # (sub, 1)
            ccol = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
            pk[w, om] = jnp.sum(
                jnp.where(sub_tn < INF, jnp.int32(1) << ccol, 0)
            )

        class Entry:
            pass

        def one_pass(carry):
            sps = list(carry[:ways])
            if paged:
                it = carry[ways]
                parity = it & 1
                n_int, n_leaf, n_sub = carry[ways + 1:]
            else:
                parity = None
                n_int, n_leaf, n_sub = carry[ways:]

            # Phase 1 (scalar): pop the top ``pops`` entries per way in one
            # go. All pops read the stack BEFORE any of this iteration's
            # pushes, so the serializing pop->push scalar chain runs once
            # per ITERATION, not once per visit.
            for w, y in enumerate(wv):
                y.ent = []
                sp = sps[w]
                for k in range(pops):
                    pos = sp - 1 - k
                    safe_pos = jnp.maximum(pos, 0)
                    e = Entry()
                    e.node = stack[w, safe_pos]
                    # Pop-time culling (quantized keys): the subtree is
                    # farther than the worst live per-ray limit at push time.
                    e.live = (pos >= 0) & (stack_tq[w, safe_pos] <= wbq[w])
                    e.is_interior = e.live & (e.node >= 0)
                    e.is_leaf = e.live & (e.node < 0)
                    # Paged mode: a slab DMA was started for this slot iff
                    # it held a leaf, INDEPENDENT of pop-time culling —
                    # the wait predicate must match the start predicate.
                    e.fetched = (pos >= 0) & (e.node < 0)
                    e.safe_nid = jnp.where(e.node >= 0, e.node, 0)
                    y.ent.append(e)
                    n_int = n_int + e.is_interior.astype(jnp.int32)
                    n_leaf = n_leaf + e.is_leaf.astype(jnp.int32)
                sps[w] = jnp.maximum(sp - pops, 0)

            # Phase 2 (vector, async): every entry's gate test issues
            # back-to-back with NO intervening scalar reads of the results;
            # each writes its own SMEM slot (one entered bitmask + four
            # packed 16-bit entry keys at pk[w, k*8..k*8+4]), and the
            # scalar core waits ONCE (phase 3's first read) for all of
            # them — the single shared sync point the round-2 microbenches
            # showed packed work needs to amortize.
            for w, y in enumerate(wv):
                for k, e in enumerate(y.ent):
                    o = k * width
                    om = o + width // 2  # entered-bitmask SMEM slot

                    @pl.when(e.is_interior)
                    def _interior(w=w, y=y, e=e, o=o, om=om):
                        # Octant-ordered slab: row k = k-th child in push
                        # order. Node stride is OCTANTS(8) x width rows.
                        # Canonical (paged width-8) mode stores octant-0
                        # rows ONLY (8x VMEM cut); the push loop permutes
                        # at push time instead, so gate keys/bits are in
                        # CANONICAL row order there.
                        if paged and width == 8:
                            slab = box_ref[
                                pl.ds(e.safe_nid * width, width), :
                            ]
                        else:
                            slab = box_ref[
                                pl.ds((e.safe_nid * 8 + y.oc) * width,
                                      width), :
                            ]
                        tn = entry_tn(y, slab)  # (width, 1), push order
                        kcol = jax.lax.broadcasted_iota(
                            jnp.int32, (width, 1), 0
                        )
                        pk[w, om] = jnp.sum(
                            jnp.where(tn < INF, jnp.int32(1) << kcol, 0)
                        )
                        q = (
                            jax.lax.bitcast_convert_type(
                                jnp.maximum(tn, 0.0), jnp.int32
                            )
                            >> 16
                        )  # round-down 16-bit keys (q <= tn in key order)
                        val = jnp.where(kcol % 2 == 0, q, q << 16)
                        for wd in range(width // 2):
                            pk[w, o + wd] = jnp.sum(
                                jnp.where(kcol // 2 == wd, val, 0)
                            )

                    if not paged:

                        @pl.when(e.is_leaf)
                        def _leaf(w=w, y=y, e=e, om=om):
                            # Sub-cluster boxes: rows 16..16+sub
                            # (8-aligned), lanes 0..5.
                            leaf_gate(w, y, om, tri_ref,
                                      (-e.node - 1) * grows)

            if paged:
                # Leaf gates run AFTER every interior gate has issued: the
                # interior vector work overlaps the tail of the slab DMAs,
                # and the scalar core blocks on each slot's semaphore only
                # right before its data is read.
                for w, y in enumerate(wv):
                    for k, e in enumerate(y.ent):
                        om = k * width + width // 2

                        @pl.when(e.fetched)
                        def _wait(w=w, e=e, k=k, parity=parity):
                            slab_dma(w, parity, k, -e.node - 1).wait()

                        @pl.when(e.is_leaf)
                        def _leaf(w=w, y=y, e=e, k=k, om=om,
                                  parity=parity):
                            leaf_gate(w, y, om, tri_slab,
                                      slot_base(w, parity, k))

            # Phase 3: per way, consume the packed words — Moller-Trumbore
            # per entered sub-cluster of each leaf entry (in pop order, so
            # nearer leaves usually tighten best_t before farther ones
            # run), ONE limit refresh per iteration, then pushes in the
            # precomputed far-to-near octant order (LIFO pops nearest
            # first; packed words are already in push order).
            for w, y in enumerate(wv):
                any_mt = None
                for k, e in enumerate(y.ent):
                    e.msk = pk[w, k * width + width // 2]
                for k, e in enumerate(y.ent):
                    msk = e.msk
                    for c in range(sub):
                        hit_sub = e.is_leaf & (((msk >> c) & 1) != 0)
                        n_sub = n_sub + hit_sub.astype(jnp.int32)

                        @pl.when(hit_sub)
                        def _mt(c=c, w=w, y=y, e=e, k=k, parity=parity):
                            # MT math shared with the phased kernel via
                            # module-level mt_subcluster (exactness
                            # equivalence is load-bearing).
                            if paged:
                                src, r0 = tri_slab, slot_base(w, parity, k)
                            else:
                                src, r0 = tri_ref, (-e.node - 1) * grows
                            lo, hi = c * sub_w, (c + 1) * sub_w
                            min_t, min_idx = mt_subcluster(
                                src, r0, lo, hi,
                                y.ox, y.oy, y.oz, y.dx, y.dy, y.dz,
                            )
                            cur = best_t[0:1, y.s]
                            better = min_t < cur
                            new_t = jnp.where(better, min_t, cur)
                            best_t[0:1, y.s] = new_t
                            best_i[0:1, y.s] = jnp.where(
                                better,
                                min_idx.astype(jnp.int32),
                                best_i[0:1, y.s],
                            )

                    mt_here = e.is_leaf & (msk != 0)
                    any_mt = mt_here if any_mt is None else (any_mt | mt_here)

                # ONE limit refresh per iteration (was per leaf visit —
                # the sub gates used the visit-entry limit anyway; intra-
                # iteration updates only ever helped FUTURE iterations).
                @pl.when(any_mt)
                def _refresh_limit(w=w, y=y):
                    if any_hit:
                        # Shadow semantics: ANY hit below the limit settles
                        # the lane — drop its limit to -inf so every later
                        # entry test rejects it and pop culling drains the
                        # stack once the whole block is occluded.
                        lc = jnp.where(
                            best_t[0:1, y.s] < y.lim0, -INF, y.lim0
                        )
                    else:
                        lc = jnp.minimum(best_t[0:1, y.s], y.lim0)
                    limcur[0:1, y.s] = lc
                    wbq[w] = (
                        jnp.max(
                            jax.lax.bitcast_convert_type(
                                jnp.maximum(lc, 0.0), jnp.int32
                            )
                        )
                        + 0xFFFF
                    ) >> 16  # round-up key vs round-down tn keys

                # Pushes in REVERSE pop order: the nearest popped entry's
                # children land on top of the stack and pop first next
                # iteration, keeping the approximate near-first order.
                sp = sps[w]
                for k in reversed(range(pops)):
                    e = y.ent[k]
                    msk = e.msk
                    if paged and width == 8:
                        # Canonical mode: one 24-bit permutation word per
                        # (node, octant) maps push slot j to the child's
                        # CANONICAL position (gate keys, entered bits and
                        # metas are all stored canonically). Layout:
                        # 12 words/node — metas at +0..3 (int16 pairs,
                        # low half = even canonical slot), perm for
                        # octant o at +4+o.
                        pw = ord_ref[e.safe_nid * 12 + 4 + y.oc]
                        for j in range(width):
                            pos = (pw >> (3 * j)) & 7
                            tq_c = (pk[w, k * width + (pos >> 1)]
                                    >> ((pos & 1) * 16)) & 0xFFFF
                            mw = ord_ref[e.safe_nid * 12 + (pos >> 1)]
                            m_raw = (mw >> ((pos & 1) * 16)) & 0xFFFF
                            m = m_raw - ((m_raw & 0x8000) << 1)
                            do_push = (
                                e.is_interior
                                & (((msk >> pos) & 1) != 0)
                                & (m != 0)
                            )
                            slot = jnp.minimum(sp, max_stack - 1)
                            old_n = stack[w, slot]
                            old_t = stack_tq[w, slot]
                            stack[w, slot] = jnp.where(do_push, m, old_n)
                            stack_tq[w, slot] = jnp.where(
                                do_push, tq_c, old_t)
                            sp = jnp.minimum(
                                sp + do_push.astype(jnp.int32), max_stack
                            )
                        continue
                    for j in range(width):
                        tq_c = (pk[w, k * width + j // 2]
                                >> (16 * (j % 2))) & 0xFFFF
                        if paged:
                            # Packed FLAT order table (two int16 metas
                            # per word, doubling the 1 MB SMEM bound's
                            # node ceiling; flat because 2D prefetched
                            # SMEM operands pad each row to 256 B — a
                            # (Nn, 32) layout measured the same
                            # allocation as (Nn, 64); Mosaic also
                            # DOUBLE-BUFFERS the operand, so alloc = 2x
                            # table bytes — ops/intersect.py gates on
                            # that): oc8 is even, so the half index
                            # j % 2 is static. Sign-extend two's
                            # complement (leaf metas are negative).
                            mw = ord_ref[
                                e.safe_nid * (width * 4)
                                + y.oc8 // 2 + j // 2
                            ]
                            m_raw = (mw >> (16 * (j % 2))) & 0xFFFF
                            m = m_raw - ((m_raw & 0x8000) << 1)
                        else:
                            m = ord_ref[e.safe_nid, y.oc8 + j]
                        do_push = (
                            e.is_interior
                            & (((msk >> j) & 1) != 0)
                            & (m != 0)
                        )
                        # Memory-safety clamp: build_wide_bvh asserts the
                        # worst K-pop DFS depth fits MAX_STACK, so the
                        # clamp never engages on real tables; it only
                        # bounds SMEM writes.
                        slot = jnp.minimum(sp, max_stack - 1)
                        old_n = stack[w, slot]
                        old_t = stack_tq[w, slot]
                        stack[w, slot] = jnp.where(do_push, m, old_n)
                        stack_tq[w, slot] = jnp.where(do_push, tq_c, old_t)
                        sp = jnp.minimum(
                            sp + do_push.astype(jnp.int32), max_stack
                        )
                sps[w] = sp
                if paged:
                    # The stack is final for this way: prefetch the slabs
                    # the NEXT iteration's pops will consume (other
                    # parity's slots — this iteration's are done).
                    peek_and_start(w, 1 - parity, sp)

            if paged:
                return (*sps, it + 1, n_int, n_leaf, n_sub)
            return (*sps, n_int, n_leaf, n_sub)

        def body(carry):
            return one_pass(carry)

        def cond(carry):
            any_live = carry[0] > 0
            for w in range(1, ways):
                any_live = any_live | (carry[w] > 0)
            return any_live

        out = jax.lax.while_loop(
            cond,
            body,
            tuple([jnp.int32(1)] * ways)
            + ((jnp.int32(0),) if paged else ())
            + (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )
        n_int, n_leaf, n_sub = out[ways + 1 if paged else ways:]

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
                     "leaf_slots", "sub", "ways", "pops", "paged"),
)
def closest_hit_walk(
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
    ways: int = WAYS,
    pops: int = POPS,
    paged: bool = False,
):
    """Wide-BVH block walk closest hit. Returns (t, idx); idx == -1 on miss.

    ``paged=True`` leaves walk_tris in HBM and DMAs each visited leaf
    group's slab into a double-buffered VMEM ring, prefetched one
    iteration ahead (the top-of-stack entries a pop will consume are
    known at the previous iteration's push time). Traversal math and
    results are identical to the resident mode; only the residency of
    the triangle slabs changes, lifting the VMEM ceiling on scene size
    (the resident mode needs node+tri slabs <= ~80 MB; paged needs only
    the interior tables). The per-visit DMA (~16 KB) largely overlaps
    the interior gate work; see BASELINE.md for measured overhead.

    walk_order (Nn, 64) i32 (per-octant ordered child metas — the only
    scalar table the kernel needs), walk_boxes (Nn*64, 8) f32, walk_tris
    (Ng*group_rows(sub), max(leaf_slots, 128)) f32 from accel/bvh8.py; ro/rd: (3, N) SoA or
    (N, 3) AoS. ``ways`` independent bn-ray blocks interleave per grid
    step to hide per-visit handoff latency; ``pops`` stack entries are
    processed per loop iteration under a single scalar<->vector sync
    point (see POPS above). With ``any_hit`` the returned
    t is SOME hit below the lane's limit (not necessarily the closest) —
    occluded lanes stop traversing immediately.
    """
    # Interior fan-out, inferred from the order table: 8 columns per
    # octant at width=8 (production), 16 at the experimental 16-ary
    # collapse (accel/bvh8.py build_wide_bvh(width=16)).
    width = walk_order.shape[1] // 8
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

    step = bn * ways
    pad = (-n) % step
    if pad:
        ro3 = jnp.pad(ro3, ((0, 0), (0, pad)))
        rd3 = jnp.pad(rd3, ((0, 0), (0, pad)), constant_values=1.0)
        limit0 = jnp.pad(limit0, (0, pad), constant_values=-INF)
    np_ = ro3.shape[1]
    nb = np_ // step

    # NaN-safe reciprocal: a ray with d[a] == 0 whose origin lies exactly on
    # a slab plane would produce 0 * inf = NaN in the entry test, and JAX
    # min/max PROPAGATE NaN (skipping the subtree) where WGSL min/max drop
    # the NaN operand (still traversing, pt.wgsl:234-245). Clamping the
    # zero component to a tiny signed value keeps 1/d finite-huge: on-plane
    # axes contribute 0 (as if ignored) and off-plane axes +-overflow to
    # the same +-inf the true reciprocal gives.
    rd_safe = jnp.where(rd3 == 0.0, jnp.float32(1e-30), rd3)
    rays = jnp.concatenate(
        [ro3, rd3, 1.0 / rd_safe, jnp.zeros((7, np_), ro3.dtype)], axis=0
    )  # (16, np_): o, d, 1/d component rows, rays on lanes
    lim = limit0.reshape(1, np_)

    if paged and width == 8:
        # CANONICAL + PERMUTATION encoding (round 4): the (Nn, 64) order
        # table stores the SAME 8 child metas in 8 octant push orders —
        # an 8x redundancy. Store them ONCE (int16 pairs in octant-0
        # push order = the canonical order) plus eight 24-bit permutation
        # words (3 bits x 8 push slots) mapping each octant's push slot j
        # to its canonical position: 12 i32 words/node (4 metas + 8
        # perms) vs the round-3 two-int16-per-word layout's 32 — the SMEM
        # alloc (2x, Mosaic double-buffers prefetched operands) drops
        # 128 -> 96 B/node, lifting the paged node ceiling ~4k -> ~10.2k
        # (~2.7M tris at the measured ~270 tris/node; the int16
        # leaf-group bound lands in the same band, so both gates move
        # together — ops/intersect.py ``paged_fits``). Metas are unique
        # per node (child node ids / leaf group ids), so the argmax
        # match is exact; empty slots (meta 0, any number of them) all
        # map to the first canonical zero, whose meta reads 0 and never
        # pushes. The selection gate guarantees every meta fits int16 —
        # forced walk_hbm is rejected there past the bounds.
        ordr = walk_order.reshape(-1, 8, width)
        canon = ordr[:, 0, :]  # (Nn, 8) octant-0 push order
        pos = jnp.argmax(
            canon[:, None, None, :] == ordr[:, :, :, None], axis=-1
        ).astype(jnp.int32)  # (Nn, 8 octants, 8 slots) canonical index
        shifts = (jnp.arange(width, dtype=jnp.int32) * 3)[None, None, :]
        perm = jnp.sum(pos << shifts, axis=-1).astype(jnp.int32)  # (Nn, 8)
        metas = ((canon[:, 1::2] & 0xFFFF) << 16) | (canon[:, 0::2] & 0xFFFF)
        ord_in = jnp.concatenate([metas, perm], axis=1).reshape(-1)
        # The box slabs carry the same 8x octant replication — canonical
        # mode reads octant-0 rows only (the push loop permutes instead),
        # an 8x VMEM cut on the interior tables (765k: 5.8 -> 0.73 MB).
        box_in = walk_boxes.reshape(-1, 8, width, 8)[:, 0].reshape(-1, 8)
    elif paged:
        # Non-8-wide paged trees (experimental 16-ary) keep the round-3
        # flat two-int16-per-word layout (a 4-bit permutation would not
        # fit one word).
        ord_in = (
            ((walk_order[:, 1::2] & 0xFFFF) << 16)
            | (walk_order[:, 0::2] & 0xFFFF)
        ).reshape(-1)
        box_in = walk_boxes
    else:
        ord_in = walk_order
        box_in = walk_boxes

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((16, step), lambda p, o: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step), lambda p, o: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(box_in.shape, lambda p, o: (0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec(memory_space=pl.ANY) if paged else
             pl.BlockSpec(walk_tris.shape, lambda p, o: (0, 0),
                          memory_space=pltpu.VMEM)),
        ],
        out_specs=[
            pl.BlockSpec((1, step), lambda p, o: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, step), lambda p, o: (0, p),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((8, 128), lambda p, o: (0, p),
                           memory_space=pltpu.VMEM)] if stats else []),
        scratch_shapes=[
            pltpu.VMEM((1, step), jnp.float32),  # best_t
            pltpu.VMEM((1, step), jnp.int32),  # best_i
            pltpu.VMEM((1, step), jnp.float32),  # limcur = min(best_t, lim0)
            pltpu.SMEM((ways,), jnp.int32),  # octant * width per way
            # packed child keys + mask, ``width`` words per popped entry
            pltpu.SMEM((ways, pops * width), jnp.int32),
            pltpu.SMEM((ways,), jnp.int32),  # worst live limit, 16-bit key
            pltpu.SMEM((ways, MAX_STACK), jnp.int32),  # DFS stacks
            pltpu.SMEM((ways, MAX_STACK), jnp.int32),  # entry keys at push
        ] + ([
            # Paged mode: double-buffered leaf-slab ring + DMA semaphores
            # (per way, ``pops`` slots per parity).
            pltpu.VMEM(
                (ways * 2 * pops * group_rows(sub), walk_tris.shape[1]),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((ways, 2 * pops)),
        ] if paged else []),
    )
    outs = pl.pallas_call(
        _walk_kernel(bn, MAX_STACK, stats, leaf_slots, sub, ways, any_hit,
                     pops, width, paged),
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
    )(ord_in, rays, lim, box_in, walk_tris)
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
