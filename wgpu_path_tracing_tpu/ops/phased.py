"""Mid-size-scene intersection v4: single-sync-point phased group dispatch.

The block walk (ops/walk.py) is exact and VMEM-resident, but its cost on
SMALL trees is ~70 serialized loop iterations per ray block, each a
scalar<->vector round trip (pop -> slab test -> reduce -> push), and the
measured Pallas floor is ~1.6-3.2 us per iteration REGARDLESS of content
(TODO.md round-2 microbenches). On a 48-wide-node tree whose block unions
cover nearly the whole hierarchy anyway (incoherent bounce rays), the
ordered traversal buys little culling — but still pays every sync.

This kernel drops the hierarchy entirely and applies the round-2 lesson
("packed work amortizes only when it shares ONE sync point") to the whole
scene:

* phase 1 (vector, one sync): entry-test ALL ``Ng * sub`` leaf sub-cluster
  boxes against the ray block in statically-unrolled 32-row chunks, packing
  each chunk's "any live ray enters" bits into one SMEM word — 32 gate
  bits per vector reduce, zero intervening scalar reads;
* phase 2 (fori over groups, K-group unrolled body): per entered
  sub-cluster a ``pl.when``-gated Möller-Trumbore on the (leaf_slots/sub,
  bn) lane slab — the gate bits are ALREADY in SMEM, so the scalar core
  never waits on the vector core again; loop iterations carry no
  cross-iteration dependency (no stack, no pushes) and the K-unroll
  amortizes the back-edge floor.

Exactness: the same entry test and Möller-Trumbore as the walk, consumed
in ASCENDING group order with strict ``<`` winner updates (first group
wins razor ties — closer to brute-force order than the walk's stack
order). No in-path t-limit tightening: gates use the CALL-ENTRY limits
(alive mask / t_max), so incoherent high-occupancy blocks test more subs
than the walk would — the trade is ~2 sync points per block instead of
~70. Wins on small trees, loses on large ones (measured; see
make_closest_hit's selection rule in ops/intersect.py).

Tables come from the SAME accel/bvh8.py collapse as the walk (the
``walk_tris`` slab layout, reference counterpart pt.wgsl:248-296 /
bvh.ts:53); the flat sub-box table is derived from it by reshape at trace
time, so scenes carry no extra device buffers.
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
    SUB,
    group_rows,
)
# The ONE definition of the slab/MT intersection math, shared with the
# walk kernel — the exactness equivalence (walk == phased == brute, by
# test) is load-bearing for kernel selection, so an edit there changes
# both kernels together.
from wgpu_path_tracing_tpu.ops.walk import mt_subcluster, slab_entry

INF = np.float32(np.inf)

BN = 2048  # rays per block (lane axis), same default as the walk
K_GROUPS = 8  # groups per fori iteration (amortizes the back-edge floor)
MAX_GROUPS = 512  # beyond this the unrolled phase-1 chunk count and the
# lost in-path culling both favor the walk — selection, not a hard limit


def _phased_kernel(bn: int, ng_pad: int, grows: int, sub: int, sub_w: int,
                   k_groups: int):
    n_chunks = ng_pad * sub // 32  # phase-1 rows per packed word
    groups_per_word = 32 // sub if sub <= 32 else 0
    assert groups_per_word >= 1 and 32 % sub == 0

    def kernel(rays_ref, lim_ref, sb_ref, tri_ref, t_out, i_out, pk):
        ox = rays_ref[0:1, :]
        oy = rays_ref[1:2, :]
        oz = rays_ref[2:3, :]
        dx = rays_ref[3:4, :]
        dy = rays_ref[4:5, :]
        dz = rays_ref[5:6, :]
        ix = rays_ref[6:7, :]
        iy = rays_ref[7:8, :]
        iz = rays_ref[8:9, :]
        lim = lim_ref[0:1, :]

        t_out[...] = jnp.full((1, bn), INF)
        i_out[...] = jnp.full((1, bn), -1, jnp.int32)

        # Phase 1: gate bits for every sub-cluster box, 32 rows per word.
        # All reduces issue back-to-back; the scalar core waits once, at
        # phase 2's first pk read.
        for c in range(n_chunks):
            slab = sb_ref[c * 32:(c + 1) * 32, :]  # (32, 8) static slice
            _, enter = slab_entry(slab, ox, oy, oz, ix, iy, iz, lim)
            hit_row = jnp.max(
                jnp.where(enter, jnp.float32(1.0), jnp.float32(0.0)),
                axis=1,
                keepdims=True,
            )  # (32, 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
            pk[c] = jnp.sum(
                jnp.where(hit_row > 0.0, jnp.int32(1) << rows, 0)
            )

        # Phase 2: gated MT per entered sub-cluster, ascending group order.
        def body(i, _):
            for kk in range(k_groups):
                g = i * k_groups + kk
                word = pk[(g * sub) // 32]
                shift = (g % groups_per_word) * sub
                bits = (word >> shift) & ((1 << sub) - 1)
                r0 = g * grows
                for c in range(sub):

                    @pl.when(((bits >> c) & 1) != 0)
                    def _mt(c=c, r0=r0):
                        lo, hi = c * sub_w, (c + 1) * sub_w
                        min_t, min_idx = mt_subcluster(
                            tri_ref, r0, lo, hi, ox, oy, oz, dx, dy, dz
                        )
                        cur = t_out[...]
                        better = min_t < cur
                        t_out[...] = jnp.where(better, min_t, cur)
                        i_out[...] = jnp.where(
                            better, min_idx.astype(jnp.int32), i_out[...]
                        )

            return 0

        jax.lax.fori_loop(0, ng_pad // k_groups, body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_tris", "any_hit", "interpret", "bn",
                     "leaf_slots", "sub", "k_groups"),
)
def closest_hit_phased(
    walk_tris,
    ro,
    rd,
    active=None,
    t_max=None,
    num_tris: int | None = None,
    any_hit: bool = False,
    interpret: bool = False,
    bn: int = BN,
    leaf_slots: int = LEAF_SLOTS,
    sub: int = SUB,
    k_groups: int = K_GROUPS,
):
    """Phased flat group dispatch closest hit. Returns (t, idx); idx == -1
    on miss.

    walk_tris: the (Ng*group_rows(sub), lanes) slab table from
    accel/bvh8.py (the walk kernel's leaf table — shared); ro/rd: (3, N)
    SoA or (N, 3) AoS. ``any_hit`` is accepted for signature parity and
    ignored: the kernel always returns the closest hit, which is a valid
    any-hit answer (callers compare t < t_max).
    """
    del any_hit
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

    grows = group_rows(sub)
    lanes = walk_tris.shape[1]
    ng = walk_tris.shape[0] // grows
    sub_w = leaf_slots // sub

    # Pad the group count so phase-1 words and phase-2 iterations tile
    # evenly; padded groups get +inf/-inf boxes (entry test always false).
    step = max(k_groups, (32 // sub) if sub < 32 else 1)
    ng_pad = -(-ng // step) * step
    if ng_pad * sub % 32:
        ng_pad = -(-ng_pad * sub // 32) * 32 // sub

    # Flat sub-box table, derived from the walk slabs (rows 16..16+sub of
    # each group, bounds on lanes 0..5) — no new scene buffer.
    sb = walk_tris.reshape(ng, grows, lanes)[:, 16:16 + sub, 0:8]
    sb = sb.reshape(ng * sub, 8)
    if ng_pad > ng:
        fill = jnp.tile(
            jnp.asarray(
                [INF, INF, INF, -INF, -INF, -INF, 0.0, 0.0], jnp.float32
            ),
            ((ng_pad - ng) * sub, 1),
        )
        sb = jnp.concatenate([sb, fill], axis=0)
    tris_pad = walk_tris
    if ng_pad > ng:
        # Padded groups are never entered (their boxes reject everything);
        # -1 fill keeps gidx < 0 invalid even if they were.
        tris_pad = jnp.concatenate(
            [
                walk_tris,
                jnp.full(((ng_pad - ng) * grows, lanes), -1.0, jnp.float32),
            ],
            axis=0,
        )

    # NaN-safe reciprocal (same rationale as ops/walk.py): d == 0 with an
    # on-plane origin must not poison the slab test with 0 * inf.
    rd_safe = jnp.where(rd3 == 0.0, jnp.float32(1e-30), rd3)
    rays = jnp.concatenate([ro3, rd3, 1.0 / rd_safe], axis=0)  # (9, np_)
    lim = limit0.reshape(1, np_)

    t_row, i_row = pl.pallas_call(
        _phased_kernel(bn, ng_pad, grows, sub, sub_w, k_groups),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((9, bn), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_pad * sub, 8), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_pad * grows, lanes), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bn), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda p: (0, p), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((max(ng_pad * sub // 32, 1),), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(rays, lim, sb, tris_pad)

    t = t_row[0, :n]
    idx = i_row[0, :n]
    if num_tris is not None:
        idx = jnp.where(idx >= num_tris, -1, idx)
    idx = jnp.where(jnp.isfinite(t), idx, -1)
    t = jnp.where(active_l, t, INF)
    idx = jnp.where(active_l, idx, -1)
    return t, idx
