"""Pallas bounce megakernel.

Between the two traversals of a bounce (closest hit in, shadow rays out),
the reference's megakernel does ~300 scalar ops per thread (emissive
accumulation, NEE light sampling, BSDF eval x2, BSDF sampling, Russian
roulette — pt.wgsl:638-709). In the plain XLA path those ops stream every
intermediate through HBM; this kernel runs the ENTIRE shading stage —
ops/trace.py::bounce_core, the same code, not a copy — on full (8, 128)
vreg rows with the triangle/material and light tables resident in VMEM and
winner rows selected by in-kernel one-hot MXU matmuls (exact: one-hot
entries are 0/1).

Scope: scenes whose denormalized triangle table fits VMEM (<= ~4k triangles;
larger scenes use the XLA bounce with pair-dispatch traversal) and whose
texture atlas is either absent or VMEM-small (<= MAX_VMEM_ATLAS_TEXELS):
texel fetches then run in-kernel as a two-level one-hot — an exact one-hot
MXU matmul over atlas ROWS followed by a static column-select sweep — so
textured scenes stop falling off the fast path onto XLA's ~10 GB/s dynamic
gathers (pt.wgsl:112-120 getTextureColor equivalent). Larger atlases keep
the XLA bounce. The radiance and RNG streams are identical to the XLA path
because the shading code is literally shared.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgpu_path_tracing_tpu.models import types as T
from wgpu_path_tracing_tpu.ops import trace as TRACE
from wgpu_path_tracing_tpu.ops import vec
from wgpu_path_tracing_tpu.ops.vec import V3

BN = 1024
SELECT_CHUNK = 512  # one-hot select chunk over table rows

MAX_VMEM_TRIS = 16384  # denormalized table stays VMEM-small (~3 MB); the
# one-hot fetch cost grows with rows but still beats the XLA bounce's HBM
# round-trips at this size (measured: glass_box 11.8k tris 4.2 -> see
# BASELINE.md; cap re-measured round 2)
UNTILED_ATLAS_TEXELS = 128 * 128  # below this the single row-select
# sampler wins (one-hot cost ~ Hp*W*4*BN MACs is still small)
MAX_VMEM_ATLAS_TEXELS = 512 * 512  # in-kernel atlas bound (tiled sampler;
# 4 MB VMEM resident). Beyond, the XLA bounce path takes over.
ATLAS_TILE_H = 128  # one-hot rows per taken tile (tiled sampler)
ATLAS_TILE_W = 32  # texels per tile column group (128 f32 columns)


def _select_rows(table_ref, idx, chunk: int = SELECT_CHUNK):
    """rows (C, 8, 128) = table_ref (Tp, C) selected by idx (8, 128), via
    chunked one-hot MXU matmuls (Tp is a multiple of ``chunk``).

    Lane blocks are (8, 128) — a full vreg — so every elementwise op in the
    shared shading code uses all sublanes."""
    tp = table_ref.shape[0]
    cols = table_ref.shape[1]
    n_chunks = tp // chunk

    # Build the one-hot NATIVELY in (chunk, 1024) lane-major layout: the
    # old (chunk, 8, 128) iota + reshape forced a sublane<->lane relayout
    # of every chunk row before the MXU dot — measured 15% of the whole
    # glass render (24 chunks x 512 rows per fetch). One small relayout of
    # the index row replaces them; the dot and its output are unchanged,
    # so selected values stay bit-identical (verified on-chip).
    idx2 = idx.reshape(1, 1024)

    def part_of(ci):
        base = ci * chunk
        iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1024), 0) + base
        onehot = (iota == idx2).astype(jnp.float32)
        return jax.lax.dot_general(
            table_ref[pl.ds(base, chunk), :],
            onehot,
            dimension_numbers=((([0]), ([0])), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, 1024)

    if n_chunks == 1:
        return part_of(0).reshape(cols, 8, 128)

    # Multi-chunk tables (big scenes): winner indices are BVH-ordered, so
    # a ray block's hits cluster in FEW chunks. One packed touch word
    # (vector reduces, back-to-back) gates each chunk's iota+dot behind a
    # lax.cond — a skipped chunk contributes exactly the +0.0 its all-zero
    # one-hot rows would have (bit-identical, verified on-chip; glass
    # 8.71 -> 8.34 s same-process).
    cidx = idx2 // chunk
    touch = jnp.int32(0)
    for c in range(n_chunks):
        touch = touch | (
            (jnp.sum((cidx == c).astype(jnp.int32)) > 0).astype(jnp.int32)
            << c
        )

    def body(ci, acc):
        return jax.lax.cond(
            ((touch >> ci) & 1) != 0,
            lambda a: a + part_of(ci),
            lambda a: a,
            acc,
        )

    acc0 = jnp.zeros((cols, 1024), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, acc0).reshape(cols, 8, 128)


def _trunc(x):
    """Round toward zero (Mosaic-safe; jnp.fmod does not lower)."""
    return jnp.where(x >= 0.0, jnp.floor(x), jnp.ceil(x))


def _make_atlas_sampler(atlas_ref, width: int, height: int):
    """In-VMEM getTextureColor (pt.wgsl:112-120): atlas_ref is (Hp, W*4).

    Row select = exact one-hot MXU matmul (0/1 entries reproduce the f32
    texel row bit-exactly); column select = static sweep over the W texel
    columns (W is small by the MAX_VMEM_ATLAS_TEXELS bound)."""

    def sample(rect, u, v, fallback):
        rx, ry, rw, rh = rect  # (8, 128) lanes, pixels as f32
        # WGSL % is sign-preserving fmod; exact as u - trunc(u) here.
        ax = rx + (u - _trunc(u)) * rw
        ay = ry + (v - _trunc(v)) * rh
        ix = jnp.clip(ax, 0.0, width - 1.0).astype(jnp.int32)
        iy = jnp.clip(ay, 0.0, height - 1.0).astype(jnp.int32)
        rows = _select_rows(
            atlas_ref, iy, chunk=min(SELECT_CHUNK, atlas_ref.shape[0])
        )  # (W*4, 8, 128) — each lane's texel row
        missing = (rw == 0.0) | (rh == 0.0)
        out = []
        for c in range(4):
            acc = jnp.zeros_like(u)
            for w in range(width):
                acc = jnp.where(ix == w, rows[w * 4 + c], acc)
            out.append(jnp.where(missing, fallback[c], acc))
        return out

    return sample


def _make_atlas_sampler_tiled(atlas_ref, width: int, height: int,
                              acc_ref, amsk_ref):
    """In-VMEM getTextureColor for LARGE atlases (> UNTILED_ATLAS_TEXELS).

    The single row-select sampler scales with Hp*W*4*BN MACs and
    materializes a (W*4, BN) intermediate — both blow up past ~128^2
    texels. Instead the atlas is processed in (ATLAS_TILE_H rows x
    ATLAS_TILE_W texels) tiles, DISPATCHED like the walk kernel's
    sub-clusters (ops/walk.py): a vector reduce per tile writes a
    touched-count to SMEM, the scalar core gates a pl.when region per
    touched tile, and each taken tile runs a small exact one-hot MXU
    select (TILE_H x TILE_W*4 x BN MACs) plus a TILE_W-column sweep.
    Bounce blocks touch few tiles (uv locality follows hit locality), so
    the cost tracks the texels a block actually reads, not atlas area.

    acc_ref: VMEM (32, 128) scratch — four (8, 128) channel planes.
    amsk_ref: SMEM (n_bands + n_groups,) int32 — touched counts.
    Exactness: one-hot f32 matmul entries are 0/1 so the selected texel is
    reproduced bit-for-bit (same argument as _select_rows)."""
    hp, wcols = atlas_ref.shape
    wp = wcols // 4
    n_bands = -(-hp // ATLAS_TILE_H)
    n_groups = -(-wp // ATLAS_TILE_W)

    def sample(rect, u, v, fallback):
        rx, ry, rw, rh = rect
        ax = rx + (u - _trunc(u)) * rw
        ay = ry + (v - _trunc(v)) * rh
        ix = jnp.clip(ax, 0.0, width - 1.0).astype(jnp.int32)
        iy = jnp.clip(ay, 0.0, height - 1.0).astype(jnp.int32)
        missing = (rw == 0.0) | (rh == 0.0)
        band = iy // ATLAS_TILE_H
        grp = ix // ATLAS_TILE_W
        live = ~missing

        for c in range(4):
            acc_ref[pl.ds(c * 8, 8), :] = jnp.zeros((8, 128), jnp.float32)
        # Phase A (vector): touched counts per row band and per column
        # group — all reduces issue back-to-back, the scalar core drains
        # once at the first pl.when read (the walk kernel's handoff shape).
        for b in range(n_bands):
            amsk_ref[b] = jnp.sum((live & (band == b)).astype(jnp.int32))
        for g in range(n_groups):
            amsk_ref[n_bands + g] = jnp.sum(
                (live & (grp == g)).astype(jnp.int32)
            )
        # Phase B (scalar-gated tiles). A (band, group) tile runs only if
        # both its band and its group are touched — a slight over-approx
        # of per-tile occupancy that keeps the reduce count linear in
        # bands+groups instead of bands*groups.
        for b in range(n_bands):

            @pl.when(amsk_ref[b] > 0)
            def _band(b=b):
                inband = band == b
                for g in range(n_groups):

                    @pl.when(amsk_ref[n_bands + g] > 0)
                    def _tile(b=b, g=g):
                        th = min(ATLAS_TILE_H, hp - b * ATLAS_TILE_H)
                        tw = min(ATLAS_TILE_W, wp - g * ATLAS_TILE_W)
                        # Lane-major one-hot (same relayout saving as
                        # _select_rows; values bit-identical).
                        iy2 = iy.reshape(1, 1024)
                        iota = jax.lax.broadcasted_iota(
                            jnp.int32, (th, 1024), 0
                        ) + b * ATLAS_TILE_H
                        onehot = (iota == iy2).astype(jnp.float32)
                        part = jax.lax.dot_general(
                            atlas_ref[
                                pl.ds(b * ATLAS_TILE_H, th),
                                g * ATLAS_TILE_W * 4:
                                (g * ATLAS_TILE_W + tw) * 4,
                            ],
                            onehot,
                            dimension_numbers=((([0]), ([0])), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (tw*4, 1024)
                        part3 = part.reshape(tw * 4, 8, 128)
                        for c in range(4):
                            accv = acc_ref[pl.ds(c * 8, 8), :]
                            for w in range(tw):
                                sel = inband & (
                                    ix == g * ATLAS_TILE_W + w
                                )
                                accv = jnp.where(
                                    sel, part3[w * 4 + c], accv
                                )
                            acc_ref[pl.ds(c * 8, 8), :] = accv

        return [
            jnp.where(missing, fallback[c], acc_ref[pl.ds(c * 8, 8), :])
            for c in range(4)
        ]

    return sample


def _bounce_kernel(do_mis, num_lights, atlas_hw=None,
                   slots_used=(True, True, True, True)):
    def kernel(
        bounce_ref,  # scalar prefetch: (1,) int32
        *refs,
    ):
        if atlas_hw is not None and atlas_hw[2]:
            # Tiled sampler: two trailing scratch refs (VMEM accumulator
            # planes + SMEM touched-tile counts).
            (ray_ref, state_ref, thr_ref, res_ref, alive_ref, t_ref,
             idx_ref, tri_ref, light_ref, atlas_ref,
             oray_ref, ostate_ref, othr_ref, ores_ref, oalive_ref,
             shadow_ray_ref, stmax_ref, smask_ref, sdirect_ref,
             spdf_ref, acc_ref, amsk_ref) = refs
            atlas = _make_atlas_sampler_tiled(
                atlas_ref, atlas_hw[1], atlas_hw[0], acc_ref, amsk_ref
            )
        elif atlas_hw is not None:
            (ray_ref, state_ref, thr_ref, res_ref, alive_ref, t_ref,
             idx_ref, tri_ref, light_ref, atlas_ref,
             oray_ref, ostate_ref, othr_ref, ores_ref, oalive_ref,
             shadow_ray_ref, stmax_ref, smask_ref, sdirect_ref,
             spdf_ref) = refs
            atlas = _make_atlas_sampler(atlas_ref, atlas_hw[1], atlas_hw[0])
        else:
            (ray_ref, state_ref, thr_ref, res_ref, alive_ref, t_ref,
             idx_ref, tri_ref, light_ref,
             oray_ref, ostate_ref, othr_ref, ores_ref, oalive_ref,
             shadow_ray_ref, stmax_ref, smask_ref, sdirect_ref,
             spdf_ref) = refs
            atlas = None
        # 2D (rows, BN) blocks keep the operand/result layouts
        # bitcast-compatible with the (rows, N) arrays the intersection
        # kernels use (the old (rows, 8, 128) 3D blocks forced a relayout
        # copy fusion on every kernel boundary — ~9% of the headline
        # chunk, measured by xprof). INSIDE the kernel each row is
        # reshaped to a full (8, 128) vreg: a (1, BN) lane vector would
        # run the ~300-op shading chain at 1/8 sublane utilization
        # (measured 3.3x slower end-to-end).
        def row(ref, r):
            return ref[r : r + 1, :].reshape(8, 128)

        st = TRACE.BounceState(
            ro=V3(row(ray_ref, 0), row(ray_ref, 1), row(ray_ref, 2)),
            rd=V3(row(ray_ref, 3), row(ray_ref, 4), row(ray_ref, 5)),
            throughput=V3(row(thr_ref, 0), row(thr_ref, 1), row(thr_ref, 2)),
            result=V3(row(res_ref, 0), row(res_ref, 1), row(res_ref, 2)),
            alive=row(alive_ref, 0) != 0,
            state=row(state_ref, 0),
        )
        t = row(t_ref, 0)
        idx = row(idx_ref, 0)

        def fetch_tri(safe_idx):
            rows = _select_rows(tri_ref, safe_idx,
                                chunk=min(SELECT_CHUNK, tri_ref.shape[0]))
            return lambda c: rows[c]

        def fetch_light(lidx):
            rows = _select_rows(light_ref, lidx, chunk=light_ref.shape[0])
            return lambda c: rows[c]

        new_st, shadow = TRACE.bounce_core(
            st, t, idx, bounce_ref[0],
            fetch_tri=fetch_tri, fetch_light=fetch_light, atlas=atlas,
            do_mis=do_mis, num_lights=num_lights, slots_used=slots_used,
        )

        def put(ref, r, v):
            ref[r : r + 1, :] = v.reshape(1, BN)

        put(oray_ref, 0, new_st.ro.x)
        put(oray_ref, 1, new_st.ro.y)
        put(oray_ref, 2, new_st.ro.z)
        put(oray_ref, 3, new_st.rd.x)
        put(oray_ref, 4, new_st.rd.y)
        put(oray_ref, 5, new_st.rd.z)
        put(ostate_ref, 0, new_st.state)
        put(othr_ref, 0, new_st.throughput.x)
        put(othr_ref, 1, new_st.throughput.y)
        put(othr_ref, 2, new_st.throughput.z)
        put(ores_ref, 0, new_st.result.x)
        put(ores_ref, 1, new_st.result.y)
        put(ores_ref, 2, new_st.result.z)
        put(oalive_ref, 0, new_st.alive.astype(jnp.int32))
        put(shadow_ray_ref, 0, shadow.origin.x)
        put(shadow_ray_ref, 1, shadow.origin.y)
        put(shadow_ray_ref, 2, shadow.origin.z)
        put(shadow_ray_ref, 3, shadow.direction.x)
        put(shadow_ray_ref, 4, shadow.direction.y)
        put(shadow_ray_ref, 5, shadow.direction.z)
        put(stmax_ref, 0, shadow.t_max)
        put(smask_ref, 0, shadow.mask.astype(jnp.int32))
        put(sdirect_ref, 0, shadow.direct.x)
        put(sdirect_ref, 1, shadow.direct.y)
        put(sdirect_ref, 2, shadow.direct.z)
        put(spdf_ref, 0, shadow.pdf)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("do_mis", "num_lights", "atlas_hw", "slots_used",
                     "interpret"),
)
def bounce_stage_pallas(
    bounce_idx,
    rays,  # (6, N)
    state,  # (1, N) uint32
    throughput,  # (3, N)
    result,  # (3, N)
    alive,  # (1, N) int32
    t,  # (1, N)
    idx,  # (1, N) int32
    tri_table,  # (Tp, TF_COLS), Tp multiple of SELECT_CHUNK
    light_table,  # (Lp, LF_COLS)
    atlas_table=None,  # (Hp, W*4) or None; (H, W) passed via atlas_hw
    *,
    do_mis: bool,
    num_lights: int,
    atlas_hw: tuple[int, int] | None = None,
    slots_used: tuple = (True, True, True, True),
    interpret: bool = False,
):
    n = rays.shape[1]
    nb = n // BN
    bidx = jnp.reshape(bounce_idx, (1,)).astype(jnp.int32)

    # 2D lane blocks (rows, BN): bitcast-compatible with the (rows, N)
    # layouts of the intersection kernels on both sides of this stage, so
    # XLA inserts no relayout copies at the boundaries.
    def row_spec(rows):
        return pl.BlockSpec((rows, BN), lambda i, b: (0, i),
                            memory_space=pltpu.VMEM)

    def table_spec(shape):
        return pl.BlockSpec(shape, lambda i, b: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        row_spec(6), row_spec(1), row_spec(3), row_spec(3), row_spec(1),
        row_spec(1), row_spec(1),
        table_spec(tri_table.shape), table_spec(light_table.shape),
    ]
    operands = [
        bidx, rays, state, throughput, result, alive, t, idx,
        tri_table, light_table,
    ]
    if atlas_hw is not None:
        in_specs.append(table_spec(atlas_table.shape))
        operands.append(atlas_table)
    scratch_shapes = []
    if atlas_hw is not None and atlas_hw[2]:
        hp, wcols = atlas_table.shape
        n_bands = -(-hp // ATLAS_TILE_H)
        n_groups = -(-(wcols // 4) // ATLAS_TILE_W)
        scratch_shapes = [
            pltpu.VMEM((32, 128), jnp.float32),  # 4 channel planes
            pltpu.SMEM((n_bands + n_groups,), jnp.int32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            row_spec(6), row_spec(1), row_spec(3), row_spec(3), row_spec(1),
            row_spec(6), row_spec(1), row_spec(1), row_spec(3), row_spec(1),
        ],
        scratch_shapes=scratch_shapes,
    )
    # Tiled atlases are VMEM-resident beyond the 16 MiB default scope;
    # untiled configs keep the default limit (their compiled artifacts and
    # measured numbers predate this knob).
    extra = {}
    if atlas_hw is not None and atlas_hw[2]:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    outs = pl.pallas_call(
        _bounce_kernel(do_mis, num_lights, atlas_hw, slots_used),
        grid_spec=grid_spec,
        **extra,
        out_shape=[
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.uint32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return list(outs)


def atlas_fits_vmem(scene) -> bool:
    a = scene["atlas"]
    return a.shape[0] * a.shape[1] <= MAX_VMEM_ATLAS_TEXELS


def prepare_tables(scene):
    """Pad the denormalized tables for in-VMEM residency. Returns
    (tri_table (Tp, TF_COLS), light_table (Lp, LF_COLS),
    atlas_table (Hp, W*4) | None, atlas_hw | None), or None if the scene is
    too large for the megakernel."""
    tri = scene["tri_full"]
    if tri.shape[0] > MAX_VMEM_TRIS:
        return None
    # Smallest sublane multiple covering the scene: the one-hot selects
    # scale with table rows (same lesson as the intersection kernel's
    # triangle-block fix). The table must be a multiple of the select
    # chunk, or _select_rows' fori_loop would skip the tail rows.
    tp = max(8, -(-tri.shape[0] // 8) * 8)
    if tp > SELECT_CHUNK:
        tp = -(-tp // SELECT_CHUNK) * SELECT_CHUNK
    tri_p = jnp.pad(tri, ((0, tp - tri.shape[0]), (0, 0)))
    light = scene["light_full"]
    lp = max(8, -(-light.shape[0] // 8) * 8)
    light_p = jnp.pad(light, ((0, lp - light.shape[0]), (0, 0)))

    atlas = scene["atlas"]
    textured = atlas.shape[0] > 1 or atlas.shape[1] > 1
    atlas_p = atlas_hw = None
    if textured:
        if not atlas_fits_vmem(scene):
            return None
        h, w = atlas.shape[0], atlas.shape[1]
        flat = jnp.asarray(atlas, jnp.float32).reshape(h, w * 4)
        tiled = h * w > UNTILED_ATLAS_TEXELS
        if tiled:
            # Tiled sampler: pad rows to the tile height (its one-hot
            # selects run per full tile) and texel columns to the tile
            # width (padded texels are never addressed — ix <= w-1).
            hp = -(-h // ATLAS_TILE_H) * ATLAS_TILE_H
            wp = -(-w // ATLAS_TILE_W) * ATLAS_TILE_W
            atlas_p = jnp.pad(flat, ((0, hp - h), (0, (wp - w) * 4)))
        else:
            # Same rule as the triangle table: the row count must be a
            # multiple of the one-hot select chunk or _select_rows'
            # fori_loop silently skips the tail rows.
            hp = max(8, -(-h // 8) * 8)
            if hp > SELECT_CHUNK:
                hp = -(-hp // SELECT_CHUNK) * SELECT_CHUNK
            atlas_p = jnp.pad(flat, ((0, hp - h), (0, 0)))
        atlas_hw = (h, w, tiled)
    return tri_p, light_p, atlas_p, atlas_hw


def trace_pallas(
    scene,
    closest_hit,
    ro,
    rd,
    state,
    *,
    max_bounces: int = 8,
    do_mis: bool = True,
    num_lights: int = 0,
    slots_used: tuple = (True, True, True, True),
    interpret: bool = False,
):
    """Drop-in replacement for ops/trace.py::trace on TPU for VMEM-sized
    scenes (triangles and, if textured, the atlas). Same signature, same
    semantics, same RNG streams."""
    tables = prepare_tables(scene)
    assert tables is not None, "scene too large for the bounce megakernel"
    tri_table, light_table, atlas_table, atlas_hw = tables

    n = ro.shape[0]
    pad = (-n) % BN
    npad = n + pad

    def pad_n(a, rows):
        a = a.reshape(rows, -1) if a.ndim == 2 else a[None, :]
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a

    rays = jnp.concatenate([ro.T, rd.T], axis=0)
    rays = jnp.pad(rays, ((0, 0), (0, pad))) if pad else rays
    state_r = pad_n(state, 1).astype(jnp.uint32)
    thr = jnp.ones((3, npad), jnp.float32)
    res = jnp.zeros((3, npad), jnp.float32)
    alive = jnp.concatenate(
        [jnp.ones((1, n), jnp.int32), jnp.zeros((1, pad), jnp.int32)], axis=1
    ) if pad else jnp.ones((1, n), jnp.int32)
    counters0 = jnp.zeros((2,), jnp.int32)

    def bounce(carry, bounce_idx):
        rays, state_r, thr, res, alive, counters = carry
        alive_b = alive[0] != 0
        # Traced coherence hint: see ops/trace.py — camera rays skip the
        # bucket reorder, later bounces opt in, scan structure unchanged.
        reorder = bounce_idx > 0
        t, idx = closest_hit(rays[0:3], rays[3:6], active=alive_b,
                             reorder=reorder)
        counters = counters.at[0].add(jnp.sum(alive))
        outs = bounce_stage_pallas(
            bounce_idx, rays, state_r, thr, res, alive,
            t[None, :], idx[None, :], tri_table, light_table, atlas_table,
            do_mis=do_mis, num_lights=num_lights, atlas_hw=atlas_hw,
            slots_used=slots_used, interpret=interpret,
        )
        (rays, state_r, thr, res, alive,
         srays, stmax, smask, sdirect, spdf) = outs
        if do_mis:
            counters = counters.at[1].add(jnp.sum(smask))
            shadow_t, _ = closest_hit(
                srays[0:3], srays[3:6],
                active=smask[0] != 0, t_max=stmax[0], any_hit=True,
                reorder=reorder,
            )
            st = TRACE.BounceState(
                ro=vec.from_rows(rays, 0), rd=vec.from_rows(rays, 3),
                throughput=vec.from_rows(thr, 0), result=vec.from_rows(res, 0),
                alive=alive[0:1] != 0, state=state_r,
            )
            shadow = TRACE.ShadowQuery(
                origin=vec.from_rows(srays, 0),
                direction=vec.from_rows(srays, 3),
                t_max=stmax, mask=smask != 0,
                direct=vec.from_rows(sdirect, 0), pdf=spdf,
            )
            st = TRACE.resolve_shadow(st, shadow, shadow_t[None, :])
            res = jnp.concatenate([st.result.x, st.result.y, st.result.z], 0)
        return (rays, state_r, thr, res, alive, counters), None

    carry0 = (rays, state_r, thr, res, alive, counters0)
    (rays, state_r, thr, res, alive, counters), _ = jax.lax.scan(
        bounce, carry0, jnp.arange(max_bounces), unroll=1
    )
    radiance = res.T[:n]
    out_state = state_r[0, :n]
    stats = {"closest": counters[0], "shadow": counters[1]}
    return radiance, out_state, stats
