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

Scope: scenes whose denormalized triangle table fits VMEM (<= MAX_VMEM_TRIS
triangles; larger scenes use the XLA bounce). Texture atlases take one of
two paths (pt.wgsl:112-120 getTextureColor equivalent):

* <= UNTILED_ATLAS_TEXELS: in-kernel two-level one-hot — an exact one-hot
  MXU matmul over atlas ROWS followed by a static column-select sweep
  (the atlas is VMEM-resident);
* larger: EXTERNAL mode — per bounce, an XLA-side native HBM gather
  (_gather_texels) fetches the winner texels outside the kernel and hands
  them in as per-lane rows. In-kernel one-hot cost scales with atlas AREA
  x rays (TPU vector units have no per-lane gather), so a 512^2 atlas
  measured 12.9 Mrays/s in-kernel vs ~untextured rates external. No atlas
  size cap.

The radiance and RNG streams are identical to the XLA path because the
shading code is literally shared.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgpu_path_tracing_tpu.models import types as T
from wgpu_path_tracing_tpu.ops import shade as SHADE
from wgpu_path_tracing_tpu.ops import trace as TRACE
from wgpu_path_tracing_tpu.ops import vec
from wgpu_path_tracing_tpu.ops.vec import V3

BN = 1024
SELECT_CHUNK = 256  # one-hot select chunk over table rows. Round-5
# on-chip sweep on glass (the only multi-chunk bench scene; same
# process, widened touch mask): 512 -> 6.36/6.37, 256 -> 6.44, 128 ->
# 6.41 Mrays/s — finer gating buys ~1%; most chunks stay touched by a
# 1024-ray block's scattered winners, so the residual exact-select cost
# (~8.7% measured by an inexact-1-dot timing A/B) is MAC-bound on
# touched chunks, not gating-bound. Tables <= 256 rows (headline
# cornell, small atlases) stay single-chunk — programs unchanged.

MAX_VMEM_TRIS = 16384  # denormalized table stays VMEM-small (~3 MB); the
# one-hot fetch cost grows with rows but still beats the XLA bounce's HBM
# round-trips at this size (measured: glass_box 11.8k tris 4.2 -> see
# BASELINE.md; cap re-measured round 2)
UNTILED_ATLAS_TEXELS = 128 * 128  # below this the in-kernel row-select
# sampler wins (one-hot cost ~ Hp*W*4*BN MACs is still small); above it
# EXTERNAL mode (XLA-side HBM texel gather) takes over — an in-kernel
# tiled sampler was built and REJECTED by measurement (12.9 Mrays/s at
# 512^2 vs ~untextured rates external; see TODO.md 4b)
FAT_VMEM_TEXELS = 128 * 64  # in-kernel FAT sampler bound: within it ONE
# one-hot row select serves all four texture slots (the round-3 ablation
# measured the per-slot sampler calls at ~27% of the bounce kernel EACH,
# linear in calls — the select construction, not the MACs, is the cost).
# Bound set by the round-3 on-chip sweep (same-process, 512^2x64spp):
# 32^2 atlas fat 192.5 vs per-slot 178.8; 128^2 atlas (fat canvas
# (128,64) = 8192 texels, 512 KB) fat 145.5 vs per-slot 114.6 (+27%);
# 256^2 atlas (fat canvas (256,128) = 32768 texels) fat 75.6 vs
# EXTERNAL 89.3 — the one-hot dot cost scales with canvas rows x cols,
# so past ~8k texels the HBM-gather external mode wins and stays the
# production path.
FAT_KERNEL_MAX_SETS = 8  # in-kernel map-set match cost is ~20 vreg ops
# per set per bounce (16 compares + 4 selects on (8, 128) blocks); past a
# handful of sets that rivals the shading chain itself — bigger set
# counts use EXTERNAL mode, whose XLA-side match is amortized differently

# Round-5 structural levers on the exact-select cost (A/B'd on-chip, both
# verified by tools/oracle_onchip.py on cornell AND glass — the round-4
# rule: interpret==hardware is a claim, never an assumption):
SELECT_FUSED = True  # ONE K=3*chunk dot (hi/mid/lo planes concatenated
# along the CONTRACTION axis, one-hot replicated) replaces
# (dot(hi)+dot(mid))+dot(lo). The split itself stays IN-KERNEL — this is
# NOT the reverted round-4 presplit (which concatenated planes along the
# COLUMN axis outside the kernel and re-broke multi-chunk on hardware).
# Per-element accumulation order inside the MXU is K-ascending, so each
# output element still computes (hi + mid) + lo with exact +0.0 terms
# elsewhere — bit-identity verified by the CPU parity suite and on-chip
# oracle arbitration.
PRUNE_TRI_COLS = True  # prune the bounce tri table to the columns the
# kernel's shading configuration actually reads (_used_tri_cols):
# untextured scenes consume 29 of 52 TF_COLS (uv / rect / mat cols dead),
# external-atlas scenes skip the 16 rect cols. Dead columns return
# exact zeros from the accessor — their values feed only dead
# intermediates (uv_u/uv_v on untextured paths), never radiance or RNG.


def _select_rows(table_ref, idx, chunk: int = SELECT_CHUNK,
                 bf16_exact: bool = False):
    """rows (C, 8, 128) = table_ref (Tp, C) selected by idx (8, 128), via
    chunked one-hot MXU matmuls (Tp is a multiple of ``chunk``).

    EXACTNESS IS LOAD-BEARING (same reason as ops/gathers.fetch_rows):
    Mosaic's default MXU dot truncates the TABLE side to bf16 on real
    chips (~0.4% per fetched attribute), which the CPU interpret path
    does NOT reproduce — that silent skew systematically deflected
    refracted glass paths for rounds (scalar-oracle arbitration, round 4)
    while every on-chip "bit-identical" A/B compared two equally
    truncated kernel variants. Two exact modes:

    ``bf16_exact``: the caller GUARANTEES every value of the table is a
    bf16-representable f32 (atlas texels — quantized at the
    finalize_scene choke point, asserted by pack_device_scene), so one
    default-precision dot is already lossless.

    Otherwise: Dekker-style 3-term bf16 split of each chunk slab
    IN-KERNEL (hi/mid/lo are bf16-representable f32 planes, so each
    default-precision product is exact and hi+mid+lo re-adds exactly —
    bit-exact by on-chip microtest AND by oracle arbitration,
    tools/oracle_onchip.py). NOTE (round-4 hard lesson, twice): a
    PRESPLIT variant — planes column-concatenated OUTSIDE the kernel,
    one (chunk, 3C) dot per chunk — was landed and then REVERTED: it
    re-broke the multi-chunk path ON HARDWARE ONLY (oracle tool: 90% of
    glass lanes diverging, bright pixels black — interpret mode and the
    single-chunk path were exact), and it measured no headline gain over
    the in-kernel split anyway (3.096 vs 3.120 s; the ~8% exactness cost
    is the tripled MAC structure, invariant across four variants). Do
    not re-attempt without oracle_onchip.py PASSING on glass.

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
        slab = table_ref[pl.ds(base, chunk), :]

        def dot(a, oh=None):
            return jax.lax.dot_general(
                a,
                onehot if oh is None else oh,
                dimension_numbers=((([0]), ([0])), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if bf16_exact:
            return dot(slab)  # lossless: values are bf16-representable
        hi = slab.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = slab - hi
        mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
        lo = r1 - mid
        if SELECT_FUSED:
            # One K=3*chunk MXU pass; K-ascending accumulation keeps each
            # element's sum (hi + mid) + lo exactly (see flag comment).
            planes = jnp.concatenate([hi, mid, lo], axis=0)
            oh3 = jnp.concatenate([onehot, onehot, onehot], axis=0)
            return dot(planes, oh3)  # (C, 1024)
        return (dot(hi) + dot(mid)) + dot(lo)  # (C, 1024)

    if n_chunks == 1:
        return part_of(0).reshape(cols, 8, 128)

    # Multi-chunk tables (big scenes): winner indices are BVH-ordered, so
    # a ray block's hits cluster in FEW chunks. Packed touch words
    # (vector reduces, back-to-back) gate each chunk's iota+dot behind a
    # lax.cond — a skipped chunk contributes exactly the +0.0 its all-zero
    # one-hot rows would have (bit-identical, verified on-chip; glass
    # 8.71 -> 8.34 s same-process). Round 5 widened the mask from one
    # int32 word to ceil(n_chunks/32) words so chunk sizes below
    # rows/32 are legal (bit 31 via sign bit + arithmetic shift still
    # reads correctly: (w >> 31) & 1).
    cidx = idx2 // chunk
    words = []
    for w in range((n_chunks + 31) // 32):
        tw = jnp.int32(0)
        for b in range(min(32, n_chunks - 32 * w)):
            c = 32 * w + b
            tw = tw | (
                (jnp.sum((cidx == c).astype(jnp.int32)) > 0)
                .astype(jnp.int32) << b
            )
        words.append(tw)

    # One fori_loop per 32-chunk word, the word a STATIC closure operand:
    # Mosaic does not lower dynamic_slice (a traced touch[ci // 32] fails
    # on hardware — interpret mode accepts it, the usual trap), but a
    # scalar shift by a traced amount lowers fine. n_words == 1
    # reproduces the old single-word program shape.
    acc = jnp.zeros((cols, 1024), jnp.float32)
    for w, word in enumerate(words):
        lo = 32 * w
        hi = min(lo + 32, n_chunks)

        def body(ci, a, word=word, lo=lo):
            bit = (word >> (ci - lo)) & 1
            return jax.lax.cond(
                bit != 0,
                lambda x: x + part_of(ci),
                lambda x: x,
                a,
            )

        acc = jax.lax.fori_loop(lo, hi, body, acc)
    return acc.reshape(cols, 8, 128)


def _used_tri_cols(atlas_hw, slots_used) -> tuple:
    """The TF_* columns the kernel's shading configuration actually reads
    (ops/shade.py::hit_attributes_from_cols + barycentrics_from_cols).

    Geometry (v0/v1/v2, n0..n2) and the scalar material block
    (base_color..transmission) are always consumed. UV columns feed only
    the texture samplers and the normal-map tangent basis; atlas-rect
    columns feed only the in-kernel samplers (per-slot: used slots' rects;
    fat: all 16 for the map-set match) — EXTERNAL mode pre-gathers texels
    XLA-side from the FULL tri_full table, so the kernel reads no rects.
    TF_MAT is never read in-kernel. Pruning the select's dot to these
    columns cannot change radiance or RNG: dead columns only ever reach
    dead intermediates (e.g. uv_u/uv_v on untextured paths)."""
    cols = list(range(T.TF_V0, T.TF_UV0))  # v0, v1, v2, n0, n1, n2
    mode = None if atlas_hw is None else atlas_hw[2]
    uv_needed = atlas_hw is not None and (
        slots_used[3] if mode == "ext" else any(slots_used)
    )
    if uv_needed:
        cols += list(range(T.TF_UV0, T.TF_UV0 + 6))
    cols += list(range(T.TF_BASE_COLOR, T.TF_ALBEDO_RECT))
    if mode == "fat":
        cols += list(range(T.TF_ALBEDO_RECT, T.TF_COLS))
    elif mode is not None and mode != "ext":
        for k in range(4):
            if slots_used[k]:
                base = SHADE.SLOT_RECT_COLS[k]
                cols += list(range(base, base + 4))
    return tuple(sorted(cols))


def _trunc(x):
    """Round toward zero (Mosaic-safe; jnp.fmod does not lower)."""
    return jnp.where(x >= 0.0, jnp.floor(x), jnp.ceil(x))


def _make_atlas_sampler(atlas_ref, width: int, height: int):
    """In-VMEM getTextureColor (pt.wgsl:112-120): atlas_ref is (Hp, W*4).

    Row select = exact one-hot MXU matmul (0/1 entries reproduce the f32
    texel row bit-exactly); column select = static sweep over the W texel
    columns (W is small by the UNTILED_ATLAS_TEXELS bound)."""

    def sample(rect, u, v, fallback):
        rx, ry, rw, rh = rect  # (8, 128) lanes, pixels as f32
        # WGSL % is sign-preserving fmod; exact as u - trunc(u) here.
        ax = rx + (u - _trunc(u)) * rw
        ay = ry + (v - _trunc(v)) * rh
        ix = jnp.clip(ax, 0.0, width - 1.0).astype(jnp.int32)
        iy = jnp.clip(ay, 0.0, height - 1.0).astype(jnp.int32)
        rows = _select_rows(
            atlas_ref, iy, chunk=min(SELECT_CHUNK, atlas_ref.shape[0]),
            bf16_exact=True,
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


def _make_fat_sampler(atlas_ref, rects_ref, fh: int, fw: int, slots_used):
    """In-VMEM fat-atlas sampling: ONE one-hot row select serves all four
    texture slots (shade.sample_atlas_fat semantics, in-kernel).

    The round-3 bounce ablation measured the per-slot in-kernel samplers
    at ~27% of the kernel EACH and LINEAR in call count — the per-call
    one-hot select construction dominates, not the MXU MACs (which are
    payload-equal either way: 4 selects x 4 channels == 1 select x 16).
    The fat canvas rides VMEM as (FHp, FW*16); each lane's virtual rect is
    resolved by matching its 16 atlas-rect values (already on hand from
    the selected triangle row) against the (S, 20) match table riding
    scalar prefetch — S scalar-broadcast compare chains, cheap for the
    small set counts the FAT_KERNEL_MAX_SETS bake gate admits.

    Index math and texel choice are bit-identical to sample_atlas_fat
    (u - trunc(u) == fmod(u, 1.0) exactly; one-hot 0/1 f32 select
    reproduces the gathered row bit-exactly), so the XLA trace path and
    this kernel keep identical RNG streams.

    Returns ``fat_quads(get, u, v) -> [4 x [r, g, b, a]]`` in SLOT order;
    unused slots (slots_used mask) return their fallbacks sweep-free.
    """
    n_sets = rects_ref.shape[0]

    def fat_quads(get, u, v):
        rects = [[get(c + i) for i in range(4)]
                 for c in SHADE.SLOT_RECT_COLS]
        missing = [(r[2] == 0.0) | (r[3] == 0.0) for r in rects]
        vals = [rects[k][i] for k in range(4) for i in range(4)]
        zero = jnp.zeros_like(u)
        fx = fy = vw = vh = zero
        for s in range(n_sets):
            m = None
            for j in range(16):
                eq = vals[j] == rects_ref[s, j].astype(jnp.float32)
                m = eq if m is None else m & eq
            fx = jnp.where(m, rects_ref[s, 16].astype(jnp.float32), fx)
            fy = jnp.where(m, rects_ref[s, 17].astype(jnp.float32), fy)
            vw = jnp.where(m, rects_ref[s, 18].astype(jnp.float32), vw)
            vh = jnp.where(m, rects_ref[s, 19].astype(jnp.float32), vh)
        # Same index math as sample_atlas_fat on the virtual rect
        # (pt.wgsl:112-120; u - trunc(u) is bit-identical to fmod(u, 1)).
        ax = fx + (u - _trunc(u)) * vw
        ay = fy + (v - _trunc(v)) * vh
        ix = jnp.clip(ax, 0.0, fw - 1.0).astype(jnp.int32)
        iy = jnp.clip(ay, 0.0, fh - 1.0).astype(jnp.int32)
        rows = _select_rows(
            atlas_ref, iy, chunk=min(SELECT_CHUNK, atlas_ref.shape[0]),
            bf16_exact=True,
        )  # (FW*16, 8, 128) — each lane's fat texel row
        quads = []
        for k in range(4):
            fb = SHADE.SLOT_FALLBACKS[k]
            if not slots_used[k]:
                # hit_attributes never consumes unused slots; skip their
                # column sweeps entirely (values here are never read).
                quads.append([zero + fb[c] for c in range(4)])
                continue
            quad = []
            for c in range(4):
                acc = zero
                for w in range(fw):
                    acc = jnp.where(ix == w, rows[w * 16 + 4 * k + c], acc)
                quad.append(jnp.where(missing[k], fb[c], acc))
            quads.append(quad)
        return quads

    return fat_quads


def _gather_texels(scene, idx, ro3, rd3, slots_used):
    """XLA-side texel pre-gather for EXTERNAL atlas mode (big atlases).

    The in-VMEM samplers pay MXU one-hot MACs proportional to atlas AREA
    x rays — TPU vector units have no per-lane gather, so selecting one
    texel from a 512^2 atlas costs the whole table sweep (measured 12.9
    Mrays/s tiled vs 174.5 for a 32^2 atlas). For big atlases the right
    primitive is the native XLA gather (HBM controller): fetch the winner
    row, interpolate uv with the SAME expressions the kernel uses
    (shade.barycentrics_from_cols — texel choice can differ from an
    in-kernel sample only by FMA-placement ulps on texel boundaries, the
    documented class), sample each USED slot (fallbacks applied), and
    hand the kernel (4 * n_used, N) finished texel rows in
    hit_attributes_from_cols call order.

    When pack_device_scene built a fat canvas ("atlas_fat": uv in [0,1]
    and LCM-grid budget respected — arbitrary map sets since round 3's
    virtual-rect generalization) ALL slots ride ONE gather — the per-row
    fetch is latency-bound (~8-11 ns each, measured round 3), so one
    fetch of a 64-B fat row costs ~the same as one 16-B texel fetch and
    the four per-slot gathers collapse 4x. Values are produced by the
    same shade.sample_atlas_fat the XLA trace path uses, so the two
    paths stay bit-identical."""
    from wgpu_path_tracing_tpu.ops import shade as SHADE
    from wgpu_path_tracing_tpu.ops.gathers import fetch_rows

    atlas = scene["atlas"]
    safe = jnp.maximum(idx, 0)
    row = fetch_rows(scene["tri_full"], safe)  # (N, TF_COLS)

    def get(c):
        return row[:, c]

    ro = V3(ro3[0], ro3[1], ro3[2])
    rd = V3(rd3[0], rd3[1], rd3[2])
    _, _, _, _, _, uv_u, uv_v = SHADE.barycentrics_from_cols(get, ro, rd)
    rows = []
    if "atlas_fat" in scene:
        quads = SHADE.sample_atlas_fat(
            scene["atlas_fat"], scene["atlas_fat_rects"], get, uv_u, uv_v,
        )
        for k in range(4):
            if slots_used[k]:
                rows.extend(quads[k])
    else:
        for k in range(4):
            if not slots_used[k]:
                continue
            rect = [get(SHADE.SLOT_RECT_COLS[k] + i) for i in range(4)]
            rows.extend(SHADE.sample_atlas(atlas, rect, uv_u, uv_v,
                                           SHADE.SLOT_FALLBACKS[k]))
    return jnp.stack(rows, axis=0)  # (4 * n_used, N)


def _bounce_kernel(do_mis, num_lights, atlas_hw=None,
                   slots_used=(True, True, True, True), has_lds=False,
                   tri_cols=None):
    def kernel(
        bounce_ref,  # scalar prefetch: (1,) int32
        *refs,
    ):
        refs = list(refs)
        if atlas_hw is not None and atlas_hw[2] == "fat":
            # Second scalar-prefetch operand: the (S, 20) map-set
            # match table (SMEM scalar reads, see _make_fat_sampler).
            rects_ref = refs.pop(0)
        (ray_ref, state_ref, thr_ref, res_ref, alive_ref, t_ref,
         idx_ref, tri_ref, light_ref) = refs[:9]
        del refs[:9]
        if atlas_hw is not None:
            atlas_ref = refs.pop(0)
            if atlas_hw[2] == "ext":
                atlas = "ext"  # closure built after ``row`` below
            elif atlas_hw[2] == "fat":
                atlas = ("fatfn", _make_fat_sampler(
                    atlas_ref, rects_ref, atlas_hw[0], atlas_hw[1],
                    slots_used))
            else:
                atlas = _make_atlas_sampler(atlas_ref, atlas_hw[1],
                                            atlas_hw[0])
        else:
            atlas = None
        # Optional (3, BN) bounce-0 low-discrepancy draw rows
        # (rng="stratified" extension — ops/camera_rays.py::bounce0_lds).
        lds_ref = refs.pop(0) if has_lds else None
        (oray_ref, ostate_ref, othr_ref, ores_ref, oalive_ref,
         shadow_ray_ref, stmax_ref, smask_ref, sdirect_ref,
         spdf_ref) = refs
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

        if atlas == "ext":
            # External mode: atlas_ref holds the XLA-pre-gathered texel
            # rows (_gather_texels); consume them in hit_attributes'
            # slot call order (used slots only, matching the gather).
            calls = {"n": 0}

            def _ext_sample(rect, u, v, fallback, _r=atlas_ref):
                k = calls["n"]
                calls["n"] += 1
                return [row(_r, k * 4 + c) for c in range(4)]

            atlas = _ext_sample

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

        # PRUNE_TRI_COLS: the table carries only the columns this shading
        # configuration reads (_used_tri_cols); the accessor maps original
        # TF_* indices through the static tri_cols tuple. A pruned column
        # returns exact zeros — by construction its value feeds only dead
        # intermediates (never radiance or RNG), so parity is unchanged.
        col_map = (None if tri_cols is None
                   else {c: i for i, c in enumerate(tri_cols)})

        def fetch_tri(safe_idx):
            rows = _select_rows(tri_ref, safe_idx,
                                chunk=min(SELECT_CHUNK, tri_ref.shape[0]))
            if col_map is None:
                return lambda c: rows[c]
            zero = jnp.zeros((8, 128), jnp.float32)

            def get(c):
                i = col_map.get(c)
                return zero if i is None else rows[i]

            return get

        def fetch_light(lidx):
            rows = _select_rows(light_ref, lidx, chunk=light_ref.shape[0])
            return lambda c: rows[c]

        override = None
        if has_lds:
            # Traced gate: only bounce 0 takes the LDS values (exactly
            # the ops/trace.py override semantics — shared bounce_core).
            override = (bounce_ref[0] == 0, row(lds_ref, 0),
                        row(lds_ref, 1), row(lds_ref, 2))
        new_st, shadow = TRACE.bounce_core(
            st, t, idx, bounce_ref[0],
            fetch_tri=fetch_tri, fetch_light=fetch_light, atlas=atlas,
            do_mis=do_mis, num_lights=num_lights, slots_used=slots_used,
            bsdf_override=override,
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
                     "interpret", "tri_cols"),
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
    fat_rects=None,  # (S, 20) int32 map-set match table (fat mode only)
    lds=None,  # (3, N) bounce-0 LDS rows [lobe, r1, r2] or None
    *,
    do_mis: bool,
    num_lights: int,
    atlas_hw: tuple[int, int] | None = None,
    slots_used: tuple = (True, True, True, True),
    interpret: bool = False,
    tri_cols: tuple | None = None,
):
    n = rays.shape[1]
    nb = n // BN
    bidx = jnp.reshape(bounce_idx, (1,)).astype(jnp.int32)

    # 2D lane blocks (rows, BN): bitcast-compatible with the (rows, N)
    # layouts of the intersection kernels on both sides of this stage, so
    # XLA inserts no relayout copies at the boundaries. (Variadic index
    # maps: fat mode adds a second scalar-prefetch ref to the signature.)
    def row_spec(rows):
        return pl.BlockSpec((rows, BN), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    def table_spec(shape):
        return pl.BlockSpec(shape, lambda i, *_: (0, 0),
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
        if atlas_hw[2] == "ext":
            # Pre-gathered texel rows ride the ray-block axis like every
            # other per-lane operand.
            in_specs.append(row_spec(atlas_table.shape[0]))
        else:
            # Whole-table VMEM residency ("fat" canvas or per-slot atlas).
            in_specs.append(table_spec(atlas_table.shape))
        operands.append(atlas_table)
    if lds is not None:
        in_specs.append(row_spec(3))
        operands.append(lds)
    num_prefetch = 1
    if atlas_hw is not None and atlas_hw[2] == "fat":
        # The (S, 20) map-set match table rides scalar prefetch (SMEM);
        # prefetch operands precede the regular ones.
        operands.insert(1, fat_rects)
        num_prefetch = 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            row_spec(6), row_spec(1), row_spec(3), row_spec(3), row_spec(1),
            row_spec(6), row_spec(1), row_spec(1), row_spec(3), row_spec(1),
        ],
        scratch_shapes=[],
    )
    outs = pl.pallas_call(
        _bounce_kernel(do_mis, num_lights, atlas_hw, slots_used,
                       has_lds=lds is not None, tri_cols=tri_cols),
        grid_spec=grid_spec,
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


def prepare_tables(scene, slots_used=(True, True, True, True)):
    """Pad the denormalized tables for in-VMEM residency. Returns
    (tri_table (Tp, C_used), light_table (Lp, LF_COLS),
    atlas_table (Hp, W*4 | FW*16) | None, atlas_hw | None,
    fat_rects (S, 20) int32 | None, tri_cols), or None if the scene is too
    large for the megakernel. atlas_hw[2] selects the sampling mode: "fat"
    (ONE in-VMEM one-hot select serves all four slots), "ext" (XLA-side
    HBM texel pre-gather), or False (per-slot in-VMEM one-hot selects).
    ``tri_cols`` is the static tuple of original TF_* column indices kept
    by the PRUNE_TRI_COLS pruning (_used_tri_cols) — the kernel's column
    accessor maps through it; None means the full unpruned table."""
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
    atlas_p = atlas_hw = fat_rects = None
    if textured:
        h, w = atlas.shape[0], atlas.shape[1]
        fat = scene.get("atlas_fat")
        if (fat is not None
                and fat.shape[0] * fat.shape[1] <= FAT_VMEM_TEXELS
                and scene["atlas_fat_rects"].shape[0]
                <= FAT_KERNEL_MAX_SETS):
            # In-kernel FAT mode: the canvas rides VMEM as (FHp, FW*16)
            # and ONE one-hot select serves all four slots
            # (_make_fat_sampler). Chosen whenever the bake fits the
            # kernel budgets, regardless of the base atlas size — the
            # per-slot sampler pays its select construction per CALL.
            fh, fw = fat.shape[0], fat.shape[1]
            flat = jnp.asarray(fat, jnp.float32).reshape(fh, fw * 16)
            hp = max(8, -(-fh // 8) * 8)
            if hp > SELECT_CHUNK:
                hp = -(-hp // SELECT_CHUNK) * SELECT_CHUNK
            atlas_p = jnp.pad(flat, ((0, hp - fh), (0, 0)))
            # Match-table values are integer pixel coords; int32 for the
            # scalar-prefetch (SMEM) operand.
            fat_rects = jnp.asarray(
                scene["atlas_fat_rects"], jnp.int32
            )
            atlas_hw = (fh, fw, "fat")
        elif fat is not None or h * w > UNTILED_ATLAS_TEXELS:
            # Big atlases (or fat canvases past the in-kernel budget):
            # EXTERNAL mode — texels come from an XLA-side native HBM
            # gather per bounce (_gather_texels, one fat row per lane
            # when the bake exists); the atlas never enters VMEM, so
            # there is NO size cap. Supersedes the in-kernel tiled
            # sampler, whose MXU one-hot cost scales with atlas area x
            # rays (12.9 vs 174.5 Mrays/s at 512^2 vs 32^2).
            atlas_hw = (h, w, "ext")
        else:
            flat = jnp.asarray(atlas, jnp.float32).reshape(h, w * 4)
            # Same rule as the triangle table: the row count must be a
            # multiple of the one-hot select chunk or _select_rows'
            # fori_loop silently skips the tail rows.
            hp = max(8, -(-h // 8) * 8)
            if hp > SELECT_CHUNK:
                hp = -(-hp // SELECT_CHUNK) * SELECT_CHUNK
            atlas_p = jnp.pad(flat, ((0, hp - h), (0, 0)))
            atlas_hw = (h, w, False)
    tri_cols = None
    if PRUNE_TRI_COLS:
        tri_cols = _used_tri_cols(atlas_hw, slots_used)
        if len(tri_cols) < tri_p.shape[1]:
            tri_p = tri_p[:, list(tri_cols)]
        else:
            tri_cols = None  # nothing pruned; keep the identity accessor
    return tri_p, light_p, atlas_p, atlas_hw, fat_rects, tri_cols


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
    lds0=None,
):
    """Drop-in replacement for ops/trace.py::trace on TPU for VMEM-sized
    scenes (triangles and, if textured, the atlas). Same signature, same
    semantics, same RNG streams. ``lds0`` (optional, rng="stratified"
    bounce-0 extension): (3, N) rows [lobe, r1, r2] substituted for the
    first bounce's three main BSDF draws inside the kernel — identical
    semantics to ops/trace.py's override (shared bounce_core)."""
    tables = prepare_tables(scene, slots_used)
    assert tables is not None, "scene too large for the bounce megakernel"
    (tri_table, light_table, atlas_table, atlas_hw, fat_rects,
     tri_cols) = tables
    if (atlas_hw is not None and atlas_hw[2] == "ext"
            and not any(slots_used)):
        atlas_hw = None  # textured flag set but no slot mapped anywhere

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
    lds_p = None
    if lds0 is not None:
        lds_p = jnp.pad(lds0, ((0, 0), (0, pad))) if pad else lds0

    def bounce(carry, bounce_idx):
        rays, state_r, thr, res, alive, counters = carry
        alive_b = alive[0] != 0
        # Traced coherence hint: see ops/trace.py — camera rays skip the
        # bucket reorder, later bounces opt in, scan structure unchanged.
        reorder = bounce_idx > 0
        t, idx = closest_hit(rays[0:3], rays[3:6], active=alive_b,
                             reorder=reorder)
        counters = counters.at[0].add(jnp.sum(alive))
        atlas_op = atlas_table
        if atlas_hw is not None and atlas_hw[2] == "ext":
            # Big atlas: native XLA HBM gather of the winner texels,
            # handed to the kernel as per-lane rows (no VMEM residency,
            # no size cap).
            atlas_op = _gather_texels(
                scene, idx, rays[0:3], rays[3:6], slots_used,
            )
        outs = bounce_stage_pallas(
            bounce_idx, rays, state_r, thr, res, alive,
            t[None, :], idx[None, :], tri_table, light_table, atlas_op,
            fat_rects, lds_p,
            do_mis=do_mis, num_lights=num_lights, atlas_hw=atlas_hw,
            slots_used=slots_used, interpret=interpret, tri_cols=tri_cols,
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
