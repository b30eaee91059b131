"""Scene data structures.

Host side, the scene is plain-NumPy SoA (``SceneArrays``), mirroring the CPU
structs of the reference (gpu.ts:10-65 — TriangleCPU / MaterialCPU /
LightCPU / SceneData) but columnar rather than array-of-objects.

Device side (``DeviceScene``), arrays are packed into a handful of wide f32
tables so each hot-loop gather fetches one row:

* ``tri_isect``  (T, 9)  = [v0, e1, e2]           — intersection only
  (edges precomputed; pt.wgsl:128-129 derives them per test)
* ``tri_shade``  (T, 28) = [v0,v1,v2,n0,n1,n2,uv0,uv1,uv2,mat] — fetched once
  per bounce for the winning triangle (pt.wgsl:28-39 Triangle layout)
* ``materials``  (M, 26) = [baseColor(3), metallic, roughness, emission(3),
  emissiveStrength, ior, transmission, albedoRect(4), normalRect(4),
  pbrRect(4), emissiveRect(4)]                    — pt.wgsl:14-26 Material
* ``lights``     (L, 9)  = [position(3), type, color(3), intensity, triIndex]
  — pt.wgsl:45-51 Light (directional stores direction in position,
  gpu.ts:212)
* ``bvh_aabb``   (B, 6) f32 and ``bvh_meta`` (B, 4) i32 = [left, right,
  triangleOffset, triangleCount]                  — pt.wgsl:67-78 BVHNode
* ``atlas``      (Ah, Aw, 4) f32 — rgba16float atlas texture equivalent
  (renderer.ts:246-253); rects are in pixels (atlas.ts:25-30)

Atlas rect coordinates are stored as f32 inside the material rows (pixel
coordinates are exactly representable), so one material gather fetches
everything.
"""

from __future__ import annotations

import dataclasses

import numpy as np

LIGHT_TYPE_EMISSIVE = 0  # pt.wgsl:41
LIGHT_TYPE_DIRECTIONAL = 1  # pt.wgsl:42
LIGHT_TYPE_POINT = 2  # pt.wgsl:43
# Extension: KHR_lights_punctual "spot". The reference warns-and-skips spots
# (gpu.ts:234-236); this framework renders them when the loader is invoked
# with enable_spot_lights=True (default keeps parity: warn + skip).
LIGHT_TYPE_SPOT = 3

# Column offsets within the packed material row (DeviceScene.materials).
MAT_BASE_COLOR = 0  # 3
MAT_METALLIC = 3
MAT_ROUGHNESS = 4
MAT_EMISSION = 5  # 3
MAT_EMISSIVE_STRENGTH = 8
MAT_IOR = 9
MAT_TRANSMISSION = 10
MAT_ALBEDO_RECT = 11  # 4: x, y, w, h (pixels)
MAT_NORMAL_RECT = 15  # 4
MAT_PBR_RECT = 19  # 4
MAT_EMISSIVE_RECT = 23  # 4
MAT_COLS = 27

# Column offsets within the packed triangle shade row (DeviceScene.tri_shade).
TRI_V0 = 0  # 3
TRI_V1 = 3  # 3
TRI_V2 = 6  # 3
TRI_N0 = 9  # 3
TRI_N1 = 12  # 3
TRI_N2 = 15  # 3
TRI_UV0 = 18  # 2
TRI_UV1 = 20  # 2
TRI_UV2 = 22  # 2
TRI_MAT = 24
TRI_COLS = 25

# Column offsets within the packed light row (DeviceScene.lights).
LGT_POSITION = 0  # 3
LGT_TYPE = 3
LGT_COLOR = 4  # 3
LGT_INTENSITY = 7
LGT_TRI = 8
LGT_COLS = 9

# DeviceScene.tri_full — triangle row with its material DENORMALIZED in, so
# one row fetch per bounce yields every shading attribute (the reference
# instead chases Triangle.materialIndex -> materials[] per hit,
# pt.wgsl:199-213; joining host-side turns two dynamic lookups into one).
TF_V0 = 0  # 3
TF_V1 = 3  # 3
TF_V2 = 6  # 3
TF_N0 = 9  # 3
TF_N1 = 12  # 3
TF_N2 = 15  # 3
TF_UV0 = 18  # 2
TF_UV1 = 20  # 2
TF_UV2 = 22  # 2
TF_MAT = 24
TF_BASE_COLOR = 25  # 3
TF_METALLIC = 28
TF_ROUGHNESS = 29
TF_EMISSION = 30  # 3
TF_EMISSIVE_STRENGTH = 33
TF_IOR = 34
TF_TRANSMISSION = 35
TF_ALBEDO_RECT = 36  # 4
TF_NORMAL_RECT = 40  # 4
TF_PBR_RECT = 44  # 4
TF_EMISSIVE_RECT = 48  # 4
TF_COLS = 52

# DeviceScene.light_full — light row with its emissive triangle's geometry
# denormalized in (sampleLight fetches triangles[light.triangleIndex],
# pt.wgsl:441-454; joining host-side removes that dynamic lookup).
LF_POSITION = 0  # 3
LF_TYPE = 3
LF_COLOR = 4  # 3
LF_INTENSITY = 7
LF_TRI = 8
LF_V0 = 9  # 3
LF_V1 = 12  # 3
LF_V2 = 15  # 3
LF_N0 = 18  # 3
LF_N1 = 21  # 3
LF_N2 = 24  # 3
LF_COLS = 27
# Spot lights carry no emissive triangle, so their rows reuse the triangle
# columns: LF_V0 slot holds the world-space spot direction and LF_V1/+1 the
# precomputed angular-attenuation scale/offset (glTF KHR_lights_punctual:
# scale = 1/max(1e-3, cos(inner) - cos(outer)), offset = -cos(outer)*scale).
LF_SPOT_DIR = LF_V0  # 3
LF_SPOT_SCALE = LF_V1
LF_SPOT_OFFSET = LF_V1 + 1


@dataclasses.dataclass
class SceneArrays:
    """Host-side columnar scene (all NumPy).

    Triangle order is the BVH-sorted order (buildBVH reorders triangles in
    place — bvh.ts:53-157, and emissive lights are extracted AFTER the
    reorder so light.triangleIndex refers to sorted positions, gpu.ts:119-138).
    """

    # Triangles (T, ...)
    tri_v0: np.ndarray
    tri_v1: np.ndarray
    tri_v2: np.ndarray
    tri_n0: np.ndarray
    tri_n1: np.ndarray
    tri_n2: np.ndarray
    tri_uv0: np.ndarray
    tri_uv1: np.ndarray
    tri_uv2: np.ndarray
    tri_mat: np.ndarray  # (T,) int32

    # Materials (M, ...)
    mat_base_color: np.ndarray  # (M, 3)
    mat_metallic: np.ndarray  # (M,)
    mat_roughness: np.ndarray
    mat_emission: np.ndarray  # (M, 3)
    mat_emissive_strength: np.ndarray
    mat_ior: np.ndarray
    mat_transmission: np.ndarray
    mat_albedo_rect: np.ndarray  # (M, 4) int32 pixels
    mat_normal_rect: np.ndarray
    mat_pbr_rect: np.ndarray
    mat_emissive_rect: np.ndarray

    # Lights (L, ...)
    light_position: np.ndarray  # (L, 3)
    light_type: np.ndarray  # (L,) int32
    light_color: np.ndarray  # (L, 3)
    light_intensity: np.ndarray  # (L,)
    light_tri: np.ndarray  # (L,) int32

    # BVH (B, ...)
    bvh_aabb_min: np.ndarray  # (B, 3)
    bvh_aabb_max: np.ndarray  # (B, 3)
    bvh_meta: np.ndarray  # (B, 4) int32: left, right, offset, count

    # Texture atlas (Ah, Aw, 4) float32, or None if the scene is untextured.
    atlas: np.ndarray | None = None

    # Spot-light extension (None when no spots): (L, 5) float32 rows of
    # [dir_x, dir_y, dir_z, angle_scale, angle_offset]; meaningful only on
    # rows whose light_type == LIGHT_TYPE_SPOT.
    light_aux: np.ndarray | None = None

    @property
    def num_triangles(self) -> int:
        return int(self.tri_v0.shape[0])

    @property
    def num_materials(self) -> int:
        return int(self.mat_base_color.shape[0])

    @property
    def num_lights(self) -> int:
        return int(self.light_position.shape[0])

    def validate(self) -> "SceneArrays":
        t, m = self.num_triangles, self.num_materials
        assert self.tri_mat.shape == (t,)
        assert t == 0 or (self.tri_mat.min() >= 0 and self.tri_mat.max() < m)
        for rect in (
            self.mat_albedo_rect,
            self.mat_normal_rect,
            self.mat_pbr_rect,
            self.mat_emissive_rect,
        ):
            assert rect.shape == (m, 4)
        lt = self.light_tri
        assert lt.shape == (self.num_lights,)
        assert self.bvh_meta.shape[1] == 4
        return self


def texture_slots_used(tri_full) -> tuple[bool, bool, bool, bool]:
    """Static per-scene texture-slot usage: (albedo, pbr, emissive, normal).

    A slot is used iff ANY triangle's atlas rect has nonzero width. A
    zero-width rect samples its fallback exactly (pt.wgsl:112-120 via the
    ``missing`` guard in ops/shade.py), so statically skipping the fetch
    for a scene-wide-unused slot is exact at the Hit level — it just saves
    the one-hot select + column sweep in the Pallas bounce (and the gather
    in the XLA path). (Full-trace radiance can still move by ulps: fewer
    ops shift XLA fusion/FMA placement, the documented RR-flip class —
    tests/test_textures.py checks the contract where it is exact.) Must be
    called on the HOST-side packed table (NumPy), not a tracer."""
    tf = np.asarray(tri_full)

    def used(base: int) -> bool:
        return bool((tf[:, base + 2] > 0).any())

    return (
        used(TF_ALBEDO_RECT),
        used(TF_PBR_RECT),
        used(TF_EMISSIVE_RECT),
        used(TF_NORMAL_RECT),
    )


# Fat-atlas canvas budget: sum of packed LCM grids, in texels (one texel
# = 16 f32 = 64 B, so 4M texels = 256 MB HBM — generous next to the walk
# tables, tiny next to v5e's 16 GB). Map sets with wildly coprime slot
# dims (e.g. 255 vs 256 -> 65280-wide LCM grid) blow this and fall back
# to the per-slot gathers.
FAT_ATLAS_MAX_TEXELS = 4 << 20
# Runtime map-set match bound: shade.sample_atlas_fat resolves each
# lane's virtual rect by comparing its 16 rect values against every
# baked set (~20 vector ops per set, measured negligible next to one
# latency-bound gather row up to hundreds of sets; the bound caps
# compile-time unrolling).
FAT_ATLAS_MAX_SETS = 256


def _build_fat_atlas(scene: "SceneArrays", atlas: np.ndarray):
    """Pre-bake the fat-atlas canvas for big-atlas scenes.

    The per-row native gather is latency-bound on TPU (~8-11 ns per
    fetched row regardless of row width, measured round 3), so the four
    per-slot texel fetches of the external atlas path cost ~4x one. This
    bake gives every distinct material MAP SET (its 4-slot rect tuple) a
    VIRTUAL rect on a standalone canvas whose grid is the componentwise
    LCM of the mapped slots' dims, each texel row carrying all four
    slots' texels at the same uv — so the external bounce gather
    (ops/pallas_bounce.py::_gather_texels) and the XLA trace path fetch
    ONE row per lane instead of four. Unmapped slots hold the slot
    fallback constant (shade.SLOT_FALLBACKS, imported lazily — ops.shade
    imports this module at top level).

    The LCM grid reproduces the per-slot texel choice exactly for EVERY
    slot (not just divisible map sets, the round-3 restriction): slot k
    with kw | lw bakes nearest-downsampled onto the grid, and for uv
    fraction f the grid cell i = floor(f*lw) satisfies
    floor(f*kw) == i // (lw//kw) (integer floor identity). Congruent and
    mip-style sets degenerate to lw == max slot width (same memory as
    the round-3 rep-grid bake); genuinely non-divisible sets (a 96^2 pbr
    rect against a 256^2 albedo) get an LCM grid (768^2 there) — bounded
    by FAT_ATLAS_MAX_TEXELS over the whole packed canvas.

    Returns (canvas (FH, FW, 16) f32, rects (S, 20) f32) — rects rows are
    [16 atlas-rect values in SLOT_RECT_COLS order | fx, fy, lw, lh], the
    runtime match table shade.sample_atlas_fat folds over — or None (fat
    mode disabled, per-slot sampling used) unless ALL of:
      * all rects in-bounds, and canvas/set-count budgets respected,
      * for SMALL atlases (within the in-VMEM bounce sampler bound) the
        fat canvas and set count must also fit the IN-KERNEL fat sampler
        (ops/pallas_bounce.py FAT_VMEM_TEXELS / FAT_KERNEL_MAX_SETS) —
        otherwise bake nothing, so the XLA and Pallas paths both stay
        per-slot and keep choosing bit-identical texels (radiance feeds
        Russian roulette, so a texel-choice divergence would split the
        RNG streams the parity tests pin).
    Texel choice matches the per-slot path except the documented
    texel-boundary ulp class (see shade.sample_atlas_fat). Small-atlas
    scenes gained the bake in round 3: the bounce ablation measured the
    per-slot in-kernel samplers at ~27% of the kernel EACH (linear in
    calls), and the fat table collapses them into ONE one-hot select.

    NEGATIVE uvs (round 5) no longer disable the bake: the reference's
    sign-preserving %-wrap (pt.wgsl:115-116) reduces every uv to
    f = fmod(u, 1.0) in (-1, 1), so a map set whose triangles carry a
    negative vertex uv on an axis allocates a DOUBLED grid on that axis
    (interior origin at +lw/+lh) and bakes the backward band with the
    texels the per-slot math reads for f < 0: per LCM cell j in
    [-lw, -1], the per-slot index floor(clip(kx + f*kw, 0, w-1)) is
    constant over the cell and equals clip(kx + j // (lw//kw), 0, w-1)
    (no integer lies strictly inside (j/m, (j+1)/m), and the 0-clip
    cannot straddle a cell since kx*m is an integer) — i.e. the
    neighboring-rect texels the reference's backward read actually
    fetches, reproduced on the canvas. Vertex-uv sign is a sound
    trigger: barycentric weights are non-negative for hits, so all
    non-negative vertex uvs imply non-negative interpolated uvs (only
    the already-documented boundary-epsilon ulp class excepted).
    """
    import math

    h, w = int(atlas.shape[0]), int(atlas.shape[1])
    if scene.num_triangles == 0:
        return None
    rect_tables = (scene.mat_albedo_rect, scene.mat_pbr_rect,
                   scene.mat_emissive_rect, scene.mat_normal_rect)
    mats = np.unique(np.asarray(scene.tri_mat, np.int64))
    # One entry per DISTINCT map set: materials sharing all four rects
    # share texels, hence one virtual rect.
    sets: dict = {}
    mat_set_key: dict = {}
    for m in mats:
        rs = tuple(tuple(int(v) for v in tab[m]) for tab in rect_tables)
        nonempty = [r for r in rs if r[2] > 0 and r[3] > 0]
        if not nonempty:
            continue
        mat_set_key[int(m)] = rs
        for (rx, ry, rw, rh) in nonempty:
            if rx < 0 or ry < 0 or rx + rw > w or ry + rh > h:
                return None
        if rs not in sets:
            lw = math.lcm(*(r[2] for r in nonempty))
            lh = math.lcm(*(r[3] for r in nonempty))
            sets[rs] = {"w": lw, "h": lh, "x": 0, "y": 0,
                        "lw": lw, "lh": lh, "ox": 0, "oy": 0}
    if not sets:
        return None
    if len(sets) > FAT_ATLAS_MAX_SETS:
        return None
    # Per-set negative-uv flags (per axis): a negative VERTEX uv on any
    # triangle of the set's materials doubles the set's grid on that axis
    # and shifts the interior origin (see docstring — fmod keeps runtime
    # f in (-1, 1), so one backward band always suffices).
    tri_mat_arr = np.asarray(scene.tri_mat)
    uvs = (np.asarray(scene.tri_uv0), np.asarray(scene.tri_uv1),
           np.asarray(scene.tri_uv2))
    for m, rs in mat_set_key.items():
        tris = tri_mat_arr == m
        if not tris.any():
            continue
        box = sets[rs]
        for uv in uvs:
            sel = uv[tris]
            if (sel[:, 0] < 0.0).any() and not box["ox"]:
                box["ox"] = box["lw"]
                box["w"] = 2 * box["lw"]
            if (sel[:, 1] < 0.0).any() and not box["oy"]:
                box["oy"] = box["lh"]
                box["h"] = 2 * box["lh"]
    # Pack the (possibly extended) grids onto one canvas (the same
    # potpack the texture atlas itself uses, gltf.py:283 — mutates x/y
    # in place).
    from wgpu_path_tracing_tpu.models.gltf import potpack

    boxes = list(sets.values())
    fw, fh = potpack(boxes)
    if fw * fh > FAT_ATLAS_MAX_TEXELS:
        return None
    from wgpu_path_tracing_tpu.ops.pallas_bounce import (
        FAT_KERNEL_MAX_SETS,
        FAT_VMEM_TEXELS,
        UNTILED_ATLAS_TEXELS,
    )

    if h * w <= UNTILED_ATLAS_TEXELS and (
        fw * fh > FAT_VMEM_TEXELS or len(sets) > FAT_KERNEL_MAX_SETS
    ):
        # Small atlas whose fat form cannot ride the in-kernel sampler:
        # without the bake both paths stay per-slot (and bit-consistent);
        # with it the XLA path would go fat while the Pallas kernel stays
        # per-slot — a texel-choice split the parity suite forbids.
        return None
    from wgpu_path_tracing_tpu.ops.shade import SLOT_FALLBACKS

    fat = np.empty((fh, fw, 16), np.float32)
    fat[:] = np.array([c for fb in SLOT_FALLBACKS for c in fb], np.float32)
    rect_rows = np.zeros((len(sets), 20), np.float32)
    for s, (rs, box) in enumerate(sets.items()):
        lw, lh, ox, oy = box["lw"], box["lh"], box["ox"], box["oy"]
        # Interior origin: the [0, 1) uv band starts ox/oy cells into the
        # allocated box; the backward band (negative uvs) occupies
        # [-ox, 0) x [-oy, 0) relative cells.
        fx, fy = box["x"] + ox, box["y"] + oy
        rect_rows[s, :16] = [v for r in rs for v in r]
        rect_rows[s, 16:] = (fx, fy, lw, lh)
        for k, (kx, ky, kw, kh) in enumerate(rs):
            if kw > 0 and kh > 0:
                # Grid cell (i, j) (relative to the interior origin,
                # j in [-ox, lw)) carries the per-slot texel the
                # reference's index math reads for uv fraction
                # f = j/lw: clip(kx + j // (lw//kw), 0, w-1) — for the
                # interior this is the nearest-downsample floor identity;
                # for the backward band it reproduces the neighboring-
                # rect / clamped texels of the sign-preserving %-wrap
                # (constant per cell — see docstring).
                jj = np.arange(-ox, lw)
                ii = np.arange(-oy, lh)
                ix = np.clip(kx + jj // (lw // kw), 0, w - 1)
                iy = np.clip(ky + ii // (lh // kh), 0, h - 1)
                fat[fy - oy:fy + lh, fx - ox:fx + lw, 4 * k:4 * k + 4] = (
                    atlas[np.ix_(iy, ix)]
                )
    return fat, rect_rows


def pack_device_scene(scene: SceneArrays, cluster_k: int = 64):
    """Build the packed device tables (as NumPy; caller moves them to jnp).

    Returns a dict pytree: tri_isect, tri_shade, materials, lights, bvh_aabb,
    bvh_meta, atlas.
    """
    t = scene.num_triangles
    tri_isect = np.zeros((max(t, 1), 9), np.float32)
    tri_shade = np.zeros((max(t, 1), TRI_COLS), np.float32)
    if t:
        tri_isect[:t, 0:3] = scene.tri_v0
        tri_isect[:t, 3:6] = scene.tri_v1 - scene.tri_v0  # e1
        tri_isect[:t, 6:9] = scene.tri_v2 - scene.tri_v0  # e2
        tri_shade[:t, TRI_V0 : TRI_V0 + 3] = scene.tri_v0
        tri_shade[:t, TRI_V1 : TRI_V1 + 3] = scene.tri_v1
        tri_shade[:t, TRI_V2 : TRI_V2 + 3] = scene.tri_v2
        tri_shade[:t, TRI_N0 : TRI_N0 + 3] = scene.tri_n0
        tri_shade[:t, TRI_N1 : TRI_N1 + 3] = scene.tri_n1
        tri_shade[:t, TRI_N2 : TRI_N2 + 3] = scene.tri_n2
        tri_shade[:t, TRI_UV0 : TRI_UV0 + 2] = scene.tri_uv0
        tri_shade[:t, TRI_UV1 : TRI_UV1 + 2] = scene.tri_uv1
        tri_shade[:t, TRI_UV2 : TRI_UV2 + 2] = scene.tri_uv2
        tri_shade[:t, TRI_MAT] = scene.tri_mat.astype(np.float32)

    m = scene.num_materials
    materials = np.zeros((max(m, 1), MAT_COLS), np.float32)
    if m:
        materials[:m, MAT_BASE_COLOR : MAT_BASE_COLOR + 3] = scene.mat_base_color
        materials[:m, MAT_METALLIC] = scene.mat_metallic
        materials[:m, MAT_ROUGHNESS] = scene.mat_roughness
        materials[:m, MAT_EMISSION : MAT_EMISSION + 3] = scene.mat_emission
        materials[:m, MAT_EMISSIVE_STRENGTH] = scene.mat_emissive_strength
        materials[:m, MAT_IOR] = scene.mat_ior
        materials[:m, MAT_TRANSMISSION] = scene.mat_transmission
        materials[:m, MAT_ALBEDO_RECT : MAT_ALBEDO_RECT + 4] = scene.mat_albedo_rect
        materials[:m, MAT_NORMAL_RECT : MAT_NORMAL_RECT + 4] = scene.mat_normal_rect
        materials[:m, MAT_PBR_RECT : MAT_PBR_RECT + 4] = scene.mat_pbr_rect
        materials[:m, MAT_EMISSIVE_RECT : MAT_EMISSIVE_RECT + 4] = (
            scene.mat_emissive_rect
        )

    n_lights = scene.num_lights
    lights = np.zeros((max(n_lights, 1), LGT_COLS), np.float32)
    if n_lights:
        lights[:n_lights, LGT_POSITION : LGT_POSITION + 3] = scene.light_position
        lights[:n_lights, LGT_TYPE] = scene.light_type.astype(np.float32)
        lights[:n_lights, LGT_COLOR : LGT_COLOR + 3] = scene.light_color
        lights[:n_lights, LGT_INTENSITY] = scene.light_intensity
        lights[:n_lights, LGT_TRI] = scene.light_tri.astype(np.float32)

    b = scene.bvh_meta.shape[0]
    bvh_aabb = np.zeros((max(b, 1), 6), np.float32)
    bvh_meta = np.zeros((max(b, 1), 4), np.int32)
    bvh_links = np.full((max(b, 1), 2), -1, np.int32)
    if b:
        from wgpu_path_tracing_tpu.accel.bvh import build_links

        bvh_aabb[:b, 0:3] = scene.bvh_aabb_min
        bvh_aabb[:b, 3:6] = scene.bvh_aabb_max
        bvh_meta[:b] = scene.bvh_meta.astype(np.int32)
        bvh_links[:b] = build_links(bvh_meta[:b])

    atlas = scene.atlas
    if atlas is None:
        atlas = np.zeros((1, 1, 4), np.float32)

    # Denormalized join tables (see TF_* / LF_* column maps above).
    tri_full = np.zeros((max(t, 1), TF_COLS), np.float32)
    tri_full[:, :TRI_COLS] = tri_shade
    if t:
        mat_of_tri = scene.tri_mat.astype(np.int32)
        tri_full[:t, TF_BASE_COLOR:] = materials[mat_of_tri]

    n_l = max(n_lights, 1)
    light_full = np.zeros((n_l, LF_COLS), np.float32)
    light_full[:, :LGT_COLS] = lights
    if n_lights and t:
        ltri = np.clip(scene.light_tri.astype(np.int32), 0, t - 1)
        light_full[:n_lights, LF_V0 : LF_V0 + 3] = tri_shade[ltri, TRI_V0 : TRI_V0 + 3]
        light_full[:n_lights, LF_V1 : LF_V1 + 3] = tri_shade[ltri, TRI_V1 : TRI_V1 + 3]
        light_full[:n_lights, LF_V2 : LF_V2 + 3] = tri_shade[ltri, TRI_V2 : TRI_V2 + 3]
        light_full[:n_lights, LF_N0 : LF_N0 + 3] = tri_shade[ltri, TRI_N0 : TRI_N0 + 3]
        light_full[:n_lights, LF_N1 : LF_N1 + 3] = tri_shade[ltri, TRI_N1 : TRI_N1 + 3]
        light_full[:n_lights, LF_N2 : LF_N2 + 3] = tri_shade[ltri, TRI_N2 : TRI_N2 + 3]
    if n_lights and scene.light_aux is not None:
        spot = scene.light_type == LIGHT_TYPE_SPOT
        if spot.any():
            aux = np.asarray(scene.light_aux, np.float32)
            light_full[:n_lights][spot, LF_SPOT_DIR : LF_SPOT_DIR + 3] = aux[spot, 0:3]
            light_full[:n_lights][spot, LF_SPOT_SCALE] = aux[spot, 3]
            light_full[:n_lights][spot, LF_SPOT_OFFSET] = aux[spot, 4]

    # Cluster tables for the large-scene dispatch intersectors: ops/pairs.py
    # pair dispatch (subtree-aligned clusters grouped into super tiles) and
    # ops/cluster.py round dispatch (fixed-stride cut, kept for comparison).
    from wgpu_path_tracing_tpu.ops.cluster import build_clusters
    from wgpu_path_tracing_tpu.ops.pairs import build_pair_tables

    cluster_tris, cluster_aabb = build_clusters(tri_isect, k=cluster_k)
    pairs_tris, pairs_super_aabb = build_pair_tables(
        bvh_aabb[:max(b, 1)], bvh_meta[:max(b, 1)], tri_isect[:t]
    )

    # Wide-BVH tables for the in-kernel block walk (ops/walk.py) — the
    # default large-scene intersector when the slabs fit in VMEM. A
    # pathologically deep tree (degenerate SAH spine beyond the kernel's
    # DFS stack bound) simply omits the tables; the auto selection then
    # falls back to the pair dispatch.
    from wgpu_path_tracing_tpu.accel.bvh8 import (
        WideBVHDepthError,
        build_wide_bvh,
    )

    try:
        wide = build_wide_bvh(
            scene.bvh_aabb_min if b else np.zeros((1, 3), np.float32),
            scene.bvh_aabb_max if b else np.zeros((1, 3), np.float32),
            bvh_meta[:b] if b else np.zeros((1, 4), np.int32),
            tri_isect[:t],
        )
    except WideBVHDepthError as e:
        import warnings

        warnings.warn(
            f"walk tables skipped (pair-dispatch fallback): {e}",
            stacklevel=2,
        )
        wide = None

    # Load-bearing invariant: atlas texels must be bf16-representable f32
    # (models/assemble.py quantizes at the finalize_scene choke point) —
    # the in-kernel atlas selects rely on it to use ONE default-precision
    # MXU dot losslessly (ops/pallas_bounce.py::_select_rows
    # bf16_exact=True). An atlas that bypassed finalize_scene would
    # otherwise be silently bf16-truncated per fetch on hardware only.
    import ml_dtypes

    a32 = np.asarray(atlas, np.float32)
    if not np.array_equal(
        a32, a32.astype(ml_dtypes.bfloat16).astype(np.float32)
    ):
        raise ValueError(
            "pack_device_scene: atlas texels are not bf16-exact — build "
            "scenes through models/assemble.py::finalize_scene (which "
            "quantizes the atlas) or pre-quantize before packing"
        )

    return {
        "tri_isect": tri_isect,
        "tri_full": tri_full,
        "light_full": light_full,
        "materials": materials,
        "lights": lights,
        "bvh_aabb": bvh_aabb,
        "bvh_meta": bvh_meta,
        "bvh_links": bvh_links,
        "cluster_tris": cluster_tris,
        "cluster_aabb": cluster_aabb,
        "pairs_tris": pairs_tris,
        "pairs_super_aabb": pairs_super_aabb,
        # walk_meta stays host-side (the kernel reads only the ordered
        # metas); omitting it saves the SMEM prefetch and the transfer.
        **(
            {
                "walk_order": wide.order,
                "walk_boxes": wide.boxes,
                "walk_tris": wide.tris,
            }
            if wide is not None
            else {}
        ),
        "atlas": np.asarray(atlas, np.float32),
        # Big-atlas fat canvas + map-set match table (one gather serves
        # all four texture slots); keys PRESENT only when the scene
        # qualifies — see _build_fat_atlas.
        **(
            {"atlas_fat": fat_atlas[0], "atlas_fat_rects": fat_atlas[1]}
            if (fat_atlas := _build_fat_atlas(
                scene, np.asarray(atlas, np.float32))) is not None
            else {}
        ),
        # Environment lighting extension (ops/env.py): 1x1 placeholder =
        # disabled (reference parity: miss -> black, pt.wgsl:646-649).
        # Renderer.set_environment swaps in a real (H, W, 3) map.
        "env": np.zeros((1, 1, 3), np.float32),
        "env_params": np.array([1.0, 0.0], np.float32),  # intensity, rot
    }
