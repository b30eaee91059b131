"""Hit attribute construction (device-side).

The reference computes the full HitInfo struct inside every ray-triangle test
(pt.wgsl:157-227) even though only the closest hit survives. The TPU design
separates concerns: traversal returns only (t, triangle index); this module
then fetches ONE denormalized row (triangle geometry + its material joined
host-side, models/types.py TF_* layout) per ray via an exact one-hot MXU
matmul (ops/gathers.py) and rebuilds the same attributes — barycentrics
recomputed with the identical Möller-Trumbore expressions so floats match the
reference.

Covers pt.wgsl:157-227: barycentric normal/uv interpolation, UV-derivative
tangent basis, texture-atlas fetches with per-slot fallbacks
(pt.wgsl:112-120 getTextureColor), PBR attribute assembly (roughness floored
at 0.04, pt.wgsl:208), and conditional normal mapping (applied only when the
sampled texel differs from the flat default (0.5, 0.5, 1) — pt.wgsl:216-226).
"""

from __future__ import annotations

import typing

import jax.numpy as jnp

from wgpu_path_tracing_tpu.models import types as T
from wgpu_path_tracing_tpu.ops.gathers import fetch_rows
from wgpu_path_tracing_tpu.ops.intersect import _cross, _dot


class Hit(typing.NamedTuple):
    t: jnp.ndarray  # (N,)
    found: jnp.ndarray  # (N,) bool
    position: jnp.ndarray  # (N, 3)
    normal: jnp.ndarray  # (N, 3) shading normal (normal-mapped if applicable)
    albedo: jnp.ndarray  # (N, 3)
    alpha: jnp.ndarray  # (N,)
    roughness: jnp.ndarray  # (N,)
    metallic: jnp.ndarray  # (N,)
    transmission: jnp.ndarray  # (N,)
    ior: jnp.ndarray  # (N,)
    emission: jnp.ndarray  # (N, 3)
    emissive_strength: jnp.ndarray  # (N,)
    uv: jnp.ndarray  # (N, 2)
    is_front: jnp.ndarray  # (N,) bool


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def sample_atlas(atlas, rect, uv, fallback):
    """getTextureColor (pt.wgsl:112-120).

    atlas: (H, W, 4); rect: (N, 4) [x, y, w, h] in pixels (f32); uv: (N, 2);
    fallback: (4,) constant. Nearest-neighbour mip-0 load; WGSL ``%`` is
    sign-preserving fmod so negative UVs index backwards; the f32->u32
    conversion saturates at 0.
    """
    h, w = atlas.shape[0], atlas.shape[1]
    ax = rect[:, 0] + jnp.fmod(uv[:, 0], 1.0) * rect[:, 2]
    ay = rect[:, 1] + jnp.fmod(uv[:, 1], 1.0) * rect[:, 3]
    ix = jnp.clip(ax, 0.0, w - 1).astype(jnp.int32)
    iy = jnp.clip(ay, 0.0, h - 1).astype(jnp.int32)
    texel = atlas[iy, ix]  # (N, 4)
    missing = (rect[:, 2] == 0.0) | (rect[:, 3] == 0.0)
    return jnp.where(
        missing[:, None], jnp.asarray(fallback, jnp.float32)[None, :], texel
    )


def hit_attributes(scene, ro, rd, t, idx, textured: bool | None = None) -> Hit:
    """Build Hit for rays with best triangle ``idx`` at distance ``t``.

    Lanes with idx < 0 (miss) get found=False and arbitrary (masked) values.
    ``textured``: statically skip atlas sampling when the scene has no atlas
    (1x1 dummy); None = autodetect from the atlas shape.
    """
    found = idx >= 0
    safe = jnp.maximum(idx, 0)

    row = fetch_rows(scene["tri_full"], safe)  # (N, TF_COLS)
    v0 = row[:, T.TF_V0 : T.TF_V0 + 3]
    v1 = row[:, T.TF_V1 : T.TF_V1 + 3]
    v2 = row[:, T.TF_V2 : T.TF_V2 + 3]
    n0 = row[:, T.TF_N0 : T.TF_N0 + 3]
    n1 = row[:, T.TF_N1 : T.TF_N1 + 3]
    n2 = row[:, T.TF_N2 : T.TF_N2 + 3]
    uv0 = row[:, T.TF_UV0 : T.TF_UV0 + 2]
    uv1 = row[:, T.TF_UV1 : T.TF_UV1 + 2]
    uv2 = row[:, T.TF_UV2 : T.TF_UV2 + 2]

    # Recompute barycentrics with the traversal's exact expressions
    # (pt.wgsl:128-156) so u/v/t match the reference bit-for-bit.
    e1 = v1 - v0
    e2 = v2 - v0
    hvec = _cross(rd, e2)
    a = _dot(e1, hvec)
    f = 1.0 / a
    s = ro - v0
    u = f * _dot(s, hvec)
    q = _cross(s, e1)
    v = f * _dot(rd, q)
    w = 1.0 - u - v

    position = ro + rd * t[:, None]

    geom_normal = _normalize(_cross(e1, e2))
    interp_normal = _normalize(
        n0 * w[:, None] + n1 * u[:, None] + n2 * v[:, None]
    )
    is_front = _dot(geom_normal, rd) < 0.0  # pt.wgsl:196-197

    uv = uv0 * w[:, None] + uv1 * u[:, None] + uv2 * v[:, None]

    base_color = row[:, T.TF_BASE_COLOR : T.TF_BASE_COLOR + 3]
    metallic_f = row[:, T.TF_METALLIC]
    roughness_f = row[:, T.TF_ROUGHNESS]
    emission_f = row[:, T.TF_EMISSION : T.TF_EMISSION + 3]

    if textured is None:
        textured = scene["atlas"].shape[0] > 1 or scene["atlas"].shape[1] > 1

    if textured:
        atlas = scene["atlas"]
        albedo_value = sample_atlas(
            atlas, row[:, T.TF_ALBEDO_RECT : T.TF_ALBEDO_RECT + 4], uv,
            (1.0, 1.0, 1.0, 1.0),
        )
        albedo = albedo_value[:, 0:3] * base_color
        alpha = albedo_value[:, 3]
        pbr_value = sample_atlas(
            atlas, row[:, T.TF_PBR_RECT : T.TF_PBR_RECT + 4], uv,
            (1.0, 1.0, 1.0, 1.0),
        )
        metallic = pbr_value[:, 2] * metallic_f
        roughness = jnp.maximum(pbr_value[:, 1] * roughness_f, 0.04)
        emissive_value = sample_atlas(
            atlas, row[:, T.TF_EMISSIVE_RECT : T.TF_EMISSIVE_RECT + 4], uv,
            (1.0, 1.0, 1.0, 1.0),
        )
        emission = emissive_value[:, 0:3] * emission_f

        # Tangent basis from UV derivatives (pt.wgsl:176-189). No
        # degenerate-UV guard, as in the reference — the NaN basis is only
        # consumed when a normal-map texel is actually sampled.
        duv1 = uv1 - uv0
        duv2 = uv2 - uv0
        r = 1.0 / (duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
        tangent = _normalize(
            (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * r[:, None]
        )
        tn = interp_normal
        tvec = _normalize(tangent - tn * _dot(tn, tangent)[:, None])
        bvec = _normalize(_cross(tn, tvec))

        normal_map = sample_atlas(
            atlas, row[:, T.TF_NORMAL_RECT : T.TF_NORMAL_RECT + 4], uv,
            (0.5, 0.5, 1.0, 1.0),
        )[:, 0:3]
        use_nm = (
            (normal_map[:, 0] != 0.5)
            | (normal_map[:, 1] != 0.5)
            | (normal_map[:, 2] != 1.0)
        )
        tangent_normal = normal_map * 2.0 - 1.0
        world_normal = _normalize(
            tvec * tangent_normal[:, 0:1]
            + bvec * tangent_normal[:, 1:2]
            + tn * tangent_normal[:, 2:3]
        )
        normal = jnp.where(use_nm[:, None], world_normal, interp_normal)
    else:
        # Untextured: every slot takes its fallback (w == 0 rects).
        albedo = base_color
        alpha = jnp.ones_like(u)
        metallic = metallic_f
        roughness = jnp.maximum(roughness_f, 0.04)
        emission = emission_f
        normal = interp_normal

    return Hit(
        t=t,
        found=found,
        position=position,
        normal=normal,
        albedo=albedo,
        alpha=alpha,
        roughness=roughness,
        metallic=metallic,
        transmission=row[:, T.TF_TRANSMISSION],
        ior=row[:, T.TF_IOR],
        emission=emission,
        emissive_strength=row[:, T.TF_EMISSIVE_STRENGTH],
        uv=uv,
        is_front=is_front,
    )
