"""Hit attribute construction (device-side).

The reference computes the full HitInfo struct inside every ray-triangle test
(pt.wgsl:157-227) even though only the closest hit survives. The TPU design
separates concerns: traversal returns only (t, triangle index); this module
then gathers the winning triangle + material ONCE per bounce and rebuilds the
exact same attributes — barycentrics recomputed with the identical
Möller-Trumbore expressions so floats match the reference bit-for-bit.

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


def hit_attributes(scene, ro, rd, t, idx) -> Hit:
    """Build Hit for rays with best triangle ``idx`` at distance ``t``.

    Lanes with idx < 0 (miss) get found=False and arbitrary (masked) values.
    """
    found = idx >= 0
    safe = jnp.maximum(idx, 0)

    tri = scene["tri_shade"][safe]  # (N, TRI_COLS)
    v0 = tri[:, T.TRI_V0 : T.TRI_V0 + 3]
    v1 = tri[:, T.TRI_V1 : T.TRI_V1 + 3]
    v2 = tri[:, T.TRI_V2 : T.TRI_V2 + 3]
    n0 = tri[:, T.TRI_N0 : T.TRI_N0 + 3]
    n1 = tri[:, T.TRI_N1 : T.TRI_N1 + 3]
    n2 = tri[:, T.TRI_N2 : T.TRI_N2 + 3]
    uv0 = tri[:, T.TRI_UV0 : T.TRI_UV0 + 2]
    uv1 = tri[:, T.TRI_UV1 : T.TRI_UV1 + 2]
    uv2 = tri[:, T.TRI_UV2 : T.TRI_UV2 + 2]
    mat_idx = tri[:, T.TRI_MAT].astype(jnp.int32)

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

    # Tangent basis from UV derivatives (pt.wgsl:176-189). No degenerate-UV
    # guard, as in the reference — the NaN basis is only consumed when a
    # normal-map texel is actually sampled.
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    r = 1.0 / (duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    tangent = _normalize(
        (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * r[:, None]
    )
    tn = interp_normal
    tvec = _normalize(tangent - tn * _dot(tn, tangent)[:, None])
    bvec = _normalize(_cross(tn, tvec))

    uv = uv0 * w[:, None] + uv1 * u[:, None] + uv2 * v[:, None]

    mat = scene["materials"][mat_idx]  # (N, MAT_COLS)
    base_color = mat[:, T.MAT_BASE_COLOR : T.MAT_BASE_COLOR + 3]
    atlas = scene["atlas"]

    albedo_rect = mat[:, T.MAT_ALBEDO_RECT : T.MAT_ALBEDO_RECT + 4]
    pbr_rect = mat[:, T.MAT_PBR_RECT : T.MAT_PBR_RECT + 4]
    emissive_rect = mat[:, T.MAT_EMISSIVE_RECT : T.MAT_EMISSIVE_RECT + 4]
    normal_rect = mat[:, T.MAT_NORMAL_RECT : T.MAT_NORMAL_RECT + 4]

    albedo_value = sample_atlas(atlas, albedo_rect, uv, (1.0, 1.0, 1.0, 1.0))
    albedo = albedo_value[:, 0:3] * base_color
    alpha = albedo_value[:, 3]

    pbr_value = sample_atlas(atlas, pbr_rect, uv, (1.0, 1.0, 1.0, 1.0))
    metallic = pbr_value[:, 2] * mat[:, T.MAT_METALLIC]
    roughness = jnp.maximum(pbr_value[:, 1] * mat[:, T.MAT_ROUGHNESS], 0.04)

    emissive_value = sample_atlas(atlas, emissive_rect, uv, (1.0, 1.0, 1.0, 1.0))
    emission = emissive_value[:, 0:3] * mat[:, T.MAT_EMISSION : T.MAT_EMISSION + 3]

    normal_map = sample_atlas(atlas, normal_rect, uv, (0.5, 0.5, 1.0, 1.0))[:, 0:3]
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

    return Hit(
        t=t,
        found=found,
        position=position,
        normal=normal,
        albedo=albedo,
        alpha=alpha,
        roughness=roughness,
        metallic=metallic,
        transmission=mat[:, T.MAT_TRANSMISSION],
        ior=mat[:, T.MAT_IOR],
        emission=emission,
        emissive_strength=mat[:, T.MAT_EMISSIVE_STRENGTH],
        uv=uv,
        is_front=is_front,
    )
