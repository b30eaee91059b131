"""Next-event-estimation light sampling (device-side).

Reimplements sampleLight (pt.wgsl:374-489) over batched lanes:

* uniform light pick via randInt (pt.wgsl:375),
* DIRECTIONAL: direction stored in light.position (gpu.ts:212); any shadow
  hit occludes; pdf = 1/N · 1000 (pt.wgsl:385-406 — the magic ×1000 scale is
  a reference quirk kept for parity),
* POINT: ignored beyond distance 100 (pt.wgsl:413); inverse-square falloff;
  pdf = 1/N · 10000 (pt.wgsl:407-438),
* EMISSIVE: uniform triangle-area sample (u = 1-sqrt(r1), v = r2·sqrt(r1)),
  solid-angle pdf = (1/N)(1/area)(d²/max(|cosθ|, ε)), intensity carries NO
  distance falloff (pt.wgsl:439-486).

All three branches' shadow rays are resolved by ONE batched traversal with
per-lane t_max (directional = ∞, others = dist − 2ε, pt.wgsl:394/423/465);
occlusion zeroes pdf and intensity exactly as the reference's early returns.
RNG draws use masked advancement: the light pick advances every NEE lane; the
two triangle-sample draws advance only lanes that picked an emissive light.
"""

from __future__ import annotations

import typing

import jax.numpy as jnp

from wgpu_path_tracing_tpu.models import types as T
from wgpu_path_tracing_tpu.ops import rng as RNG
from wgpu_path_tracing_tpu.ops.gathers import fetch_rows

EPSILON = 1e-6


class LightSample(typing.NamedTuple):
    intensity: jnp.ndarray  # (N, 3)
    wi: jnp.ndarray  # (N, 3)
    pdf: jnp.ndarray  # (N,)


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def _cross(a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def sample_light(scene, closest_hit, hit_position, state, mask, num_lights: int):
    """One NEE sample per lane in ``mask``. Returns (LightSample, new state).

    ``closest_hit(ro, rd, active, t_max, any_hit)`` is the scene's
    intersection function; ``num_lights`` is the static true light count.
    """
    count = max(num_lights, 1)

    idx, state = RNG.rand_int(state, 0, count - 1, mask)
    # One denormalized row: light params + its emissive triangle's geometry
    # (models/types.py LF_* layout) via an exact one-hot MXU fetch.
    light = fetch_rows(scene["light_full"], idx)  # (N, LF_COLS)
    ltype = light[:, T.LF_TYPE].astype(jnp.int32)
    lcolor = light[:, T.LF_COLOR : T.LF_COLOR + 3]
    lint = light[:, T.LF_INTENSITY]
    lpos = light[:, T.LF_POSITION : T.LF_POSITION + 3]

    is_dir = ltype == T.LIGHT_TYPE_DIRECTIONAL
    is_point = ltype == T.LIGHT_TYPE_POINT
    is_emis = ltype == T.LIGHT_TYPE_EMISSIVE

    # Emissive triangle sample draws (masked to emissive lanes, pt.wgsl:444-445)
    r1, state = RNG.rand(state, mask & is_emis)
    r2, state = RNG.rand(state, mask & is_emis)

    # --- Directional (pt.wgsl:385-406)
    wi_dir = _normalize(-lpos)

    # --- Point (pt.wgsl:407-438)
    to_light_p = lpos - hit_position
    dist_p = jnp.sqrt(jnp.sum(to_light_p * to_light_p, axis=-1))
    point_far = is_point & (dist_p > 100.0)
    wi_point = to_light_p / jnp.maximum(dist_p, 1e-30)[:, None]

    # --- Emissive (pt.wgsl:439-486) — triangle geometry rides in the row.
    v0 = light[:, T.LF_V0 : T.LF_V0 + 3]
    v1 = light[:, T.LF_V1 : T.LF_V1 + 3]
    v2 = light[:, T.LF_V2 : T.LF_V2 + 3]
    n0 = light[:, T.LF_N0 : T.LF_N0 + 3]
    n1 = light[:, T.LF_N1 : T.LF_N1 + 3]
    n2 = light[:, T.LF_N2 : T.LF_N2 + 3]
    su = 1.0 - jnp.sqrt(r1)
    sv = r2 * jnp.sqrt(r1)
    sw = 1.0 - su - sv
    light_pos = v0 * sw[:, None] + v1 * su[:, None] + v2 * sv[:, None]
    lnormal = _normalize(n0 * sw[:, None] + n1 * su[:, None] + n2 * sv[:, None])
    to_light_e = light_pos - hit_position
    dist_e = jnp.sqrt(jnp.sum(to_light_e * to_light_e, axis=-1))
    wi_emis = to_light_e / jnp.maximum(dist_e, 1e-30)[:, None]

    # Select per-lane direction/distance
    wi = jnp.where(
        is_dir[:, None],
        wi_dir,
        jnp.where(is_point[:, None], wi_point, wi_emis),
    )
    dist = jnp.where(is_point, dist_p, dist_e)

    # --- Shared shadow traversal (pt.wgsl:391-399, 420-429, 462-471)
    shadow_mask = mask & ~point_far
    sro = hit_position + wi * EPSILON
    t_max = jnp.where(is_dir, jnp.inf, dist - EPSILON * 2.0)
    shadow_t, _ = closest_hit(sro, wi, active=shadow_mask, t_max=t_max, any_hit=True)
    occluded = shadow_t < t_max  # miss -> t == inf -> False

    inv_n = 1.0 / jnp.float32(count)

    # Per-type pdf and intensity (zero where occluded / ignored)
    pdf_dir = inv_n * 1000.0  # pt.wgsl:406
    pdf_point = inv_n * 10000.0  # pt.wgsl:438
    e1 = v1 - v0
    e2 = v2 - v0
    area = jnp.sqrt(jnp.sum(_cross(e1, e2) ** 2, axis=-1)) * 0.5
    cos_theta = jnp.abs(jnp.sum(lnormal * (-wi), axis=-1))
    pdf_emis = (
        inv_n
        * (1.0 / area)
        * (dist_e * dist_e / jnp.maximum(cos_theta, EPSILON))
    )

    int_dir = lcolor * lint[:, None]
    att = 1.0 / (dist_p * dist_p)
    int_point = lcolor * (lint * att)[:, None]
    int_emis = lcolor * lint[:, None]

    pdf = jnp.where(is_dir, pdf_dir, jnp.where(is_point, pdf_point, pdf_emis))
    intensity = jnp.where(
        is_dir[:, None],
        int_dir,
        jnp.where(is_point[:, None], int_point, int_emis),
    )

    dead = occluded | point_far | ~mask
    pdf = jnp.where(dead, 0.0, pdf)
    intensity = jnp.where(dead[:, None], 0.0, intensity)

    return LightSample(intensity=intensity, wi=wi, pdf=pdf), state
