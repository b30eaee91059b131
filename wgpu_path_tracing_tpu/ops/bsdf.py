"""BSDF evaluation and sampling (device-side, vectorized).

Reimplements pt.wgsl's metallic/roughness BSDF with transmission:

* GGX distribution / Smith geometry / Fresnel-Schlick — pt.wgsl:316-345
* cosine-hemisphere sampling — pt.wgsl:299-307 (randomCosineDirection)
* GGX half-vector sampling — pt.wgsl:348-364 (sampleGGXNormal)
* deterministic tangent frame — pt.wgsl:624-634 (constructTBN)
* Schlick dielectric reflectance — pt.wgsl:616-620
* lobe-select sampling — pt.wgsl:498-546 (sampleBSDF): lobe probabilities
  diffuse (1-m)(1-tr) / specular m / transmission (1-m)·tr; the transmission
  lobe reflects on total internal reflection or with probability F (the
  WGSL ``cannotRefract || (rand() < F)`` short-circuits, so the Fresnel
  random is only drawn when refraction is possible — replicated via masked
  RNG advancement).
* evaluation — pt.wgsl:548-614 (evalBSDF), including the reference's quirks:
  transmission lanes return identical value front/back with the LOBE
  PROBABILITY as pdf, the combined pdf is floored at EPSILON on return, and
  roughness is used as stored on the hit (already floored at 0.04).

All branch lanes execute all lobes and select — the TPU has no divergence;
``where`` keeps the semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

from wgpu_path_tracing_tpu.ops import rng as RNG

PI = 3.14159265359  # pt.wgsl:3 (f32 constant)
EPSILON = 1e-6


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _cross(a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def reflect(e, n):
    """WGSL reflect(e, n) = e - 2*dot(e, n)*n."""
    return e - 2.0 * _dot(e, n)[..., None] * n


def refract(e, n, eta):
    """WGSL refract(e, n, eta); returns 0-vector when k < 0."""
    cos_i = _dot(n, e)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    out = eta[..., None] * e - (eta * cos_i + jnp.sqrt(jnp.maximum(k, 0.0)))[
        ..., None
    ] * n
    return jnp.where((k < 0.0)[..., None], 0.0, out)


def construct_tbn(n):
    """constructTBN (pt.wgsl:624-634): returns (T, B, N) basis vectors."""
    use_y = jnp.abs(n[..., 0]) > 0.9
    t0 = jnp.where(
        use_y[..., None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    b = _normalize(_cross(n, t0))
    t = _normalize(_cross(b, n))
    return t, b, n


def distribution_ggx(n, h, roughness):
    """pt.wgsl:316-325."""
    a = roughness * roughness
    a2 = a * a
    ndoth = jnp.maximum(_dot(n, h), 0.0)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return jnp.maximum(a2 / (PI * denom * denom), 0.0)


def geometry_schlick_ggx(ndotv, roughness):
    """pt.wgsl:328-332."""
    r = roughness + 1.0
    k = (r * r) / 8.0
    return ndotv / (ndotv * (1.0 - k) + k)


def geometry_smith(n, v, l, roughness):
    """pt.wgsl:334-340."""
    ndotv = jnp.maximum(_dot(n, v), 0.0)
    ndotl = jnp.maximum(_dot(n, l), 0.0)
    return geometry_schlick_ggx(ndotv, roughness) * geometry_schlick_ggx(
        ndotl, roughness
    )


def fresnel_schlick(cos_theta, f0):
    """pt.wgsl:343-345."""
    return f0 + (1.0 - f0) * jnp.power(1.0 - cos_theta, 5.0)[..., None]


def reflectance(cos_theta, eta):
    """Schlick dielectric reflectance (pt.wgsl:616-620)."""
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(1.0 - cos_theta, 5.0)


def cosine_direction(normal, r1, r2):
    """randomCosineDirection rotated into the normal frame
    (pt.wgsl:299-307 + 513-514)."""
    z = jnp.sqrt(1.0 - r2)
    phi = 2.0 * PI * r1
    sq = jnp.sqrt(r2)
    x = jnp.cos(phi) * sq
    y = jnp.sin(phi) * sq
    t, b, n = construct_tbn(normal)
    return t * x[..., None] + b * y[..., None] + n * z[..., None]


def sample_ggx_normal(normal, roughness, r1, r2):
    """sampleGGXNormal (pt.wgsl:348-364)."""
    a = roughness * roughness
    phi = 2.0 * PI * r1
    cos_t = jnp.sqrt((1.0 - r2) / (1.0 + (a * a - 1.0) * r2))
    sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
    lx = sin_t * jnp.cos(phi)
    ly = sin_t * jnp.sin(phi)
    t, b, n = construct_tbn(normal)
    return _normalize(
        t * lx[..., None] + b * ly[..., None] + n * cos_t[..., None]
    )


def eval_bsdf(hit, normal, v, l, front):
    """evalBSDF (pt.wgsl:548-614). Returns (bsdf (N,3), pdf (N,)).

    ``hit`` needs .albedo, .metallic, .roughness, .transmission, .ior.
    """
    h = _normalize(v + l)
    ndotl = jnp.maximum(_dot(normal, l), 0.0)
    ndotv = jnp.maximum(_dot(normal, v), 0.0)
    ndoth = jnp.maximum(_dot(normal, h), 0.0)
    vdoth = jnp.maximum(_dot(v, h), 0.0)

    f0 = (1.0 - hit.metallic[:, None]) * 0.04 + hit.albedo * hit.metallic[:, None]
    f = fresnel_schlick(vdoth, f0)
    g = geometry_smith(normal, v, l, hit.roughness)
    d = distribution_ggx(normal, h, hit.roughness)

    kd = (1.0 - f) * (1.0 - hit.transmission[:, None])
    diffuse = kd * hit.albedo / PI
    specular = f * (g * d)[:, None] / jnp.maximum(4.0 * ndotv * ndotl, EPSILON)[
        :, None
    ]

    # Reflective combination (pt.wgsl:595-610)
    bsdf_r = (diffuse + specular) * ndotl[:, None]
    diffuse_prob = (1.0 - hit.metallic) * (1.0 - hit.transmission)
    specular_prob = hit.metallic
    diffuse_pdf = ndotl / PI
    specular_pdf = d * ndoth / (4.0 * vdoth)
    pdf_r = diffuse_prob * diffuse_pdf + specular_prob * specular_pdf

    # Transmission branch (pt.wgsl:581-594): value identical front/back, pdf
    # = lobe probability.
    eta = jnp.where(front, 1.0 / hit.ior, hit.ior)
    cos_theta = _dot(normal, v)
    f_trans = reflectance(jnp.abs(cos_theta), eta)
    bsdf_t = (1.0 - f_trans)[:, None] * hit.albedo
    pdf_t = (1.0 - hit.metallic) * hit.transmission

    is_trans = hit.transmission > 0.0
    bsdf = jnp.where(is_trans[:, None], bsdf_t, bsdf_r)
    pdf = jnp.where(is_trans, pdf_t, pdf_r)
    return bsdf, jnp.maximum(pdf, EPSILON)  # pt.wgsl:613


def sample_bsdf(hit, rd, front, state, mask):
    """sampleBSDF (pt.wgsl:498-546). Returns (direction (N,3), new rng state).

    ``mask``: lanes that actually sample (the reference thread would reach
    this call) — RNG advances only there. Draw schedule per lane in mask:
    1 lobe-select + 2 (every lobe draws exactly two: cosine r1/r2 or GGX
    r1/r2) + 1 Fresnel draw only on transmission lanes that can refract.
    """
    v = -_normalize(rd)

    diffuse_prob = (1.0 - hit.metallic) * (1.0 - hit.transmission)
    specular_prob = hit.metallic

    r, state = RNG.rand(state, mask)
    r1, state = RNG.rand(state, mask)
    r2, state = RNG.rand(state, mask)

    lobe_d = r < diffuse_prob
    lobe_s = (~lobe_d) & (r < diffuse_prob + specular_prob)
    lobe_t = (~lobe_d) & (~lobe_s)

    # Diffuse
    dir_d = cosine_direction(hit.normal, r1, r2)

    # Specular (roughness floored again at 0.04 — pt.wgsl:518)
    rough = jnp.maximum(hit.roughness, 0.04)
    h_s = sample_ggx_normal(hit.normal, rough, r1, r2)
    dir_s = reflect(-v, h_s)

    # Transmission (pt.wgsl:522-545)
    eta = jnp.where(front, 1.0 / hit.ior, hit.ior)
    n_t = sample_ggx_normal(hit.normal, rough, r1, r2)
    n_t = jnp.where(front[:, None], n_t, -n_t)
    cos_theta = _dot(n_t, v)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = eta * sin_theta > 1.0
    f = reflectance(jnp.abs(cos_theta), eta)
    # Fresnel draw only where the || short-circuit evaluates rand()
    r3, state = RNG.rand(state, mask & lobe_t & ~cannot_refract)
    do_reflect = cannot_refract | (r3 < f)
    dir_t = jnp.where(
        do_reflect[:, None], reflect(-v, n_t), refract(-v, n_t, eta)
    )

    direction = jnp.where(
        lobe_d[:, None], dir_d, jnp.where(lobe_s[:, None], dir_s, dir_t)
    )
    return direction, state


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic (pt.wgsl:492-496)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / (f * f + g * g)
