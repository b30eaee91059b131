"""The wavefront bounce loop (device-side).

Reimplements trace() (pt.wgsl:638-709) as a fixed-length ``lax.scan`` over
bounces with masked lanes — the TPU-native replacement for the reference's
divergent per-thread loop with breaks:

* miss -> lane dies (background is black, pt.wgsl:646-649 — no environment
  map, kept for parity),
* emissive hit -> contribution × 1/(1+t²) distance attenuation, then the
  path TERMINATES (pt.wgsl:652-658; BSDF-sampled emissive hits land at full
  MIS weight — one-sided MIS, a reference quirk kept for parity),
* NEE only when DO_MIS and the hit is front-facing and non-transmissive
  (pt.wgsl:661), weighted by the power heuristic against the BSDF pdf
  (pt.wgsl:666-675),
* BSDF importance sampling + throughput update (pt.wgsl:680-696),
* Russian roulette from bounce 3 on the max throughput component
  (pt.wgsl:699-705).

RNG draws occur in the reference's exact order with masked state
advancement, so per-lane streams match random.wgsl's sequential semantics.

Returns the radiance (pre-clamp; the caller applies the firefly clamp
min(color, 2.5), pt.wgsl:751) and ray-count statistics for Mrays/s metrics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wgpu_path_tracing_tpu.ops import bsdf as BSDF
from wgpu_path_tracing_tpu.ops import lights as LIGHTS
from wgpu_path_tracing_tpu.ops import rng as RNG
from wgpu_path_tracing_tpu.ops import shade as SHADE

EPSILON = 1e-6


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def trace(
    scene,
    closest_hit,
    ro,
    rd,
    state,
    *,
    max_bounces: int = 8,
    do_mis: bool = True,
    num_lights: int = 0,
):
    """Trace a batch of rays. ro, rd: (N, 3); state: (N,) uint32 RNG.

    Returns (radiance (N, 3), new rng state, stats) where stats counts rays:
    {"closest": scalar, "shadow": scalar}.
    """
    n = ro.shape[0]
    throughput0 = jnp.ones((n, 3), jnp.float32)
    result0 = jnp.zeros((n, 3), jnp.float32)
    alive0 = jnp.ones((n,), bool)
    counters0 = jnp.zeros((2,), jnp.int32)

    def bounce(carry, bounce_idx):
        ro, rd, throughput, result, alive, state, counters = carry

        t, idx = closest_hit(ro, rd, active=alive)
        counters = counters.at[0].add(jnp.sum(alive.astype(jnp.int32)))
        hit = SHADE.hit_attributes(scene, ro, rd, t, idx)
        found = alive & hit.found

        # Emissive termination with 1/(1+t²) attenuation (pt.wgsl:652-658)
        emissive = found & jnp.any(hit.emission > 0.0, axis=-1)
        atten = 1.0 / (1.0 + t * t)
        result = result + jnp.where(
            emissive[:, None],
            throughput
            * hit.emission
            * (hit.emissive_strength * atten)[:, None],
            0.0,
        )

        cont = found & ~emissive

        # --- NEE + MIS (pt.wgsl:661-677)
        if do_mis:
            nee = cont & (hit.transmission == 0.0) & hit.is_front
            ls, state = LIGHTS.sample_light(
                scene, closest_hit, hit.position, state, nee, num_lights
            )
            counters = counters.at[1].add(jnp.sum(nee.astype(jnp.int32)))
            v = -_normalize(rd)
            f_light, pdf_light_bsdf = BSDF.eval_bsdf(
                hit, hit.normal, v, ls.wi, hit.is_front
            )
            mis_w = BSDF.power_heuristic(1.0, ls.pdf, 1.0, pdf_light_bsdf)
            direct = (
                ls.intensity
                * f_light
                * (mis_w / jnp.maximum(ls.pdf, EPSILON))[:, None]
            )
            result = result + jnp.where(
                (nee & (ls.pdf > 0.0))[:, None], throughput * direct, 0.0
            )

        # --- BSDF sampling (pt.wgsl:680-696)
        new_dir, state = BSDF.sample_bsdf(hit, rd, hit.is_front, state, cont)
        f_val, pdf = BSDF.eval_bsdf(
            hit, hit.normal, -_normalize(rd), new_dir, hit.is_front
        )
        ok = cont & (pdf > 0.0)

        ro = jnp.where(ok[:, None], hit.position + new_dir * EPSILON, ro)
        rd = jnp.where(ok[:, None], _normalize(new_dir), rd)
        throughput = jnp.where(
            ok[:, None],
            throughput * f_val / jnp.maximum(pdf, EPSILON)[:, None],
            throughput,
        )
        alive = ok

        # --- Russian roulette from bounce 3 (pt.wgsl:699-705)
        rr = alive & (bounce_idx > 2)
        u, state = RNG.rand(state, rr)
        p = jnp.max(throughput, axis=-1)
        die = rr & (u > p)
        throughput = jnp.where((rr & ~die)[:, None], throughput / p[:, None], throughput)
        alive = alive & ~die

        return (ro, rd, throughput, result, alive, state, counters), None

    carry0 = (ro, rd, throughput0, result0, alive0, state, counters0)
    (ro, rd, throughput, result, alive, state, counters), _ = jax.lax.scan(
        bounce, carry0, jnp.arange(max_bounces), unroll=1
    )
    stats = {"closest": counters[0], "shadow": counters[1]}
    return result, state, stats
