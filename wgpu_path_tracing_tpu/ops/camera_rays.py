"""Primary ray generation (device-side).

Reimplements the ray setup of the compute entry point (pt.wgsl:713-750):

* per-pixel RNG seeded from (x, y, frame) (pt.wgsl:719 -> random.wgsl:3-5),
* jittered pixel position (pt.wgsl:723): pixel = (x + rand(), y + rand()),
* pinhole direction: forward + uv.x·right·tan(fov/2)·aspect +
  uv.y·up·tan(fov/2), normalized (pt.wgsl:727-731) — NOTE uv.y grows with
  pixel row, so buffer row 0 is the BOTTOM of the view; the display blit
  flips (blit.wgsl:149-151) and so does our PNG writer,
* thin-lens depth of field when aperture > 0 (pt.wgsl:736-748): focal point
  at focus_distance along the ideal ray; origin jittered on the aperture
  disc (r = sqrt(rand())·aperture, θ = rand()·2π in the right/up plane).

Whether DoF runs is static (the aperture is a host camera parameter), but
RNG draws for it happen for every pixel when enabled, exactly like the
uniform-control-flow WGSL.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from wgpu_path_tracing_tpu.ops import rng as RNG

PI = 3.14159265359

# Opt-in extension knob (A/B probes flip it in one process): when the
# renderer runs rng="stratified", also draw the FIRST-BOUNCE BSDF
# decisions (lobe select + 2D direction) from per-pixel-rotated
# low-discrepancy sequences via bounce0_lds below. The PCG state still
# advances exactly as before (values are overridden, the stream is not),
# so later bounces keep their draw schedule. Reference parity is
# untouched — rng="reference"/"hash" never build the override.
TRACE_BOUNCE0_LDS = True

_PHI1 = 0.6180339887498949  # golden ratio conjugate: 1D additive sequence


def bounce0_lds(x, y, frame):
    """Low-discrepancy first-bounce BSDF draws for rng="stratified".

    Returns (3, N) f32 rows [lobe, r1, r2] in [0, 1): the lobe pick from
    a per-pixel-rotated golden-ratio 1D sequence, the direction pair from
    the R2 sequence (separate Cranley-Patterson streams from the
    primary-ray draws, so lens and BSDF dimensions stay decorrelated).
    The first-bounce BSDF integral is the smoothest path dimension after
    the lens — the same O(1/N)-vs-O(1/sqrt N) argument as the primary
    stratification (ops/rng.py R2 notes)."""
    zero = jnp.zeros((), jnp.int32)
    inv = np.float32(1.0 / 4294967296.0)
    u0 = RNG._u32_to_f32(RNG.hash_seed(x, y, zero, stream=5)) * inv
    f = (jnp.asarray(frame).astype(jnp.int32)
         & (RNG.R2_CYCLE - 1)).astype(jnp.float32)
    lobe = u0 + f * np.float32(_PHI1)
    lobe = lobe - jnp.floor(lobe)
    r1, r2 = RNG.r2_point(x, y, frame, stream=6)
    return jnp.stack([lobe, r1, r2], axis=0)


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))


def pixel_grid(width: int, height: int, row_offset: int = 0):
    """Pixel integer coords for a (height, width) tile, flattened row-major
    (buffer index = y * width + x, pt.wgsl:753). ``row_offset`` shifts y for
    sharded row tiles so RNG seeds stay globally consistent."""
    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32) + row_offset,
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    return x.reshape(-1), y.reshape(-1)


def generate_rays(cam, x, y, frame, *, use_dof: bool, rng_mode: str = "reference"):
    """Returns (ro (N,3), rd (N,3), rng state (N,))."""
    if rng_mode == "reference":
        state = RNG.seed_pixel(x, y, frame)
    else:
        state = RNG.hash_seed(x, y, frame)

    if rng_mode == "stratified":
        # Opt-in extension (not reference parity): primary-ray decisions
        # draw from a per-pixel-rotated R2 low-discrepancy sequence — the
        # per-pixel estimator is a plain average over frames, where
        # well-spaced points converge ~O(1/N) on the smooth lens/AA
        # integrals vs O(1/sqrt(N)) for independent uniforms. Bounce
        # decisions keep the PCG stream (path space is too discontinuous
        # for a 2D sequence to help there).
        jx, jy = RNG.r2_point(x, y, frame, stream=1)
    else:
        jx, state = RNG.rand(state)
        jy, state = RNG.rand(state)
    px = x.astype(jnp.float32) + jx
    py = y.astype(jnp.float32) + jy

    width = cam["width_f"]
    height = cam["height_f"]
    u = (px / width) * 2.0 - 1.0
    v = (py / height) * 2.0 - 1.0

    tan_half = jnp.tan(cam["fov"] * 0.5)
    rd = _normalize(
        cam["forward"][None, :]
        + u[:, None] * cam["right"][None, :] * (tan_half * cam["aspect"])
        + v[:, None] * cam["up"][None, :] * tan_half
    )
    ro = jnp.broadcast_to(cam["position"][None, :], rd.shape)

    if use_dof:
        focal = cam["position"][None, :] + rd * cam["focus_distance"]
        if rng_mode == "stratified":
            r, theta = RNG.r2_point(x, y, frame, stream=3)
        else:
            r, state = RNG.rand(state)
            theta, state = RNG.rand(state)
        rr = jnp.sqrt(r) * cam["aperture"]
        ang = theta * (2.0 * PI)
        offset = (
            cam["right"][None, :] * (rr * jnp.cos(ang))[:, None]
            + cam["up"][None, :] * (rr * jnp.sin(ang))[:, None]
        )
        ro = ro + offset
        rd = _normalize(focal - ro)

    return ro, rd, state
