"""Adaptive sampling (opt-in extension) — spend rays where the noise is.

The reference distributes samples uniformly (1 spp per pixel per frame,
renderer.ts:415-454) and so does this framework's default path. But the
round-3 floor measurements (BASELINE.md) pin every kernel at its hardware
floor — equal-quality wall clock on one chip now improves only by casting
FEWER RAYS, and uniform sampling wastes most of them: converged pixels
(directly lit walls) get the same budget as high-variance ones (DoF
bokeh, glass caustics, penumbrae).

Scheme (all measured claims in BASELINE.md):

1. **Uniform warmup** through the untouched default pipeline, with one
   accumulation snapshot at the halfway point. The running mean satisfies
   ``accum@n0 − accum@n0/2 = (B − A)·(n0/2)/n0`` where A/B are the two
   halves' independent means — i.e. the snapshot diff IS a split-buffer
   noise estimator, for free (no second buffer, no extra rays).
2. **Per-pixel error score** in DISPLAY space: |srgb(accum) − srgb(snap)|
   summed over channels — display space is what quality metrics (and
   eyes) measure, and its gamma expands exactly the dark regions where
   linear-space scores under-weight noise.
3. **Subset rounds**: the noisiest K = select_frac·N pixels (top-K lanes,
   static shape → one compile) each get one more sample per round via
   ``render_chunk_subset`` — the same trace machinery over K lanes with
   scatter-add into (sum, count) side buffers. A round costs
   ~select_frac of a uniform frame.
4. **Reselection every round** (host-side: counts are tracked locally,
   so a reselect costs an argpartition over N floats plus three small
   device_puts — no extra pulls) by MARGINAL MSE gain: one more sample
   at pixel i reduces its MSE by σᵢ²(1/nᵢ − 1/(nᵢ+1)) ≈ (σᵢ/nᵢ)², so
   greedy-optimal selection ranks by score/nᵢ. (Ranking by
   score/sqrt(nᵢ) instead — equalizing per-pixel ERROR — was measured
   0.179 vs 0.158 uniform on glass-dof@16spp: it over-concentrates; the
   marginal-gain rule is what the equal-budget win below uses.) The
   warmup score is itself a noisy estimate (one |B−A| draw), so it is
   smoothed 3×3 (zero-score pixels — converged or miss — stay zero and
   are never sampled).
5. Final image: (warmup_mean·n0 + extra_sum) / (n0 + extra_count).

Parity: the default render path is untouched — warmup frames are
bit-identical to a plain render(n0), and the extension only ADDS samples
in separate side buffers. Each pixel's estimate is a plain average of
its unique (pixel, frame)-seeded samples (the standard mild adaptive
bias — sample counts correlate with observed noise — applies, as in any
adaptive sampler). Single-device only (the warmup may be sharded, but
subset rounds run on the default device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_path_tracing_tpu.ops import camera_rays as CAM
from wgpu_path_tracing_tpu.ops.intersect import make_closest_hit
from wgpu_path_tracing_tpu.render.pipeline import make_trace_fn

# Subset lane counts are rounded up to a multiple of this so the kernels
# see friendly shapes and reselection never changes the compile key.
LANE_QUANTUM = 2048

# Measured-by-probe knobs (module-level so A/B probes can flip them in
# one process; production values are the measured winners — see
# BASELINE.md quality section):
#   _PRED_RULE: "n" ranks by marginal MSE gain (score/n_i), "sqrt"
#   equalizes per-pixel error (score/sqrt(n_i)).
#   _BLUR: 3x3 image-space smoothing of the warmup score.
_PRED_RULE = "n"
_BLUR = True


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_frames", "use_dof", "rng_mode", "max_bounces", "do_mis",
        "num_lights", "firefly_clamp", "intersector", "brute_max_tris",
        "leaf_size", "bounce_kernel", "slots_used",
    ),
    donate_argnames=("extra_sum", "extra_count"),
)
def render_chunk_subset(
    scene,
    cam,
    extra_sum,
    extra_count,
    x,
    y,
    lane_idx,
    frame_start,
    *,
    n_frames: int,
    use_dof: bool,
    rng_mode: str,
    max_bounces: int,
    do_mis: bool,
    num_lights: int,
    firefly_clamp: float,
    intersector: str,
    brute_max_tris: int,
    leaf_size: int,
    bounce_kernel: str = "auto",
    slots_used: tuple = (True, True, True, True),
):
    """``n_frames`` one-sample rounds for the K pixels in (x, y), each
    scatter-added into the full-frame (N, 3)/(N,) side buffers at
    ``lane_idx``. Seeds come from the global frame counter exactly like
    the uniform pipeline, so a pixel's adaptive samples are the ones a
    longer uniform render would eventually have drawn."""
    closest_hit = make_closest_hit(scene, intersector, brute_max_tris,
                                   leaf_size)
    trace_fn = make_trace_fn(
        scene, closest_hit, bounce_kernel=bounce_kernel,
        max_bounces=max_bounces, do_mis=do_mis, num_lights=num_lights,
        slots_used=slots_used,
    )

    def step(carry, k):
        extra_sum, extra_count, counters = carry
        frame = frame_start + k
        ro, rd, state = CAM.generate_rays(
            cam, x, y, frame, use_dof=use_dof, rng_mode=rng_mode)
        radiance, state, stats = trace_fn(ro, rd, state)
        color = jnp.minimum(radiance, jnp.float32(firefly_clamp))
        extra_sum = extra_sum.at[lane_idx].add(color)
        extra_count = extra_count.at[lane_idx].add(1)
        counters = counters + jnp.stack([stats["closest"], stats["shadow"]])
        return (extra_sum, extra_count, counters), None

    counters0 = jnp.zeros((2,), jnp.int32)
    (extra_sum, extra_count, counters), _ = jax.lax.scan(
        step, (extra_sum, extra_count, counters0),
        jnp.arange(n_frames, dtype=jnp.int32))
    return extra_sum, extra_count, counters


def _display_diff(a_lin: np.ndarray, b_lin: np.ndarray) -> np.ndarray:
    """Per-lane L1 of the tonemapped difference (display-space noise).

    The AGX display chain is per-pixel, so it can run directly on the
    flat LANE-ordered buffers (no display reshape/flip needed) — the
    selection wants lane order anyway."""
    from wgpu_path_tracing_tpu.ops.tonemap import display_transform

    ta = np.asarray(display_transform(jnp.asarray(a_lin)))
    tb = np.asarray(display_transform(jnp.asarray(b_lin)))
    return np.abs(ta - tb).sum(axis=-1)


def render_adaptive(
    renderer,
    spp: int,
    *,
    warmup_frac: float = 0.5,
    select_frac: float = 0.25,
    reselect_every: int = 1,
) -> np.ndarray:
    """Render ~``spp`` frames of ray budget adaptively; returns the
    combined HDR image (H, W, 3), row 0 = bottom (like render()).

    The renderer's own accumulation afterwards holds the uniform warmup
    only (parity-clean); treat this call as terminal for the current
    accumulation — continuing with plain render() would reuse frame
    seeds the adaptive rounds already consumed for the selected pixels
    (documented limitation, same class as resuming a checkpoint with a
    different frame_index).
    """
    if renderer.mesh is not None:
        raise NotImplementedError(
            "adaptive sampling runs single-device (warmup may be sharded "
            "in a future round)")
    cfg = renderer.config
    w, h = cfg.width, cfg.height
    n = w * h
    n0 = max(2, int(round(spp * warmup_frac)))
    n0 += n0 & 1  # even, so the snapshot halves match
    if spp <= n0 or n0 < 2:
        renderer.render(spp, fetch=False)
        return renderer._row_major(renderer._accum).reshape(h, w, 3)

    # 1. Warmup with a halfway snapshot (one extra ~N*12-byte pull).
    half = n0 // 2
    renderer.render(half, fetch=False)
    snap = np.asarray(renderer._accum, np.float32)
    renderer.render(n0 - half, fetch=False)
    base = np.asarray(renderer._accum, np.float32)

    # 2. Display-space split-buffer noise score per lane, smoothed 3x3
    # in IMAGE space (noise is spatially correlated and the one-draw
    # |B-A| estimator is itself noisy). Exactly-zero scores (converged
    # pixels, misses) stay zero — never worth a ray.
    score = _display_diff(base, snap)
    from wgpu_path_tracing_tpu.utils.tiling import (
        inverse_permutation,
        tile_permutation,
    )

    perm = tile_permutation(w, h)
    if _BLUR:
        inv = inverse_permutation(perm)
        img_score = score[inv].reshape(h, w)
        pad = np.pad(img_score, 1, mode="edge")
        sm = sum(pad[dy:dy + h, dx:dx + w]
                 for dy in range(3) for dx in range(3)) / 9.0
        score = np.where(img_score.reshape(-1) > 0.0,
                         sm.reshape(-1), 0.0)[perm]

    # 3. Static-K subset rounds.
    k = int(round(n * select_frac))
    k = max(LANE_QUANTUM, ((k + LANE_QUANTUM - 1) // LANE_QUANTUM)
            * LANE_QUANTUM)
    k = min(k, n)
    rounds_total = int(round((spp - n0) * n / k))
    if rounds_total == 0:
        return renderer._row_major(renderer._accum).reshape(h, w, 3)

    x_rm, y_rm = np.divmod(np.arange(n, dtype=np.int64), w)[::-1]
    # pixel_grid flattens row-major (index = y*w + x); lane i is pixel
    # perm[i] of that order — the same permutation pipeline applies.
    x_t = x_rm[perm].astype(np.int32)
    y_t = y_rm[perm].astype(np.int32)

    extra_sum = jnp.zeros((n, 3), jnp.float32)
    extra_count = jnp.zeros((n,), jnp.int32)
    extra_count_host = np.zeros(n, np.int64)

    scene_dev = renderer._scene_dev
    from wgpu_path_tracing_tpu.render import pipeline

    cam = pipeline.camera_device(renderer.camera.as_pytree(), w, h)
    use_dof = float(renderer.camera.aperture) > 0.0
    common = dict(
        use_dof=use_dof,
        rng_mode=cfg.rng,
        max_bounces=cfg.max_bounces,
        do_mis=cfg.do_mis,
        num_lights=renderer.scene.num_lights,
        firefly_clamp=cfg.firefly_clamp,
        intersector=cfg.intersector,
        brute_max_tris=cfg.brute_force_max_tris,
        leaf_size=cfg.max_leaf_size,
        bounce_kernel=cfg.bounce_kernel,
        slots_used=getattr(renderer, "_slots_used", (True, True, True, True)),
    )

    frame = n0
    done = 0
    while done < rounds_total:
        # Marginal MSE gain of one more sample ~ (sigma_i/n_i)^2:
        # greedy-optimal rank is score/n_i (see module docstring).
        n_i = n0 + extra_count_host
        pred = score / (n_i if _PRED_RULE == "n" else np.sqrt(n_i))
        sel = np.argpartition(pred, n - k)[n - k:]
        sel_dev = jnp.asarray(sel.astype(np.int32))
        x_dev = jnp.asarray(x_t[sel])
        y_dev = jnp.asarray(y_t[sel])
        r_n = min(reselect_every, rounds_total - done)
        extra_sum, extra_count, counters = render_chunk_subset(
            scene_dev, cam, extra_sum, extra_count,
            x_dev, y_dev, sel_dev, jnp.int32(frame),
            n_frames=r_n, **common)
        extra_count_host[sel] += r_n
        renderer._counters = renderer._counters + np.asarray(
            counters, np.int64)
        frame += r_n
        done += r_n

    # 5. Combine (device-side, one pull).
    base_dev = renderer._accum
    denom = jnp.float32(n0) + extra_count.astype(jnp.float32)
    combined = (base_dev * jnp.float32(n0) + extra_sum) / denom[:, None]
    return renderer._row_major(np.asarray(combined)).reshape(h, w, 3)
