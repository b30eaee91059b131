"""Benchmark harness — the repo's headline metric.

Renders the flagship Cornell scene (the reference's default scene,
renderer.ts:544) at 512x512 with full MIS+NEE path tracing to 512 spp on one
chip and reports throughput in Mrays/s plus wall-clock, as specified by
BASELINE.md. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against a fixed browser-WebGPU-class anchor of 100 Mrays/s — a
generous estimate for the reference's single-GPU Cornell throughput — so the
ratio is meaningful across rounds.
"""

from __future__ import annotations

import json
import time

import numpy as np

WIDTH = HEIGHT = 512
SPP = 512
WARMUP_SPP = 128  # >= frames_per_chunk so the timed run hits the compile cache
BASELINE_MRAYS = 100.0  # browser-WebGPU-class anchor (no published numbers)


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wgpu_path_tracing_tpu import Renderer, RenderConfig, cornell_box

    dev = jax.devices()[0]

    cfg = RenderConfig(width=WIDTH, height=HEIGHT, frames_per_chunk=128)
    r = Renderer(cfg)
    r.load_scene(cornell_box())

    # Warmup: trigger compilation.
    r.render(spp=WARMUP_SPP)
    r.reset()

    t0 = time.perf_counter()
    r.render(spp=SPP)
    elapsed = time.perf_counter() - t0
    stats = r.stats()

    img = r.image()
    assert not np.isnan(img).any()

    mrays = stats["mrays_per_sec"]
    result = {
        "metric": "mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "scene": "cornell-512x512",
        "spp": SPP,
        "wall_clock_512spp_s": round(elapsed, 3),
        "rays_total": stats["rays_total"],
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
