"""Render the gallery scenes to docs/gallery/ (committed images).

Usage: python tools/render_gallery.py [--spp 256] [--size 512]

Renders the sponza-stand-in atrium (models/gallery.py) raw and denoised.
Run on the TPU (several minutes at the default spp)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "gallery"))
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_compile_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import numpy as np

    from wgpu_path_tracing_tpu import Renderer, RenderConfig
    from wgpu_path_tracing_tpu.models.gallery import gallery_atrium

    os.makedirs(args.out, exist_ok=True)
    r = Renderer(RenderConfig(width=args.size, height=args.size,
                              frames_per_chunk=8, frames_per_trace=8))
    r.load_scene(gallery_atrium())
    r.camera.position = np.array([0.0, 2.4, 3.0], np.float32)
    print(f"atrium: {r.scene.num_triangles} tris, "
          f"{r.scene.num_lights} lights, "
          f"intersector={r.stats()['intersector']}", flush=True)
    r.render(spp=args.spp, fetch=False)
    raw = os.path.join(args.out, "atrium_raw.png")
    dn = os.path.join(args.out, "atrium_denoised.png")
    r.save_png(raw)
    r.save_png(dn, denoise=True)
    print(f"wrote {raw} and {dn} ({args.spp} spp); {r.stats()}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
