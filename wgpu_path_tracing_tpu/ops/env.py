"""Optional environment lighting — a documented EXTENSION over the
reference, which renders miss -> black with no environment map
(pt.wgsl:646-649; that parity behavior stays the default).

When a scene carries an environment map (``scene["env"]`` taller than the
1x1 placeholder), rays that leave the scene pick up the equirectangular
radiance instead of black. Sampling is nearest-texel, matching the
reference's nearest-neighbor textureLoad convention for its atlas
(pt.wgsl:119). The map contributes only on miss (no env importance
sampling); NEE/MIS math is untouched, so enabling it never changes the
radiance of rays that hit geometry.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from wgpu_path_tracing_tpu.ops import vec
from wgpu_path_tracing_tpu.ops.vec import V3

TWO_PI = np.float32(2.0 * np.pi)
INV_PI = np.float32(1.0 / np.pi)


def make_env_sampler(env, params):
    """Build rd -> V3 radiance for an equirectangular map.

    env: (H, W, 3) linear radiance; params: (2,) [intensity, rotation_rad].
    Returns None when env is the 1x1 "disabled" placeholder (static shape
    check, so jit traces the parity path with zero overhead).
    """
    h, w = env.shape[0], env.shape[1]
    if h <= 1 and w <= 1:  # keep in sync with pipeline.make_trace_fn's
        return None  # has_env (either dim > 1 enables)
    intensity = params[0]
    rotation = params[1]

    def sample(rd: V3) -> V3:
        d = vec.normalize(rd)
        # Equirect: u from azimuth (atan2), v from polar angle.
        u = (jnp.arctan2(d.z, d.x) + rotation) / TWO_PI
        u = u - jnp.floor(u)  # wrap to [0, 1)
        v = jnp.arccos(jnp.clip(d.y, -1.0, 1.0)) * INV_PI
        ix = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        texel = env[iy, ix]  # (..., 3) gather
        return V3(
            texel[..., 0] * intensity,
            texel[..., 1] * intensity,
            texel[..., 2] * intensity,
        )

    return sample


def load_env_image(source) -> np.ndarray:
    """Read an environment image: (H, W, 3) float32 linear radiance.

    ``source`` may be a numpy array (used as-is), a Radiance .hdr, an
    OpenEXR .exr (uncompressed FLOAT scanlines only — ZIP/PIZ/HALF EXRs
    raise ValueError from utils.image.read_exr; convert those first), or an
    LDR image file (sRGB-decoded with gamma 2.2, the reference's texture
    convention, atlas.ts:143-147)."""
    if isinstance(source, np.ndarray):
        arr = np.asarray(source, np.float32)
        if arr.ndim != 3 or arr.shape[2] < 3:
            raise ValueError(
                f"environment array must be (H, W, >=3); got {arr.shape}"
            )
        return np.ascontiguousarray(arr[:, :, :3])
    lower = str(source).lower()
    if lower.endswith(".hdr"):
        from wgpu_path_tracing_tpu.utils.image import read_hdr

        return read_hdr(source)
    if lower.endswith(".exr"):
        from wgpu_path_tracing_tpu.utils.image import read_exr

        return read_exr(source)
    from wgpu_path_tracing_tpu.utils.image import read_png

    ldr = read_png(source)
    return np.power(ldr[:, :, :3], 2.2, dtype=np.float32)
