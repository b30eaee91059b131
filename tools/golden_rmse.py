"""Compare a render against the reference's committed golden PNG.

Usage:
    python tools/golden_rmse.py <render.png> [golden.png]
    python tools/golden_rmse.py --decompose <render.png> [golden.png]

The golden (docs/img/cornell_512spp.png in the reference mirror) has a black
frame border around the canvas; it is cropped to the non-black bounding box
before a box-filter resize to the render's size. Reports RMSE over [0, 1]
sRGB and writes a side-by-side PNG next to the render.

``--decompose`` separates the residual into its two causes (the source
cornell.glb is stripped from the mirror — models/replica.py reconstructs
the scene, so RMSE mixes *scene-reconstruction* error with any *renderer*
error):

* blurred RMSE (Gaussian, several sigmas, both images): low-frequency
  residual = object placement / material / lighting error; what blurring
  removes is texture detail + Monte-Carlo noise.
* figurine-masked RMSE: the golden's wooden figurine ships a texture that
  is gone with the blob, so its pixels can only ever be a stand-in. The
  mask is computed from the replica's own primary-hit material ids
  (figurine materials BROWN/BASEGREEN), dilated, and excluded; the
  complement (figurine-only RMSE) shows how much that one object carries.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from wgpu_path_tracing_tpu.utils.image import read_png, rmse  # noqa: E402

GOLDEN = "/root/reference/docs/img/cornell_512spp.png"


def crop_border(img: np.ndarray, thresh: float = 0.02) -> np.ndarray:
    mask = img.max(axis=2) > thresh
    ys = np.nonzero(mask.any(axis=1))[0]
    xs = np.nonzero(mask.any(axis=0))[0]
    return img[ys[0] : ys[-1] + 1, xs[0] : xs[-1] + 1]


def box_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray((img * 255.0 + 0.5).astype(np.uint8))
    return np.asarray(pil.resize((w, h), Image.BOX), np.float32) / 255.0


def compare(render_path: str, golden_path: str = GOLDEN):
    render = read_png(render_path)
    golden = crop_border(read_png(golden_path))
    golden = box_resize(golden, render.shape[0], render.shape[1])
    value = float(rmse(render, golden))
    side = np.concatenate([golden, render], axis=1)
    out = render_path.rsplit(".", 1)[0] + "_vs_golden.png"
    from PIL import Image

    Image.fromarray((side * 255.0 + 0.5).astype(np.uint8)).save(out)
    return value, out


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur, edge-clamped (NumPy only)."""
    radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    out = img.astype(np.float64)
    for axis in (0, 1):
        pad = [(0, 0)] * out.ndim
        pad[axis] = (radius, radius)
        padded = np.pad(out, pad, mode="edge")
        out = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="valid"), axis, padded
        )
    return out.astype(np.float32)


def figurine_mask(height: int, width: int, dilate: int = 6) -> np.ndarray:
    """Boolean (H, W) mask of the replica's figurine stand-in (materials
    BROWN=8 / BASEGREEN=9 / BODY=10, models/replica.py), from a primary-ray
    material-id render with the fitted golden camera, dilated ``dilate``
    pixels. CPU JAX; a few seconds at 512^2."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wgpu_path_tracing_tpu.models.replica import (
        REPLICA_CAMERA_POSITION,
        cornell_replica,
    )
    from wgpu_path_tracing_tpu.models.types import pack_device_scene
    from wgpu_path_tracing_tpu.ops import camera_rays as CAM
    from wgpu_path_tracing_tpu.ops.intersect import make_closest_hit
    from wgpu_path_tracing_tpu.render.camera import Camera
    from wgpu_path_tracing_tpu.render.pipeline import camera_device

    sc = cornell_replica()
    scene = pack_device_scene(sc)
    cam_h = Camera(width=width, height=height)
    cam_h.position = np.asarray(REPLICA_CAMERA_POSITION, np.float32)
    cam = camera_device(cam_h.as_pytree(), width, height)
    x, y = CAM.pixel_grid(width, height)
    ro, rd, _ = CAM.generate_rays(cam, x, y, jnp.int32(0), use_dof=False)
    ch = make_closest_hit(scene, "brute", 1 << 30, 4)
    _, idx = ch(ro.T, rd.T)
    idx = np.asarray(idx)
    mats = np.where(idx >= 0, sc.tri_mat[np.clip(idx, 0, None)], -1)
    mask = np.isin(mats, (8, 9, 10)).reshape(height, width)[::-1]  # row 0 = bottom
    if dilate:
        padded = np.pad(mask, dilate)
        acc = padded.copy()
        for axis in (0, 1):
            shifted = acc.copy()
            for s in range(1, dilate + 1):
                shifted |= np.roll(acc, s, axis) | np.roll(acc, -s, axis)
            acc = shifted
        mask = acc[dilate:-dilate, dilate:-dilate]
    return mask


def decompose(render_path: str, golden_path: str = GOLDEN):
    """Print the full/blurred/masked RMSE decomposition (module docstring)."""
    render = read_png(render_path)
    golden = crop_border(read_png(golden_path))
    golden = box_resize(golden, render.shape[0], render.shape[1])
    full = float(rmse(render, golden))
    print(f"RMSE full image:        {full:.4f}")
    for sigma in (2.0, 4.0, 8.0):
        b = float(rmse(gaussian_blur(render, sigma), gaussian_blur(golden, sigma)))
        print(f"RMSE blur sigma={sigma:<4}    {b:.4f}   "
              "(low-frequency: placement/materials/lighting)")
    mask = figurine_mask(render.shape[0], render.shape[1])
    sel = ~mask
    masked = float(np.sqrt(np.mean((render[sel] - golden[sel]) ** 2)))
    fig = float(np.sqrt(np.mean((render[mask] - golden[mask]) ** 2)))
    frac = mask.mean()
    print(f"RMSE figurine-masked:   {masked:.4f}   "
          f"(excludes {frac:.1%} of pixels)")
    print(f"RMSE figurine-only:     {fig:.4f}   "
          "(stand-in for the stripped texture)")
    return {"full": full, "masked": masked, "figurine": fig,
            "mask_fraction": float(frac)}


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--decompose":
        decompose(argv[1], argv[2] if len(argv) > 2 else GOLDEN)
    else:
        value, out = compare(argv[0], argv[1] if len(argv) > 1 else GOLDEN)
        print(f"RMSE vs golden: {value:.4f}  (side-by-side: {out})")
