"""Debug render modes — ports of the reference's swap-in diagnostic kernels.

* ``render_bvh_depth`` — pt_bvh.wgsl:98-156: grayscale heatmap of the max
  traversal stack depth per pixel, normalized by MAX_DEPTH = 24
  (pt_bvh.wgsl:3); rays are unjittered pixel centers (pixel + 0.5).
* ``render_normal`` — pt_debug.wgsl:305-344: primary-hit visualizer; front
  hits show the shading normal mapped to color ((n+1)/2), back hits solid
  red, misses black.

Both write the raw (N, 3) buffer — like the reference they bypass the
tonemap (the values are already display-referred).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wgpu_path_tracing_tpu.ops import camera_rays as CAM
from wgpu_path_tracing_tpu.ops import shade as SHADE
from wgpu_path_tracing_tpu.ops.intersect import make_closest_hit, slab_test

MAX_DEPTH = 24  # pt_bvh.wgsl:3


def _center_rays(cam, width: int, height: int):
    """Unjittered primary rays (pixel centers; pt_bvh.wgsl:143-153)."""
    x, y = CAM.pixel_grid(width, height)
    px = x.astype(jnp.float32) + 0.5
    py = y.astype(jnp.float32) + 0.5
    u = (px / cam["width_f"]) * 2.0 - 1.0
    v = (py / cam["height_f"]) * 2.0 - 1.0
    tan_half = jnp.tan(cam["fov"] * 0.5)
    rd = cam["forward"][None, :] + (
        u[:, None] * cam["right"][None, :] * (tan_half * cam["aspect"])
        + v[:, None] * cam["up"][None, :] * tan_half
    )
    rd = rd / jnp.sqrt(jnp.sum(rd * rd, axis=-1, keepdims=True))
    ro = jnp.broadcast_to(cam["position"][None, :], rd.shape)
    return ro, rd


@functools.partial(jax.jit, static_argnames=("width", "height", "stack_depth"))
def render_bvh_depth(scene, cam, width: int, height: int, stack_depth: int = 64):
    """Max stack depth during traversal, / MAX_DEPTH (pt_bvh.wgsl:98-130)."""
    ro, rd = _center_rays(cam, width, height)
    n = ro.shape[0]
    bvh_aabb = scene["bvh_aabb"]
    bvh_meta = scene["bvh_meta"]

    stack = jnp.zeros((n, stack_depth), jnp.int32)
    sp0 = jnp.ones((n,), jnp.int32)
    max_depth0 = jnp.zeros((n,), jnp.float32)

    def cond(c):
        _, sp, _ = c
        return jnp.any(sp > 0)

    def body(c):
        stack, sp, max_depth = c
        has = sp > 0
        spm1 = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack, spm1[:, None], axis=1)[:, 0]
        node = jnp.where(has, node, 0)
        # maxDepth updated with the post-pop pointer (pt_bvh.wgsl:112-113)
        max_depth = jnp.where(
            has, jnp.maximum(max_depth, spm1.astype(jnp.float32)), max_depth
        )
        aabb = bvh_aabb[node]
        box_hit, _ = slab_test(ro, rd, aabb[:, 0:3], aabb[:, 3:6])
        meta = bvh_meta[node]
        push = has & box_hit & (meta[:, 3] == 0)
        slot2 = jnp.minimum(spm1 + 1, stack_depth - 1)
        cur0 = jnp.take_along_axis(stack, spm1[:, None], axis=1)[:, 0]
        cur1 = jnp.take_along_axis(stack, slot2[:, None], axis=1)[:, 0]
        stack = jax.vmap(lambda s, i, v: s.at[i].set(v))(
            stack, spm1, jnp.where(push, meta[:, 1], cur0)
        )
        stack = jax.vmap(lambda s, i, v: s.at[i].set(v))(
            stack, slot2, jnp.where(push, meta[:, 0], cur1)
        )
        sp = jnp.where(has, jnp.where(push, spm1 + 2, spm1), sp)
        return stack, sp, max_depth

    _, _, max_depth = jax.lax.while_loop(cond, body, (stack, sp0, max_depth0))
    depth = max_depth / float(MAX_DEPTH)
    return jnp.stack([depth, depth, depth], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "intersector", "brute_max_tris",
                     "leaf_size", "slots_used"),
)
def render_normal(
    scene,
    cam,
    width: int,
    height: int,
    *,
    intersector: str = "auto",
    brute_max_tris: int = 512,
    leaf_size: int = 4,
    slots_used: tuple = (True, True, True, True),
):
    """Normal / backface view (pt_debug.wgsl:305-344). ``slots_used``
    gates the atlas fetches like the main path (the normal-map slot
    perturbs what this view shows)."""
    ro, rd = _center_rays(cam, width, height)
    closest_hit = make_closest_hit(scene, intersector, brute_max_tris, leaf_size)
    t, idx = closest_hit(ro.T, rd.T)
    hit = SHADE.hit_attributes(scene, ro, rd, t, idx,
                               slots_used=slots_used)
    normal_color = jnp.stack(
        [(hit.normal.x + 1.0) * 0.5, (hit.normal.y + 1.0) * 0.5,
         (hit.normal.z + 1.0) * 0.5],
        axis=-1,
    )
    red = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    color = jnp.where(hit.is_front[:, None], normal_color, red[None, :])
    return jnp.where(hit.found[:, None], color, 0.0)
