"""Pallas bounce megakernel parity (interpret mode): shares bounce_core with
the XLA path, so radiance, RNG states, and counters must match bit-for-bit
in interpret mode (on real TPUs only Mosaic's transcendental approximations
differ — statistically equivalent Monte Carlo)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wgpu_path_tracing_tpu.models.procedural import cornell_box
from wgpu_path_tracing_tpu.models.types import pack_device_scene
from wgpu_path_tracing_tpu.ops import camera_rays as CAM
from wgpu_path_tracing_tpu.ops import trace as TRACE
from wgpu_path_tracing_tpu.ops.intersect import make_closest_hit
from wgpu_path_tracing_tpu.ops.pallas_bounce import trace_pallas
from wgpu_path_tracing_tpu.render.camera import Camera
from wgpu_path_tracing_tpu.render.pipeline import camera_device

W = H = 32  # 1024 rays == exactly one kernel block


@pytest.fixture(scope="module")
def setup():
    sc = cornell_box()
    scene = jax.device_put(pack_device_scene(sc))
    cam = camera_device(Camera(width=W, height=H).as_pytree(), W, H)
    x, y = CAM.pixel_grid(W, H)
    ro, rd, state = CAM.generate_rays(cam, x, y, jnp.int32(0), use_dof=True)
    ch = make_closest_hit(scene, "brute", 4096, 4)
    return sc, scene, ch, ro, rd, state


def test_pallas_bounce_mid_size_scene():
    """Scenes with 512 < T <= 4096 exercise the multi-chunk one-hot select
    (regression: the table must pad to a chunk multiple or tail triangles
    are silently skipped)."""
    sc = cornell_box(tessellation=5)  # 852 triangles
    assert 512 < sc.num_triangles <= 4096
    scene = jax.device_put(pack_device_scene(sc))
    cam = camera_device(Camera(width=W, height=H).as_pytree(), W, H)
    x, y = CAM.pixel_grid(W, H)
    ro, rd, state = CAM.generate_rays(cam, x, y, jnp.int32(0), use_dof=True)
    ch = make_closest_hit(scene, "brute", 4096, 4)
    rad_x, st_x, _ = TRACE.trace(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights,
    )
    rad_p, st_p, _ = trace_pallas(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    np.testing.assert_allclose(
        np.asarray(rad_x), np.asarray(rad_p), rtol=1e-5, atol=1e-6
    )


def test_pallas_bounce_many_chunk_select(monkeypatch):
    """The widened touch mask (round 5): with SELECT_CHUNK shrunk so the
    table spans > 32 chunks (multiple mask words + dynamic word
    indexing, incl. the sign-bit 31 read), the select must stay
    bit-identical to the XLA path."""
    import wgpu_path_tracing_tpu.ops.pallas_bounce as PB

    monkeypatch.setattr(PB, "SELECT_CHUNK", 16)  # 852 tris -> 54 chunks
    # bounce_stage_pallas is a module-level jit and this scene's shapes
    # may already be cached with the default chunk (the monkeypatch-A/B
    # trap, CLAUDE.md) — force a retrace.
    jax.clear_caches()
    sc = cornell_box(tessellation=5)
    scene = jax.device_put(pack_device_scene(sc))
    cam = camera_device(Camera(width=W, height=H).as_pytree(), W, H)
    x, y = CAM.pixel_grid(W, H)
    ro, rd, state = CAM.generate_rays(cam, x, y, jnp.int32(0), use_dof=True)
    ch = make_closest_hit(scene, "brute", 4096, 4)
    rad_x, st_x, _ = TRACE.trace(
        scene, ch, ro, rd, state,
        max_bounces=3, do_mis=True, num_lights=sc.num_lights,
    )
    rad_p, st_p, _ = trace_pallas(
        scene, ch, ro, rd, state,
        max_bounces=3, do_mis=True, num_lights=sc.num_lights, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    np.testing.assert_allclose(
        np.asarray(rad_x), np.asarray(rad_p), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("do_mis", [True, False])
def test_pallas_bounce_bit_identical(setup, do_mis):
    sc, scene, ch, ro, rd, state = setup
    rad_x, st_x, stats_x = TRACE.trace(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=do_mis, num_lights=sc.num_lights,
    )
    rad_p, st_p, stats_p = trace_pallas(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=do_mis, num_lights=sc.num_lights,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    # Identical draw schedules; radiance may differ by FMA contraction
    # (compiled XLA fuses multiply-adds, the interpreter does not) — ulps.
    np.testing.assert_allclose(
        np.asarray(rad_x), np.asarray(rad_p), rtol=1e-5, atol=1e-6
    )
    assert int(stats_x["closest"]) == int(stats_p["closest"])
    assert int(stats_x["shadow"]) == int(stats_p["shadow"])


def test_pallas_bounce_textured():
    """Textured scenes on the fast path: the in-kernel two-level one-hot
    atlas sampler must match the XLA path's native texel gathers (albedo,
    PBR, emissive AND the conditional normal map all sampled)."""
    from wgpu_path_tracing_tpu.models.procedural import textured_cornell

    sc = textured_cornell()
    scene = jax.device_put(pack_device_scene(sc))
    assert scene["atlas"].shape[0] > 1  # really textured
    cam = camera_device(Camera(width=W, height=H).as_pytree(), W, H)
    x, y = CAM.pixel_grid(W, H)
    ro, rd, state = CAM.generate_rays(cam, x, y, jnp.int32(0), use_dof=True)
    ch = make_closest_hit(scene, "brute", 4096, 4)
    rad_x, st_x, _ = TRACE.trace(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights,
    )
    rad_p, st_p, _ = trace_pallas(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    np.testing.assert_allclose(
        np.asarray(rad_x), np.asarray(rad_p), rtol=1e-5, atol=1e-6
    )


def test_pallas_bounce_textured_external():
    """Atlases above UNTILED_ATLAS_TEXELS run EXTERNAL mode: per bounce an
    XLA-side HBM gather (_gather_texels) pre-fetches the winner texels and
    the kernel consumes them as per-lane rows. RNG streams must match the
    XLA path exactly; radiance to FMA-placement ulps (the gather
    interpolates uv with the shared shade.barycentrics_from_cols
    expressions, so texel CHOICE matches except exactly-on-boundary
    razor ties, none in this scene)."""
    from wgpu_path_tracing_tpu.models.procedural import textured_cornell
    from wgpu_path_tracing_tpu.ops.pallas_bounce import (
        UNTILED_ATLAS_TEXELS,
        prepare_tables,
    )

    sc = textured_cornell(atlas_size=256)
    scene = jax.device_put(pack_device_scene(sc))
    assert scene["atlas"].shape[0] * scene["atlas"].shape[1] \
        > UNTILED_ATLAS_TEXELS
    tables = prepare_tables(scene)
    assert tables is not None and tables[3][2] == "ext", \
        "external atlas mode not selected"
    cam = camera_device(Camera(width=W, height=H).as_pytree(), W, H)
    x, y = CAM.pixel_grid(W, H)
    ro, rd, state = CAM.generate_rays(cam, x, y, jnp.int32(0), use_dof=True)
    ch = make_closest_hit(scene, "brute", 4096, 4)
    rad_x, st_x, _ = TRACE.trace(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights,
    )
    rad_p, st_p, _ = trace_pallas(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    np.testing.assert_allclose(
        np.asarray(rad_x), np.asarray(rad_p), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("congruent", [True, False])
def test_pallas_bounce_textured_fat_inkernel(congruent):
    """Small atlases whose fat bake fits the in-kernel budgets ride the
    in-VMEM FAT sampler (_make_fat_sampler): ONE one-hot row select
    serves all four texture slots. Both paths consume the fat canvas
    (XLA via shade.sample_atlas_fat, the kernel via the fatfn closure)
    with identical index math, so RNG streams must match exactly —
    congruent AND mixed-resolution (LCM virtual grid) map sets."""
    from wgpu_path_tracing_tpu.models.procedural import textured_cornell
    from wgpu_path_tracing_tpu.ops.pallas_bounce import prepare_tables

    sc = textured_cornell(atlas_size=32, congruent=congruent)
    scene = jax.device_put(pack_device_scene(sc))
    assert "atlas_fat" in scene
    tables = prepare_tables(scene)
    assert tables is not None and tables[3][2] == "fat", \
        "in-kernel fat atlas mode not selected"
    cam = camera_device(Camera(width=W, height=H).as_pytree(), W, H)
    x, y = CAM.pixel_grid(W, H)
    ro, rd, state = CAM.generate_rays(cam, x, y, jnp.int32(0), use_dof=True)
    ch = make_closest_hit(scene, "brute", 4096, 4)
    rad_x, st_x, _ = TRACE.trace(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights,
    )
    rad_p, st_p, _ = trace_pallas(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    np.testing.assert_allclose(
        np.asarray(rad_x), np.asarray(rad_p), rtol=1e-5, atol=1e-6
    )


def test_pallas_bounce_spot_light():
    """Spot-light rows (extension type 3) ride the same light_full table;
    the in-VMEM row select must reproduce the XLA path bit-for-bit."""
    import dataclasses

    sc = cornell_box()
    n = sc.num_lights
    aux = np.zeros((n + 1, 5), np.float32)
    aux[-1] = [0.0, -1.0, 0.0, 9.75, -8.56]  # down-facing cone
    sc = dataclasses.replace(
        sc,
        light_position=np.concatenate([sc.light_position,
                                       [[0.0, 1.9, 0.0]]]).astype(np.float32),
        light_type=np.concatenate([sc.light_type, [3]]).astype(np.int32),
        light_color=np.concatenate([sc.light_color,
                                    [[1.0, 0.8, 0.6]]]).astype(np.float32),
        light_intensity=np.concatenate([sc.light_intensity,
                                        [30000.0]]).astype(np.float32),
        light_tri=np.concatenate([sc.light_tri, [0]]).astype(np.int32),
        light_aux=aux,
    )
    scene = jax.device_put(pack_device_scene(sc))
    cam = camera_device(Camera(width=W, height=H).as_pytree(), W, H)
    x, y = CAM.pixel_grid(W, H)
    ro, rd, state = CAM.generate_rays(cam, x, y, jnp.int32(0), use_dof=True)
    ch = make_closest_hit(scene, "brute", 4096, 4)
    rad_x, st_x, _ = TRACE.trace(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights,
    )
    assert np.asarray(rad_x).max() > 0
    rad_p, st_p, _ = trace_pallas(
        scene, ch, ro, rd, state,
        max_bounces=4, do_mis=True, num_lights=sc.num_lights, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(st_x), np.asarray(st_p))
    np.testing.assert_allclose(
        np.asarray(rad_x), np.asarray(rad_p), rtol=1e-5, atol=1e-6
    )
