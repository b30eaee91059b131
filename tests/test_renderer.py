"""Renderer orchestration: progressive accumulation, reset semantics,
checkpoint/resume, camera controls, CLI, GLB loading."""

import math
import os

import numpy as np
import pytest

from wgpu_path_tracing_tpu import Camera, Renderer, RenderConfig, cornell_box

MODELS = "/root/reference/public/models"


@pytest.fixture(scope="module")
def small_renderer():
    r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=4))
    r.load_scene(cornell_box())
    return r


def test_progressive_equals_batch(small_renderer):
    r = small_renderer
    r.reset()
    a = r.render(spp=4)
    a = r.render(spp=4)
    r2 = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=8))
    r2.load_scene(cornell_box())
    b = r2.render(spp=8)
    np.testing.assert_array_equal(a, b)


def test_camera_move_resets_accumulation(small_renderer):
    r = small_renderer
    r.reset()
    r.render(spp=4)
    assert r.frame_index == 4
    r.move_camera(0.1, 0.0, 0.0)
    assert r.frame_index == 0
    r.camera.position = np.array([0.0, 1.0, 2.8], np.float32)  # restore


def test_rotate_camera_semantics():
    cam = Camera()
    cam.rotate(math.pi / 2, 0.0)  # yaw 90° left
    np.testing.assert_allclose(cam.forward, [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(cam.right, [0, 0, -1], atol=1e-6)
    # Pitch clamp at ±89% of pi/2 (renderer.ts:180-183)
    cam2 = Camera()
    cam2.rotate(0.0, 10.0)
    assert math.asin(cam2.forward[1]) <= (math.pi / 2) * 0.99 + 1e-6


def test_checkpoint_resume(tmp_path, small_renderer):
    r = small_renderer
    r.reset()
    r.render(spp=4)
    ckpt = str(tmp_path / "ck.npz")
    r.save_checkpoint(ckpt)
    full = r.render(spp=4)  # 8 spp total

    r2 = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=4))
    r2.load_scene(cornell_box())
    r2.load_checkpoint(ckpt)
    assert r2.frame_index == 4
    resumed = r2.render(spp=4)
    np.testing.assert_array_equal(full, resumed)


def test_image_and_png(tmp_path, small_renderer):
    r = small_renderer
    img = r.image()
    assert img.shape == (16, 16, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    p = str(tmp_path / "out.png")
    r.save_png(p)
    from wgpu_path_tracing_tpu.utils.image import read_png

    back = read_png(p)
    assert back.shape == (16, 16, 3)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_debug_modes():
    for mode in ("normal", "bvh_depth"):
        r = Renderer(RenderConfig(width=16, height=16, mode=mode))
        r.load_scene(cornell_box())
        img = r.render_debug()
        assert img.shape == (16, 16, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0  # something visible


@pytest.mark.skipif(not os.path.exists(MODELS), reason="reference models absent")
def test_render_glb_scene():
    r = Renderer(RenderConfig(width=12, height=12, frames_per_chunk=2))
    r.load_model(f"{MODELS}/transform.glb")  # smallest model (40 tris)
    buf = r.render(spp=2)
    assert np.isfinite(buf).all()


@pytest.mark.skipif(not os.path.exists(MODELS), reason="reference models absent")
@pytest.mark.parametrize(
    "name", ["cornell2", "monkey", "metal", "glass_box", "untitled"]
)
def test_render_every_reference_model(name):
    """End-to-end render smoke over EVERY reference sample scene (the
    reference's index.html model picker offers all of them) — finite,
    non-black output at a thumbnail canvas. transform.glb is covered
    above; this closes render-level coverage for the other five."""
    r = Renderer(RenderConfig(width=12, height=12, frames_per_chunk=2,
                              max_bounces=3))
    r.load_model(f"{MODELS}/{name}.glb")
    buf = np.asarray(r.render(spp=2))
    assert np.isfinite(buf).all()
    assert buf.max() > 0.0, "render is all-black"


def test_cli_render_and_info(tmp_path, capsys):
    from wgpu_path_tracing_tpu.cli import main

    out = str(tmp_path / "cli.png")
    rc = main(["render", "cornell", "-o", out, "--spp", "2",
               "--width", "12", "--height", "12", "--chunk", "2"])
    assert rc == 0 and os.path.exists(out)
    rc = main(["info", "cornell"])
    assert rc == 0
    assert '"triangles": 36' in capsys.readouterr().out


def test_cli_export_roundtrip(tmp_path, capsys):
    """`cli export` writes a .glb that renders back through `cli render`."""
    from wgpu_path_tracing_tpu.cli import main

    glb = str(tmp_path / "out.glb")
    rc = main(["export", "material-box", "-o", glb])
    assert rc == 0 and os.path.exists(glb)
    capsys.readouterr()
    png = str(tmp_path / "rt.png")
    rc = main(["render", glb, "-o", png, "--spp", "2",
               "--width", "12", "--height", "12", "--chunk", "2"])
    assert rc == 0 and os.path.exists(png)
    rc = main(["export", "nope", "-o", glb])
    assert rc == 2


def test_cli_render_with_env_map(tmp_path):
    """--env-map plumbs through the CLI to the renderer (extension)."""
    from wgpu_path_tracing_tpu.cli import main
    from wgpu_path_tracing_tpu.utils.image import write_hdr

    env = np.full((4, 8, 3), 0.5, np.float32)
    hdr = str(tmp_path / "sky.hdr")
    write_hdr(hdr, env)
    out = str(tmp_path / "env.png")
    rc = main(["render", "cornell", "-o", out, "--spp", "2",
               "--width", "12", "--height", "12", "--chunk", "2",
               "--env-map", hdr, "--env-intensity", "2.0",
               "--env-rotation", "90"])
    assert rc == 0 and os.path.exists(out)


def test_checkpoint_path_without_npz_suffix(tmp_path):
    """np.savez appends '.npz'; save/load must agree on the real filename."""
    from wgpu_path_tracing_tpu import Renderer, RenderConfig
    from wgpu_path_tracing_tpu.models.procedural import cornell_box

    r = Renderer(RenderConfig(width=32, height=32, frames_per_chunk=2))
    r.load_scene(cornell_box())
    r.render(spp=2)
    ck = str(tmp_path / "ckpt")  # no .npz suffix
    r.save_checkpoint(ck)
    r2 = Renderer(RenderConfig(width=32, height=32, frames_per_chunk=2))
    r2.load_scene(cornell_box())
    r2.load_checkpoint(ck)
    assert r2.frame_index == 2


def test_lightless_scene_mis_is_finite():
    """NEE with zero lights must not produce NaNs (the padded zero light row
    has area 0 -> pdf must be 0, and the pipeline skips NEE entirely)."""
    import dataclasses

    from wgpu_path_tracing_tpu import Renderer, RenderConfig
    from wgpu_path_tracing_tpu.models.procedural import cornell_box

    scene = cornell_box()
    # Strip the light table the way an emissive-free GLB would arrive.
    scene = dataclasses.replace(
        scene,
        light_position=scene.light_position[:0],
        light_type=scene.light_type[:0],
        light_color=scene.light_color[:0],
        light_intensity=scene.light_intensity[:0],
        light_tri=scene.light_tri[:0],
    )
    r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=2,
                              do_mis=True))
    r.load_scene(scene)
    out = r.render(spp=2)
    assert np.isfinite(out).all()


def test_save_hdr(tmp_path):
    from wgpu_path_tracing_tpu import Renderer, RenderConfig
    from wgpu_path_tracing_tpu.models.procedural import cornell_box
    from wgpu_path_tracing_tpu.utils.image import read_hdr

    r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=2))
    r.load_scene(cornell_box())
    buf = r.render(spp=2)
    p = str(tmp_path / "out.hdr")
    r.save_hdr(p)
    back = read_hdr(p)
    assert back.shape == (16, 16, 3)
    # Linear radiance, y-flipped to display orientation, RGBE-quantized.
    maxc = buf[::-1].max(axis=2, keepdims=True)
    assert np.all(np.abs(back - buf[::-1]) <= 0.01 * maxc + 1e-4)


def test_save_exr(tmp_path):
    from wgpu_path_tracing_tpu import Renderer, RenderConfig
    from wgpu_path_tracing_tpu.models.procedural import cornell_box
    from wgpu_path_tracing_tpu.utils.image import read_exr

    r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=2))
    r.load_scene(cornell_box())
    buf = r.render(spp=2)
    p = str(tmp_path / "out.exr")
    r.save_exr(p)
    back = read_exr(p)
    assert back.shape == (16, 16, 3)
    # EXR stores exact f32: bit-identical round trip (post nan scrub).
    np.testing.assert_array_equal(back, np.nan_to_num(buf[::-1], nan=0.0))


def test_exr_roundtrip_random(tmp_path):
    from wgpu_path_tracing_tpu.utils.image import read_exr, write_exr

    rng = np.random.default_rng(7)
    img = (rng.standard_normal((9, 33, 3)) * 100.0).astype(np.float32)
    p = str(tmp_path / "rt.exr")
    write_exr(p, img)
    np.testing.assert_array_equal(read_exr(p), img)


def test_render_sync_false_defers_counters():
    """render(sync=False) must not lose rays: counters fold in at the next
    stats()/sync point and the accumulation matches a fully-synced run
    bit-for-bit (it is the same device computation, only the host-side
    counter pull moves)."""
    r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=4))
    r.load_scene(cornell_box())
    r.render(spp=4, fetch=False)
    base = r.stats()["rays_total"]
    for _ in range(3):
        # sync=False implies no fetch (docstring) even with the default
        # fetch=True — the call must return None, not silently sync on
        # the image pull.
        assert r.render(spp=4, sync=False) is None
    assert r._deferred_counters  # counters actually deferred
    dispatch_secs = r._last_render_seconds  # dispatch-only, provisional
    st = r.stats()
    total = st["rays_total"]
    assert not r._deferred_counters
    assert total > base
    # stats() must NOT divide the full deferred ray count by the
    # dispatch-only wall: the sync replaces last_render_seconds with the
    # first-dispatch -> counter-pull span, which covers all three calls.
    assert st["last_render_seconds"] >= dispatch_secs
    img_a = r.image()

    r2 = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=4))
    r2.load_scene(cornell_box())
    for _ in range(4):
        r2.render(spp=4, fetch=False)
    assert r2.stats()["rays_total"] == total
    np.testing.assert_array_equal(img_a, r2.image())


def test_render_sync_false_cap_drains_to_partial(monkeypatch):
    """An interactive loop that never syncs must not grow the deferred
    device-buffer list without bound: past DEFERRED_COUNTER_CAP chunks the
    list drains into a host-side int64 partial, and the next sync point
    folds BOTH sources so no rays are lost."""
    from wgpu_path_tracing_tpu.render import renderer as R

    monkeypatch.setattr(R, "DEFERRED_COUNTER_CAP", 4)
    r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=1))
    r.load_scene(cornell_box())
    for _ in range(6):
        r.render(spp=1, sync=False)
    assert r._deferred_partial.any()  # cap actually tripped
    assert len(r._deferred_counters) < 4
    total = r.stats()["rays_total"]
    assert not r._deferred_partial.any()
    assert total >= 6 * 16 * 16  # at least every primary ray accounted

    r2 = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=1))
    r2.load_scene(cornell_box())
    for _ in range(6):
        r2.render(spp=1, fetch=False)
    assert r2.stats()["rays_total"] == total


def test_frames_per_trace_batched_equals_sequential():
    """frames_per_trace > 1 batches F frames' rays into one trace call but
    keeps the RNG draw schedule and per-frame accumulation order — the
    image matches F=1 to FMA-placement ulps (the traced shape changes, so
    XLA fuses differently; pipeline.render_chunk docstring) and the ray
    counters match exactly (identical draw/termination schedule here)."""
    ref = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=8))
    ref.load_scene(cornell_box())
    a = ref.render(spp=8)
    for fpt in (2, 4, 8):
        r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=8,
                                  frames_per_trace=fpt))
        r.load_scene(cornell_box())
        b = r.render(spp=8)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        assert r.stats()["rays_total"] == ref.stats()["rays_total"]


def test_frames_per_trace_gcd_tail():
    """spp that a chunk's frames_per_trace does not divide must still
    render exactly (the renderer clamps F per chunk with gcd)."""
    ref = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=4))
    ref.load_scene(cornell_box())
    a = ref.render(spp=6)  # chunks 4 + 2
    r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=4,
                              frames_per_trace=4))
    r.load_scene(cornell_box())
    b = r.render(spp=6)  # chunk 4 (F=4) + chunk 2 (F=gcd(4,2)=2)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert r.frame_index == 6
