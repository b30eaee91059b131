"""Headless controller (controller.ts semantics) and async loading."""

import math
import os

import numpy as np
import pytest

from wgpu_path_tracing_tpu import Renderer, RenderConfig, cornell_box
from wgpu_path_tracing_tpu.render.controller import Controller

MODELS = "/root/reference/public/models"


@pytest.fixture()
def renderer():
    r = Renderer(RenderConfig(width=8, height=8, frames_per_chunk=2))
    r.load_scene(cornell_box())
    return r


def test_wasd_translation(renderer):
    c = Controller(renderer)
    start = renderer.camera.position.copy()
    c.key_down("w")
    c.update(0.5)  # 2.0 units/s * 0.5 s forward
    np.testing.assert_allclose(
        renderer.camera.position, start + np.array([0, 0, -1.0]), atol=1e-6
    )
    c.key_up("w")
    c.key_down("d")
    c.update(0.25)  # right 0.5
    np.testing.assert_allclose(
        renderer.camera.position,
        start + np.array([0.5, 0, -1.0]),
        atol=1e-6,
    )


def test_vertical_and_shift(renderer):
    c = Controller(renderer)
    start = renderer.camera.position.copy()
    c.key_down(" ")
    c.update(1.0)
    c.key_up(" ")
    c.key_down("Shift")
    c.update(0.5)
    np.testing.assert_allclose(
        renderer.camera.position, start + np.array([0, 1.0, 0]), atol=1e-6
    )


def test_mouse_look_resets_accumulation(renderer):
    renderer.render(spp=2)
    assert renderer.frame_index == 2
    c = Controller(renderer)
    c.mouse_move(10.0, 0.0)
    c.update(0.1)
    # yaw = 10 * -pi/18 * 0.1 (controller.ts:163-166)
    expected_yaw = 10 * -(math.pi / 18) * 0.1
    assert renderer.frame_index == 0
    # rotating (0,0,-1) about +Y by yaw: x' = -sin(yaw)
    np.testing.assert_allclose(
        renderer.camera.forward[0], -math.sin(expected_yaw), atol=1e-5
    )
    # deltas were consumed
    c.update(0.1)
    assert renderer.frame_index == 0


def test_pinch_dolly(renderer):
    """Two-finger pinch (controller.ts:85-101): delta-distance * 0.001
    dollies forward immediately, outside the per-frame update."""
    c = Controller(renderer)
    start = renderer.camera.position.copy()
    renderer.render(spp=2)
    c.pinch(500.0)  # fingers spread 500 px -> 0.5 units forward
    np.testing.assert_allclose(
        renderer.camera.position, start + np.array([0, 0, -0.5]), atol=1e-6
    )
    assert renderer.frame_index == 0  # motion reset accumulation
    c.pinch(0.0)  # no-op: must not reset again after a render
    renderer.render(spp=2)
    c.pinch(0.0)
    assert renderer.frame_index == 2
    # one-finger touch feeds the same path as the mouse
    c.touch_move(10.0, 0.0)
    c.update(0.1)
    assert renderer.frame_index == 0


@pytest.mark.skipif(not os.path.exists(MODELS), reason="reference models absent")
def test_load_model_async():
    r = Renderer(RenderConfig(width=8, height=8, frames_per_chunk=2))
    fut = r.load_model_async(f"{MODELS}/transform.glb")
    scene = fut.result(timeout=120)
    assert scene.num_triangles == 40
    # The background thread only STAGES the scene (no install race with a
    # concurrent render); it is installed at the next chunk boundary /
    # explicit poll.
    assert r.scene is not scene
    assert r.poll_pending_scene()
    assert r.scene is scene
    assert not r.poll_pending_scene()


def test_http_viewer_drives_controller():
    """The HTTP live viewer (viewer.py): frames served, key/drag input moves
    the camera and resets accumulation — the reference's browser loop
    (App.tsx + controller.ts) end to end, headlessly."""
    import json
    import urllib.request

    from wgpu_path_tracing_tpu.viewer import ViewerServer

    r = Renderer(RenderConfig(width=16, height=16, frames_per_chunk=2))
    r.load_scene(cornell_box())
    server = ViewerServer(r, port=0, frames_per_update=2)
    try:
        base = f"http://127.0.0.1:{server.port}"
        server.step(1 / 60)  # one tick -> a frame exists
        png = urllib.request.urlopen(f"{base}/frame.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"
        html = urllib.request.urlopen(base, timeout=10).read()
        assert b"frame.png" in html
        stats = json.loads(
            urllib.request.urlopen(f"{base}/stats", timeout=10).read()
        )
        assert stats["spp"] == 2

        pos0 = r.camera.position.copy()
        urllib.request.urlopen(f"{base}/key?k=w&down=1", timeout=10).read()
        server.step(0.5)  # apply input + render
        urllib.request.urlopen(f"{base}/key?k=w&down=0", timeout=10).read()
        assert not np.allclose(r.camera.position, pos0)  # flew forward
        assert r.frame_index == 2  # motion reset, then one tick of 2 spp

        urllib.request.urlopen(f"{base}/look?dx=30&dy=0", timeout=10).read()
        fwd0 = r.camera.forward.copy()
        server.step(1 / 60)
        assert not np.allclose(r.camera.forward, fwd0)  # looked around

        pos1 = r.camera.position.copy()
        urllib.request.urlopen(f"{base}/pinch?d=500", timeout=10).read()
        server.step(1 / 60)  # wheel/pinch dolly
        assert not np.allclose(r.camera.position, pos1)

        # Denoised-preview toggle: filters the snapshot copy only —
        # accumulation (and therefore stats/convergence) stays raw.
        urllib.request.urlopen(f"{base}/denoise?on=1", timeout=10).read()
        assert server.denoise
        fi = r.frame_index
        server.step(1 / 60)
        png = urllib.request.urlopen(f"{base}/frame.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"
        assert r.frame_index == fi + 2  # accumulation advanced normally
        urllib.request.urlopen(f"{base}/denoise?on=0", timeout=10).read()
        assert not server.denoise
    finally:
        server.stop()


@pytest.mark.skipif(not os.path.exists(MODELS), reason="reference models absent")
def test_http_viewer_scene_swap():
    """Runtime scene swap on a RUNNING viewer — the reference's drag-drop
    flow (App.tsx:12-34 -> loader.ts:19-46): POST /load with a path, then
    with raw .glb bytes; both install at the next chunk boundary."""
    import urllib.request

    from wgpu_path_tracing_tpu.viewer import ViewerServer

    r = Renderer(RenderConfig(width=8, height=8, frames_per_chunk=2))
    r.load_scene(cornell_box())
    n_cornell = r.scene.num_triangles
    server = ViewerServer(r, port=0, frames_per_update=2)
    try:
        base = f"http://127.0.0.1:{server.port}"
        server.step(1 / 60)
        # path-based swap
        req = urllib.request.Request(
            f"{base}/load?path={MODELS}/transform.glb", method="POST"
        )
        assert urllib.request.urlopen(req, timeout=30).read() == b"staged"
        deadline = 30.0
        import time as T
        t0 = T.perf_counter()
        while r._pending_scene is None and T.perf_counter() - t0 < deadline:
            T.sleep(0.05)
        server.step(1 / 60)  # render tick installs the staged scene
        assert r.scene.num_triangles == 40  # transform.glb
        # bytes-based swap (the browser drop handler posts the file body)
        import glob
        import os as OS
        import tempfile
        tmp_glbs_before = set(
            glob.glob(OS.path.join(tempfile.gettempdir(), "*.glb"))
        )
        with open(f"{MODELS}/transform.glb", "rb") as f:
            body = f.read()
        req = urllib.request.Request(f"{base}/load", data=body, method="POST")
        assert urllib.request.urlopen(req, timeout=30).read() == b"staged"
        t0 = T.perf_counter()
        while r._pending_scene is None and T.perf_counter() - t0 < deadline:
            T.sleep(0.05)
        assert r._pending_scene is not None
        server.step(1 / 60)
        assert r.scene.num_triangles == 40
        assert n_cornell != 40  # the swap actually changed the scene
        # The upload's temp copy is unlinked once the load settles (the
        # done-callback may lag the staging by a beat — poll briefly).
        t0 = T.perf_counter()
        while T.perf_counter() - t0 < deadline:
            leaked = set(
                glob.glob(OS.path.join(tempfile.gettempdir(), "*.glb"))
            ) - tmp_glbs_before
            if not leaked:
                break
            T.sleep(0.05)
        assert not leaked, f"upload temp files not cleaned up: {leaked}"
        # bad request: neither path nor body
        req = urllib.request.Request(f"{base}/load", method="POST")
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.stop()
