"""Golden-image regression: the CPU render of the built-in Cornell box must
stay within Monte-Carlo-free tolerance of a committed fixture.

This is the framework's stand-in for the reference's committed sample renders
(docs/img/cornell_*.png, README.md:9-11; the cornell.glb that produced them
is stripped from the mirror, SURVEY.md §4) — same idea: any change to
sampling, shading, accumulation, or tonemapping shows up as image drift.
"""

import os

import numpy as np

from wgpu_path_tracing_tpu import Renderer, RenderConfig, cornell_box
from wgpu_path_tracing_tpu.utils.image import read_png, rmse

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def test_cornell_golden_hdr_buffer():
    r = Renderer(RenderConfig(width=48, height=48, frames_per_chunk=8))
    r.load_scene(cornell_box())
    buf = r.render(spp=8)
    golden = np.load(os.path.join(GOLDEN_DIR, "cornell_48x48_8spp.npz"))["accum"]
    # Same seeds, same math: only compiler reassociation drift is allowed.
    np.testing.assert_allclose(buf, golden, rtol=5e-4, atol=5e-4)


def test_cornell_golden_display_png():
    r = Renderer(RenderConfig(width=48, height=48, frames_per_chunk=8))
    r.load_scene(cornell_box())
    r.render(spp=8)
    img = r.image()
    golden = read_png(os.path.join(GOLDEN_DIR, "cornell_48x48_8spp.png"))
    assert rmse(img, golden) < 2.0 / 255.0
