"""Denoiser tests (ops/denoise.py) — the opt-in à-trous extension.

The reference has no denoiser; these tests pin the filter's contract:
constant signals pass through exactly, flat-region noise drops by a
large factor, guide edges (normal/albedo/segment) survive, and the
default Renderer output path stays bit-identical with the module loaded.
"""

from __future__ import annotations

import numpy as np
import pytest

from wgpu_path_tracing_tpu.ops import denoise as DN


def _flat_guides(h, w, found=True):
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    depth = np.ones((h, w), np.float32)
    fnd = np.full((h, w), found, bool)
    return normal, depth, fnd


def test_constant_preserved():
    h = w = 32
    color = np.full((h, w, 3), 0.37, np.float32)
    normal, depth, fnd = _flat_guides(h, w)
    out = np.asarray(DN.atrous_filter(color, normal, depth, fnd))
    np.testing.assert_allclose(out, color, atol=1e-5)


def test_flat_noise_reduced():
    h = w = 64
    rng = np.random.default_rng(7)
    truth = np.full((h, w, 3), 0.5, np.float32)
    noisy = truth + rng.normal(0, 0.2, truth.shape).astype(np.float32)
    normal, depth, fnd = _flat_guides(h, w)
    out = np.asarray(DN.atrous_filter(noisy, normal, depth, fnd))
    rmse_in = float(np.sqrt(np.mean((noisy - truth) ** 2)))
    rmse_out = float(np.sqrt(np.mean((out - truth) ** 2)))
    assert rmse_out < rmse_in / 3.0, (rmse_in, rmse_out)


def test_normal_edge_preserved():
    h = w = 64
    rng = np.random.default_rng(3)
    truth = np.zeros((h, w, 3), np.float32)
    truth[:, : w // 2] = 1.0
    truth[:, w // 2:] = 0.1
    noisy = truth + rng.normal(0, 0.1, truth.shape).astype(np.float32)
    normal, depth, fnd = _flat_guides(h, w)
    normal[:, w // 2:] = [1.0, 0.0, 0.0]  # different plane on the right
    out = np.asarray(DN.atrous_filter(noisy, normal, depth, fnd))
    # Each half converges toward its own mean — no cross-edge bleed.
    left = out[:, : w // 2].mean(axis=(0, 1))
    right = out[:, w // 2:].mean(axis=(0, 1))
    assert np.all(np.abs(left - 1.0) < 0.05), left
    assert np.all(np.abs(right - 0.1) < 0.05), right
    # The two boundary columns stay on their side of the edge.
    assert out[:, w // 2 - 1].mean() > 0.8
    assert out[:, w // 2].mean() < 0.3


def test_miss_segment_isolated():
    h = w = 32
    rng = np.random.default_rng(11)
    color = np.zeros((h, w, 3), np.float32)
    color[: h // 2] = 0.5 + rng.normal(0, 0.2, (h // 2, w, 3)).astype(
        np.float32)
    normal, depth, fnd = _flat_guides(h, w)
    fnd[h // 2:] = False  # bottom half = misses, black (parity: no env)
    normal[h // 2:] = 0.0
    depth[h // 2:] = 0.0
    out = np.asarray(DN.atrous_filter(color, normal, depth, fnd))
    # Hit noise never leaks into the miss segment.
    np.testing.assert_allclose(out[h // 2:], 0.0, atol=1e-7)
    assert abs(out[: h // 2].mean() - 0.5) < 0.05


def test_demodulation_keeps_texture():
    h = w = 64
    rng = np.random.default_rng(5)
    # Checkerboard albedo, flat illumination — texture must survive
    # filtering because it rides the guide, not the signal.
    yy, xx = np.mgrid[:h, :w]
    checker = np.where(((yy // 8 + xx // 8) % 2) == 0, 0.8, 0.2).astype(
        np.float32)
    albedo = np.repeat(checker[..., None], 3, axis=-1)
    illum = np.full((h, w, 3), 0.6, np.float32)
    noisy = albedo * (illum + rng.normal(0, 0.15, illum.shape).astype(
        np.float32))
    normal, depth, fnd = _flat_guides(h, w)
    aovs = {
        "albedo": albedo.reshape(-1, 3),
        "normal": normal.reshape(-1, 3),
        "depth": depth.reshape(-1),
        "found": fnd.reshape(-1),
    }
    out = DN.denoise_image(noisy, aovs)
    truth = albedo * illum
    rmse_in = float(np.sqrt(np.mean((noisy - truth) ** 2)))
    rmse_out = float(np.sqrt(np.mean((out - truth) ** 2)))
    assert rmse_out < rmse_in / 2.5, (rmse_in, rmse_out)
    # The checker contrast itself is intact (edge rows differ sharply).
    hi = out[4, 4].mean()
    lo = out[4, 12].mean()
    assert hi / max(lo, 1e-6) > 3.0, (hi, lo)


@pytest.fixture(scope="module")
def cornell_renderer():
    from wgpu_path_tracing_tpu import Renderer, RenderConfig
    from wgpu_path_tracing_tpu.models.procedural import cornell_box

    r = Renderer(RenderConfig(width=32, height=32, frames_per_chunk=2))
    r.load_scene(cornell_box())
    r.render(spp=2, fetch=False)
    return r


def test_renderer_aovs(cornell_renderer):
    r = cornell_renderer
    aovs = r.aovs()
    n = 32 * 32
    assert np.asarray(aovs["albedo"]).shape == (n, 3)
    assert np.asarray(aovs["normal"]).shape == (n, 3)
    assert np.asarray(aovs["depth"]).shape == (n,)
    fnd = np.asarray(aovs["found"])
    assert fnd.shape == (n,) and fnd.mean() > 0.5  # camera inside the box
    # Hit normals are unit; depths positive where found.
    nn = np.linalg.norm(np.asarray(aovs["normal"]), axis=-1)
    np.testing.assert_allclose(nn[fnd], 1.0, atol=1e-3)
    assert (np.asarray(aovs["depth"])[fnd] > 0).all()


def test_renderer_denoise_leaves_default_path_intact(cornell_renderer):
    r = cornell_renderer
    raw_before = r.image()
    dn = r.image(denoise=True)
    assert dn.shape == raw_before.shape
    assert np.isfinite(dn).all()
    # Parity: the default output is bit-identical after denoising ran
    # (the filter works on a copy; accumulation untouched).
    raw_after = r.image()
    np.testing.assert_array_equal(raw_before, raw_after)
    # And the denoised low-spp image is smoother than the raw one:
    # total variation drops.
    tv = lambda im: float(np.abs(np.diff(im, axis=0)).mean()
                          + np.abs(np.diff(im, axis=1)).mean())
    assert tv(dn) < tv(raw_before)


def test_variance_blend_asymptotics():
    """The round-5 raw/filtered mix (DN.variance_blend): on a NOISY
    input whose filtered twin removed the noise, the blend must side
    with the filter (k ~ 0: d^2 ~ sigma^2); on a CONVERGED input whose
    "filter" introduced a systematic bias, it must side with raw
    (sigma^2 ~ 0 while d^2 = bias^2 > 0)."""
    rng = np.random.default_rng(5)
    h = w = 32
    truth = np.full((h, w, 3), 0.5, np.float32)

    # Low-spp regime: raw = truth + noise, filt = truth.
    noisy = truth + rng.normal(0, 0.2, truth.shape).astype(np.float32)
    out = np.asarray(DN.variance_blend(noisy, truth))
    err_blend = float(np.abs(out - truth).mean())
    err_raw = float(np.abs(noisy - truth).mean())
    assert err_blend < 0.25 * err_raw, (err_blend, err_raw)

    # Converged regime: raw = truth (no noise), filt carries a smooth
    # bias — the blend must recover ~raw, not keep the bias.
    yy = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
    biased = truth + 0.1 * yy
    out2 = np.asarray(DN.variance_blend(truth, biased))
    err2 = float(np.abs(out2 - truth).mean())
    assert err2 < 0.02, err2

    # k_cap bounds the raw weight: with cap 0 the output IS the filter.
    out3 = np.asarray(DN.variance_blend(truth, biased, 1.0, 0.0))
    np.testing.assert_allclose(out3, biased, atol=1e-6)
