"""Tonemap chain tests (blit.wgsl:43-155 semantics)."""

import numpy as np
import jax.numpy as jnp

from wgpu_path_tracing_tpu.ops import tonemap


def test_black_maps_to_black_through_display_path():
    # The raw chain yields NaN for pure black (agx sigmoid dips to -0.00232
    # and pow(negative, 2.2) is NaN — faithful to blit.wgsl's undefined-pow);
    # the display path (utils/image.py) clamps exactly like a GPU canvas.
    from wgpu_path_tracing_tpu.utils.image import buffer_to_srgb

    img = buffer_to_srgb(np.zeros((4, 3), np.float32), 2, 2)
    assert img.shape == (2, 2, 3)
    assert np.max(img) < 0.02


def test_monotonic_on_gray_axis():
    # Start strictly above 0 — exact black produces NaN (see the black test).
    levels = jnp.linspace(0.01, 8.0, 64)[:, None] * jnp.ones((1, 3))
    out = np.asarray(tonemap.tone_mapping(levels))
    luma = out.mean(axis=1)
    assert np.isfinite(luma).all()
    assert np.all(np.diff(luma) > -1e-6), "tonemap must be monotone in exposure"
    # Bounded display range
    assert out.min() > -0.05 and out.max() < 1.05


def test_exposure_doubles_brightness_pre_tonemap():
    c = jnp.array([[0.2, 0.2, 0.2]])
    lo = np.asarray(tonemap.tone_mapping(c, exposure=0.0)).mean()
    hi = np.asarray(tonemap.tone_mapping(c, exposure=1.0)).mean()
    assert hi > lo


def test_agx_matrices_roundtrip():
    # inset then outset should approximately invert each other.
    v = np.random.default_rng(0).uniform(0.05, 1.0, (16, 3)).astype(np.float32)
    inset = v @ np.asarray(tonemap._AGX_MAT).T
    outset = inset @ np.asarray(tonemap._AGX_MAT_INV).T
    np.testing.assert_allclose(outset, v, atol=1e-4)


def test_gamma_correct():
    out = np.asarray(tonemap.gamma_correct(jnp.array([[0.5, 0.25, 1.0]])))
    np.testing.assert_allclose(
        out, [[0.5 ** (1 / 2.2), 0.25 ** (1 / 2.2), 1.0]], rtol=1e-5
    )


def test_aces_variant_bounded():
    out = np.asarray(tonemap.aces_tone_map(jnp.array([[10.0, 1.0, 0.1]])))
    assert out.min() >= 0.0 and out.max() <= 1.0
