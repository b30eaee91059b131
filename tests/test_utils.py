"""Utility-layer tests: tiling permutations, image IO, profiler, math."""

import numpy as np

from wgpu_path_tracing_tpu.utils import mathutil
from wgpu_path_tracing_tpu.utils.image import buffer_to_srgb, rmse
from wgpu_path_tracing_tpu.utils.profiler import FrameMeter, PassProfiler
from wgpu_path_tracing_tpu.utils.tiling import inverse_permutation, tile_permutation


def test_tile_permutation_bijective():
    for w, h in [(32, 32), (64, 48), (100, 70), (512, 512), (5, 3)]:
        perm = tile_permutation(w, h)
        assert sorted(perm.tolist()) == list(range(w * h)), (w, h)
        inv = inverse_permutation(perm)
        np.testing.assert_array_equal(perm[inv], np.arange(w * h))


def test_tile_permutation_blocks_are_tiles():
    perm = tile_permutation(64, 64, tile=32)
    # First 1024 entries = the top-left 32x32 tile in row-major order.
    first = perm[:1024]
    ys, xs = first // 64, first % 64
    assert xs.max() < 32 and ys.max() < 32
    assert len(set(zip(ys.tolist(), xs.tolist()))) == 1024


def test_buffer_to_srgb_flips_vertically():
    # Buffer row 0 is the bottom of the view (blit.wgsl:149-151).
    accum = np.zeros((4, 3), np.float32)
    accum[0] = 10.0  # bottom-left texel, bright
    img = buffer_to_srgb(accum, 2, 2)
    assert img[1, 0].sum() > img[0, 0].sum()  # bright lands on the LAST row


def test_rmse():
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.1)
    assert abs(rmse(a, b) - 0.1) < 1e-12
    assert rmse(a, a) == 0.0


def test_pass_profiler_stats():
    p = PassProfiler(window=3)
    for s in (0.010, 0.020, 0.030, 0.040):
        p.add("x", s)
    st = p.stats()["x"]
    assert st["count"] == 3  # rolling window drops the first
    assert abs(st["avg_ms"] - 30.0) < 1e-9
    assert st["min_ms"] == 20.0 and st["max_ms"] == 40.0


def test_frame_meter():
    m = FrameMeter()
    m.tick()
    m.tick()
    st = m.stats()
    assert st["fps"] > 0 and st["frame_ms"] >= 0


def test_mathutil_parity():
    # src/utils/math.ts:1-20 semantics
    assert mathutil.clamp(5, 0, 3) == 3
    assert mathutil.lerp(0.0, 10.0, 0.25) == 2.5
    assert mathutil.smoothstep(0, 1, 0.5) == 0.5
    assert abs(mathutil.to_radians(180) - np.pi) < 1e-12
    assert abs(mathutil.to_degrees(np.pi) - 180) < 1e-12
    np.testing.assert_allclose(
        mathutil.smoothstep(0, 1, np.array([-1.0, 2.0])), [0.0, 1.0]
    )


def test_hdr_roundtrip(tmp_path):
    from wgpu_path_tracing_tpu.utils.image import read_hdr, write_hdr

    rng = np.random.default_rng(7)
    hdr = (rng.uniform(0, 1, (12, 9, 3)).astype(np.float32) ** 2) * 37.0
    hdr[0, 0] = 0.0  # zero-radiance pixel encodes exactly
    p = str(tmp_path / "x.hdr")
    write_hdr(p, hdr)
    back = read_hdr(p)
    assert back.shape == hdr.shape
    # RGBE shares one exponent across channels: error is relative to the
    # per-pixel MAX channel (~1/128), not to each channel.
    maxc = hdr.max(axis=2, keepdims=True)
    assert np.all(np.abs(back - hdr) <= 0.01 * maxc + 1e-4)


def test_exr_rejects_unsupported(tmp_path):
    """read_exr raises ValueError (not assert, which -O strips) naming the
    limitation for non-EXR, compressed, and HALF-channel files."""
    import struct

    import pytest

    from wgpu_path_tracing_tpu.utils.image import read_exr, write_exr

    bad = tmp_path / "not.exr"
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="not an EXR"):
        read_exr(str(bad))

    # Start from a valid file, then flip single header bytes.
    hdr = np.ones((4, 4, 3), np.float32)
    good = tmp_path / "good.exr"
    write_exr(str(good), hdr)
    data = bytearray(good.read_bytes())

    zipped = bytearray(data)
    at = bytes(data).index(b"compression\0compression\0")
    zipped[at + len(b"compression\0compression\0") + 4] = 3  # ZIP_COMPRESSION
    (tmp_path / "zip.exr").write_bytes(bytes(zipped))
    with pytest.raises(ValueError, match="NO_COMPRESSION"):
        read_exr(str(tmp_path / "zip.exr"))

    half = bytearray(data)
    at = bytes(data).index(b"channels\0chlist\0") + len(b"channels\0chlist\0") + 4
    # first channel entry: b"B\0" then int32 pixel type at +2
    half[at + 2] = 1  # HALF
    (tmp_path / "half.exr").write_bytes(bytes(half))
    with pytest.raises(ValueError, match="not FLOAT"):
        read_exr(str(tmp_path / "half.exr"))
