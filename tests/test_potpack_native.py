"""Native potpack twin (accel/cbvh/potpack.cpp) is bit-identical to the
Python packer (models/gltf.py::potpack_python) — same x/y per box, same
canvas dims, int-ness preserved for the fat atlas's integer grids."""

import copy
import random

import numpy as np
import pytest

from wgpu_path_tracing_tpu.accel.native import native_available, potpack_native
from wgpu_path_tracing_tpu.models.gltf import potpack, potpack_python

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def _run_both(boxes):
    py_boxes = copy.deepcopy(boxes)
    py_dims = potpack_python(py_boxes)
    nat_boxes = copy.deepcopy(boxes)
    nat_dims = potpack(nat_boxes)
    return py_boxes, py_dims, nat_boxes, nat_dims


def _assert_identical(py_boxes, py_dims, nat_boxes, nat_dims, int_types):
    assert py_dims == nat_dims
    for pb, nb in zip(py_boxes, nat_boxes):
        assert pb["x"] == nb["x"] and pb["y"] == nb["y"], (pb, nb)
        if int_types:
            assert isinstance(nb["x"], int) and isinstance(nb["y"], int)
    if int_types:
        assert isinstance(nat_dims[0], int) and isinstance(nat_dims[1], int)


def test_int_boxes_random():
    rng = random.Random(7)
    for trial in range(20):
        n = rng.randrange(1, 40)
        boxes = [
            {"w": rng.randrange(1, 300), "h": rng.randrange(1, 300),
             "x": 0, "y": 0, "tag": i}
            for i in range(n)
        ]
        out = _run_both(boxes)
        _assert_identical(*out, int_types=True)
        # Extra keys survive the dispatcher untouched.
        assert [b["tag"] for b in out[2]] == list(range(n))


def test_float_boxes_half_texel_dims():
    # build_atlas feeds w*0.5 dims — fractional coords must match too.
    rng = random.Random(11)
    for trial in range(10):
        n = rng.randrange(1, 30)
        boxes = [
            {"w": rng.randrange(1, 500) * 0.5, "h": rng.randrange(1, 500) * 0.5,
             "x": 0, "y": 0}
            for _ in range(n)
        ]
        py_boxes, py_dims, nat_boxes, nat_dims = _run_both(boxes)
        assert py_dims == nat_dims
        for pb, nb in zip(py_boxes, nat_boxes):
            assert pb["x"] == nb["x"] and pb["y"] == nb["y"]


def test_duplicate_heights_stable_order():
    # Equal heights keep list order (stable sort) — positions must agree.
    boxes = [{"w": w, "h": 16, "x": 0, "y": 0} for w in (8, 32, 8, 16, 32, 8)]
    out = _run_both(boxes)
    _assert_identical(*out, int_types=True)


def test_single_and_degenerate():
    out = _run_both([{"w": 64, "h": 64, "x": 0, "y": 0}])
    _assert_identical(*out, int_types=True)
    # A box wider than start_width still packs (max_width clamp).
    out = _run_both(
        [{"w": 512, "h": 2, "x": 0, "y": 0}, {"w": 2, "h": 2, "x": 0, "y": 0}]
    )
    _assert_identical(*out, int_types=True)


def test_native_raw_wrapper_matches_python():
    boxes = [{"w": 30, "h": 40, "x": 0, "y": 0} for _ in range(5)]
    py_boxes = copy.deepcopy(boxes)
    pw, ph = potpack_python(py_boxes)
    xy, w, h = potpack_native(np.array([[b["w"], b["h"]] for b in boxes],
                                       np.float64))
    assert (w, h) == (pw, ph)
    got = [(float(x), float(y)) for x, y in xy]
    want = [(float(b["x"]), float(b["y"])) for b in py_boxes]
    assert got == want
