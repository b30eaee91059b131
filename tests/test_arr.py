"""Partial-sort + AABB parity tests — replicating the reference's only unit
test file (src/spec/arr.test.ts:4-44, five cases) plus aabb.ts semantics."""

import numpy as np
import pytest

from wgpu_path_tracing_tpu.utils.aabb import AABB, AXIS_X, AXIS_Y, AXIS_Z
from wgpu_path_tracing_tpu.utils.arr import sort_array_partially


def test_sorts_a_subrange():
    arr = [5, 3, 8, 1, 9, 2, 7]
    sort_array_partially(arr, 1, 5, lambda a, b: a - b)
    assert arr == [5, 1, 3, 8, 9, 2, 7]


def test_handles_duplicates():
    arr = [4, 2, 2, 4, 1, 1]
    sort_array_partially(arr, 0, 6, lambda a, b: a - b)
    assert arr == [1, 1, 2, 2, 4, 4]


def test_single_element_range():
    arr = [3, 1, 2]
    sort_array_partially(arr, 1, 2, lambda a, b: a - b)
    assert arr == [3, 1, 2]


def test_custom_comparator():
    arr = ["bb", "a", "ccc"]
    sort_array_partially(arr, 0, 3, lambda a, b: len(b) - len(a))
    assert arr == ["ccc", "bb", "a"]


def test_invalid_indices_throw():
    with pytest.raises(ValueError):
        sort_array_partially([1, 2, 3], 2, 2, lambda a, b: a - b)
    with pytest.raises(ValueError):
        sort_array_partially([1, 2, 3], -1, 2, lambda a, b: a - b)
    with pytest.raises(ValueError):
        sort_array_partially([1, 2, 3], 0, 4, lambda a, b: a - b)


def test_aabb_merge_expand_area_axis():
    a = AABB([0, 0, 0], [1, 2, 3])
    b = AABB([-1, 1, 0], [0.5, 3, 1])
    m = a.merge(b)
    np.testing.assert_array_equal(m.min, [-1, 0, 0])
    np.testing.assert_array_equal(m.max, [1, 3, 3])
    a.expand([5, -5, 0])
    np.testing.assert_array_equal(a.min, [0, -5, 0])
    np.testing.assert_array_equal(a.max, [5, 2, 3])
    box = AABB([0, 0, 0], [2, 3, 4])
    assert box.surface_area() == 2 * (2 * 3 + 3 * 4 + 4 * 2)
    assert box.max_extent_axis() == AXIS_Z
    assert AABB([0, 0, 0], [5, 1, 1]).max_extent_axis() == AXIS_X
    assert AABB([0, 0, 0], [1, 5, 1]).max_extent_axis() == AXIS_Y
    # ties fall through to Z (aabb.ts:52-66)
    assert AABB([0, 0, 0], [1, 1, 1]).max_extent_axis() == AXIS_Z
