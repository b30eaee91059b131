"""In-place partial sort — parity with src/utils/arr.ts:1-109.

The reference's BVH builder sorts the [start, end) sub-range of the triangle
array along the split axis with a hand-rolled iterative quicksort
(sortArrayPartially; its only unit test, src/spec/arr.test.ts). Our hot path
(accel/bvh.py) sorts index permutations with NumPy instead; this function
keeps the reference's exact API surface (including the invalid-index throw)
for host-side tooling and parity tests.
"""

from __future__ import annotations


def sort_array_partially(arr, start: int, end: int, compare=None) -> None:
    """Sort arr[start:end) in place. ``compare(a, b)`` returns <0/0/>0 like a
    JS comparator. Raises ValueError on invalid indices (arr.ts:7-10)."""
    if start < 0 or end > len(arr) or start >= end:
        raise ValueError(f"Invalid indices: start={start}, end={end}")
    if compare is None:
        segment = sorted(arr[start:end])
    else:
        import functools

        segment = sorted(arr[start:end], key=functools.cmp_to_key(compare))
    arr[start:end] = segment
