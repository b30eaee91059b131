"""RNG parity: the vectorized PCG must bit-match the scalar oracle
(and therefore random.wgsl's semantics, random.wgsl:1-16)."""

import numpy as np
import jax.numpy as jnp

from wgpu_path_tracing_tpu.ops import rng as RNG
from tests.oracle import Rng


def test_rand_stream_matches_oracle():
    seeds = np.array([0, 1, 7, 999, 123456, 2**31, 2**32 - 1, 42424242], np.uint32)
    state = jnp.asarray(seeds)
    oracles = []
    for s in seeds:
        o = Rng()
        o.state = np.uint32(s)
        oracles.append(o)

    for _ in range(64):
        vals, state = RNG.rand(state)
        expected = np.array([o.rand() for o in oracles], np.float32)
        np.testing.assert_array_equal(np.asarray(vals), expected)
        np.testing.assert_array_equal(
            np.asarray(state), np.array([o.state for o in oracles], np.uint32)
        )


def test_seed_pixel():
    x = jnp.array([0, 5, 999, 511], jnp.int32)
    y = jnp.array([0, 3, 999, 511], jnp.int32)
    s = RNG.seed_pixel(x, y, jnp.int32(7))
    expected = np.uint32(np.asarray(x)) + np.uint32(np.asarray(y)) * np.uint32(
        1000
    ) + np.uint32(7 * 100000)
    np.testing.assert_array_equal(np.asarray(s), expected)


def test_rand_masked_advances_only_masked_lanes():
    state = jnp.array([1, 2, 3, 4], jnp.uint32)
    mask = jnp.array([True, False, True, False])
    _, new_state = RNG.rand(state, mask)
    ns = np.asarray(new_state)
    assert ns[1] == 2 and ns[3] == 4
    assert ns[0] != 1 and ns[2] != 3


def test_rand_int_range_and_values():
    state = jnp.arange(1000, dtype=jnp.uint32)
    idx, _ = RNG.rand_int(state, 0, 4)
    vals = np.asarray(idx)
    assert vals.min() >= 0 and vals.max() <= 4

    # Exact parity with the oracle's randInt
    o = Rng()
    o.state = np.uint32(77)
    expected = o.rand_int(0, 4)
    got, _ = RNG.rand_int(jnp.array([77], jnp.uint32), 0, 4)
    assert int(got[0]) == expected


def test_rand_distribution_roughly_uniform():
    state = jnp.arange(200_000, dtype=jnp.uint32) * jnp.uint32(2654435761)
    vals, _ = RNG.rand(state)
    v = np.asarray(vals)
    hist, _ = np.histogram(v, bins=16, range=(0, 1))
    # Each bin should hold ~1/16 of the mass within a few percent.
    assert np.all(np.abs(hist / len(v) - 1 / 16) < 0.01)
