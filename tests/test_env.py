"""Environment-lighting extension (ops/env.py).

The reference renders miss -> black with no environment map
(pt.wgsl:646-649); that stays the default and is bit-preserved (the 1x1
placeholder takes the identical traced path). With a map installed, rays
that leave the scene pick up the equirect radiance on their first miss.
"""

import numpy as np
import pytest

from wgpu_path_tracing_tpu import Renderer, RenderConfig, cornell_box
from wgpu_path_tracing_tpu.models.procedural import material_test_box
from wgpu_path_tracing_tpu.ops.env import load_env_image, make_env_sampler


def _gradient_env(h=8, w=16):
    env = np.zeros((h, w, 3), np.float32)
    env[: h // 2] = [0.2, 0.4, 1.0]  # upper hemisphere: sky blue
    env[h // 2 :] = [0.1, 0.05, 0.0]  # lower: dark ground
    return env


def test_env_sampler_directions():
    import jax.numpy as jnp

    from wgpu_path_tracing_tpu.ops.vec import V3

    env = _gradient_env()
    sample = make_env_sampler(jnp.asarray(env), jnp.asarray([2.0, 0.0]))
    up = sample(V3(jnp.zeros(4), jnp.ones(4), jnp.zeros(4)))
    np.testing.assert_allclose(np.asarray(up.z), 2.0)  # 1.0 blue * 2.0
    down = sample(V3(jnp.zeros(4), -jnp.ones(4), jnp.zeros(4)))
    np.testing.assert_allclose(np.asarray(down.x), 0.2)  # ground * 2


def test_env_disabled_is_parity():
    """The 1x1 placeholder must trace the identical path: same radiance."""
    r = Renderer(RenderConfig(width=24, height=24, frames_per_chunk=2,
                              max_bounces=3))
    r.load_scene(cornell_box())
    a = np.array(r.render(spp=2))
    r.set_environment(None)  # explicit clear of the placeholder
    r.reset()
    b = np.array(r.render(spp=2))
    np.testing.assert_array_equal(a, b)


def test_env_fills_misses():
    """An open scene: the same RNG paths with an env map installed gain
    radiance on every escaping ray and lose none anywhere."""
    r = Renderer(RenderConfig(width=24, height=24, frames_per_chunk=2,
                              max_bounces=2, do_mis=False))
    r.load_scene(material_test_box())  # open scene: many escaping rays
    base = np.array(r.render(spp=2))
    r.set_environment(_gradient_env(), intensity=1.0)  # resets accum
    lit = np.array(r.render(spp=2))  # same frame indices -> same paths
    assert (lit + 1e-5 >= base).all()
    assert lit.sum() > base.sum() + 1.0


def test_env_image_loaders(tmp_path):
    env = _gradient_env()
    from wgpu_path_tracing_tpu.utils.image import write_hdr

    p = str(tmp_path / "e.hdr")
    write_hdr(p, env)
    back = load_env_image(p)
    assert back.shape == env.shape
    np.testing.assert_allclose(back, env, rtol=0.02, atol=1e-3)
    np.testing.assert_array_equal(load_env_image(env), env)
