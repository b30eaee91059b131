"""Fast row fetches for the shading path.

XLA's dynamic gather inside a fused loop runs at ~10 GB/s effective on TPU
(measured: ~1 ms for a (262144, 10) fetch — it dominates the whole bounce).
For the small tables a renderer actually indexes per bounce (triangles,
materials, lights), a one-hot f32 matmul on the MXU is an order of magnitude
faster AND exact: the one-hot entries are 0/1, so the bf16x3-decomposed f32
matmul reproduces each selected row bit-exactly.

``fetch_rows`` picks one-hot for tables up to ``max_onehot`` rows and falls
back to the native gather beyond that (where O(N·T) one-hot work would
explode — large scenes use the traversal path whose tables are handled
separately).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ONEHOT_MAX_ROWS = 4096


def fetch_rows(table: jnp.ndarray, idx: jnp.ndarray, max_onehot: int = ONEHOT_MAX_ROWS):
    """table: (T, K) f32; idx: (N,) int32 in [0, T). Returns (N, K) f32."""
    t = table.shape[0]
    if t <= max_onehot:
        onehot = (
            idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :]
        ).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot,
            table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return table[idx]
