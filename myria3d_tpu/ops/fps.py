"""Masked farthest-point sampling with static output shape.

TPU-native FPS for the PointNet++ family (BASELINE config #4 — the
reference's MODEL_ZOO extension point, ``myria3d/models/model.py:12-29``;
its docs frame RandLA-Net as "a PointNet++ like encoder-decoder",
``docs/source/background/general_design.md:20``).

Formulation: ``lax.scan`` over the M output slots; the carry holds the
running min-distance-to-selected per point. Pads carry -1 so they are never
argmax'd while any valid point remains; output slots beyond the valid count
are masked. All ops are (B, N) vector ops — no data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


@functools.partial(jax.jit, static_argnames=("m",))
def farthest_point_sampling(
    pos: jnp.ndarray,    # (B, N, 3)
    mask: jnp.ndarray,   # (B, N) bool
    m: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select ``m`` spread-out valid points per cloud.

    Returns:
        idx:      (B, M) int32 indices into the N axis (deterministic:
                  starts from the first valid point)
        new_mask: (B, M) bool — slot validity (< valid point count)
    """
    b, n, _ = pos.shape
    first = jnp.argmax(mask, axis=1).astype(jnp.int32)          # (B,)
    start_mind = jnp.where(mask, _INF, -1.0)

    def body(carry, _):
        mind, last = carry
        lastpos = jnp.take_along_axis(pos, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((pos - lastpos) ** 2, axis=-1)               # (B, N)
        mind = jnp.minimum(mind, jnp.where(mask, d, -1.0))
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)
        return (mind, nxt), last

    (_, _), idx = jax.lax.scan(body, (start_mind, first), None, length=m)
    idx = jnp.swapaxes(idx, 0, 1)                                # (B, M)

    valid_counts = jnp.sum(mask, axis=1)                         # (B,)
    slot = jnp.arange(m, dtype=jnp.int32)[None, :]
    new_mask = slot < jnp.minimum(valid_counts, m)[:, None]
    idx = jnp.where(new_mask, idx, 0)
    return idx, new_mask
