"""Random decimation with static shapes.

Replaces the reference's per-cloud ``randperm``-based decimation
(``pyg_randla_net.py:192-238`` — a serial-over-batch CPU-sync hot spot,
SURVEY.md §3.1) with a fully batched formulation:

- draw uniform noise per point, push pads to -inf;
- ``top_k(noise, N // decimation)`` returns a uniform random subset of the
  valid points, valid-first (pads sort last);
- per-cloud kept count = ``max(1, valid // decimation)`` (clouds are never
  emptied, matching reference ``decimation_indices`` semantics ``:216-218``),
  expressed as a slot mask over the static ``N // decimation`` axis.

The output keeps static shape ``(B, N // decimation)`` so four chained
decimations compile to one XLA program regardless of ragged cloud sizes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("decimation",))
def random_decimation(
    rng: jax.Array,
    mask: jnp.ndarray,          # (B, N) bool
    decimation: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick a random ``1/decimation`` subset of valid points per cloud.

    Returns:
        idx:      (B, N // decimation) int32 indices into the N axis
        new_mask: (B, N // decimation) bool validity of each kept slot
    """
    if decimation < 1:
        raise ValueError(
            "Argument `decimation` should be >= 1 for downsampling. "
            f"(Current value: {decimation})"
        )
    b, n = mask.shape
    n_out = n // decimation
    noise = jax.random.uniform(rng, (b, n), dtype=jnp.float32)
    noise = jnp.where(mask, noise, -jnp.inf)
    _, idx = jax.lax.top_k(noise, n_out)               # valid points first
    valid_counts = jnp.sum(mask, axis=1)               # (B,)
    kept = jnp.maximum(1, valid_counts // decimation)
    kept = jnp.where(valid_counts > 0, kept, 0)
    slot = jnp.arange(n_out, dtype=jnp.int32)[None, :]
    new_mask = slot < kept[:, None]
    # Emit the kept subset in ASCENDING index order (invalid slots pushed
    # past every real index before the sort, then re-zeroed): the sampled
    # SET and its distribution are unchanged — order is semantically
    # irrelevant downstream — but an x-sorted input cloud now stays
    # x-sorted through every decimation stage, which is what lets the
    # windowed Pallas kNN kernels (encoder stages 2-4, decoder k=1
    # upsampling) keep scanning slabs instead of whole key sets
    # (docs/perf_notes.md round 4).
    idx = jnp.sort(jnp.where(new_mask, idx, jnp.int32(n)), axis=1)
    idx = jnp.where(new_mask, idx, 0).astype(jnp.int32)
    return idx, new_mask


def decimate_tensors(tensors, idx: jnp.ndarray):
    """Gather each (B, N, ...) tensor down to (B, N_out, ...) by idx
    (reference ``decimate``, ``pyg_randla_net.py:234-238``)."""
    return tuple(jax.vmap(lambda t, i: t[i])(t, idx) for t in tensors)
