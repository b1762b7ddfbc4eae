"""Fused nearest-neighbor (k=1) search on the shared Pallas binned kernel.

The RandLA-Net decoder upsamples with k=1 kNN-interpolation four times per
forward (reference ``FPModule``, ``pyg_randla_net.py:241-253``); at
production shapes the largest call (12k queries <- 3k keys, B=16) costs
~30 ms through the generic approx_min_k path because the (Nq, Nk) distance
tile round-trips HBM. The search runs on ``ops.pallas_knn``'s fused kernel
with k=1 (exact — see ``nearest_neighbor_pallas``); this module keeps the
centering/augment preamble and the availability gate that the sharded
predict path toggles per shard.

Masking follows the 4th-coordinate convention of ``ops.knn``: pad keys sit
1e4 away on the w axis, so no elementwise masking enters the kernel.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from myria3d_tpu.ops.knn import _augment_keys, _augment_queries

# 256 matches the shared kernel's default: at 512 the windowed k=1
# variant with single-pass extraction stack-allocates a full cloud's
# double-buffered (Nq, 16) output pair in scoped VMEM (21.8 MB — compile
# OOM); at 256 it compiles and runs 36.7 ms vs 60.4 ms at the 40k
# decoder shape (docs/perf_notes.md round 4 cont.).
TILE_Q = 256


@functools.partial(jax.jit, static_argnames=("interpret", "window"))
def nearest_neighbor_pallas(
    query_pos: jnp.ndarray,   # (B, Nq, 3)
    key_pos: jnp.ndarray,     # (B, Nk, 3)
    key_mask: jnp.ndarray,    # (B, Nk) bool
    interpret: bool = False,
    window: int = 0,
    query_mask: jnp.ndarray = None,   # (B, Nq) bool — window-bases guard
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cloud nearest valid key for every query.

    Returns (idx (B, Nq) int32, d2 (B, Nq) f32); queries in clouds with no
    valid key get d2 >= the pad threshold (caller masks them).

    Delegates to the shared binned kernel (``pallas_knn``) with k=1, where
    binning is EXACT: every key lands in some bin, so the global minimum
    always survives the per-bin running minima — no collision loss. The
    VPU difference-score variant there also replaced this module's original
    contraction-4 dot_general (3% MXU utilization at HIGHEST precision).
    The custom_jvp zero-tangent declaration lives on the shared kernel.
    """
    b, nq, _ = query_pos.shape
    # Same per-cloud centering as ops.knn: georeferenced magnitudes would
    # otherwise cancel catastrophically in the f32 norm expansion.
    cnt = jnp.maximum(jnp.sum(key_mask, axis=1), 1)
    offset = (
        jnp.sum(jnp.where(key_mask[..., None], key_pos, 0.0), axis=1)
        / cnt[..., None].astype(key_pos.dtype)
    )[:, None, :]
    q4 = _augment_queries(query_pos - offset)
    k4 = _augment_keys(key_pos - offset, key_mask)
    from myria3d_tpu.ops.pallas_knn import knn_topk_pallas

    # ``window > 0`` requires BOTH clouds x-sorted (order-preserving
    # decimation keeps every encoder stage sorted, so the decoder's k=1
    # upsampling searches qualify): the kernel scans only ~window sorted
    # key positions per query tile. k=1 stays exact WITHIN the window
    # (binning never loses a global minimum) — packed=False keeps that
    # contract strict (packed selection could swap 2^-11 distance ties,
    # and at k_real=1 it saves only a single reduction anyway).
    idx, d2 = knn_topk_pallas(
        q4, k4, 1, tile_q=TILE_Q, interpret=interpret, window=window,
        query_mask=query_mask, packed=False,
    )
    return idx[:, :, 0], d2[:, :, 0]


# Tracing-time override: inside a shard_map-wrapped step every device runs
# the kernel on its local shard, so the single-chip gate below must not
# disable it (set by myria3d_tpu.parallel.sharded_interp_step).
_PER_SHARD_TRACING = False


@contextlib.contextmanager
def per_shard_context():
    """Mark that tracing happens per device (inside shard_map)."""
    global _PER_SHARD_TRACING
    prev = _PER_SHARD_TRACING
    _PER_SHARD_TRACING = True
    try:
        yield
    finally:
        _PER_SHARD_TRACING = prev


def nn1_available() -> bool:
    """Use the Pallas kernel on TPU when each program instance owns its
    whole (local) batch: single chip, or per-shard inside shard_map. Under
    plain GSPMD jit over a multi-chip mesh the dense path partitions
    cleanly while a vmapped pallas_call may not, so it stays off there.
    CPU/GPU always use the dense path."""
    try:
        if jax.default_backend() != "tpu":
            return False
        return _PER_SHARD_TRACING or jax.device_count() == 1
    except Exception:
        return False
