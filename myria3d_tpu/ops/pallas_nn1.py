"""Pallas TPU kernel: fused nearest-neighbor (k=1) search.

The RandLA-Net decoder upsamples with k=1 kNN-interpolation four times per
forward (reference ``FPModule``, ``pyg_randla_net.py:241-253``); at
production shapes the largest call (12k queries <- 3k keys, B=16) costs
~30 ms through the generic approx_min_k path because the (Nq, Nk) distance
tile round-trips HBM. This kernel keeps everything in VMEM: per grid step
a (TILE_Q, 4) query block and the full padded key set stream through a
running min/argmin over key chunks — distances never touch HBM.

Masking follows the 4th-coordinate convention of ``ops.knn``: pad keys sit
1e4 away on the w axis, so no elementwise masking enters the kernel.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myria3d_tpu.ops.knn import _augment_keys, _augment_queries

TILE_Q = 512
CHUNK_K = 2048


def _nn1_kernel(q_ref, k_ref, idx_ref, d2_ref):
    # q_ref: (TILE_Q, 4) VMEM; k_ref: (Nk_pad, 4) VMEM
    q = q_ref[:]                                          # (TQ, 4)
    qn = jnp.sum(q * q, axis=1, keepdims=True)            # (TQ, 1)
    nk = k_ref.shape[0]
    n_chunks = nk // CHUNK_K

    def body(c, carry):
        best_d, best_i = carry
        kc = k_ref[pl.ds(c * CHUNK_K, CHUNK_K), :]        # (CK, 4)
        kn = jnp.sum(kc * kc, axis=1)                     # (CK,)
        cross = jax.lax.dot_general(
            q, kc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                  # (TQ, CK)
        d2 = qn + kn[None, :] - 2.0 * cross
        cmin = jnp.min(d2, axis=1)                        # (TQ,)
        carg = jnp.argmin(d2, axis=1).astype(jnp.int32) + c * CHUNK_K
        better = cmin < best_d
        return (
            jnp.where(better, cmin, best_d),
            jnp.where(better, carg, best_i),
        )

    init = (
        jnp.full((q.shape[0],), jnp.float32(3e38)),
        jnp.zeros((q.shape[0],), jnp.int32),
    )
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    idx_ref[:, 0] = best_i
    d2_ref[:, 0] = jnp.maximum(best_d, 0.0)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=())
def nearest_neighbor_pallas(
    query_pos: jnp.ndarray,   # (B, Nq, 3)
    key_pos: jnp.ndarray,     # (B, Nk, 3)
    key_mask: jnp.ndarray,    # (B, Nk) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cloud nearest valid key for every query.

    Returns (idx (B, Nq) int32, d2 (B, Nq) f32); queries in clouds with no
    valid key get d2 >= the pad threshold (caller masks them).

    Non-differentiable by declaration (zero-tangent custom_jvp) — same
    rationale as ``pallas_knn.knn_topk_pallas``: pallas_call has no AD
    rule and the decoder only needs gradients through the gathered
    features, never through the index search.
    """
    return _nn1_nodiff(query_pos, key_pos, key_mask)


@jax.custom_jvp
def _nn1_nodiff(query_pos, key_pos, key_mask):
    return _nn1_impl(query_pos, key_pos, key_mask)


@_nn1_nodiff.defjvp
def _nn1_nodiff_jvp(primals, tangents):
    import numpy as np

    out = _nn1_nodiff(*primals)
    idx, d2 = out
    idx_tan = np.zeros(idx.shape, jax.dtypes.float0)
    return out, (idx_tan, jnp.zeros_like(d2))


def _nn1_impl(
    query_pos: jnp.ndarray,
    key_pos: jnp.ndarray,
    key_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, nq, _ = query_pos.shape
    # Same per-cloud centering as ops.knn: georeferenced magnitudes would
    # otherwise cancel catastrophically in the f32 norm expansion.
    cnt = jnp.maximum(jnp.sum(key_mask, axis=1), 1)
    offset = (
        jnp.sum(jnp.where(key_mask[..., None], key_pos, 0.0), axis=1)
        / cnt[..., None].astype(key_pos.dtype)
    )[:, None, :]
    query_pos = query_pos - offset
    key_pos = key_pos - offset
    q4 = _pad_to(_augment_queries(query_pos), 1, TILE_Q)
    # pad keys with the pad coordinate so padded rows are never nearest
    k4 = _augment_keys(key_pos, key_mask)
    k4 = _pad_to(k4, 1, CHUNK_K, value=0.0)
    if k4.shape[1] > key_pos.shape[1]:
        # rows added by padding: force their w coordinate to the pad offset
        pad_rows = k4.shape[1] - key_pos.shape[1]
        w_fix = jnp.concatenate(
            [jnp.zeros((b, key_pos.shape[1], 1), k4.dtype),
             jnp.full((b, pad_rows, 1), 1e4, k4.dtype)], axis=1,
        )
        k4 = k4.at[:, :, 3:4].max(w_fix)

    nq_pad = q4.shape[1]
    nk_pad = k4.shape[1]

    def one(q4b, k4b):
        idx, d2 = pl.pallas_call(
            _nn1_kernel,
            grid=(nq_pad // TILE_Q,),
            in_specs=[
                pl.BlockSpec(
                    (TILE_Q, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (nk_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (TILE_Q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (TILE_Q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nq_pad, 1), jnp.int32),
                jax.ShapeDtypeStruct((nq_pad, 1), jnp.float32),
            ],
        )(q4b, k4b)
        return idx[:, 0], d2[:, 0]

    idx, d2 = jax.vmap(one)(q4, k4)
    return idx[:, :nq], d2[:, :nq]


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
