"""Pallas TPU kernel: fused distance + binned top-K neighbor search.

The generic kNN path (``ops.knn``) materializes the (B, Nq, Nk) squared-
distance tensor in HBM and runs ``lax.approx_min_k`` over it — at the
production stage-1 shape (B=16, 12k self-kNN) that is ~9.7 GB of HBM
round-trip for well under 1 ms of distance arithmetic, and at the 40k
MaximumNumNodes predict shape it no longer fits at all (the dense path
falls back to slow sequential query chunking). This kernel never leaves
VMEM: per (cloud, query-tile) grid step it streams the key set in
lane-width chunks, keeps one running (score, index) minimum per *bin*
(bin = key position mod ``bins``, exactly ``approx_min_k``'s PartialReduce
binning), and extracts the K best bins at the end.

TPU-layout notes (why the code looks the way it does):
- Coordinates travel TRANSPOSED, ``(4, N)``: a ``(N, 4)`` array has a
  4-wide lane (minor) dimension that Mosaic pads to 128 lanes — 32x VMEM
  waste (an OOM at Nk=40k) and a relayout on every slice.
- The kernel ranks by ``|k|^2 - 2 q.k``, NOT the full squared distance:
  dropping the per-query ``|q|^2`` term (a rank-invariant constant per
  row) means no (TQ, 1) column vector is ever needed, so the query block
  is consumed directly by the MXU ``dot_general`` with zero transposes.
  The caller adds ``|q|^2`` back outside the kernel.

Approximation semantics match ``lax.approx_min_k``: two true neighbors are
both kept unless they collide in the same bin (positions ``bins`` apart);
with ``bins=512`` and K=16 the measured recall on uniform clouds is ~0.98,
the same as the approx_min_k path it replaces. ``bins >= padded Nk`` makes
the kernel exact.

Masking follows ``ops.knn``'s 4th-coordinate convention (pad keys sit 1e4
away on the w axis → their ``|k|^2`` carries +1e8), so no elementwise masks
enter the kernel; inputs are the already centered+augmented (..., 4) arrays
built by ``ops.knn.knn``.

Reference parity: replaces ``torch_cluster.knn`` (reference
``pyg_randla_net.py:180``) on the TPU fast path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256     # query rows per grid step (sublane axis of the score tile)
BINS = 512       # running minima per query (lane axis; key chunk width)

# plain python scalars: jnp constants at module scope would be captured
# as consts by the traced kernel, which pallas_call rejects
_INF = 3e38
_BIG_I = 2**30


def _knn_kernel(qt_ref, kt_ref, idx_ref, s_ref, *, k_out: int, bins: int):
    """One (cloud, query-tile) step.

    qt_ref: (4, TQ) VMEM — transposed query coords;
    kt_ref: (4, Nk_pad) VMEM — transposed key coords, Nk_pad % bins == 0;
    idx_ref/s_ref: (TQ, k_out) — indices and scores (|k|^2 - 2 q.k),
    score-ascending (== distance-ascending).
    """
    qt = qt_ref[:]                                          # (4, TQ)
    tq = qt.shape[1]
    n_chunks = kt_ref.shape[1] // bins

    state_s = jnp.full((tq, bins), _INF, jnp.float32)
    state_i = jnp.zeros((tq, bins), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)

    for c in range(n_chunks):                               # static unroll
        kc = kt_ref[:, c * bins:(c + 1) * bins]             # (4, bins)
        kn = jnp.sum(kc * kc, axis=0, keepdims=True)        # (1, bins)
        cross = jax.lax.dot_general(
            qt, kc,
            dimension_numbers=(((0,), (0,)), ((), ())),     # (TQ, bins)
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s = kn - 2.0 * cross
        better = s < state_s
        state_s = jnp.where(better, s, state_s)
        state_i = jnp.where(better, lane + c * bins, state_i)

    for t in range(k_out):                                  # static unroll
        m = jnp.min(state_s, axis=1, keepdims=True)         # (TQ, 1)
        sel = state_s == m
        # index of the winning bin via a min-reduce — no cross-lane gather
        am = jnp.min(
            jnp.where(sel, state_i, jnp.int32(_BIG_I)), axis=1, keepdims=True
        )
        s_ref[:, t:t + 1] = m
        idx_ref[:, t:t + 1] = am
        state_s = jnp.where(sel & (state_i == am), _INF, state_s)


def _pad_axis(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_q", "bins", "interpret"),
)
def knn_topk_pallas(
    q4: jnp.ndarray,           # (B, Nq, 4) centered + pad-augmented queries
    k4: jnp.ndarray,           # (B, Nk, 4) centered + pad-augmented keys
    k: int,
    tile_q: int = TILE_Q,
    bins: int = BINS,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Binned approximate top-k nearest keys for every query.

    Returns (idx (B, Nq, k) int32, d2 (B, Nq, k) f32, ascending). Pad keys
    (w = 1e4) surface with d2 >= 1e8 exactly like the dense path, so the
    caller's validity thresholding is unchanged.

    Non-differentiable by declaration (zero-tangent custom_jvp): neighbor
    indices are discrete and the forward recomputes any distance it needs
    gradients for, while pallas_call itself has no AD rule — without the
    wrapper, jit(grad(train_step)) fails to linearize.
    """
    return _topk_nodiff(q4, k4, k, tile_q, bins, interpret)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4, 5))
def _topk_nodiff(q4, k4, k, tile_q, bins, interpret):
    return _topk_impl(q4, k4, k, tile_q, bins, interpret)


@_topk_nodiff.defjvp
def _topk_nodiff_jvp(k, tile_q, bins, interpret, primals, tangents):
    import numpy as np

    out = _topk_nodiff(*primals, k, tile_q, bins, interpret)
    idx, d2 = out
    idx_tan = np.zeros(idx.shape, jax.dtypes.float0)  # int output: float0
    return out, (idx_tan, jnp.zeros_like(d2))


def _topk_impl(
    q4: jnp.ndarray,
    k4: jnp.ndarray,
    k: int,
    tile_q: int = TILE_Q,
    bins: int = BINS,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, nq, _ = q4.shape
    nk = k4.shape[1]
    q4p = _pad_axis(q4, 1, tile_q)
    # rows appended by key padding must behave as pads: zero coords would
    # alias the origin, so force their w coordinate to the pad offset
    k4p = _pad_axis(k4, 1, bins)
    if k4p.shape[1] > nk:
        pad_rows = k4p.shape[1] - nk
        w_fix = jnp.concatenate(
            [jnp.zeros((b, nk, 1), k4.dtype),
             jnp.full((b, pad_rows, 1), 1e4, k4.dtype)], axis=1,
        )
        k4p = k4p.at[:, :, 3:4].max(w_fix)

    nq_pad = q4p.shape[1]
    nk_pad = k4p.shape[1]
    qt = jnp.swapaxes(q4p, 1, 2)                            # (B, 4, Nq_pad)
    kt = jnp.swapaxes(k4p, 1, 2)                            # (B, 4, Nk_pad)
    kernel = functools.partial(_knn_kernel, k_out=k, bins=bins)

    def one(qtb, ktb):
        return pl.pallas_call(
            kernel,
            grid=(nq_pad // tile_q,),
            in_specs=[
                pl.BlockSpec(
                    (4, tile_q), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (4, nk_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_q, k), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nq_pad, k), jnp.int32),
                jax.ShapeDtypeStruct((nq_pad, k), jnp.float32),
            ],
            interpret=interpret,
        )(qtb, ktb)

    idx, score = jax.vmap(one)(qt, kt)
    # restore the rank-invariant |q|^2 term dropped inside the kernel
    qn = jnp.sum(q4 * q4, axis=-1, keepdims=True)           # (B, Nq, 1)
    d2 = jnp.maximum(score[:, :nq] + qn, 0.0)
    return idx[:, :nq], d2


def knn_pallas_available(k: int, nk: int) -> bool:
    """Fast path gate: TPU backend, whole local batch per program instance
    (single chip or per-shard inside shard_map — same rule as the k=1
    kernel), and a key set large enough that binning beats the dense path."""
    from myria3d_tpu.ops.pallas_nn1 import nn1_available

    return k <= 64 and nk >= 2 * BINS and nn1_available()
