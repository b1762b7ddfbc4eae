"""Fused windowed LocSE+attentive-pooling (LFA) Pallas kernel — predict path.

The RandLA-Net forward's dominant cost on TPU is NOT arithmetic: each
``DilatedResidualBlock`` performs two XLA neighbor gathers over
``(B, K, N)`` index tensors (the block-wide ``[pos|x]`` gather feeding
LocSE + lfa1, and lfa2's feature re-gather). XLA lowers them to
descriptor-bound dynamic-slice streams at ~7 ns/row regardless of row
width — 145 ms of a 408 ms forward at the 40k production shape for
block1 alone (docs/perf_notes.md round 4 cont.), ~4 GB/s effective
against ~800 GB/s of HBM.

This kernel replaces gather + LocSE geometry + encoder MLP + attention
scores + masked softmax + weighted sum for ONE LocalFeatureAggregation
with a single VMEM-resident pass per (cloud, query-tile) grid step:

1. **One-hot MXU gather.** Over x-SORTED clouds every neighbor index of a
   256-query tile lies inside the contiguous sorted-position window the
   windowed kNN scanned (``ops/pallas_knn.py``), so the gather becomes
   per-key-chunk matmuls ``payload(P, g) @ onehot(TQ, g)^T`` with the
   one-hot built from a lane-iota compare per neighbor slot — the
   systolic array streams what the descriptor engine serialized. Chunks
   outside the tile's actual ``[min(idx), max(idx)]`` span are skipped at
   runtime (``pl.when``): a thin x-slab's neighbors typically span a few
   hundred sorted positions of the ~4608-position window.
2. **f32-grade positions over a bf16 payload.** The payload table carries
   positions as a bf16 hi/lo SPLIT (hi = bf16(pos), lo = bf16(pos - hi));
   the matmul's f32 accumulator re-sums them to ~2^-16 relative — LocSE
   keeps f32-grade coordinates while the whole table rides bf16 through
   the MXU. Features ride plain bf16 (~4e-3 relative, the same contract
   as the fused interpolation kernel). A constant ones-row doubles as the
   neighbor-validity plane: the wrapper folds ``neigh_valid`` into the
   indices (invalid -> -1, which no one-hot lane ever matches), so a
   gathered 0 in that row IS the mask — no separate validity operand.
   Payload row groups sit at 8-aligned sublane offsets (pos_hi@0,
   pos_lo@8, ones@16, features@24): Mosaic relayouts for odd sublane
   offsets are either unsupported (concat) or cost extra copies.
3. **In-VMEM LFA math.** LocSE's ``[pos_i, pos_j, diff, |diff|]`` build,
   the (eval-mode) encoder MLP folded to one affine ``A·rel + c`` (BN
   running stats are constants at predict time), the bias-free attention
   matmul, and the masked softmax over K run on channels-first
   ``(C, TQ)`` per-slot tiles that never touch HBM — the ``(B, C, K, N)``
   edge tensors of the unfused path simply don't exist.

Predict/eval-only: BN is folded (train-mode batch moments would need a
cross-tile reduction) and no AD rule is defined — differentiating through
this op fails loudly, exactly like ``knn_interpolate_pallas``.

Reference parity: computes ``LocalFeatureAggregation``
(``pyg_randla_net.py:112-152``) with the same masked-softmax semantics as
``ops.masked.masked_softmax``; the module-level parity test runs both
paths on the same parameters (``tests/.../test_pallas_lfa.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myria3d_tpu.ops.pallas_knn import (
    BINS,
    TILE_Q,
    _pad_axis,
    _window_chunks,
)

_NEG = -3e38
_BIG_I = 2**30


def _bases_from_idx_qmajor(idx_m: jnp.ndarray, tile_q: int, bins: int,
                           w_chunks: int, n_chunks: int) -> jnp.ndarray:
    """(B, n_tiles) window base chunks from (B, Nq_pad, K) masked indices
    (same contract as ``pallas_gather._bases_from_idx``): containment of
    every valid index is STRUCTURAL — ``base = clip(min_valid_idx/bins)``
    plus the +1 alignment chunk in ``w_chunks`` covers the window-contract
    span, independent of any coordinate recomputation. (A searchsorted
    over the positions could shift a boundary tile's base by one chunk
    relative to the kNN's when centering offsets create/break FP ties,
    silently zero-gathering that tile's edge neighbors.)"""
    b, nq_pad, k = idx_m.shape
    n_tiles = nq_pad // tile_q
    im = idx_m.reshape(b, n_tiles, tile_q * k)
    mn = jnp.min(jnp.where(im >= 0, im, _BIG_I), axis=2)
    mn = jnp.where(mn == _BIG_I, 0, mn)
    return jnp.clip(mn // bins, 0, n_chunks - w_chunks).astype(jnp.int32)

# payload row groups (8-aligned sublane offsets, see module docstring)
_ROW_HI = 0
_ROW_LO = 8
_ROW_ONE = 16
_ROW_FEAT = 24

# gather sub-chunk width: the (TQ, gbins) iota/one-hot intermediates are
# the kernel's transient VMEM peak
_GBINS = 512

# Tests set this to run the kernel in interpret mode off-TPU; the module
# integration reads it at trace time (the wrapper jit is keyed on it).
FORCE_INTERPRET = False


def _lfa_kernel(base_ref, qt_ref, idx_ref, pt_ref, enc_ref, att_ref,
                out_ref, acc_ref, *, k: int, bins: int, w_chunks: int,
                c_in: int, c_out: int):
    """One (cloud, query-tile) step.

    base_ref: (B, n_tiles) scalar-prefetched window base chunk (same
        bases as the kNN that produced ``idx`` — every valid index is
        in-window by construction);
    qt_ref:  (1, 4, TQ) f32 TRANSPOSED query coords (x, y, z, unused);
    idx_ref: (1, TQ, K) i32 neighbor indices, invalid slots = -1;
    pt_ref:  (1, P_pad, Nk_pad) bf16 payload table (row groups above);
    enc_ref: (1, EC, 16) f32 — encoder affine: cols 0..9 = A, col 10 = c;
    att_ref: (1, C_pad, C_pad) f32 — attention kernel TRANSPOSED
        (att_cf = W^T @ lf_cf, the DenseCF convention);
    out_ref: (1, C_pad, TQ) f32 — attention-pooled features (pre
        post-attention MLP), channels-first;
    acc_ref: (P_pad, K*TQ) f32 VMEM scratch — per-slot gather slabs.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    base = base_ref[b, i]

    qt = qt_ref[0]                                          # (4, TQ)
    tq = qt.shape[1]
    pos_i = qt[0:3]                                         # (3, TQ)
    idxm = idx_ref[0]                                       # (TQ, K)

    # runtime chunk trim: valid indices span a thin slab of the window
    idx_min = jnp.min(jnp.where(idxm >= 0, idxm, jnp.int32(_BIG_I)))
    idx_max = jnp.max(idxm)                                 # invalid = -1

    n_sub = (w_chunks * bins) // _GBINS
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for s in range(n_sub):                                  # static unroll
        off = pl.multiple_of(base * bins + s * _GBINS, _GBINS)

        @pl.when((off + _GBINS > idx_min) & (off <= idx_max))
        def _():
            pc = pt_ref[0, :, pl.ds(off, _GBINS)]           # (P_pad, g)
            lane = off + jax.lax.broadcasted_iota(
                jnp.int32, (tq, _GBINS), 1
            )
            for kk in range(k):                             # static unroll
                onehot = (lane == idxm[:, kk:kk + 1]).astype(jnp.bfloat16)
                acc_ref[:, kk * tq:(kk + 1) * tq] += jax.lax.dot_general(
                    pc, onehot,
                    dimension_numbers=(((1,), (1,)), ((), ())),  # (P, TQ)
                    preferred_element_type=jnp.float32,
                )

    enc_a = enc_ref[0][:, 0:10]                             # (EC, 10)
    enc_c = enc_ref[0][:, 10:11]                            # (EC, 1)
    att_t = att_ref[0]                                      # (C_pad, C_pad)
    c_pad = att_t.shape[0]

    # WIDE post-gather math over the k-major (·, K*TQ) lane axis: one
    # enc/att dot for all K slots instead of K small dispatches (the
    # per-k formulation measured 61 ms — Mosaic per-op overhead on 32
    # tiny dots/tile dominated the arithmetic). `+ 0.0` canonicalizes
    # the qt slice's layout so the lane-concat sees offset-0 operands.
    el = k * tq
    g = acc_ref[...]                                        # (P_pad, K*TQ)
    pos_j = g[_ROW_HI:_ROW_HI + 3] + g[_ROW_LO:_ROW_LO + 3]
    val_w = g[_ROW_ONE:_ROW_ONE + 1]                        # (1, K*TQ)
    x_j = g[_ROW_FEAT:_ROW_FEAT + c_in]                     # (c_in, K*TQ)
    pos_i0 = pos_i + 0.0
    pos_i_w = jnp.concatenate([pos_i0] * k, axis=1)         # (3, K*TQ)
    diff = pos_j - pos_i_w
    dist = jnp.sqrt(jnp.maximum(
        jnp.sum(diff * diff, axis=0, keepdims=True), 0.0
    ))                                                      # (1, K*TQ)
    rel = jnp.concatenate([pos_i_w, pos_j, diff, dist], axis=0)
    enc = jax.lax.dot_general(
        enc_a, rel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + enc_c                                               # (EC, K*TQ)
    enc = jnp.where(enc >= 0.0, enc, 0.2 * enc)             # LeakyReLU(0.2)
    parts = [x_j, enc[0:c_out - c_in]]
    if c_pad > c_out:
        parts.append(jnp.zeros((c_pad - c_out, el), jnp.float32))
    lf = jnp.concatenate(parts, axis=0)                     # (C_pad, K*TQ)
    att = jax.lax.dot_general(
        att_t, lf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (C_pad, K*TQ)

    # masked softmax over the K slots (ops.masked.masked_softmax
    # semantics: invalid slots weight 0, all-invalid → all-zero output);
    # per-k lane slices are tile-aligned (offsets are multiples of TQ)
    m = jnp.full((c_pad, tq), _NEG, jnp.float32)
    for kk in range(k):                                     # static unroll
        sl = slice(kk * tq, (kk + 1) * tq)
        m = jnp.maximum(
            m, jnp.where(val_w[:, sl] > 0.0, att[:, sl], _NEG)
        )
    s_sum = jnp.zeros((c_pad, tq), jnp.float32)
    o_sum = jnp.zeros((c_pad, tq), jnp.float32)
    for kk in range(k):                                     # static unroll
        sl = slice(kk * tq, (kk + 1) * tq)
        e_k = jnp.where(
            val_w[:, sl] > 0.0, jnp.exp(att[:, sl] - m), 0.0
        )
        s_sum = s_sum + e_k
        o_sum = o_sum + e_k * lf[:, sl]
    out_ref[0] = o_sum / jnp.maximum(s_sum, 1e-16)


def lfa_fused_available(nk: int, k: int, window: int, c_in: int = 64,
                        tile_q: int = TILE_Q, bins: int = BINS) -> bool:
    """Gate: TPU single-chip/per-shard (same rule as the kNN kernels), a
    genuinely windowed scan, K small enough for the static unrolls, and a
    VMEM budget over the payload table + gather scratch + transients."""
    from myria3d_tpu.ops.pallas_nn1 import nn1_available

    if not nn1_available() or k > 32:
        return False
    nk_pad = -(-nk // bins) * bins
    w_chunks = _window_chunks(window, nk_pad, bins) if window else 0
    if not (0 < w_chunks < nk_pad // bins):
        return False
    el = k * tile_q
    p_rows = _ROW_FEAT + -(-c_in // 8) * 8
    table = p_rows * nk_pad * 2             # bf16 payload rows
    scratch = p_rows * el * 4               # gather accumulator f32
    onehot = tile_q * _GBINS * (4 + 2)      # iota i32 + one-hot bf16
    c_pad = max(8, -(-2 * c_in // 8) * 8)
    planes = 3 * k * c_pad * tile_q * 4     # lf/att/val softmax planes
    return table + scratch + onehot + planes < 13 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("window", "tile_q", "bins", "interpret"),
)
def lfa_attention_pallas(
    x: jnp.ndarray,            # (B, N, C_in) features (= channels // 2)
    pos: jnp.ndarray,          # (B, N, 3)
    mask: jnp.ndarray,         # (B, N) bool
    idx: jnp.ndarray,          # (B, N, K) i32 neighbor indices
    neigh_valid: jnp.ndarray,  # (B, N, K) bool
    enc_a: jnp.ndarray,        # (C_in, 10) folded encoder affine
    enc_c: jnp.ndarray,        # (C_in,)
    att_t: jnp.ndarray,        # (C, C) attention kernel TRANSPOSED
    window: int,
    tile_q: int = TILE_Q,
    bins: int = BINS,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention-pooled LFA features (B, N, C) — everything of
    ``LocalFeatureAggregation`` before the post-attention MLP. Requires
    x-sorted clouds and ``idx`` produced by the windowed kNN over the SAME
    window (every valid index must lie inside the scanned chunk span).
    No AD rule — predict/eval only."""
    b, n, c_in = x.shape
    kk = idx.shape[-1]
    c_out = att_t.shape[0]

    # payload table, bf16, 8-aligned row groups (see module docstring)
    pos_hi = pos.astype(jnp.bfloat16)
    pos_lo = (pos - pos_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    feat_rows = -(-c_in // 8) * 8
    zero3_5 = jnp.zeros((b, n, 5), jnp.bfloat16)
    payload = jnp.concatenate([
        pos_hi, zero3_5, pos_lo, zero3_5,
        jnp.ones((b, n, 1), jnp.bfloat16),
        jnp.zeros((b, n, 7), jnp.bfloat16),
        _pad_axis(x.astype(jnp.bfloat16), 2, feat_rows),
    ], axis=-1)                                             # (B, N, P_pad)
    payload = _pad_axis(payload, 1, bins)
    pt = jnp.swapaxes(payload, 1, 2)                        # (B, P_pad, Nk_pad)
    p_rows = pt.shape[1]
    nk_pad = pt.shape[2]

    from myria3d_tpu.ops.knn import _augment_queries

    q4p = _pad_axis(_augment_queries(pos), 1, tile_q)
    nq_pad = q4p.shape[1]
    n_tiles = nq_pad // tile_q
    qt = jnp.swapaxes(q4p, 1, 2)                            # (B, 4, Nq_pad)
    # invalid slots -> -1: no one-hot lane matches, so the gathered
    # ones-row IS the validity mask in-kernel
    idx_in = _pad_axis(
        jnp.where(neigh_valid, idx, -1).astype(jnp.int32), 1, tile_q
    )
    if idx_in.shape[1] > n:
        # padded query rows: all slots invalid
        idx_in = idx_in.at[:, n:].set(-1)
    # window bases FROM THE INDICES (shared with the train kernel):
    # structural containment of every valid index — see
    # ``_bases_from_idx_qmajor``
    w_chunks = _window_chunks(window, nk_pad, bins)
    n_chunks = nk_pad // bins
    bases = _bases_from_idx_qmajor(idx_in, tile_q, bins, w_chunks, n_chunks)

    c_pad = max(8, -(-c_out // 8) * 8)
    ec = enc_a.shape[0]
    enc_tab = jnp.concatenate([enc_a, enc_c[:, None]], axis=1)  # (EC, 11)
    enc_tab = _pad_axis(enc_tab, 1, 16)[None]               # (1, EC, 16)
    att_tab = _pad_axis(_pad_axis(att_t, 0, c_pad), 1, c_pad)[None]

    kernel = functools.partial(
        _lfa_kernel, k=kk, bins=bins, w_chunks=w_chunks,
        c_in=c_in, c_out=c_out,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 4, tile_q), lambda b, i, bases: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_q, kk), lambda b, i, bases: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_rows, nk_pad),
                             lambda b, i, bases: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ec, 16), lambda b, i, bases: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_pad, c_pad),
                             lambda b, i, bases: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, c_pad, tile_q), lambda b, i, bases: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((p_rows, kk * tile_q), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, c_pad, nq_pad), jnp.float32),
        interpret=interpret,
    )(bases, qt, idx_in, pt, enc_tab, att_tab)
    return jnp.swapaxes(out[:, :c_out, :n], 1, 2)           # (B, N, C)
