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
- The default ("vpu") kernel accumulates TRUE squared distances as
  broadcast outer differences on the VPU. The original ("mxu") variant
  ranks by ``|k|^2 - 2 q.k`` via ``dot_general`` — but a contraction
  dimension of 4 runs the 128x128 systolic array at ~3% utilization, and
  the f32 HIGHEST precision it needs multiplies that by 6 bf16 passes:
  measured 1.3x (12k) to 2.8x (40k) slower than the VPU arithmetic, with
  identical selected indices (docs/perf_notes.md). Both variants stay
  resident in VMEM throughout.

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
import struct
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
# IEEE-754 bit pattern of _INF as a positive int32 — the packed-extraction
# sentinel base (squared distances are always >= +0.0, so the int32 view
# of every real score is non-negative and int ordering == float ordering;
# the packed value is kept BITCAST BACK to f32 so the running minimum and
# the extraction reductions ride the native float min units — the same
# state held as int32 measured 1.7x slower end-to-end)
_INF_BITS = 0x7F61B1E6


def _rel_bits(w_chunks: int, bins: int) -> int:
    """Bits needed for a window-RELATIVE key position (packed-extraction
    index payload). Window 4608 -> 10 chunks x 512 = 13 bits."""
    return max(1, (w_chunks * bins - 1).bit_length())


def _packed_sentinel(idx_bits: int) -> float:
    """The packed sentinel as the f32 whose bits are INF_BITS | low-mask."""
    low = (1 << idx_bits) - 1
    return struct.unpack(
        "<f", struct.pack("<i", (_INF_BITS & ~low) | low)
    )[0]


def _extract_topk(state_s, state_i, idx_ref, s_ref, k_out: int,
                  k_real: int = 0):
    """``k_real`` extraction passes fill the first slots; the remaining
    ``k_out - k_real`` output slots (the multiple-of-16 shape padding the
    VPU variant needs, see ``_topk_impl``) are memset to pad sentinels.
    The decoder's k=1 searches previously paid 16 min-passes per tile for
    one real neighbor — the extraction, not the distance streaming, was
    ~2/3 of the windowed kernel's time (docs/perf_notes.md round 4 cont.)."""
    k_real = k_real or k_out
    m = am = None
    for t in range(k_out):                                  # static unroll
        if t < k_real:
            m = jnp.min(state_s, axis=1, keepdims=True)     # (TQ, 1)
            sel = state_s == m
            # index of the winning bin via min-reduce — no cross-lane gather
            am = jnp.min(
                jnp.where(sel, state_i, jnp.int32(_BIG_I)),
                axis=1, keepdims=True,
            )
        # slots beyond k_real repeat the last extracted column: callers
        # always slice [:k] with k <= k_real, and structurally-identical
        # writes are what keeps Mosaic from stack-allocating the whole
        # output tuple in scoped VMEM (any differently-shaped pad write
        # re-triggered the minor-dim-4-operand OOM the multiple-of-16
        # k_out exists to dodge). The skipped min-passes were ~2/3 of the
        # windowed k=1 decoder kernel's time.
        s_ref[0, :, t:t + 1] = m
        idx_ref[0, :, t:t + 1] = am
        if t < k_real:
            state_s = jnp.where(sel & (state_i == am), _INF, state_s)


def _knn_kernel(qt_ref, kt_ref, idx_ref, s_ref, *, k_out: int, bins: int,
                k_real: int = 0):
    """One (cloud, query-tile) step — MXU cross-term variant.

    qt_ref: (1, 4, TQ) VMEM — transposed query coords;
    kt_ref: (1, 4, Nk_pad) VMEM — transposed key coords, Nk_pad % bins == 0;
    idx_ref/s_ref: (1, TQ, k_out) — indices and scores (|k|^2 - 2 q.k),
    score-ascending (== distance-ascending). The caller adds the
    rank-invariant |q|^2 back outside.
    """
    qt = qt_ref[0]                                          # (4, TQ)
    tq = qt.shape[1]
    n_chunks = kt_ref.shape[2] // bins

    state_s = jnp.full((tq, bins), _INF, jnp.float32)
    state_i = jnp.zeros((tq, bins), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)

    for c in range(n_chunks):                               # static unroll
        kc = kt_ref[0, :, c * bins:(c + 1) * bins]          # (4, bins)
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

    _extract_topk(state_s, state_i, idx_ref, s_ref, k_out, k_real)


def _knn_kernel_vpu(q_ref, kt_ref, idx_ref, s_ref, *, k_out: int, bins: int,
                    k_real: int = 0):
    """One (cloud, query-tile) step — VPU difference variant.

    Scores are TRUE squared distances sum_d (q_d - k_d)^2 accumulated on the
    VPU as broadcast outer differences. Rationale: the MXU variant's
    dot_general has contraction dim 4 (3% systolic utilization) at
    Precision.HIGHEST (6 bf16 passes) — ~200 ms of MXU time at the 40k
    production shape — while the equivalent VPU arithmetic is ~10 ops per
    (query, key) element. Queries arrive UN-transposed as a (1, TQ, 4)
    block so q_d is a (TQ, 1) column with no in-kernel transpose (an
    in-kernel (4, TQ) transpose re-materialized per unrolled chunk and
    cost +33% at the 40k shape). The query w column is always 0
    (ops/knn._augment_queries), so the pad term is seeded from the key row
    alone.
    """
    q = q_ref[0]                                            # (TQ, 4)
    tq = q.shape[0]
    n_chunks = kt_ref.shape[2] // bins
    q0 = q[:, 0:1]
    q1 = q[:, 1:2]
    q2 = q[:, 2:3]                                          # (TQ, 1) each

    state_s = jnp.full((tq, bins), _INF, jnp.float32)
    state_i = jnp.zeros((tq, bins), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)

    for c in range(n_chunks):                               # static unroll
        kc = kt_ref[0, :, c * bins:(c + 1) * bins]          # (4, bins)
        kw = kc[3:4, :]
        s = jnp.broadcast_to(kw * kw, (tq, bins))           # pad term w^2
        d0 = q0 - kc[0:1, :]
        s = s + d0 * d0
        d1 = q1 - kc[1:2, :]
        s = s + d1 * d1
        d2 = q2 - kc[2:3, :]
        s = s + d2 * d2
        better = s < state_s
        state_s = jnp.where(better, s, state_s)
        state_i = jnp.where(better, lane + c * bins, state_i)

    _extract_topk(state_s, state_i, idx_ref, s_ref, k_out, k_real)


def _knn_kernel_vpu_win(base_ref, q_ref, kt_ref, idx_ref, s_ref, *,
                        k_out: int, bins: int, w_chunks: int,
                        k_real: int = 0):
    """Windowed VPU variant: x-SORTED clouds only. Instead of streaming
    every key chunk, scan ``w_chunks`` chunks starting at this query
    tile's prefetched window base (``base_ref``, computed outside by
    ``_window_bases`` via searchsorted of the tile's mid x into the sorted
    key x's). A 256-query tile of an x-sorted cloud spans a thin x-slab,
    so its true neighbors live in a contiguous sorted-position window —
    measured ≥99.97 % in-window at the production shapes
    (docs/perf_notes.md round 4; the Morton-window variants measured in
    rounds 2-3 were NO-GO because 2D curve discontinuities scatter
    neighborhoods, a 1D x-sort has none)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    base = base_ref[b, i]                                   # chunk index
    q = q_ref[0]                                            # (TQ, 4)
    tq = q.shape[0]
    q0 = q[:, 0:1]
    q1 = q[:, 1:2]
    q2 = q[:, 2:3]

    state_s = jnp.full((tq, bins), _INF, jnp.float32)
    state_i = jnp.zeros((tq, bins), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)

    for c in range(w_chunks):                               # static unroll
        off = pl.multiple_of((base + c) * bins, bins)
        kc = kt_ref[0, :, pl.ds(off, bins)]                 # (4, bins)
        kw = kc[3:4, :]
        s = jnp.broadcast_to(kw * kw, (tq, bins))           # pad term w^2
        d0 = q0 - kc[0:1, :]
        s = s + d0 * d0
        d1 = q1 - kc[1:2, :]
        s = s + d1 * d1
        d2 = q2 - kc[2:3, :]
        s = s + d2 * d2
        better = s < state_s
        state_s = jnp.where(better, s, state_s)
        state_i = jnp.where(better, lane + off, state_i)

    _extract_topk(state_s, state_i, idx_ref, s_ref, k_out, k_real)


def _knn_kernel_vpu_win_packed(base_ref, q_ref, kt_ref, idx_ref, s_ref, *,
                               k_out: int, bins: int, w_chunks: int,
                               idx_bits: int, k_real: int = 0):
    """Windowed VPU kNN with PACKED single-reduction extraction.

    The classic extraction (``_extract_topk``) pays TWO cross-lane
    min-reductions plus ~4 full-state elementwise ops per neighbor — at
    K=16 that is ~54 % of the whole windowed kernel (measured 0.78 ms per
    pass at the B=16/40k production shape, docs/perf_notes.md round 5).
    Here the per-lane running state is ONE value whose high bits are the
    IEEE bits of the (non-negative) squared distance and whose low
    ``idx_bits`` bits are the window-RELATIVE key position: ``min`` is
    then lexicographic (score-with-truncated-mantissa, index) — one
    reduction yields winner score AND index, and ties still break toward
    the smaller key index exactly like ``_extract_topk``. The packed
    state is held BITCAST to f32 (all packed values are positive floats,
    so f32 ordering == the int ordering) because the float min units are
    the fast path — the same kernel with an int32 state measured 18.6 ms
    vs 10.8 ms f32 at the B=16/40448 shape.

    Precision contract: scores keep ``23 - idx_bits`` mantissa bits
    (window 4608 -> 13 idx bits -> 2^-11 ~ 5e-4 relative, finer than the
    f16 wire), truncated DOWN; neighbor selection can swap candidates
    whose true distances agree to 2^-11 — far inside the binned-
    approximation envelope already accepted (lane-collision recall ~0.99).
    Exactness-sensitive callers (``predict.exact_interpolation`` weight
    computation) route to the classic kernel via ``packed=False``.
    """
    k_real = k_real or k_out
    b = pl.program_id(0)
    i = pl.program_id(1)
    base = base_ref[b, i]                                   # chunk index
    q = q_ref[0]                                            # (TQ, 4)
    tq = q.shape[0]
    q0 = q[:, 0:1]
    q1 = q[:, 1:2]
    q2 = q[:, 2:3]

    low = (1 << idx_bits) - 1
    sentf = _packed_sentinel(idx_bits)
    state_p = jnp.full((tq, bins), sentf, jnp.float32)
    rel0 = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)

    for c in range(w_chunks):                               # static unroll
        off = pl.multiple_of((base + c) * bins, bins)
        kc = kt_ref[0, :, pl.ds(off, bins)]                 # (4, bins)
        kw = kc[3:4, :]
        # the 1e-35 seed keeps every packed value a NORMAL f32: a zero
        # score (self-match) would otherwise pack to a denormal whose
        # flush-to-zero in the min/select units erases the index payload
        s = jnp.broadcast_to(kw * kw + 1e-35, (tq, bins))   # pad term w^2
        d0 = q0 - kc[0:1, :]
        s = s + d0 * d0
        d1 = q1 - kc[1:2, :]
        s = s + d1 * d1
        d2 = q2 - kc[2:3, :]
        s = s + d2 * d2
        sp = jax.lax.bitcast_convert_type(s, jnp.int32)
        sp = (sp & jnp.int32(~low)) | (rel0 + c * bins)
        state_p = jnp.minimum(
            state_p, jax.lax.bitcast_convert_type(sp, jnp.float32)
        )

    kb = base * bins
    m = gi = sv = None
    for t in range(k_out):                                  # static unroll
        if t < k_real:
            m = jnp.min(state_p, axis=1, keepdims=True)     # (TQ, 1) f32
            mi = jax.lax.bitcast_convert_type(m, jnp.int32)
            gi = kb + (mi & jnp.int32(low))
            sv = jax.lax.bitcast_convert_type(
                mi & jnp.int32(~low), jnp.float32
            )
        # pad slots repeat the last column — see _extract_topk's note on
        # structurally-identical writes vs Mosaic scoped-VMEM allocation
        s_ref[0, :, t:t + 1] = sv
        idx_ref[0, :, t:t + 1] = gi
        if t < k_real:
            state_p = jnp.where(state_p == m, sentf, state_p)


def _interp_kernel_vpu(q_ref, kt_ref, pt_ref, out_ref, *, k_out: int,
                       bins: int, valid_thresh: float):
    """One (cloud, query-tile) step — fused kNN + inverse-d2 interpolation.

    Three phases, all VMEM-resident:
    1. The VPU difference-score streaming pass of ``_knn_kernel_vpu``
       (per-bin running (score, key-index) minima — 2 small state planes).
    2. ``k_out`` min-extraction passes select the winning bins into a lane
       mask (ties by key index, like ``_extract_topk``) and build the
       normalized pyg weights w = 1/max(d2, 1e-16), W = w/Σw.
    3. A second walk over the key chunks recombines the payload on the
       MXU: bin l's winner is the key at lane l of chunk state_i[t,l]//bins
       — so per chunk c the sparse weight tile W_c = W·[winner ∈ chunk c]
       and ``out += W_c @ P_c`` accumulates the interpolation as a
       (TQ, bins) x (bins, C_pad) matmul (contraction dim ``bins`` — full
       systolic utilization, unlike the distance cross-term).

    Earlier design (payload planes riding beside the minima, reduced on the
    VPU) cost C_pad·TQ·Nk VPU selects in the streaming phase and made the
    Mosaic scoped-VMEM stack scale with n_chunks (compile OOM past 24
    chunks, forcing the 40k-key production shape onto the slower two-op
    path). The matmul recombine moves that work to the MXU at bf16 and
    keeps phase 1's state at 2 planes, so the full static unroll works at
    every production shape.

    Precision: W and the payload table are bf16 (ulp 2^-8, ~4e-3
    relative — COARSER than the f16 wire's 2^-11); the accumulator is
    f32. Measured vs the f32 two-op path: median rel err 2.1e-3, p99
    9e-2 at near-zero logits. A class argmax can flip only where the
    top-2 merged logits sit within that error — the same order of
    approximation as the binned selection's 0.98 recall. Exactness-
    sensitive callers (e.g. checkpoint-parity evaluation) use the f32
    two-op path via ``fused_payload=False`` /
    ``predict.exact_interpolation=true``.

    q_ref: (1, TQ, 4) un-transposed queries (w column = 0);
    kt_ref: (1, 4, Nk_pad) transposed keys;
    pt_ref: (1, C_pad, Nk_pad) transposed bf16 payload table;
    out_ref: (1, TQ, C_pad) interpolated payload, f32.
    """
    q = q_ref[0]                                            # (TQ, 4)
    tq = q.shape[0]
    n_chunks = kt_ref.shape[2] // bins
    q0 = q[:, 0:1]
    q1 = q[:, 1:2]
    q2 = q[:, 2:3]                                          # (TQ, 1) each

    state_s = jnp.full((tq, bins), _INF, jnp.float32)
    state_i = jnp.zeros((tq, bins), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)
    for c in range(n_chunks):                               # static unroll
        kc = kt_ref[0, :, c * bins:(c + 1) * bins]          # (4, bins)
        kw = kc[3:4, :]
        s = jnp.broadcast_to(kw * kw, (tq, bins))           # pad term w^2
        d0 = q0 - kc[0:1, :]
        s = s + d0 * d0
        d1 = q1 - kc[1:2, :]
        s = s + d1 * d1
        d2 = q2 - kc[2:3, :]
        s = s + d2 * d2
        better = s < state_s
        state_s = jnp.where(better, s, state_s)
        state_i = jnp.where(better, lane + c * bins, state_i)

    # Select the k_out best bins into a mask (one per pass, ties by key
    # index — identical semantics to the index kernel's _extract_topk).
    work = state_s
    selected = jnp.zeros((tq, bins), jnp.bool_)
    for _ in range(k_out):                                  # static unroll
        m = jnp.min(work, axis=1, keepdims=True)            # (TQ, 1)
        sel = work == m
        am = jnp.min(jnp.where(sel, state_i, jnp.int32(_BIG_I)),
                     axis=1, keepdims=True)
        win = sel & (state_i == am)
        selected = selected | (win & (m < valid_thresh))
        work = jnp.where(win, _INF, work)

    w = jnp.where(selected, 1.0 / jnp.maximum(state_s, 1e-16), 0.0)
    den = jnp.sum(w, axis=1, keepdims=True)                 # (TQ, 1)
    w_norm = w / jnp.maximum(den, 1e-16)                    # rows sum to <=1

    chunk_of = state_i // bins                              # (TQ, bins)
    acc = jnp.zeros((tq, pt_ref.shape[1]), jnp.float32)
    for c in range(n_chunks):                               # static unroll
        wc = jnp.where(chunk_of == c, w_norm, 0.0).astype(jnp.bfloat16)
        pc = pt_ref[0, :, c * bins:(c + 1) * bins]          # (C_pad, bins)
        acc = acc + jax.lax.dot_general(
            wc, pc,
            dimension_numbers=(((1,), (1,)), ((), ())),     # (TQ, C_pad)
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc


def _interp_kernel_vpu_win(base_ref, q_ref, kt_ref, pt_ref, out_ref, *,
                           k_out: int, bins: int, valid_thresh: float,
                           w_chunks: int):
    """Windowed fused kNN+interpolation (x-sorted clouds; see
    ``_knn_kernel_vpu_win``): both the distance streaming pass and the MXU
    payload recombine walk only the ``w_chunks`` window chunks."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    base = base_ref[b, i]
    q = q_ref[0]                                            # (TQ, 4)
    tq = q.shape[0]
    q0 = q[:, 0:1]
    q1 = q[:, 1:2]
    q2 = q[:, 2:3]

    state_s = jnp.full((tq, bins), _INF, jnp.float32)
    state_i = jnp.zeros((tq, bins), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)
    for c in range(w_chunks):                               # static unroll
        off = pl.multiple_of((base + c) * bins, bins)
        kc = kt_ref[0, :, pl.ds(off, bins)]                 # (4, bins)
        kw = kc[3:4, :]
        s = jnp.broadcast_to(kw * kw, (tq, bins))
        d0 = q0 - kc[0:1, :]
        s = s + d0 * d0
        d1 = q1 - kc[1:2, :]
        s = s + d1 * d1
        d2 = q2 - kc[2:3, :]
        s = s + d2 * d2
        better = s < state_s
        state_s = jnp.where(better, s, state_s)
        state_i = jnp.where(better, lane + off, state_i)

    work = state_s
    selected = jnp.zeros((tq, bins), jnp.bool_)
    for _ in range(k_out):                                  # static unroll
        m = jnp.min(work, axis=1, keepdims=True)
        sel = work == m
        am = jnp.min(jnp.where(sel, state_i, jnp.int32(_BIG_I)),
                     axis=1, keepdims=True)
        win = sel & (state_i == am)
        selected = selected | (win & (m < valid_thresh))
        work = jnp.where(win, _INF, work)

    w = jnp.where(selected, 1.0 / jnp.maximum(state_s, 1e-16), 0.0)
    den = jnp.sum(w, axis=1, keepdims=True)
    w_norm = w / jnp.maximum(den, 1e-16)

    chunk_of = state_i // bins                              # (TQ, bins)
    acc = jnp.zeros((tq, pt_ref.shape[1]), jnp.float32)
    for c in range(w_chunks):                               # static unroll
        off = pl.multiple_of((base + c) * bins, bins)
        wc = jnp.where(chunk_of == base + c, w_norm, 0.0).astype(jnp.bfloat16)
        pc = pt_ref[0, :, pl.ds(off, bins)]                 # (C_pad, bins)
        acc = acc + jax.lax.dot_general(
            wc, pc,
            dimension_numbers=(((1,), (1,)), ((), ())),     # (TQ, C_pad)
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc


def _interp_kernel_vpu_win_packed(base_ref, q_ref, kt_ref, pt_ref, out_ref,
                                  *, k_out: int, bins: int,
                                  valid_thresh: float, w_chunks: int,
                                  idx_bits: int):
    """Windowed fused kNN+interpolation with PACKED single-reduction
    selection (see ``_knn_kernel_vpu_win_packed``). The inverse-d2 weights
    come from the truncated scores (2^-11 relative at window 4608) — finer
    than the bf16 the MXU recombine already quantizes them to (2^-8), so
    the kernel's documented precision contract is unchanged. The validity
    check runs in the packed integer domain (monotone in truncated score).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    base = base_ref[b, i]
    q = q_ref[0]                                            # (TQ, 4)
    tq = q.shape[0]
    q0 = q[:, 0:1]
    q1 = q[:, 1:2]
    q2 = q[:, 2:3]

    low = (1 << idx_bits) - 1
    sentf = _packed_sentinel(idx_bits)
    state_p = jnp.full((tq, bins), sentf, jnp.float32)
    rel0 = jax.lax.broadcasted_iota(jnp.int32, (tq, bins), 1)
    for c in range(w_chunks):                               # static unroll
        off = pl.multiple_of((base + c) * bins, bins)
        kc = kt_ref[0, :, pl.ds(off, bins)]                 # (4, bins)
        kw = kc[3:4, :]
        # 1e-35 seed: keep packed values out of the denormal/FTZ range
        # (see _knn_kernel_vpu_win_packed)
        s = jnp.broadcast_to(kw * kw + 1e-35, (tq, bins))
        d0 = q0 - kc[0:1, :]
        s = s + d0 * d0
        d1 = q1 - kc[1:2, :]
        s = s + d1 * d1
        d2 = q2 - kc[2:3, :]
        s = s + d2 * d2
        sp = jax.lax.bitcast_convert_type(s, jnp.int32)
        sp = (sp & jnp.int32(~low)) | (rel0 + c * bins)
        state_p = jnp.minimum(
            state_p, jax.lax.bitcast_convert_type(sp, jnp.float32)
        )

    # validity threshold in the packed domain: low bits zero, so
    # m < thresh_f  <=>  truncated score < truncated threshold
    thresh_f = struct.unpack("<f", struct.pack(
        "<i", struct.unpack("<i", struct.pack("<f", valid_thresh))[0] & ~low
    ))[0]

    work = state_p
    selected = jnp.zeros((tq, bins), jnp.bool_)
    for _ in range(k_out):                                  # static unroll
        m = jnp.min(work, axis=1, keepdims=True)            # (TQ, 1) f32
        win = work == m
        selected = selected | (win & (m < thresh_f))
        work = jnp.where(win, sentf, work)

    state_i = jax.lax.bitcast_convert_type(state_p, jnp.int32)
    s_trunc = jax.lax.bitcast_convert_type(
        state_i & jnp.int32(~low), jnp.float32
    )
    w = jnp.where(selected, 1.0 / jnp.maximum(s_trunc, 1e-16), 0.0)
    den = jnp.sum(w, axis=1, keepdims=True)
    w_norm = w / jnp.maximum(den, 1e-16)

    chunk_rel = (state_i & jnp.int32(low)) // bins          # (TQ, bins)
    acc = jnp.zeros((tq, pt_ref.shape[1]), jnp.float32)
    for c in range(w_chunks):                               # static unroll
        off = pl.multiple_of((base + c) * bins, bins)
        wc = jnp.where(chunk_rel == c, w_norm, 0.0).astype(jnp.bfloat16)
        pc = pt_ref[0, :, pl.ds(off, bins)]                 # (C_pad, bins)
        acc = acc + jax.lax.dot_general(
            wc, pc,
            dimension_numbers=(((1,), (1,)), ((), ())),     # (TQ, C_pad)
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc


def _window_chunks(window: int, nk_pad: int, bins: int) -> int:
    """Static chunk count for a ``window``-position scan: +1 chunk absorbs
    the base's bins-alignment rounding."""
    return min(nk_pad // bins, window // bins + 1)


def stage_window(window: int, n_keys: int, bins: int = BINS) -> int:
    """Density-scaled window for a search into ``n_keys`` sorted keys.

    A 256-query tile of an x-sorted cloud spans a thin x-slab whose
    neighbor span in SORTED KEY POSITIONS scales with the key count, so a
    single configured window (sized for the 40k bucket) over-scans
    smaller clouds ~2x. Cap it at ~``n_keys/4`` rounded up to a chunk
    (floor 5 chunks = 2560): measured in-window capture of exact
    neighborhoods on production-statistics clouds (docs/perf_notes.md
    round 5) — 12288 self K=16 @ 3072: 1.00000 (and 1.00000 down to
    2560+eps); 16384 @ 4096: 1.00000; interp 32768<-12288 K=10 @ 3072:
    1.00000 — all above the 40k bucket's accepted 0.9997 @ 4608. Also
    clamps to the largest window the key count can honor
    (w_chunks < n_chunks — the round-4 per-stage clamp), so deeper
    decimated stages keep the windowed kernels + fused LFAs.
    """
    if not window:
        return 0
    nk_pad = -(-n_keys // bins) * bins
    density_cap = max(5 * bins, -(-(n_keys // 4) // bins) * bins)
    w = min(window, density_cap)
    max_win = (nk_pad // bins - 2) * bins
    if max_win >= 2 * bins:
        w = min(w, max_win)
    return w


def _window_bases(q4p: jnp.ndarray, k4p: jnp.ndarray, tile_q: int,
                  w_chunks: int, bins: int,
                  query_mask: jnp.ndarray = None) -> jnp.ndarray:
    """(B, n_tiles) int32 window base CHUNK per query tile.

    The tile's mid-x is searchsorted into the keys' x column (pad keys —
    w != 0 — replaced by +inf so the valid sorted prefix stays monotone):
    exact quantile alignment regardless of query/key density or pad-count
    mismatch (a proportional position map would drift by thousands of
    positions when the two clouds' valid fractions differ).

    ``query_mask`` (B, Nq) bool, when given, guards the valid/pad BOUNDARY
    tile: pad query rows carry meaningless coords (decimated stages gather
    slot 0 — near the cloud's x-minimum), so a boundary tile's raw mid
    element could alias the far left edge and strand the tile's real
    queries (the largest-x points of the cloud) with a window around the
    wrong slab. The probe position is clamped to the last valid row."""
    b, nq_pad, _ = q4p.shape
    nk_pad = k4p.shape[1]
    n_tiles = nq_pad // tile_q
    mid = jnp.arange(n_tiles, dtype=jnp.int32) * tile_q + tile_q // 2
    if query_mask is not None:
        last_valid = jnp.maximum(
            jnp.sum(query_mask, axis=1).astype(jnp.int32) - 1, 0
        )                                                   # (B,)
        probe = jnp.minimum(mid[None, :], last_valid[:, None])
    else:
        probe = jnp.broadcast_to(mid[None, :], (b, n_tiles))
    qx = jnp.take_along_axis(q4p[..., 0], probe, axis=1)    # (B, n_tiles)
    kx = jnp.where(k4p[..., 3] == 0.0, k4p[..., 0], jnp.inf)
    pos = jax.vmap(jnp.searchsorted)(kx, qx)                # (B, n_tiles)
    n_chunks = nk_pad // bins
    half = (w_chunks * bins) // 2
    base = jnp.clip(
        (pos.astype(jnp.int32) - half) // bins, 0, n_chunks - w_chunks
    )
    return base.astype(jnp.int32)


def _pad_axis(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile_q", "bins", "interpret", "variant", "window", "packed"
    ),
)
def knn_topk_pallas(
    q4: jnp.ndarray,           # (B, Nq, 4) centered + pad-augmented queries
    k4: jnp.ndarray,           # (B, Nk, 4) centered + pad-augmented keys
    k: int,
    tile_q: int = TILE_Q,
    bins: int = BINS,
    interpret: bool = False,
    variant: str = "vpu",
    window: int = 0,
    query_mask: jnp.ndarray = None,   # (B, Nq) bool — window-bases guard only
    packed: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Binned approximate top-k nearest keys for every query.

    Returns (idx (B, Nq, k) int32, d2 (B, Nq, k) f32, ascending). Pad keys
    (w = 1e4) surface with d2 >= 1e8 exactly like the dense path, so the
    caller's validity thresholding is unchanged.

    ``variant`` picks the in-kernel score formulation: "vpu" (default)
    accumulates true (q-k)^2 differences on the VPU; "mxu" ranks by
    |k|^2 - 2 q.k via dot_general (kept for comparison — measured 2.6-3.4x
    slower because contraction dim 4 at HIGHEST precision runs the systolic
    array at 3% utilization, see docs/perf_notes.md).

    ``window > 0`` requires BOTH clouds x-SORTED (valid prefix ascending
    in x — ``pctl.transforms.SortPointsByX``) and scans only ~``window``
    sorted key positions around each query tile's x-slab instead of the
    whole key set (vpu variant only). Measured in-window neighbor capture
    ≥99.97 % at window 4608 on the 40k production shape — recall is
    unchanged while the distance streaming drops ~9x.

    ``packed`` (windowed path only): single-reduction packed extraction —
    returned scores are truncated DOWN to ``23 - idx_bits`` mantissa bits
    (2^-11 relative at window 4608) and near-tied neighbors within that
    precision may swap; ``packed=False`` keeps the classic exact-f32-score
    extraction (``ops.knn.knn(exact_d2=True)`` — the two-op exact
    interpolation weighting path).

    Non-differentiable by declaration (zero-tangent custom_jvp): neighbor
    indices are discrete and the forward recomputes any distance it needs
    gradients for, while pallas_call itself has no AD rule — without the
    wrapper, jit(grad(train_step)) fails to linearize.
    """
    return _topk_nodiff(
        q4, k4, query_mask, k, tile_q, bins, interpret, variant, window,
        packed,
    )


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _topk_nodiff(q4, k4, query_mask, k, tile_q, bins, interpret, variant,
                 window, packed):
    return _topk_impl(
        q4, k4, k, tile_q, bins, interpret, variant, window, query_mask,
        packed,
    )


@_topk_nodiff.defjvp
def _topk_nodiff_jvp(k, tile_q, bins, interpret, variant, window, packed,
                     primals, tangents):
    import numpy as np

    out = _topk_nodiff(
        *primals, k, tile_q, bins, interpret, variant, window, packed
    )
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
    variant: str = "vpu",
    window: int = 0,
    query_mask: jnp.ndarray = None,
    packed: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if variant not in ("vpu", "mxu"):
        raise ValueError(f"unknown kNN kernel variant {variant!r}")
    if window and variant != "vpu":
        raise ValueError("windowed kNN requires the vpu variant")
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
    kt = jnp.swapaxes(k4p, 1, 2)                            # (B, 4, Nk_pad)
    k_kernel = k
    if variant == "vpu":
        # Round the neighbor axis up to a multiple of 16 (sliced back
        # below): with the un-transposed (B, Nq, 4) query operand AND a
        # k=10 output, XLA stack-allocates the whole output tuple in
        # scoped VMEM and OOMs at the 65k-query interp shape (measured:
        # k=16 at the same shape compiles and runs; k=10 fails at any
        # large Nq; the transposed-query MXU variant compiles k=10 fine).
        k_kernel = max(16, -(-k // 16) * 16)
        # queries travel un-transposed: the kernel wants (TQ, 1) columns
        q_in = q4p                                          # (B, Nq_pad, 4)
        q_spec = pl.BlockSpec(
            (1, tile_q, 4), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        )
    else:
        q_in = jnp.swapaxes(q4p, 1, 2)                      # (B, 4, Nq_pad)
        q_spec = pl.BlockSpec(
            (1, 4, tile_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
        )
    w_chunks = _window_chunks(window, nk_pad, bins) if window else 0
    windowed = bool(window) and 0 < w_chunks < nk_pad // bins

    # The batch rides the (outer, slowest) grid dimension instead of a
    # vmap over per-cloud pallas_calls: one launch total, the key block is
    # revisited across the inner query-tile dimension so it stays VMEM-
    # resident per cloud, and XLA never sees a vmapped custom call (which
    # it answered with a scoped-VMEM stack allocation of the whole output
    # at the 65k-query interp shape — an OOM).
    out_shape = [
        jax.ShapeDtypeStruct((b, nq_pad, k_kernel), jnp.int32),
        jax.ShapeDtypeStruct((b, nq_pad, k_kernel), jnp.float32),
    ]
    if windowed:
        # Partial extraction (k_real < k_out) is validated ONLY for the
        # windowed kernel at tile_q 256: other combinations re-trigger the
        # whole-output scoped-VMEM stack allocation (21.8 MB compile OOM
        # observed for both full-scan k=1 at tile 256 and windowed at
        # tile 512) — they keep the full k_out extraction.
        idx_bits = _rel_bits(w_chunks, bins)
        if packed and idx_bits <= 16:
            kernel = functools.partial(
                _knn_kernel_vpu_win_packed, k_out=k_kernel, bins=bins,
                w_chunks=w_chunks, idx_bits=idx_bits,
                k_real=k if tile_q == 256 else k_kernel,
            )
        else:
            kernel = functools.partial(
                _knn_kernel_vpu_win, k_out=k_kernel, bins=bins,
                w_chunks=w_chunks,
                k_real=k if tile_q == 256 else k_kernel,
            )
        bases = _window_bases(q4p, k4p, tile_q, w_chunks, bins, query_mask)
        idx, score = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, nq_pad // tile_q),
                in_specs=[
                    pl.BlockSpec(
                        (1, tile_q, 4), lambda b, i, bases: (b, i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 4, nk_pad), lambda b, i, bases: (b, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, tile_q, k_kernel), lambda b, i, bases: (b, i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, tile_q, k_kernel), lambda b, i, bases: (b, i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(bases, q4p, kt)
    else:
        kern_fn = _knn_kernel_vpu if variant == "vpu" else _knn_kernel
        kernel = functools.partial(kern_fn, k_out=k_kernel, bins=bins)
        idx, score = pl.pallas_call(
            kernel,
            grid=(b, nq_pad // tile_q),
            in_specs=[
                q_spec,
                pl.BlockSpec(
                    (1, 4, nk_pad), lambda b, i: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, tile_q, k_kernel), lambda b, i: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, tile_q, k_kernel), lambda b, i: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=out_shape,
            interpret=interpret,
        )(q_in, kt)
    if variant == "vpu":
        # the kernel already produced true squared distances
        d2 = jnp.maximum(score[:, :nq, :k], 0.0)
    else:
        # restore the rank-invariant |q|^2 term dropped inside the kernel
        qn = jnp.sum(q4 * q4, axis=-1, keepdims=True)       # (B, Nq, 1)
        d2 = jnp.maximum(score[:, :nq, :k] + qn, 0.0)
    return idx[:, :nq, :k], d2


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "bins", "interpret", "window")
)
def knn_interpolate_pallas(
    x: jnp.ndarray,            # (B, Nk, C) payload at key points
    key_pos: jnp.ndarray,      # (B, Nk, 3)
    key_mask: jnp.ndarray,     # (B, Nk) bool
    query_pos: jnp.ndarray,    # (B, Nq, 3)
    k: int,
    tile_q: int = TILE_Q,
    bins: int = BINS,
    interpret: bool = False,
    window: int = 0,
    query_mask: jnp.ndarray = None,   # (B, Nq) bool — window-bases guard only
) -> jnp.ndarray:
    """Fused binned-kNN + inverse-squared-distance interpolation.

    Returns (B, Nq, C) float32 — pyg ``knn_interpolate`` semantics
    (w = 1/max(d2, 1e-16), y = Σ w·x / Σ w) over the same binned
    approximate neighborhoods as ``knn_topk_pallas``; queries whose every
    neighbor slot fell on a pad key return 0. The payload recombine runs
    on the MXU at bf16 (ulp 2^-8, ~4e-3 relative — coarser than the f16
    wire; see the kernel docstring for the full precision contract and
    the f32 escape hatch).

    Predict-path only: no AD rule is defined (the payload enters linearly,
    so a zero-tangent declaration would be *wrong*, unlike the index
    kernels) — differentiating through this op fails loudly.
    """
    from myria3d_tpu.ops.knn import (  # late: knn imports this module
        _VALID_THRESH,
        _augment_keys,
        _augment_queries,
    )

    b, nq, _ = query_pos.shape
    nk = key_pos.shape[1]
    c = x.shape[-1]
    # Same per-cloud centering as ops.knn: georeferenced magnitudes would
    # otherwise cancel catastrophically in the f32 difference terms.
    cnt = jnp.maximum(jnp.sum(key_mask, axis=1), 1)
    offset = (
        jnp.sum(jnp.where(key_mask[..., None], key_pos, 0.0), axis=1)
        / cnt[..., None].astype(key_pos.dtype)
    )[:, None, :]
    q4 = _augment_queries(query_pos - offset)
    k4 = _augment_keys(key_pos - offset, key_mask)

    q4p = _pad_axis(q4, 1, tile_q)
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

    c_pad = -(-c // 16) * 16        # payload rides bf16 sublanes (16, 128)
    xp = _pad_axis(_pad_axis(x.astype(jnp.bfloat16), 1, bins), 2, c_pad)
    pt = jnp.swapaxes(xp, 1, 2)                             # (B, C_pad, Nk_pad)
    kt = jnp.swapaxes(k4p, 1, 2)                            # (B, 4, Nk_pad)

    w_chunks = _window_chunks(window, nk_pad, bins) if window else 0
    windowed = bool(window) and 0 < w_chunks < nk_pad // bins
    out_shape = jax.ShapeDtypeStruct((b, nq_pad, c_pad), jnp.float32)
    if windowed:
        idx_bits = _rel_bits(w_chunks, bins)
        if idx_bits <= 16:
            # packed single-reduction selection: truncated-score weights
            # (2^-11 at window 4608) are finer than the bf16 recombine
            kernel = functools.partial(
                _interp_kernel_vpu_win_packed, k_out=min(k, nk), bins=bins,
                valid_thresh=_VALID_THRESH, w_chunks=w_chunks,
                idx_bits=idx_bits,
            )
        else:
            kernel = functools.partial(
                _interp_kernel_vpu_win, k_out=min(k, nk), bins=bins,
                valid_thresh=_VALID_THRESH, w_chunks=w_chunks,
            )
        bases = _window_bases(q4p, k4p, tile_q, w_chunks, bins, query_mask)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, nq_pad // tile_q),
                in_specs=[
                    pl.BlockSpec(
                        (1, tile_q, 4), lambda b, i, bases: (b, i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 4, nk_pad), lambda b, i, bases: (b, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, c_pad, nk_pad), lambda b, i, bases: (b, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, tile_q, c_pad), lambda b, i, bases: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(bases, q4p, kt, pt)
        return out[:, :nq, :c]
    kernel = functools.partial(
        _interp_kernel_vpu, k_out=min(k, nk), bins=bins,
        valid_thresh=_VALID_THRESH,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nq_pad // tile_q),
        in_specs=[
            pl.BlockSpec(
                (1, tile_q, 4), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, nk_pad), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c_pad, nk_pad), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q, c_pad), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(q4p, kt, pt)
    return out[:, :nq, :c]


# Ceiling on statically-unrolled key chunks for the fused interp kernel:
# phases 1 and 3 each unroll n_chunks iterations, and Mosaic compile
# time/scoped VMEM grow with the unroll. Validated up to 80 chunks (the
# 40k production bucket); 96 leaves headroom without approving unmeasured
# compile regimes (the old payload-plane design OOMed the compiler this
# way before its 24-chunk guard existed).
_INTERP_MAX_CHUNKS = 96


def interp_pallas_available(k: int, nk: int, c: int,
                            tile_q: int = TILE_Q, bins: int = BINS,
                            window: int = 0) -> bool:
    """Gate for the fused kNN+interpolate kernel: the index-kernel rules,
    a statically-unrolled-chunk ceiling (``_INTERP_MAX_CHUNKS``), and a
    VMEM budget over the persistent per-tile planes (score, index, lane,
    work, selected, weights, chunk-of — ~7 (TQ, bins) f32-sized planes
    live across the phases) plus the resident key + bf16 payload tables.
    A sorted ``window`` unrolls only its own chunks, lifting the ceiling
    for very large key sets."""
    if not knn_pallas_available(k, nk):
        return False
    n_chunks = -(-nk // bins)
    unrolled = _window_chunks(window, n_chunks * bins, bins) if window else n_chunks
    if unrolled > _INTERP_MAX_CHUNKS:
        return False
    c_pad = -(-c // 16) * 16
    nk_pad = n_chunks * bins
    state = 7 * tile_q * bins * 4
    tables = 4 * nk_pad * 4 + c_pad * nk_pad * 2     # coords f32 + payload bf16
    return state + tables < 12 * 1024 * 1024


def knn_pallas_available(k: int, nk: int) -> bool:
    """Fast path gate: TPU backend, whole local batch per program instance
    (single chip or per-shard inside shard_map — same rule as the k=1
    kernel), and a key set large enough that binning beats the dense path."""
    from myria3d_tpu.ops.pallas_nn1 import nn1_available

    return k <= 64 and nk >= 2 * BINS and nn1_available()
