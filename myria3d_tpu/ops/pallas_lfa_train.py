"""Fused windowed LFA for TRAINING — batch-moment BN + hand-written VJP.

The eval-side fused LFA (``ops/pallas_lfa.py``) removes the RandLA-Net
block's edge tensors from HBM but is eval-only: BatchNorm folds to an
affine only with RUNNING stats, and ``pallas_call`` has no AD rule. The
train step therefore kept the unfused path, whose cost is NOT arithmetic
but data movement around the ``(B, C, K, N)`` edge tensors: the op-level
profile (docs/perf_notes.md round 4 cont. 3) shows the step's timeline
dominated by layout copies and async slice streams of exactly those
tensors, plus the neighbor gathers and their VJPs.

This module makes the FUSED path trainable with three observations:

1. **BN batch moments are rel-statistics.** The only BN inside the fused
   region normalizes ``e = W_e·rel + b_e`` over valid (B, K, N) slots,
   and ``rel`` (the 10-channel LocSE geometry) does not depend on ``x``
   or any parameter. Hence ``μ = W_eᵀ·r̄ + b_e`` and
   ``var_c = w_cᵀ·Cov(rel)·w_c`` — exact masked batch moments from an
   11×11 second-moment matrix ``Σ [rel;1]·[rel;1]ᵀ`` that a tiny kernel
   (``_relstats``) accumulates per cloud (one MXU dot per query tile,
   count included for free in the ones-row corner). No edge tensor, no
   extra pass over features.

2. **The forward IS the eval kernel.** With batch moments in hand, the
   train-mode Dense→BN→LeakyReLU chain folds to the same per-channel
   affine the eval kernel consumes (``enc_a = (γ/σ_b)·W_eᵀ``,
   ``enc_c = (γ/σ_b)(b_e − μ_b) + β``) — ``lfa_attention_pallas`` runs
   unchanged.

3. **The backward needs ONE kernel.** Writing the VJP of
   gather→LocSE→affine-BN→lrelu→concat→attention→masked-softmax→pool by
   hand (``_lfa_bwd_kernel``): per query tile it recomputes the forward
   in VMEM (recompute beats HBM round-trips), then accumulates
   ``dx`` (windowed one-hot scatter, as in ``ops/pallas_gather.py``),
   ``d(att_t)``, ``dγ``, ``dβ`` and the BN-backward cross terms
   ``S1 = Σ dê``, ``S2 = Σ dê·ê``, ``M1 = Σ dê·relᵀ``. The remaining
   reductions of the BN/W_e chain rule are again rel-statistics and
   finish in XLA:

     ``d_e = σ⁻¹(dê − S1/n − ê·S2/n)``
     ``d_We[j,c] = σ_c⁻¹(M1ᵀ[j,c] − S1_c·Σrel_j/n − S2_c·Σ(ê_c·rel_j)/n)``
     with ``Σ ê_c·rel_j = σ_c⁻¹(w_cᵀ·Srr[:,j] + (b_c−μ_c)·Σrel_j)``
     and ``d_be ≡ 0`` (a bias immediately before BN has zero gradient).

   Residuals are just the op inputs plus the 11×11 stats — the VJP saves
   NO edge tensors.

Gradient/forward precision: positions ride the bf16 hi/lo split and
features plain bf16, exactly like the eval kernel (~4e-3 relative on
features) — the backward recomputes from the SAME quantized table, so
gradients are consistent with the computed forward. The rel-statistics
and all backward accumulations are f32 (dots at ``Precision.HIGHEST``).

Reference: trains ``LocalFeatureAggregation``
(``pyg_randla_net.py:112-152``) with torch BatchNorm1d batch-moment
semantics; module-level parity and grad tests in
``tests/.../test_pallas_lfa_train.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myria3d_tpu.models.modules.nn import BN_EPS, LRELU_SLOPE
from myria3d_tpu.ops.pallas_knn import BINS, TILE_Q, _pad_axis
from myria3d_tpu.ops.pallas_lfa import (
    _GBINS,
    _ROW_FEAT,
    _ROW_HI,
    _ROW_LO,
    _ROW_ONE,
    lfa_attention_pallas,
)

_BIG_I = 2**30
_NEG = -3e38

# Tests set this to run the kernels in interpret mode off-TPU.
FORCE_INTERPRET = False


# ---------------------------------------------------------------------------
# shared geometry helpers
# ---------------------------------------------------------------------------

# shared with the eval kernel — bases derive from the indices themselves
from myria3d_tpu.ops.pallas_lfa import _bases_from_idx_qmajor  # noqa: E402


def _build_payload(x, pos, bins):
    """bf16 payload table (B, P_pad, Nk_pad): pos hi/lo split at the
    aligned row groups of the eval kernel, ones row, features."""
    b, n, c_in = x.shape
    pos_hi = pos.astype(jnp.bfloat16)
    pos_lo = (pos - pos_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    feat_rows = -(-c_in // 8) * 8
    zero3_5 = jnp.zeros((b, n, 5), jnp.bfloat16)
    payload = jnp.concatenate([
        pos_hi, zero3_5, pos_lo, zero3_5,
        jnp.ones((b, n, 1), jnp.bfloat16),
        jnp.zeros((b, n, 7), jnp.bfloat16),
        _pad_axis(x.astype(jnp.bfloat16), 2, feat_rows),
    ], axis=-1)
    payload = _pad_axis(payload, 1, bins)
    return jnp.swapaxes(payload, 1, 2)       # (B, P_pad, Nk_pad)


def _gather_slab(base, idx_ref, pt_ref, acc_ref, *, k, bins, w_chunks):
    """The eval kernel's windowed one-hot gather: fill acc_ref (P, K*TQ)
    from the payload table; returns (idx matrix, tq)."""
    idxm = idx_ref[0]                                       # (TQ, K)
    tq = idxm.shape[0]
    idx_min = jnp.min(jnp.where(idxm >= 0, idxm, jnp.int32(_BIG_I)))
    idx_max = jnp.max(idxm)

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
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    return idxm, tq


def _rel_from_slab(g, qt, k, tq):
    """LocSE geometry (11, K*TQ) = [pos_i, pos_j, diff, |diff|] + validity
    row, from the gather slab and the tile's query coords."""
    pos_j = g[_ROW_HI:_ROW_HI + 3] + g[_ROW_LO:_ROW_LO + 3]
    val = g[_ROW_ONE:_ROW_ONE + 1]                          # (1, K*TQ)
    pos_i = qt[0][0:3] + 0.0                                # (3, TQ)
    pos_i_w = jnp.concatenate([pos_i] * k, axis=1)          # (3, K*TQ)
    diff = pos_j - pos_i_w
    dist = jnp.sqrt(jnp.maximum(
        jnp.sum(diff * diff, axis=0, keepdims=True), 0.0
    ))
    rel = jnp.concatenate([pos_i_w, pos_j, diff, dist], axis=0)  # (10, el)
    return rel, val


# ---------------------------------------------------------------------------
# pass A: per-cloud rel second moments (11x11)
# ---------------------------------------------------------------------------

def _relstats_kernel(base_ref, qt_ref, idx_ref, pt_ref, out_ref, acc_ref, *,
                     k: int, bins: int, w_chunks: int):
    """out_ref (1, 16, 16): S[i,j] = Σ_valid z_i z_j with z = [rel; val]
    (so row/col 10 hold Σrel and the count)."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    _, tq = _gather_slab(base_ref[b, i], idx_ref, pt_ref, acc_ref,
                         k=k, bins=bins, w_chunks=w_chunks)
    rel, val = _rel_from_slab(acc_ref[...], qt_ref, k, tq)
    relz = jnp.concatenate([rel * val, val], axis=0)        # (11, el)
    relz = jnp.concatenate(
        [relz, jnp.zeros((5, relz.shape[1]), jnp.float32)], axis=0
    )                                                       # (16, el)
    out_ref[0] += jax.lax.dot_general(
        relz, relz,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# pass C: fused backward
# ---------------------------------------------------------------------------

def _lfa_bwd_kernel(base_ref, qt_ref, idx_ref, pt_ref, enc_ref, attp_ref,
                    g_ref, dx_ref, dwa_ref, dsc_ref, dm1_ref, acc_ref, *,
                    k: int, bins: int, w_chunks: int, c_in: int, c_out: int):
    """One (cloud, query-tile) backward step. Recomputes the forward from
    the payload table, then accumulates into per-cloud blocks:

    enc_ref: (1, EC, 32) f32 — cols 0..9 A_ê = σ⁻¹·W_eᵀ, col 10 c_ê =
        σ⁻¹(b_e − μ), col 16 γ, col 17 β (8-aligned groups);
    attp_ref: (1, 2*C_pad, C_pad) f32 — rows [0:C] att_t (= W_aᵀ, the
        forward operand), rows [C:2C] W_a (for d_lf = W_a·d_att);
    g_ref: (1, C_pad, TQ) f32 — pooled-output cotangent, channels-first;
    dx_ref:  (1, C2p, Nk_pad) — feature gradient (windowed scatter);
    dwa_ref: (1, C_pad, C_pad) — d(att_t);
    dsc_ref: (1, C2p, 8) — cols 0 dγ, 1 dβ, 2 S1, 3 S2;
    dm1_ref: (1, C2p, 16) — cols 0..9 M1 = Σ dê·relᵀ;
    acc_ref: (P_pad, K*TQ) f32 scratch (gather slab).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dm1_ref[...] = jnp.zeros_like(dm1_ref)

    base = base_ref[b, i]
    idxm, tq = _gather_slab(base, idx_ref, pt_ref, acc_ref,
                            k=k, bins=bins, w_chunks=w_chunks)
    el = k * tq
    g = acc_ref[...]
    rel, val = _rel_from_slab(g, qt_ref, k, tq)             # (10, el), (1, el)
    x_j = g[_ROW_FEAT:_ROW_FEAT + c_in]                     # (c_in, el)

    enc_a = enc_ref[0][:, 0:10]                             # (C2, 10)
    enc_c = enc_ref[0][:, 10:11]
    gam = enc_ref[0][:, 16:17]                              # (C2, 1)
    bet = enc_ref[0][:, 17:18]
    c_pad = attp_ref.shape[2]
    att_t = attp_ref[0][0:c_pad]                            # (C_pad, C_pad)
    w_a = attp_ref[0][c_pad:2 * c_pad]

    # ---- forward recompute (same math as the eval kernel) ----
    e_hat = jax.lax.dot_general(
        enc_a, rel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + enc_c                                               # (C2, el)
    u = gam * e_hat + bet
    z = jnp.where(u >= 0.0, u, LRELU_SLOPE * u)
    parts = [x_j, z]
    if c_pad > c_out:
        parts.append(jnp.zeros((c_pad - c_out, el), jnp.float32))
    lf = jnp.concatenate(parts, axis=0)                     # (C_pad, el)
    att = jax.lax.dot_general(
        att_t, lf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # masked softmax over the K slots (eval-kernel formulation)
    m = jnp.full((c_pad, tq), _NEG, jnp.float32)
    for kk in range(k):                                     # static unroll
        sl = slice(kk * tq, (kk + 1) * tq)
        m = jnp.maximum(m, jnp.where(val[:, sl] > 0.0, att[:, sl], _NEG))
    s_sum = jnp.zeros((c_pad, tq), jnp.float32)
    for kk in range(k):
        sl = slice(kk * tq, (kk + 1) * tq)
        s_sum = s_sum + jnp.where(
            val[:, sl] > 0.0, jnp.exp(att[:, sl] - m), 0.0
        )
    s_den = jnp.maximum(s_sum, 1e-16)
    s_parts = []
    pooled = jnp.zeros((c_pad, tq), jnp.float32)
    for kk in range(k):
        sl = slice(kk * tq, (kk + 1) * tq)
        s_k = jnp.where(
            val[:, sl] > 0.0, jnp.exp(att[:, sl] - m), 0.0
        ) / s_den
        s_parts.append(s_k)
        pooled = pooled + s_k * lf[:, sl]
    s_wide = jnp.concatenate(s_parts, axis=1)               # (C_pad, el)

    # ---- backward ----
    gt = g_ref[0]                                           # (C_pad, TQ)
    t_term = gt * pooled                                    # Σ_j s_j·ds_j
    da_parts = []
    dlf_parts = []
    for kk in range(k):
        sl = slice(kk * tq, (kk + 1) * tq)
        ds_k = gt * lf[:, sl]
        da_parts.append(s_parts[kk] * (ds_k - t_term))
        dlf_parts.append(gt * s_parts[kk])
    d_att = jnp.concatenate(da_parts, axis=1)               # (C_pad, el)
    d_lf = jnp.concatenate(dlf_parts, axis=1) + jax.lax.dot_general(
        w_a, d_att, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dwa_ref[0] += jax.lax.dot_general(
        d_att, lf, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    d_xj = d_lf[0:c_in]                                     # (c_in, el)
    d_z = d_lf[c_in:2 * c_in]
    d_u = d_z * jnp.where(u >= 0.0, 1.0, LRELU_SLOPE)
    d_ehat = gam * d_u

    c2p = dsc_ref.shape[1]

    def _padc(a):
        return jnp.concatenate(
            [a, jnp.zeros((c2p - c_in, a.shape[1]), jnp.float32)], axis=0
        ) if c2p > c_in else a

    dsc_ref[0, :, 0:1] += _padc(
        jnp.sum(d_u * e_hat, axis=1, keepdims=True))        # dγ
    dsc_ref[0, :, 1:2] += _padc(
        jnp.sum(d_u, axis=1, keepdims=True))                # dβ
    dsc_ref[0, :, 2:3] += _padc(
        jnp.sum(d_ehat, axis=1, keepdims=True))             # S1
    dsc_ref[0, :, 3:4] += _padc(
        jnp.sum(d_ehat * e_hat, axis=1, keepdims=True))     # S2
    m1 = jax.lax.dot_general(
        d_ehat, rel, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                       # (C2, 10)
    dm1_ref[0, :, 0:10] += _padc(m1)

    # windowed one-hot scatter of d_xj into the feature-gradient block
    idx_min = jnp.min(jnp.where(idxm >= 0, idxm, jnp.int32(_BIG_I)))
    idx_max = jnp.max(idxm)
    n_sub = (w_chunks * bins) // _GBINS
    for s in range(n_sub):                                  # static unroll
        off = pl.multiple_of(base * bins + s * _GBINS, _GBINS)

        @pl.when((off + _GBINS > idx_min) & (off <= idx_max))
        def _():
            lane = off + jax.lax.broadcasted_iota(
                jnp.int32, (tq, _GBINS), 1
            )
            contrib = jnp.zeros((c2p, _GBINS), jnp.float32)
            for kk in range(k):                             # static unroll
                onehot = (lane == idxm[:, kk:kk + 1]).astype(jnp.bfloat16)
                dk = d_xj[:, kk * tq:(kk + 1) * tq]         # (c_in, TQ)
                dk_hi = dk.astype(jnp.bfloat16)
                dk_lo = (dk - dk_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                both = jax.lax.dot_general(
                    jnp.concatenate([dk_hi, dk_lo], axis=0), onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # (2*c_in, g)
                contrib += _padc(both[0:c_in] + both[c_in:2 * c_in])
            dx_ref[0, :, pl.ds(off, _GBINS)] += contrib


# ---------------------------------------------------------------------------
# wrapper: stats, forward, custom VJP
# ---------------------------------------------------------------------------

def _w_chunks(window: int, bins: int) -> int:
    return window // bins + 1


def _prep(x, pos, mask, idx, neigh_valid, tile_q, bins):
    b, n, c_in = x.shape
    kk = idx.shape[-1]
    idx_m = _pad_axis(
        jnp.where(neigh_valid, idx, -1).astype(jnp.int32), 1, tile_q
    )
    if idx_m.shape[1] > n:
        idx_m = idx_m.at[:, n:].set(-1)
    pt = _build_payload(x, pos, bins)
    q4 = jnp.concatenate(
        [pos, jnp.zeros(pos.shape[:-1] + (1,), pos.dtype)], axis=-1
    )
    qt = jnp.swapaxes(_pad_axis(q4, 1, tile_q), 1, 2)       # (B, 4, Nq_pad)
    return idx_m, pt, qt


def rel_stats(x, pos, mask, idx, neigh_valid, window,
              tile_q=TILE_Q, bins=BINS, interpret=False):
    """(B, 16, 16) masked second moments of [rel; val] per cloud."""
    b, n, c_in = x.shape
    kk = idx.shape[-1]
    idx_m, pt, qt = _prep(x, pos, mask, idx, neigh_valid, tile_q, bins)
    nq_pad = idx_m.shape[1]
    n_tiles = nq_pad // tile_q
    p_rows, nk_pad = pt.shape[1], pt.shape[2]
    n_chunks = nk_pad // bins
    wc = min(n_chunks, _w_chunks(window, bins))
    bases = _bases_from_idx_qmajor(idx_m, tile_q, bins, wc, n_chunks)

    kernel = functools.partial(
        _relstats_kernel, k=kk, bins=bins, w_chunks=wc
    )
    return pl.pallas_call(
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
            ],
            out_specs=pl.BlockSpec(
                (1, 16, 16), lambda b, i, bases: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((p_rows, kk * tile_q), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 16, 16), jnp.float32),
        interpret=interpret,
    )(bases, qt, idx_m, pt)


def _moments(stats, w_e, b_e):
    """Exact masked batch moments of e = W_eᵀ·rel + b_e from the summed
    (16,16) rel statistics. Returns (mu, var_biased, n)."""
    s = jnp.sum(stats, axis=0)                              # (16, 16)
    n = jnp.maximum(s[10, 10], 1.0)
    sum_rel = s[10, 0:10]                                   # Σrel
    srr = s[0:10, 0:10]                                     # Σ rel·relᵀ
    r_bar = sum_rel / n
    mu = r_bar @ w_e + b_e                                  # (C2,)
    cov = srr / n - jnp.outer(r_bar, r_bar)
    var = jnp.maximum(jnp.einsum("ic,ij,jc->c", w_e, cov, w_e), 0.0)
    return mu, var, n, sum_rel, srr


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13)
)
def _lfa_train(x, pos, mask, idx, neigh_valid, w_e, b_e, gamma, beta, att_t,
               window, tile_q, bins, interpret):
    out, _ = _lfa_train_fwd(x, pos, mask, idx, neigh_valid, w_e, b_e,
                            gamma, beta, att_t, window, tile_q, bins,
                            interpret)
    return out


def _fold_affines(stats, w_e, b_e, gamma, beta):
    mu, var, n, sum_rel, srr = _moments(stats, w_e, b_e)
    inv_sigma = jax.lax.rsqrt(var + BN_EPS)                 # (C2,)
    a_hat = inv_sigma[:, None] * w_e.T                      # (C2, 10)
    c_hat = inv_sigma * (b_e - mu)
    enc_a = gamma[:, None] * a_hat
    enc_c = gamma * c_hat + beta
    return mu, var, n, sum_rel, srr, inv_sigma, a_hat, c_hat, enc_a, enc_c


def _lfa_train_fwd(x, pos, mask, idx, neigh_valid, w_e, b_e, gamma, beta,
                   att_t, window, tile_q, bins, interpret):
    stats = rel_stats(x, pos, mask, idx, neigh_valid, window,
                      tile_q, bins, interpret)
    (mu, var, n, _, _, _, _, _, enc_a, enc_c) = _fold_affines(
        stats, w_e, b_e, gamma, beta
    )
    pooled = lfa_attention_pallas(
        x.astype(jnp.float32), pos, mask, idx, neigh_valid,
        enc_a, enc_c, att_t, window=window, tile_q=tile_q, bins=bins,
        interpret=interpret,
    )                                                       # (B, N, C)
    res = (x, pos, mask, idx, neigh_valid, w_e, b_e, gamma, beta, att_t,
           stats)
    return (pooled, mu, var, n), res


def _lfa_train_bwd(window, tile_q, bins, interpret, res, cts):
    (x, pos, mask, idx, neigh_valid, w_e, b_e, gamma, beta, att_t,
     stats) = res
    d_pooled = cts[0]                                       # (B, N, C)
    b, n, c_in = x.shape
    kk = idx.shape[-1]
    c_out = att_t.shape[0]

    (mu, var, nn_, sum_rel, srr, inv_sigma, a_hat, c_hat, enc_a, enc_c
     ) = _fold_affines(stats, w_e, b_e, gamma, beta)

    idx_m, pt, qt = _prep(x, pos, mask, idx, neigh_valid, tile_q, bins)
    nq_pad = idx_m.shape[1]
    n_tiles = nq_pad // tile_q
    p_rows, nk_pad = pt.shape[1], pt.shape[2]
    n_chunks = nk_pad // bins
    wc = min(n_chunks, _w_chunks(window, bins))
    bases = _bases_from_idx_qmajor(idx_m, tile_q, bins, wc, n_chunks)

    # enc table: A_ê | c_ê | γ | β at 8-aligned column groups
    ec = c_in
    enc_tab = jnp.zeros((ec, 32), jnp.float32)
    enc_tab = enc_tab.at[:, 0:10].set(a_hat)
    enc_tab = enc_tab.at[:, 10].set(c_hat)
    enc_tab = enc_tab.at[:, 16].set(gamma)
    enc_tab = enc_tab.at[:, 17].set(beta)
    enc_tab = enc_tab[None]                                 # (1, EC, 32)

    c_pad = max(8, -(-c_out // 8) * 8)
    att_pad = _pad_axis(_pad_axis(att_t, 0, c_pad), 1, c_pad)
    attp = jnp.concatenate([att_pad, att_pad.T], axis=0)[None]

    # pooled cotangent, channels-first padded
    g_cf = _pad_axis(
        _pad_axis(jnp.swapaxes(d_pooled.astype(jnp.float32), 1, 2),
                  1, c_pad), 2, tile_q,
    )                                                       # (B, C_pad, Nq_pad)

    c2p = max(8, -(-c_in // 8) * 8)
    kernel = functools.partial(
        _lfa_bwd_kernel, k=kk, bins=bins, w_chunks=wc,
        c_in=c_in, c_out=c_out,
    )
    dx_blk, dwa, dsc, dm1 = pl.pallas_call(
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
                pl.BlockSpec((1, ec, 32), lambda b, i, bases: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * c_pad, c_pad),
                             lambda b, i, bases: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_pad, tile_q),
                             lambda b, i, bases: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, c2p, nk_pad),
                             lambda b, i, bases: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_pad, c_pad),
                             lambda b, i, bases: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c2p, 8), lambda b, i, bases: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c2p, 16), lambda b, i, bases: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((p_rows, kk * tile_q), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, c2p, nk_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, c_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, c2p, 8), jnp.float32),
            jax.ShapeDtypeStruct((b, c2p, 16), jnp.float32),
        ],
        interpret=interpret,
    )(bases, qt, idx_m, pt, enc_tab, attp, g_cf)

    d_x = jnp.swapaxes(dx_blk[:, :c_in, :n], 1, 2).astype(x.dtype)
    d_att_t = jnp.sum(dwa, axis=0)[:c_out, :c_out]
    sc = jnp.sum(dsc, axis=0)[:c_in]                        # (C2, 8)
    d_gamma, d_beta = sc[:, 0], sc[:, 1]
    s1, s2 = sc[:, 2], sc[:, 3]
    m1 = jnp.sum(dm1, axis=0)[:c_in, 0:10]                  # (C2, 10)

    # d_We from the rel statistics (module docstring):
    #   Σ ê_c·rel_j = σ_c⁻¹ (w_cᵀ·Srr[:,j] + (b_c − μ_c)·Σrel_j)
    e_rel = inv_sigma[:, None] * (
        w_e.T @ srr + (b_e - mu)[:, None] * sum_rel[None, :]
    )                                                       # (C2, 10)
    d_we_t = inv_sigma[:, None] * (
        m1 - (s1[:, None] * sum_rel[None, :]) / nn_
        - (s2[:, None] * e_rel) / nn_
    )                                                       # (C2, 10)
    d_we = d_we_t.T                                         # (10, C2)
    d_be = jnp.zeros_like(b_e)  # bias before BN: exactly zero gradient

    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (d_x, jnp.zeros_like(pos), f0(mask), f0(idx), f0(neigh_valid),
            d_we, d_be, d_gamma, d_beta, d_att_t)


_lfa_train.defvjp(_lfa_train_fwd, _lfa_train_bwd)


def lfa_train_available(nk: int, k: int, window: int, c_in: int,
                        tile_q: int = TILE_Q, bins: int = BINS) -> bool:
    """Gate: TPU single-chip/per-shard, genuinely windowed, K bounded,
    VMEM budget over payload table + slab + backward planes + blocks."""
    from myria3d_tpu.ops.pallas_lfa import lfa_fused_available

    if not lfa_fused_available(nk, k, window, c_in=c_in,
                               tile_q=tile_q, bins=bins):
        return False
    nk_pad = -(-nk // bins) * bins
    el = k * tile_q
    c_pad = max(8, -(-2 * c_in // 8) * 8)
    c2p = max(8, -(-c_in // 8) * 8)
    p_rows = _ROW_FEAT + -(-c_in // 8) * 8
    table = p_rows * nk_pad * 2
    slab = p_rows * el * 4
    planes = 8 * c_pad * el * 4       # lf/att/s/d_att/d_lf/rel/… live set
    dx = c2p * nk_pad * 4
    onehot = tile_q * _GBINS * (4 + 2)
    return table + slab + planes + dx + onehot < 13 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("window", "tile_q", "bins", "interpret")
)
def lfa_train_pallas(
    x: jnp.ndarray,            # (B, N, C_in) features (= channels // 2)
    pos: jnp.ndarray,          # (B, N, 3)
    mask: jnp.ndarray,         # (B, N) bool
    idx: jnp.ndarray,          # (B, N, K) i32 windowed-kNN indices
    neigh_valid: jnp.ndarray,  # (B, N, K) bool
    w_e: jnp.ndarray,          # (10, C_in) mlp_encoder Dense kernel
    b_e: jnp.ndarray,          # (C_in,) mlp_encoder Dense bias
    gamma: jnp.ndarray,        # (C_in,) BN scale
    beta: jnp.ndarray,         # (C_in,) BN bias
    att_t: jnp.ndarray,        # (C, C) attention kernel TRANSPOSED
    window: int,
    tile_q: int = TILE_Q,
    bins: int = BINS,
    interpret: bool = False,
):
    """Train-mode fused LFA: (pooled (B, N, C), mu, var_biased, n) with
    batch-moment BN and a hand-written VJP w.r.t. (x, w_e, b_e, gamma,
    beta, att_t). Cotangents of mu/var/n are ignored (they only feed the
    running-stat update, which carries no loss gradient)."""
    return _lfa_train(x, pos, mask, idx, neigh_valid, w_e, b_e, gamma,
                      beta, att_t, window, tile_q, bins, interpret)
