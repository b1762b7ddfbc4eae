"""Neighbor gather with a windowed one-hot MXU scatter-add VJP.

The train step's bound is the BACKWARD of the RandLA-Net neighbor gathers
(docs/perf_notes.md round 4): each gather's VJP is an XLA scatter-add —
serialized descriptor-bound row updates, ~21 ms per stage-1 gather at the
B=8/12k train shape (the forward gathers themselves stream at ~9 ms and
are not worth replacing: a one-hot MXU forward was measured SLOWER at
25 ms because the payload has only ~8 rows, so the systolic array runs at
6 % row occupancy while the one-hot build and 6-pass f32 precision pay
full price).

This op therefore keeps XLA's forward gather and swaps ONLY the VJP: over
x-SORTED clouds (the ``SortPointsByX`` / ``RandLANet.sort_inputs``
contract of the windowed kNN) every neighbor index of a 256-query tile
lies in a contiguous sorted-position window, so the scatter-add becomes
per-key-chunk matmuls ``dout_k(P, TQ) @ onehot(TQ, g)`` accumulated into
a VMEM-resident ``(P, Nk)`` gradient block per cloud — the sums ride the
MXU's f32 accumulator instead of the scatter unit. Chunks outside the
tile's actual index span are skipped at runtime (``pl.when``).

Gradient precision (``grad_precision``):

- ``"hilo"`` (default): ``dout`` rides the MXU as a bf16 hi/lo SPLIT
  (hi = bf16(d), lo = bf16(d - hi)); the f32 accumulator re-sums the two
  planes to ~2^-16 relative — one bf16 pass over 2P rows instead of six
  f32 passes over P.
- ``"exact"``: f32 operands at ``Precision.HIGHEST`` — bit-grade sums
  (up to summation order vs the XLA scatter), ~3x slower.

Forward semantics differ from a raw gather in ONE way: invalid neighbor
slots (``neigh_valid`` False — ``knn._finalize`` clamps their index to 0)
return ZEROS instead of an arbitrary row. Downstream LFA math masks those
slots anyway (masked softmax weight 0, masked BN moments), so module
outputs and gradients are unchanged, and the VJP consistently drops their
cotangents.

Window contract: every VALID index of a 256-query tile must lie within
``floor(min_idx/bins)*bins + w_chunks*bins`` where ``w_chunks =
window//bins + 1`` — guaranteed by construction when ``idx`` comes from
the windowed kNN over the same window and tile grid (``ops/pallas_knn``:
identical TILE_Q, and every returned index lies inside that tile's
scanned chunk span). Reference: the gathers implement
``pyg_randla_net.py:112-152``'s neighborhood message build.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myria3d_tpu.ops.pallas_knn import BINS, TILE_Q, _pad_axis

_BIG_I = 2**30
_GBINS = 512          # key sub-chunk width (lane axis of the one-hot)

# Tests set this to run the kernel in interpret mode off-TPU.
FORCE_INTERPRET = False


def _scatter_kernel(base_ref, idx_ref, dout_ref, dpt_ref, *,
                    k: int, bins: int, w_chunks: int, grad_precision: str):
    """One (cloud, query-tile) step: accumulate the tile's cotangents into
    the cloud's (P_pad, Nk_pad) gradient block (resident in VMEM across
    the inner tile loop; written back when the cloud index advances).

    base_ref: (B, n_tiles) scalar-prefetched window base chunk;
    idx_ref:  (1, K, TQ) i32 TRANSPOSED neighbor indices, invalid = -1 —
        lane-major queries slice straight out of the (B, K, Nq) layout
        the forward gather and the LFA's nv_t already consume, so Pallas
        block reads need NO idx relayout copy (a (B, Nq, K) operand
        measured a 9 ms tile-form conversion per step);
    dout_ref: (1, P_pad, K, TQ) f32 cotangents;
    dpt_ref:  (1, P_pad, Nk_pad) f32 gradient block.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    base = base_ref[b, i]

    @pl.when(i == 0)
    def _():
        dpt_ref[...] = jnp.zeros_like(dpt_ref)

    idxm = idx_ref[0]                                       # (K, TQ)
    tq = idxm.shape[1]
    idx_min = jnp.min(jnp.where(idxm >= 0, idxm, jnp.int32(_BIG_I)))
    idx_max = jnp.max(idxm)                                 # invalid = -1

    p_pad = dpt_ref.shape[1]
    n_sub = (w_chunks * bins) // _GBINS
    for s in range(n_sub):                                  # static unroll
        off = pl.multiple_of(base * bins + s * _GBINS, _GBINS)

        @pl.when((off + _GBINS > idx_min) & (off <= idx_max))
        def _():
            # one-hot transposed: (g, TQ) sublane-iota vs the (1, TQ) row
            key = off + jax.lax.broadcasted_iota(
                jnp.int32, (_GBINS, tq), 0
            )
            if grad_precision == "hilo":
                contrib = jnp.zeros((2 * p_pad, _GBINS), jnp.float32)
                for kk in range(k):                         # static unroll
                    onehot = (key == idxm[kk:kk + 1, :]).astype(
                        jnp.bfloat16
                    )                                       # (g, TQ)
                    dk = dout_ref[0, :, kk, :]              # (P_pad, TQ)
                    dk_hi = dk.astype(jnp.bfloat16)
                    dk_lo = (dk - dk_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16
                    )
                    contrib += jax.lax.dot_general(
                        jnp.concatenate([dk_hi, dk_lo], axis=0), onehot,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                dpt_ref[0, :, pl.ds(off, _GBINS)] += (
                    contrib[:p_pad] + contrib[p_pad:]
                )
            else:
                contrib = jnp.zeros((p_pad, _GBINS), jnp.float32)
                for kk in range(k):                         # static unroll
                    onehot = (key == idxm[kk:kk + 1, :]).astype(
                        jnp.float32
                    )
                    contrib += jax.lax.dot_general(
                        dout_ref[0, :, kk, :], onehot,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                dpt_ref[0, :, pl.ds(off, _GBINS)] += contrib


def _bases_from_idx(idx_mt: jnp.ndarray, tile_q: int, bins: int,
                    w_chunks: int, n_chunks: int) -> jnp.ndarray:
    """(B, n_tiles) base CHUNK per query tile from the indices themselves:
    ``clip(floor(min_valid_idx / bins), 0, n_chunks - w_chunks)``. Covers
    every valid index when the window contract holds (module docstring);
    all-invalid tiles get base 0 (their tile contributes nothing)."""
    b, k, nq_pad = idx_mt.shape
    n_tiles = nq_pad // tile_q
    im = idx_mt.reshape(b, k, n_tiles, tile_q)
    mn = jnp.min(
        jnp.where(im >= 0, im, _BIG_I), axis=(1, 3)
    )                                                       # (B, n_tiles)
    mn = jnp.where(mn == _BIG_I, 0, mn)
    return jnp.clip(mn // bins, 0, n_chunks - w_chunks).astype(jnp.int32)


def _w_chunks(window: int, bins: int) -> int:
    return window // bins + 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _windowed_gather(payload, idx_mt, window, tile_q, bins, interpret,
                     grad_precision):
    out, _ = _gather_fwd(payload, idx_mt, window, tile_q, bins, interpret,
                         grad_precision)
    return out


def _gather_fwd(payload, idx_mt, window, tile_q, bins, interpret,
                grad_precision):
    # Plain XLA gather (descriptor-bound but cheap relative to its VJP);
    # invalid slots (-1 clamps to row 0) are zeroed to match the VJP's
    # dropped cotangents.
    g = jax.vmap(lambda t, i: t[:, i])(payload, idx_mt)     # (B, P, K, Nq)
    out = jnp.where(idx_mt[:, None] >= 0, g, 0.0)
    return out, (idx_mt, (payload.shape[1], payload.shape[2]))


def _gather_bwd(window, tile_q, bins, interpret, grad_precision, res, dout):
    idx_mt, (p_pad, nk_pad) = res
    b, k, nq_pad = idx_mt.shape
    n_tiles = nq_pad // tile_q
    n_chunks = nk_pad // bins
    wc = min(n_chunks, _w_chunks(window, bins))
    bases = _bases_from_idx(idx_mt, tile_q, bins, wc, n_chunks)

    kernel = functools.partial(
        _scatter_kernel, k=k, bins=bins, w_chunks=wc,
        grad_precision=grad_precision,
    )
    dpayload = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, k, tile_q), lambda b, i, bases: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_pad, k, tile_q),
                             lambda b, i, bases: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, p_pad, nk_pad), lambda b, i, bases: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, nk_pad), jnp.float32),
        interpret=interpret,
    )(bases, idx_mt, dout.astype(jnp.float32))
    idx_ct = np.zeros(idx_mt.shape, jax.dtypes.float0)  # int arg: float0
    return dpayload, idx_ct


_windowed_gather.defvjp(_gather_fwd, _gather_bwd)


def gather_windowed_available(nk: int, k: int, p: int, window: int,
                              tile_q: int = TILE_Q,
                              bins: int = BINS) -> bool:
    """Gate: TPU single-chip/per-shard (same rule as the kNN kernels), a
    genuinely windowed scan, K small enough for the static unrolls, and a
    VMEM budget over the gradient block + cotangent block + one-hot
    transients."""
    from myria3d_tpu.ops.pallas_nn1 import nn1_available

    if not nn1_available() or k > 32:
        return False
    nk_pad = -(-nk // bins) * bins
    n_chunks = nk_pad // bins
    if not (0 < _w_chunks(window, bins) < n_chunks):
        return False
    p_pad = -(-p // 8) * 8
    dpt = p_pad * nk_pad * 4                # gradient block f32
    dout_blk = p_pad * k * tile_q * 4
    onehot = tile_q * _GBINS * (4 + 4)      # iota i32 + one-hot
    contrib = 2 * p_pad * _GBINS * 4
    return dpt + dout_blk + onehot + contrib < 13 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("window", "tile_q", "bins", "interpret",
                              "grad_precision"),
)
def gather_neighbors_windowed(
    payload_cf: jnp.ndarray,   # (B, P, N) f32 channels-first payload
    idx: jnp.ndarray,          # (B, Nq, K) i32 neighbor indices
    neigh_valid: jnp.ndarray,  # (B, Nq, K) bool
    window: int,
    tile_q: int = TILE_Q,
    bins: int = BINS,
    interpret: bool = False,
    grad_precision: str = "hilo",
) -> jnp.ndarray:
    """``(B, P, K, Nq)`` neighbor gather, differentiable w.r.t.
    ``payload_cf`` through a windowed MXU scatter-add VJP. Invalid slots
    come back ZERO. Requires the window contract in the module docstring
    (x-sorted cloud, ``idx`` from the windowed kNN over the same
    window)."""
    if grad_precision not in ("hilo", "exact"):
        raise ValueError(f"unknown grad_precision {grad_precision!r}")
    b, p, n = payload_cf.shape
    nq, k = idx.shape[1], idx.shape[2]

    # TRANSPOSED (B, K, Nq) masked indices: lane-major queries slice
    # straight into (1, K, TQ) kernel blocks with no relayout copy, and
    # the forward gather consumes the same form (see _scatter_kernel).
    idx_mt = jnp.swapaxes(
        jnp.where(neigh_valid, idx, -1).astype(jnp.int32), 1, 2
    )
    idx_mt = _pad_axis(idx_mt, 2, tile_q)
    if idx_mt.shape[2] > nq:
        idx_mt = idx_mt.at[:, :, nq:].set(-1)  # padded query rows: no slots

    p_pad = -(-p // 8) * 8
    payload_p = _pad_axis(
        _pad_axis(payload_cf.astype(jnp.float32), 1, p_pad), 2, bins
    )
    out = _windowed_gather(
        payload_p, idx_mt, window, tile_q, bins, interpret, grad_precision
    )
    return out[:, :p, :, :nq]               # (B, P, K, Nq)
