"""Masked exact k-nearest-neighbors over fixed-shape padded batches.

Replaces ``torch_cluster.knn`` / ``torch_geometric.nn.pool.knn_graph``
(invoked per encoder stage in reference ``pyg_randla_net.py:180``) with a
dense, tiled XLA formulation:

- squared distances via the MXU-friendly identity ||q-p||^2 = |q|^2 + |p|^2
  - 2 q·p^T (one (chunk, 3) x (3, Nk) matmul per tile);
- pad points excluded by pushing their distance to +inf, so they are never
  selected as neighbors;
- ``jax.lax.top_k`` of the negated distances yields the K neighbor indices;
- query chunking bounds the materialized (chunk, Nk) distance tile so HBM
  stays within budget at any batch size.

Returned neighbor lists are *gather-based* ``(B, N, K)`` index tensors — no
ragged edge lists — which make downstream LocSE/attention dense ``(B,N,K,C)``
ops (SURVEY.md §2.2 row 1).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)
# Cap on materialized distance-tile elements per chunk step (x4 bytes).
_ELEM_BUDGET = 48 * 1024 * 1024


def _pick_chunk(batch: int, n_query: int, n_key: int) -> int:
    """Largest query-chunk (multiple of 128, divides n_query) fitting budget."""
    chunk = n_query
    while chunk > 128 and (batch * chunk * n_key > _ELEM_BUDGET or n_query % chunk):
        # halve while keeping divisibility; buckets are multiples of 128
        nxt = chunk // 2
        if n_query % nxt:
            nxt = 128
        chunk = max(nxt, 128)
    if n_query % chunk:
        chunk = n_query  # fallback: no chunking for odd sizes
    return chunk


def _knn_chunked(
    qpos: jnp.ndarray,       # (Nq, 3)
    kpos: jnp.ndarray,       # (Nk, 3)
    kvalid: jnp.ndarray,     # (Nk,) bool
    k: int,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    nq = qpos.shape[0]
    k_norm2 = jnp.sum(kpos * kpos, axis=-1)                      # (Nk,)
    k_masked_norm2 = jnp.where(kvalid, k_norm2, _BIG)

    def one_chunk(qc: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        q_norm2 = jnp.sum(qc * qc, axis=-1, keepdims=True)        # (C, 1)
        # HIGHEST: default TPU matmul is bf16, whose ~1e-2 distance error can
        # misrank close neighbors; the K-dim is 3 so full f32 costs nothing.
        cross = jnp.dot(
            qc, kpos.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (C, Nk)
        d2 = q_norm2 + k_masked_norm2[None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(kvalid[None, :], d2, _BIG)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg_d

    if chunk >= nq:
        return one_chunk(qpos)
    qchunks = qpos.reshape(nq // chunk, chunk, 3)
    idx, d2 = jax.lax.map(one_chunk, qchunks)
    return idx.reshape(nq, k), d2.reshape(nq, k)


@functools.partial(jax.jit, static_argnames=("k",))
def knn(
    query_pos: jnp.ndarray,    # (B, Nq, 3)
    key_pos: jnp.ndarray,      # (B, Nk, 3)
    key_mask: jnp.ndarray,     # (B, Nk) bool
    k: int,
    query_mask: Optional[jnp.ndarray] = None,  # (B, Nq) bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact masked kNN from queries into keys, per batch element.

    Returns:
        idx:   (B, Nq, K) int32 neighbor indices into the key axis
        dist2: (B, Nq, K) float32 squared distances (ascending)
        neigh_valid: (B, Nq, K) bool — False for slots that fell on pad keys
            (possible when a cloud has fewer than K valid points) or for
            invalid queries.
    """
    b, nq, _ = query_pos.shape
    nk = key_pos.shape[1]
    # Fewer key slots than K (deeply decimated stages): compute the kNN that
    # exists and pad the neighbor axis with invalid slots, mirroring
    # torch_cluster.knn returning < k edges for tiny clouds.
    k_eff = min(k, nk)
    chunk = _pick_chunk(b, nq, nk)

    if b * max(chunk, 128) * nk > _ELEM_BUDGET and b > 1:
        # Memory still too large with minimal chunk: sequence over batch.
        idx, d2 = jax.lax.map(
            lambda args: _knn_chunked(args[0], args[1], args[2], k_eff, chunk),
            (query_pos, key_pos, key_mask),
        )
    else:
        idx, d2 = jax.vmap(
            lambda qp, kp, kv: _knn_chunked(qp, kp, kv, k_eff, chunk)
        )(query_pos, key_pos, key_mask)

    if k_eff < k:
        pad = ((0, 0), (0, 0), (0, k - k_eff))
        idx = jnp.pad(idx, pad)
        d2 = jnp.pad(d2, pad, constant_values=_BIG)

    neigh_valid = d2 < _BIG * 0.5
    if query_mask is not None:
        neigh_valid = neigh_valid & query_mask[..., None]
    idx = jnp.where(neigh_valid, idx, 0)  # clamp pad slots to a safe index
    return idx, d2, neigh_valid


def knn_graph(
    pos: jnp.ndarray, mask: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Self-kNN graph with self-loops (reference ``knn_graph(..., loop=True)``,
    ``pyg_randla_net.py:180``): each valid point's K nearest valid points,
    itself included (distance 0 sorts first)."""
    return knn(pos, pos, mask, k, query_mask=mask)


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-neighbor features: x (B, N, C), idx (B, Nq, K) → (B, Nq, K, C)."""
    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)
